"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as actor-pool ``map_batches``
stages with SMALL batch sizes (payload bytes x batch x concurrency must fit
worker heaps — SURVEY.md §4 "Memory pressure").

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode kernel is stubbed: ``DecodeStage(fake=True)`` parses this module's
deterministic fake payload format; ``fake=False`` raises
``NotImplementedError`` at the exact point a real decoder would slot in.
Everything Ray-side — schema, actor signature, batching, output layout —
is real and tested.
"""

from __future__ import annotations

import struct
from hashlib import blake2b

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("content_type", pa.string()),
        ("n_bytes", pa.int64()),
    ]
)

_MAGIC = b"FAKE"


def synth_media_table(n: int, seed: int = 9) -> pa.Table:
    """Deterministic fake media rows. Payload = FAKE | w | h | c | pixels
    (pixel bytes derived from blake2b stream — decodable without codecs)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    ids, kind_col, payloads, ctypes, sizes = [], [], [], [], []
    for i in range(n):
        kind = kinds[i % 3]
        w, h, c = int(rng.integers(4, 64)), int(rng.integers(4, 64)), 3
        pix = blake2b(f"{seed}:{i}".encode(), digest_size=32).digest()
        body = (pix * ((w * h * c) // len(pix) + 1))[: w * h * c]
        payloads.append(_MAGIC + struct.pack("<III", w, h, c) + body)
        ids.append(i)
        kind_col.append(kind)
        ctypes.append({"image": "image/x-fake", "audio": "audio/x-fake",
                       "video": "video/x-fake"}[kind])
        sizes.append(len(payloads[-1]))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kind_col, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "content_type": pa.array(ctypes, pa.string()),
            "n_bytes": pa.array(sizes, pa.int64()),
        }
    )


def _decode_fake(payload: bytes) -> np.ndarray:
    if payload[:4] != _MAGIC:
        raise ValueError("not a fake payload")
    w, h, c = struct.unpack("<III", payload[4:16])
    return np.frombuffer(payload[16 : 16 + w * h * c], dtype=np.uint8).reshape(
        h, w, c
    )


class DecodeStage:
    """Actor stage: payload -> (width, height, channels, mean/std features).

    A real deployment replaces ``_decode_fake`` with PIL/ffmpeg decode in
    ``__init__``-loaded codec state; nothing else changes.
    """

    def __init__(self, fake: bool = True):
        if not fake:
            raise NotImplementedError(
                "real media codecs are not available in this environment; "
                "construct DecodeStage(fake=True) for the deterministic stub"
            )
        self.decode = _decode_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws, hs, cs, means, stds = [], [], [], [], []
        for payload in batch.column("payload").to_pylist():
            arr = self.decode(payload)
            h, w, c = arr.shape
            ws.append(w)
            hs.append(h)
            cs.append(c)
            f = arr.astype(np.float64)
            means.append(float(f.mean()))
            stds.append(float(f.std()))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "channels": pa.array(cs, pa.int32()),
                "mean_value": pa.array(means, pa.float64()),
                "std_value": pa.array(stds, pa.float64()),
            }
        )


class ResizeStage:
    """Actor stage: payload -> resized payload (nearest-neighbor on the fake
    pixel grid — stands in for a real resize kernel)."""

    def __init__(self, out_w: int = 8, out_h: int = 8):
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for payload in batch.column("payload").to_pylist():
            arr = _decode_fake(payload)
            h, w, c = arr.shape
            yi = (np.arange(self.out_h) * h // self.out_h)
            xi = (np.arange(self.out_w) * w // self.out_w)
            small = arr[yi][:, xi]
            out.append(
                _MAGIC + struct.pack("<III", self.out_w, self.out_h, c)
                + small.tobytes()
            )
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "payload": pa.array(out, pa.binary()),
            }
        )


def media_features(media_ds, *, concurrency=2, batch_size: int = 64):
    """The canonical multimodal pipeline: small batches through the decode
    actor pool (binary stays in Arrow end to end)."""
    return media_ds.map_batches(
        DecodeStage,
        fn_constructor_kwargs=dict(fake=True),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
