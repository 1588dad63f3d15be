"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as actor-pool ``map_batches``
stages with SMALL batch sizes (payload bytes x batch x concurrency must fit
worker heaps — SURVEY.md §4 "Memory pressure").

Decode is REAL for images and audio: a pure-stdlib PNG codec (zlib
inflate + the five PNG scanline filters, from the public PNG spec) and a
RIFF/WAV 16-bit PCM codec — no PIL/ffmpeg needed. Video decode stays a
deterministic fake-payload stub (``DecodeStage`` falls back to the FAKE
format; a real deployment slots ffmpeg into ``_decode_video``), since no
video codec exists in this container. Everything Ray-side — schema, actor
signature, batching, output layout — is identical between real and fake
paths.
"""

from __future__ import annotations

import struct
import zlib
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
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# PNG codec (pure stdlib; 8-bit gray/RGB/RGBA, non-interlaced)
# ---------------------------------------------------------------------------


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray) -> bytes:
    """(h, w) or (h, w, c) uint8 -> PNG bytes (filter 0 scanlines)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(
        b"\x00" + arr[y].tobytes() for y in range(h)
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, c) uint8. Supports 8-bit depth, color types
    0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), no interlace."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or inter != 0:
                raise ValueError("unsupported PNG (need 8-bit, no interlace)")
            c = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
            if c is None:
                raise ValueError(f"unsupported PNG color type {ctype}")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)], np.uint8
        ).astype(np.int64)
        if f == 0:
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - c] if x >= c else 0
                if f == 1:
                    cur[x] = (line[x] + a) & 0xFF
                elif f == 3:
                    cur[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
                else:
                    pc = prev[x - c] if x >= c else 0
                    cur[x] = (line[x] + _paeth(a, int(prev[x]), pc)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, c)


# ---------------------------------------------------------------------------
# WAV codec (RIFF, 16-bit PCM)
# ---------------------------------------------------------------------------


def wav_encode(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 -> WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    body = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n, channels) int16, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    ch = rate = None
    samples = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + length]
        pos += 8 + length + (length & 1)
        if tag == b"fmt ":
            afmt, ch, rate = struct.unpack("<HHI", body[:8])
            if afmt != 1:
                raise ValueError("only PCM WAV supported")
        elif tag == b"data":
            samples = np.frombuffer(body, "<i2")
    if samples is None or ch is None:
        raise ValueError("malformed WAV")
    return samples.reshape(-1, ch), rate


# ---------------------------------------------------------------------------
# synthetic media table (REAL PNG / WAV payloads; fake only for video)
# ---------------------------------------------------------------------------


def _det_bytes(seed: int, i: int, n: int) -> np.ndarray:
    pix = blake2b(f"{seed}:{i}".encode(), digest_size=32).digest()
    return np.frombuffer(
        (pix * (n // len(pix) + 1))[:n], dtype=np.uint8
    )


def synth_media_table(n: int, seed: int = 9) -> pa.Table:
    """Deterministic media rows: images are real PNGs, audio real 16-bit
    WAVs, video a FAKE-format frame stack (no container codec exists)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    ids, kind_col, payloads, ctypes = [], [], [], []
    for i in range(n):
        kind = kinds[i % 3]
        w, h, c = int(rng.integers(4, 64)), int(rng.integers(4, 64)), 3
        body = _det_bytes(seed, i, w * h * c)
        if kind == "image":
            payloads.append(png_encode(body.reshape(h, w, c)))
            ctypes.append("image/png")
        elif kind == "audio":
            sams = (
                body.astype(np.int16)[: (w * h * c) // 2 * 2] - 128
            ) * 127
            payloads.append(wav_encode(sams.reshape(-1, 2)))
            ctypes.append("audio/wav")
        else:
            payloads.append(
                _MAGIC + struct.pack("<III", w, h, c) + body.tobytes()
            )
            ctypes.append("video/x-fake")
        ids.append(i)
        kind_col.append(kind)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kind_col, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "content_type": pa.array(ctypes, pa.string()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }
    )


def _decode_fake(payload: bytes) -> np.ndarray:
    if payload[:4] != _MAGIC:
        raise ValueError("not a fake payload")
    w, h, c = struct.unpack("<III", payload[4:16])
    return np.frombuffer(payload[16: 16 + w * h * c], dtype=np.uint8).reshape(
        h, w, c
    )


class DecodeStage:
    """Actor stage: payload -> (width, height, channels, mean/std features).

    Real codecs: PNG (zlib) and WAV (PCM) — pure stdlib, loaded per actor.
    Video payloads use the FAKE frame-stack format; passing
    ``video_real=True`` raises ``NotImplementedError`` at the exact point
    an ffmpeg-based decoder would slot in (no video codec in this
    container). ``fake=True`` forces the legacy all-fake path.

    Feature semantics: images report pixel stats over uint8 values; audio
    reports sample stats over int16 values with width=n_samples, height=1,
    channels=n_channels.
    """

    def __init__(self, fake: bool = False, video_real: bool = False):
        if video_real:
            raise NotImplementedError(
                "no video codec (ffmpeg) is available in this environment; "
                "video payloads use the deterministic FAKE frame format"
            )
        self.fake = fake

    def _decode(self, payload: bytes):
        """payload -> (arr, (width, height, channels)) with arr numeric."""
        if payload[:8] == _PNG_SIG and not self.fake:
            arr = png_decode(payload)
            h, w, c = arr.shape
            return arr, (w, h, c)
        if payload[:4] == b"RIFF" and not self.fake:
            sams, _rate = wav_decode(payload)
            n, ch = sams.shape
            return sams, (n, 1, ch)
        arr = _decode_fake(payload)
        h, w, c = arr.shape
        return arr, (w, h, c)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws, hs, cs, means, stds = [], [], [], [], []
        for payload in batch.column("payload").to_pylist():
            arr, (w, h, c) = self._decode(payload)
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
    """Actor stage: image payload -> resized PNG payload (nearest-neighbor;
    stands in for a real resize kernel). Fake payloads resize on the fake
    pixel grid and stay fake."""

    def __init__(self, out_w: int = 8, out_h: int = 8):
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for payload in batch.column("payload").to_pylist():
            real = payload[:8] == _PNG_SIG
            arr = png_decode(payload) if real else _decode_fake(payload)
            h, w, c = arr.shape
            yi = (np.arange(self.out_h) * h // self.out_h)
            xi = (np.arange(self.out_w) * w // self.out_w)
            small = np.ascontiguousarray(arr[yi][:, xi])
            if real:
                out.append(png_encode(small))
            else:
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


def media_features(media_ds, *, concurrency=2, batch_size: int = 64,
                   fake: bool = False):
    """The canonical multimodal pipeline: small batches through the decode
    actor pool (binary stays in Arrow end to end)."""
    return media_ds.map_batches(
        DecodeStage,
        fn_constructor_kwargs=dict(fake=fake),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
