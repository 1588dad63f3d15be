"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as actor-pool ``map_batches``
stages with SMALL batch sizes (payload bytes x batch x concurrency must fit
worker heaps — SURVEY.md §4 "Memory pressure").

Decode is REAL for all three modalities — pure stdlib, no PIL/ffmpeg:

- images: PNG (zlib inflate + the five scanline filters, public PNG spec);
- audio: RIFF/WAV 16-bit PCM;
- video: YUV4MPEG2 (.y4m) — the uncompressed frame-stream container
  (plain-text header + per-``FRAME`` raw YCbCr planes) that ffmpeg/mjpegtools
  pipe between each other. Encode writes C444 full-range; decode handles
  C444, the C420 family (chroma upsampled nearest), and Cmono. RGB↔YCbCr
  is the JPEG/JFIF full-range matrix.

Compressed codecs (H.264 etc.) are out of scope — a deployment with ffmpeg
slots it into the same ``DecodeStage``/``FrameSampleStage`` seams; the
legacy FAKE frame-stack format still decodes for back-compat.
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
# Y4M (YUV4MPEG2) codec — uncompressed video container, pure stdlib
# ---------------------------------------------------------------------------

_Y4M_MAGIC = b"YUV4MPEG2"


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """uint8 (..., 3) RGB -> uint8 (..., 3) YCbCr (JPEG/JFIF full-range)."""
    f = rgb.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.clip(
        np.rint(np.stack([y, cb, cr], axis=-1)), 0, 255
    ).astype(np.uint8)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """uint8 (..., 3) YCbCr -> uint8 (..., 3) RGB (inverse JPEG matrix)."""
    f = ycc.astype(np.float64)
    y, cb, cr = f[..., 0], f[..., 1] - 128.0, f[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(
        np.rint(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


def y4m_encode(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """(n, h, w, 3) uint8 RGB or (n, h, w) uint8 gray -> .y4m bytes.

    Color writes C444 planes (no chroma subsampling — lossless at the
    container level; only the RGB↔YCbCr rounding is lossy), gray writes
    Cmono. Full-range flagged via the standard XCOLORRANGE extension.
    """
    mono = frames.ndim == 3
    n, h, w = frames.shape[:3]
    cspace = b"mono" if mono else b"444"
    header = b"%s W%d H%d F%d:%d Ip A1:1 C%s XCOLORRANGE=FULL\n" % (
        _Y4M_MAGIC, w, h, fps[0], fps[1], cspace
    )
    parts = [header]
    for i in range(n):
        parts.append(b"FRAME\n")
        if mono:
            parts.append(np.ascontiguousarray(frames[i]).tobytes())
        else:
            ycc = rgb_to_ycbcr(frames[i])
            for p in range(3):  # planar: full Y, then Cb, then Cr
                parts.append(np.ascontiguousarray(ycc[:, :, p]).tobytes())
    return b"".join(parts)


def y4m_decode(data: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """.y4m bytes -> ((n, h, w, 3) uint8 RGB | (n, h, w, 1) gray, fps).

    Handles C444, the C420 family (jpeg/paldv/mpeg2 share one plane
    layout; chroma upsampled nearest-neighbor), and Cmono.
    """
    end = data.index(b"\n")
    fields = data[:end].split(b" ")
    if fields[0] != _Y4M_MAGIC:
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    fps = (25, 1)
    cspace = b"420jpeg"  # the spec default when C is absent
    for f in fields[1:]:
        if f[:1] == b"W":
            w = int(f[1:])
        elif f[:1] == b"H":
            h = int(f[1:])
        elif f[:1] == b"F":
            num, den = f[1:].split(b":")
            fps = (int(num), int(den))
        elif f[:1] == b"C":
            cspace = f[1:]
    if w is None or h is None:
        raise ValueError("y4m header missing W/H")
    cw, ch = (w + 1) // 2, (h + 1) // 2  # ceil per spec for odd sizes
    if cspace.startswith(b"444"):
        fsz, mode = 3 * w * h, "444"
    elif cspace.startswith(b"420"):
        fsz, mode = w * h + 2 * cw * ch, "420"
    elif cspace == b"mono":
        fsz, mode = w * h, "mono"
    else:
        raise ValueError(f"unsupported y4m colorspace {cspace!r}")

    frames = []
    pos = end + 1
    while pos < len(data):
        nl = data.index(b"\n", pos)
        if data[pos:pos + 5] != b"FRAME":
            raise ValueError("malformed y4m FRAME header")
        pos = nl + 1
        raw = np.frombuffer(data[pos:pos + fsz], dtype=np.uint8)
        if raw.size < fsz:
            raise ValueError("truncated y4m frame")
        pos += fsz
        if mode == "mono":
            frames.append(raw.reshape(h, w)[..., None].copy())
            continue
        y = raw[: w * h].reshape(h, w)
        if mode == "444":
            cb = raw[w * h: 2 * w * h].reshape(h, w)
            cr = raw[2 * w * h:].reshape(h, w)
        else:  # 420: upsample chroma 2x nearest, crop to (h, w)
            cb = raw[w * h: w * h + cw * ch].reshape(ch, cw)
            cr = raw[w * h + cw * ch:].reshape(ch, cw)
            cb = cb.repeat(2, axis=0).repeat(2, axis=1)[:h, :w]
            cr = cr.repeat(2, axis=0).repeat(2, axis=1)[:h, :w]
        frames.append(ycbcr_to_rgb(np.stack([y, cb, cr], axis=-1)))
    return np.stack(frames), fps


# ---------------------------------------------------------------------------
# synthetic media table (REAL PNG / WAV / Y4M payloads)
# ---------------------------------------------------------------------------


def _det_bytes(seed: int, i: int, n: int) -> np.ndarray:
    pix = blake2b(f"{seed}:{i}".encode(), digest_size=32).digest()
    return np.frombuffer(
        (pix * (n // len(pix) + 1))[:n], dtype=np.uint8
    )


def synth_media_table(n: int, seed: int = 9) -> pa.Table:
    """Deterministic media rows: images are real PNGs, audio real 16-bit
    WAVs, video real YUV4MPEG2 frame streams (2-4 frames each)."""
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
            nf = 2 + i % 3
            frames = _det_bytes(seed, i, nf * h * w * c).reshape(
                nf, h, w, c
            )
            payloads.append(y4m_encode(frames))
            ctypes.append("video/x-yuv4mpeg2")
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
    """Actor stage: payload -> (width, height, channels, n_frames,
    mean/std features).

    Real codecs — PNG (zlib), WAV (PCM), Y4M (raw YCbCr planes) — pure
    stdlib, constructed once per actor. ``fake=True`` forces the legacy
    FAKE frame-stack path (back-compat for pre-codec tables).

    Feature semantics: images report pixel stats over uint8 RGB values;
    audio reports sample stats over int16 values with width=n_samples,
    height=1, channels=n_channels; video reports pixel stats over all
    frames' decoded RGB with n_frames > 1.
    """

    def __init__(self, fake: bool = False):
        self.fake = fake

    def _decode(self, payload: bytes):
        """payload -> (arr, (width, height, channels, n_frames))."""
        if self.fake:
            arr = _decode_fake(payload)
            h, w, c = arr.shape
            return arr, (w, h, c, 1)
        if payload[:8] == _PNG_SIG:
            arr = png_decode(payload)
            h, w, c = arr.shape
            return arr, (w, h, c, 1)
        if payload[:4] == b"RIFF":
            sams, _rate = wav_decode(payload)
            n, ch = sams.shape
            return sams, (n, 1, ch, 1)
        if payload[:9] == _Y4M_MAGIC:
            frames, _fps = y4m_decode(payload)
            nf, h, w, c = frames.shape
            return frames, (w, h, c, nf)
        arr = _decode_fake(payload)
        h, w, c = arr.shape
        return arr, (w, h, c, 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws, hs, cs, nfs, means, stds = [], [], [], [], [], []
        for payload in batch.column("payload").to_pylist():
            arr, (w, h, c, nf) = self._decode(payload)
            ws.append(w)
            hs.append(h)
            cs.append(c)
            nfs.append(nf)
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
                "n_frames": pa.array(nfs, pa.int32()),
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


class FrameSampleStage:
    """Actor stage: video payload -> one row per sampled frame, as PNG.

    Emits (media_id, frame_idx, payload, content_type) with every
    ``step``-th frame re-encoded as an image — the row-expanding
    (flat_map-shaped) stage a video curation pipeline feeds into the
    image branch. Non-video payloads pass through unchanged as frame 0.
    """

    def __init__(self, step: int = 2):
        self.step = max(1, step)

    def __call__(self, batch: pa.Table) -> pa.Table:
        in_ctypes = (
            batch.column("content_type").to_pylist()
            if "content_type" in batch.column_names
            else [None] * batch.num_rows
        )
        ids, idxs, payloads, ctypes = [], [], [], []
        for mid, payload, in_ct in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
            in_ctypes,
        ):
            if payload[:9] == _Y4M_MAGIC:
                frames, _fps = y4m_decode(payload)
                for fi in range(0, frames.shape[0], self.step):
                    ids.append(mid)
                    idxs.append(fi)
                    payloads.append(png_encode(frames[fi]))
                    ctypes.append("image/png")
            else:
                # passthrough keeps the row's REAL content_type so a
                # downstream image/audio branch still routes on it
                ids.append(mid)
                idxs.append(0)
                payloads.append(payload)
                ctypes.append(in_ct or "application/octet-stream")
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "payload": pa.array(payloads, pa.binary()),
                "content_type": pa.array(ctypes, pa.string()),
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


def sample_frames(media_ds, *, step: int = 2, concurrency=2,
                  batch_size: int = 32):
    """Video rows -> sampled-frame image rows (payloads stay binary Arrow;
    small batches — a frame stack is the biggest payload class)."""
    return media_ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs=dict(step=step),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
