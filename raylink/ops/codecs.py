"""Pure-numpy codecs for uncompressed media formats.

No image/audio libraries exist in this environment, but two ubiquitous
container formats need none: BMP (uncompressed 24/32-bit) and WAV (PCM
16-bit).  These codecs make the multimodal pipeline's decode step REAL for
those formats — compressed formats (JPEG/PNG/MP3/...) remain behind the
explicit ``NotImplementedError`` stub in :mod:`raylink.ops.multimodal`.

Everything here is vectorized numpy over one payload at a time; the
batch/actor parallelism lives in the Ray stage that calls it.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_bmp",
    "encode_bmp",
    "decode_wav",
    "encode_wav",
    "resize_nearest",
    "resize_bilinear",
    "image_features",
    "audio_features",
]


# --------------------------------------------------------------------------
# BMP (Windows DIB, uncompressed BI_RGB, 24- or 32-bit)
# --------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32-bit BMP to an (H, W, 3) uint8 RGB array.

    Handles bottom-up and top-down row order and the 4-byte row padding of
    the 24-bit layout.  Raises ``ValueError`` on anything else (compressed
    BMPs, palettes) — honest failure, not silent garbage.
    """
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"only uncompressed 24/32-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = height < 0
    h = abs(height)
    bytes_pp = bpp // 8
    row_stride = ((width * bytes_pp + 3) // 4) * 4 if bpp == 24 else width * 4
    need = data_offset + row_stride * h
    if len(payload) < need:
        raise ValueError("truncated BMP payload")
    raw = np.frombuffer(payload, dtype=np.uint8, count=row_stride * h, offset=data_offset)
    rows = raw.reshape(h, row_stride)[:, : width * bytes_pp]
    px = rows.reshape(h, width, bytes_pp)
    if not top_down:
        px = px[::-1]
    # BMP stores BGR(A); return RGB
    return np.ascontiguousarray(px[..., 2::-1])


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a 24-bit bottom-up BMP."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected (H, W, 3) uint8")
    h, w = img.shape[:2]
    row_stride = ((w * 3 + 3) // 4) * 4
    body = np.zeros((h, row_stride), dtype=np.uint8)
    bgr = img[..., ::-1]  # RGB -> BGR
    body[:, : w * 3] = bgr[::-1].reshape(h, w * 3)  # bottom-up
    data = body.tobytes()
    file_size = 54 + len(data)
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", file_size, 0, 0, 54,
        40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0,
    )
    return header + data


# --------------------------------------------------------------------------
# WAV (RIFF, PCM 16-bit)
# --------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM-16 WAV to ((n_samples, n_channels) int16, sample_rate).

    Walks RIFF chunks properly (fmt may be followed by LIST/fact chunks
    before data).  Raises ``ValueError`` for non-PCM encodings.
    """
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body_at = pos + 8
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", payload, body_at)
        elif cid == b"data":
            data = payload[body_at : body_at + size]
        pos = body_at + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _byte_rate, _align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"only PCM-16 WAV supported (format={audio_format}, bits={bits})"
        )
    samples = np.frombuffer(data, dtype="<i2")
    n = len(samples) // channels
    return samples[: n * channels].reshape(n, channels), rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode (n, channels) int16 samples as a PCM-16 WAV."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    channels = s.shape[1]
    data = s.tobytes()
    byte_rate = sample_rate * channels * 2
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, channels, sample_rate, byte_rate, channels * 2, 16,
        b"data", len(data),
    )
    return hdr + data


# --------------------------------------------------------------------------
# transforms + features (vectorized numpy)
# --------------------------------------------------------------------------


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of an (H, W, C) array (pure indexing)."""
    h, w = img.shape[:2]
    ri = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    ci = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ri[:, None], ci[None, :]]


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize of an (H, W, C) uint8 array -> uint8 (align-corners
    false, the conventional half-pixel-center mapping)."""
    h, w = img.shape[:2]
    f = img.astype(np.float32)
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.floor(ys).astype(np.int64).clip(0, h - 1)
    x0 = np.floor(xs).astype(np.int64).clip(0, w - 1)
    y1 = (y0 + 1).clip(0, h - 1)
    x1 = (x0 + 1).clip(0, w - 1)
    wy = (ys - y0).clip(0, 1).astype(np.float32)[:, None, None]
    wx = (xs - x0).clip(0, 1).astype(np.float32)[None, :, None]
    top = f[y0[:, None], x0[None, :]] * (1 - wx) + f[y0[:, None], x1[None, :]] * wx
    bot = f[y1[:, None], x0[None, :]] * (1 - wx) + f[y1[:, None], x1[None, :]] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def image_features(img: np.ndarray, bins_per_channel: int = 8) -> np.ndarray:
    """Compact image descriptor: per-channel mean + normalized per-channel
    histogram (3 + 3*bins float32)."""
    f = img.reshape(-1, img.shape[2]).astype(np.float32)
    means = f.mean(axis=0) / 255.0
    hists = []
    for c in range(img.shape[2]):
        hist = np.bincount(
            (f[:, c] * bins_per_channel / 256.0).astype(np.int64).clip(
                0, bins_per_channel - 1
            ),
            minlength=bins_per_channel,
        )
        hists.append(hist / max(len(f), 1))
    return np.concatenate([means, *hists]).astype(np.float32)


def audio_features(samples: np.ndarray, sample_rate: int, n_bands: int = 16) -> np.ndarray:
    """Compact audio descriptor: RMS, zero-crossing rate, and ``n_bands``
    log-magnitude FFT band energies (mono-mixed), float32."""
    mono = np.asarray(samples, dtype=np.float32)
    if mono.ndim == 2:
        mono = mono.mean(axis=1)
    mono = mono / 32768.0
    n = len(mono)
    rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    if n >= 2:
        mag = np.abs(np.fft.rfft(mono))
        bands = np.array_split(mag, n_bands)
        band_e = np.array([np.log1p(b.mean()) if len(b) else 0.0 for b in bands])
    else:
        band_e = np.zeros(n_bands)
    return np.concatenate([[rms, zcr], band_e]).astype(np.float32)
