"""Pure-numpy codecs for library-free media formats.

No image/audio libraries exist in this environment, but three ubiquitous
formats need none: BMP (uncompressed 24/32-bit), WAV (PCM 16-bit), and —
because stdlib ``zlib`` IS the PNG compressor — 8-bit non-interlaced PNG.
These codecs make the multimodal pipeline's decode step REAL for those
formats; formats whose codecs genuinely need a library (JPEG/MP3/FLAC)
dispatch to PIL/soundfile when importable and otherwise stay behind the
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
    "decode_png",
    "encode_png",
    "to_rgb",
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


# --------------------------------------------------------------------------
# PNG (RFC 2083) — pure stdlib-zlib + numpy, no codec library needed
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: channels per color type (3 = palette: 1 index byte -> PLTE lookup)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(payload: bytes):
    """Yield (type, data) chunks; validates each chunk's CRC."""
    import zlib as _zlib

    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        if pos + 12 + length > len(payload):
            # covers both short data AND a missing/partial CRC word —
            # struct.error here would break the ValueError contract
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if _zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in PNG chunk {ctype!r}")
        yield ctype, data
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("PNG ended without IEND chunk")


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering.  ``raw`` is the decompressed
    stream reshaped to (h, 1 + stride); returns (h, stride) uint8.

    Filters None/Sub/Up are fully vectorized (Sub is a per-lane
    cumsum mod 256); Average/Paeth depend on the left-neighbor
    RECONSTRUCTION, so those rows fall back to a per-pixel sweep —
    encoders this repo interoperates with (incl. its own) emit
    filters 0-2, so the sweep is the exception path."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].copy()
        if ftype == 0:
            rec = line
        elif ftype == 1:  # Sub: per-lane cumsum mod 256
            lanes = line.astype(np.uint32).reshape(-1, bpp)
            rec = (
                np.cumsum(lanes, axis=0, dtype=np.uint32) % 256
            ).astype(np.uint8).reshape(-1)
        elif ftype == 2:  # Up
            rec = (line.astype(np.uint16) + prior) .astype(np.uint8)
        elif ftype == 3:  # Average
            rec = line
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                rec[x] = (int(line[x]) + (left + int(prior[x])) // 2) % 256
        elif ftype == 4:  # Paeth
            rec = line
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prior[x])
                c = int(prior[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa_ <= pb and pa_ <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                rec[x] = (int(line[x]) + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = rec
        prior = rec
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to ``(H, W, C)`` uint8
    (C = 1 gray, 2 gray+alpha, 3 RGB/palette, 4 RGBA).

    Pure stdlib ``zlib`` + numpy — the one COMPRESSED image format this
    repo decodes with no codec library.  Grayscale/palette images come
    back at their native channel count; use :func:`to_rgb` before
    :func:`image_features` / :func:`resize_bilinear` if a fixed 3-channel
    layout is needed.
    """
    import zlib as _zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    ihdr = None
    plte = None
    idat = []
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype_code, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"only 8-bit PNG supported, got depth {depth}")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG not supported")
    if ctype_code not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {ctype_code}")
    ch = _PNG_CHANNELS[ctype_code]
    stride = w * ch
    raw = np.frombuffer(
        _zlib.decompress(b"".join(idat)), dtype=np.uint8
    )
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    img = _png_unfilter(raw.reshape(h, stride + 1), h, stride, ch)
    img = img.reshape(h, w, ch)
    if ctype_code == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        idx = img[:, :, 0]
        if idx.size and int(idx.max()) >= len(plte):
            raise ValueError(
                f"palette index {int(idx.max())} out of range for "
                f"{len(plte)}-entry PLTE"
            )
        img = plte[idx]
    return np.ascontiguousarray(img)


def to_rgb(img: np.ndarray) -> np.ndarray:
    """Normalize any decode_* output to (H, W, 3) uint8 (gray
    replicated, alpha dropped)."""
    if img.ndim != 3:
        raise ValueError(f"expected (H, W, C), got shape {img.shape}")
    c = img.shape[2]
    if c == 1:
        return np.repeat(img, 3, axis=2)
    if c == 2:  # gray + alpha
        return np.repeat(img[:, :, :1], 3, axis=2)
    if c == 3:
        return img
    if c == 4:
        return np.ascontiguousarray(img[:, :, :3])
    raise ValueError(f"cannot normalize {c}-channel image to RGB")


def encode_png(img: np.ndarray) -> bytes:
    """Encode (H, W, C) uint8 (C in {1, 3, 4}) as a non-interlaced
    8-bit PNG (filter 0 on every scanline, one zlib stream)."""
    import zlib as _zlib

    img = np.ascontiguousarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.dtype != np.uint8 or img.ndim != 3:
        raise ValueError("encode_png wants (H, W, C) uint8")
    h, w, c = img.shape
    ctype_code = {1: 0, 3: 2, 4: 6}.get(c)
    if ctype_code is None:
        raise ValueError(f"cannot encode {c}-channel image as PNG")
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), img.reshape(h, w * c)],
        axis=1,
    ).tobytes()

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", _zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_code, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
