"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video are opaque ``binary`` columns with metadata columns
(``media_type``, ``width``/``height`` or ``sample_rate``/``duration``).  The
Ray-side plumbing — schema, actor-pool stage shape, batch sizing, output
layout — is real and tested.  The codec step is REAL for uncompressed
formats via the pure-numpy codecs in :mod:`raylink.ops.codecs`:

- ``decoder="bmp"`` — decode 24/32-bit BMP payloads, emit mean+histogram
  image descriptors (and see :func:`decode_resize_images` for the
  decode → resize → re-encode stage);
- ``decoder="wav"`` — decode PCM-16 WAV payloads, emit RMS/ZCR/FFT-band
  descriptors;
- ``decoder="png"`` — decode 8-bit PNG (pure stdlib-zlib + numpy, no
  codec library) to the same image descriptors;
- ``decoder="jpeg"`` — PIL-backed when Pillow is importable, otherwise
  the loud stub (this environment ships no JPEG codec);
- ``decoder="flac"`` / ``"mp3"`` — soundfile-backed when importable,
  otherwise the loud stub, feeding the same audio-descriptor path as
  WAV;
- ``decoder="fake"`` — deterministic feature vector from the payload
  bytes (exercises the full data path without any format assumption);
- ``decoder="stub"`` (default) — raises ``NotImplementedError`` with
  guidance: formats whose codecs genuinely need a library keep it.

Swap in any other decoder by passing a callable ``bytes -> np.ndarray``.
"""

from __future__ import annotations

import zlib
from typing import Callable

import numpy as np
import pyarrow as pa

import ray.data

__all__ = [
    "MEDIA_SCHEMA",
    "make_media_table",
    "MediaFeatureExtractor",
    "extract_media_features",
    "decode_resize_images",
    "frame_sample",
]

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # image|audio|video
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def make_media_table(n: int = 100, seed: int = 5) -> pa.Table:
    """Deterministic synthetic media rows with REAL payloads: images are
    valid 24-bit BMPs, audio rows are valid PCM-16 WAVs (decodable by the
    numpy codecs), video rows are opaque bytes (stub territory)."""
    from .codecs import encode_bmp, encode_wav

    rng = np.random.default_rng(seed)
    types = np.array(["image", "audio", "video"])[rng.integers(0, 3, size=n)]
    payloads: list[bytes] = []
    widths = np.zeros(n, dtype=np.int32)
    heights = np.zeros(n, dtype=np.int32)
    rates = np.zeros(n, dtype=np.int32)
    durs = np.zeros(n, dtype=np.int32)
    for i, t in enumerate(types):
        if t == "image":
            h = int(rng.integers(8, 48))
            w = int(rng.integers(8, 48))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payloads.append(encode_bmp(img))
            widths[i], heights[i] = w, h
        elif t == "audio":
            rate = 8000
            n_samp = int(rng.integers(256, 4096))
            tt = np.arange(n_samp) / rate
            freq = float(rng.uniform(100, 1000))
            wave = (np.sin(2 * np.pi * freq * tt) * 12000).astype(np.int16)
            payloads.append(encode_wav(wave, rate))
            rates[i] = rate
            durs[i] = int(1000 * n_samp / rate)
        else:
            # "video" = concatenated-BMP frame container (decodable)
            n_frames = int(rng.integers(4, 12))
            h = int(rng.integers(8, 16))
            w = int(rng.integers(8, 16))
            frames = [
                encode_bmp(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))
                for _ in range(n_frames)
            ]
            payloads.append(b"".join(frames))
            widths[i], heights[i] = w, h
            durs[i] = n_frames * 40  # 25 fps
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "media_type": pa.array(types.tolist()),
            "payload": pa.array(payloads, type=pa.binary()),
            "width": pa.array(widths),
            "height": pa.array(heights),
            "sample_rate": pa.array(rates),
            "duration_ms": pa.array(durs),
        }
    )


def _stub_decoder(payload: bytes) -> np.ndarray:
    raise NotImplementedError(
        "decoding COMPRESSED media (JPEG/PNG/MP3/...) requires a codec "
        "library, which is not available in this environment; use "
        "decoder='bmp' or decoder='wav' for the real pure-numpy codecs "
        "(raylink.ops.codecs), decoder='fake' for the deterministic test "
        "decoder, or supply your own bytes -> ndarray callable"
    )


def _bmp_features(payload: bytes) -> np.ndarray:
    from .codecs import decode_bmp, image_features

    return image_features(decode_bmp(payload))


def _png_features(payload: bytes) -> np.ndarray:
    from .codecs import decode_png, image_features, to_rgb

    return image_features(to_rgb(decode_png(payload)))


def _wav_features(payload: bytes) -> np.ndarray:
    from .codecs import audio_features, decode_wav

    samples, rate = decode_wav(payload)
    return audio_features(samples, rate)


def _pil_image_features(payload: bytes) -> np.ndarray:
    """JPEG (or anything Pillow opens) → the shared image descriptor.
    Only reachable when Pillow imports; see :func:`_optional_decoder`."""
    import io

    from PIL import Image  # noqa: import guarded by _optional_decoder

    from .codecs import image_features

    img = np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    return image_features(img)


def _soundfile_features(payload: bytes) -> np.ndarray:
    """FLAC/MP3/OGG → the shared audio descriptor via soundfile.
    Only reachable when soundfile imports."""
    import io

    import soundfile as sf  # noqa: import guarded by _optional_decoder

    from .codecs import audio_features

    data, rate = sf.read(io.BytesIO(payload), dtype="int16")
    return audio_features(np.asarray(data), int(rate))


def _optional_decoder(module: str, fn: Callable, fmt: str) -> Callable:
    """Return ``fn`` if ``module`` imports, else the loud stub — the
    optional-dependency pattern for codecs this environment lacks."""
    import importlib

    try:
        importlib.import_module(module)
    except ImportError:
        def unavailable(payload: bytes) -> np.ndarray:
            raise NotImplementedError(
                f"decoder {fmt!r} needs the optional dependency "
                f"{module!r}, which is not installed; install it or "
                "use decoder='bmp'/'wav'/'png' (library-free codecs), "
                "decoder='fake', or a custom bytes -> ndarray callable"
            )

        return unavailable
    return fn


def _fake_decoder(payload: bytes, dim: int = 32) -> np.ndarray:
    """Deterministic pseudo-features from payload bytes (crc32-seeded)."""
    seed = zlib.crc32(payload)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


class MediaFeatureExtractor:
    """Actor-pool stage: decode + featurize binary payloads per batch.

    Decoder/model state loads once per actor in ``__init__`` (the expensive
    part for a real codec); ``__call__`` handles one (small) batch — large
    binary payloads need small ``batch_size`` so batch x concurrency fits in
    the worker heap.
    """

    def __init__(self, decoder: str | Callable[[bytes], np.ndarray] = "stub", dim: int = 32):
        if decoder == "stub":
            self.decode = _stub_decoder
        elif decoder == "fake":
            self.decode = lambda b: _fake_decoder(b, dim)
        elif decoder == "bmp":
            self.decode = _bmp_features
        elif decoder == "png":
            self.decode = _png_features
        elif decoder == "wav":
            self.decode = _wav_features
        elif decoder == "jpeg":
            self.decode = _optional_decoder(
                "PIL", _pil_image_features, "jpeg"
            )
        elif decoder in ("flac", "mp3"):
            self.decode = _optional_decoder(
                "soundfile", _soundfile_features, decoder
            )
        else:
            self.decode = decoder
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        vecs = [self.decode(p).astype(np.float32) for p in payloads]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "media_type": batch.column("media_type"),
                "features": pa.array(
                    [v.tobytes() for v in vecs], type=pa.binary()
                ),
                "feat_dim": pa.array(
                    np.array([len(v) for v in vecs], dtype=np.int32)
                ),
            }
        )


def extract_media_features(
    media: ray.data.Dataset,
    decoder: str | Callable = "fake",
    dim: int = 32,
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Run the feature-extraction actor pool over a media Dataset."""
    return media.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decoder": decoder, "dim": dim},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


class _ImageResizer:
    """Actor-pool stage: decode -> resize -> re-encode per row
    (``fmt``: 'bmp' or 'png' — both library-free codecs)."""

    def __init__(
        self,
        out_h: int,
        out_w: int,
        method: str = "bilinear",
        fmt: str = "bmp",
    ):
        from .codecs import (
            decode_bmp,
            decode_png,
            encode_bmp,
            encode_png,
            resize_bilinear,
            resize_nearest,
            to_rgb,
        )

        if fmt == "bmp":
            self.decode = decode_bmp
            self.encode = encode_bmp
        elif fmt == "png":
            # resize kernels want a fixed 3-channel layout
            self.decode = lambda p: to_rgb(decode_png(p))
            self.encode = encode_png
        else:
            raise ValueError(f"fmt must be 'bmp' or 'png': {fmt!r}")
        self.resize = resize_bilinear if method == "bilinear" else resize_nearest
        self.out_h, self.out_w = out_h, out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [
            self.encode(self.resize(self.decode(p), self.out_h, self.out_w))
            for p in batch.column("payload").to_pylist()
        ]
        n = len(out)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "payload": pa.array(out, type=pa.binary()),
                "width": pa.array(np.full(n, self.out_w, dtype=np.int32)),
                "height": pa.array(np.full(n, self.out_h, dtype=np.int32)),
            }
        )


def _split_bmp_frames(payload: bytes) -> list[bytes]:
    """Split a concatenated-BMP container into its frames.

    The "video" format this repo can actually decode without codec
    libraries: frames are whole BMP files laid end to end (each one
    self-describing via its header's file-size field).  Compressed video
    needs a real codec and stays behind the stub decoder.
    """
    import struct as _struct

    frames = []
    pos = 0
    while pos + 6 <= len(payload):
        if payload[pos : pos + 2] != b"BM":
            raise ValueError(f"junk at offset {pos}: not a BMP frame")
        size = _struct.unpack_from("<I", payload, pos + 2)[0]
        if size < 54 or pos + size > len(payload):
            raise ValueError(f"truncated BMP frame at offset {pos}")
        frames.append(payload[pos : pos + size])
        pos += size
    return frames


class _FrameSampler:
    """Actor-pool stage: split video payloads into frames, keep every
    ``step``-th frame (bounded by ``max_frames``), one output row per kept
    frame — ``flat_map`` semantics expressed as a batch transform."""

    def __init__(self, step: int = 2, max_frames: int | None = None):
        self.step = max(1, step)
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        out_id, out_frame_idx, out_payload = [], [], []
        for mid, payload in zip(ids, batch.column("payload").to_pylist()):
            frames = _split_bmp_frames(payload)[:: self.step]
            if self.max_frames is not None:
                frames = frames[: self.max_frames]
            for fi, fr in enumerate(frames):
                out_id.append(mid)
                out_frame_idx.append(fi)
                out_payload.append(fr)
        return pa.table(
            {
                "media_id": pa.array(out_id, type=pa.int64()),
                "frame_idx": pa.array(out_frame_idx, type=pa.int32()),
                "payload": pa.array(out_payload, type=pa.binary()),
            }
        )


def frame_sample(
    media: ray.data.Dataset,
    step: int = 2,
    max_frames: int | None = None,
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 16,
) -> ray.data.Dataset:
    """Sample every ``step``-th frame from concatenated-BMP video payloads.

    Output rows (media_id, frame_idx, payload) are individual BMP images —
    feed them to :func:`decode_resize_images` or the ``bmp`` feature
    extractor.  Video rows in a compressed container raise (format-honest;
    see :func:`_split_bmp_frames`)."""
    return media.map_batches(
        _FrameSampler,
        fn_constructor_kwargs={"step": step, "max_frames": max_frames},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


def decode_resize_images(
    media: ray.data.Dataset,
    out_h: int,
    out_w: int,
    method: str = "bilinear",
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 64,
    fmt: str = "bmp",
) -> ray.data.Dataset:
    """Decode image rows (``fmt``: 'bmp' or 'png'), resize to
    (out_h, out_w), re-encode in the same format.

    Filter the input to ``media_type == 'image'`` rows first; payloads
    in the wrong format raise (the stage is format-honest, not
    best-effort).  Small ``batch_size`` keeps batch x concurrency of
    binary payloads inside the worker heap — the multimodal sizing
    rule."""
    return media.map_batches(
        _ImageResizer,
        fn_constructor_kwargs={
            "out_h": out_h,
            "out_w": out_w,
            "method": method,
            "fmt": fmt,
        },
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
