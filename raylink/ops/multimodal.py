"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video are opaque ``binary`` columns with metadata columns
(``media_type``, ``width``/``height`` or ``sample_rate``/``duration``).  The
Ray-side plumbing — schema, actor-pool stage shape, batch sizing, output
layout — is real and tested; the *codec* step is stubbed because no
image/audio libraries exist in this environment:

- default: ``decoder="stub"`` raises ``NotImplementedError`` with guidance;
- ``decoder="fake"`` produces a deterministic feature vector from the payload
  bytes, so pipelines and tests exercise the full data path.

Swap in a real decoder by passing any callable ``bytes -> np.ndarray``.
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
    """Deterministic synthetic media rows (payload = pseudo-random bytes)."""
    rng = np.random.default_rng(seed)
    types = np.array(["image", "audio", "video"])[rng.integers(0, 3, size=n)]
    payloads = [rng.integers(0, 256, size=int(rng.integers(256, 4096)), dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "media_type": pa.array(types.tolist()),
            "payload": pa.array(payloads, type=pa.binary()),
            "width": pa.array(rng.integers(64, 1920, size=n).astype(np.int32)),
            "height": pa.array(rng.integers(64, 1080, size=n).astype(np.int32)),
            "sample_rate": pa.array(np.full(n, 16000, dtype=np.int32)),
            "duration_ms": pa.array(rng.integers(100, 60000, size=n).astype(np.int32)),
        }
    )


def _stub_decoder(payload: bytes) -> np.ndarray:
    raise NotImplementedError(
        "media decoding requires an image/audio codec library, which is not "
        "available in this environment; pass decoder='fake' for the "
        "deterministic test decoder or supply your own bytes -> ndarray "
        "callable"
    )


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
        else:
            self.decode = decoder
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = [self.decode(p).astype(np.float32).tobytes() for p in payloads]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "media_type": batch.column("media_type"),
                "features": pa.array(feats, type=pa.binary()),
                "feat_dim": pa.array(
                    np.full(len(feats), self.dim, dtype=np.int32)
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
