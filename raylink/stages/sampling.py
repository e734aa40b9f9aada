"""Deterministic, block-layout-independent row sampling.

``Dataset.random_sample(frac, seed=...)`` seeds its RNG per block, so the
rows it draws depend on block boundaries — which differ between a fresh
run and a resumed one (checkpointed stages reload with different block
layouts), and between parallelism levels.  The EM residual-u estimation
samples records, so that nondeterminism leaks into match weights: a
resumed run would emit slightly different zeta_j/weights than the run it
resumed (caught by ``bench.py --resume-proof``, round 3).

``deterministic_sample`` instead keeps a row iff its stable 64-bit id
hash falls below ``fraction`` of the hash space — a pure function of the
row, independent of blocks, order, parallelism, and resume state (same
principle as :mod:`raylink.ops.sample`'s MINSTD samplers, generalized to
any id type via ``hash64_array``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.hashing import hash64_array

__all__ = ["deterministic_sample"]


def deterministic_sample(
    ds: ray.data.Dataset, id_col: str, fraction: float, seed: int = 0
) -> ray.data.Dataset:
    """Keep rows whose stable id-hash falls in the lowest ``fraction`` of
    the 64-bit hash space (expected ``fraction * n`` rows, exact-set
    deterministic for a given ``(id_col, fraction, seed)``)."""
    if fraction >= 1.0:
        return ds
    thr = np.uint64(max(0, int(fraction * float(2**64))))

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        h = hash64_array(np.asarray(ids, dtype=object), seed=seed)
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(fn, batch_format="pyarrow")
