"""Approximate-nearest-neighbor search over an embedding column.

- :func:`ann_brute_force` — exact cosine top-k: the query matrix is
  broadcast once via ``ray.put``; each batch does one matmul against it and
  emits its local per-query top-k; the tiny candidate stream
  (O(num_blocks * Q * k)) reduces to the global top-k on the driver.  This is
  the baseline and the verification oracle.
- :func:`ann_lsh` — a scale path: random-hyperplane buckets over both
  vectors and queries; per-bucket exact scoring only.  Recall < 1 by design;
  returns the same schema so callers can swap it in.
- :func:`ann_ivf` — the other classic scale path: a coarse spherical
  k-means quantizer trained on a bounded driver sample, centroids broadcast
  once; each batch assigns its vectors to their nearest centroid and scores
  a query only against vectors in that query's ``nprobe`` closest lists.
  At cluster scale the assignment pass would additionally write
  list-partitioned parquet so later query batches read only probed lists;
  here the single streaming scan is the same pruned compute.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

__all__ = ["ann_brute_force", "ann_lsh", "ann_ivf"]


def _as_matrix(vectors) -> np.ndarray:
    """(N, d) float64 matrix from an embedding column or list of vectors.

    Arrow list columns take the zero-copy path: flatten + reshape (one
    buffer view, no per-row Python) when widths are uniform and null-free
    — at 10^9 vectors the per-row ``to_pylist`` conversion is the cost.
    """
    import pyarrow as pa

    if isinstance(vectors, (pa.Array, pa.ChunkedArray)):
        arr = (
            vectors.combine_chunks()
            if isinstance(vectors, pa.ChunkedArray)
            else vectors
        )
        if arr.null_count == 0:
            if pa.types.is_fixed_size_list(arr.type):
                flat = arr.flatten().to_numpy(zero_copy_only=False)
                return flat.astype(np.float64).reshape(len(arr), -1)
            if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
                widths = np.diff(arr.offsets.to_numpy())
                if len(widths) and (widths == widths[0]).all():
                    flat = arr.flatten().to_numpy(zero_copy_only=False)
                    return flat.astype(np.float64).reshape(
                        len(arr), int(widths[0])
                    )
        vectors = arr.to_pylist()
    if len(vectors) == 0:
        # width is unknowable without a row; callers early-return on
        # empty batches before doing dimension-dependent math
        return np.zeros((0, 0), dtype=np.float64)
    return np.stack([np.asarray(v, dtype=np.float64) for v in vectors])


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    return m / norms[:, None]


def ann_brute_force(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: list,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Exact cosine top-k.  Returns (query_id, vec_id, cosine, rank<=k)."""
    qm = _normalize(_as_matrix(queries))
    q_ref = ray.put(qm)

    def local_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        if len(batch) == 0:  # width-dependent math below can't run
            return pa.table(
                {
                    "qi": pa.array([], type=pa.int64()),
                    id_col: pa.array(
                        [], type=batch.schema.field(id_col).type
                    ),
                    "cosine": pa.array([], type=pa.float64()),
                }
            )
        emb = _normalize(_as_matrix(batch.column(emb_col)))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sims = emb @ q.T  # (B, Q)
        kk = min(k, sims.shape[0])
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, Q)
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[1]):
            rows = top[:, qi]
            out_q.extend([qi] * len(rows))
            out_id.extend(ids[rows])
            out_sim.extend(sims[rows, qi])
        return pa.table(
            {
                "qi": pa.array(out_q, type=pa.int64()),
                id_col: pa.array(
                    out_id, type=batch.schema.field(id_col).type
                ),
                "cosine": pa.array(out_sim, type=pa.float64()),
            }
        )

    cand = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    return _global_topk(cand, query_ids, id_col, k)


def ann_lsh(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: list,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 11,
    n_probes: int | None = None,
) -> pd.DataFrame:
    """Approximate top-k: score only vectors sharing a hyperplane sign
    bucket (or a Hamming-1 neighbor bucket) with the query in ANY of
    ``n_tables`` independent hash tables — the classic multi-table LSH
    recall lever: each table's probes cover ~(1+n_planes)/2^n_planes of the
    space, but coverage is proximity-correlated, so the union's recall
    grows much faster than its cost.  Same output schema as
    :func:`ann_brute_force`."""
    qm = _normalize(_as_matrix(queries))
    rng = np.random.default_rng(seed)
    planes = [
        rng.standard_normal((qm.shape[1], n_planes)) for _ in range(n_tables)
    ]
    if n_probes is None:
        n_probes = 1 + n_planes  # exact bucket + all Hamming-1 flips
    probe_keys = []  # per table: (Q, n_probes) arrays
    for t in range(n_tables):
        q_keys = _bucket_keys(qm, planes[t])
        per_q = []
        for qk in q_keys:
            ks = [qk] + [qk ^ (1 << b) for b in range(n_planes)]
            per_q.append(np.array(sorted(set(ks[:n_probes])), dtype=np.int64))
        probe_keys.append(per_q)
    state = {"planes": planes, "qm": qm, "probe_keys": probe_keys}
    s_ref = ray.put(state)

    def local_topk(batch: pa.Table) -> pa.Table:
        st = ray.get(s_ref)
        if len(batch) == 0:  # width-dependent math below can't run
            return pa.table(
                {
                    "qi": pa.array([], type=pa.int64()),
                    id_col: pa.array(
                        [], type=batch.schema.field(id_col).type
                    ),
                    "cosine": pa.array([], type=pa.float64()),
                }
            )
        emb = _normalize(_as_matrix(batch.column(emb_col)))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        keys = [_bucket_keys(emb, p) for p in st["planes"]]
        n_q = len(st["qm"])
        out_q, out_id, out_sim = [], [], []
        for qi in range(n_q):
            cand = np.zeros(len(emb), dtype=bool)
            for t in range(len(keys)):
                cand |= np.isin(keys[t], st["probe_keys"][t][qi])
            rows = np.flatnonzero(cand)
            if len(rows) == 0:
                continue
            sims = emb[rows] @ st["qm"][qi]
            kk = min(k, len(rows))
            top = np.argpartition(-sims, kk - 1)[:kk]
            out_q.extend([qi] * kk)
            out_id.extend(ids[rows[top]])
            out_sim.extend(sims[top])
        return pa.table(
            {
                "qi": pa.array(out_q, type=pa.int64()),
                id_col: pa.array(
                    out_id, type=batch.schema.field(id_col).type
                ),
                "cosine": pa.array(out_sim, type=pa.float64()),
            }
        )

    cand = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    return _global_topk(cand, query_ids, id_col, k)


def _train_centroids(
    X: np.ndarray, nlist: int, iters: int, seed: int
) -> np.ndarray:
    """Spherical k-means on unit vectors (deterministic, driver-side).

    The training set is a bounded sample, so this is O(sample * nlist *
    iters) regardless of dataset size.  Empty clusters are re-seeded from
    the points farthest from their centroid.
    """
    rng = np.random.default_rng(seed)
    n = len(X)
    nlist = min(nlist, n)
    C = X[rng.choice(n, size=nlist, replace=False)].copy()
    for _ in range(iters):
        sims = X @ C.T  # (n, nlist)
        assign = np.argmax(sims, axis=1)
        newC = np.zeros_like(C)
        np.add.at(newC, assign, X)
        counts = np.bincount(assign, minlength=nlist)
        empty = counts == 0
        if empty.any():
            # farthest-from-own-centroid points restart dead clusters
            far = np.argsort(sims[np.arange(n), assign])[: int(empty.sum())]
            newC[empty] = X[far]
            counts[empty] = 1
        newC /= counts[:, None]
        norms = np.linalg.norm(newC, axis=1)
        norms[norms == 0] = 1.0
        C = newC / norms[:, None]
    return C


def ann_ivf(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: list,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    nlist: int = 64,
    nprobe: int = 8,
    seed: int = 17,
    train_sample: int = 20_000,
    kmeans_iters: int = 8,
) -> pd.DataFrame:
    """IVF approximate top-k: score only vectors whose coarse-quantizer
    list is among the query's ``nprobe`` nearest lists.  Same output schema
    as :func:`ann_brute_force`; recall < 1 by design (graded in bench.py
    against the exact result)."""
    qm = _normalize(_as_matrix(queries))
    total = ds.count()
    frac = min(1.0, train_sample / max(total, 1))
    sample = (
        ds.select_columns([emb_col])
        .random_sample(frac, seed=seed)
        .limit(train_sample)
        .to_pandas()
    )
    X = _normalize(_as_matrix(sample[emb_col].to_numpy()))
    C = _train_centroids(X, nlist, kmeans_iters, seed)
    # per-query probe lists: the nprobe closest centroids
    q_sims = qm @ C.T  # (Q, nlist)
    npb = min(nprobe, C.shape[0])
    probe = np.argpartition(-q_sims, npb - 1, axis=1)[:, :npb]  # (Q, npb)
    state_ref = ray.put({"C": C, "qm": qm, "probe": probe})

    def local_topk(batch: pa.Table) -> pa.Table:
        st = ray.get(state_ref)
        if len(batch) == 0:  # width-dependent math below can't run
            return pa.table(
                {
                    "qi": pa.array([], type=pa.int64()),
                    id_col: pa.array(
                        [], type=batch.schema.field(id_col).type
                    ),
                    "cosine": pa.array([], type=pa.float64()),
                }
            )
        emb = _normalize(_as_matrix(batch.column(emb_col)))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        assign = np.argmax(emb @ st["C"].T, axis=1)  # (B,)
        out_q, out_id, out_sim = [], [], []
        for qi in range(len(st["qm"])):
            rows = np.flatnonzero(np.isin(assign, st["probe"][qi]))
            if len(rows) == 0:
                continue
            sims = emb[rows] @ st["qm"][qi]
            kk = min(k, len(rows))
            top = np.argpartition(-sims, kk - 1)[:kk]
            out_q.extend([qi] * kk)
            out_id.extend(ids[rows[top]])
            out_sim.extend(sims[top])
        return pa.table(
            {
                "qi": pa.array(out_q, type=pa.int64()),
                id_col: pa.array(
                    out_id, type=batch.schema.field(id_col).type
                ),
                "cosine": pa.array(out_sim, type=pa.float64()),
            }
        )

    cand = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    return _global_topk(cand, query_ids, id_col, k)


def _global_topk(
    cand: pd.DataFrame, query_ids: list, id_col: str, k: int
) -> pd.DataFrame:
    """Reduce the per-block candidate stream to the global top-k.

    One lexsort (qi asc, cosine desc, id asc tiebreak) + a run-slice
    keep-mask — no per-(query, rank) Python loop; the candidate set is
    bounded by blocks × queries × k but the vectorized path costs the
    same either way."""
    if len(cand) == 0:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=object),
                id_col: pd.Series([], dtype=object),
                "cosine": pd.Series([], dtype=np.float64),
                "rank": pd.Series([], dtype=np.int64),
            }
        )
    qi = cand["qi"].to_numpy(np.int64)
    cos = cand["cosine"].to_numpy(np.float64)
    ids = cand[id_col].to_numpy()
    # lexsort: LAST key is primary
    order = np.lexsort((ids, -cos, qi))
    qi, cos, ids = qi[order], cos[order], ids[order]
    new_run = np.r_[True, qi[1:] != qi[:-1]]
    starts = np.flatnonzero(new_run)
    run_id = np.cumsum(new_run) - 1
    pos_in_run = np.arange(len(qi)) - starts[run_id]
    keep = pos_in_run < k
    qarr = np.asarray(query_ids)
    return pd.DataFrame(
        {
            "query_id": qarr[qi[keep]],
            id_col: ids[keep],
            "cosine": cos[keep],
            "rank": (pos_in_run[keep] + 1).astype(np.int64),
        }
    )


def _bucket_keys(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    signs = (m @ planes) > 0
    keys = np.zeros(len(m), dtype=np.int64)
    for p in range(planes.shape[1]):
        keys |= signs[:, p].astype(np.int64) << p
    return keys
