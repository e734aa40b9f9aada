"""Semantic deduplication (the SemDeDup recipe, Abbas et al. 2023,
arXiv:2303.09540): k-means the embedding space so that near-duplicates
land in the same cluster, verify with exact cosine INSIDE clusters only,
and keep one representative per duplicate group — all-pairs cosine over
the corpus never happens; the k-means partition bounds the quadratic
work to O(Σ cluster²).

Composition of existing machinery (the near_dedup_corpus shape with an
embedding front end):

1. ``kmeans_fit`` (moment partials, rows never shuffle) + map-only
   assignment that also records each vector's cosine to its centroid;
2. one ``sorted_group_scan`` over the cluster id: per cluster, exact
   pairwise cosine over unit vectors (one matmul), pairs >= threshold;
   clusters larger than ``cluster_cap`` are EXCLUDED up front (their
   member count is known from a k-row count table) and counted — the
   cap bounds the per-task O(c²) work, refusing is visible, silent
   quadratic blowup is not;
3. connected components over the pair edges (duplicate groups are
   transitive);
4. one keeper per group: ``min_id`` (deterministic baseline) or the
   paper's ``low_centroid_sim`` (keep the member FARTHEST from its
   centroid — the least redundant example survives);
5. anti-join the losers out of the input.

Embedding vectors ride the one cluster sort as float32 bytes; clusters,
pairs, components and keepers are id-only tables.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..ops.ann import _as_matrix
from ..ops.joins import broadcast_join
from ..ops.kmeans import kmeans_fit
from ..ops.semijoin import semi_anti_join
from ..stages.cluster import connected_components
from ..stages.sortedrun import sorted_group_scan
from .neardedup import collapse_to_keepers

__all__ = ["semantic_dedup"]


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def semantic_dedup(
    embeds: ray.data.Dataset,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 32,
    threshold: float = 0.95,
    keeper: str = "min_id",
    cluster_cap: int = 4000,
    seed: int = 99,
    kmeans_iters: int = 10,
    num_partitions: int = 16,
    broadcast_limit: int = 2_000_000,
) -> tuple[ray.data.Dataset, dict]:
    """Returns ``(kept_rows, counters)``: the input with every semantic
    duplicate group collapsed to one representative, plus counters
    ``{n_vecs, n_pairs, n_oversized_clusters, n_excluded, n_kept,
    n_dropped}``."""
    if keeper not in ("min_id", "low_centroid_sim"):
        raise ValueError(f"unknown keeper strategy: {keeper!r}")

    centroids, _ = kmeans_fit(
        embeds, emb_col, id_col, k=k, n_iters=kmeans_iters, seed=seed
    )
    cu = _normalize_rows(np.asarray(centroids, dtype=np.float64))
    c_ref = ray.put((np.asarray(centroids, dtype=np.float64), cu))

    def assign(t: pa.Table) -> pa.Table:
        cents, cents_u = ray.get(c_ref)
        m = _as_matrix(t.column(emb_col))
        if len(m) == 0:
            return pa.table(
                {
                    id_col: t.column(id_col),
                    "cluster": pa.array([], type=pa.int64()),
                    "c_sim_e6": pa.array([], type=pa.int64()),
                    "unit": pa.array([], type=pa.binary()),
                }
            )
        d2 = (
            (m * m).sum(axis=1)[:, None]
            - 2.0 * m @ cents.T
            + (cents * cents).sum(axis=1)[None, :]
        )
        cl = np.argmin(d2, axis=1)
        mu = _normalize_rows(m)
        c_sim = np.einsum("ij,ij->i", mu, cents_u[cl])
        unit32 = mu.astype(np.float32)
        return pa.table(
            {
                id_col: t.column(id_col),
                "cluster": pa.array(cl.astype(np.int64)),
                "c_sim_e6": pa.array(
                    np.floor(c_sim * 1_000_000 + 0.5).astype(np.int64)
                ),
                "unit": pa.array(
                    [r.tobytes() for r in unit32], type=pa.binary()
                ),
            }
        )

    assigned = embeds.select_columns([id_col, emb_col]).map_batches(
        assign, batch_format="pyarrow"
    ).materialize()
    n_vecs = assigned.count()
    counters: dict = {"n_vecs": int(n_vecs)}

    # cluster sizes are a <= k-row table: pull, exclude oversized up front
    # (count_by_key: combiner-first, only per-block partials shuffle)
    from ..stages.sortedrun import count_by_key

    sizes = count_by_key(assigned, "cluster", num_partitions).to_pandas()
    oversized = set(
        sizes[sizes["count()"] > cluster_cap]["cluster"].tolist()
    )
    counters["n_oversized_clusters"] = len(oversized)
    counters["n_excluded"] = int(
        sizes[sizes["count()"] > cluster_cap]["count()"].sum()
    )
    pool = assigned
    if oversized:
        ov_ref = ray.put(oversized)

        def drop_ov(batch: dict[str, np.ndarray]) -> dict:
            ov = ray.get(ov_ref)
            cl = np.asarray(batch["cluster"])
            keep = ~np.isin(cl, list(ov))
            return {c: np.asarray(batch[c])[keep] for c in batch}

        pool = assigned.map_batches(drop_ov, batch_format="numpy")

    def cluster_pairs(batch: dict[str, np.ndarray]) -> dict:
        ids = np.asarray(batch[id_col])
        blobs = batch["unit"]
        n = len(ids)
        if n < 2:
            return {
                "id_a": ids[:0],
                "id_b": ids[:0],
                "sim_e6": np.empty(0, dtype=np.int64),
            }
        m = np.stack(
            [np.frombuffer(b, dtype=np.float32) for b in blobs]
        ).astype(np.float64)
        sim = m @ m.T
        ia, ib = np.triu_indices(n, k=1)
        hit = sim[ia, ib] >= threshold
        a, b = ids[ia[hit]], ids[ib[hit]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return {
            "id_a": lo,
            "id_b": hi,
            "sim_e6": np.floor(
                sim[ia[hit], ib[hit]] * 1_000_000 + 0.5
            ).astype(np.int64),
        }

    def empty_pairs(batch: dict[str, np.ndarray]) -> dict:
        ids = np.asarray(batch[id_col])[:0]
        return {
            "id_a": ids,
            "id_b": ids,
            "sim_e6": np.empty(0, dtype=np.int64),
        }

    pairs = sorted_group_scan(
        pool, "cluster", cluster_pairs, empty_pairs, num_partitions
    ).materialize()
    n_pairs = pairs.count()
    counters["n_pairs"] = int(n_pairs)
    if n_pairs == 0:
        counters["n_kept"] = int(n_vecs)
        counters["n_dropped"] = 0
        return embeds, counters

    edges = pairs.select_columns(["id_a", "id_b"])
    # CC nodes = distinct PAIR ENDPOINTS only (duplicate-group members,
    # a small fraction of the corpus) — labeling every input id would
    # make cc corpus-sized and sink the keeper join below
    from ..stages.sortedrun import count_by_key

    endpoints = edges.map_batches(
        lambda t: pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        t.column("id_a").combine_chunks().cast(
                            t.schema.field("id_a").type
                        ),
                        t.column("id_b").combine_chunks().cast(
                            t.schema.field("id_a").type
                        ),
                    ]
                )
            }
        ),
        batch_format="pyarrow",
    )
    nodes = count_by_key(
        endpoints, "node", num_partitions
    ).select_columns(["node"])
    cc = connected_components(edges, nodes, num_partitions=num_partitions)

    if keeper == "min_id":
        kept = collapse_to_keepers(embeds, cc, id_col, num_partitions)
        n_kept = kept.count()
        counters["n_kept"] = int(n_kept)
        counters["n_dropped"] = int(n_vecs - n_kept)
        return kept, counters
    else:
        # paper keeper: the member FARTHEST from its centroid survives.
        # cc holds only duplicate-group members (nodes above are pair
        # endpoints, not the corpus — guarded by broadcast_limit); their
        # centroid sims stream in via one broadcast join against the
        # assignment table.
        scored = broadcast_join(
            assigned.select_columns([id_col, "c_sim_e6"]),
            cc,
            on=id_col,
            right_on="node",
            broadcast_limit=broadcast_limit,
        )

        def pick(batch: dict[str, np.ndarray]) -> dict:
            ids = np.asarray(batch[id_col])
            sims = np.asarray(batch["c_sim_e6"])
            w = int(np.lexsort((ids, sims))[0])  # min sim, tie min id
            return {id_col: np.delete(ids, w)}

        def empty_pick(batch: dict[str, np.ndarray]) -> dict:
            return {id_col: np.asarray(batch[id_col])[:0]}

        losers = sorted_group_scan(
            scored, "entity", pick, empty_pick, num_partitions
        )

    kept = semi_anti_join(
        embeds, losers, id_col, anti=True, num_partitions=num_partitions
    )
    n_kept = kept.count()
    counters["n_kept"] = int(n_kept)
    counters["n_dropped"] = int(n_vecs - n_kept)
    return kept, counters
