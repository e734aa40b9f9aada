"""End-to-end near-duplicate corpus dedup: the complete story.

`minhash_lsh_dedup` emits near-dup PAIRS; production dedup needs the
deduplicated CORPUS — pairs chained into transitive clusters (a~b, b~c
collapse even when a!~c), one keeper per cluster, everything else
dropped.  This pipeline composes the existing machinery:

1. banded minhash LSH pairs (one sorted bucket scan, first-band-wins);
2. connected components over the pair edges (driver path below the
   edge threshold, the distributed label-propagation co-scan above it);
3. per-cluster keeper (min id) via ONE sorted-run scan
   (``exact_dedup_edges`` on the (entity, node) table — no join);
4. drop non-keepers from the corpus with the semi-join's broadcast /
   co-scan key filter.

Every stage is a streaming Dataset transform; the corpus text shuffles
exactly once (inside the LSH signature scan), clusters and keepers are
id-only tables.  Deterministic: same corpus -> same pairs -> same
clusters -> same keepers at any parallelism.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..ops.dedup import exact_dedup_edges, minhash_lsh_dedup
from ..ops.semijoin import semi_anti_join
from ..stages.cluster import connected_components

__all__ = ["near_dedup_corpus", "collapse_to_keepers"]


def collapse_to_keepers(
    ds: ray.data.Dataset,
    cc: ray.data.Dataset,
    id_col: str,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Shared keeper tail for every pairs→clusters dedup pipeline: one
    sorted scan pairs each ``cc`` node with its component's min id
    (``exact_dedup_edges`` — no join), non-keepers become the loser set,
    and one anti-join filters them out of ``ds``."""
    keepers = exact_dedup_edges(
        cc, "entity", "node", num_partitions=num_partitions
    )

    def dropped_ids(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        node = np.asarray(batch["node"])
        keep = np.asarray(batch["keep_node"])
        return {id_col: node[node != keep]}

    losers = keepers.map_batches(dropped_ids, batch_format="numpy")
    return semi_anti_join(
        ds, losers, id_col, anti=True, num_partitions=num_partitions
    )


def near_dedup_corpus(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    seed: int = 4242,
    num_partitions: int = 16,
) -> tuple[ray.data.Dataset, dict]:
    """Returns ``(kept_docs, counters)``: the corpus with every
    near-duplicate cluster collapsed to its minimum-id member, plus
    ``{"n_pairs", "n_docs", "n_kept", "n_dropped"}``."""
    pairs = minhash_lsh_dedup(
        docs.select_columns([id_col, text_col]),
        text_col,
        id_col,
        num_perm=num_perm,
        bands=bands,
        shingle_k=shingle_k,
        threshold=threshold,
        seed=seed,
    ).materialize()
    n_pairs = pairs.count()
    n_docs = docs.count()
    counters = {"n_pairs": int(n_pairs), "n_docs": int(n_docs)}
    if n_pairs == 0:
        counters["n_kept"] = int(n_docs)
        counters["n_dropped"] = 0
        return docs, counters

    edges = pairs.map_batches(
        lambda t: pa.table(
            {"id_a": t.column("id_a"), "id_b": t.column("id_b")}
        ),
        batch_format="pyarrow",
    )
    nodes = docs.map_batches(
        lambda t: pa.table({"node": t.column(id_col)}),
        batch_format="pyarrow",
    )
    cc = connected_components(
        edges, nodes, num_partitions=num_partitions
    )
    kept = collapse_to_keepers(docs, cc, id_col, num_partitions)
    n_kept = kept.count()
    counters["n_kept"] = int(n_kept)
    counters["n_dropped"] = int(n_docs - n_kept)
    return kept, counters
