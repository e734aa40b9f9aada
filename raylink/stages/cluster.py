"""Transitive clustering (connected components) over matched pairs.

The north star requires entity clusters via "iterative hash-partitioned
min-label propagation (connected components) expressed as repeated
groupby-aggregate rounds until fixpoint" — the reference has no dedupe code
path at all (SURVEY.md §2.7), so this stage is new capability.

Two implementations:

- :func:`connected_components_distributed` — label propagation on Datasets:
  each round joins current labels onto the (symmetrized) edge list, emits
  ``(dst, src_label)`` messages, and takes a per-node ``min`` over messages +
  current labels (one hash join + one groupby per round).  Labels only
  decrease, so ``sum(labels)`` is a monotone fixpoint detector.  Rounds are
  bounded by component diameter (duplicate clusters are tiny; cf. PAPERS.md
  "connected components in map-reduce in logarithmic rounds" for the
  log-round variants if ever needed).
- :func:`connected_components_local` — driver-side union-find, streaming the
  edge list with ``iter_batches``.  Used below ``local_threshold`` edges where
  a shuffle round-trip per iteration costs more than the whole problem.

Both return ``(node, entity)`` with ``entity`` = the component's minimum
node id, so results are deterministic and identical between paths.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

__all__ = [
    "connected_components",
    "connected_components_local",
    "connected_components_distributed",
]


def connected_components(
    edges: ray.data.Dataset,
    nodes: ray.data.Dataset,
    node_col: str = "node",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    local_threshold: int = 2_000_000,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Cluster nodes by the edge list; auto-select local vs distributed."""
    n_edges = edges.count()
    if n_edges <= local_threshold:
        return connected_components_local(edges, nodes, node_col, src_col, dst_col)
    return connected_components_distributed(
        edges, nodes, node_col, src_col, dst_col, num_partitions=num_partitions
    )


def connected_components_local(
    edges: ray.data.Dataset,
    nodes: ray.data.Dataset,
    node_col: str = "node",
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> ray.data.Dataset:
    """Driver-side CC, fully vectorized: integer-code the edge endpoints
    (``np.unique`` — code order is id order, so min code == min id), then
    scatter-min label propagation (``np.minimum.at``) with pointer jumping
    until the edge fixpoint.  O(E · log n) C-speed work, no Python loop."""
    from ..functions.hashing import hash64_array

    # Endpoint identity travels as int64 hashes: the union-find state shipped
    # to the labeling tasks is then numeric (zero-copy from the object store
    # — an object-dtype string array would re-unpickle per task), and only
    # one small string array (one min-id per component) rides along.  A
    # 64-bit collision in a <=2M-edge problem is ~1e-7 and only matters if
    # both colliding ids are edge endpoints.
    parts_a: list[np.ndarray] = []
    parts_b: list[np.ndarray] = []
    for batch in edges.select_columns([src_col, dst_col]).iter_batches(
        batch_size=1_048_576, batch_format="pyarrow"
    ):
        parts_a.append(batch.column(src_col).to_numpy(zero_copy_only=False))
        parts_b.append(batch.column(dst_col).to_numpy(zero_copy_only=False))
    if parts_a:
        ids = np.concatenate(parts_a + parts_b)
        h = hash64_array(ids).astype(np.int64)
        uniq_h, first_idx, codes = np.unique(
            h, return_index=True, return_inverse=True
        )
        n_edges = len(h) // 2
        eu, ev = codes[:n_edges], codes[n_edges:]
        lab = np.arange(len(uniq_h), dtype=np.int64)
        while True:
            np.minimum.at(lab, eu, lab[ev])
            np.minimum.at(lab, ev, lab[eu])
            while True:
                jumped = lab[lab]
                if np.array_equal(jumped, lab):
                    break
                lab = jumped
            if np.array_equal(lab[eu], lab[ev]):
                break
        # entity = min id per component, over the unique endpoints only
        uniq_ids = ids[first_idx]
        try:  # polars group_by is ~6x the numpy argsort path on strings
            import polars as pl

            m = (
                pl.DataFrame({"lab": lab, "id": pl.Series(uniq_ids)})
                .group_by("lab")
                .agg(pl.col("id").min())
                .sort("lab")
            )
            comp_sorted = m["lab"].to_numpy()
            comp_min_ids = m["id"].to_numpy()
        except ImportError:
            order = np.argsort(uniq_ids, kind="stable")
            comp_sorted, comp_first = np.unique(lab[order], return_index=True)
            comp_min_ids = uniq_ids[order[comp_first]]
        # remap lab -> dense component index aligned with comp_min_ids
        comp_of_endpoint = np.searchsorted(comp_sorted, lab).astype(np.int64)
    else:
        uniq_h = np.empty(0, dtype=np.int64)
        comp_of_endpoint = np.empty(0, dtype=np.int64)
        comp_min_ids = np.empty(0, dtype=object)
    roots_ref = ray.put((uniq_h, comp_of_endpoint, comp_min_ids))

    def label(batch: pa.Table) -> pa.Table:
        uh, comp, cmin = ray.get(roots_ref)
        vals = batch.column(node_col).to_numpy(zero_copy_only=False)
        ent = vals.copy()
        if len(uh):
            hv = hash64_array(vals).astype(np.int64)
            pos = np.searchsorted(uh, hv)
            pos_c = np.clip(pos, 0, len(uh) - 1)
            hit = uh[pos_c] == hv
            ent[hit] = cmin[comp[pos_c[hit]]]
        return pa.table(
            {
                node_col: batch.column(node_col),
                "entity": pa.array(ent, type=batch.column(node_col).type),
            }
        )

    return nodes.select_columns([node_col]).map_batches(label, batch_format="pyarrow")


def connected_components_distributed(
    edges: ray.data.Dataset,
    nodes: ray.data.Dataset,
    node_col: str = "node",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    num_partitions: int = 16,
    max_rounds: int = 50,
) -> ray.data.Dataset:
    """Min-label propagation as repeated join + groupby-min rounds."""

    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column(src_col)
        b = batch.column(dst_col)
        return pa.table(
            {
                "src": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
                "dst": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()]),
            }
        )

    sym_edges = edges.select_columns([src_col, dst_col]).map_batches(
        sym, batch_format="pyarrow"
    ).materialize()

    labels = nodes.select_columns([node_col]).map_batches(
        lambda b: pa.table({"node": b.column(node_col), "label": b.column(node_col)}),
        batch_format="pyarrow",
    ).materialize()

    def apply_mins(batch: pa.Table) -> pa.Table:
        old = batch.column("label").to_numpy(zero_copy_only=False)
        msg = batch.column("min_msg").to_numpy(zero_copy_only=False)
        # null-safe elementwise min (no message -> keep old label)
        if np.issubdtype(old.dtype, np.number) and msg.dtype != object:
            has = ~np.isnan(msg) if np.issubdtype(msg.dtype, np.floating) else np.ones(len(msg), bool)
            filled = np.where(has, msg, old)
            take = has & (filled < old)
        else:
            has = np.array([m is not None and m == m for m in msg], dtype=bool)
            take = has & np.array(
                [m < o for m, o in zip(np.where(has, msg, old), old)], dtype=bool
            )
        new = old.copy()
        new[take] = msg[take]
        return pa.table(
            {
                "node": batch.column("node"),
                "label": pa.array(new, type=batch.column("label").type),
                "changed": pa.array(take.astype(np.int64), type=pa.int64()),
            }
        )

    for _ in range(max_rounds):
        # messages: for each edge (src, dst), dst receives src's current label
        msgs = sym_edges.join(
            labels,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("node",),
        ).map_batches(
            lambda b: pa.table({"node": b.column("dst"), "label": b.column("label")}),
            batch_format="pyarrow",
        )
        mins = msgs.groupby("node").min("label").map_batches(
            lambda b: pa.table(
                {"node": b.column("node"), "min_msg": b.column("min(label)")}
            ),
            batch_format="pyarrow",
        )
        new_labels = labels.join(
            mins,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("node",),
        ).map_batches(apply_mins, batch_format="pyarrow").materialize()
        changed = new_labels.sum("changed")
        labels = new_labels.drop_columns(["changed"]).materialize()
        if not changed:
            break

    return labels.map_batches(
        lambda b: pa.table({node_col: b.column("node"), "entity": b.column("label")}),
        batch_format="pyarrow",
    )
