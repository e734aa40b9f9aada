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
    local_threshold: int = 8_000_000,
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
    # 64-bit collision in a <=8M-edge problem is ~1e-5 and only matters if
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


def _ff_labels(key: np.ndarray, kind: np.ndarray, lab: np.ndarray):
    """Forward-fill each key-run's label row (kind==0, sorted first in the
    run) onto the rows below it.  Returns (filled_label, has_label) —
    ``has_label`` is False where the run's label row is absent (straddles a
    block boundary)."""
    n = len(key)
    pos = np.arange(n, dtype=np.int64)
    lab_pos = np.where(kind == 0, pos, np.int64(-1))
    ff = np.maximum.accumulate(lab_pos)
    has = ff >= 0
    safe = np.where(has, ff, 0)
    has &= key[safe] == key  # the filled label must come from the same run
    return lab[safe], has


def connected_components_distributed(
    edges: ray.data.Dataset,
    nodes: ray.data.Dataset,
    node_col: str = "node",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    num_partitions: int = 16,
    max_rounds: int = 50,
) -> ray.data.Dataset:
    """Min-label propagation until fixpoint, expressed as two sorted-run
    co-scans per round (the sort IS the hash-partitioned groupby-aggregate
    — both are all-to-all exchanges on the key; the scan replaces Ray's
    per-row Python aggregate with numpy run detection):

    phase A  sort(union(labels as key=node, edges as key=src)) — each key
             run starts with its label row; forward-fill emits the message
             ``(dst, label[src])`` for every edge row (a map-side join).
    phase B  sort(union(labels as key=node, messages as key=dst)) — per
             run, ``new_label = min(old, min(messages))`` via reduceat.

    Runs whose label row landed in a different block (at most 2 key values
    per block) are repaired through a tiny real ``groupby``.  Labels only
    decrease; the per-round ``changed`` sum is the fixpoint detector.
    Rounds are bounded by component diameter — duplicate clusters are
    near-cliques, so 2-4 rounds in practice.
    """

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

    n_parts = max(num_partitions, 16)

    def _boundary_mask(key: np.ndarray) -> np.ndarray:
        if len(key) == 0:
            return np.zeros(0, dtype=bool)
        return (key == key[0]) | (key == key[-1])

    # ---- phase A: map-side join labels onto edge srcs -> messages --------
    def a_interior(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        key = np.asarray(batch["key"])
        kind = np.asarray(batch["kind"])
        lab = np.asarray(batch["lab"])
        aux = np.asarray(batch["aux"])
        keep = ~_boundary_mask(key)
        filled, has = _ff_labels(key, kind, lab)
        emit = keep & (kind == 1)
        if not bool(has[emit].all()):
            raise ValueError("edge endpoint missing from the node set")
        # per-block combiner: one (dst, min label) row per distinct dst
        dsts = aux[emit]
        labs = filled[emit]
        order = np.argsort(dsts, kind="stable")
        dsts, labs = dsts[order], labs[order]
        if len(dsts):
            starts = np.flatnonzero(
                np.concatenate(([True], dsts[1:] != dsts[:-1]))
            )
            dsts = dsts[starts]
            labs = np.minimum.reduceat(labs, starts)
        return {"key": dsts, "lab": labs}

    def a_boundary_rows(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        key = np.asarray(batch["key"])
        m = _boundary_mask(key)
        return {k: np.asarray(v)[m] for k, v in batch.items()}

    def a_merge(group: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        kind = np.asarray(group["kind"])
        lab = np.asarray(group["lab"])
        aux = np.asarray(group["aux"])
        lab_rows = np.flatnonzero(kind == 0)
        if len(lab_rows) == 0:
            raise ValueError("edge endpoint missing from the node set")
        dsts = aux[kind == 1]
        return {"key": dsts, "lab": np.repeat(lab[lab_rows[0:1]], len(dsts))}

    # ---- phase B: per-node min(old label, incoming messages) -------------
    def b_interior(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        key = np.asarray(batch["key"])
        kind = np.asarray(batch["kind"])
        lab = np.asarray(batch["lab"])
        keep = ~_boundary_mask(key)
        key, kind, lab = key[keep], kind[keep], lab[keep]
        if len(key) == 0:
            return {"node": key, "label": lab, "changed": np.zeros(0, np.int64)}
        starts = np.flatnonzero(np.concatenate(([True], key[1:] != key[:-1])))
        old = lab[starts]  # kind sorts label rows first within each run
        new = np.minimum.reduceat(lab, starts)
        return {
            "node": key[starts],
            "label": new,
            "changed": (new < old).astype(np.int64),
        }

    def b_boundary_rows(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        key = np.asarray(batch["key"])
        m = _boundary_mask(key)
        return {k: np.asarray(v)[m] for k, v in batch.items()}

    def b_merge(group: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        kind = np.asarray(group["kind"])
        lab = np.asarray(group["lab"])
        old = lab[np.flatnonzero(kind == 0)[0]]
        new = lab.min()
        return {
            "node": [np.asarray(group["key"])[0]],
            "label": [new],
            "changed": [np.int64(1 if new < old else 0)],
        }

    # placeholder columns reuse the key column so int and string node ids
    # both type-unify; kind==1 rows' lab and kind==0 rows' aux are never read
    edge_rows = sym_edges.map_batches(
        lambda b: pa.table(
            {
                "key": b.column("src"),
                "kind": pa.array(np.ones(len(b), dtype=np.int8)),
                "lab": b.column("src"),
                "aux": b.column("dst"),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(max_rounds):
        label_rows = labels.map_batches(
            lambda b: pa.table(
                {
                    "key": b.column("node"),
                    "kind": pa.array(np.zeros(len(b), dtype=np.int8)),
                    "lab": b.column("label"),
                    "aux": b.column("node"),
                }
            ),
            batch_format="pyarrow",
        )
        tagged = (
            label_rows.union(edge_rows)
            .repartition(n_parts)
            .sort(["key", "kind"])
            .materialize()
        )
        msgs = tagged.map_batches(
            a_interior, batch_format="numpy", batch_size=None
        ).union(
            tagged.map_batches(a_boundary_rows, batch_format="numpy", batch_size=None)
            .groupby("key")
            .map_groups(a_merge, batch_format="numpy")
        )
        msg_rows = msgs.map_batches(
            lambda b: pa.table(
                {
                    "key": b.column("key"),
                    "kind": pa.array(np.ones(len(b), dtype=np.int8)),
                    "lab": b.column("lab"),
                }
            ),
            batch_format="pyarrow",
        )
        label_rows_b = labels.map_batches(
            lambda b: pa.table(
                {
                    "key": b.column("node"),
                    "kind": pa.array(np.zeros(len(b), dtype=np.int8)),
                    "lab": b.column("label"),
                }
            ),
            batch_format="pyarrow",
        )
        tagged_b = (
            label_rows_b.union(msg_rows)
            .repartition(n_parts)
            .sort(["key", "kind"])
            .materialize()
        )
        new_labels = tagged_b.map_batches(
            b_interior, batch_format="numpy", batch_size=None
        ).union(
            tagged_b.map_batches(b_boundary_rows, batch_format="numpy", batch_size=None)
            .groupby("key")
            .map_groups(b_merge, batch_format="numpy")
        ).materialize()
        changed = new_labels.sum("changed")
        labels = new_labels.drop_columns(["changed"]).materialize()
        if not changed:
            break

    return labels.map_batches(
        lambda b: pa.table({node_col: b.column("node"), "entity": b.column("label")}),
        batch_format="pyarrow",
    )
