"""Distributed graph analytics over edge tables: PageRank.

Completes the repo's graph family (connected components live in
``stages/cluster.py``) with the canonical iterative-centrality algorithm
(Brin & Page 1998, damped random walk with uniform teleport).  Iterative
scoring has no SQL twin, so the correctness evidence is a dense
power-iteration parity test — same semantics, numpy, one machine.

Two execution paths, switched on the NODE count (the loop state), never
the edge count — edges stream through ``map_batches`` in both:

- **broadcast path** (node count ≤ ``broadcast_threshold``): the rank
  vector is a per-iteration ``ray.put`` lookup (the brief's
  small-side-broadcast rule — a rank vector is exactly a small dimension
  table), each iteration is ONE edge scan + a partials-only grouped sum;
  no join machinery, no per-iteration aggregator actors.
- **join path** (web-scale node sets that fit no single heap): edges pay
  their out-degree join once up front, then per iteration a hash-shuffle
  join against the distributed rank table + a partials-only grouped sum
  + a nodes LEFT JOIN to restore never-linked nodes.

Both paths quantize per-edge contributions to e12 fixed point, so the
sum-by-destination is associative and the whole run is bit-identical at
any parallelism — float accumulation order can never make two cluster
sizes disagree.  Dangling (out-degree-0) mass needs no anti-join in
either path: linked sources emit exactly their rank mass, so
``1 - sum(contribs)`` IS the dangling mass — one driver scalar per
iteration.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..stages.sortedrun import count_by_key, sum_by_key
from .joins import hash_join

__all__ = ["pagerank"]

_E12 = 1_000_000_000_000


def _normalize_edges(
    edges: ray.data.Dataset,
    src_col: str,
    dst_col: str,
    weight_col: str | None,
) -> ray.data.Dataset:
    cols = [src_col, dst_col] + ([weight_col] if weight_col else [])

    def edge_cols(batch: pa.Table) -> pa.Table:
        s, d = batch.column(src_col), batch.column(dst_col)
        if pc.any(pc.is_null(s)).as_py() or pc.any(pc.is_null(d)).as_py():
            raise ValueError("null node ids are unsupported; filter first")
        out = {"src": s.cast(pa.int64()), "dst": d.cast(pa.int64())}
        if weight_col:
            w = batch.column(weight_col)
            if not pa.types.is_integer(w.type):
                raise TypeError(
                    f"{weight_col} must be integer-typed for exact "
                    "order-independent strength sums; fixed-point encode "
                    "floats first"
                )
            wv = w.cast(pa.int64())
            if len(wv):
                # validity FIRST: an all-null batch would make min()
                # return None and silently skip the positivity check
                if not pc.all(pc.is_valid(wv)).as_py():
                    raise ValueError(
                        "edge weights must be positive and non-null"
                    )
                if pc.min(wv).as_py() <= 0:
                    raise ValueError(
                        "edge weights must be positive and non-null"
                    )
            out["w"] = wv
        return pa.table(out)

    return edges.select_columns(cols).map_batches(
        edge_cols, batch_format="pyarrow"
    )


def pagerank(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    n_iter: int = 20,
    num_partitions: int = 32,
    broadcast_threshold: int = 5_000_000,
    weight_col: str | None = None,
) -> ray.data.Dataset:
    """Damped PageRank over a directed edge table (int64 node ids,
    parallel edges count double — pre-dedup if unwanted).  Returns
    ``(node int64, rank float64)`` summing to 1; dangling mass and
    teleport are redistributed uniformly (the standard formulation).

    With ``weight_col`` (positive int64 — fixed-point encode floats),
    each source splits its rank proportionally to edge weight instead of
    uniformly; out-strength sums stay exact int64 so the
    any-parallelism bit-identity guarantee is unchanged.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1): {damping}")
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")

    e = _normalize_edges(edges, src_col, dst_col, weight_col).materialize()

    # node universe: every id that appears on either side
    def both_sides(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        batch.column("src").combine_chunks(),
                        batch.column("dst").combine_chunks(),
                    ]
                )
            }
        )

    nodes = (
        count_by_key(
            e.map_batches(both_sides, batch_format="pyarrow"), "node"
        )
        .select_columns(["node"])
        .materialize()
    )
    n = nodes.count()
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], type=pa.int64()),
                    "rank": pa.array([], type=pa.float64()),
                }
            )
        )
    if weight_col:
        deg = sum_by_key(e, "src", "w", num_partitions=num_partitions)
        deg = deg.map_batches(
            lambda b: b.rename_columns(["src", "count()"]),
            batch_format="pyarrow",
        )
    else:
        deg = count_by_key(e, "src")
    if n <= broadcast_threshold:
        return _pagerank_broadcast(e, nodes, deg, n, damping, n_iter)
    return _pagerank_join(
        e, nodes, deg, n, damping, n_iter, num_partitions
    )


def _pagerank_broadcast(
    e: ray.data.Dataset,
    nodes: ray.data.Dataset,
    deg: ray.data.Dataset,
    n: int,
    damping: float,
    n_iter: int,
) -> ray.data.Dataset:
    """Rank vector on the driver, broadcast per iteration; each iteration
    is one edge scan + a partials-only grouped sum."""
    node_arr = np.sort(
        nodes.to_pandas()["node"].to_numpy().astype(np.int64)
    )
    ddf = deg.to_pandas()
    deg_arr = np.zeros(n, dtype=np.int64)
    deg_arr[np.searchsorted(node_arr, ddf["src"].to_numpy())] = ddf[
        "count()"
    ].to_numpy()
    nodes_ref = ray.put(node_arr)

    rank = np.full(n, 1.0 / n)
    teleport = (1.0 - damping) / n
    for _ in range(n_iter):
        # per-source share = rank(src)/out-degree-or-strength(src),
        # one plasma object per iteration, read zero-copy by every task
        # (weighted graphs multiply by the edge weight inside the task)
        w_arr = np.zeros(n)
        has_out = deg_arr > 0
        w_arr[has_out] = rank[has_out] / deg_arr[has_out]
        w_ref = ray.put(w_arr)

        def contrib(batch: pa.Table, _nref=nodes_ref, _wref=w_ref):
            na = ray.get(_nref)
            wa = ray.get(_wref)
            src = batch.column("src").to_numpy(zero_copy_only=False)
            share = wa[np.searchsorted(na, src)]
            if "w" in batch.column_names:  # weighted: rank/W(src) * w_edge
                share = share * batch.column("w").to_numpy(
                    zero_copy_only=False
                )
            c = np.floor(share * _E12 + 0.5).astype(np.int64)
            return pa.table({"dst": batch.column("dst"), "c": pa.array(c)})

        sums = sum_by_key(
            e.map_batches(contrib, batch_format="pyarrow"), "dst", "c"
        ).to_pandas()
        contrib_vec = np.zeros(n, dtype=np.int64)
        contrib_vec[
            np.searchsorted(node_arr, sums["dst"].to_numpy())
        ] = sums["sum"].to_numpy()
        dangling_share = damping * (1.0 - contrib_vec.sum() / _E12) / n
        rank = teleport + dangling_share + damping * (contrib_vec / _E12)

    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(node_arr),
                "rank": pa.array(rank, type=pa.float64()),
            }
        )
    )


def _pagerank_join(
    e: ray.data.Dataset,
    nodes: ray.data.Dataset,
    deg: ray.data.Dataset,
    n: int,
    damping: float,
    n_iter: int,
    num_partitions: int,
) -> ray.data.Dataset:
    """Fully-distributed loop state: the rank table never sits on one
    machine.  Per iteration: edges ⋈ ranks, grouped contribution sum,
    nodes LEFT JOIN sums."""
    # out-degree joins the edges ONCE; iterations reuse this table
    e_deg = hash_join(
        e, deg, on="src", num_partitions=num_partitions
    ).materialize()

    def init_rank(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "rank", pa.array(np.full(len(batch), 1.0 / n))
        )

    ranks = nodes.map_batches(
        init_rank, batch_format="pyarrow"
    ).materialize()

    teleport = (1.0 - damping) / n
    for _ in range(n_iter):
        joined = hash_join(
            e_deg,
            ranks,
            on="src",
            right_on="node",
            num_partitions=num_partitions,
        )

        def contrib(batch: pa.Table) -> pa.Table:
            r = batch.column("rank").to_numpy(zero_copy_only=False)
            d = batch.column("count()").to_numpy(zero_copy_only=False)
            share = r / d
            if "w" in batch.column_names:  # weighted: rank/W(src) * w_edge
                share = share * batch.column("w").to_numpy(
                    zero_copy_only=False
                )
            c = np.floor(share * _E12 + 0.5).astype(np.int64)
            return pa.table(
                {"dst": batch.column("dst"), "c": pa.array(c)}
            )

        sums = sum_by_key(
            joined.map_batches(contrib, batch_format="pyarrow"),
            "dst",
            "c",
            num_partitions=num_partitions,
        ).materialize()
        # linked sources emit exactly their rank mass, so the shortfall
        # from 1.0 is the dangling mass — no anti-join needed
        total = sums.sum("sum") or 0
        dangling_share = damping * (1.0 - total / _E12) / n

        new = hash_join(
            nodes,
            sums,
            on="node",
            right_on="dst",
            how="left",
            num_partitions=num_partitions,
        )

        def update(batch: pa.Table) -> pa.Table:
            s = (
                batch.column("sum")
                .fill_null(0)
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
            )
            rank = teleport + dangling_share + damping * (s / _E12)
            return pa.table(
                {"node": batch.column("node"), "rank": pa.array(rank)}
            )

        ranks = new.map_batches(
            update, batch_format="pyarrow"
        ).materialize()

    return ranks
