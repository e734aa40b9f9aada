"""Distributed graph analytics over edge tables: PageRank and exact
triangle counting.

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

from ..stages.sortedrun import absorb_blank_blocks, count_by_key, sum_by_key
from .joins import hash_join

__all__ = ["pagerank", "triangle_count", "label_propagation"]

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
    # the scan-union aggregates (deg / nodes / per-iteration sums) can
    # carry schema-less empty blocks that break the hash join's empty-
    # partition typing under key skew — absorb them first, at the SAME
    # partition count the join uses (this path exists for node sets no
    # single heap holds, so fewer blocks would concentrate the table
    # into a handful of repartition tasks).  nodes re-joins every
    # iteration: materialize the absorbed form once so the repartition
    # doesn't re-execute per iteration.
    deg = absorb_blank_blocks(deg, num_partitions)
    nodes = absorb_blank_blocks(nodes, num_partitions).materialize()
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
        # from 1.0 is the dangling mass — no anti-join needed.  The sum
        # reads the materialized table directly (aggregates tolerate
        # blank blocks); only the JOIN below needs the absorbed form,
        # and absorbing after the sum keeps the repartition to exactly
        # one execution per iteration.
        total = sums.sum("sum") or 0
        sums = absorb_blank_blocks(sums, num_partitions)
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


def triangle_count(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int = 64,
    max_wedge_degree: int = 10_000,
    broadcast_threshold: int = 5_000_000,
) -> ray.data.Dataset:
    """Exact global triangle count over an undirected graph given as an
    edge table (duplicates, reversed duplicates and self-loops are
    normalized away first).  Returns ONE row:

    ``(n_edges int64, n_triangles int64)``

    where ``n_edges`` is the distinct undirected edge count.

    Scale shape (the classic degree-oriented wedge-check, MapReduce
    formulation per Suri & Vassilvitskii 2011 / Cohen 2009): edges
    canonicalize and dedupe in one sorted scan; degrees are partial
    counts; each edge orients low→high by ``(degree, node id)`` via two
    distributed hash joins — the orientation bounds TOTAL wedge volume
    (ordered out-neighbor pairs) by O(m^1.5) regardless of hub skew.
    Wedges close against the edge set on one of two paths, switched on
    the measured distinct-edge count (wedge volume is typically the
    ~m^1.5 giant; the edge set is the small side):

    - **broadcast path** (``n_edges <= broadcast_threshold``): the
      rank-packed sorted edge-key array ships once via ``ray.put`` and
      each source's wedges are counted IN PLACE in the per-source scan
      (two searchsorted per group) — wedge rows never materialize in
      the object store, let alone shuffle.  On the dense supplier
      co-order graph at bench sf0.1 (454k edges, 124M triangles) this
      cut the in-bench query wall 7x vs the sort path (41.9 s ->
      6.0 s, 32 CPUs) — the remaining wall is the ~1.2e8 wedge
      membership probes themselves.
    - **sort path** (edge sets no heap holds): wedge rows union with
      the tagged edge set and close in one more co-grouped sorted
      scan — everything stays distributed, nothing is broadcast.

    Nothing is quadratic in a hub's raw degree; the only scalars pulled
    to the driver are the two output counts (plus, on the broadcast
    path, the bounded edge-key array).

    ``max_wedge_degree`` bounds one source's ORIENTED out-degree (≤
    sqrt(2m) by construction): a group above it would compute too many
    wedge pairs in one task, so it refuses loudly rather than OOM.
    """
    from ..stages.sortedrun import sorted_group_scan

    e = _normalize_edges(edges, src_col, dst_col, None)

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d  # self-loops close no triangle
        u = np.minimum(s[keep], d[keep])
        v = np.maximum(s[keep], d[keep])
        # block-local dedupe shrinks the exchange
        order = np.lexsort((v, u))
        us, vs = u[order], v[order]
        first = np.ones(len(us), dtype=bool)
        first[1:] = (us[1:] != us[:-1]) | (vs[1:] != vs[:-1])
        return pa.table(
            {
                "u": pa.array(us[first], type=pa.int64()),
                "v": pa.array(vs[first], type=pa.int64()),
            }
        )

    edge_schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])

    def distinct_group(group: dict[str, np.ndarray]) -> dict:
        vv = np.unique(np.asarray(group["v"]))
        return {
            "u": np.repeat(np.asarray(group["u"])[:1], len(vv)),
            "v": vv,
        }

    def distinct_empty(batch: dict[str, np.ndarray]) -> dict:
        return {
            "u": np.empty(0, dtype=np.int64),
            "v": np.empty(0, dtype=np.int64),
        }

    dedup = sorted_group_scan(
        e.map_batches(canon, batch_format="pyarrow"),
        "u",
        distinct_group,
        distinct_empty,
        num_partitions,
        out_schema=edge_schema,
    ).materialize()
    n_edges = dedup.count()

    # full degree = count over both endpoints of the DISTINCT edges
    def both_ends(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        return pa.table(
            {"node": pa.array(np.concatenate([u, v]), type=pa.int64())}
        )

    deg = count_by_key(
        dedup.map_batches(both_ends, batch_format="pyarrow"), "node"
    ).map_batches(
        lambda b: pa.table(
            {"node": b.column("node"), "deg": b.column("count()")}
        ),
        batch_format="pyarrow",
    )

    # size join partitions from the MEASURED edge count (dedup is
    # already materialized): each partition costs a dedicated
    # aggregator actor, and that fixed overhead dominates below ~250k
    # rows/partition (see hash_join's guidance) — a small graph on a
    # small CPU budget would otherwise stall on actor scheduling
    join_parts = max(2, min(num_partitions // 4, n_edges // 250_000 + 1))
    # absorb the scan union's schema-less empty blocks (see
    # absorb_blank_blocks): Ray's join types EMPTY shuffle partitions
    # from the dataset schema, which a blank-bearing union can't provide
    dedup_j = absorb_blank_blocks(dedup, join_parts)
    deg_j = absorb_blank_blocks(deg, join_parts)
    with_du = hash_join(
        dedup_j, deg_j, on="u", right_on="node", num_partitions=join_parts
    ).map_batches(
        lambda b: b.rename_columns(
            ["du" if c == "deg" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
    with_dd = hash_join(
        with_du, deg_j, on="v", right_on="node", num_partitions=join_parts
    )

    # orient low→high by (degree, node id): each triangle then has
    # exactly one source with out-edges to the other two
    def orient(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        du = batch.column("du").to_numpy(zero_copy_only=False)
        dv = batch.column("deg").to_numpy(zero_copy_only=False)
        u_first = (du < dv) | ((du == dv) & (u < v))
        return pa.table(
            {
                "a": pa.array(np.where(u_first, u, v), type=pa.int64()),
                "b": pa.array(np.where(u_first, v, u), type=pa.int64()),
            }
        )

    oriented = with_dd.map_batches(orient, batch_format="pyarrow")

    tri_schema = pa.schema([("n_tri", pa.int64())])

    def tri_empty(batch: dict[str, np.ndarray]) -> dict:
        return {"n_tri": np.empty(0, dtype=np.int64)}

    def out_neighbors(group: dict[str, np.ndarray]) -> np.ndarray | None:
        """Sorted out-neighbor array of one source, None below wedge
        size, loud refusal above the cap (shared by both paths)."""
        nb = np.sort(np.asarray(group["b"]))
        k = len(nb)
        if k > max_wedge_degree:
            raise ValueError(
                f"oriented out-degree {k} of node "
                f"{int(np.asarray(group['a'])[0])} exceeds "
                f"max_wedge_degree={max_wedge_degree}; raise the cap "
                "explicitly if the wedge volume is intended"
            )
        return nb if k >= 2 else None

    def finish(n_tri_ds: ray.data.Dataset) -> ray.data.Dataset:
        n_tri = n_tri_ds.sum("n_tri")
        return ray.data.from_arrow(
            pa.table(
                {
                    "n_edges": pa.array([n_edges], type=pa.int64()),
                    "n_triangles": pa.array(
                        [int(n_tri or 0)], type=pa.int64()
                    ),
                }
            )
        )

    if n_edges <= broadcast_threshold:
        # rank-pack the edge set: (rank(u) << 32) | rank(v) over the
        # dense node ranks — exact membership via one searchsorted
        ed = dedup.to_pandas()
        eu = ed["u"].to_numpy(dtype=np.int64)
        ev = ed["v"].to_numpy(dtype=np.int64)
        uniq_nodes = np.unique(np.concatenate([eu, ev]))
        if len(uniq_nodes) >= 1 << 32:
            raise ValueError("more than 2^32 nodes under the broadcast "
                             "threshold is impossible; file a bug")
        packed = (
            np.searchsorted(uniq_nodes, eu).astype(np.uint64) << np.uint64(32)
        ) | np.searchsorted(uniq_nodes, ev).astype(np.uint64)
        packed.sort()
        nodes_ref = ray.put(uniq_nodes)
        edges_ref = ray.put(packed)

        def count_group(
            group: dict[str, np.ndarray],
            _nref=nodes_ref,
            _eref=edges_ref,
            _cache={},  # noqa: B006 - intentional per-task ref cache
        ) -> dict:
            nb = out_neighbors(group)
            if nb is None:
                return tri_empty(group)
            k = len(nb)
            # resolve the broadcast refs once per task, not per group —
            # group_fn runs once per source node, and millions of
            # ray.get round-trips add pure overhead (pagerank resolves
            # per batch; a group scan has no batch hook, so memoize)
            if "pk" not in _cache:
                _cache["na"] = ray.get(_nref)
                _cache["pk"] = ray.get(_eref)
            na, pk = _cache["na"], _cache["pk"]
            r = np.searchsorted(na, nb).astype(np.uint64)
            iu, ju = np.triu_indices(k, 1)
            keys = (r[iu] << np.uint64(32)) | r[ju]
            pos = np.searchsorted(pk, keys)
            pos[pos >= len(pk)] = len(pk) - 1
            n = int((pk[pos] == keys).sum())
            return {"n_tri": np.array([n], dtype=np.int64)}

        return finish(
            sorted_group_scan(
                oriented, "a", count_group, tri_empty,
                num_partitions, out_schema=tri_schema,
            )
        )

    # sort path: wedge rows union with the tagged edge set and close
    # in one more co-grouped scan — fully distributed, no broadcast
    wedge_schema = pa.schema(
        [("x", pa.int64()), ("y", pa.int64()), ("is_edge", pa.int8())]
    )

    def wedge_group(group: dict[str, np.ndarray]) -> dict:
        nb = out_neighbors(group)
        if nb is None:
            return wedge_empty(group)
        k = len(nb)
        iu, ju = np.triu_indices(k, 1)
        return {
            "x": nb[iu],
            "y": nb[ju],
            "is_edge": np.zeros(len(iu), dtype=np.int8),
        }

    def wedge_empty(batch: dict[str, np.ndarray]) -> dict:
        return {
            "x": np.empty(0, dtype=np.int64),
            "y": np.empty(0, dtype=np.int64),
            "is_edge": np.empty(0, dtype=np.int8),
        }

    wedges = sorted_group_scan(
        oriented, "a", wedge_group, wedge_empty,
        num_partitions, out_schema=wedge_schema,
    )

    def tag_edges(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                batch.column("u").cast(pa.int64()),
                batch.column("v").cast(pa.int64()),
                pa.array(np.ones(len(batch), dtype=np.int8)),
            ],
            schema=wedge_schema,
        )

    tagged = wedges.union(
        dedup.map_batches(tag_edges, batch_format="pyarrow")
    )

    # closure: a wedge (x, y) is a triangle iff the canonical edge
    # (x, y) exists; each matching wedge INSTANCE is one triangle
    def close_group(group: dict[str, np.ndarray]) -> dict:
        y = np.asarray(group["y"])
        is_edge = np.asarray(group["is_edge"]).astype(bool)
        ey, wy = y[is_edge], y[~is_edge]
        n = (
            int(np.isin(wy, ey).sum())
            if len(ey) and len(wy)
            else 0
        )
        return {"n_tri": np.array([n], dtype=np.int64)}

    return finish(
        sorted_group_scan(
            tagged, "x", close_group, tri_empty,
            num_partitions, out_schema=tri_schema,
        )
    )


def label_propagation(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 10,
    num_partitions: int = 32,
    broadcast_threshold: int = 5_000_000,
) -> ray.data.Dataset:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) over an undirected view of the edge table.  Returns
    ``(node int64, label int64)`` where nodes sharing a label form one
    community; labels are community-member node ids.

    DETERMINISTIC at any parallelism, unlike textbook async LP: every
    node starts labeled with its own id and each round SIMULTANEOUSLY
    adopts the most frequent label among its neighbors plus itself
    (the self-vote damps the 2-cycle oscillation synchronous LP is
    prone to), ties broken by the smallest label.  Neighbor-label
    counts are exact int64 partials, so two cluster sizes can never
    disagree.  Stops early when no label changes.

    Two execution paths switched on the NODE count (the loop state),
    exactly like :func:`pagerank` — bit-identical outputs (pinned by
    the cross-path pytest):

    - **broadcast path** (≤ ``broadcast_threshold`` nodes): the label
      vector is one ``ray.put`` per round read zero-copy by every
      task; each round is ONE edge scan emitting per-(node, label)
      partial counts (the combiner — repeated votes inside a block
      never shuffle) merged in a sorted scan whose per-node argmax
      produces the next vector.
    - **join path** (node sets no single heap holds): the label table
      stays distributed; per round the vote stream hash-joins the
      label table (edges pay one shuffle per round — LP labels change
      every round, so unlike pagerank's degree join there is nothing
      to hoist), the same per-block combiner reduces to (node, label)
      partials, and the per-node argmax scan also emits a ``changed``
      flag whose distributed sum drives the early stop.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")

    e = _normalize_edges(edges, src_col, dst_col, None)

    # undirected vote stream: each edge votes in both directions;
    # self-loops collapse into the self-vote and are dropped here
    def both_dirs(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table(
            {
                "node": pa.array(
                    np.concatenate([s, d]), type=pa.int64()
                ),
                "nbr": pa.array(
                    np.concatenate([d, s]), type=pa.int64()
                ),
            }
        )

    votes = e.map_batches(both_dirs, batch_format="pyarrow").materialize()

    node_counts = (
        count_by_key(
            votes.map_batches(
                lambda b: b.select(["node"]), batch_format="pyarrow"
            ),
            "node",
        )
        .select_columns(["node"])
        .materialize()
    )
    n = node_counts.count()
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], type=pa.int64()),
                    "label": pa.array([], type=pa.int64()),
                }
            )
        )
    if n > broadcast_threshold:
        return _label_prop_join(votes, node_counts, n_iter, num_partitions)
    return _label_prop_broadcast(votes, node_counts, n_iter, num_partitions)


def _label_prop_broadcast(
    votes: ray.data.Dataset,
    node_counts: ray.data.Dataset,
    n_iter: int,
    num_partitions: int,
) -> ray.data.Dataset:
    """Label vector on the driver, one ``ray.put`` per round."""
    from ..stages.sortedrun import sorted_group_scan

    node_arr = np.sort(
        node_counts.to_pandas()["node"].to_numpy().astype(np.int64)
    )
    n = len(node_arr)
    nodes_ref = ray.put(node_arr)
    labels = node_arr.copy()  # own id first

    count_schema = pa.schema(
        [("node", pa.int64()), ("lab", pa.int64()), ("c", pa.int64())]
    )
    out_schema = pa.schema([("node", pa.int64()), ("lab", pa.int64())])

    for _ in range(n_iter):
        lab_ref = ray.put(labels)

        def partial(
            batch: pa.Table, _nref=nodes_ref, _lref=lab_ref
        ) -> pa.Table:
            na = ray.get(_nref)
            la = ray.get(_lref)
            node = batch.column("node").to_numpy(zero_copy_only=False)
            nbr = batch.column("nbr").to_numpy(zero_copy_only=False)
            lab = la[np.searchsorted(na, nbr)]
            order = np.lexsort((lab, node))
            no, lo = node[order], lab[order]
            first = np.ones(len(no), dtype=bool)
            first[1:] = (no[1:] != no[:-1]) | (lo[1:] != lo[:-1])
            starts = np.flatnonzero(first)
            c = np.diff(np.append(starts, len(no)))
            return pa.Table.from_arrays(
                [
                    pa.array(no[starts], type=pa.int64()),
                    pa.array(lo[starts], type=pa.int64()),
                    pa.array(c.astype(np.int64), type=pa.int64()),
                ],
                schema=count_schema,
            )

        # the self-vote ships as ONE n-row driver table unioned with the
        # block partials (not a closure over the label array — that
        # would serialize the full vector into every task)
        self_votes = ray.data.from_arrow(
            pa.Table.from_arrays(
                [
                    pa.array(node_arr, type=pa.int64()),
                    pa.array(labels, type=pa.int64()),
                    pa.array(np.ones(n, dtype=np.int64), type=pa.int64()),
                ],
                schema=count_schema,
            )
        )

        def vote_group(group: dict[str, np.ndarray]) -> dict:
            lab = np.asarray(group["lab"])
            c = np.asarray(group["c"])
            # merge same-label partials (self-vote already in the
            # stream), then pick (count desc, label asc) — exact ints
            node = int(np.asarray(group["node"])[0])
            order = np.argsort(lab, kind="stable")
            ls, cs = lab[order], c[order]
            starts = np.flatnonzero(
                np.concatenate(([True], ls[1:] != ls[:-1]))
            )
            totals = np.add.reduceat(cs, starts)
            uls = ls[starts]
            best = np.lexsort((uls, -totals))[0]
            return {
                "node": np.array([node], dtype=np.int64),
                "lab": np.array([uls[best]], dtype=np.int64),
            }

        def vote_empty(batch: dict[str, np.ndarray]) -> dict:
            return {
                "node": np.empty(0, dtype=np.int64),
                "lab": np.empty(0, dtype=np.int64),
            }

        new_df = (
            sorted_group_scan(
                votes.map_batches(partial, batch_format="pyarrow").union(
                    self_votes
                ),
                "node",
                vote_group,
                vote_empty,
                num_partitions=num_partitions,
                out_schema=out_schema,
            )
            .to_pandas()
        )
        new_labels = labels.copy()  # isolated nodes keep their label
        idx = np.searchsorted(node_arr, new_df["node"].to_numpy())
        new_labels[idx] = new_df["lab"].to_numpy()
        if np.array_equal(new_labels, labels):
            break
        labels = new_labels

    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(node_arr, type=pa.int64()),
                "label": pa.array(labels, type=pa.int64()),
            }
        )
    )


def _label_prop_join(
    votes: ray.data.Dataset,
    node_counts: ray.data.Dataset,
    n_iter: int,
    num_partitions: int,
) -> ray.data.Dataset:
    """Fully-distributed loop state: the label table never sits on one
    machine.  Per round: votes ⋈ labels (hash shuffle), per-block
    (node, label) count partials, self-vote union, per-node argmax
    scan.  Vote merging, tie-breaking (count desc, label asc) and the
    self-vote are IDENTICAL to the broadcast path, and counts are
    exact int64, so the two paths are bit-equal at any parallelism.
    """
    from ..stages.sortedrun import sorted_group_scan

    count_schema = pa.schema(
        [
            ("node", pa.int64()),
            ("lab", pa.int64()),
            ("c", pa.int64()),
            ("is_self", pa.int64()),
        ]
    )
    out_schema = pa.schema(
        [
            ("node", pa.int64()),
            ("lab", pa.int64()),
            ("changed", pa.int64()),
        ]
    )

    votes = absorb_blank_blocks(votes, num_partitions).materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        node = batch.column("node")
        return pa.table({"node": node, "label": node})

    labels = (
        absorb_blank_blocks(node_counts, num_partitions)
        .map_batches(init_labels, batch_format="pyarrow")
        .materialize()
    )

    def partial(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy(zero_copy_only=False)
        lab = batch.column("label").to_numpy(zero_copy_only=False)
        order = np.lexsort((lab, node))
        no, lo = node[order], lab[order]
        first = np.ones(len(no), dtype=bool)
        first[1:] = (no[1:] != no[:-1]) | (lo[1:] != lo[:-1])
        starts = np.flatnonzero(first)
        c = np.diff(np.append(starts, len(no)))
        return pa.Table.from_arrays(
            [
                pa.array(no[starts], type=pa.int64()),
                pa.array(lo[starts], type=pa.int64()),
                pa.array(c.astype(np.int64), type=pa.int64()),
                pa.array(np.zeros(len(starts), dtype=np.int64)),
            ],
            schema=count_schema,
        )

    def self_votes(batch: pa.Table) -> pa.Table:
        m = len(batch)
        return pa.Table.from_arrays(
            [
                batch.column("node").cast(pa.int64()),
                batch.column("label").cast(pa.int64()),
                pa.array(np.ones(m, dtype=np.int64)),
                pa.array(np.ones(m, dtype=np.int64)),
            ],
            schema=count_schema,
        )

    def vote_group(group: dict[str, np.ndarray]) -> dict:
        lab = np.asarray(group["lab"])
        c = np.asarray(group["c"])
        node = int(np.asarray(group["node"])[0])
        old = int(lab[np.asarray(group["is_self"]).astype(bool)][0])
        order = np.argsort(lab, kind="stable")
        ls, cs = lab[order], c[order]
        starts = np.flatnonzero(
            np.concatenate(([True], ls[1:] != ls[:-1]))
        )
        totals = np.add.reduceat(cs, starts)
        uls = ls[starts]
        win = int(uls[np.lexsort((uls, -totals))[0]])
        return {
            "node": np.array([node], dtype=np.int64),
            "lab": np.array([win], dtype=np.int64),
            "changed": np.array([int(win != old)], dtype=np.int64),
        }

    def vote_empty(batch: dict[str, np.ndarray]) -> dict:
        return {
            "node": np.empty(0, dtype=np.int64),
            "lab": np.empty(0, dtype=np.int64),
            "changed": np.empty(0, dtype=np.int64),
        }

    def as_labels(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node"),
                "label": batch.column("lab"),
            }
        )

    for _ in range(n_iter):
        joined = hash_join(
            votes,
            absorb_blank_blocks(labels, num_partitions),
            on="nbr",
            right_on="node",
            num_partitions=num_partitions,
        )
        new = sorted_group_scan(
            joined.map_batches(partial, batch_format="pyarrow").union(
                labels.map_batches(self_votes, batch_format="pyarrow")
            ),
            "node",
            vote_group,
            vote_empty,
            num_partitions=num_partitions,
            out_schema=out_schema,
        ).materialize()
        changes = new.sum("changed") or 0
        labels = new.map_batches(
            as_labels, batch_format="pyarrow"
        ).materialize()
        if changes == 0:
            break

    return labels
