"""Interval join: points ⋈ ranges on containment (``lo <= v < hi``).

The join Ray Data has no native plan for: a fact table of scalar points
(event values, timestamps as epoch numbers, prices) against a table of
possibly-overlapping half-open intervals (rate bands, time windows,
calibration segments).  SQL spells it ``JOIN ON v >= lo AND v < hi`` —
a nested-loop theta join that explodes at scale unless partitioned by
the join dimension.

Scale design (100 TB): the number line is cut into fixed-width buckets.
Each point lands in exactly ONE bucket (``floor(v / w)``); each range
replicates to every bucket it overlaps.  Both sides then co-locate with
one sort by bucket (``sorted_group_scan``) and each bucket resolves
containment vectorized.  Because a (point, range) pair can only meet in
the point's bucket, no output dedup pass is needed.  Pick
``bucket_width`` near the typical range length: wider buckets mean less
range replication but more non-matching points per bucket; a range
spanning more than ``max_span_buckets`` buckets is refused loudly (a
near-infinite range would otherwise replicate to the whole corpus —
broadcast such catch-all ranges separately instead).

The reference engine's closest operator is its numeric band join
(``gammaNUMCKpar!``, self-join on ``|a-b| <= cut``); this generalizes to
an arbitrary two-table containment join on explicit interval bounds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..stages.sortedrun import sorted_group_scan

__all__ = ["interval_join"]


def interval_join(
    points: ray.data.Dataset,
    ranges: ray.data.Dataset,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 1.0,
    point_cols: list[str] | None = None,
    range_cols: list[str] | None = None,
    keys: list[str] | None = None,
    num_partitions: int = 64,
    max_span_buckets: int = 4096,
    max_ranges_per_bucket: int = 65536,
) -> ray.data.Dataset:
    """Inner containment join: one output row per (point, range) pair
    with ``lo <= point < hi``.

    Output columns: ``point_cols`` (default: just ``point_col``) followed
    by ``lo_col``, ``hi_col`` and any ``range_cols``.  Rows with a null
    point or null/empty/inverted bounds never match (SQL comparison
    semantics).  ``bucket_width`` must be positive.

    ``keys`` adds equality columns (present under the same names on
    BOTH sides): a pair matches only when every key is equal AND the
    point is contained — the per-entity-bands case (``JOIN ON p.k = r.k
    AND v >= lo AND v < hi``).  The co-location key mixes the key hash
    into the bucket, so each entity's ranges replicate only to that
    entity's buckets; exact key equality is re-verified in-cell (hash
    collisions cannot create false pairs).  Null keys never match.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    point_cols = list(point_cols or [point_col])
    if point_col not in point_cols:
        point_cols = [point_col] + point_cols
    range_cols = list(range_cols or [])
    keys = list(keys or [])
    for k in keys:
        if k not in point_cols:
            point_cols.append(k)
        if k in range_cols:
            raise ValueError(f"key column {k!r} must not repeat in range_cols")

    # unified block schema: tag + bucket + both sides' columns
    from .lag import _arrow_schema

    p_base = _arrow_schema(points)
    r_base = _arrow_schema(ranges)
    for k in keys:
        pt, rt = p_base.field(k).type, r_base.field(k).type
        if pt != rt:
            # hash-based co-location cannot see cross-type equality
            # (hash(5) != hash(5.0) even though 5 == 5.0): refuse loudly
            # instead of silently dropping every cross-type match
            raise ValueError(
                f"key column {k!r} has different types on the two sides "
                f"({pt} vs {rt}); cast one side before joining"
            )
    p_fields = [(c, p_base.field(c).type) for c in point_cols]
    r_fields = [(lo_col, pa.float64()), (hi_col, pa.float64())] + [
        (c, r_base.field(c).type) for c in range_cols
    ]
    union_schema = pa.schema(
        [("bucket", pa.int64()), ("tag", pa.int8())]
        + p_fields
        + r_fields
    )
    out_schema = pa.schema(p_fields + r_fields)
    w = float(bucket_width)

    def _pad(tbl_len: int, fields) -> list[pa.Array]:
        return [pa.nulls(tbl_len, type=t) for _, t in fields]

    def _mix_keys(batch: pa.Table, rows: np.ndarray, bucket: np.ndarray):
        """THE one hash-mix for both sides: drop null-key rows (SQL
        equi-join), fold the equality-key hash into the bucket id
        (equality-only group key; exact key equality re-checked
        in-cell).  Returns ``(mixed_bucket, rows, survivor_mask)`` —
        both sides MUST keep using this same function or keyed points
        and ranges silently stop co-locating."""
        import pandas as pd

        from ..functions.hashing import combine_hashes, hash64_array

        kv = [
            np.asarray(
                batch.column(k).to_numpy(zero_copy_only=False), dtype=object
            )[rows]
            for k in keys
        ]
        nn = ~np.logical_or.reduce([pd.isna(a) for a in kv])
        rows, bucket = rows[nn], bucket[nn]
        h = hash64_array(kv[0][nn])
        for a in kv[1:]:
            h = combine_hashes(h, hash64_array(a[nn]))
        mixed = combine_hashes(h, bucket.astype(np.uint64))
        mixed = (mixed & np.uint64(0x7FFF_FFFF_FFFF_FFFF)).astype(np.int64)
        return mixed, rows, nn

    def tag_points(batch: pa.Table) -> pa.Table:
        v = batch.column(point_col).to_numpy(zero_copy_only=False)
        v = np.asarray(v, dtype=np.float64)
        keep = np.flatnonzero(np.isfinite(v))
        bucket = np.floor(v[keep] / w).astype(np.int64)
        if keys:
            bucket, keep, _ = _mix_keys(batch, keep, bucket)
        arrays = [
            pa.array(bucket),
            pa.array(np.ones(len(keep), dtype=np.int8)),
        ]
        for c, t in p_fields:
            arrays.append(
                batch.column(c).take(pa.array(keep, type=pa.int64())).cast(t)
            )
        arrays.extend(_pad(len(keep), r_fields))
        return pa.Table.from_arrays(arrays, schema=union_schema)

    def tag_ranges(batch: pa.Table) -> pa.Table:
        lo = np.asarray(
            batch.column(lo_col).to_numpy(zero_copy_only=False),
            dtype=np.float64,
        )
        hi = np.asarray(
            batch.column(hi_col).to_numpy(zero_copy_only=False),
            dtype=np.float64,
        )
        keep = np.flatnonzero(np.isfinite(lo) & np.isfinite(hi) & (lo < hi))
        lo_k, hi_k = lo[keep], hi[keep]
        b_lo = np.floor(lo_k / w).astype(np.int64)
        # hi is EXCLUSIVE: a range ending exactly on a bucket edge does
        # not reach into the next bucket
        b_hi = np.floor(np.nextafter(hi_k, -np.inf) / w).astype(np.int64)
        span = b_hi - b_lo + 1
        if len(span) and int(span.max()) > max_span_buckets:
            raise ValueError(
                f"a range spans {int(span.max())} buckets "
                f"(> max_span_buckets={max_span_buckets}); widen "
                "bucket_width or broadcast catch-all ranges separately"
            )
        rep = np.repeat(np.arange(len(keep)), span)
        offsets = np.arange(len(rep)) - np.repeat(
            np.concatenate(([0], np.cumsum(span[:-1]))) if len(span) else [],
            span,
        )
        bucket = (b_lo[rep] + offsets).astype(np.int64)
        rep_rows = keep[rep]
        if keys:
            bucket, rep_rows, nn = _mix_keys(batch, rep_rows, bucket)
            rep = rep[nn]
        arrays = [
            pa.array(bucket),
            pa.array(np.zeros(len(rep_rows), dtype=np.int8)),
        ]
        if keys:
            # key columns live in p_fields; fill them from the RANGE side
            p_arrays = []
            for c, t in p_fields:
                if c in keys:
                    p_arrays.append(
                        batch.column(c)
                        .take(pa.array(rep_rows, type=pa.int64()))
                        .cast(t)
                    )
                else:
                    p_arrays.append(pa.nulls(len(rep_rows), type=t))
            arrays.extend(p_arrays)
        else:
            arrays.extend(_pad(len(rep_rows), p_fields))
        take = pa.array(rep_rows, type=pa.int64())
        arrays.append(pa.array(lo_k[rep], type=pa.float64()))
        arrays.append(pa.array(hi_k[rep], type=pa.float64()))
        for c, t in r_fields[2:]:
            arrays.append(batch.column(c).take(take).cast(t))
        return pa.Table.from_arrays(arrays, schema=union_schema)

    tagged = points.map_batches(
        tag_points, batch_format="pyarrow"
    ).union(ranges.map_batches(tag_ranges, batch_format="pyarrow"))

    p_names = [c for c, _ in p_fields]
    r_names = [c for c, _ in r_fields]

    def group_fn(group: dict[str, np.ndarray]) -> dict:
        tag = np.asarray(group["tag"])
        is_pt = tag == 1
        n_r = int((~is_pt).sum())
        if n_r > max_ranges_per_bucket:
            raise ValueError(
                f"{n_r} ranges in one bucket (> {max_ranges_per_bucket}); "
                "widen bucket_width"
            )
        v = np.asarray(group[point_col], dtype=np.float64)[is_pt]
        lo = np.asarray(group[lo_col], dtype=np.float64)[~is_pt]
        hi = np.asarray(group[hi_col], dtype=np.float64)[~is_pt]
        hits_p: list[np.ndarray] = []
        hits_r: list[np.ndarray] = []
        if keys:
            pk = [np.asarray(group[k], dtype=object)[is_pt] for k in keys]
            rk = [np.asarray(group[k], dtype=object)[~is_pt] for k in keys]
        for j in range(n_r):  # vectorized over points; ranges/bucket few
            cond = (v >= lo[j]) & (v < hi[j])
            if keys:
                for a, b in zip(pk, rk):
                    cond &= a == b[j]
            m = np.flatnonzero(cond)
            if len(m):
                hits_p.append(m)
                hits_r.append(np.full(len(m), j, dtype=np.int64))
        out: dict[str, np.ndarray] = {}
        if hits_p:
            pi = np.concatenate(hits_p)
            ri = np.concatenate(hits_r)
            for c in p_names:
                out[c] = np.asarray(group[c], dtype=object)[is_pt][pi]
            for c in r_names:
                out[c] = np.asarray(group[c], dtype=object)[~is_pt][ri]
        else:
            for c in p_names + r_names:
                out[c] = np.empty(0, dtype=object)
        return out

    def empty_fn(batch: dict[str, np.ndarray]) -> dict:
        return {c: np.empty(0, dtype=object) for c in p_names + r_names}

    return sorted_group_scan(
        tagged,
        "bucket",
        group_fn,
        empty_fn,
        num_partitions=num_partitions,
        sort_keys=["bucket", "tag"],
        out_schema=out_schema,
    )
