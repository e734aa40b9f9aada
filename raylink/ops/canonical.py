"""Survivorship aggregates: grouped mode with deterministic ties.

After clustering (connected components, dedup keepers) an ER pipeline
builds one CANONICAL record per entity; the workhorse aggregate is
"most frequent non-null value per group" (the reference stops at match
output — FastLink.jl's getMatches, /root/reference/src/getMatches.jl —
so survivorship is the natural next step its users run by hand).

Scale shape is combiner-first, same as ``count_by_key``: every block
reduces to at most ``unique(key, value)`` partial-count rows, and only
those partials pay the key shuffle, where a per-group scan sums counts
and takes the argmax.  Input rows never shuffle.

Ties break deterministically — count DESC, then value ASC — matching the
SQL ``row_number() OVER (PARTITION BY key ORDER BY cnt DESC, value)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..stages.sortedrun import sorted_group_scan

__all__ = [
    "canonical_records",
    "grouped_mode",
    "grouped_nunique",
    "pa_column_type",
]


def pa_column_type(ds: ray.data.Dataset, col: str) -> pa.DataType:
    """Arrow type of ``col`` for Arrow- AND pandas-backed Datasets."""
    sch = ds.schema()
    base = getattr(sch, "base_schema", sch)
    if hasattr(base, "field"):
        return base.field(col).type
    i = list(base.names).index(col)  # PandasBlockSchema
    t = base.types[i]
    try:
        return pa.from_numpy_dtype(t)
    except (pa.ArrowNotImplementedError, TypeError):
        return pa.string() if getattr(t, "kind", "O") == "O" else pa.int64()


def grouped_nunique(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Exact ``count(DISTINCT value_col)`` per ``key_col`` (nulls don't
    count, SQL semantics; a key whose values are all null reports 0).

    Combiner-first: each block reduces to its distinct ``(key, value)``
    pairs — only those pay the key shuffle — and the per-group scan
    counts the distinct values across blocks.  The exact counterpart of
    the HLL ``approx_distinct`` sketch (``ops/sketch.py``) for when the
    key cardinality is high but values-per-key are bounded.
    """
    key_type = pa_column_type(ds, key_col)

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        vals = batch.column(value_col).to_numpy(zero_copy_only=False)
        kmask = pd.notna(keys)
        df = pd.DataFrame({"k": keys[kmask], "v": vals[kmask]})
        vm = df["v"].notna()
        dd = df[vm].drop_duplicates(["k", "v"])
        # keys whose block-values are all null still surface (count 0)
        only_null = df.loc[~df["k"].isin(dd["k"]), ["k"]].drop_duplicates()
        out = pd.concat(
            [
                dd.assign(has=np.True_),
                only_null.assign(v=None, has=np.False_),
            ],
            ignore_index=True,
        )
        enc = out["v"].map(lambda x: None if pd.isna(x) else str(x))
        return pa.table(
            {
                key_col: pa.array(out["k"], type=key_type),
                # str() is injective on int64/float64/strings, and the
                # encoding is only a distinctness token here
                "v": pa.array(enc.astype(object), type=pa.string()),
                "has": pa.array(out["has"], type=pa.bool_()),
            }
        )

    partials = ds.select_columns([key_col, value_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    out_schema = pa.schema(
        [pa.field(key_col, key_type), pa.field("n_distinct", pa.int64())]
    )

    def group_fn(g: dict[str, np.ndarray]) -> dict:
        vals = np.asarray(g["v"], dtype=object)
        has = np.asarray(g["has"], dtype=bool)
        n = len(pd.unique(pd.Series(vals[has])))
        return {
            key_col: np.asarray(g[key_col])[:1],
            "n_distinct": np.array([n], dtype=np.int64),
        }

    def empty_fn(batch: dict[str, np.ndarray]) -> dict:
        return {
            key_col: np.asarray(batch[key_col])[:0],
            "n_distinct": np.array([], dtype=np.int64),
        }

    return sorted_group_scan(
        partials,
        key_col,
        group_fn,
        empty_fn,
        num_partitions=num_partitions,
        out_schema=out_schema,
    )


def _kind_of(t: pa.DataType) -> str:
    """Comparison/codec kind for a column type: str | int | float | ts."""
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    return "str"


def _encode_exact(vals: pd.Series, kind: str) -> np.ndarray:
    """Lossless string encoding of non-null values (decoded in the scan)."""
    if kind == "str":
        return vals.astype(object).to_numpy()
    if kind == "int":
        return np.array([str(int(v)) for v in vals], dtype=object)
    if kind == "ts":
        return np.array(
            [str(int(v)) for v in vals.astype("datetime64[us]").view("int64")],
            dtype=object,
        )
    # float: repr() is the shortest round-trip representation
    return np.array([repr(float(v)) for v in vals], dtype=object)


def _decode(vals: np.ndarray, kind: str) -> np.ndarray:
    if kind == "str":
        return np.asarray(vals, dtype=object)
    if kind == "int" or kind == "ts":
        return np.array([int(v) for v in vals], dtype=np.int64)
    return np.array([float(v) for v in vals], dtype=np.float64)


def canonical_records(
    ds: ray.data.Dataset,
    cluster_col: str,
    spec: dict[str, tuple[str, str]],
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """One canonical (survivorship) record per cluster.

    ``spec`` maps each OUTPUT column name to ``(source_col, strategy)``:

    - ``"mode"``      — most frequent non-null value (ties: count desc,
      value asc);
    - ``"min"`` / ``"max"`` — extreme non-null value (native ordering);
    - ``"longest"``   — longest non-null string (ties: value asc);
    - ``"first_by:<ord_col>"`` / ``"last_by:<ord_col>"`` — the non-null
      value on the row with the smallest / largest ``ord_col`` (ties:
      value asc), i.e. SQL ``row_number() OVER (ORDER BY ord [DESC],
      value)`` filtered to 1.

    A cluster whose values are all null for a column gets null there; the
    output has one row per distinct ``cluster_col`` value.

    Scale shape: each block reduces to LONG-FORMAT partials — one row per
    (cluster, output, value) for ``mode`` columns and one row per
    (cluster, output) for every other strategy — so only partials pay the
    shuffle; input rows never move.  The per-cluster scan then combines
    partials per output column.  Order keys ride as float64 (timestamps
    keep exact ordering through year ~2255 at us resolution).

    The reference stops at match output (getMatches,
    /root/reference/src/getMatches.jl); canonicalization is the step its
    users run by hand after clustering.
    """
    if not spec:
        raise ValueError("canonical_records needs at least one spec entry")
    cluster_type = pa_column_type(ds, cluster_col)
    ckind = _kind_of(cluster_type)

    # (out_name, source_col, strategy, ord_col or None, value kind)
    plan: list[tuple[str, str, str, str | None, str]] = []
    need_cols = {cluster_col}
    for out_name, (src, strat) in spec.items():
        ord_col = None
        if strat.startswith(("first_by:", "last_by:")):
            strat, ord_col = strat.split(":", 1)
            need_cols.add(ord_col)
        elif strat not in ("mode", "min", "max", "longest"):
            raise ValueError(f"unknown survivorship strategy: {strat!r}")
        need_cols.add(src)
        plan.append(
            (out_name, src, strat, ord_col, _kind_of(pa_column_type(ds, src)))
        )

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(cluster_col).to_numpy(zero_copy_only=False)
        outs: list[pd.DataFrame] = []
        # every distinct cluster in the block emits a presence row so
        # all-null clusters still surface (with null output columns)
        uniq = pd.unique(pd.Series(keys).dropna())
        outs.append(
            pd.DataFrame(
                {"k": uniq, "out": "", "val": None, "num": np.float64(0)}
            )
        )
        for out_name, src, strat, ord_col, kind in plan:
            vals = pd.Series(
                batch.column(src).to_numpy(zero_copy_only=False)
            )
            mask = vals.notna() & pd.Series(keys).notna()
            if not mask.any():
                continue
            df = pd.DataFrame({"k": keys[mask.to_numpy()]})
            v = vals[mask]
            df["val"] = _encode_exact(v, kind)
            if strat == "mode":
                c = (
                    df.groupby(["k", "val"], sort=False)
                    .size()
                    .reset_index(name="num")
                )
                c["num"] = c["num"].astype(np.float64)
            elif strat in ("min", "max"):
                df["dec"] = _decode(df["val"].to_numpy(), kind)
                c = df.sort_values(
                    "dec", ascending=strat == "min", kind="stable"
                ).drop_duplicates("k")[["k", "val"]].copy()
                c["num"] = np.float64(0)
            elif strat == "longest":
                df["num"] = df["val"].str.len().astype(np.float64)
                c = df.sort_values(
                    ["num", "val"], ascending=[False, True], kind="stable"
                ).drop_duplicates("k")[["k", "val", "num"]]
            else:  # first_by / last_by
                ov = batch.column(ord_col).to_numpy(zero_copy_only=False)[
                    mask.to_numpy()
                ]
                if np.issubdtype(np.asarray(ov).dtype, np.datetime64):
                    ov = np.asarray(ov, dtype="datetime64[us]").view("int64")
                df["num"] = np.asarray(ov, dtype=np.float64)
                c = df.sort_values(
                    ["num", "val"],
                    ascending=[strat == "first_by", True],
                    kind="stable",
                ).drop_duplicates("k")[["k", "val", "num"]]
            c = c.copy()
            c["out"] = out_name
            outs.append(c[["k", "out", "val", "num"]])
        allp = pd.concat(outs, ignore_index=True)
        return pa.table(
            {
                cluster_col: pa.array(allp["k"], type=cluster_type),
                "out": pa.array(allp["out"], type=pa.string()),
                "val": pa.array(allp["val"].astype(object), type=pa.string()),
                "num": pa.array(allp["num"], type=pa.float64()),
            }
        )

    partials = ds.select_columns(sorted(need_cols)).map_batches(
        partial, batch_format="pyarrow"
    )

    def _arrow_value(val_str, kind: str, t: pa.DataType):
        if val_str is None:
            return None
        dec = _decode(np.array([val_str], dtype=object), kind)[0]
        if kind == "ts":
            # the encoding is epoch MICROseconds; cast through
            # timestamp[us] so ns/ms-typed outputs convert units instead
            # of reinterpreting the integer
            return (
                pa.scalar(int(dec), type=pa.int64())
                .cast(pa.timestamp("us"))
                .cast(t)
                .as_py()
            )
        return dec

    fields = [pa.field(cluster_col, cluster_type)]
    out_types: dict[str, pa.DataType] = {}
    for out_name, src, _strat, _oc, _kind in plan:
        t = pa_column_type(ds, src)
        out_types[out_name] = t
        fields.append(pa.field(out_name, t))
    out_schema = pa.schema(fields)

    def group_fn(g: dict[str, np.ndarray]) -> dict:
        outs = np.asarray(g["out"], dtype=object)
        vals = np.asarray(g["val"], dtype=object)
        nums = np.asarray(g["num"], dtype=np.float64)
        row: dict = {cluster_col: np.asarray(g[cluster_col])[:1]}
        for out_name, _src, strat, _oc, kind in plan:
            m = outs == out_name
            chosen = None
            if m.any():
                v, n = vals[m], nums[m]
                if strat == "mode":
                    summed = (
                        pd.Series(n).groupby(pd.Series(v), sort=False).sum()
                    )
                    enc = summed.index.to_numpy(dtype=object)
                    tmp = pd.DataFrame(
                        {
                            "enc": enc,
                            "dec": _decode(enc, kind),
                            "cnt": summed.to_numpy(),
                        }
                    ).sort_values(
                        ["cnt", "dec"], ascending=[False, True], kind="stable"
                    )
                    chosen = tmp["enc"].iloc[0]
                elif strat in ("min", "max"):
                    dec = _decode(v, kind)
                    i = int(
                        np.argmin(dec) if strat == "min" else np.argmax(dec)
                    )
                    chosen = v[i]
                else:
                    # longest / first_by / last_by: best num, ties on the
                    # decoded value ascending
                    asc_num = strat == "first_by"
                    tmp = pd.DataFrame(
                        {"enc": v, "dec": _decode(v, kind), "num": n}
                    ).sort_values(
                        ["num", "dec"], ascending=[asc_num, True], kind="stable"
                    )
                    chosen = tmp["enc"].iloc[0]
            row[out_name] = [
                _arrow_value(chosen, kind, out_types[out_name])
            ]
        return row

    def empty_fn(batch: dict[str, np.ndarray]) -> dict:
        row: dict = {cluster_col: np.asarray(batch[cluster_col])[:0]}
        for out_name, *_ in plan:
            row[out_name] = []
        return row

    _ = ckind
    return sorted_group_scan(
        partials,
        cluster_col,
        group_fn,
        empty_fn,
        num_partitions=num_partitions,
        out_schema=out_schema,
    )


def grouped_mode(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Most frequent non-null ``value_col`` per ``key_col``.

    Output: ``key_col``, ``mode_value`` (string), ``mode_count`` (int64,
    the value's total occurrences).  Null values never win (a key whose
    values are all null emits no row, matching SQL ``WHERE v IS NOT
    NULL``); ties break on value ascending.
    """
    key_type = pa_column_type(ds, key_col)

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        vals = batch.column(value_col).to_numpy(zero_copy_only=False)
        mask = pd.notna(vals)
        df = pd.DataFrame({"k": keys[mask], "v": vals[mask]})
        c = (
            df.groupby(["k", "v"], sort=False, dropna=False)
            .size()
            .reset_index(name="cnt")
        )
        return pa.table(
            {
                key_col: pa.array(c["k"], type=key_type),
                "v": pa.array(c["v"].astype(object), type=pa.string()),
                "cnt": pa.array(c["cnt"], type=pa.int64()),
            }
        )

    partials = ds.select_columns([key_col, value_col]).map_batches(
        partial, batch_format="pyarrow"
    )

    out_schema = pa.schema(
        [
            pa.field(key_col, key_type),
            pa.field("mode_value", pa.string()),
            pa.field("mode_count", pa.int64()),
        ]
    )

    def group_fn(g: dict[str, np.ndarray]) -> dict:
        vals = np.asarray(g["v"], dtype=object)
        cnt = np.asarray(g["cnt"], dtype=np.int64)
        # sum partial counts per value; sort=True gives value-ascending
        # order, so argmax (first max) IS the count-desc/value-asc winner
        summed = pd.Series(cnt).groupby(pd.Series(vals), sort=True).sum()
        i = int(np.argmax(summed.to_numpy()))
        return {
            key_col: np.asarray(g[key_col])[:1],
            "mode_value": np.array([summed.index[i]], dtype=object),
            "mode_count": np.array([summed.iloc[i]], dtype=np.int64),
        }

    def empty_fn(batch: dict[str, np.ndarray]) -> dict:
        return {
            key_col: np.asarray(batch[key_col])[:0],
            "mode_value": np.array([], dtype=object),
            "mode_count": np.array([], dtype=np.int64),
        }

    return sorted_group_scan(
        partials,
        key_col,
        group_fn,
        empty_fn,
        num_partitions=num_partitions,
        out_schema=out_schema,
    )
