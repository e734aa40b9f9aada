"""Data-quality expectations: declarative rules → violation counts.

The pipeline-gate primitive (Great-Expectations-shaped, engine-native):
declare per-column rules, get back one row per rule with the number of
violating rows — cheap enough to run after every ingest and assert on.

Supported rule kinds:

- ``not_null``          — value must not be null
- ``unique``            — no value may occur twice (nulls exempt, SQL
  ``UNIQUE`` semantics)
- ``range`` (lo/hi)     — ``lo <= v <= hi`` (inclusive; null is a
  violation only when ``not_null`` is also declared — nulls skip range)
- ``regex`` (pattern)   — full-match required (nulls skip)
- ``in_set`` (values)   — membership in an allowed set (nulls skip)

Scale design (100 TB): every rule except ``unique`` reduces inside
``map_batches`` to one int64 partial per block — the corpus streams
through once, only #rules × #blocks tiny rows move.  ``unique`` needs
to see values across blocks: per-block distinct (value, count) partials
shuffle (bounded by per-block cardinality) and a sorted-run scan counts
rows whose value occurs more than once corpus-wide.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import ray.data

from ..stages.sortedrun import sorted_group_scan

__all__ = ["expect_rules"]

_KINDS = ("not_null", "unique", "range", "regex", "in_set")


def _rule_name(rule: dict[str, Any]) -> str:
    return f"{rule['column']}:{rule['kind']}"


def expect_rules(
    ds: ray.data.Dataset,
    rules: list[dict[str, Any]],
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Evaluate expectation rules; one output row per rule:
    ``(rule, violations)`` — ``violations`` is the number of rows (for
    ``unique``: the number of rows sharing a duplicated value) that
    break the rule.  Rule dicts: ``{"column": ..., "kind": ...}`` plus
    ``lo``/``hi`` (range), ``pattern`` (regex) or ``values`` (in_set).
    """
    import re as _re

    if not rules:
        raise ValueError("rules must be non-empty")
    # never mutate the caller's dicts (they may be logged / persisted);
    # compile patterns into private copies
    prepared = []
    for r in rules:
        if r.get("kind") not in _KINDS:
            raise ValueError(f"unknown rule kind: {r.get('kind')!r}")
        r = dict(r)
        if r["kind"] == "regex":
            r["_compiled"] = _re.compile(r["pattern"])
        prepared.append(r)
    rules = prepared
    names = [_rule_name(r) for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rules: {names}")
    scan_rules = [r for r in rules if r["kind"] != "unique"]
    uniq_rules = [r for r in rules if r["kind"] == "unique"]
    cols = sorted({r["column"] for r in rules})

    out_schema = pa.schema([("rule", pa.string()), ("violations", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        counts = []
        for r in scan_rules:
            s = pd.Series(
                batch.column(r["column"]).to_numpy(zero_copy_only=False),
                dtype="object",
            )
            k = r["kind"]
            if k == "not_null":
                bad = int(s.isna().sum())
            elif k == "range":
                v = pd.to_numeric(s, errors="coerce")
                ok = (v >= r["lo"]) & (v <= r["hi"])
                bad = int((~ok & s.notna()).sum())
            elif k == "regex":
                m = s.dropna().astype(str).str.fullmatch(r["_compiled"])
                bad = int((~m).sum())
            else:  # in_set
                nn = s.dropna()
                bad = int((~nn.isin(list(r["values"]))).sum())
            counts.append(bad)
        return pa.Table.from_arrays(
            [
                pa.array([_rule_name(r) for r in scan_rules]),
                pa.array(np.asarray(counts, dtype=np.int64)),
            ],
            names=["rule", "violations"],
        )

    parts = []
    if scan_rules:
        scan_partials = ds.select_columns(cols).map_batches(
            partial, batch_format="pyarrow"
        )

        def merge(group: dict[str, np.ndarray]) -> dict:
            return {
                "rule": np.asarray(group["rule"])[:1],
                "violations": np.array(
                    [int(np.asarray(group["violations"]).sum())],
                    dtype=np.int64,
                ),
            }

        def empty(batch: dict[str, np.ndarray]) -> dict:
            return {
                "rule": np.empty(0, dtype=object),
                "violations": np.empty(0, dtype=np.int64),
            }

        parts.append(
            sorted_group_scan(
                scan_partials,
                "rule",
                merge,
                empty,
                num_partitions=min(8, num_partitions),
                out_schema=out_schema,
            )
        )

    for r in uniq_rules:
        col = r["column"]
        name = _rule_name(r)

        # pandas batch format: a mixed-type object column (int+str ids
        # from a pandas-block source) cannot convert to an Arrow batch
        # at all, so the distinct pass must consume the raw block
        def distinct(batch, _c=col) -> pa.Table:
            import pandas as pd

            s = batch[_c].astype("object").dropna()
            # equality domain is the STRING form: casting before
            # np.unique keeps the sort total-ordered on mixed-type
            # columns (int+str ids would TypeError numpy's sort), at
            # the documented cost that cross-type values with the same
            # string form count as one
            u, c = np.unique(
                s.astype(str).to_numpy(dtype=object), return_counts=True
            )
            return pa.Table.from_arrays(
                [
                    pa.array(u.astype(str)),
                    pa.array(c.astype(np.int64)),
                ],
                names=["v", "n"],
            )

        vparts = ds.select_columns([col]).map_batches(
            distinct, batch_format="pandas"
        )

        def dup_rows(group: dict[str, np.ndarray], _name=name) -> dict:
            n = int(np.asarray(group["n"]).sum())
            viol = n if n > 1 else 0
            return {
                "rule": np.array([_name], dtype=object),
                "violations": np.array([viol], dtype=np.int64),
            }

        def vempty(batch: dict[str, np.ndarray]) -> dict:
            return {
                "rule": np.empty(0, dtype=object),
                "violations": np.empty(0, dtype=np.int64),
            }

        per_value = sorted_group_scan(
            vparts,
            "v",
            dup_rows,
            vempty,
            num_partitions=num_partitions,
            out_schema=out_schema,
        )

        def total(batch: pa.Table, _name=name) -> pa.Table:
            viol = batch.column("violations").to_numpy(zero_copy_only=False)
            return pa.Table.from_arrays(
                [
                    pa.array([_name]),
                    pa.array([int(viol.sum())], type=pa.int64()),
                ],
                names=["rule", "violations"],
            )

        # per-value rows collapse to one partial per block, then a tiny
        # final merge (re-using the scan-rule pathway's shape)
        tparts = per_value.map_batches(total, batch_format="pyarrow")

        def tmerge(group: dict[str, np.ndarray]) -> dict:
            return {
                "rule": np.asarray(group["rule"])[:1],
                "violations": np.array(
                    [int(np.asarray(group["violations"]).sum())],
                    dtype=np.int64,
                ),
            }

        parts.append(
            sorted_group_scan(
                tparts,
                "rule",
                tmerge,
                vempty,
                num_partitions=2,
                out_schema=out_schema,
            )
        )

    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
