"""Mutual information between two categorical columns.

The feature-relevance / redundancy measure a curation pipeline runs
before keeping a metadata column (does ``source`` actually tell you
anything about ``language``?) — the categorical sibling of the numeric
correlation op (``ops/normalize.py``).

Scale shape: every block reduces to its (x, y) pair counts (one lexsort
+ run-length pass), those partials merge in a DISTRIBUTED sorted-run
scan (per-block partial rows scale with block count, so they never hit
the driver unmerged), and the MI math runs over the merged JOINT
table — which is bounded by ``|X| x |Y|`` (vocabulary sizes), not by
rows or blocks.  The ``max_cells`` guard applies to that merged joint,
so it refuses pathological cardinalities loudly (an id-by-id "MI" is a
bug, not a workload) without spuriously rejecting a tiny joint spread
over many blocks.  Marginals derive from the joint, so one pass over
the data suffices and counts are exact int64.

Per observed cell: ``term = (n_xy/N) * ln((n_xy*N)/(n_x*n_y))``,
emitted half-up e4; total MI (nats) is the sum of the terms.
Unobserved cells contribute 0 mathematically (lim p->0 of p*ln p) and
emit no row.  Null x or y rows are excluded (both the engine and the
oracle filter them).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

__all__ = ["mutual_information", "chi_squared_independence", "grouped_entropy"]


def mutual_information(
    ds: ray.data.Dataset,
    x_col: str,
    y_col: str,
    max_cells: int = 1_000_000,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-cell MI contributions of ``x_col`` vs ``y_col``.  Output one
    row per OBSERVED (x, y) cell:

    ``(x_col, y_col, n int64, mi_term_e4 int64)``

    with ``sum(mi_term_e4)/1e4`` the total mutual information in nats.
    ``max_cells`` bounds the MERGED joint (|X| x |Y| observed cells),
    which is also exactly what the driver pulls for the final math.
    """
    joint = _merged_joint(
        ds, x_col, y_col, max_cells=max_cells,
        num_partitions=num_partitions,
    )
    if len(joint) == 0:
        raise ValueError("empty input after null exclusion; MI undefined")
    n = joint["n"].to_numpy(dtype=np.int64)
    total = int(n.sum())
    nx = joint.groupby(x_col)["n"].transform("sum").to_numpy(np.int64)
    ny = joint.groupby(y_col)["n"].transform("sum").to_numpy(np.int64)
    # float products, not int: n*N overflows int64 at web-scale counts
    term = (n / total) * np.log(
        (n.astype(np.float64) * total) / (nx.astype(np.float64) * ny)
    )
    return ray.data.from_arrow(
        pa.table(
            {
                x_col: pa.array(joint[x_col], from_pandas=True),
                y_col: pa.array(joint[y_col], from_pandas=True),
                "n": pa.array(n),
                "mi_term_e4": pa.array(
                    np.floor(term * 10_000.0 + 0.5).astype(np.int64)
                ),
            }
        )
    )


def _merged_joint(
    ds: ray.data.Dataset,
    x_col: str,
    y_col: str,
    max_cells: int,
    num_partitions: int,
) -> pd.DataFrame:
    """Distributed (x, y) joint counts, merged and pulled to the driver
    as a DataFrame sorted by (x, y) — bounded by the observed cell
    count, which ``max_cells`` guards.  Null x or y rows are excluded.
    Shared by :func:`mutual_information` and
    :func:`chi_squared_independence`."""
    if max_cells < 1:
        raise ValueError("max_cells must be >= 1")

    from ..stages.sortedrun import sorted_group_scan
    from .lag import _arrow_schema
    from .rollup import _encode_combo

    in_schema = _arrow_schema(ds)
    xt = in_schema.field(x_col).type
    yt = in_schema.field(y_col).type
    cell_schema = pa.schema(
        [("_combo", pa.string()), (x_col, xt), (y_col, yt),
         ("n", pa.int64())]
    )

    def partial(batch: pd.DataFrame) -> pa.Table:
        d = batch[[x_col, y_col]].dropna()
        g = d.groupby([x_col, y_col], sort=False, observed=True).size()
        out = g.reset_index(name="n")
        combo = _encode_combo(
            [
                out[x_col].to_numpy(dtype=object),
                out[y_col].to_numpy(dtype=object),
            ]
        ) if len(out) else np.empty(0, dtype=object)
        return pa.Table.from_arrays(
            [
                pa.array(combo, type=pa.string()),
                pa.array(out[x_col].to_numpy(), type=xt, from_pandas=True),
                pa.array(out[y_col].to_numpy(), type=yt, from_pandas=True),
                pa.array(
                    out["n"].to_numpy(dtype=np.int64), type=pa.int64()
                ),
            ],
            schema=cell_schema,
        )

    def merge_group(group: dict[str, np.ndarray]) -> dict:
        return {
            "_combo": np.asarray(group["_combo"])[:1],
            x_col: np.asarray(group[x_col])[:1],
            y_col: np.asarray(group[y_col])[:1],
            "n": np.array(
                [np.asarray(group["n"]).sum()], dtype=np.int64
            ),
        }

    def merge_empty(batch: dict[str, np.ndarray]) -> dict:
        return {
            "_combo": np.asarray(batch["_combo"])[:0],
            x_col: np.asarray(batch[x_col])[:0],
            y_col: np.asarray(batch[y_col])[:0],
            "n": np.empty(0, dtype=np.int64),
        }

    parts = ds.select_columns([x_col, y_col]).map_batches(
        partial, batch_format="pandas", batch_size=None
    )
    merged = sorted_group_scan(
        parts,
        "_combo",
        merge_group,
        merge_empty,
        num_partitions=num_partitions,
        out_schema=cell_schema,
    ).materialize()
    if merged.count() > max_cells:
        raise ValueError(
            f"merged joint exceeds max_cells={max_cells} cells; "
            "association stats over near-unique columns are not a "
            "meaningful workload — bucket the columns first or raise "
            "the cap explicitly"
        )
    return (
        merged.to_pandas()
        .drop(columns=["_combo"])
        .sort_values([x_col, y_col], kind="mergesort", ignore_index=True)
    )


def grouped_entropy(
    ds: ray.data.Dataset,
    group_col: str,
    val_col: str,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-group Shannon entropy (bits) of ``val_col``'s value
    distribution, DuckDB ``entropy()`` semantics — the how-diverse-is-
    this-slice profile (e.g. per-source token diversity, per-user
    event-type spread).  Output one row per group:

    ``(group_col, n int64, n_distinct int64, entropy_e4 int64)``

    with half-up e4 fixed point; single-valued groups read 0.  Null
    keys/values excluded (so a group whose every value is null emits no
    row — mirror the oracle with ``WHERE val IS NOT NULL``).

    Combiner-first: each block reduces to its (group, value) counts;
    only those partials shuffle (bounded by vocabulary x blocks, never
    by rows), and each group's entropy is computed in one vectorized
    pass over its merged value counts:

        H = log2(n) - (1/n) * sum(c * log2(c))

    — a float64 expression whose ~1e-15 relative error is far inside
    the e4 rounding tolerance of DuckDB's own float accumulation.
    """
    from ..stages.sortedrun import sorted_group_scan
    from .lag import _arrow_schema

    gtype = _arrow_schema(ds).field(group_col).type

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch[[group_col, val_col]].dropna()
        g = d.groupby([group_col, val_col], sort=False, observed=True).size()
        return g.reset_index(name="n")

    partials = ds.select_columns([group_col, val_col]).map_batches(
        partial, batch_format="pandas"
    )

    out_schema = pa.schema(
        [
            (group_col, gtype),
            ("n", pa.int64()),
            ("n_distinct", pa.int64()),
            ("entropy_e4", pa.int64()),
        ]
    )

    def finish(group: dict[str, np.ndarray]) -> dict:
        vals = np.asarray(group[val_col])
        cnts = np.asarray(group["n"], dtype=np.int64)
        # merge the per-block partial counts of each distinct value
        uniq, inv = np.unique(vals, return_inverse=True)
        c = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(c, inv, cnts)
        n = int(c.sum())
        cf = c.astype(np.float64)
        h = np.log2(float(n)) - float((cf * np.log2(cf)).sum()) / n
        return {
            group_col: np.asarray(group[group_col])[:1],
            "n": np.array([n], dtype=np.int64),
            "n_distinct": np.array([len(uniq)], dtype=np.int64),
            "entropy_e4": np.array(
                [np.floor(h * 10_000.0 + 0.5)], dtype=np.int64
            ),
        }

    def empty(batch: dict[str, np.ndarray]) -> dict:
        return {
            group_col: np.asarray(batch[group_col])[:0],
            "n": np.empty(0, dtype=np.int64),
            "n_distinct": np.empty(0, dtype=np.int64),
            "entropy_e4": np.empty(0, dtype=np.int64),
        }

    return sorted_group_scan(
        partials, group_col, finish, empty,
        num_partitions=num_partitions, out_schema=out_schema,
    )


def chi_squared_independence(
    ds: ray.data.Dataset,
    x_col: str,
    y_col: str,
    max_cells: int = 1_000_000,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Pearson chi-squared test of independence between two categorical
    columns, plus Cramér's V effect size — the are-these-associated
    audit next to :func:`mutual_information`'s how-much measure.
    Output exactly one row:

    ``(n int64, r int64, c int64, dof int64, chi2_e4 int64,
    cramers_v_e4 int64|null)``

    with half-up e4 fixed point; ``cramers_v_e4`` is null when
    ``dof = 0`` (a single-valued margin has no association to measure).
    Null x or y rows are excluded.

    Same scale shape as MI: blocks reduce to (x, y) pair counts, the
    partials merge distributed, and the statistic runs over the merged
    joint (bounded by ``|X| x |Y|``, guarded by ``max_cells``).
    Zero-observed cells are handled in closed form — over ALL r*c
    cells, ``sum((o-e)^2/e) = sum_observed((o-e)^2/e) + (N -
    sum_observed(e))`` since expected counts total N — so the sparse
    joint never expands to the dense grid.
    """
    joint = _merged_joint(
        ds, x_col, y_col, max_cells=max_cells,
        num_partitions=num_partitions,
    )
    if len(joint) == 0:
        raise ValueError(
            "empty input after null exclusion; chi-squared undefined"
        )
    n = joint["n"].to_numpy(dtype=np.int64)
    total = int(n.sum())
    nx = joint.groupby(x_col)["n"].transform("sum").to_numpy(np.int64)
    ny = joint.groupby(y_col)["n"].transform("sum").to_numpy(np.int64)
    e = nx.astype(np.float64) * ny.astype(np.float64) / float(total)
    d = n.astype(np.float64) - e
    chi2 = float(np.sum(d * d / e)) + (total - float(np.sum(e)))
    r = int(joint[x_col].nunique())
    c = int(joint[y_col].nunique())
    dof = (r - 1) * (c - 1)
    if dof > 0:
        v = np.sqrt(chi2 / (total * (min(r, c) - 1)))
        v_e4 = int(np.floor(v * 10_000.0 + 0.5))
    else:
        v_e4 = None
    return ray.data.from_arrow(
        pa.table(
            {
                "n": pa.array([total], type=pa.int64()),
                "r": pa.array([r], type=pa.int64()),
                "c": pa.array([c], type=pa.int64()),
                "dof": pa.array([dof], type=pa.int64()),
                "chi2_e4": pa.array(
                    [int(np.floor(chi2 * 10_000.0 + 0.5))],
                    type=pa.int64(),
                ),
                "cramers_v_e4": pa.array([v_e4], type=pa.int64()),
            }
        )
    )
