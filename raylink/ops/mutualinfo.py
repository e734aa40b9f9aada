"""Mutual information between two categorical columns.

The feature-relevance / redundancy measure a curation pipeline runs
before keeping a metadata column (does ``source`` actually tell you
anything about ``language``?) — the categorical sibling of the numeric
correlation op (``ops/normalize.py``).

Scale shape: every block reduces to its (x, y) pair counts (one lexsort
+ run-length pass), those partials merge on the driver, and the MI math
runs over the merged JOINT table — which is bounded by
``|X| x |Y|`` (vocabulary sizes), not by rows.  A ``max_cells`` guard
refuses pathological cardinalities loudly (an id-by-id "MI" is a bug,
not a workload).  Marginals derive from the joint, so one pass over the
data suffices and counts are exact int64.

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

__all__ = ["mutual_information"]


def mutual_information(
    ds: ray.data.Dataset,
    x_col: str,
    y_col: str,
    max_cells: int = 1_000_000,
) -> ray.data.Dataset:
    """Per-cell MI contributions of ``x_col`` vs ``y_col``.  Output one
    row per OBSERVED (x, y) cell:

    ``(x_col, y_col, n int64, mi_term_e4 int64)``

    with ``sum(mi_term_e4)/1e4`` the total mutual information in nats.
    """
    if max_cells < 1:
        raise ValueError("max_cells must be >= 1")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch[[x_col, y_col]].dropna()
        g = d.groupby([x_col, y_col], sort=False, observed=True).size()
        out = g.reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return out

    parts = ds.select_columns([x_col, y_col]).map_batches(
        partial, batch_format="pandas", batch_size=None
    ).materialize()
    if parts.count() > max_cells:
        raise ValueError(
            f"joint cell partials exceed max_cells={max_cells}; "
            "MI over near-unique columns is not a meaningful workload — "
            "bucket the columns first or raise the cap explicitly"
        )
    joint = (
        parts.to_pandas()
        .groupby([x_col, y_col], sort=True)["n"]
        .sum()
        .reset_index()
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
