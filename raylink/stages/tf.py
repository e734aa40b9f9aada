"""Term-frequency adjustment.

Reference semantics (/root/reference/src/term_frequency_adjustment.jl and the
tf side-channels in the gamma kernels):

- Per-record term frequency for a tf-flagged variable: ``count(value)/N``
  within its table, clamped below at ``tf_minimum_u_value``
  (gammaKpar.jl:78-89, default 0.001).
- Per-pair denominator: ``max(f_a, f_b)`` for fuzzy/string comparisons,
  ``(f_a + f_b)/2`` for exact (term_frequency_adjustment.jl:110-116).
- Per-variable u-value at the pair's gamma level v in {1, 2}:
  ``sum(counts of patterns with gamma_k == v) / number_of_comparisons``
  (term_frequency_adjustment.jl:133-137).
- Per-pair adjusted weight: ``log(u_val/denom) * tf_adjustment_weight`` summed
  over the pattern's agreeing tf variables, added to
  ``log(p_m/p_u) + pattern_weight``; the adjusted posterior is the sigmoid
  (term_frequency_adjustment.jl:53-74,126-131).  NOTE: the reference's
  skeleton mixes a log2 prior into natural-log weights
  (generate_tf_skeleton's ``log2`` at :36 with ``base="log"`` from
  patterns.jl:216) — we use natural log throughout, which is the evidently
  intended behaviour.

Distribution: frequency tables come from a ``groupby(value).count()`` whose
result is broadcast when small and hash-joined back otherwise; the per-pair
adjustment is an embarrassingly parallel ``map_batches`` over matched pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..config import VarConfig
from ..constants import MATCH1, MATCH2
from .em import EMResult
from .patterns import unpack_patterns

__all__ = ["add_tf_columns", "tf_u_values", "apply_tf_adjustment"]

_BROADCAST_LIMIT = 5_000_000  # distinct values; beyond this use a hash join


def _partial_value_counts(records: ray.data.Dataset, col: str) -> ray.data.Dataset:
    """Per-block ``value_counts`` partials merged by one small groupby-sum.

    Ray's sort-based row aggregate costs ~100us/row in Python merge code;
    the partials (one row per distinct value per block) are orders of
    magnitude fewer rows, so the remaining groupby is cheap.  Null rows are
    excluded here; callers recover the null count as ``n_records -
    sum(cnt)``.
    """

    def partial(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        s = pd.Series(batch[col])
        vc = s.value_counts(dropna=True)
        return {
            col: np.asarray(vc.index.to_numpy(), dtype=object),
            "cnt": vc.to_numpy().astype(np.int64),
        }

    partials = records.select_columns([col]).map_batches(
        partial, batch_format="numpy", batch_size=None
    )
    return partials.groupby(col).sum("cnt")


def add_tf_columns(
    records: ray.data.Dataset,
    tf_vars: list[VarConfig],
    n_records: int | None = None,
) -> ray.data.Dataset:
    """Attach ``tf_<var>`` per-record frequency columns.

    Per-block ``value_counts`` partials + one small groupby-sum per tf
    variable; the (value -> freq) table is broadcast via ``ray.put`` and
    applied with a vectorized ``searchsorted`` while it fits, else
    distributed-hash-joined back (the reference's tf tables,
    gammaCKpar.jl:180-193, have no cardinality ceiling and neither does
    this).
    """
    if not tf_vars:
        return records
    n = n_records if n_records is not None else records.count()
    for v in tf_vars:
        counts_ds = _partial_value_counts(records, v.name).materialize()
        n_distinct = counts_ds.count()
        colname = f"tf_{v.name}"
        var_name = v.name
        if n_distinct > _BROADCAST_LIMIT:
            # distributed join path: freq table stays a Dataset
            def to_freq(batch: pa.Table, _v=v) -> pa.Table:
                cnt = batch.column("sum(cnt)").to_numpy(zero_copy_only=False)
                freq = np.maximum(cnt / n, _v.tf_minimum_u_value).astype(
                    np.float32
                )
                return batch.select([var_name]).append_column(
                    colname, pa.array(freq, type=pa.float32())
                )

            freq_ds = counts_ds.map_batches(to_freq, batch_format="pyarrow")
            import ray as _ray

            nparts = max(16, int(_ray.cluster_resources().get("CPU", 8)))
            records = records.join(
                freq_ds,
                join_type="left_outer",
                num_partitions=nparts,
                on=(var_name,),
            )

            # null-key rows miss the join; give them the null-group
            # frequency (the reference counts the missing group too,
            # gammaKpar.jl:101-108)
            total_nonnull = counts_ds.sum("sum(cnt)") or 0
            null_cnt = n - int(total_nonnull)
            null_freq = (
                max(null_cnt / n, v.tf_minimum_u_value)
                if null_cnt > 0
                else v.tf_minimum_u_value
            )

            def fill_null(batch: pa.Table, _nf=null_freq) -> pa.Table:
                tfc = batch.column(colname).to_numpy(zero_copy_only=False)
                out = np.where(
                    np.isnan(tfc.astype(np.float64)), np.float32(_nf), tfc
                ).astype(np.float32)
                idx = batch.column_names.index(colname)
                return batch.set_column(
                    idx, colname, pa.array(out, type=pa.float32())
                )

            records = records.map_batches(fill_null, batch_format="pyarrow")
            continue
        counts = counts_ds.to_pandas()
        vals = counts[v.name].to_numpy()
        freq = np.maximum(
            counts["sum(cnt)"].to_numpy() / n, v.tf_minimum_u_value
        )
        # null rows also get a frequency (the reference counts the missing
        # group too, gammaKpar.jl:101-108)
        null_cnt = n - int(counts["sum(cnt)"].sum())
        null_freq = (
            max(null_cnt / n, v.tf_minimum_u_value)
            if null_cnt > 0
            else v.tf_minimum_u_value
        )
        order = np.argsort(vals)
        vals_s = np.asarray(vals, dtype=object)[order]
        freq_s = freq[order].astype(np.float32)
        lut_ref = ray.put((vals_s, freq_s))

        def add(batch: pa.Table, _ref=lut_ref, _col=colname, _var=var_name, _nf=null_freq) -> pa.Table:
            vals_sorted, freqs = ray.get(_ref)
            col = batch.column(_var).to_numpy(zero_copy_only=False)
            # Categorical codes = one C-speed hash lookup per row (a Python
            # loop or object-array searchsorted here is 10-100x slower)
            codes = pd.Categorical(col, categories=vals_sorted).codes
            out = np.where(
                codes >= 0,
                freqs[np.clip(codes, 0, max(len(freqs) - 1, 0))],
                np.float32(_nf),
            ).astype(np.float32)
            return batch.append_column(_col, pa.array(out, type=pa.float32()))

        records = records.map_batches(add, batch_format="pyarrow")
    return records


def tf_u_values(
    leaf_patterns: pd.DataFrame,
    var_positions: dict[str, int],
    n_vars: int,
    number_of_comparisons: float,
) -> dict[str, dict[int, float]]:
    """Per tf-variable, per gamma level v in {1,2}: P(gamma_k = v)."""
    gam = unpack_patterns(leaf_patterns["pattern_key"].to_numpy(np.int64), n_vars)
    cnt = leaf_patterns["cnt"].to_numpy(np.float64)
    out: dict[str, dict[int, float]] = {}
    for name, k in var_positions.items():
        out[name] = {
            v: float(cnt[gam[:, k] == v].sum()) / number_of_comparisons
            for v in (MATCH1, MATCH2)
        }
    return out


def apply_tf_adjustment(
    matched_pairs: ray.data.Dataset,
    em: EMResult,
    leaf_patterns: pd.DataFrame,
    all_vars: list[VarConfig],
    tf_vars: list[VarConfig],
    threshold: float | None = None,
) -> ray.data.Dataset:
    """Per-pair tf-adjusted weights/posteriors over the matched-pair Dataset.

    Input rows must carry ``pattern_key`` and ``tf_<var>_a`` / ``tf_<var>_b``
    for each tf variable.  Adds ``final_weight``, ``final_zeta`` and
    ``tf_ismatch`` columns (pairs whose pattern has no agreeing tf variable
    keep the pattern-level posterior, term_frequency_adjustment.jl:36-41).
    """
    t = em.threshold_match if threshold is None else threshold
    prior = float(np.log(em.p_m / em.p_u))
    positions = {v.name: i for i, v in enumerate(all_vars)}
    uvals = tf_u_values(
        leaf_patterns, {v.name: positions[v.name] for v in tf_vars},
        len(all_vars), float(em.number_of_comparisons),
    )
    # per-pattern: leaf weight + which tf vars agree at which level
    keys = leaf_patterns["pattern_key"].to_numpy(np.int64)
    weights = leaf_patterns["weights"].to_numpy(np.float64)
    gam = unpack_patterns(keys, len(all_vars))
    order = np.argsort(keys)
    keys_s = keys[order]
    weights_s = weights[order]
    gam_s = gam[order]
    tf_meta = [
        (
            v.name,
            positions[v.name],
            v.kernel != "exact",  # fuzzy denominator?
            float(v.tf_adjustment_weight),
        )
        for v in tf_vars
    ]

    def adjust(batch: pa.Table) -> pa.Table:
        pk = batch.column("pattern_key").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys_s, pk)
        pos = np.clip(pos, 0, max(len(keys_s) - 1, 0))
        w = prior + weights_s[pos]
        for name, k, is_fuzzy, pw in tf_meta:
            g = gam_s[pos, k]
            agree = (g == MATCH1) | (g == MATCH2)
            if not agree.any():
                continue
            fa = batch.column(f"tf_{name}_a").to_numpy(zero_copy_only=False).astype(np.float64)
            fb = batch.column(f"tf_{name}_b").to_numpy(zero_copy_only=False).astype(np.float64)
            denom = np.maximum(fa, fb) if is_fuzzy else (fa + fb) / 2.0
            uv = np.where(g == MATCH2, uvals[name][MATCH2], uvals[name][MATCH1])
            adj = np.where(agree, np.log(uv / denom) * pw, 0.0)
            w = w + adj
        zeta = 1.0 / (1.0 + np.exp(-w))
        out = batch.append_column("final_weight", pa.array(w, type=pa.float64()))
        out = out.append_column("final_zeta", pa.array(zeta, type=pa.float64()))
        out = out.append_column("tf_ismatch", pa.array(zeta >= t))
        return out

    return matched_pairs.map_batches(adjust, batch_format="pyarrow")
