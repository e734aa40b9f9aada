"""Faithful per-pair collapse of nested comparisons with tf_adjust vars.

The reference's hierarchical flow (patterns.jl:188-231) fits each
comparison node's EM on that node's pattern histogram, but when the node
nests tf-flagged variables its MATCH DECISION is per PAIR, not per
pattern: ``generate_tf_adjustment_dict`` (term_frequency_adjustment.jl:
77-103) adds ``log(u_val/denom) * tf_adjustment_weight`` per agreeing tf
variable to ``log(p_m/p_u) + pattern_weight`` for every pair, thresholds
the sigmoid, and ``patterns_to_DiBit`` (patterns.jl:165-186) writes the
resulting per-pair virtual gamma (match2 / nonmatch) that the PARENT's
pattern collection then reads.  Two pairs sharing a leaf pattern can
therefore reach different parent patterns.

This module is that flow on Ray Data, used by ``run_linkage`` whenever a
non-root node carries tf variables (the pattern-level path in
``fit_patterns`` stays the default otherwise — it needs only the tiny
histogram).  Per node, bottom-up:

1. append the pair's node-pattern key (packed from its direct members'
   per-pair gammas — leaf ``gamma_<var>`` columns and child ``vg_<node>``
   columns) in one ``map_batches``;
2. histogram that column (per-block ``np.unique`` partials, driver
   merge — node pattern counts are tiny) + the residual patterns
   collapsed pattern-level (residual pairs were never scored, so they
   carry no tf values; the reference has no residual concept at all);
3. ``em_fit`` on the node histogram (identical EM semantics to
   ``fit_patterns``);
4. for non-root nodes, append the per-pair virtual gamma: pattern
   weight via broadcast searchsorted + per-pair tf adjustment exactly as
   term_frequency_adjustment.jl (fuzzy denom ``max``, exact denom mean,
   u-values from the NODE histogram, natural-log base as in
   ``stages/tf.py``'s documented base choice).

Each node costs one extra pass over the scored pairs — the price of
pair-level semantics — but rows never shuffle: every map is
embarrassingly parallel over broadcast pattern tables.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..config import ComparisonConfig, LinkConfig, VarConfig
from ..constants import MATCH1, MATCH2, NONMATCH
from ..stages.em import EMResult, em_fit
from ..stages.patterns import pack_gammas, unpack_patterns

__all__ = ["has_nested_tf", "fit_patterns_per_pair"]


def has_nested_tf(config: LinkConfig) -> bool:
    """True when any NON-ROOT comparison node directly carries a
    tf_adjust variable (the configs the pattern-level path approximates)."""
    for level in config.levels():
        for node in level:
            if node is config.comparisons:
                continue
            if any(
                isinstance(v, VarConfig) and v.tf_adjust
                for v in node.variables
            ):
                return True
    return False


def _col_histogram(ds: ray.data.Dataset, col: str) -> pd.Series:
    """count() per distinct value of ``col`` — per-block partials, driver
    merge (node-pattern cardinality is tiny at any input scale)."""

    def part(batch: pa.Table) -> pa.Table:
        keys = batch.column(col).to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(keys, return_counts=True)
        return pa.table(
            {"k": uniq.astype(np.int64), "cnt": counts.astype(np.int64)}
        )

    df = (
        ds.select_columns([col])
        .map_batches(part, batch_format="pyarrow")
        .to_pandas()
    )
    return df.groupby("k")["cnt"].sum()


def fit_patterns_per_pair(
    scored: ray.data.Dataset,
    res_hist: pd.DataFrame | None,
    config: LinkConfig,
    n_comparisons: int,
    seed: int = 1234,
) -> tuple[EMResult, dict[str, EMResult], pd.DataFrame, ray.data.Dataset]:
    """Returns ``(root_em, child_ems, root_patterns, scored_rekeyed)``.

    ``root_patterns`` has the leaf-table columns match filtering expects
    (pattern_key / cnt / zeta_j / weights / weights_raw) keyed by ROOT
    pattern key; ``scored_rekeyed`` carries that key as ``pattern_key``
    (the original leaf key moves to ``leaf_pattern_key``).
    """
    leaf_names = [v.name for v in config.leaf_vars()]
    bit_pos = {n: k for k, n in enumerate(leaf_names)}

    if res_hist is not None and len(res_hist):
        res_keys = res_hist["pattern_key"].to_numpy(np.int64)
        res_cnt = res_hist["cnt"].to_numpy(np.float64)
        res_gam = unpack_patterns(res_keys, len(leaf_names))
    else:
        res_keys = np.empty(0, dtype=np.int64)
        res_cnt = np.empty(0, dtype=np.float64)
        res_gam = np.empty((0, len(leaf_names)), dtype=np.uint8)

    virtual_res: dict[str, np.ndarray] = {}
    child_ems: dict[str, EMResult] = {}
    root = config.comparisons
    root_em: EMResult | None = None
    root_nk_col = ""

    for level in config.levels():
        for node in level:
            direct = list(node.variables)
            names = [v.name for v in direct]
            pair_cols: list[str] = []
            res_cols: list[np.ndarray] = []
            for v in direct:
                if isinstance(v, ComparisonConfig):
                    pair_cols.append(f"vg_{v.name}")
                    res_cols.append(virtual_res[v.name])
                else:
                    pair_cols.append(f"gamma_{v.name}")
                    res_cols.append(res_gam[:, bit_pos[v.name]])
            nk_col = f"nk_{node.name}"

            def add_key(
                batch: pa.Table, _cols=tuple(pair_cols), _out=nk_col
            ) -> pa.Table:
                gs = [
                    batch.column(c).to_numpy(zero_copy_only=False)
                    for c in _cols
                ]
                return batch.append_column(
                    _out, pa.array(pack_gammas(gs), type=pa.int64())
                )

            scored = scored.map_batches(
                add_key, batch_format="pyarrow"
            ).materialize()

            cnt = _col_histogram(scored, nk_col).astype(np.float64)
            if len(res_keys):
                res_nk = pack_gammas(res_cols)
                cnt = cnt.add(
                    pd.Series(res_cnt).groupby(res_nk).sum(), fill_value=0.0
                )
            node_keys = cnt.index.to_numpy(np.int64)
            node_counts = cnt.to_numpy(np.float64)
            node_gammas = unpack_patterns(node_keys, len(direct))

            em = em_fit(
                node_gammas,
                node_counts,
                n_comparisons,
                names,
                pattern_keys=node_keys,
                seed=seed,
                **node.em_kwargs(),
            )
            if node is root:
                root_em = em
                root_nk_col = nk_col
                continue

            child_ems[node.name] = em
            pw = em.patterns_w
            o = np.argsort(pw["pattern_key"].to_numpy(np.int64))
            keys_s = pw["pattern_key"].to_numpy(np.int64)[o]
            w_s = pw["weights"].to_numpy(np.float64)[o]
            prior = float(np.log(em.p_m / em.p_u))
            thr = float(node.threshold_match)

            direct_tf = [
                (i, v)
                for i, v in enumerate(direct)
                if isinstance(v, VarConfig) and v.tf_adjust
            ]
            # u-values from the NODE histogram: P(gamma_i = v), exactly
            # get_tf_u_values (term_frequency_adjustment.jl:133-137)
            uvals: dict[str, dict[int, float]] = {}
            for i, v in direct_tf:
                g = node_gammas[:, i]
                uvals[v.name] = {
                    MATCH1: float(node_counts[g == MATCH1].sum())
                    / n_comparisons,
                    MATCH2: float(node_counts[g == MATCH2].sum())
                    / n_comparisons,
                }
            tf_meta = tuple(
                (
                    v.name,
                    i,
                    v.kernel != "exact",
                    float(v.tf_adjustment_weight),
                )
                for i, v in direct_tf
            )

            # residual patterns: pattern-level decision (no tf values
            # exist for never-scored pairs)
            if len(res_keys):
                pos = np.clip(
                    np.searchsorted(keys_s, pack_gammas(res_cols)),
                    0,
                    max(len(keys_s) - 1, 0),
                )
                base = prior + w_s[pos]
                ok = 1.0 / (1.0 + np.exp(-base)) >= thr
                virtual_res[node.name] = np.where(
                    ok, MATCH2, NONMATCH
                ).astype(np.uint8)
            else:
                virtual_res[node.name] = np.empty(0, dtype=np.uint8)

            def add_vg(
                batch: pa.Table,
                _nk=nk_col,
                _out=f"vg_{node.name}",
                _keys=keys_s,
                _w=w_s,
                _prior=prior,
                _thr=thr,
                _meta=tf_meta,
                _uv=uvals,
                _nd=len(direct),
            ) -> pa.Table:
                nk = batch.column(_nk).to_numpy(zero_copy_only=False)
                pos = np.clip(
                    np.searchsorted(_keys, nk), 0, max(len(_keys) - 1, 0)
                )
                w = _prior + _w[pos]
                gam = unpack_patterns(nk, _nd)
                for name, i, fuzzy, pwgt in _meta:
                    g = gam[:, i]
                    agree = (g == MATCH1) | (g == MATCH2)
                    if not agree.any():
                        continue
                    fa = (
                        batch.column(f"tf_{name}_a")
                        .to_numpy(zero_copy_only=False)
                        .astype(np.float64)
                    )
                    fb = (
                        batch.column(f"tf_{name}_b")
                        .to_numpy(zero_copy_only=False)
                        .astype(np.float64)
                    )
                    denom = (
                        np.maximum(fa, fb) if fuzzy else (fa + fb) / 2.0
                    )
                    uv = np.where(
                        g == MATCH2, _uv[name][MATCH2], _uv[name][MATCH1]
                    )
                    with np.errstate(divide="ignore", invalid="ignore"):
                        adj = np.where(
                            agree, np.log(uv / denom) * pwgt, 0.0
                        )
                    w = w + adj
                zeta = 1.0 / (1.0 + np.exp(-w))
                vg = np.where(zeta >= _thr, MATCH2, NONMATCH).astype(
                    np.uint8
                )
                return batch.append_column(
                    _out, pa.array(vg, type=pa.uint8())
                )

            scored = scored.map_batches(
                add_vg, batch_format="pyarrow"
            ).materialize()

    assert root_em is not None
    pw = root_em.patterns_w
    root_patterns = pd.DataFrame(
        {
            "pattern_key": pw["pattern_key"].to_numpy(np.int64),
            "cnt": pw["counts"].to_numpy(np.float64),
            "zeta_j": pw["zeta_j"].to_numpy(np.float64),
            "weights": pw["weights"].to_numpy(np.float64),
            "weights_raw": (
                pw["weights_raw"]
                if "weights_raw" in pw.columns
                else pw["weights"]
            ).to_numpy(np.float64),
        }
    ).sort_values("pattern_key", ignore_index=True)

    def rekey(batch: pa.Table, _nk=root_nk_col) -> pa.Table:
        leaf = batch.column("pattern_key")
        idx = batch.column_names.index("pattern_key")
        batch = batch.set_column(idx, "leaf_pattern_key", leaf)
        nk = batch.column(_nk)
        batch = batch.append_column("pattern_key", nk)
        return batch

    return root_em, child_ems, root_patterns, scored.map_batches(
        rekey, batch_format="pyarrow"
    )
