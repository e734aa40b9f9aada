"""Pooled (LUT) engine: equivalence with the row-pair engine + grid kernel.

The pooled engine (raylink/pipelines/pooled.py) re-expresses the
reference's unique-value economy (gammaCKpar.jl pools); these tests pin it
to the row engine, which is itself oracled against DuckDB.
"""

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data

from raylink.config import parse_config
from raylink.pipelines.linkage import link_records, dedupe_records
from raylink.pipelines.pooled import (
    dedupe_records_pooled,
    link_records_pooled,
    poolable,
)
from raylink.sources.synth import make_ref_benchmark_tables


def _cfg(blocking_cap=256):
    return parse_config(
        {
            "link_type": "link_only",
            "idvar": ["TV_ID", "TS_ID"],
            "comparisons": {
                "name": "total",
                "threshold_match": 0.88,
                "variables": [
                    {"varname": "FIRST_NAME", "method": "jarowinkler"},
                    {"varname": "MIDDLE_NAME", "method": "exact"},
                    {"varname": "STREET_NAME", "method": "jarowinkler"},
                ],
            },
            "blocking": {"cap": blocking_cap},
        }
    )


def _hist_of(res) -> pd.Series:
    return res.leaf_patterns.groupby("pattern_key")["cnt"].sum().sort_index()


def test_pooled_link_matches_row_engine():
    a, b = make_ref_benchmark_tables(500, 350, seed=11)
    da, db = ray.data.from_pandas(a), ray.data.from_pandas(b)
    cfg = _cfg()
    # block on MIDDLE_NAME so both engines see the identical pair set
    res_row = link_records(da, db, cfg, block_keys=["MIDDLE_NAME"])
    res_pool = link_records_pooled(da, db, cfg, block_keys=["MIDDLE_NAME"])
    assert _hist_of(res_row).round(6).equals(_hist_of(res_pool).round(6))
    assert res_row.em.p_m == pytest.approx(res_pool.em.p_m, rel=1e-12)
    cols = ["id_a", "id_b", "pattern_key"]
    m_row = (
        res_row.matches.to_pandas()[cols]
        .sort_values(cols).reset_index(drop=True)
    )
    m_pool = (
        res_pool.matches.to_pandas()[cols]
        .sort_values(cols).reset_index(drop=True)
    )
    assert m_row.equals(m_pool)
    # matches carry unpacked gamma columns in both engines
    assert "gamma_FIRST_NAME" in res_pool.matches.schema().names


def test_pooled_unblocked_full_cross_product():
    a, b = make_ref_benchmark_tables(120, 80, seed=3)
    cfg = _cfg(blocking_cap=50)  # force salting of the single block
    res = link_records_pooled(
        ray.data.from_pandas(a), ray.data.from_pandas(b), cfg, block_keys=[]
    )
    # every pair of the cross product is scored exactly once
    assert res.counters["scored_pairs"] == 120 * 80
    assert res.counters["hot_blocks"] == 1


def test_pooled_dedupe_matches_row_engine():
    a, b = make_ref_benchmark_tables(250, 250, seed=5)
    # planted near-dups are cross-table; a self-dedupe over the union sees them
    both = pd.concat(
        [a.rename(columns={"TV_ID": "rid"}), b.rename(columns={"TS_ID": "rid"})],
        ignore_index=True,
    )
    cfg = _cfg()
    ds = ray.data.from_pandas(both)
    # block on FIRST_NAME (0.5% null): the ROW engine's pair batches carry
    # raw value columns and an all-null string slice breaks Arrow schema
    # unification — the pooled engine ships int codes and is immune
    res_row = dedupe_records(ds, cfg, "rid", block_keys=["FIRST_NAME"], cluster=False)
    res_pool = dedupe_records_pooled(
        ds, cfg, "rid", block_keys=["FIRST_NAME"], cluster=False
    )
    # the row engine folds the residual differently only above the scan;
    # the scanned histograms must agree exactly
    assert res_row.counters["scored_pairs"] == res_pool.counters["scored_pairs"]
    cols = ["id_a", "id_b", "pattern_key"]
    m_row = (
        res_row.matches.to_pandas()[cols].sort_values(cols).reset_index(drop=True)
    )
    m_pool = (
        res_pool.matches.to_pandas()[cols].sort_values(cols).reset_index(drop=True)
    )
    assert m_row.equals(m_pool)


def test_poolable_detection():
    from raylink.config import VarConfig

    assert poolable([VarConfig(name="x", method="jw")])
    assert poolable([VarConfig(name="x", method="exact")])
    assert poolable([VarConfig(name="x", method="numeric")])
    assert not poolable([VarConfig(name="x", method="token_lv")])


def test_jw_grid_matches_scalar():
    from raylink.functions.strdist import (
        char_bitmask,
        encode_strings,
        jaro_winkler,
        jaro_winkler_grid,
    )

    rng = np.random.default_rng(17)
    letters = np.array(list("ABCDEFGHIJKLMNOPQRSTUVWXYZ"))
    base = ["".join(rng.choice(letters, rng.integers(3, 13))) for _ in range(300)]
    va = base[:100]
    vb = []
    for i in range(400):
        s = base[i % 300]
        r = rng.random()
        if r < 0.3 and len(s) > 4:  # near-duplicates exercise the exact path
            ch = list(s)
            ch[int(rng.integers(0, len(ch)))] = str(rng.choice(letters))
            s = "".join(ch)
        vb.append(s)
    ea, la = encode_strings(va)
    eb, lb = encode_strings(vb)
    sims = jaro_winkler_grid(
        ea, la, char_bitmask(ea), eb, lb, char_bitmask(eb),
        np.arange(len(va)), prune_below=0.88,
    )
    for i in range(len(va)):
        for j in range(len(vb)):
            t = jaro_winkler(va[i], vb[j])
            # gamma classification identical at the reference cuts
            g_true = 2 if round(t, 4) >= 0.92 else (1 if round(t, 4) >= 0.88 else 0)
            s4 = round(float(sims[i, j]), 4)
            g_got = 2 if s4 >= 0.92 else (1 if s4 >= 0.88 else 0)
            assert g_got == g_true, (va[i], vb[j], t, sims[i, j])
            # above the prune cut the value is EXACT, not a bound
            if t >= 0.8795:
                assert sims[i, j] == pytest.approx(t, abs=1e-12)


def test_pooled_fuzzy_truncate_matches_row_engine():
    """The fuzzy_truncate flag (gammaCKfuzzy.jl 16-codeunit window) takes
    the same effect in both engines: long names differing only past
    position 16 become exact agreements, and the two engines' histograms
    stay identical."""
    a, b = make_ref_benchmark_tables(300, 200, seed=17)
    # plant long strings whose difference is beyond 16 codeunits
    a = a.copy()
    b = b.copy()
    a.loc[a.index[:30], "STREET_NAME"] = "VERYLONGSTREETNAME_ALPHA"
    b.loc[b.index[:20], "STREET_NAME"] = "VERYLONGSTREETNAME_OMEGA"
    cfg = parse_config(
        {
            "link_type": "link_only",
            "idvar": ["TV_ID", "TS_ID"],
            "comparisons": {
                "name": "total",
                "threshold_match": 0.88,
                "variables": [
                    {"varname": "FIRST_NAME", "method": "jarowinkler"},
                    {"varname": "MIDDLE_NAME", "method": "exact"},
                    {"varname": "STREET_NAME", "method": "jarowinkler",
                     "fuzzy_truncate": True},
                ],
            },
            "blocking": {"cap": 256},
        }
    )
    da, db = ray.data.from_pandas(a), ray.data.from_pandas(b)
    res_row = link_records(da, db, cfg, block_keys=["MIDDLE_NAME"])
    res_pool = link_records_pooled(da, db, cfg, block_keys=["MIDDLE_NAME"])
    assert _hist_of(res_row).round(6).equals(_hist_of(res_pool).round(6))
    # and truncation is actually in effect: the same data without the
    # flag produces a different histogram (the planted long pairs no
    # longer reach exact agreement)
    hist_trunc = _hist_of(res_row)
    cfg_off = parse_config(
        {
            "link_type": "link_only",
            "idvar": ["TV_ID", "TS_ID"],
            "comparisons": {
                "name": "total",
                "threshold_match": 0.88,
                "variables": [
                    {"varname": "FIRST_NAME", "method": "jarowinkler"},
                    {"varname": "MIDDLE_NAME", "method": "exact"},
                    {"varname": "STREET_NAME", "method": "jarowinkler"},
                ],
            },
            "blocking": {"cap": 256},
        }
    )
    res_off = link_records(da, db, cfg_off, block_keys=["MIDDLE_NAME"])
    assert not _hist_of(res_off).round(6).equals(hist_trunc)


def _tf_cfg(blocking_cap=256):
    return parse_config(
        {
            "link_type": "link_only",
            "idvar": ["TV_ID", "TS_ID"],
            "comparisons": {
                "name": "total",
                "threshold_match": 0.88,
                "variables": [
                    {"varname": "FIRST_NAME", "method": "jarowinkler",
                     "tf_adjust": True},
                    {"varname": "MIDDLE_NAME", "method": "exact",
                     "tf_adjust": True},
                    {"varname": "STREET_NAME", "method": "jarowinkler"},
                ],
            },
            "blocking": {"cap": blocking_cap},
        }
    )


def _tf_frame(res) -> pd.DataFrame:
    cols = [
        "id_a", "id_b", "pattern_key",
        "tf_FIRST_NAME_a", "tf_FIRST_NAME_b",
        "tf_MIDDLE_NAME_a", "tf_MIDDLE_NAME_b",
        "final_weight", "final_zeta", "tf_ismatch",
    ]
    return (
        res.tf_matches.to_pandas()[cols]
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )


def test_pooled_tf_link_matches_row_engine():
    """tf side-channel (round 3): the pooled engine's per-code frequency
    vectors + the shared apply_tf_adjustment post-pass reproduce the row
    engine's tf_matches exactly (reference carries tf in its pooled
    kernels, gammaCKpar.jl:132-235 / gammaKpar.jl:60-130)."""
    a, b = make_ref_benchmark_tables(400, 300, seed=23)
    da, db = ray.data.from_pandas(a), ray.data.from_pandas(b)
    cfg = _tf_cfg()
    res_row = link_records(da, db, cfg, block_keys=["MIDDLE_NAME"])
    res_pool = link_records_pooled(da, db, cfg, block_keys=["MIDDLE_NAME"])
    assert res_row.tf_matches is not None and res_pool.tf_matches is not None
    t_row, t_pool = _tf_frame(res_row), _tf_frame(res_pool)
    assert len(t_row) == len(t_pool) and len(t_row) > 0
    pd.testing.assert_frame_equal(t_row, t_pool, rtol=0, atol=0)


def test_pooled_tf_unblocked_and_dedupe():
    a, b = make_ref_benchmark_tables(400, 300, seed=29)
    cfg = _tf_cfg(blocking_cap=200)  # force the direct-cell (salted) path
    res = link_records_pooled(
        ray.data.from_pandas(a), ray.data.from_pandas(b), cfg, block_keys=[]
    )
    assert res.counters["scored_pairs"] == 400 * 300
    assert res.counters["matched_pairs"] > 0
    tfm = res.tf_matches.to_pandas()
    assert {"tf_FIRST_NAME_a", "final_zeta", "tf_ismatch"} <= set(tfm.columns)
    assert len(tfm) == res.counters["matched_pairs"]
    # dedupe path: pooled tf matches the row engine pair-for-pair
    both = pd.concat(
        [a.rename(columns={"TV_ID": "rid"}), b.rename(columns={"TS_ID": "rid"})],
        ignore_index=True,
    )
    ds = ray.data.from_pandas(both)
    res_row = dedupe_records(ds, _tf_cfg(), "rid", block_keys=["FIRST_NAME"],
                             cluster=False)
    res_pool = dedupe_records_pooled(
        ds, _tf_cfg(), "rid", block_keys=["FIRST_NAME"], cluster=False
    )
    t_row, t_pool = _tf_frame(res_row), _tf_frame(res_pool)
    assert len(t_row) == len(t_pool) and len(t_row) > 0
    pd.testing.assert_frame_equal(t_row, t_pool, rtol=0, atol=0)


def test_poolable_tf_detection():
    from raylink.config import VarConfig

    # string/exact tf now poolable; numeric tf and nested tf are not
    assert poolable([VarConfig(name="x", method="jw", tf_adjust=True)])
    assert poolable([VarConfig(name="x", method="exact", tf_adjust=True)])
    assert not poolable([VarConfig(name="x", method="numeric", tf_adjust=True)])
    nested = parse_config(
        {
            "link_type": "link_only",
            "idvar": ["ida", "idb"],
            "comparisons": {
                "name": "total",
                "threshold_match": 0.88,
                "variables": [
                    {"varname": "A", "method": "jarowinkler"},
                    {
                        "comparisons": {
                            "name": "child",
                            "threshold_match": 0.88,
                            "variables": [
                                {"varname": "B", "method": "exact",
                                 "tf_adjust": True},
                            ],
                        }
                    },
                ],
            },
        }
    )
    assert not poolable(nested.leaf_vars(), nested)
