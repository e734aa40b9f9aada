"""EM tests on small closed-form histograms (FIXTURES.md F3)."""

import numpy as np
import pytest

from raylink.stages.em import em_fit
from raylink.stages.patterns import (
    add_residual_pattern,
    pack_gammas,
    unpack_patterns,
)
import pandas as pd


def _simple_histogram():
    # two binary vars; 100 clear matches, ~100k clear nonmatches
    patterns = np.array(
        [[2, 2], [2, 0], [0, 2], [0, 0], [3, 2]], dtype=np.uint8
    )
    counts = np.array([100, 30, 30, 99830, 10])
    return patterns, counts


def test_em_converges_and_separates():
    patterns, counts = _simple_histogram()
    r = em_fit(patterns, counts, (1000, 100), ["a", "b"])
    assert r.converged
    assert r.p_m < 0.005  # matches are rare
    assert r.p_u > 0.995
    pw = r.patterns_w
    # the all-agree pattern is a confident match, all-disagree is not
    assert pw.loc[0, "zeta_j"] > 0.99
    assert pw.loc[3, "zeta_j"] < 1e-4
    # counts conservation (reference asserts sum(counts)==N_A*N_B)
    assert pw["counts"].sum() == 1000 * 100


def test_em_missing_is_mar():
    # gamma=3 contributes nothing: pattern [3,2] posterior must sit between
    # [0,2] and [2,2] (it only carries var b's agreement evidence)
    patterns, counts = _simple_histogram()
    r = em_fit(patterns, counts, (1000, 100), ["a", "b"])
    pw = r.patterns_w
    z_both = pw.loc[0, "zeta_j"]
    z_b_only = pw.loc[4, "zeta_j"]
    z_none = pw.loc[3, "zeta_j"]
    assert z_none < z_b_only < z_both


def test_em_monotone_ordering_constraints():
    patterns, counts = _simple_histogram()
    r = em_fit(patterns, counts, (1000, 100), ["a", "b"])
    for km in r.pgamma_km:  # m-probs ascending over gamma levels
        assert np.all(np.diff(km) >= 0)
    for ku in r.pgamma_ku:  # u-probs descending
        assert np.all(np.diff(ku) <= 0)


def test_em_deterministic():
    patterns, counts = _simple_histogram()
    r1 = em_fit(patterns, counts, (1000, 100), ["a", "b"], seed=7)
    r2 = em_fit(patterns, counts, (1000, 100), ["a", "b"], seed=7)
    assert np.array_equal(
        r1.patterns_w["zeta_j"].to_numpy(), r2.patterns_w["zeta_j"].to_numpy()
    )


def test_em_lambda_prior_pulls_p_m():
    patterns, counts = _simple_histogram()
    r0 = em_fit(patterns, counts, (1000, 100), ["a", "b"])
    r1 = em_fit(
        patterns,
        counts,
        (1000, 100),
        ["a", "b"],
        prior_lambda=0.05,
        w_lambda=0.9,
    )
    assert r1.p_m > r0.p_m  # prior pulls prevalence up toward 0.05


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    gam = [rng.integers(0, 4, size=50).astype(np.uint8) for _ in range(5)]
    keys = pack_gammas(gam)
    back = unpack_patterns(keys, 5)
    for k in range(5):
        assert np.array_equal(back[:, k], gam[k])


def test_residual_pattern_accounting():
    hist = pd.DataFrame(
        {
            "pattern_key": np.array([0, 10], dtype=np.uint64),
            "cnt": np.array([5, 7], dtype=np.int64),
        }
    )
    out = add_residual_pattern(hist, 100)
    assert out["cnt"].sum() == 100
    assert out.loc[out["pattern_key"] == 0, "cnt"].iloc[0] == 93
    # no zero pattern present -> it gets created
    hist2 = hist[hist["pattern_key"] != 0]
    out2 = add_residual_pattern(hist2, 100)
    assert out2.loc[out2["pattern_key"] == 0, "cnt"].iloc[0] == 93
    with pytest.raises(ValueError):
        add_residual_pattern(hist, 3)


def test_em_u_b_weight_bound():
    """u_b excludes patterns whose log-Bayes-factor exceeds the bound
    (emlink.jl:168: ismatch = zeta >= t AND weights <= u_b)."""
    patterns, counts = _simple_histogram()
    keys = np.arange(len(counts), dtype=np.int64)
    r = em_fit(patterns, counts, (1000, 100), ["a", "b"], pattern_keys=keys)
    matched = r.matched_keys()
    assert len(matched) > 0
    # a bound below every weight suppresses every match
    r_low = em_fit(
        patterns, counts, (1000, 100), ["a", "b"], pattern_keys=keys, u_b=-1e9
    )
    assert len(r_low.matched_keys()) == 0
    # default 1e10 is a no-op: same matched set
    r_def = em_fit(
        patterns, counts, (1000, 100), ["a", "b"], pattern_keys=keys, u_b=1e10
    )
    assert np.array_equal(np.sort(r_def.matched_keys()), np.sort(matched))


def test_emresult_json_roundtrip_exact():
    """to_json/from_json is float64-exact: the reloaded model reproduces
    matched_keys and every parameter bit-for-bit."""
    import numpy as np

    from raylink.stages.em import EMResult, em_fit

    rng = np.random.default_rng(3)
    patterns = rng.integers(0, 3, size=(12, 3)).astype(np.uint8)
    patterns[0, 1] = 3  # a MISSING cell
    counts = rng.integers(1, 5000, size=12).astype(np.float64)
    em = em_fit(
        patterns, counts, (2, 2), ["a", "b", "c"],
        pattern_keys=np.arange(12, dtype=np.int64),
    )
    em2 = EMResult.from_json(em.to_json())
    assert em2.p_m == em.p_m and em2.p_u == em.p_u
    assert em2.varnames == em.varnames
    assert (em2.matched_keys() == em.matched_keys()).all()
    for x, y in zip(em.pgamma_km, em2.pgamma_km):
        assert (x == y).all()
    for x, y in zip(em.pgamma_ku, em2.pgamma_ku):
        assert (x == y).all()
    for x, y in zip(em.uvals_gamma_jk, em2.uvals_gamma_jk):
        assert (x == y).all()
    pd.testing.assert_frame_equal(
        em.patterns_w.reset_index(drop=True),
        em2.patterns_w.reset_index(drop=True),
        check_dtype=False,
    )
