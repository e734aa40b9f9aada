"""Parity with the reference's own test fixture and assertions.

Extracts the reference's shipped dfA/dfB CSV artifacts
(/root/reference/test/dfA.tar.gz, dfB.tar.gz) and runs the rebuild with the
exact configuration of /root/reference/test/runtests.jl:33-60, asserting the
same five facts its test suite asserts (runtests.jl:66-79):

- matched pattern counts sum to 50
- 26 unique agreement patterns
- pattern counts sum to N_A x N_B (comparison conservation)
- p_u >= 0.999
- p_m <= 0.0005
"""

import os
import tarfile

import numpy as np
import pandas as pd
import pytest

import ray.data

from raylink.config import parse_config
from raylink.pipelines.linkage import link_records

_REF = "/root/reference/test"


def _fixture_config(block_keys: list[str]) -> dict:
    return {
        "idvar": ["ida", "idb"],
        "link_type": "link_only",
        "comparisons": {
            "name": "total",
            "variables": [
                {"varname": v, "partial": True, "method": "jarowinkler",
                 "cut_a": 0.92, "cut_b": 0.88, "w": 0.1}
                for v in ("firstname", "middlename", "lastname")
            ]
            + [
                {"varname": "housenum", "partial": True, "method": "numeric",
                 "cut_a": 1, "cut_b": 2}
            ],
        },
        "blocking": {"keys": block_keys, "cap": 1000},
    }


@pytest.fixture(scope="module")
def fixture_tables(tmp_path_factory):
    if not os.path.exists(os.path.join(_REF, "dfA.tar.gz")):
        pytest.skip("reference fixture not available")
    d = tmp_path_factory.mktemp("ref_fixture")
    for name in ("dfA", "dfB"):
        with tarfile.open(os.path.join(_REF, f"{name}.tar.gz")) as tf:
            tf.extractall(d)
    # CSV load conventions per runtests.jl:11-18 ("", "NA" -> missing) and
    # the uppercase normalization of runtests.jl:25-28
    dfA = pd.read_csv(d / "dfA.csv", na_values=["", "NA"], keep_default_na=False)
    dfB = pd.read_csv(d / "dfB.csv", na_values=["", "NA"], keep_default_na=False)
    for var in ("firstname", "middlename", "lastname"):
        dfA[var] = dfA[var].str.upper()
        dfB[var] = dfB[var].str.upper()
    dfA["ida"] = [f"a{i:06d}" for i in range(len(dfA))]
    dfB["idb"] = [f"b{i:06d}" for i in range(len(dfB))]
    dfA["_one"] = 1
    dfB["_one"] = 1
    return dfA, dfB


def test_reference_runtests_parity(ray_session, fixture_tables):
    dfA, dfB = fixture_tables
    config = parse_config(_fixture_config(["_one"]))
    res = link_records(
        ray.data.from_pandas(dfA), ray.data.from_pandas(dfB), config
    )
    em = res.em
    pw = em.patterns_w
    matched = pw[pw["zeta_j"] >= em.threshold_match]
    assert int(matched["counts"].sum()) == 50  # runtests.jl:70
    assert em.number_of_unique_patterns == 26  # runtests.jl:73
    assert int(pw["counts"].sum()) == len(dfA) * len(dfB)  # runtests.jl:75
    assert em.p_u >= 0.999  # runtests.jl:77
    assert em.p_m <= 0.0005  # runtests.jl:79
    assert res.matches.count() == 50


def test_blocked_residual_matches_unblocked(ray_session, fixture_tables):
    """Pins the sampled-residual approximation (stages/patterns.py::
    sample_residual_histogram) against the reference's exact accounting.

    The reference counts every one of the N_A x N_B comparisons exactly
    (emlink.jl:174); under blocking this repo instead credits the pruned
    mass to a scored random cross-block sample.  This test runs the
    reference fixture once unblocked (exact, the parity test above) and
    once blocked on the lastname first letter — pruning ~94% of the
    comparisons — and asserts the approximation cannot drift:

    - the blocked match set EQUALS the unblocked match set restricted to
      co-blocked pairs (here: all 50 — the blocking keeps every truth pair);
    - p_m agrees within 2% relative;
    - every per-variable m/u probability vector agrees within 5e-3
      absolute (observed drift is <= 7e-4; the bound leaves EM-iteration
      headroom without letting a broken residual sampler pass).
    """
    dfA, dfB = fixture_tables
    dfA = dfA.copy()
    dfB = dfB.copy()
    dfA["ln1"] = dfA["lastname"].str[:1].fillna("~")
    dfB["ln1"] = dfB["lastname"].str[:1].fillna("~")
    ra, rb = ray.data.from_pandas(dfA), ray.data.from_pandas(dfB)

    full = link_records(ra, rb, parse_config(_fixture_config(["_one"])))
    blocked = link_records(ra, rb, parse_config(_fixture_config(["ln1"])))

    # the blocked run actually pruned pairs and took the sampled path
    assert blocked.counters["residual_mode"] == "sampled"
    assert blocked.counters["residual_pairs"] > 0.9 * len(dfA) * len(dfB)

    fm = full.matches.to_pandas()
    bm = blocked.matches.to_pandas()
    l1a = dict(zip(dfA["ida"], dfA["ln1"]))
    l1b = dict(zip(dfB["idb"], dfB["ln1"]))
    full_co_blocked = {
        p
        for p in zip(fm["id_a"], fm["id_b"])
        if l1a[p[0]] == l1b[p[1]]
    }
    assert set(zip(bm["id_a"], bm["id_b"])) == full_co_blocked
    assert len(full_co_blocked) == 50  # blocking keeps every truth pair

    assert blocked.em.p_m == pytest.approx(full.em.p_m, rel=0.02)
    assert full.em.varnames == blocked.em.varnames
    for k in range(len(full.em.varnames)):
        np.testing.assert_allclose(
            blocked.em.pgamma_km[k], full.em.pgamma_km[k], atol=5e-3
        )
        np.testing.assert_allclose(
            blocked.em.pgamma_ku[k], full.em.pgamma_ku[k], atol=5e-3
        )
