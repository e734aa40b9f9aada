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

import pandas as pd
import pytest

import ray.data

from raylink.config import parse_config
from raylink.pipelines.linkage import link_records

_REF = "/root/reference/test"


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
    config = parse_config(
        {
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
            "blocking": {"keys": ["_one"], "cap": 1000},
        }
    )
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
