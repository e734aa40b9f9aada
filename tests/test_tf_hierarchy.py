"""Term-frequency adjustment and hierarchical (nested) comparison tests."""

import numpy as np
import pandas as pd
import ray

from raylink.config import parse_config
from raylink.pipelines.linkage import link_records
from raylink.sources.synth import make_person_tables
from raylink.stages.tf import add_tf_columns


def test_add_tf_columns_formula():
    from raylink.config import VarConfig

    df = pd.DataFrame({"city": ["a", "a", "a", "b", None]})
    v = VarConfig(name="city", method="exact", tf_adjust=True)
    out = add_tf_columns(ray.data.from_pandas(df), [v], 5).to_pandas()
    got = dict(zip(out["city"], out["tf_city"]))
    assert got["a"] == np.float32(3 / 5)
    assert got["b"] == np.float32(1 / 5)
    # clamped at tf_minimum_u_value
    df2 = pd.DataFrame({"city": ["x"] + [f"y{i}" for i in range(4999)]})
    out2 = add_tf_columns(ray.data.from_pandas(df2), [v], 5000).to_pandas()
    assert out2["tf_city"].min() >= np.float32(0.001)


def _person_config(extra_var=None, nested=False):
    variables = [
        {"varname": "firstname", "method": "jarowinkler"},
        {"varname": "lastname", "method": "jarowinkler"},
        {"varname": "birthyear", "method": "exact"},
    ]
    address = [
        {"varname": "housenum", "method": "numeric", "cut_a": 1, "cut_b": 2},
        {"varname": "streetname", "method": "jarowinkler"},
        {"varname": "city", "method": "exact", "tf_adjust": True},
    ]
    if nested:
        variables.append(
            {"comparisons": {"name": "address", "threshold_match": 0.92,
                             "variables": address}}
        )
    else:
        variables.extend(address)
    return parse_config(
        {
            "link_type": "link_only",
            "idvar": ["id", "id"],
            "comparisons": {
                "name": "total",
                "threshold_match": 0.85,
                "variables": variables,
            },
            "blocking": {"keys": ["_one"], "cap": 1000},
        }
    )


def _tables():
    df_a, df_b, truth = make_person_tables(n_a=300, n_b=200, n_matches=40, seed=7)
    return df_a.assign(_one=1), df_b.assign(_one=1), truth


def test_tf_adjustment_end_to_end():
    df_a, df_b, truth = _tables()
    res = link_records(
        ray.data.from_pandas(df_a), ray.data.from_pandas(df_b), _person_config()
    )
    assert res.tf_matches is not None
    tf = res.tf_matches.to_pandas()
    assert {"final_weight", "final_zeta", "tf_ismatch"} <= set(tf.columns)
    assert ((tf["final_zeta"] >= 0) & (tf["final_zeta"] <= 1)).all()
    # within one pattern, agreeing on a rarer city must score a strictly
    # higher adjusted weight (log(u/denom) grows as denom=freq shrinks)
    grp = tf.groupby("pattern_key")
    checked = False
    for _, g in tf.groupby("pattern_key"):
        f = np.maximum(g["tf_city_a"].to_numpy(), g["tf_city_b"].to_numpy())
        if len(np.unique(f)) > 1:
            lo, hi = np.argmin(f), np.argmax(f)
            assert g["final_weight"].iloc[lo] >= g["final_weight"].iloc[hi]
            checked = True
            break
    assert checked, "fixture produced no tf variance within any pattern"


def test_hierarchical_comparison():
    df_a, df_b, truth = _tables()
    res = link_records(
        ray.data.from_pandas(df_a), ray.data.from_pandas(df_b),
        _person_config(nested=True),
    )
    # the child EM ran and collapsed into a virtual variable of the root
    assert "address" in res.child_ems
    assert res.child_ems["address"].converged
    assert res.em.varnames == ["firstname", "lastname", "birthyear", "address"]
    # planted matches still recovered through the hierarchy
    m = res.matches.to_pandas()
    pred = set(zip(m["id_a"].tolist(), m["id_b"].tolist()))
    truth_set = set(zip(truth["id_a"].tolist(), truth["id_b"].tolist()))
    hit = len(pred & truth_set)
    assert hit / len(truth_set) >= 0.9
    # flat and nested runs agree on the obviously-exact matches
    res_flat = link_records(
        ray.data.from_pandas(df_a), ray.data.from_pandas(df_b), _person_config()
    )
    mf = res_flat.matches.to_pandas()
    pred_flat = set(zip(mf["id_a"].tolist(), mf["id_b"].tolist()))
    assert len(pred & pred_flat) >= 0.8 * len(truth_set)
