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


def test_nested_tf_per_pair_collapse_faithful():
    """Nested tf_adjust triggers the reference's per-PAIR child collapse
    (patterns.jl:165-186 + term_frequency_adjustment.jl:77-103): two
    pairs with the SAME child pattern diverge by their lastname term
    frequency, and the root EM/matches are built from the per-pair
    virtual gammas.  The expected match set is recomputed by hand from
    the pipeline's own EM outputs using the reference formulas."""
    import numpy as np
    import pandas as pd
    import ray

    from raylink.config import parse_config
    from raylink.constants import MATCH1, MATCH2
    from raylink.pipelines.linkage import run_linkage
    from raylink.stages.patterns import pack_gammas, unpack_patterns

    rng = np.random.default_rng(5)

    def rand_name():
        return "".join(rng.choice(list("ABCDEFGHIJ"), 7))

    rows = []
    # 50 distinct-firstname records sharing the COMMON lastname: their
    # pairs agree ONLY on lastname (the tf-sensitive child pattern)
    for i in range(50):
        rows.append((f"c{i:03d}", rand_name(), "COMMON", 1980))
    # 20 twin pairs: distinct firstnames, shared RARE lastname each —
    # same child pattern, but the rare-surname tf boost flips them
    for t in range(20):
        for j in range(2):
            rows.append((f"r{t:03d}_{j}", rand_name(), f"RARE{t:02d}", 1980))
    # 15 true-duplicate twins give EM a match class
    for t in range(15):
        for j in range(2):
            rows.append((f"m{t:03d}_{j}", f"TWIN{t:02d}", f"DUP{t:02d}", 1980))
    for i in range(60):
        rows.append(
            (f"b{i:03d}", rand_name(),
             "".join(rng.choice(list("KLMNOPQR"), 8)),
             int(1900 + rng.integers(0, 99)))
        )
    df = pd.DataFrame(rows, columns=["id", "firstname", "lastname", "birthyear"])
    df["city"] = "X"

    config = parse_config(
        {
            "link_type": "dedupe_only",
            "idvar": ["id", "id"],
            "comparisons": {
                "name": "total",
                "threshold_match": 0.85,
                "variables": [
                    {
                        "comparisons": {
                            "name": "name",
                            "threshold_match": 0.85,
                            "variables": [
                                {"varname": "firstname", "method": "jarowinkler"},
                                {"varname": "lastname", "method": "exact",
                                 "tf_adjust": True,
                                 "tf_adjustment_weight": 20.0},
                            ],
                        }
                    },
                    {"varname": "birthyear", "method": "numeric",
                     "cut_a": 1, "cut_b": 3},
                ],
            },
            "blocking": {"keys": ["city"], "cap": 100000},
        }
    )
    res = run_linkage(config, ray.data.from_pandas(df), cluster=False)
    assert res.counters.get("nested_tf_mode") == "per_pair"

    # --- hand recompute of the per-pair child decision -----------------
    sp = res.scored_pairs.to_pandas()
    child = res.child_ems["name"]
    pw = child.patterns_w
    keys = pw["pattern_key"].to_numpy(np.int64)
    o = np.argsort(keys)
    keys_s = keys[o]
    w_s = pw["weights"].to_numpy(np.float64)[o]
    cnts = pw["counts"].to_numpy(np.float64)[o]
    prior = np.log(child.p_m / child.p_u)
    n_comp = res.em.number_of_comparisons
    gam_tbl = unpack_patterns(keys_s, 2)
    uv = {v: float(cnts[gam_tbl[:, 1] == v].sum()) / n_comp for v in (1, 2)}
    nk = pack_gammas(
        [sp["gamma_firstname"].to_numpy(), sp["gamma_lastname"].to_numpy()]
    )
    w = prior + w_s[np.searchsorted(keys_s, nk)]
    g_ln = sp["gamma_lastname"].to_numpy()
    agree = (g_ln == MATCH1) | (g_ln == MATCH2)
    denom = (
        sp["tf_lastname_a"].to_numpy(np.float64)
        + sp["tf_lastname_b"].to_numpy(np.float64)
    ) / 2
    uvv = np.where(g_ln == MATCH2, uv[2], uv[1])
    with np.errstate(divide="ignore", invalid="ignore"):
        adj = np.where(agree, np.log(uvv / denom) * 20.0, 0.0)
    zeta = 1 / (1 + np.exp(-(w + adj)))
    vg = np.where(zeta >= 0.85, 2, 0).astype(np.uint8)

    # the planted divergence: among lastname-only-agree pairs, EXACTLY the
    # 20 rare-lastname twins flip to match while the 1200+ common-lastname
    # pairs with the SAME child pattern stay nonmatch
    ln_only = (sp["gamma_firstname"].to_numpy() == 0) & (g_ln == 2)
    assert int((vg[ln_only] == 2).sum()) == 20
    assert int((vg[ln_only] == 0).sum()) > 1000

    # expected matches from per-pair root keys + the pipeline's root EM
    rk = pack_gammas([vg, sp["gamma_birthyear"].to_numpy()])
    rpw = res.leaf_patterns  # root-keyed in nested mode
    ro = np.argsort(rpw["pattern_key"].to_numpy(np.int64))
    rk_s = rpw["pattern_key"].to_numpy(np.int64)[ro]
    zeta_root = rpw["zeta_j"].to_numpy(np.float64)[ro]
    wraw_root = rpw["weights_raw"].to_numpy(np.float64)[ro]
    rpos = np.searchsorted(rk_s, rk)
    ok = (zeta_root[rpos] >= 0.85) & (wraw_root[rpos] <= 1e10)
    expect = set(map(tuple, sp.loc[ok, ["id_a", "id_b"]].to_numpy()))
    m = res.matches.to_pandas()
    got = set(map(tuple, m[["id_a", "id_b"]].to_numpy()))
    assert expect == got
    # rare-lastname twins are matched; matches carry the ROOT pattern key
    for t in range(20):
        assert (f"r{t:03d}_0", f"r{t:03d}_1") in got
    mk = dict(zip(zip(sp["id_a"], sp["id_b"]), rk))
    assert all(mk[(r.id_a, r.id_b)] == r.pattern_key for r in m.itertuples())
