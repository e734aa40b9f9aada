"""End-to-end linkage tests, mirroring the reference's golden-test style
(/root/reference/test/runtests.jl:62-81) on deterministic synthetic fixtures.
"""

import numpy as np
import pandas as pd
import pytest
import pyarrow as pa
import ray

from raylink.config import parse_config
from raylink.eval import pairwise_scores, truth_pairs_from_entities
from raylink.pipelines.linkage import dedupe_records, link_records
from raylink.sources.synth import make_person_tables, make_transcripts
from raylink.stages.assemble import assemble_conversations
from raylink.stages.blocking import transcript_block_keys


def test_person_link_golden():
    """Full cross product (single block) person link — reference semantics."""
    df_a, df_b, truth = make_person_tables(n_a=500, n_b=350, n_matches=50, seed=42)
    config = parse_config(
        {
            "link_type": "link_only",
            "idvar": ["id", "id"],
            "comparisons": {
                "name": "total",
                "threshold_match": 0.85,
                "variables": [
                    {"varname": "firstname", "method": "jarowinkler", "partial": True},
                    {"varname": "lastname", "method": "jarowinkler", "partial": True},
                    {"varname": "streetname", "method": "jarowinkler", "partial": True},
                    {"varname": "housenum", "method": "numeric", "cut_a": 1, "cut_b": 2},
                    {"varname": "birthyear", "method": "exact"},
                    {"varname": "city", "method": "exact"},
                ],
            },
            "blocking": {"keys": ["_one"], "cap": 1000},
        }
    )
    df_a = df_a.assign(_one=1)
    df_b = df_b.assign(_one=1)
    res = link_records(
        ray.data.from_pandas(df_a), ray.data.from_pandas(df_b), config
    )
    # conservation: single block, no residual -> every comparison scored
    assert res.em.number_of_comparisons == 500 * 350
    assert int(res.em.patterns_w["counts"].sum()) == 500 * 350
    # reference-style probability assertions (runtests.jl:77-79)
    assert res.em.p_u >= 0.999
    assert res.em.p_m <= 0.001  # data-specific bound; reference asserts 5e-4 on its fixture
    assert res.em.converged

    pred = set(
        zip(
            res.matches.to_pandas()["id_a"].tolist(),
            res.matches.to_pandas()["id_b"].tolist(),
        )
    )
    truth_set = set(zip(truth["id_a"].tolist(), truth["id_b"].tolist()))
    s = pairwise_scores(pred, truth_set)
    assert s.f1 >= 0.95, (s, sorted(pred - truth_set)[:5], sorted(truth_set - pred)[:5])


def test_transcript_dedupe_e2e():
    """Flagship: transcripts -> assembly -> dedupe -> clusters, F1 vs truth."""
    turns, truth = make_transcripts(n_entities=250, seed=42, hot_block_convs=150)
    ds = ray.data.from_pandas(turns)
    recs = assemble_conversations(ds)
    recs = transcript_block_keys(recs).materialize()

    config = parse_config(
        {
            "link_type": "dedupe_only",
            "idvar": ["conv_id", "conv_id"],
            "comparisons": {
                "name": "total",
                "threshold_match": 0.85,
                "variables": [
                    {"varname": "first_text_norm", "method": "jarowinkler"},
                    {"varname": "tool_sig", "method": "exact"},
                    {"varname": "tok_blob", "method": "token_lv",
                     "cut_a": 0.7, "cut_b": 0.4},
                ],
            },
            # tiny cap so the hot boilerplate block gets salted
            "blocking": {"cap": 40},
        }
    )
    res = dedupe_records(
        recs, config, id_col="conv_id", precomputed_block_key=True
    )
    assert res.counters["hot_blocks"] >= 1  # the boilerplate block salted

    # evaluation at the same blocking key
    rec_df = recs.to_pandas()
    block_of = dict(zip(rec_df["conv_id"], rec_df["block_key"]))
    truth_set = truth_pairs_from_entities(truth, block_of=block_of)
    m = res.matches.to_pandas()
    pred = set(zip(m["id_a"].tolist(), m["id_b"].tolist()))
    s = pairwise_scores(pred, truth_set)
    assert s.f1 >= 0.99, s

    # clusters agree with matches transitively: every matched pair shares an
    # entity, and cluster count == records - effective merges
    cl = res.clusters.to_pandas()
    ent = dict(zip(cl["node"], cl["entity"]))
    for a, b in pred:
        assert ent[a] == ent[b]


def test_rethreshold_without_rerun():
    """getMatches-style re-thresholding is a filter on stored zeta."""
    turns, truth = make_transcripts(n_entities=60, seed=5)
    recs = transcript_block_keys(
        assemble_conversations(ray.data.from_pandas(turns))
    ).materialize()
    config = parse_config(
        {
            "idvar": ["conv_id", "conv_id"],
            "comparisons": {
                "name": "total",
                "variables": [
                    {"varname": "first_text_norm", "method": "jarowinkler"},
                    {"varname": "tool_sig", "method": "exact"},
                ],
            },
            "blocking": {"cap": 100},
        }
    )
    res = dedupe_records(recs, config, id_col="conv_id", precomputed_block_key=True, cluster=False)
    from raylink.stages.matches import get_matches
    from raylink.pipelines.linkage import _leaf_em_for_matches

    shim = _leaf_em_for_matches(res.em, res.leaf_patterns)
    strict = get_matches(res.scored_pairs, shim, threshold=0.999).to_pandas()
    loose = get_matches(res.scored_pairs, shim, threshold=0.5).to_pandas()
    assert len(strict) <= res.matches.count() <= len(loose)


def test_link_and_dedupe_mode():
    """link_and_dedupe = self-link over the tagged union (README.md:26 mode
    the reference declares but never implements)."""
    import ray.data

    from raylink.config import parse_config
    from raylink.pipelines.linkage import run_linkage
    from raylink.sources.synth import make_person_tables

    df_a, df_b, truth = make_person_tables(300, 250, n_matches=40, seed=9)
    cfg = parse_config(
        {
            "link_type": "link_and_dedupe",
            "idvar": ["id", "id"],
            "comparisons": {
                "name": "total",
                "threshold_match": 0.85,
                "variables": [
                    {"varname": "firstname", "method": "jarowinkler"},
                    {"varname": "lastname", "method": "jarowinkler"},
                    {"varname": "birthyear", "method": "numeric", "cut_a": 1, "cut_b": 2},
                ],
            },
            "blocking": {"keys": ["city"], "cap": 5000},
        }
    )
    res = run_linkage(cfg, ray.data.from_pandas(df_a), ray.data.from_pandas(df_b))
    m = res.matches.to_pandas()
    assert set(m["pair_type"].unique()) <= {"within_a", "within_b", "between"}
    pred_between = set()
    for _, r in m[m["pair_type"] == "between"].iterrows():
        a = int(r["id_a"].split(":")[1])
        b = int(r["id_b"].split(":")[1])
        pred_between.add((min(a, b), max(a, b)))
    ts = {(min(a, b), max(a, b)) for a, b in zip(truth["id_a"], truth["id_b"])}
    hit = len(ts & pred_between)
    assert hit / len(ts) >= 0.85, f"recovered {hit}/{len(ts)}"
    # clusters exist over the union id space
    assert res.clusters is not None


def test_dedupe_multirule_or_blocking():
    """block_rules finds duplicates reachable only through the SECOND
    blocking rule and never scores a cross-rule pair twice."""
    rng = np.random.default_rng(7)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))

    def rand_name(k=8):
        return "".join(rng.choice(letters, k))

    n = 360
    rows = []
    for i in range(n):
        rows.append(
            {
                "id": i,
                "firstname": rand_name(),
                "lastname": rand_name(),
                "zip": f"z{rng.integers(0, 30):02d}",
                "city": f"c{rng.integers(0, 20):02d}",
            }
        )
    # 5 duplicate pairs co-blocked on zip only, 5 on city only
    planted = []
    for j in range(10):
        src = rows[j * 3]
        dup = dict(src)
        dup["id"] = n + j
        if j < 5:
            dup["city"] = "c_other"  # same zip, different city -> rule 0
        else:
            dup["zip"] = "z_other"  # different zip, same city -> rule 1
        rows.append(dup)
        planted.append((src["id"], dup["id"]))
    df = pd.DataFrame(rows)

    config = parse_config(
        {
            "link_type": "dedupe_only",
            "idvar": ["id", "id"],
            "comparisons": {
                "name": "total",
                "threshold_match": 0.85,
                "variables": [
                    {"varname": "firstname", "method": "jarowinkler"},
                    {"varname": "lastname", "method": "jarowinkler"},
                ],
            },
            "blocking": {"cap": 2000},
        }
    )
    res = dedupe_records(
        ray.data.from_pandas(df),
        config,
        id_col="id",
        block_rules=[["zip"], ["city"]],
        cluster=False,
    )
    m = res.matches.to_pandas()
    pred = set(zip(m["id_a"], m["id_b"]))
    assert set(planted) <= pred, sorted(set(planted) - pred)
    # single-key blocking on zip alone must MISS the city-only pairs
    res_zip = dedupe_records(
        ray.data.from_pandas(df),
        config,
        id_col="id",
        block_keys=["zip"],
        cluster=False,
    )
    pred_zip = set(
        zip(res_zip.matches.to_pandas()["id_a"],
            res_zip.matches.to_pandas()["id_b"])
    )
    assert set(planted[:5]) <= pred_zip
    assert not (set(planted[5:]) & pred_zip)
    # every scored pair is unique (cross-rule dedup held)
    sp = res.scored_pairs.to_pandas()
    assert not sp.duplicated(["id_a", "id_b"]).any()


def test_link_multirule_or_blocking():
    """link_records(block_rules=...) finds matches reachable only via the
    second rule; single-key blocking provably misses them."""
    rng = np.random.default_rng(11)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))

    def rand_name(k=8):
        return "".join(rng.choice(letters, k))

    def mk(n, start):
        return [
            {
                "id": start + i,
                "firstname": rand_name(),
                "lastname": rand_name(),
                "zip": f"z{rng.integers(0, 25):02d}",
                "city": f"c{rng.integers(0, 15):02d}",
            }
            for i in range(n)
        ]

    rows_a = mk(250, 0)
    rows_b = mk(200, 10_000)
    planted = []
    for j in range(10):
        src = rows_a[j * 5]
        dup = dict(src)
        dup["id"] = 20_000 + j
        if j < 5:
            dup["city"] = "c_zzz"  # reachable via zip (rule 0) only
        else:
            dup["zip"] = "z_zzz"  # reachable via city (rule 1) only
        rows_b.append(dup)
        planted.append((src["id"], dup["id"]))
    df_a, df_b = pd.DataFrame(rows_a), pd.DataFrame(rows_b)

    config = parse_config(
        {
            "link_type": "link_only",
            "idvar": ["id", "id"],
            "comparisons": {
                "name": "total",
                "threshold_match": 0.85,
                "variables": [
                    {"varname": "firstname", "method": "jarowinkler"},
                    {"varname": "lastname", "method": "jarowinkler"},
                ],
            },
            "blocking": {"cap": 2000},
        }
    )
    res = link_records(
        ray.data.from_pandas(df_a),
        ray.data.from_pandas(df_b),
        config,
        block_rules=[["zip"], ["city"]],
    )
    m = res.matches.to_pandas()
    pred = set(zip(m["id_a"], m["id_b"]))
    assert set(planted) <= pred, sorted(set(planted) - pred)
    sp = res.scored_pairs.to_pandas()
    assert not sp.duplicated(["id_a", "id_b"]).any()
    # A-side ids on the left, B-side on the right (no triangle collapse)
    assert (sp["id_a"] < 10_000).all() and (sp["id_b"] >= 10_000).all()

    res_zip = link_records(
        ray.data.from_pandas(df_a),
        ray.data.from_pandas(df_b),
        config,
        block_keys=["zip"],
    )
    pred_zip = set(
        zip(res_zip.matches.to_pandas()["id_a"],
            res_zip.matches.to_pandas()["id_b"])
    )
    assert set(planted[:5]) <= pred_zip
    assert not (set(planted[5:]) & pred_zip)


def test_block_rules_via_config():
    """blocking.rules in the reference-style JSON config routes through
    the multi-rule path; keys+rules together are rejected at parse."""
    import pytest

    from raylink.config import parse_config as pc

    base = {
        "link_type": "dedupe_only",
        "idvar": ["id", "id"],
        "comparisons": {
            "name": "total",
            "threshold_match": 0.85,
            "variables": [{"varname": "firstname", "method": "jarowinkler"}],
        },
    }
    with pytest.raises(ValueError, match="mutually exclusive"):
        pc({**base, "blocking": {"keys": ["zip"], "rules": [["zip"]]}})

    cfg = pc({**base, "blocking": {"rules": [["zip"], ["city"]], "cap": 500}})
    df = pd.DataFrame(
        {
            "id": [1, 2, 3, 4],
            "firstname": ["aa", "aa", "bb", "bb"],
            "zip": ["z1", "z1", "z9", "z8"],
            "city": ["c1", "c2", "c3", "c3"],
        }
    )
    res = dedupe_records(ray.data.from_pandas(df), cfg, id_col="id")
    sp = res.scored_pairs.to_pandas()
    assert set(zip(sp["id_a"], sp["id_b"])) == {(1, 2), (3, 4)}


def test_link_and_dedupe_with_config_rules():
    """link_and_dedupe routes config blocking.rules through the dedupe
    multi-rule path (rule source columns survive the projection)."""
    from raylink.pipelines.linkage import link_and_dedupe_records

    cfg = parse_config(
        {
            "link_type": "link_and_dedupe",
            "idvar": ["id", "id"],
            "comparisons": {
                "name": "total",
                "threshold_match": 0.85,
                "variables": [
                    {"varname": "firstname", "method": "jarowinkler"}
                ],
            },
            "blocking": {"rules": [["zip"], ["city"]], "cap": 500},
        }
    )
    df_a = pd.DataFrame(
        {
            "id": [1, 2],
            "firstname": ["aaaa", "bbbb"],
            "zip": ["z1", "z2"],
            "city": ["c1", "c2"],
        }
    )
    # b1 matches a1 via zip only; b2 matches a2 via city only
    df_b = pd.DataFrame(
        {
            "id": [1, 2],
            "firstname": ["aaaa", "bbbb"],
            "zip": ["z1", "z9"],
            "city": ["c9", "c2"],
        }
    )
    res = link_and_dedupe_records(
        ray.data.from_pandas(df_a), ray.data.from_pandas(df_b), cfg,
        cluster=False,
    )
    sp = res.scored_pairs.to_pandas()
    got = set(zip(sp["id_a"], sp["id_b"]))
    assert got == {("A:1", "B:1"), ("A:2", "B:2")}


def test_apply_em_matches_training_posteriors():
    """apply_em recomputes zeta from model parameters: on the training
    pairs it reproduces get_matches (same match set, zeta within EM
    tolerance), and em= on link_records links a NEW batch without refit."""
    from raylink.stages.matches import apply_em

    df_a, df_b, truth = make_person_tables(
        n_a=400, n_b=300, n_matches=40, seed=9
    )
    config = parse_config(
        {
            "link_type": "link_only",
            "idvar": ["id", "id"],
            "comparisons": {
                "name": "total",
                "threshold_match": 0.85,
                "variables": [
                    {"varname": "firstname", "method": "jarowinkler"},
                    {"varname": "lastname", "method": "jarowinkler"},
                    {"varname": "birthyear", "method": "exact"},
                ],
            },
            "blocking": {"keys": ["_one"], "cap": 1000},
        }
    )
    df_a = df_a.assign(_one=1)
    df_b = df_b.assign(_one=1)
    res = link_records(
        ray.data.from_pandas(df_a), ray.data.from_pandas(df_b), config
    )
    trained = res.matches.to_pandas().set_index(["id_a", "id_b"])
    applied = (
        apply_em(res.scored_pairs, res.em)
        .to_pandas().set_index(["id_a", "id_b"])
    )
    assert set(trained.index) == set(applied.index)
    joined = trained.join(applied, rsuffix="_ap")
    assert (joined["zeta_j"] - joined["zeta_j_ap"]).abs().max() < 1e-4

    # incremental: a NEW B batch linked with the stored fit, no refit
    new_b = df_a.iloc[:8][["firstname", "lastname", "birthyear", "_one"]].copy()
    new_b["id"] = np.arange(90_000, 90_008)
    res2 = link_records(
        ray.data.from_pandas(df_a),
        ray.data.from_pandas(new_b),
        config,
        em=res.em,
    )
    m2 = res2.matches.to_pandas()
    got = set(zip(m2["id_a"], m2["id_b"]))
    expected = {(int(df_a.iloc[i]["id"]), 90_000 + i) for i in range(8)}
    assert expected <= got
    assert res2.em is res.em  # no refit happened


def test_dedupe_snm_blocking_catches_typo_keys():
    """Sorted-neighborhood blocking (blocking.snm_key) finds duplicate
    pairs whose blocking value itself carries the typo — exactly the
    pairs equality blocking on that key must miss — and the pair volume
    stays linear (no salting machinery involved)."""
    rng = np.random.default_rng(11)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))

    def rand_name(k=8):
        return "".join(rng.choice(letters, k))

    n = 300
    rows = [
        {"id": i, "firstname": rand_name(), "lastname": rand_name()}
        for i in range(n)
    ]
    planted = []
    for j in range(8):
        src = rows[j * 7]
        dup = dict(src)
        dup["id"] = n + j
        # typo in the LAST char of the sort key: sorts adjacent to the
        # source, but the exact key value differs
        dup["lastname"] = src["lastname"][:-1] + (
            "z" if src["lastname"][-1] != "z" else "y"
        )
        rows.append(dup)
        planted.append((src["id"], dup["id"]))
    df = pd.DataFrame(rows)

    config = parse_config(
        {
            "link_type": "dedupe_only",
            "idvar": ["id", "id"],
            "comparisons": {
                "name": "total",
                "threshold_match": 0.85,
                "variables": [
                    {"varname": "firstname", "method": "jarowinkler"},
                    {"varname": "lastname", "method": "jarowinkler"},
                ],
            },
            "blocking": {"snm_key": "lastname", "snm_window": 8},
        }
    )
    res = dedupe_records(
        ray.data.from_pandas(df), config, id_col="id", cluster=False
    )
    m = res.matches.to_pandas()
    pred = set(zip(m["id_a"], m["id_b"]))
    assert set(planted) <= pred, sorted(set(planted) - pred)
    # linear candidate volume: at most N * (window - 1) scored pairs
    assert res.counters["scored_pairs"] <= len(df) * 7

    # equality blocking on the same key misses every planted pair
    config_eq = parse_config(
        {
            "link_type": "dedupe_only",
            "idvar": ["id", "id"],
            "comparisons": {
                "name": "total",
                "threshold_match": 0.85,
                "variables": [
                    {"varname": "firstname", "method": "jarowinkler"},
                    {"varname": "lastname", "method": "jarowinkler"},
                ],
            },
            "blocking": {"cap": 2000},
        }
    )
    res_eq = dedupe_records(
        ray.data.from_pandas(df), config_eq, id_col="id",
        block_keys=["lastname"], cluster=False,
    )
    m_eq = res_eq.matches.to_pandas()
    # every lastname is globally unique here, so equality blocking finds
    # ZERO candidates (the matches frame may come back schema-less empty)
    assert len(m_eq) == 0


def test_snm_blocking_config_guards():
    with pytest.raises(ValueError, match="mutually exclusive"):
        parse_config(
            {
                "link_type": "dedupe_only",
                "idvar": ["id", "id"],
                "comparisons": {
                    "name": "total",
                    "variables": [
                        {"varname": "x", "method": "jarowinkler"}
                    ],
                },
                "blocking": {"snm_key": "x", "keys": ["x"]},
            }
        )
    with pytest.raises(ValueError, match="snm_window"):
        parse_config(
            {
                "link_type": "dedupe_only",
                "idvar": ["id", "id"],
                "comparisons": {
                    "name": "total",
                    "variables": [
                        {"varname": "x", "method": "jarowinkler"}
                    ],
                },
                "blocking": {"snm_key": "x", "snm_window": 1},
            }
        )


def test_link_snm_blocking_two_tables():
    """Multi-source SNM (blocking.snm_key on link_records): both tables
    merge into one sorted order, only cross-table window pairs emit;
    duplicates whose sort key carries the typo are still found, and ids
    shared across the two tables cannot collide (side-prefixed rank
    tiebreaker)."""
    rng = np.random.default_rng(13)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))

    def rand_name(k=8):
        return "".join(rng.choice(letters, k))

    a_rows = [
        {"ida": i, "firstname": rand_name(), "lastname": rand_name()}
        for i in range(250)
    ]
    b_rows = []
    planted = []
    for j in range(40):
        src = a_rows[j * 6]
        rec = {
            # idb values overlap ida values on purpose (j < 250): the
            # side-prefixed rank id must keep the order total anyway
            "idb": j,
            "firstname": src["firstname"],
            "lastname": src["lastname"],
        }
        if j < 8:
            rec["lastname"] = src["lastname"][:-1] + (
                "z" if src["lastname"][-1] != "z" else "y"
            )
        b_rows.append(rec)
        planted.append((src["ida"], rec["idb"]))
    for j in range(60):
        b_rows.append(
            {"idb": 2000 + j, "firstname": rand_name(),
             "lastname": rand_name()}
        )
    config = parse_config(
        {
            "link_type": "link_only",
            "idvar": ["ida", "idb"],
            "comparisons": {
                "name": "total",
                "threshold_match": 0.85,
                "variables": [
                    {"varname": "firstname", "method": "jarowinkler"},
                    {"varname": "lastname", "method": "jarowinkler"},
                ],
            },
            "blocking": {"snm_key": "lastname", "snm_window": 6},
        }
    )
    res = link_records(
        ray.data.from_pandas(pd.DataFrame(a_rows)),
        ray.data.from_pandas(pd.DataFrame(b_rows)),
        config,
    )
    m = res.matches.to_pandas()
    pred = set(zip(m["id_a"], m["id_b"]))
    assert set(planted) <= pred, sorted(set(planted) - pred)
    # linear candidate volume over the merged list
    n_union = len(a_rows) + len(b_rows)
    assert res.counters["scored_pairs"] <= n_union * 5


def test_dedupe_all_singleton_blocks_zero_pairs():
    """A corpus whose every block is a singleton must flow end-to-end
    (zero matches, all-singleton clusters) instead of crashing on
    schema-less empty materializations — the guard chain in
    filter_to_multi_blocks and pattern_histogram."""
    df = pd.DataFrame(
        {"id": range(50), "name": [f"u{i:03d}" for i in range(50)]}
    )
    config = parse_config(
        {
            "link_type": "dedupe_only",
            "idvar": ["id", "id"],
            "comparisons": {
                "name": "total",
                "threshold_match": 0.85,
                "variables": [
                    {"varname": "name", "method": "jarowinkler"}
                ],
            },
            "blocking": {"cap": 512},
        }
    )
    res = dedupe_records(
        ray.data.from_pandas(df), config, id_col="id",
        block_keys=["name"], cluster=True,
    )
    assert res.matches.count() == 0
    cl = res.clusters.to_pandas()
    assert len(cl) == 50  # every record its own singleton cluster
