"""Unit tests for string-distance kernels (FIXTURES.md F3 micro-fixtures)."""

import numpy as np
import pytest

from raylink.functions import strdist as sd


def test_jaro_winkler_known_values():
    # classic published examples
    assert round(sd.jaro_winkler("MARTHA", "MARHTA"), 4) == 0.9611
    assert round(sd.jaro("MARTHA", "MARHTA"), 4) == 0.9444
    assert round(sd.jaro_winkler("DWAYNE", "DUANE"), 4) == 0.84
    assert round(sd.jaro_winkler("DIXON", "DICKSONX"), 4) == 0.8133
    assert sd.jaro_winkler("same", "same") == 1.0
    assert sd.jaro_winkler("", "x") == 0.0


def test_jaro_winkler_matches_duckdb():
    import duckdb

    con = duckdb.connect()
    rng = np.random.default_rng(3)
    alpha = np.array(list("ABCDEFGH"))
    words = ["".join(rng.choice(alpha, size=int(rng.integers(1, 10)))) for _ in range(80)]
    for i in range(300):
        a = words[int(rng.integers(0, len(words)))]
        b = words[int(rng.integers(0, len(words)))]
        expect = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert sd.jaro_winkler(a, b) == pytest.approx(expect, abs=1e-12), (a, b)


def test_levenshtein_family():
    assert sd.levenshtein("kitten", "sitting") == 3
    assert sd.levenshtein("", "abc") == 3
    assert sd.osa("ca", "abc") == 3  # restricted: no substring edit after swap
    assert sd.damerau_levenshtein("ca", "abc") == 2  # unrestricted
    assert sd.osa("abcd", "acbd") == 1
    assert sd.hamming("abc", "abd") == 1
    assert sd.hamming("abc", "ab") == 1


def test_ratcliff_and_jaccard():
    assert sd.ratcliff_obershelp("abc", "abc") == 1.0
    assert sd.char_jaccard("night", "nacht") == pytest.approx(3 / 7)


def test_similarity_normalization():
    # lv similarity normalizes by max length
    assert sd.similarity("lv", "kitten", "sitting") == pytest.approx(1 - 3 / 7)
    assert sd.similarity("hamming", "abc", "abd") == pytest.approx(1 - 1 / 3)


def test_similarity_pairs_unique_economy_and_nulls():
    a = np.array(["AB", "AB", None, "CD"], dtype=object)
    b = np.array(["AB", "AB", "XY", None], dtype=object)
    cache: dict = {}
    out = sd.similarity_pairs(a, b, method="jw", cache=cache)
    assert out[0] == 1.0 and out[1] == 1.0
    assert np.isnan(out[2]) and np.isnan(out[3])
    assert len(cache) == 1  # one unique non-null pair scored once


def test_token_levenshtein_matrix():
    seqs_a = [np.array([1, 2, 3]), np.array([1, 2]), np.array([], dtype=np.int64)]
    seqs_b = [np.array([1, 2, 4]), np.array([1, 2]), np.array([], dtype=np.int64)]
    sims = sd.token_levenshtein_matrix(seqs_a, seqs_b)
    assert sims[0] == pytest.approx(2 / 3)
    assert sims[1] == 1.0
    assert sims[2] == 1.0  # both empty -> identical


def test_method_aliases_cover_reference_table():
    # every alias the reference accepts resolves (FastLink.jl:11-30)
    for alias in ("jarowinkler", "jaro-winkler", "dameraulevenshtein", "lv",
                  "optimal string alignment", "ratcliff obershelp", "hamming"):
        assert alias in sd.METHOD_ALIASES


def test_similarity_pairs_lv_batch_matches_scalar():
    # the lv method runs through the lockstep char-DP; must agree with the
    # scalar two-row DP exactly, including empty/null handling
    import random
    import string

    rng = random.Random(11)
    a = np.array(
        ["".join(rng.choices(string.ascii_lowercase, k=rng.randint(0, 15)))
         for _ in range(200)] + ["", None],
        dtype=object,
    )
    b = np.array(
        ["".join(rng.choices(string.ascii_lowercase, k=rng.randint(0, 15)))
         for _ in range(200)] + ["", "x"],
        dtype=object,
    )
    cache: dict = {}
    out = sd.similarity_pairs(a, b, method="lv", cache=cache)
    for i in range(201):
        assert out[i] == pytest.approx(sd.similarity("lv", a[i], b[i]))
    assert np.isnan(out[201])  # null side
    # cache round-trip: second call served from cache, same values
    out2 = sd.similarity_pairs(a, b, method="lv", cache=cache)
    assert np.allclose(out[:201], out2[:201])


def test_fuzzy_truncate_16_codeunits():
    """The gammaCKfuzzy.jl 16-codeunit truncation flag: long strings that
    differ only beyond position 16 score as exact matches when the flag is
    on, and keep their true (lower) similarity when off (the default)."""
    import numpy as np
    import pyarrow as pa

    from raylink.config import VarConfig
    from raylink.stages.scoring import PairScorer

    a_val = "ABCDEFGHIJKLMNOP" + "XXXXXXXX"   # identical first 16
    b_val = "ABCDEFGHIJKLMNOP" + "YYYYYYYY"   # divergent tail
    batch = pa.table(
        {
            "id_a": pa.array([1], type=pa.int64()),
            "id_b": pa.array([2], type=pa.int64()),
            "s_a": pa.array([a_val]),
            "s_b": pa.array([b_val]),
        }
    )
    v_off = VarConfig(name="s", method="jarowinkler")
    v_on = VarConfig(name="s", method="jarowinkler", fuzzy_truncate=True)
    g_off = PairScorer(variables=[v_off])(batch)
    g_on = PairScorer(variables=[v_on])(batch)
    # truncated: first-16 equality -> exact agreement (gamma 2)
    assert g_on.column("gamma_s").to_pylist() == [2]
    # untruncated: the divergent tails keep JW below cut_a
    assert g_off.column("gamma_s").to_pylist()[0] < 2
    # short strings are unaffected by the flag
    short = pa.table(
        {
            "id_a": pa.array([1], type=pa.int64()),
            "id_b": pa.array([2], type=pa.int64()),
            "s_a": pa.array(["MARTHA"]),
            "s_b": pa.array(["MARHTA"]),
        }
    )
    assert (
        PairScorer(variables=[v_on])(short).column("gamma_s").to_pylist()
        == PairScorer(variables=[v_off])(short).column("gamma_s").to_pylist()
    )


def test_monge_elkan_scalar_contracts():
    from raylink.functions.strdist import jaro_winkler, monge_elkan

    # single tokens reduce to plain JW
    assert monge_elkan("maria", "mario") == pytest.approx(
        jaro_winkler("maria", "mario")
    )
    # order invariance on exact token sets
    assert monge_elkan("garcia lopez maria", "maria garcia lopez") == 1.0
    # symmetric by construction
    a, b = "jon smyth", "john smith jr"
    assert monge_elkan(a, b) == pytest.approx(monge_elkan(b, a))
    # empties
    assert monge_elkan("", "") == 1.0
    assert monge_elkan("a", "") == 0.0
    assert monge_elkan("", " ") == 1.0  # whitespace-only has no tokens


def test_monge_elkan_batch_matches_scalar():
    import numpy as np

    from raylink.functions.strdist import monge_elkan, monge_elkan_batch

    rng = np.random.default_rng(19)
    words = ["maria", "mario", "garcia", "lopez", "smith", "smyth",
             "john", "jon", "ann", "anne", "x"]
    pairs = []
    for _ in range(300):
        ta = rng.choice(words, rng.integers(0, 5)).tolist()
        tb = rng.choice(words, rng.integers(0, 5)).tolist()
        pairs.append((" ".join(ta), " ".join(tb)))
    pairs += [("", ""), ("", "abc"), ("abc def", "")]
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = monge_elkan_batch(a, b)
    exp = np.asarray([monge_elkan(x, y) for x, y in pairs])
    assert np.allclose(got, exp, atol=1e-12)


def test_monge_elkan_through_similarity_pairs():
    import numpy as np

    from raylink.functions.strdist import monge_elkan, similarity_pairs

    a = np.asarray(["maria garcia", "jon smyth", None, "ann lee"],
                   dtype=object)
    b = np.asarray(["garcia maria", "john smith", "x", None],
                   dtype=object)
    out = similarity_pairs(a, b, method="me")
    assert out[0] == pytest.approx(monge_elkan("maria garcia",
                                               "garcia maria"))
    assert out[1] == pytest.approx(monge_elkan("jon smyth",
                                               "john smith"))
    assert np.isnan(out[2]) and np.isnan(out[3])
