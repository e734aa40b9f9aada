"""Gamma kernel unit tests vs hand-computed values (FIXTURES.md F3)."""

import numpy as np
import pytest

from raylink.constants import MATCH1, MATCH2, MISSING, NONMATCH
from raylink.functions import gamma as g


def test_gamma_exact():
    a = np.array(["x", "y", None, "z"], dtype=object)
    b = np.array(["x", "n", "q", None], dtype=object)
    out = g.gamma_exact(a, b)
    assert out.tolist() == [MATCH2, NONMATCH, MISSING, MISSING]


def test_gamma_exact_numeric():
    out = g.gamma_exact(np.array([1.0, 2.0, np.nan]), np.array([1.0, 3.0, 1.0]))
    assert out.tolist() == [MATCH2, NONMATCH, MISSING]


def test_gamma_string_cut_boundaries():
    # MARTHA/MARHTA jw = 0.9611 -> MATCH2; DWAYNE/DUANE = 0.84 -> NONMATCH
    a = np.array(["MARTHA", "DWAYNE", None], dtype=object)
    b = np.array(["MARHTA", "DUANE", "X"], dtype=object)
    out = g.gamma_string(a, b)
    assert out.tolist() == [MATCH2, NONMATCH, MISSING]


def test_gamma_string_round_then_compare():
    # similarity 0.9195 rounds to 0.92 -> must hit cut_a exactly
    # (reference rounds to 4 digits BEFORE comparing, gammaCKpar.jl:103)
    sims = np.array([0.91996, 0.9199, 0.87996, 0.8794])
    out = g.gamma_from_similarity(sims, cut_a=0.92, cut_b=0.88, partial=True)
    assert out.tolist() == [MATCH2, MATCH1, MATCH1, NONMATCH]


def test_gamma_string_partial_false():
    sims = np.array([0.93, 0.89, 0.5])
    out = g.gamma_from_similarity(sims, partial=False)
    assert out.tolist() == [MATCH2, NONMATCH, NONMATCH]


def test_gamma_numeric_partial():
    # |d| in {0,1,2,3} -> {2,2,1,0} under cut_a=1, cut_b=2
    a = np.array([10.0, 10, 10, 10])
    b = np.array([10.0, 11, 12, 13])
    out = g.gamma_numeric(a, b, cut_a=1, cut_b=2, partial=True)
    assert out.tolist() == [MATCH2, MATCH2, MATCH1, NONMATCH]


def test_gamma_numeric_nonpartial_strict():
    # partial=False uses the reference's strict < (get_diff1)
    a = np.array([10.0, 10.0])
    b = np.array([11.0, 10.5])
    out = g.gamma_numeric(a, b, cut_a=1, cut_b=2, partial=False)
    assert out.tolist() == [NONMATCH, MATCH2]


def test_gamma_numeric_missing():
    out = g.gamma_numeric(np.array([np.nan, 1.0]), np.array([1.0, np.nan]))
    assert out.tolist() == [MISSING, MISSING]


def test_gamma_token_levenshtein():
    a = [np.array([1, 2, 3, 4]), None, np.array([1, 2])]
    b = [np.array([1, 2, 3, 5]), np.array([1]), np.array([1, 2])]
    out = g.gamma_token_levenshtein(a, b, cut_a=0.9, cut_b=0.7)
    assert out.tolist() == [MATCH1, MISSING, MATCH2]  # 0.75 in [0.7, 0.9)
