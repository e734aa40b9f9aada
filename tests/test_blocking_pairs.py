"""Blocking, salting and pair-generation correctness.

Key property: salting must preserve the candidate-pair set exactly — every
within-block pair generated once, none dropped, regardless of cap.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from raylink.config import BlockingConfig
from raylink.stages import blocking as bs
from raylink.stages.pairs import generate_pairs_dedupe, generate_pairs_link


def _records(n: int, n_blocks: int, seed: int = 0) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "rid": [f"r{i:05d}" for i in range(n)],
            "grp": rng.integers(0, n_blocks, size=n).astype("int64"),
            "val": rng.integers(0, 50, size=n).astype("int64"),
        }
    )


def _expected_dedupe_pairs(df: pd.DataFrame) -> set[tuple[str, str]]:
    out = set()
    for _, grp in df.groupby("grp"):
        ids = sorted(grp["rid"])
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out.add((ids[i], ids[j]))
    return out


def _run_dedupe(df: pd.DataFrame, cap: int) -> set[tuple[str, str]]:
    ds = ray.data.from_pandas(df)
    ds = bs.derive_block_keys(ds, ["grp"])
    plan, counters = bs.plan_salts(ds, BlockingConfig(cap=cap))
    expanded = bs.expand_pair_groups(ds, plan, "rid", side=None)
    pairs = generate_pairs_dedupe(expanded, ["val"], id_col="rid").to_pandas()
    tuples = list(zip(pairs["id_a"], pairs["id_b"]))
    assert len(tuples) == len(set(tuples)), "duplicate pairs generated"
    return set(tuples)


def test_dedupe_pairs_no_salting():
    df = _records(200, 10)
    assert _run_dedupe(df, cap=10_000) == _expected_dedupe_pairs(df)


def test_dedupe_pairs_with_salting_identical():
    # small cap forces salting of every block; pair set must be unchanged
    df = _records(300, 4)
    expected = _expected_dedupe_pairs(df)
    assert _run_dedupe(df, cap=20) == expected
    assert _run_dedupe(df, cap=7) == expected


def test_salt_plan_counters_and_drop():
    df = _records(500, 2)
    ds = bs.derive_block_keys(ray.data.from_pandas(df), ["grp"])
    cfg = BlockingConfig(cap=50, max_salts=3, drop_oversized=True)
    plan, counters = bs.plan_salts(ds, cfg)
    # every block is oversized beyond 3 salts -> dropped, with counters
    assert counters.n_dropped_blocks == 2
    assert counters.dropped_rows == 500
    assert plan == {}


def test_link_pairs_with_salting():
    rng = np.random.default_rng(1)
    dfa = pd.DataFrame(
        {
            "ida": [f"a{i}" for i in range(120)],
            "grp": rng.integers(0, 3, 120).astype("int64"),
            "val": rng.integers(0, 9, 120).astype("int64"),
        }
    )
    dfb = pd.DataFrame(
        {
            "idb": [f"b{i}" for i in range(80)],
            "grp": rng.integers(0, 3, 80).astype("int64"),
            "val": rng.integers(0, 9, 80).astype("int64"),
        }
    )
    expected = set()
    for g in range(3):
        for ia in dfa.loc[dfa["grp"] == g, "ida"]:
            for ib in dfb.loc[dfb["grp"] == g, "idb"]:
                expected.add((ia, ib))

    def tag(side):
        def fn(b: pa.Table) -> pa.Table:
            return b.append_column("_side", pa.array([side] * len(b)))
        return fn

    da = bs.derive_block_keys(ray.data.from_pandas(dfa), ["grp"])
    db = bs.derive_block_keys(ray.data.from_pandas(dfb), ["grp"])
    plan, _ = bs.plan_salts(
        da.select_columns(["block_key"]).union(db.select_columns(["block_key"])),
        BlockingConfig(cap=30),
    )
    assert plan  # blocks exceed the cap -> salting active
    ea = bs.expand_pair_groups(
        da.map_batches(tag("a"), batch_format="pyarrow"), plan, "ida", side="a"
    ).map_batches(
        lambda b: b.rename_columns(
            [("pid" if c == "ida" else c) for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
    eb = bs.expand_pair_groups(
        db.map_batches(tag("b"), batch_format="pyarrow"), plan, "idb", side="b"
    ).map_batches(
        lambda b: b.rename_columns(
            [("pid" if c == "idb" else c) for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
    pairs = generate_pairs_link(ea.union(eb), ["val"], id_col="pid").to_pandas()
    tuples = list(zip(pairs["id_a"], pairs["id_b"]))
    assert len(tuples) == len(set(tuples))
    assert set(tuples) == expected
