"""Tests for the sorted-run execution primitives (sortedrun.py)."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from raylink.stages.sortedrun import count_by_key, sorted_group_scan


@pytest.fixture(scope="module")
def keyed_df():
    rng = np.random.default_rng(11)
    # skewed key distribution incl. singletons and one hot key
    keys = np.concatenate(
        [
            rng.integers(0, 5000, 20_000),
            np.full(3_000, 42),
            np.arange(100_000, 101_000),  # singletons
        ]
    ).astype(np.int64)
    rng.shuffle(keys)
    return pd.DataFrame({"block_key": keys, "payload": rng.integers(0, 10, len(keys))})


def _expected_counts(df):
    return (
        df.groupby("block_key").size().rename("count()").reset_index()
        .sort_values("block_key", ignore_index=True)
    )


def test_count_by_key_driver_path(ray_session, keyed_df):
    ds = ray.data.from_pandas(keyed_df).repartition(8)
    got = (
        count_by_key(ds, "block_key")
        .to_pandas()
        .sort_values("block_key", ignore_index=True)
    )
    exp = _expected_counts(keyed_df)
    pd.testing.assert_frame_equal(got.astype({"count()": np.int64}), exp.astype({"count()": np.int64}))


def test_count_by_key_distributed_path(ray_session, keyed_df):
    ds = ray.data.from_pandas(keyed_df).repartition(8)
    # driver_threshold=0 forces the sorted-run merge used at scale
    got = (
        count_by_key(ds, "block_key", num_partitions=8, driver_threshold=0)
        .to_pandas()
        .sort_values("block_key", ignore_index=True)
    )
    exp = _expected_counts(keyed_df)
    pd.testing.assert_frame_equal(got.astype({"count()": np.int64}), exp.astype({"count()": np.int64}))


def test_sorted_group_scan_matches_groupby(ray_session, keyed_df):
    ds = ray.data.from_pandas(keyed_df).repartition(8)

    def group_fn(group):
        k = np.asarray(group["block_key"])
        p = np.asarray(group["payload"])
        return {"block_key": k[:1], "payload_sum": np.array([p.sum()], dtype=np.int64)}

    def empty_fn(batch):
        k = np.asarray(batch["block_key"])
        return {"block_key": k[:0], "payload_sum": np.zeros(0, dtype=np.int64)}

    got = (
        sorted_group_scan(ds, "block_key", group_fn, empty_fn, num_partitions=8)
        .to_pandas()
        .sort_values("block_key", ignore_index=True)
    )
    exp = (
        keyed_df.groupby("block_key", as_index=False)["payload"].sum()
        .rename(columns={"payload": "payload_sum"})
        .sort_values("block_key", ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"payload_sum": np.int64}), exp.astype({"payload_sum": np.int64})
    )


def test_sum_by_key_both_paths():
    import ray

    from raylink.stages.sortedrun import sum_by_key

    rng = np.random.default_rng(5)
    k = rng.integers(0, 40, 5000).astype(np.int64)
    v = rng.integers(-100, 100, 5000).astype(np.int64)
    df = pd.DataFrame({"k": k, "v": v})
    exp = df.groupby("k")["v"].sum().sort_index()
    for thr in (20_000_000, 0):  # driver merge path, then at-scale path
        got = (
            sum_by_key(
                ray.data.from_pandas(df).repartition(7),
                "k",
                "v",
                num_partitions=3,
                driver_threshold=thr,
            )
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        assert got["k"].tolist() == exp.index.tolist()
        assert got["sum"].tolist() == exp.tolist()

    with pytest.raises(Exception, match="integer-typed"):
        sum_by_key(
            ray.data.from_pandas(pd.DataFrame({"k": [1], "v": [1.5]})),
            "k",
            "v",
        ).materialize()
