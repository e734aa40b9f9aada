"""Connected-components (both paths) and band-join operator tests."""

import numpy as np
import pandas as pd
import ray


def _edges_nodes():
    # components: {1,2,3,4} (chain), {10,11}, {20} isolated
    edges = pd.DataFrame({"id_a": [1, 2, 3, 10], "id_b": [2, 3, 4, 11]})
    nodes = pd.DataFrame({"node": [1, 2, 3, 4, 10, 11, 20]})
    expect = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}
    return edges, nodes, expect


def test_cc_local_and_distributed_agree():
    from raylink.stages.cluster import (
        connected_components_distributed,
        connected_components_local,
    )

    edges, nodes, expect = _edges_nodes()
    e = ray.data.from_pandas(edges)
    n = ray.data.from_pandas(nodes)
    loc = connected_components_local(e, n).to_pandas()
    dist = connected_components_distributed(e, n, num_partitions=4).to_pandas()
    assert dict(zip(loc["node"], loc["entity"])) == expect
    assert dict(zip(dist["node"], dist["entity"])) == expect


def test_cc_pregel_matches_other_paths():
    """The Pregel actor-grid CC is bit-equal to the local and
    sorted-scan paths — on the fixture, on a random graph with string
    ids, at different shard counts, and on the no-edges degenerate."""
    from raylink.stages.cluster import (
        connected_components_local,
        connected_components_pregel,
    )

    edges, nodes, expect = _edges_nodes()
    out = connected_components_pregel(
        ray.data.from_pandas(edges), ray.data.from_pandas(nodes),
        num_shards=3,
    ).to_pandas()
    assert dict(zip(out["node"], out["entity"])) == expect

    rng = np.random.default_rng(12)
    ids = np.array([f"c{i:05d}" for i in range(2000)])
    e = rng.integers(0, 2000, size=(3000, 2))
    edf = pd.DataFrame({"id_a": ids[e[:, 0]], "id_b": ids[e[:, 1]]})
    ndf = pd.DataFrame({"node": ids})
    ref = (
        connected_components_local(
            ray.data.from_pandas(edf), ray.data.from_pandas(ndf)
        )
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    for shards in (2, 7):
        got = (
            connected_components_pregel(
                ray.data.from_pandas(edf).repartition(5),
                ray.data.from_pandas(ndf),
                num_shards=shards,
            )
            .to_pandas()
            .sort_values("node", ignore_index=True)
        )
        assert got["node"].tolist() == ref["node"].tolist()
        assert got["entity"].tolist() == ref["entity"].tolist()

    # no edges: every node isolated
    iso = connected_components_pregel(
        ray.data.from_pandas(edf.iloc[:0]),
        ray.data.from_pandas(ndf),
        num_shards=2,
    ).to_pandas()
    assert (iso["entity"] == iso["node"]).all()


def test_cc_unconverged_rounds_refused():
    """Both distributed CC paths must FAIL loudly (not return a
    half-propagated labeling) when a component's diameter exceeds
    max_rounds — a 10-node chain cannot converge in 2 rounds."""
    import pytest

    from raylink.stages.cluster import (
        connected_components_distributed,
        connected_components_pregel,
    )

    edf = pd.DataFrame({"id_a": np.arange(9), "id_b": np.arange(1, 10)})
    ndf = pd.DataFrame({"node": np.arange(10)})
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_pregel(
            ray.data.from_pandas(edf), ray.data.from_pandas(ndf),
            num_shards=2, max_rounds=2,
        ).to_pandas()
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_distributed(
            ray.data.from_pandas(edf), ray.data.from_pandas(ndf),
            num_partitions=2, max_rounds=2,
        ).to_pandas()
    # with enough rounds the same chain converges to its min id
    out = connected_components_pregel(
        ray.data.from_pandas(edf), ray.data.from_pandas(ndf),
        num_shards=2,
    ).to_pandas()
    assert (out["entity"] == 0).all()


def test_cc_string_ids():
    from raylink.stages.cluster import connected_components_local

    edges = pd.DataFrame({"id_a": ["a", "b"], "id_b": ["b", "c"]})
    nodes = pd.DataFrame({"node": ["a", "b", "c", "z"]})
    out = connected_components_local(
        ray.data.from_pandas(edges), ray.data.from_pandas(nodes)
    ).to_pandas()
    m = dict(zip(out["node"], out["entity"]))
    assert m == {"a": "a", "b": "a", "c": "a", "z": "z"}


def test_band_join_matches_bruteforce():
    from raylink.ops.bandjoin import band_join_self

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "eid": np.arange(500, dtype=np.int64),
            "grp": rng.integers(0, 4, 500).astype(np.int64),
            "v": np.round(rng.uniform(0, 30, 500), 3),
        }
    )
    out = band_join_self(
        ray.data.from_pandas(df), "v", "eid", cut=0.7, group_cols=["grp"]
    ).to_pandas()
    got = set(zip(out["id_a"], out["id_b"]))
    expect = set()
    for _, g in df.groupby("grp"):
        vals = g[["eid", "v"]].to_numpy()
        for i in range(len(vals)):
            for j in range(i + 1, len(vals)):
                if abs(vals[i][1] - vals[j][1]) <= 0.7:
                    a, b = sorted((int(vals[i][0]), int(vals[j][0])))
                    expect.add((a, b))
    assert got == expect
    assert len(got) == len(out)  # no duplicate pairs


def test_band_join_bucket_boundary_values():
    from raylink.ops.bandjoin import band_join_self

    # values straddling bucket boundaries at multiples of cut
    df = pd.DataFrame(
        {
            "eid": np.arange(6, dtype=np.int64),
            "v": [0.0, 0.5, 0.99, 1.0, 1.49, 2.6],
        }
    )
    out = band_join_self(ray.data.from_pandas(df), "v", "eid", cut=0.5).to_pandas()
    got = set(zip(out["id_a"], out["id_b"]))
    expect = set()
    vals = df[["eid", "v"]].to_numpy()
    for i in range(6):
        for j in range(i + 1, 6):
            if abs(vals[i][1] - vals[j][1]) <= 0.5:
                expect.add((int(vals[i][0]), int(vals[j][0])))
    assert got == expect
