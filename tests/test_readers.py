"""I/O layer tests: format dispatch, null sentinels, partitioned output."""

import glob
import os

import pandas as pd
import pytest

from raylink.sources.readers import (
    read_csv_linkage,
    read_table,
    write_partitioned,
)


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "people.csv"
    p.write_text(
        "firstname,lastname,housenum\n"
        "ANA,SMITH,12\n"
        ",JONES,7\n"       # "" -> null (reference convention)
        "NA,DOE,NA\n"      # "NA" -> null
    )
    return str(p)


def test_read_csv_linkage_null_sentinels(ray_session, csv_path):
    df = read_csv_linkage(csv_path).to_pandas()
    assert df.shape == (3, 3)
    assert df["firstname"].isna().tolist() == [False, True, True]
    # "NA" in a numeric-looking column also nulls out
    assert df["housenum"].isna().tolist() == [False, False, True]


def test_read_table_formats_and_projection(ray_session, tmp_path, csv_path):
    src = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"], "c": [0.5, 1.5, 2.5]})
    pq = str(tmp_path / "t.parquet")
    src.to_parquet(pq)
    out = read_table(pq, columns=["a", "c"]).to_pandas()
    assert list(out.columns) == ["a", "c"] and len(out) == 3

    js = str(tmp_path / "t.json")
    src.to_json(js, orient="records", lines=True)
    out_j = read_table(js, format="json", columns=["b"]).to_pandas()
    assert list(out_j.columns) == ["b"] and sorted(out_j["b"]) == ["x", "y", "z"]

    out_c = read_table(csv_path, format="csv", columns=["lastname"]).to_pandas()
    assert list(out_c.columns) == ["lastname"] and len(out_c) == 3

    with pytest.raises(ValueError, match="unsupported format"):
        read_table(pq, format="avro")


def test_write_partitioned_roundtrip(ray_session, tmp_path):
    import ray.data

    df = pd.DataFrame({"k": ["a", "a", "b"], "v": [1, 2, 3]})
    out_dir = str(tmp_path / "out")
    write_partitioned(ray.data.from_pandas(df), out_dir, partition_cols=["k"])
    # hive-style one directory per key value -> a failed run can skip
    # finished partitions
    parts = sorted(
        os.path.basename(d) for d in glob.glob(os.path.join(out_dir, "k=*"))
    )
    assert parts == ["k=a", "k=b"]
    back = ray.data.read_parquet(out_dir).to_pandas()
    assert int(back["v"].sum()) == 6


def test_partitioned_write_and_pruned_read(tmp_path):
    """User-facing resumable-output path: hive-partitioned parquet write,
    then a partition-PRUNED read back (only the matching directory's files
    are opened)."""
    import numpy as np
    import pyarrow as pa
    import ray

    df = pd.DataFrame(
        {
            "part": ["a"] * 30 + ["b"] * 20,
            "v": np.arange(50, dtype=np.int64),
        }
    )
    out = str(tmp_path / "p")
    ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).write_parquet(out, partition_cols=["part"])
    import os

    dirs = sorted(os.listdir(out))
    assert dirs == ["part=a", "part=b"]  # one directory per partition
    back = ray.data.read_parquet(os.path.join(out, "part=b"))
    got = back.to_pandas()
    assert len(got) == 20
    assert sorted(got["v"]) == list(range(30, 50))


def test_read_text_docs_line_and_file(tmp_path):
    import ray
    from raylink.sources.readers import read_binary_docs, read_text_docs

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("first doc\nsecond doc\n\nfourth doc")
    (d / "b.txt").write_text("only doc in b")

    by_line = (
        read_text_docs(str(d), by="line")
        .to_pandas()
        .sort_values(["path", "line_idx"])
        .reset_index(drop=True)
    )
    assert len(by_line) == 5  # 4 lines in a (incl. empty) + 1 in b
    a_rows = by_line[by_line["path"].str.endswith("a.txt")]
    assert a_rows["text"].tolist() == [
        "first doc", "second doc", "", "fourth doc",
    ]
    assert a_rows["line_idx"].tolist() == [0, 1, 2, 3]
    # doc ids are globally unique (hash of path:line), non-negative int64
    assert by_line["doc_id"].nunique() == len(by_line)
    assert (by_line["doc_id"] >= 0).all()
    # rerun assigns identical ids (resume-safe)
    again = (
        read_text_docs(str(d), by="line")
        .to_pandas()
        .sort_values(["path", "line_idx"])
        .reset_index(drop=True)
    )
    assert (again == by_line).all().all()

    by_file = read_text_docs(str(d), by="file").to_pandas()
    assert len(by_file) == 2
    assert set(by_file["text"]) == {
        "first doc\nsecond doc\n\nfourth doc", "only doc in b",
    }

    blobs = read_binary_docs(str(d)).to_pandas()
    assert len(blobs) == 2 and set(blobs.columns) == {"path", "payload"}
    assert b"only doc in b" in set(blobs["payload"])


def test_write_partitioned_layout_resume_and_guards(tmp_path):
    import json
    import os

    import numpy as np
    import pandas as pd
    import ray

    from raylink.sources.sinks import write_partitioned

    df = pd.DataFrame(
        {
            "doc_id": np.arange(30, dtype=np.int64),
            "lang": ["en", "fr", "de"] * 10,
            "text": [f"t{i}" for i in range(30)],
        }
    )
    out = str(tmp_path / "out")
    res = write_partitioned(
        ray.data.from_pandas(df), out, by="lang", input_fingerprint="f1"
    )
    assert res["written"] == ["de", "en", "fr"] and res["skipped"] == []
    assert res["rows"] == {"de": 10, "en": 10, "fr": 10}
    back = pd.read_parquet(out).sort_values("doc_id", ignore_index=True)
    assert len(back) == 30
    assert sorted(os.listdir(out)) >= ["lang=de", "lang=en", "lang=fr"]

    # full resume: nothing rewritten
    res2 = write_partitioned(
        ray.data.from_pandas(df), out, by="lang", input_fingerprint="f1"
    )
    assert res2["written"] == [] and res2["skipped"] == ["de", "en", "fr"]

    # crashed-run simulation: drop one partition's marker + corrupt it
    os.remove(os.path.join(out, "lang=fr", "_DONE"))
    for f in os.listdir(os.path.join(out, "lang=fr")):
        os.remove(os.path.join(out, "lang=fr", f))
    res3 = write_partitioned(
        ray.data.from_pandas(df), out, by="lang", input_fingerprint="f1"
    )
    assert res3["written"] == ["fr"] and sorted(res3["skipped"]) == ["de", "en"]
    back3 = pd.read_parquet(out).sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(
        back3[["doc_id", "text"]], df[["doc_id", "text"]]
    )
    meta = json.load(open(os.path.join(out, "lang=fr", "_DONE")))
    assert meta == {"fingerprint": "f1", "rows": 10}

    # fingerprint drift refused
    import pytest as _pytest

    with _pytest.raises(ValueError, match="fingerprint"):
        write_partitioned(
            ray.data.from_pandas(df), out, by="lang", input_fingerprint="f2"
        )

    # null partition keys refused
    dfn = df.copy()
    dfn.loc[0, "lang"] = None
    with _pytest.raises(ValueError, match="null"):
        write_partitioned(
            ray.data.from_pandas(dfn), str(tmp_path / "o2"), by="lang"
        )

    # resume with an EMPTY fingerprint refused: two default-fingerprint
    # runs writing different data would otherwise silently keep stale
    # partitions
    with _pytest.raises(ValueError, match="empty"):
        write_partitioned(ray.data.from_pandas(df), out, by="lang")
    # ...but a fresh dir with the default fingerprint still works
    res4 = write_partitioned(
        ray.data.from_pandas(df), str(tmp_path / "o3"), by="lang"
    )
    assert res4["written"] == ["de", "en", "fr"]


def test_write_partitioned_uri_encoded_values(tmp_path):
    import os

    import numpy as np
    import pandas as pd
    import ray

    from raylink.sources.sinks import write_partitioned

    # values pyarrow's hive writer URI-encodes: markers + crash cleanup
    # must land in the SAME directories as the data files
    df = pd.DataFrame(
        {
            "k": ["en US", "fr/ca", "100%"] * 4,
            "v": np.arange(12, dtype=np.int64),
        }
    )
    out = str(tmp_path / "enc")
    res = write_partitioned(
        ray.data.from_pandas(df), out, by="k", input_fingerprint="f1"
    )
    assert sorted(res["written"]) == ["100%", "en US", "fr/ca"]
    for d in ("k=en%20US", "k=fr%2Fca", "k=100%25"):
        files = os.listdir(os.path.join(out, d))
        assert "_DONE" in files and any(f.endswith(".parquet") for f in files)
    # crashed-run rewrite of an encoded partition must not duplicate rows
    os.remove(os.path.join(out, "k=en%20US", "_DONE"))
    write_partitioned(
        ray.data.from_pandas(df), out, by="k", input_fingerprint="f1"
    )
    back = pd.read_parquet(out)
    assert len(back) == 12 and sorted(back["v"]) == list(range(12))


def test_read_orc_roundtrip(tmp_path):
    """ORC source: stripe-parallel read with column projection matches
    the parquet-style contract (multi-file dir, multi-stripe file)."""
    import pyarrow as pa
    from pyarrow import orc

    from raylink.sources.readers import read_orc, read_table

    d = tmp_path / "orcdir"
    d.mkdir()
    n = 5000
    t = pa.table(
        {
            "a": pa.array(range(n), type=pa.int64()),
            "b": pa.array([f"s{i % 97}" for i in range(n)]),
            "c": pa.array([float(i) * 0.5 for i in range(n)]),
        }
    )
    # two files; small stripes force multiple stripes per file
    orc.write_table(t.slice(0, n // 2), str(d / "p0.orc"),
                    stripe_size=16 * 1024)
    orc.write_table(t.slice(n // 2), str(d / "p1.orc"),
                    stripe_size=16 * 1024)

    out = (
        read_orc(str(d), columns=["a", "b"], stripes_per_task=2)
        .to_pandas()
        .sort_values("a", ignore_index=True)
    )
    assert list(out.columns) == ["a", "b"]
    assert len(out) == n
    assert out["a"].tolist() == list(range(n))
    assert out["b"].iloc[500] == "s" + str(500 % 97)

    via_table = read_table(str(d), format="orc", columns=["a"]).to_pandas()
    assert len(via_table) == n and list(via_table.columns) == ["a"]
