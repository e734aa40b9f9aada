"""Dataset readers/writers.

The reference has no I/O layer — callers load CSVs themselves with
``pool=true, missingstring=["","NA"]`` (/root/reference/test/runtests.jl:11-18).
Here I/O is first-class:

- :func:`read_table` — Parquet/CSV/JSON with column pruning pushed into the
  read (a read that loads all columns for a 2-column transform never leaves
  storage at 100 TB).
- :func:`read_csv_linkage` — CSV with the reference's null-sentinel
  convention ("" and "NA" -> null).
- :func:`write_partitioned` — resumable partitioned-Parquet output (one
  directory per partition key value; never one giant file).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.csv as pacsv

import ray.data

__all__ = [
    "read_table",
    "read_orc",
    "read_csv_linkage",
    "read_text_docs",
    "read_binary_docs",
    "write_partitioned",
]

NULL_SENTINELS = ["", "NA"]


def read_table(
    path: str,
    format: str = "parquet",
    columns: list[str] | None = None,
    **kwargs,
) -> ray.data.Dataset:
    """Read a table with projection pushdown where the format supports it."""
    if format == "parquet":
        return ray.data.read_parquet(path, columns=columns, **kwargs)
    if format == "orc":
        return read_orc(path, columns=columns, **kwargs)
    if format == "csv":
        ds = ray.data.read_csv(path, **kwargs)
    elif format == "json":
        ds = ray.data.read_json(path, **kwargs)
    else:
        raise ValueError(f"unsupported format {format!r}")
    if columns:
        ds = ds.select_columns(columns)
    return ds


def _resolve_fs(path: str):
    """Resolve a path/URI to ``(pyarrow.fs.FileSystem, fs-relative
    path)``.  URIs (``s3://…``, ``file://…``) go through
    ``FileSystem.from_uri``; bare paths (incl. relative) map to the
    local filesystem."""
    import os

    from pyarrow import fs as pa_fs

    if "://" in path:
        return pa_fs.FileSystem.from_uri(path)
    return pa_fs.LocalFileSystem(), os.path.abspath(path)


def read_orc(
    path: str,
    columns: list[str] | None = None,
    stripes_per_task: int = 4,
) -> ray.data.Dataset:
    """ORC read with column-projection pushdown (Ray 2.49 ships no
    native ORC datasource): one driver-side listing pass enumerates
    (file, stripe-range) work items — metadata-only, no data reads —
    then each task decodes its stripes via ``pyarrow.orc`` reading ONLY
    the projected columns.  Parallelism follows stripe count, so a few
    huge ORC files still fan out instead of serializing per file.

    Paths resolve through ``pyarrow.fs`` (like the parquet branch of
    :func:`read_table`), so remote URIs (``s3://…``) list and read the
    same as local directories.
    """
    from pyarrow import fs as pa_fs
    from pyarrow import orc as pa_orc

    fsys, rel = _resolve_fs(path)
    info = fsys.get_file_info(rel)
    if info.type == pa_fs.FileType.Directory:
        files = sorted(
            fi.path
            for fi in fsys.get_file_info(
                pa_fs.FileSelector(rel, recursive=True)
            )
            if fi.is_file and fi.path.endswith(".orc")
        )
    elif info.type == pa_fs.FileType.File:
        files = [rel]
    else:
        raise FileNotFoundError(f"ORC path not found: {path!r}")
    if not files:
        raise ValueError(f"no .orc files under {path!r}")
    items = []
    for f in files:
        with fsys.open_input_file(f) as fh:
            n_stripes = pa_orc.ORCFile(fh).nstripes
        for lo in range(0, n_stripes, stripes_per_task):
            items.append(
                {
                    "file": f,
                    "lo": lo,
                    "hi": min(lo + stripes_per_task, n_stripes),
                }
            )

    def decode(batch: dict) -> "pa.Table":
        import pyarrow as pa
        from pyarrow import orc as _orc

        # re-resolve the filesystem inside the task (FileSystem objects
        # are picklable, but per-task construction keeps connections
        # worker-local)
        task_fs, _ = _resolve_fs(path)
        batches = []
        for f, lo, hi in zip(batch["file"], batch["lo"], batch["hi"]):
            with task_fs.open_input_file(str(f)) as fh:
                reader = _orc.ORCFile(fh)
                for s in range(int(lo), int(hi)):
                    # read_stripe returns a RecordBatch
                    batches.append(
                        reader.read_stripe(s, columns=columns)
                    )
        return pa.Table.from_batches(batches)

    return ray.data.from_items(items).map_batches(
        decode, batch_size=1, batch_format="numpy"
    )


def read_csv_linkage(
    path: str, columns: list[str] | None = None, **kwargs
) -> ray.data.Dataset:
    """CSV read with the reference's missing-value convention ('', 'NA')."""
    convert = pacsv.ConvertOptions(
        null_values=NULL_SENTINELS, strings_can_be_null=True
    )
    ds = ray.data.read_csv(path, convert_options=convert, **kwargs)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def read_text_docs(
    path: str,
    by: str = "line",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Raw text ingestion into the documents shape.

    ``by="line"`` — one doc per line (the .txt corpus-dump convention);
    ``by="file"`` — one doc per file (one article per file layouts).
    Line mode emits a practically-unique ``id_col``: the stable 63-bit
    hash of ``path:line_idx`` (content-independent, so a rerun over the
    same tree assigns identical ids — resume-safe, unlike a global
    enumerate over a nondeterministic file order), plus the raw ``path``
    and ``line_idx`` provenance columns.  63 bits is NOT a uniqueness
    guarantee at extreme scale (birthday bound: ~5% collision odds at
    1e9 docs); ``(path, line_idx)`` is the exact unique key and travels
    with every row, so id-collision-sensitive consumers (packing /
    prefix-sum order keys, dedup keeper selection) can detect dups with
    a ``count(*) GROUP BY id HAVING count > 1`` pass or re-key on the
    provenance pair.  Near-uniqueness still matters downstream: the
    samplers hash the id, and a per-file line number alone would collide
    structurally across files (line k of every file sampling together).
    """
    if by == "line":
        ds = ray.data.read_binary_files(path, include_paths=True)

        def split_lines(batch: pa.Table) -> pa.Table:
            import numpy as np
            import pandas as pd

            from ..functions.hashing import hash64_array

            paths = batch.column("path").to_pylist()
            blobs = batch.column("bytes").to_pylist()
            out_path, out_line, out_text = [], [], []
            for p, blob in zip(paths, blobs):
                lines = blob.decode("utf-8", errors="replace").splitlines()
                out_path.extend([p] * len(lines))
                out_line.extend(range(len(lines)))
                out_text.extend(lines)
            keys = (
                pd.Series(out_path, dtype="object")
                + ":"
                + pd.Series(out_line).astype(str)
            ).to_numpy(dtype=object)
            ids = (
                hash64_array(keys).astype(np.uint64)
                & np.uint64(0x7FFFFFFFFFFFFFFF)
            ).astype(np.int64)
            return pa.table(
                {
                    "path": pa.array(out_path, type=pa.string()),
                    "line_idx": pa.array(
                        np.asarray(out_line, dtype="int64"), type=pa.int64()
                    ),
                    id_col: pa.array(ids, type=pa.int64()),
                    text_col: pa.array(out_text, type=pa.string()),
                }
            )

        return ds.map_batches(split_lines, batch_format="pyarrow")
    if by == "file":
        ds = ray.data.read_binary_files(path, include_paths=True)

        def decode(batch: pa.Table) -> pa.Table:
            texts = [
                b.decode("utf-8", errors="replace")
                for b in batch.column("bytes").to_pylist()
            ]
            return pa.table(
                {
                    "path": batch.column("path"),
                    text_col: pa.array(texts, type=pa.string()),
                }
            )

        return ds.map_batches(decode, batch_format="pyarrow")
    raise ValueError(f"by must be 'line' or 'file', got {by!r}")


def read_binary_docs(path: str) -> ray.data.Dataset:
    """Opaque binary ingestion (images/audio/artifacts) into the
    multimodal shape: one row per file with ``path`` and ``payload``
    (binary) — feed to ``raylink.ops.multimodal`` decode stages."""
    ds = ray.data.read_binary_files(path, include_paths=True)

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "path": batch.column("path"),
                "payload": batch.column("bytes"),
            }
        )

    return ds.map_batches(shape, batch_format="pyarrow")


def write_partitioned(
    ds: ray.data.Dataset,
    path: str,
    partition_cols: list[str] | None = None,
    **kwargs,
) -> None:
    """Partitioned Parquet output (hive-style dirs when partition_cols set)."""
    if partition_cols:
        ds.write_parquet(path, partition_cols=partition_cols, **kwargs)
    else:
        ds.write_parquet(path, **kwargs)
