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

__all__ = ["read_table", "read_csv_linkage", "write_partitioned"]

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
    if format == "csv":
        ds = ray.data.read_csv(path, **kwargs)
    elif format == "json":
        ds = ray.data.read_json(path, **kwargs)
    else:
        raise ValueError(f"unsupported format {format!r}")
    if columns:
        ds = ds.select_columns(columns)
    return ds


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
