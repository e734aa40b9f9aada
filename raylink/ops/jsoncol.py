"""JSON column field extraction (the ELT staple: pull typed fields out of
a string column of JSON objects).

Two paths per batch:

- ``flat=True`` — one vectorized ``pandas.str.extract`` regex per batch.
  Correct ONLY for flat objects (no nested object may repeat the key);
  this is the 100 TB path.  Numeric fields are fully vectorized; string
  fields pay one tiny ``json.loads`` per MATCH to unescape (the value
  grammar, not the document).
- ``flat=False`` (default) — ``json.loads`` per row: robust for nested
  documents, Python-speed.  An engine without a native JSON kernel has no
  vectorized general parser; callers with known-flat schemas opt into the
  fast path.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pyarrow as pa

import ray.data

__all__ = ["with_json_field"]

_TYPES = {
    "int64": pa.int64(),
    "float64": pa.float64(),
    "string": pa.string(),
}


def with_json_field(
    ds: ray.data.Dataset,
    json_col: str,
    field: str,
    out_col: str | None = None,
    dtype: str = "int64",
    flat: bool = False,
) -> ray.data.Dataset:
    """Add ``out_col`` = the top-level ``field`` of each JSON object in
    ``json_col`` (missing key / null / parse failure -> null)."""
    if dtype not in _TYPES:
        raise ValueError(f"dtype must be one of {sorted(_TYPES)}")
    out_col = out_col or field
    pa_type = _TYPES[dtype]
    if dtype == "string":
        pat = re.compile(
            r'"' + re.escape(field) + r'"\s*:\s*"((?:[^"\\]|\\.)*)"'
        )
    else:
        pat = re.compile(
            r'"' + re.escape(field) + r'"\s*:\s*(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)'
        )

    def fn(batch: pa.Table) -> pa.Table:
        import pandas as pd

        s = pd.Series(
            batch.column(json_col).to_numpy(zero_copy_only=False),
            dtype="object",
        )
        if flat:
            vals = s.fillna("").str.extract(pat, expand=False)
            if dtype == "string":
                ext = [
                    None if v != v or v is None else json.loads(f'"{v}"')
                    for v in vals
                ]  # unescape via the JSON string grammar itself
                arr = pa.array(ext, type=pa_type)
            else:
                nums = pd.to_numeric(vals, errors="coerce")
                if pa.types.is_integer(pa_type):
                    # same contract as the robust path: a non-integral or
                    # out-of-range JSON number requested as int64 is a
                    # null, never a job-killing ArrowInvalid cast error
                    ok = (nums.mod(1) == 0) & (nums.abs() < float(2**63))
                    nums = nums.where(ok)
                arr = pa.array(nums, type=pa_type)
        else:
            ext = []
            for v in s:
                try:
                    obj = json.loads(v)
                    ext.append(obj.get(field) if isinstance(obj, dict) else None)
                except (TypeError, ValueError):
                    ext.append(None)
            try:
                arr = pa.array(ext, type=pa_type)
            except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
                # documented contract: a type-mismatched JSON value is a
                # null, never a job-killing cast error
                if pa.types.is_integer(pa_type):
                    ok = [
                        v if type(v) is int else None for v in ext
                    ]
                elif pa.types.is_floating(pa_type):
                    ok = [
                        float(v) if type(v) in (int, float) else None
                        for v in ext
                    ]
                elif pa.types.is_boolean(pa_type):
                    ok = [v if type(v) is bool else None for v in ext]
                else:
                    ok = [v if isinstance(v, str) else None for v in ext]
                arr = pa.array(ok, type=pa_type)
        return batch.append_column(out_col, arr)

    return ds.map_batches(fn, batch_format="pyarrow")
