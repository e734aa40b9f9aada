"""Partitioned Parquet sink with per-partition resume.

The output contract at 100 TB (repo brief): never one giant file —
one directory per key value (hive layout, ``by=value/``), so a failed
run can skip finished partitions instead of rewriting everything.

``write_partitioned`` wraps Ray's native partitioned writer (which
already streams: each task writes its own files into the right hive
directory) with the two things it lacks:

1. **per-partition completion markers** — after the write, every
   partition directory gets a ``_DONE`` marker carrying the caller's
   input fingerprint and the partition's row count;
2. **resume** — a rerun with the same fingerprint filters rows of
   already-marked partitions OUT before any data moves (a map-only
   predicate over the broadcast done-set), writing only the missing
   partitions.  A crashed run leaves some partitions marked and some
   not; partially-written unmarked directories are cleared before
   their rewrite, so the final state is exactly one complete file set
   per partition.

The marker also guards against silent config drift: a rerun with a
DIFFERENT fingerprint refuses to mix outputs and asks for a clean dir.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import ray.data

__all__ = ["write_partitioned"]

_MARKER = "_DONE"


def _partition_dir(path: str, by: str, value) -> str:
    # pyarrow's hive writer URI-encodes partition values (space -> %20,
    # '/' -> %2F, ...) — markers and crash cleanup MUST target the same
    # directory names, verified equal to quote(safe="")
    from urllib.parse import quote

    return os.path.join(path, f"{by}={quote(str(value), safe='')}")


def write_partitioned(
    ds: ray.data.Dataset,
    path: str,
    by: str,
    input_fingerprint: str = "",
    max_partitions: int = 65536,
) -> dict:
    """Write ``ds`` as hive-partitioned Parquet under ``path``.

    Returns a summary dict: ``{"written": [...], "skipped": [...],
    "rows": {value: n}}``.  The partition column must be
    string/int-like with at most ``max_partitions`` distinct values
    (each becomes one directory — a high-cardinality key belongs in
    the filename, not the partition layout).  Null partition keys are
    refused: Parquet hive layout cannot round-trip them losslessly.
    """
    from ..stages.sortedrun import count_by_key

    os.makedirs(path, exist_ok=True)

    # The count pass and the write pass must see the SAME rows — a lazy
    # nondeterministic upstream would otherwise record manifests that
    # disagree with the files.  Pin the input once.
    ds = ds.materialize()

    # per-partition row counts: tiny (#distinct values), and exactly the
    # manifest content — one pass over block partials, never raw rows.
    # Nulls map to a reserved sentinel first (np.unique cannot order
    # None next to strings) and are refused on the driver.
    _NULL = "\x00__NULL_PARTITION__"

    def null_safe(batch: dict[str, np.ndarray]) -> dict:
        import pandas as pd

        v = pd.Series(np.asarray(batch[by], dtype=object))
        return {by: v.fillna(_NULL).astype(str).to_numpy(dtype=object)}

    counts = count_by_key(
        ds.map_batches(null_safe, batch_format="numpy"), by, num_partitions=8
    ).to_pandas()
    if (counts[by] == _NULL).any():
        raise ValueError(
            f"null values in partition column {by!r}; "
            "fill or drop them before writing"
        )
    if len(counts) > max_partitions:
        raise ValueError(
            f"{len(counts)} distinct {by!r} values exceed "
            f"max_partitions={max_partitions}"
        )
    rows = {
        str(v): int(n) for v, n in zip(counts[by], counts["count()"])
    }

    done: set[str] = set()
    for v in rows:
        marker = os.path.join(_partition_dir(path, by, v), _MARKER)
        if os.path.exists(marker):
            if not input_fingerprint:
                # An empty fingerprint matches ANY other empty-fingerprint
                # run, so resume would silently keep stale partitions
                # written from different data.  Refuse rather than guess.
                raise ValueError(
                    f"partition {by}={v} has a _DONE marker but "
                    "input_fingerprint is empty; pass a non-empty "
                    "fingerprint to resume, or use a clean output dir"
                )
            meta = json.load(open(marker))
            if meta.get("fingerprint") != input_fingerprint:
                raise ValueError(
                    f"partition {by}={v} was written with fingerprint "
                    f"{meta.get('fingerprint')!r}, not "
                    f"{input_fingerprint!r}; use a clean output dir"
                )
            done.add(v)

    pending = [v for v in rows if v not in done]
    if pending:
        # clear partial leftovers of unmarked partitions (crashed run)
        for v in pending:
            shutil.rmtree(_partition_dir(path, by, v), ignore_errors=True)
        pending_set = set(pending)

        def keep_pending(batch: dict[str, np.ndarray]) -> dict:
            vals = np.asarray(batch[by]).astype(str)
            keep = np.isin(vals, list(pending_set))
            return {k: np.asarray(v)[keep] for k, v in batch.items()}

        filtered = (
            ds
            if not done
            else ds.map_batches(keep_pending, batch_format="numpy")
        )
        filtered.write_parquet(path, partition_cols=[by])
        for v in pending:
            pdir = _partition_dir(path, by, v)
            os.makedirs(pdir, exist_ok=True)  # all-filtered edge case
            with open(os.path.join(pdir, _MARKER), "w") as f:
                json.dump(
                    {"fingerprint": input_fingerprint, "rows": rows[v]}, f
                )

    return {"written": sorted(pending), "skipped": sorted(done), "rows": rows}
