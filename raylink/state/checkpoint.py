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
"""

from __future__ import annotations

import json
import os
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
    """Orchestrates named stages with checkpoint/resume semantics."""

    checkpoint_dir: str
    run_fingerprint: str = ""
    manifests: dict[str, dict[str, Any]] = field(default_factory=dict)

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
        os.makedirs(data_dir, exist_ok=True)
        # clear any partial previous attempt
        for f in os.listdir(data_dir):
            os.unlink(os.path.join(data_dir, f))
        marker = os.path.join(base, "_COMPLETE")
        if os.path.exists(marker):
            os.unlink(marker)
        ds.write_parquet(data_dir)
        partitions = []
        total_rows = None
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
        manifest = {
            "stage": name,
            "input_fingerprint": fingerprint,
            "rows": total_rows,
            "partitions": partitions,
            "counters": counters or {},
            "wall_seconds": round(time.time() - t0, 3),
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
        return StageResult(
            dataset=ray.data.read_parquet(data_dir), manifest=manifest, resumed=False
        )

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
