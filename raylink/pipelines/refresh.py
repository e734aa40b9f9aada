"""Composed corpus refresh: CDC merge → exact dedup → quality gate.

The recurring ingest cycle of a living training corpus, as ONE
checkpointed streaming pipeline over the ops library:

1. **merge** — :func:`raylink.ops.cdc.apply_changes` applies the change
   batch (upserts + deletes) to the base snapshot;
2. **dedup** — an upsert can duplicate an existing document's text;
   ``exact_dedup_edges`` + keeper semi-join keep one doc per text
   (min id, the repo-wide convention);
3. **gate** — :func:`raylink.ops.validate.expect_rules` counts
   violations of the caller's expectations over the refreshed corpus
   (returned as a separate tiny dataset so callers can assert and
   abort before publishing).

Every decision is a pure function of the inputs, so reruns and resumes
are byte-identical; steps 1-2 are expressible in one SQL statement,
which the ``refresh_docs`` oracle checks end-to-end.
"""

from __future__ import annotations

import numpy as np
import ray.data

from ..ops.cdc import apply_changes
from ..ops.dedup import exact_dedup_edges
from ..ops.semijoin import semi_anti_join
from ..ops.validate import expect_rules

__all__ = ["refresh_corpus"]


def refresh_corpus(
    base: ray.data.Dataset,
    changes: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    op_col: str = "op",
    rules: list[dict] | None = None,
    num_partitions: int = 64,
    checkpoint_dir: str | None = None,
    input_fingerprint: str = "",
) -> dict[str, ray.data.Dataset]:
    """Returns ``{"snapshot": <merged+deduped corpus>, "validation":
    <(rule, violations) rows — empty-rule calls omit the key>}``."""

    def build_merged() -> ray.data.Dataset:
        return apply_changes(
            base,
            changes,
            id_col=id_col,
            op_col=op_col,
            num_partitions=num_partitions,
        )

    def build_deduped(merged: ray.data.Dataset) -> ray.data.Dataset:
        edges = exact_dedup_edges(
            merged, text_col, id_col, num_partitions=num_partitions
        )

        def keepers(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
            ids = np.asarray(batch[id_col])
            keep = ids == np.asarray(batch[f"keep_{id_col}"])
            return {id_col: ids[keep]}

        keeper_ids = edges.map_batches(keepers, batch_format="numpy")
        return semi_anti_join(
            merged, keeper_ids, id_col, num_partitions=num_partitions
        )

    if checkpoint_dir is None:
        # pin the merge result: the dedup edge scan AND the keeper
        # semi-join both consume it, and lazily each would re-run the
        # merge's resolution maps (the checkpointed path pins via the
        # stage commit instead)
        snapshot = build_deduped(build_merged().materialize())
    else:
        import hashlib as _hl
        import json as _json

        from ..state.checkpoint import PipelineRunner

        def _fp(params: dict) -> str:
            blob = _json.dumps(params, sort_keys=True)
            return (
                input_fingerprint
                + ":"
                + _hl.sha256(blob.encode()).hexdigest()[:16]
            )

        runner = PipelineRunner(checkpoint_dir, async_writes=True)
        merged = runner.stage(
            "refresh_merged", build_merged, _fp({"id": id_col})
        ).dataset
        snapshot = runner.stage(
            "refresh_snapshot",
            lambda: build_deduped(merged),
            _fp({"id": id_col, "text": text_col}),
        ).dataset
        runner.finalize()

    out: dict[str, ray.data.Dataset] = {"snapshot": snapshot}
    if rules:
        out["validation"] = expect_rules(
            snapshot, rules, num_partitions=min(16, num_partitions)
        )
    return out
