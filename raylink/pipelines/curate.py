"""End-to-end corpus curation: the composed training-data pipeline.

The canonical pretraining prep flow, expressed entirely as streaming Ray
Data stages over the ops library — no stage materializes the corpus, no
driver-side loop touches rows:

1. **exact dedup** — ``exact_dedup_edges`` (one hash-keyed sorted-run
   scan), keepers only (doc_id == keep_doc_id);
2. **keeper restriction** — ``semi_anti_join`` against the keeper ids
   (broadcast ids under the limit, sorted co-scan above it);
3. **repetition quality filter** — ``repetition_scores(passthrough=True)``
   + a map-only threshold cut (Gopher-style duplicate-token cut);
4. **split assignment** — ``assign_splits`` hash-range train/val/test;
5. **per-split sampling** — ``mixture_sample`` keyed on the split label
   (e.g. subsample train, keep eval splits whole).

Every decision is a pure function of (doc_id, text), so the output is
IDENTICAL under resume, resharding, and any cluster size — and the whole
pipeline is expressible in one SQL statement, which is exactly what the
``curate_docs`` oracle in ``__ray_entry__`` checks.
"""

from __future__ import annotations

import numpy as np

import ray.data

from ..ops.dedup import exact_dedup_edges
from ..ops.sample import assign_splits, mixture_sample
from ..ops.semijoin import semi_anti_join
from ..ops.text import repetition_scores

__all__ = ["curate_corpus"]


def curate_corpus(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_ratio_e4: int = 3000,
    min_words: int = 5,
    splits: dict[str, float] | None = None,
    split_fractions: dict[str, float] | None = None,
    split_seed: int = 5,
    sample_seed: int = 11,
    num_partitions: int = 64,
    checkpoint_dir: str | None = None,
    input_fingerprint: str = "",
) -> ray.data.Dataset:
    """Returns the curated corpus: kept rows of ``docs`` plus
    ``n_words``, ``dup_ratio_e4`` and ``split`` columns.

    With ``checkpoint_dir`` the two stage boundaries persist as
    partitioned Parquet + manifests (``state/checkpoint.py``): the
    expensive text pass (dedup scan + keeper join + repetition scoring +
    quality cut) commits as ``curate_filtered`` and the final
    split/sample map as ``curate_final`` — a rerun with the same dir and
    fingerprint resumes past whatever completed, and because every
    decision is hash-deterministic the resumed output is byte-identical
    to a fresh run.
    """
    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    split_fractions = split_fractions or {
        "train": 0.5,
        "val": 1.0,
        "test": 1.0,
    }

    def build_filtered() -> ray.data.Dataset:
        edges = exact_dedup_edges(
            docs, text_col, id_col, num_partitions=num_partitions
        )

        def keepers(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
            ids = np.asarray(batch[id_col])
            keep = ids == np.asarray(batch[f"keep_{id_col}"])
            return {id_col: ids[keep]}

        keeper_ids = edges.map_batches(keepers, batch_format="numpy")
        kept = semi_anti_join(
            docs, keeper_ids, id_col, num_partitions=num_partitions
        )

        scored = repetition_scores(
            kept, text_col=text_col, id_col=id_col, passthrough=True
        )

        def quality(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
            keep = (
                np.asarray(batch["dup_ratio_e4"]) <= max_dup_ratio_e4
            ) & (np.asarray(batch["n_words"]) >= min_words)
            return {k: np.asarray(v)[keep] for k, v in batch.items()}

        return scored.map_batches(quality, batch_format="numpy")

    def build_final(filtered: ray.data.Dataset) -> ray.data.Dataset:
        tagged = assign_splits(filtered, id_col, splits, seed=split_seed)
        return mixture_sample(
            tagged, "split", id_col, split_fractions, seed=sample_seed
        )

    if checkpoint_dir is None:
        return build_final(build_filtered())

    from ..state.checkpoint import PipelineRunner

    # the resume key must cover every parameter that changes a stage's
    # output, or a rerun with new thresholds/splits/seeds silently
    # returns the OLD corpus; each stage keys on exactly the params it
    # consumes so a split-only change still resumes the text pass
    import hashlib as _hl
    import json as _json

    def _fp(params: dict) -> str:
        blob = _json.dumps(params, sort_keys=True)
        return (
            input_fingerprint
            + ":"
            + _hl.sha256(blob.encode()).hexdigest()[:16]
        )

    filtered_fp = _fp(
        {"max_dup_ratio_e4": max_dup_ratio_e4, "min_words": min_words}
    )
    final_fp = _fp(
        {
            "max_dup_ratio_e4": max_dup_ratio_e4,
            "min_words": min_words,
            "splits": splits,
            "split_fractions": split_fractions,
            "split_seed": split_seed,
            "sample_seed": sample_seed,
        }
    )
    runner = PipelineRunner(checkpoint_dir, async_writes=True)
    filtered = runner.stage(
        "curate_filtered", build_filtered, filtered_fp
    ).dataset
    final = runner.stage(
        "curate_final", lambda: build_final(filtered), final_fp
    ).dataset
    runner.finalize()
    return final
