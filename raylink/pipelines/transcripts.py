"""Flagship pipeline: transcript Parquet -> entity clusters, checkpointed.

The end-to-end shape from the north star, one checkpointed stage per wide
step::

    read_parquet(turns)
      -> [assembled]     groupby(conv_id) assembly + block keys
      -> [scored_pairs]  salt plan -> pair groups -> pair gen -> gamma scoring
      -> (driver)        pattern histogram + EM fit     [em artifact JSON]
      -> [matches]       broadcast matched patterns, filter
      -> [clusters]      connected components
"""

from __future__ import annotations

import hashlib
import json
from typing import Any

import pandas as pd

import ray.data

from ..config import LinkConfig, parse_config
from ..stages import blocking as blocking_stage
from ..stages import pairs as pairs_stage
from ..stages.assemble import assemble_conversations
from ..stages.cluster import connected_components
from ..stages.matches import get_matches
from ..stages.patterns import (
    merge_histograms,
    pattern_histogram,
    sample_residual_histogram,
)
from ..stages.scoring import score_pairs
from ..state.checkpoint import PipelineRunner
from .linkage import _leaf_em_for_matches, fit_patterns

__all__ = ["default_transcript_config", "run_transcript_pipeline"]


def default_transcript_config(**overrides: Any) -> LinkConfig:
    """The flagship match configuration for conversation records."""
    cfg = {
        "link_type": "dedupe_only",
        "idvar": ["conv_id", "conv_id"],
        "comparisons": {
            "name": "total",
            "threshold_match": 0.85,
            "variables": [
                {"varname": "first_text_norm", "method": "jarowinkler",
                 "cut_a": 0.92, "cut_b": 0.88},
                {"varname": "tool_sig", "method": "exact"},
                {"varname": "tok_blob", "method": "token_lv",
                 "cut_a": 0.7, "cut_b": 0.4},
            ],
        },
        "blocking": {"cap": 512},
    }
    cfg.update(overrides)
    return parse_config(cfg)


def _config_fingerprint(config: LinkConfig, extra: str = "") -> str:
    blob = json.dumps(
        {
            "vars": [
                (
                    v.name, v.kernel, v.distmethod, v.cut_a, v.cut_b,
                    v.partial, v.w,
                    # every knob that changes gammas or downstream stage
                    # output must be in the resume key, or a rerun with a
                    # changed config silently resumes stale results
                    bool(getattr(v, "upper", False)),
                    bool(getattr(v, "fuzzy_truncate", False)),
                    bool(getattr(v, "tf_adjust", False)),
                )
                for v in config.leaf_vars()
            ],
            "threshold": config.comparisons.threshold_match,
            "cap": config.blocking.cap,
            "seed": getattr(config.execution, "seed", None),
            "extra": extra,
        },
        sort_keys=True,
    )
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def run_transcript_pipeline(
    turns: ray.data.Dataset,
    checkpoint_dir: str,
    config: LinkConfig | None = None,
    input_fingerprint: str = "",
    seed: int = 1234,
) -> dict[str, Any]:
    """Run (or resume) the flagship dedupe over a turns Dataset.

    Returns dict with ``clusters`` / ``matches`` Datasets, the ``em`` fit,
    and per-stage ``manifests`` (lineage + counters).  A re-invocation with
    the same ``checkpoint_dir`` + fingerprints skips completed stages.
    """
    config = config or default_transcript_config()
    # async_writes: checkpoint Parquet commits overlap the next stage's
    # compute — the flat per-stage write+readback was the dominant
    # single-box e2e scaling cost (round-2 verdict item 4)
    runner = PipelineRunner(checkpoint_dir, async_writes=True)
    fp = _config_fingerprint(config, input_fingerprint)
    id_col = "conv_id"
    fields = [v.name for v in config.leaf_vars()]

    # ---- stage 1: assembly + block keys ---------------------------------
    def build_assembled() -> ray.data.Dataset:
        recs = assemble_conversations(turns, include_full_text=False)
        recs = blocking_stage.transcript_block_keys(recs)
        return recs.select_columns(
            list(dict.fromkeys([id_col, *fields, "block_key"]))
        )

    assembled = runner.stage("assembled", build_assembled, fp)
    records = assembled.dataset.materialize()
    n = records.count()
    total_comparisons = n * (n - 1) // 2

    # ---- stage 2: salted pair generation + scoring ----------------------
    plan, bcount, block_counts = blocking_stage.analyze_blocks(
        records, config.blocking
    )

    def build_scored() -> ray.data.Dataset:
        # singleton blocks generate no pairs — drop them pre-shuffle
        paired_records = blocking_stage.filter_to_multi_blocks(
            records, counts=block_counts
        )
        expanded = blocking_stage.expand_pair_groups(
            paired_records, plan, id_col, side=None,
            dropped=set(bcount.notes.get("dropped_block_keys", [])),
        )
        pairs = pairs_stage.generate_pairs_dedupe(expanded, fields, id_col=id_col)
        return score_pairs(
            pairs,
            config.leaf_vars(),
            concurrency=config.execution.scorer_concurrency,
            batch_size=config.execution.scorer_batch_size,
        ).select_columns(["id_a", "id_b", "pattern_key"])

    scored_res = runner.stage(
        "scored_pairs",
        build_scored,
        fp,
        counters={
            "records": n,
            "hot_blocks": bcount.n_hot_blocks,
            "dropped_blocks": bcount.n_dropped_blocks,
            "dropped_rows": bcount.dropped_rows,
        },
    )
    scored = scored_res.dataset

    # ---- driver: histogram + EM ----------------------------------------
    import time as _time

    _t_em = _time.time()
    # the histogram (over scored) and the residual EM sample (over records)
    # scan different materialized datasets — run them concurrently; the
    # sample is speculative (wasted only in the residual==0 corner, where
    # every comparison was blocked together)
    from concurrent.futures import ThreadPoolExecutor

    from ..stages.sampling import deterministic_sample

    with ThreadPoolExecutor(max_workers=2) as _ex:
        _f_hist = _ex.submit(pattern_histogram, scored)
        _f_sample = _ex.submit(
            lambda: deterministic_sample(
                records, "conv_id", min(1.0, 2000 / max(n, 1)), seed=seed
            ).to_pandas()
        )
        hist = _f_hist.result()
        _sample_df = _f_sample.result()
    scored_count = float(hist["cnt"].sum())
    residual = total_comparisons - scored_count
    if residual > 0:
        # hash sample, NOT random_sample: the draw must be a pure function
        # of the rows so a resumed run refits the EM on the identical
        # sample (see stages/sampling.py; proven by bench --resume-proof)
        sample = _sample_df
        hist = merge_histograms(
            hist,
            sample_residual_histogram(
                sample, sample, config.leaf_vars(), residual, seed=seed + 1
            ),
        )
    root_em, child_ems, leaf = fit_patterns(hist, config, seed=seed)
    em_wall = round(_time.time() - _t_em, 3)
    runner.small_artifact(
        "em",
        {
            "p_m": root_em.p_m,
            "p_u": root_em.p_u,
            "number_of_comparisons": root_em.number_of_comparisons,
            "number_of_unique_patterns": root_em.number_of_unique_patterns,
            "iter_converge": root_em.iter_converge,
            "converged": root_em.converged,
            "threshold_match": root_em.threshold_match,
            "varnames": root_em.varnames,
            "patterns_w": root_em.patterns_w.to_dict(orient="list"),
            "scored_pairs": scored_count,
            "residual_pairs": residual,
        },
    )

    # ---- stage 3: matches ----------------------------------------------
    def build_matches() -> ray.data.Dataset:
        return get_matches(scored, _leaf_em_for_matches(root_em, leaf))

    matches_res = runner.stage("matches", build_matches, fp)
    matches = matches_res.dataset.materialize()

    # ---- stage 4: clusters ---------------------------------------------
    def build_clusters() -> ray.data.Dataset:
        nodes = records.select_columns([id_col]).map_batches(
            lambda b: b.rename_columns(["node"]), batch_format="pyarrow"
        )
        return connected_components(
            matches,
            nodes,
            node_col="node",
            src_col="id_a",
            dst_col="id_b",
            local_threshold=config.execution.cc_local_threshold,
            num_partitions=config.execution.cc_num_partitions,
        )

    clusters_res = runner.stage("clusters", build_clusters, fp)
    # every overlapped checkpoint commit must be durable before we report
    # success (manifests below also gain rows/partitions once committed)
    runner.finalize()

    return {
        "records": records,
        "matches": matches,
        "clusters": clusters_res.dataset,
        "em": root_em,
        "child_ems": child_ems,
        "leaf_patterns": leaf,
        "manifests": runner.manifests,
        "counters": {
            "records": n,
            "total_comparisons": total_comparisons,
            "scored_pairs": scored_count,
            "matched_pairs": matches.count(),
            "hot_blocks": bcount.n_hot_blocks,
            "em_wall": em_wall,
            "stage_walls": {
                k: m.get("wall_seconds") for k, m in runner.manifests.items()
            },
            "completed_stages": [
                k for k, m in runner.manifests.items() if runner.is_complete(k, fp)
            ],
            "resumed_stages": [
                name
                for name, res in (
                    ("assembled", assembled),
                    ("scored_pairs", scored_res),
                    ("matches", matches_res),
                    ("clusters", clusters_res),
                )
                if res.resumed
            ],
        },
    }
