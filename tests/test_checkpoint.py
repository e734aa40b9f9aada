"""Checkpoint/resume tests: identical output, skipped stages, invalidation."""

import os
import shutil

import pandas as pd
import ray

from raylink.pipelines.transcripts import (
    default_transcript_config,
    run_transcript_pipeline,
)
from raylink.sources.synth import make_transcripts


def _clusters_df(res) -> pd.DataFrame:
    return res["clusters"].to_pandas().sort_values("node", ignore_index=True)


def test_resume_skips_stages_and_reproduces(tmp_path):
    turns, _ = make_transcripts(n_entities=80, seed=21)
    ds = ray.data.from_pandas(turns)
    ckpt = str(tmp_path / "ckpt")

    res1 = run_transcript_pipeline(ds, ckpt, input_fingerprint="fixture-21")
    first = _clusters_df(res1)
    manifests1 = res1["manifests"]
    assert set(manifests1) >= {"assembled", "scored_pairs", "matches", "clusters"}
    for m in manifests1.values():
        assert m["partitions"], "per-partition lineage must be recorded"
        assert "wall_seconds" in m

    # full resume: all stages skipped, byte-identical clusters
    res2 = run_transcript_pipeline(ds, ckpt, input_fingerprint="fixture-21")
    pd.testing.assert_frame_equal(_clusters_df(res2), first)
    assert res2["counters"]["resumed_stages"]  # stages actually skipped

    # simulate a crash after stage 2: later checkpoints lost
    shutil.rmtree(os.path.join(ckpt, "matches"))
    shutil.rmtree(os.path.join(ckpt, "clusters"))
    res3 = run_transcript_pipeline(ds, ckpt, input_fingerprint="fixture-21")
    pd.testing.assert_frame_equal(_clusters_df(res3), first)

    # simulate a crash MID-WRITE: data files present but no completion
    # marker — the stage must be recomputed, not trusted
    marker = os.path.join(ckpt, "scored_pairs", "_COMPLETE")
    os.remove(marker)
    res4 = run_transcript_pipeline(ds, ckpt, input_fingerprint="fixture-21")
    pd.testing.assert_frame_equal(_clusters_df(res4), first)
    assert "scored_pairs" not in res4["counters"]["resumed_stages"]
    assert os.path.exists(marker)  # re-completed


def test_fingerprint_invalidation(tmp_path):
    turns, _ = make_transcripts(n_entities=30, seed=22)
    ds = ray.data.from_pandas(turns)
    ckpt = str(tmp_path / "ckpt")
    run_transcript_pipeline(ds, ckpt, input_fingerprint="v1")
    # changed config -> different fingerprint -> stages re-run, not reused
    cfg = default_transcript_config()
    cfg.comparisons.threshold_match = 0.95
    res = run_transcript_pipeline(ds, ckpt, cfg, input_fingerprint="v1")
    assert res["em"].threshold_match == 0.95


def test_em_artifact_written(tmp_path):
    turns, _ = make_transcripts(n_entities=30, seed=23)
    ckpt = str(tmp_path / "ckpt")
    res = run_transcript_pipeline(
        ray.data.from_pandas(turns), ckpt, input_fingerprint="x"
    )
    import json

    with open(os.path.join(ckpt, "em", "artifact.json")) as f:
        art = json.load(f)
    assert art["number_of_comparisons"] == res["em"].number_of_comparisons
    assert art["converged"]
