"""Benchmark harness.

Runs the headline transcript-linkage pipeline plus representative operator
benchmarks over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) with
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS)`` (default 32), and
prints ONE JSON line::

    {"metric": "e2e_seconds", "value": N, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

``--scaling`` runs the headline pipeline twice in fresh subprocesses at
num_cpus=8 and num_cpus=32 on the same input and reports both throughputs
plus scaling efficiency = (T32/T8) / (32/8)  (T = scored pairs/sec) — the
sandbox stand-in for the N vs 4N node criterion (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _sf_label(sf_dir: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def _transcript_cache(n_entities: int, hot: int, seed: int = 42) -> str:
    """Generate (once) and cache the deterministic synthetic transcript
    parquet for this scale under /tmp."""
    path = f"/tmp/raylink_bench/transcripts_e{n_entities}_h{hot}_s{seed}"
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        os.makedirs(path, exist_ok=True)
        from raylink.sources.synth import make_transcripts

        turns, truth = make_transcripts(
            n_entities=n_entities, seed=seed, hot_block_convs=hot
        )
        # small row groups so the read parallelizes (a single giant row
        # group caps read fan-out at 1-2 tasks)
        turns.to_parquet(os.path.join(path, "turns.parquet"), row_group_size=65536)
        truth.to_parquet(os.path.join(path, "truth.parquet"), row_group_size=65536)
        with open(marker, "w") as f:
            f.write("ok")
    return path


def _headline_scale(sf_dir: str) -> tuple[int, int]:
    """Scale the synthetic transcript corpus with the sf dir."""
    sf = _sf_label(sf_dir)
    n_entities = max(int(1_600_000 * sf), 200)
    # hot block capped: its pair count grows quadratically and would
    # otherwise swamp the signal (and the CC stage) at large sf
    return n_entities, min(max(n_entities // 50, 20), 1200)


def run_headline(sf_dir: str) -> dict:
    import shutil

    import ray
    import ray.data

    from raylink.pipelines.transcripts import run_transcript_pipeline

    n_entities, hot = _headline_scale(sf_dir)
    data_dir = _transcript_cache(n_entities, hot)
    turns = ray.data.read_parquet(os.path.join(data_dir, "turns.parquet"))
    n_turns = turns.count()
    ckpt = f"/tmp/raylink_bench/ckpt_{n_entities}_{NUM_CPUS}_{int(time.time())}"
    t0 = time.time()
    res = run_transcript_pipeline(
        turns, ckpt, input_fingerprint=f"bench-{n_entities}"
    )
    n_clusters = res["clusters"].count()
    wall = time.time() - t0
    scored = float(res["counters"]["scored_pairs"])
    out = {
        "n_turns": int(n_turns),
        "n_conversations": int(res["counters"]["records"]),
        "scored_pairs": scored,
        "matched_pairs": int(res["counters"]["matched_pairs"]),
        "n_cluster_rows": int(n_clusters),
        "hot_blocks": int(res["counters"]["hot_blocks"]),
        "wall_seconds": round(wall, 3),
        "pairs_per_sec": round(scored / wall, 1),
        "turns_per_sec": round(n_turns / wall, 1),
    }
    shutil.rmtree(ckpt, ignore_errors=True)
    return out


def run_op_benchmarks(sf_dir: str) -> dict[str, float]:
    """Per-op wall seconds over the real testdata tables."""
    import __ray_entry__ as entrymod

    chosen = [
        "exact_dedup_docs",
        "minhash_dedup",
        "simhash_dedup",
        "band_join_events",
        "pattern_histogram_customer",
        "gamma_jw_supplier",
        "ann_topk",
        "lineitem_pricing",
        "orders_by_segment",
        "sessionize_events",
        "cluster_exact_dups",
        "token_counts",
    ]
    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in chosen:
        t0 = time.time()
        obj = qs[name](sf_dir)
        # force execution
        if hasattr(obj, "count") and not hasattr(obj, "shape"):
            obj.count()
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    args = sys.argv[1:]
    if "--scaling" in args:
        run_scaling()
        return
    headline_only = "--headline-only" in args

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=NUM_CPUS, include_dashboard=False
        )
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    headline = run_headline(SF_DIR)
    queries = {} if headline_only else run_op_benchmarks(SF_DIR)
    total = headline["wall_seconds"] + sum(queries.values())
    result = {
        "metric": "e2e_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {"headline_linkage": headline["wall_seconds"], **queries},
        "sf": _sf_label(SF_DIR),
        "num_cpus": NUM_CPUS,
        "headline": headline,
    }
    print(json.dumps(result))
    ray.shutdown()


def run_scaling() -> None:
    """Two fresh-process runs at num_cpus=8 and 32; report efficiency."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ)
        env["RAY_GRAFT_CPUS"] = str(cpus)
        env["GRAFT_SF_DIR"] = SF_DIR
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--headline-only"],
            capture_output=True,
            text=True,
            env=env,
            timeout=3600,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    t8 = results[8]["headline"]["pairs_per_sec"]
    t32 = results[32]["headline"]["pairs_per_sec"]
    efficiency = (t32 / t8) / (32 / 8)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(efficiency, 4),
                "unit": "ratio",
                "queries": {
                    "pairs_per_sec_8cpu": t8,
                    "pairs_per_sec_32cpu": t32,
                    "wall_8cpu": results[8]["headline"]["wall_seconds"],
                    "wall_32cpu": results[32]["headline"]["wall_seconds"],
                },
                "sf": _sf_label(SF_DIR),
                "num_cpus": 32,
            }
        )
    )


if __name__ == "__main__":
    main()
