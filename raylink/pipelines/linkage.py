"""End-to-end Fellegi–Sunter linkage pipelines (link and dedupe).

Composition (one Dataset flowing through; cf. the reference lifecycle
/root/reference/src/fastlink/fastlink.jl:14-129 and SURVEY.md §3.4)::

    records ─ derive block keys (map_batches, vectorized hash)
            ─ salt plan (groupby-count, hot keys only -> driver, broadcast)
            ─ expand into salted pair-group cells (map_batches)
            ─ pair generation (groupby(pg_key).map_groups, vectorized)
            ─ gamma scoring (stateful actor pool, map_batches)
            ─ pattern histogram (partial counts + groupby-sum)  [driver-small]
            ─ EM fit (+ hierarchical comparisons)               [driver]
            ─ match filter (broadcast matched patterns)
            ─ connected components (dedupe only)

Hierarchy note: the reference runs nested comparisons deepest-first, each
child EM collapsing into a virtual variable of its parent
(patterns.jl:232-259).  Because a pair's full leaf gamma vector determines
every child's gamma, the entire (non-tf) hierarchy reduces to driver-side
arithmetic on the leaf-pattern histogram — no extra distributed passes.
Child collapse thresholds ``sigmoid(weights) >= threshold_match`` in natural
log, exactly ``get_match_patternids(...; base="log")`` (patterns.jl:143-153
called from :216).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd

import ray.data

from ..config import ComparisonConfig, LinkConfig, VarConfig
from ..constants import MATCH2, NONMATCH
from ..stages import blocking as blocking_stage
from ..stages.cluster import connected_components
from ..stages.em import EMResult, em_fit
from ..stages.matches import get_matches
from ..stages.patterns import (
    add_residual_pattern,
    merge_histograms,
    pattern_histogram,
    sample_residual_histogram,
    unpack_patterns,
)
from ..stages.scoring import score_pairs
from ..stages import pairs as pairs_stage
from ..stages.tf import add_tf_columns, apply_tf_adjustment

__all__ = [
    "LinkResult",
    "dedupe_records",
    "link_records",
    "link_and_dedupe_records",
    "run_linkage",
    "fit_patterns",
]


@dataclass
class LinkResult:
    """Pipeline output bundle (the reference returns a Dict,
    fastlink.jl:119-128; ours keeps big things as Datasets)."""

    em: EMResult  # root-level EM fit
    child_ems: dict[str, EMResult]
    leaf_patterns: pd.DataFrame  # pattern_key, cnt, zeta_j, weights (leaf level)
    matches: ray.data.Dataset  # id_a, id_b, gamma_*, pattern_key, zeta_j
    scored_pairs: ray.data.Dataset
    clusters: ray.data.Dataset | None
    tf_matches: ray.data.Dataset | None = None  # per-pair tf-adjusted posteriors
    counters: dict[str, Any] = field(default_factory=dict)


def fit_patterns(
    hist: pd.DataFrame, config: LinkConfig, seed: int = 1234
) -> tuple[EMResult, dict[str, EMResult], pd.DataFrame]:
    """EM over a leaf-pattern histogram, resolving nested comparisons.

    Returns (root EMResult, child EMResults by name, leaf table with
    per-leaf-pattern zeta_j / weights for match filtering).
    """
    leaf_vars = config.leaf_vars()
    leaf_names = [v.name for v in leaf_vars]
    bit_pos = {n: k for k, n in enumerate(leaf_names)}
    keys = hist["pattern_key"].to_numpy(np.int64)
    # counts stay float64: sample_residual_histogram / merge_histograms yield
    # fractional pattern counts (em.py:231-234 documents the float64-count
    # design); an int64 cast here would truncate them, break the
    # sum(counts)==total_comparisons conservation, and can zero out small
    # fractional patterns (a gamma level observed ONLY in zeroed patterns
    # gets p_m/p_u of 0 and (-inf)-(-inf) NaN zeta paths in EM).
    counts = hist["cnt"].to_numpy(np.float64)
    leaf_gammas = unpack_patterns(keys, len(leaf_names))  # (P, K)
    n_comparisons = int(round(float(counts.sum())))

    # virtual gamma per processed child node, aligned to leaf patterns
    virtual: dict[str, np.ndarray] = {}
    child_ems: dict[str, EMResult] = {}
    root = config.comparisons
    root_em: EMResult | None = None
    root_cols: list[np.ndarray] = []

    for level in config.levels():
        for node in level:
            cols: list[np.ndarray] = []
            names: list[str] = []
            for v in node.variables:
                if isinstance(v, ComparisonConfig):
                    cols.append(virtual[v.name])
                    names.append(v.name)
                else:
                    cols.append(leaf_gammas[:, bit_pos[v.name]])
                    names.append(v.name)
            mat = np.column_stack(cols).astype(np.uint8)
            # aggregate leaf histogram to this node's patterns
            uniq, inv = np.unique(mat, axis=0, return_inverse=True)
            node_counts = np.zeros(len(uniq), dtype=np.float64)
            np.add.at(node_counts, inv, counts)
            em = em_fit(
                uniq,
                node_counts,
                n_comparisons,
                names,
                pattern_keys=np.arange(len(uniq), dtype=np.int64),
                seed=seed,
                **node.em_kwargs(),
            )
            if node is root:
                root_em = em
                root_inv = inv
                root_cols = cols
            else:
                child_ems[node.name] = em
                w = em.patterns_w["weights"].to_numpy(np.float64)
                node_tf = [
                    x.name
                    for x in node.leaf_vars()
                    if isinstance(x, VarConfig) and x.tf_adjust
                ]
                if node_tf:
                    # tf-var child collapse at PATTERN level: this
                    # histogram-only function cannot see per-pair tf
                    # values.  run_linkage routes nested-tf configs to
                    # pipelines/nested_tf.py (the faithful per-pair
                    # patterns_to_DiBit semantics); this branch only runs
                    # for direct fit_patterns callers, so warn.
                    import warnings

                    warnings.warn(
                        f"comparison node {node.name!r} nests tf_adjust "
                        f"variables {node_tf}: fit_patterns collapses at "
                        "pattern level (the log(p_m/p_u) prior included, "
                        "the per-pair tf term omitted) — use run_linkage "
                        "for the faithful per-pair path "
                        "(raylink/pipelines/nested_tf.py)",
                        UserWarning,
                        stacklevel=2,
                    )
                    prior = np.log(em.p_m / em.p_u)
                    wt = w + prior
                    is_match = (np.exp(wt) / (1 + np.exp(wt))) >= node.threshold_match
                else:
                    # no-tf child collapse: sigmoid(natural-log weight) >=
                    # threshold, exactly get_match_patternids(base="log")
                    # (patterns.jl:143-153 called from :216)
                    is_match = (np.exp(w) / (1 + np.exp(w))) >= node.threshold_match
                virtual[node.name] = np.where(
                    is_match[inv], MATCH2, NONMATCH
                ).astype(np.uint8)

    assert root_em is not None
    zeta_root = root_em.patterns_w["zeta_j"].to_numpy(np.float64)
    weights_root = root_em.patterns_w["weights"].to_numpy(np.float64)
    weights_raw_root = root_em.patterns_w["weights_raw"].to_numpy(np.float64)
    leaf = pd.DataFrame(
        {
            "pattern_key": keys,
            "cnt": counts,
            "zeta_j": zeta_root[root_inv],
            "weights": weights_root[root_inv],
            "weights_raw": weights_raw_root[root_inv],
        }
    )
    return root_em, child_ems, leaf


def _leaf_em_for_matches(em: EMResult, leaf: pd.DataFrame) -> EMResult:
    """An EMResult-shaped view whose patterns_w is keyed by LEAF pattern_key
    (what scored pairs carry), for the broadcast match filter."""
    import copy

    shim = copy.copy(em)
    shim.patterns_w = leaf
    return shim


def _run_common(
    scored: ray.data.Dataset,
    config: LinkConfig,
    total_comparisons: int,
    counters: dict[str, Any],
    seed: int,
    sample_a: pd.DataFrame | None = None,
    sample_b: pd.DataFrame | None = None,
) -> tuple[
    EMResult, dict[str, EMResult], pd.DataFrame, ray.data.Dataset, dict
]:
    hist = pattern_histogram(scored)
    counters["scored_pairs"] = int(hist["cnt"].sum())
    counters["unique_leaf_patterns"] = len(hist)
    residual = total_comparisons - float(hist["cnt"].sum())
    if sample_a is not None and residual > 0:
        # estimate the pruned-pair pattern distribution from a random
        # cross-block sample (preserves per-variable u-probabilities)
        res_hist = sample_residual_histogram(
            sample_a,
            sample_b if sample_b is not None else sample_a,
            config.leaf_vars(),
            residual,
            seed=seed + 1,
        )
        counters["residual_mode"] = "sampled"
    elif residual > 0:
        res_hist = pd.DataFrame(
            {"pattern_key": [0], "cnt": [float(residual)]}
        )
        counters["residual_mode"] = "all_nonmatch"
    else:
        if residual < 0:
            raise ValueError(
                f"scored pairs exceed total comparisons "
                f"({total_comparisons}); duplicate candidate pairs upstream?"
            )
        res_hist = None
        counters["residual_mode"] = "none"
    counters["residual_pairs"] = residual

    from .nested_tf import fit_patterns_per_pair, has_nested_tf

    if has_nested_tf(config):
        # faithful per-pair child collapse (the reference's
        # patterns_to_DiBit semantics): tf-adjusted child decisions are
        # per pair, so parent patterns — and the root EM — are built
        # from per-pair virtual gammas, not from the leaf histogram
        counters["nested_tf_mode"] = "per_pair"
        root_em, child_ems, root_patterns, scored_rk = fit_patterns_per_pair(
            scored, res_hist, config, total_comparisons, seed=seed
        )
        matches = get_matches(
            scored_rk, _leaf_em_for_matches(root_em, root_patterns)
        )
        root = config.comparisons
        tf_plan = {
            "all_vars": list(root.variables),
            "tf_vars": [
                v
                for v in root.variables
                if not isinstance(v, ComparisonConfig) and v.tf_adjust
            ],
            "patterns": root_patterns,
        }
        return root_em, child_ems, root_patterns, matches, tf_plan

    if res_hist is not None:
        hist = (
            merge_histograms(hist, res_hist)
            if counters["residual_mode"] == "sampled"
            else add_residual_pattern(hist, total_comparisons)
        )
    root_em, child_ems, leaf = fit_patterns(hist, config, seed=seed)
    matches = get_matches(scored, _leaf_em_for_matches(root_em, leaf))
    tf_plan = {
        "all_vars": config.leaf_vars(),
        "tf_vars": [v for v in config.leaf_vars() if v.tf_adjust],
        "patterns": leaf,
    }
    return root_em, child_ems, leaf, matches, tf_plan


def dedupe_records(
    records: ray.data.Dataset,
    config: LinkConfig,
    id_col: str,
    block_keys: list[str] | None = None,
    precomputed_block_key: bool = False,
    block_rules: list[list[str]] | None = None,
    cluster: bool = True,
    seed: int = 1234,
) -> LinkResult:
    """Self-link (dedupe) a record Dataset per the match configuration.

    ``records`` must carry ``id_col``, every leaf comparison column, and —
    unless ``precomputed_block_key`` — the ``block_keys`` columns.

    ``block_rules`` (mutually exclusive with the other blocking args)
    enables multi-pass OR blocking: candidate pairs come from the union
    of several blocking rules, each pair scored exactly once via the
    in-cell min-rule suppression in :mod:`raylink.ops.multiblock` —
    no single key has full recall, so production ER runs several
    (the reference runs one pass per config; its users union by hand).
    Rule keys hash the RAW column values (same as the single-key path,
    which derives ``block_key`` before case-normalization).
    """
    counters: dict[str, Any] = {}
    n = records.count()
    counters["records"] = n
    total_comparisons = n * (n - 1) // 2

    if block_rules is None and config.blocking.rules:
        block_rules = config.blocking.rules
    leaf_fields = [v.name for v in config.leaf_vars()]
    if block_rules:
        if precomputed_block_key or block_keys:
            raise ValueError(
                "block_rules is mutually exclusive with block_keys / "
                "precomputed_block_key"
            )
        from ..ops.multiblock import _with_rule_keys

        # rk_j columns derived from raw values here; the rule source
        # columns themselves are dropped before normalization/shuffle
        records = _with_rule_keys(
            records, block_rules, id_col, keep_cols=tuple(leaf_fields)
        )
    elif config.blocking.snm_key:
        if precomputed_block_key or block_keys:
            raise ValueError(
                "blocking.snm_key is mutually exclusive with block_keys /"
                " precomputed_block_key"
            )
        # keep the sort key alongside ids + comparison fields; the key
        # is usually itself a leaf field, in which case this is a no-op
        records = records.select_columns(
            list(
                dict.fromkeys(
                    [id_col, *leaf_fields, config.blocking.snm_key]
                )
            )
        )
    else:
        if not precomputed_block_key:
            keys = block_keys or config.blocking.keys
            if not keys:
                raise ValueError(
                    "dedupe requires blocking keys (or a block_key column)"
                )
            records = blocking_stage.derive_block_keys(records, keys)
        # prune to what pair rows need BEFORE the shuffle: ids + comparison
        # fields + block key (wide payloads like full_text stay out)
        records = records.select_columns(
            list(dict.fromkeys([id_col, *leaf_fields, "block_key"]))
        )
    # case-normalize ONCE on records (O(records)), not per pair row in the
    # scorer (O(pairs), both sides)
    from ..stages.scoring import normalize_upper

    records, scored_vars = normalize_upper(records, config.leaf_vars())
    tf_vars = [v for v in scored_vars if v.tf_adjust]
    if tf_vars:
        records = add_tf_columns(records, tf_vars, n)
    records = records.materialize()
    leaf_vars = scored_vars
    fields = [v.name for v in leaf_vars]
    tf_cols = [f"tf_{v.name}" for v in tf_vars]
    try:
        import pyarrow as _pa

        src_schema = getattr(records.schema(), "base_schema", None)
        if not isinstance(src_schema, _pa.Schema):
            src_schema = None
    except Exception:
        src_schema = None
    if block_rules:
        from ..ops.canonical import pa_column_type
        from ..ops.multiblock import multi_rule_pairs_from_keyed

        ftypes = (
            {f: src_schema.field(f).type for f in fields + tf_cols}
            if src_schema is not None
            else None
        )
        pairs, bcount = multi_rule_pairs_from_keyed(
            records,
            len(block_rules),
            id_col,
            pa_column_type(records, id_col),
            config.blocking,
            fields=tuple(fields + tf_cols),
            field_types=ftypes,
            num_partitions=config.execution.pair_shuffle_partitions,
        )
    elif config.blocking.snm_key:
        # sorted-neighborhood candidates: linear pair count, no salting
        # needed (window size bounds every record's candidates)
        pairs = pairs_stage.generate_pairs_snm(
            records,
            fields + tf_cols,
            id_col=id_col,
            key_col=config.blocking.snm_key,
            window=config.blocking.snm_window,
            num_partitions=config.execution.pair_shuffle_partitions,
            source_schema=src_schema,
        )
        bcount = blocking_stage.BlockingCounters()
    else:
        plan, bcount, block_counts = blocking_stage.analyze_blocks(
            records, config.blocking
        )
        # singleton blocks generate no pairs — drop them pre-shuffle
        paired_records = blocking_stage.filter_to_multi_blocks(
            records, counts=block_counts
        )
        expanded = blocking_stage.expand_pair_groups(
            paired_records, plan, id_col, side=None,
            dropped=set(bcount.notes.get("dropped_block_keys", [])),
        )
        pairs = pairs_stage.generate_pairs_dedupe(
            expanded, fields + tf_cols, id_col=id_col, source_schema=src_schema
        )
    counters["hot_blocks"] = bcount.n_hot_blocks
    counters["dropped_blocks"] = bcount.n_dropped_blocks
    counters["dropped_rows"] = bcount.dropped_rows
    scored = score_pairs(
        pairs,
        leaf_vars,
        concurrency=config.execution.scorer_concurrency,
        batch_size=config.execution.scorer_batch_size,
        passthrough=[f"{c}_{side}" for c in tf_cols for side in ("a", "b")],
    ).materialize()

    # small deterministic record sample for residual u-estimation —
    # id-hash based so a resumed/re-parallelized run draws the same rows
    from ..stages.sampling import deterministic_sample

    frac = min(1.0, 2000 / max(n, 1))
    sample = deterministic_sample(records, id_col, frac, seed=seed).to_pandas()
    root_em, child_ems, leaf, matches, tf_plan = _run_common(
        scored, config, total_comparisons, counters, seed, sample_a=sample
    )
    matches = matches.materialize()
    counters["matched_pairs"] = matches.count()
    tf_matches = None
    if tf_plan["tf_vars"]:
        tf_matches = apply_tf_adjustment(
            matches, root_em, tf_plan["patterns"],
            tf_plan["all_vars"], tf_plan["tf_vars"],
        )

    clusters = None
    if cluster:
        nodes = records.select_columns([id_col]).map_batches(
            lambda b: b.rename_columns(["node"]), batch_format="pyarrow"
        )
        clusters = connected_components(
            matches,
            nodes,
            node_col="node",
            src_col="id_a",
            dst_col="id_b",
            local_threshold=config.execution.cc_local_threshold,
            num_partitions=config.execution.cc_num_partitions,
        )

    return LinkResult(
        em=root_em,
        child_ems=child_ems,
        leaf_patterns=leaf,
        matches=matches,
        scored_pairs=scored,
        clusters=clusters,
        tf_matches=tf_matches,
        counters=counters,
    )


def link_records(
    records_a: ray.data.Dataset,
    records_b: ray.data.Dataset,
    config: LinkConfig,
    block_keys: list[str] | None = None,
    block_rules: list[list[str]] | None = None,
    block_rules_b: list[list[str]] | None = None,
    em: "EMResult | None" = None,
    seed: int = 1234,
) -> LinkResult:
    """Two-table link (the reference's only implemented mode).

    ``block_rules`` (+ optional per-B-side ``block_rules_b`` column
    names) enables multi-pass OR blocking, same semantics as
    :func:`dedupe_records`: pairs from the union of the rules, each
    scored exactly once via in-cell min-rule suppression.

    ``em`` switches to APPLY mode — incremental linkage: block + score
    as usual, then match with the supplied fitted model's parameters
    (``stages.matches.apply_em``) instead of refitting.  Fit once on a
    corpus, then link every new record batch against it without paying
    the EM again; flat (non-nested, non-tf) configs only.
    """
    if em is not None and (
        len(config.levels()) > 1
        or any(v.tf_adjust for v in config.leaf_vars())
    ):
        raise NotImplementedError(
            "apply-mode link (em=...) supports flat non-tf configs; nested "
            "or tf-adjusted models fold per-pair state the apply pass does "
            "not carry"
        )
    counters: dict[str, Any] = {}
    n_a = records_a.count()
    n_b = records_b.count()
    counters["records_a"] = n_a
    counters["records_b"] = n_b
    total_comparisons = n_a * n_b

    if block_rules is None and config.blocking.rules:
        block_rules = config.blocking.rules
    id_a_col, id_b_col = config.idvar

    leaf_vars = config.leaf_vars()
    fields = [v.name for v in leaf_vars]

    import pyarrow as pa

    def tag(side: str):
        def fn(b: pa.Table) -> pa.Table:
            return b.append_column("_side", pa.array([side] * len(b)))

        return fn

    tf_vars = [v for v in leaf_vars if v.tf_adjust]
    tf_cols = [f"tf_{v.name}" for v in tf_vars]
    if block_rules:
        if block_keys:
            raise ValueError("block_rules is mutually exclusive with block_keys")
        from ..ops.multiblock import _with_rule_keys

        da = _with_rule_keys(
            records_a, block_rules, id_a_col, keep_cols=tuple(fields)
        )
        db = _with_rule_keys(
            records_b, block_rules_b or block_rules, id_b_col,
            keep_cols=tuple(fields),
        )
    elif config.blocking.snm_key:
        if block_keys:
            raise ValueError(
                "blocking.snm_key is mutually exclusive with block_keys"
            )
        da = records_a.select_columns(
            list(
                dict.fromkeys(
                    [id_a_col, *fields, config.blocking.snm_key]
                )
            )
        )
        db = records_b.select_columns(
            list(
                dict.fromkeys(
                    [id_b_col, *fields, config.blocking.snm_key]
                )
            )
        )
    else:
        keys = block_keys or config.blocking.keys
        if not keys:
            raise ValueError("link requires blocking keys")
        da = blocking_stage.derive_block_keys(records_a, keys).select_columns(
            list(dict.fromkeys([id_a_col, *fields, "block_key"]))
        )
        db = blocking_stage.derive_block_keys(records_b, keys).select_columns(
            list(dict.fromkeys([id_b_col, *fields, "block_key"]))
        )
    # case-normalize ONCE per table, not per pair row in the scorer
    from ..stages.scoring import normalize_upper

    da, leaf_vars = normalize_upper(da, leaf_vars)
    db, _ = normalize_upper(db, config.leaf_vars())
    tf_vars = [v for v in leaf_vars if v.tf_adjust]
    if tf_vars:
        # per-table frequency tables (the reference's tf_table_x / tf_table_y)
        da = add_tf_columns(da, tf_vars, n_a)
        db = add_tf_columns(db, tf_vars, n_b)
    da = da.materialize()
    db = db.materialize()
    try:
        base_a = getattr(da.schema(), "base_schema", None)
        base_b = getattr(db.schema(), "base_schema", None)
        if not isinstance(base_a, pa.Schema):
            base_a = None
        if not isinstance(base_b, pa.Schema):
            base_b = None
        src_schema = None
        if base_a is not None and base_b is not None and (
            base_a.field(id_a_col).type == base_b.field(id_b_col).type
        ):
            src_schema = pa.schema(
                [
                    pa.field(
                        "_pair_id" if f.name == id_a_col else f.name, f.type
                    )
                    for f in base_a
                ]
            )
    except Exception:
        src_schema = None
    if block_rules:
        from ..ops.canonical import pa_column_type
        from ..ops.multiblock import multi_rule_pairs_link_from_keyed

        ftypes = (
            {f: src_schema.field(f).type for f in fields + tf_cols}
            if src_schema is not None
            else None
        )
        pairs, bcount = multi_rule_pairs_link_from_keyed(
            da,
            db,
            len(block_rules),
            id_a_col,
            id_b_col,
            pa_column_type(da, id_a_col),
            config.blocking,
            fields=tuple(fields + tf_cols),
            field_types=ftypes,
            num_partitions=config.execution.pair_shuffle_partitions,
        )
        counters["hot_blocks"] = bcount.n_hot_blocks
    elif config.blocking.snm_key:
        # multi-source sorted-neighborhood: both tables merge into one
        # sorted order; only cross-table window pairs are emitted
        pairs = pairs_stage.generate_pairs_snm_link(
            da,
            db,
            fields + tf_cols,
            id_a_col=id_a_col,
            id_b_col=id_b_col,
            key_col=config.blocking.snm_key,
            window=config.blocking.snm_window,
            num_partitions=config.execution.pair_shuffle_partitions,
            source_schema=src_schema,
        )
        counters["hot_blocks"] = 0
    else:
        # the salt plan must see combined block populations
        both_keys = da.select_columns(["block_key"]).union(
            db.select_columns(["block_key"])
        )
        plan, bcount = blocking_stage.plan_salts(both_keys, config.blocking)
        counters["hot_blocks"] = bcount.n_hot_blocks
        dropped = set(bcount.notes.get("dropped_block_keys", []))

        ea = blocking_stage.expand_pair_groups(
            da.map_batches(tag("a"), batch_format="pyarrow"),
            plan, id_a_col, side="a", dropped=dropped,
        )
        eb = blocking_stage.expand_pair_groups(
            db.map_batches(tag("b"), batch_format="pyarrow"),
            plan, id_b_col, side="b", dropped=dropped,
        )
        # unify the id column name for pair generation
        def rename_id(b: pa.Table) -> pa.Table:
            names = [
                ("_pair_id" if c == id_b_col else c) for c in b.column_names
            ]
            return b.rename_columns(names)

        def rename_id_a(b: pa.Table) -> pa.Table:
            names = [
                ("_pair_id" if c == id_a_col else c) for c in b.column_names
            ]
            return b.rename_columns(names)

        expanded = ea.map_batches(rename_id_a, batch_format="pyarrow").union(
            eb.map_batches(rename_id, batch_format="pyarrow")
        )
        pairs = pairs_stage.generate_pairs_link(
            expanded, fields + tf_cols, id_col="_pair_id",
            source_schema=src_schema,
        )
    scored = score_pairs(
        pairs,
        leaf_vars,
        concurrency=config.execution.scorer_concurrency,
        batch_size=config.execution.scorer_batch_size,
        passthrough=[f"{c}_{side}" for c in tf_cols for side in ("a", "b")],
    ).materialize()

    if em is not None:  # apply mode: match with the supplied fit, no refit
        from ..stages.matches import apply_em

        matches = apply_em(
            scored, em, threshold=config.comparisons.threshold_match
        ).materialize()
        counters["matched_pairs"] = matches.count()
        return LinkResult(
            em=em,
            child_ems={},
            leaf_patterns=em.patterns_w,
            matches=matches,
            scored_pairs=scored,
            clusters=None,
            tf_matches=None,
            counters=counters,
        )

    from ..stages.sampling import deterministic_sample

    frac_a = min(1.0, 1000 / max(n_a, 1))
    frac_b = min(1.0, 1000 / max(n_b, 1))
    sample_a = deterministic_sample(da, id_a_col, frac_a, seed=seed).to_pandas()
    sample_b = deterministic_sample(
        db, id_b_col, frac_b, seed=seed + 1
    ).to_pandas()
    root_em, child_ems, leaf, matches, tf_plan = _run_common(
        scored, config, total_comparisons, counters, seed,
        sample_a=sample_a, sample_b=sample_b,
    )
    matches = matches.materialize()
    counters["matched_pairs"] = matches.count()
    tf_matches = None
    if tf_plan["tf_vars"]:
        tf_matches = apply_tf_adjustment(
            matches, root_em, tf_plan["patterns"],
            tf_plan["all_vars"], tf_plan["tf_vars"],
        )

    return LinkResult(
        em=root_em,
        child_ems=child_ems,
        leaf_patterns=leaf,
        matches=matches,
        scored_pairs=scored,
        clusters=None,
        tf_matches=tf_matches,
        counters=counters,
    )


def link_and_dedupe_records(
    records_a: ray.data.Dataset,
    records_b: ray.data.Dataset,
    config: LinkConfig,
    block_keys: list[str] | None = None,
    cluster: bool = True,
    seed: int = 1234,
) -> LinkResult:
    """The reference's declared-but-unimplemented ``link_and_dedupe`` mode
    (/root/reference/README.md:26; its engine only ships link_only,
    fastlink.jl:20): dedupe WITHIN each table and link BETWEEN them in one
    pass, realized as a self-link over the tagged union A ∪ B.

    Record ids are namespaced ``A:<id>`` / ``B:<id>`` so the union id space
    is collision-free; the matched pairs gain a ``pair_type`` column
    (``within_a`` / ``within_b`` / ``between``) recovered from the tags.
    All of blocking, scoring, EM and clustering reuse the dedupe stages
    unchanged.
    """
    import pyarrow.compute as pc

    id_a_col, id_b_col = config.idvar

    def tag(prefix: str, idc: str):
        def fn(b: pa.Table) -> pa.Table:
            uid = pc.binary_join_element_wise(
                pa.array([prefix] * len(b)),
                pc.cast(b.column(idc), pa.string()),
                ":",
            )
            return b.append_column("_uid", uid)

        return fn

    import pyarrow as pa

    da = records_a.map_batches(tag("A", id_a_col), batch_format="pyarrow")
    db = records_b.map_batches(tag("B", id_b_col), batch_format="pyarrow")
    fields = [v.name for v in config.leaf_vars()]
    keys = block_keys or config.blocking.keys
    # multi-rule configs route through dedupe_records' block_rules path —
    # keep the rule source columns through the projection
    from ..ops.multiblock import _strip_soundex

    rule_srcs = [
        _strip_soundex(c)[0]
        for rule in (config.blocking.rules or [])
        for c in rule
    ]
    key_srcs = [_strip_soundex(c)[0] for c in (keys or [])]
    snm_cols = [config.blocking.snm_key] if config.blocking.snm_key else []
    cols = list(
        dict.fromkeys(["_uid", *fields, *key_srcs, *rule_srcs, *snm_cols])
    )
    both = da.select_columns(cols).union(db.select_columns(cols))
    res = dedupe_records(
        both, config, "_uid", block_keys=block_keys, cluster=cluster, seed=seed
    )

    def typed(b: pa.Table) -> pa.Table:
        ta = pc.utf8_slice_codeunits(pc.cast(b.column("id_a"), pa.string()), 0, 1)
        tb = pc.utf8_slice_codeunits(pc.cast(b.column("id_b"), pa.string()), 0, 1)
        same = pc.equal(ta, tb)
        is_a = pc.equal(ta, pa.scalar("A"))
        pair_type = pc.if_else(
            same,
            pc.if_else(is_a, pa.scalar("within_a"), pa.scalar("within_b")),
            pa.scalar("between"),
        )
        return b.append_column("pair_type", pair_type)

    res.matches = res.matches.map_batches(typed, batch_format="pyarrow")
    return res


def run_linkage(
    config: LinkConfig,
    records_a: ray.data.Dataset,
    records_b: ray.data.Dataset | None = None,
    **kwargs,
) -> LinkResult:
    """Dispatch on the config's ``link_type`` (the reference schema's three
    declared modes, /root/reference/README.md:24-27)."""
    if config.link_type == "link_only":
        if records_b is None:
            raise ValueError("link_only requires two tables")
        return link_records(records_a, records_b, config, **kwargs)
    if config.link_type == "dedupe_only":
        id_col = config.idvar[0]
        return dedupe_records(records_a, config, id_col, **kwargs)
    if config.link_type == "link_and_dedupe":
        if records_b is None:
            raise ValueError("link_and_dedupe requires two tables")
        return link_and_dedupe_records(records_a, records_b, config, **kwargs)
    raise ValueError(f"unknown link_type {config.link_type!r}")
