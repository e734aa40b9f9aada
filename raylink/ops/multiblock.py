"""Multi-rule (OR) blocking: the union of several blocking rules' pairs.

Real ER deployments block on several rules at once — "same nation OR
(same segment AND same balance band)" — because no single key has full
recall.  The reference's config takes exactly one key set per run
(FastLink.jl runs one blocking pass; users union runs by hand), so this
op is the one-call version: candidate pairs from EVERY rule, deduplicated
to one row per pair, tagged with the lowest rule index that produced it.

Scale shape:

- each rule derives its own ``block_key`` (remixed with the rule index so
  blocks never collide across rules) and the per-rule datasets union
  LAZILY — records replicate once per rule, never more;
- hot blocks go through the same salt plan / cap machinery as the
  linkage pipeline (``plan_salts``), so one degenerate rule (a constant
  column) cannot produce an unbounded cell;
- cross-rule pair dedup is ONE shuffle of the candidate-pair ids (id
  pairs only — no payload travels), grouped by a 64-bit pair hash; the
  exact (id_a, id_b) dedup happens inside each hash group, so hash
  collisions cost nothing.  This shuffle is inherent to OR semantics:
  the same pair can surface in different blocks on different nodes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..config import BlockingConfig
from ..functions.hashing import hash64_array
from ..stages import blocking as bs
from ..stages.pairs import generate_pairs_dedupe, generate_pairs_link
from ..stages.sortedrun import sorted_group_scan

__all__ = ["multi_rule_pairs", "multi_rule_pairs_link"]


def _tag_rules(
    records: ray.data.Dataset, rules: list[list[str]]
) -> list[ray.data.Dataset]:
    """Per-rule block-keyed datasets: null rule columns excluded (SQL
    equi-join semantics), keys remixed with the rule index so blocks
    never collide across rules, ``rule`` column attached."""
    per_rule = []
    for i, rule in enumerate(rules):
        def keep_nonnull(batch: pa.Table, rule: tuple = tuple(rule)) -> pa.Table:
            mask = None
            for colname in rule:
                src = (
                    colname[8:-1]
                    if colname.startswith("soundex(") and colname.endswith(")")
                    else colname
                )
                v = pc.is_valid(batch.column(src))
                mask = v if mask is None else pc.and_(mask, v)
            return batch.filter(mask)

        ds_i = bs.derive_block_keys(
            records.map_batches(keep_nonnull, batch_format="pyarrow"), rule
        )

        def remix(batch: pa.Table, i: int = i) -> pa.Table:
            bk = batch.column("block_key").to_numpy(zero_copy_only=False)
            mixed = hash64_array(bk, seed=i + 1)
            batch = batch.drop_columns(["block_key"]).append_column(
                "block_key", pa.array(mixed, type=pa.uint64())
            )
            return batch.append_column(
                "rule", pa.array(np.full(len(bk), i, dtype=np.int64))
            )

        per_rule.append(ds_i.map_batches(remix, batch_format="pyarrow"))
    return per_rule


def _union_all(parts: list[ray.data.Dataset]) -> ray.data.Dataset:
    ds = parts[0]
    for other in parts[1:]:
        ds = ds.union(other)
    return ds


def _dedupe_pairs_min_rule(
    pairs: ray.data.Dataset,
    id_type_a: pa.DataType,
    id_type_b: pa.DataType,
    num_partitions: int,
) -> ray.data.Dataset:
    """One row per (id_a, id_b) tagged with the smallest producing rule.

    One shuffle of id-only pair rows grouped by a 64-bit pair hash; the
    exact dedup happens inside each hash group, so collisions cost
    nothing.  This shuffle is inherent to OR semantics: the same pair can
    surface in different blocks on different nodes.
    """

    def add_pair_hash(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        b = batch.column("id_b").to_numpy(zero_copy_only=False)
        # independent hash families per side; XOR would cancel symmetric
        # structure, addition keeps the pair key collision-resistant
        ph = hash64_array(a, seed=11) + hash64_array(b, seed=12)
        return pa.table(
            {
                "pair_h": pa.array(ph, type=pa.uint64()),
                "id_a": batch.column("id_a"),
                "id_b": batch.column("id_b"),
                "rule": batch.column("rule_a"),
            }
        )

    hashed = pairs.map_batches(add_pair_hash, batch_format="pyarrow")

    out_schema = pa.schema(
        [
            pa.field("id_a", id_type_a),
            pa.field("id_b", id_type_b),
            pa.field("rule", pa.int64()),
        ]
    )

    def group_fn(g: dict[str, np.ndarray]) -> dict:
        a = np.asarray(g["id_a"])
        b = np.asarray(g["id_b"])
        r = np.asarray(g["rule"], dtype=np.int64)
        order = np.lexsort((r, b, a))
        a, b, r = a[order], b[order], r[order]
        keep = np.ones(len(a), dtype=bool)
        keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return {"id_a": a[keep], "id_b": b[keep], "rule": r[keep]}

    def empty_fn(batch: dict[str, np.ndarray]) -> dict:
        return {
            "id_a": np.asarray(batch["id_a"])[:0],
            "id_b": np.asarray(batch["id_b"])[:0],
            "rule": np.array([], dtype=np.int64),
        }

    return sorted_group_scan(
        hashed,
        "pair_h",
        group_fn,
        empty_fn,
        num_partitions=num_partitions,
        out_schema=out_schema,
    )


def multi_rule_pairs(
    records: ray.data.Dataset,
    rules: list[list[str]],
    id_col: str,
    cap: int = 100_000,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Deduplicated self-link candidate pairs over the OR of ``rules``.

    Output: ``id_a`` < ``id_b`` (source id dtype) and ``rule`` (int64,
    the smallest rule index that blocked the pair together).
    """
    if not rules:
        raise ValueError("multi_rule_pairs needs at least one rule")
    # only the id rides the pair shuffle — blocking columns stay behind
    tagged = _union_all(
        [t.select_columns([id_col, "rule", "block_key"])
         for t in _tag_rules(records, rules)]
    )

    plan, bcount = bs.plan_salts(tagged, BlockingConfig(cap=cap))
    expanded = bs.expand_pair_groups(
        tagged,
        plan,
        id_col,
        side=None,
        dropped=set(bcount.notes.get("dropped_block_keys", [])),
    )
    pairs = generate_pairs_dedupe(expanded, ["rule"], id_col=id_col)

    from .canonical import pa_column_type

    id_type = pa_column_type(records, id_col)
    return _dedupe_pairs_min_rule(pairs, id_type, id_type, num_partitions)


def multi_rule_pairs_link(
    records_a: ray.data.Dataset,
    records_b: ray.data.Dataset,
    rules: list[list[str]],
    id_col: str,
    rules_b: list[list[str]] | None = None,
    cap: int = 100_000,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Deduplicated two-table candidate pairs over the OR of ``rules``.

    ``rules`` names the blocking columns on the A side; ``rules_b``
    (default: same names) on the B side — rule *i* joins A rows and B
    rows whose respective column tuples hash equal.  Both sides must
    carry ``id_col``.  Output: ``id_a`` (from A), ``id_b`` (from B),
    ``rule`` (int64, the smallest rule index that blocked the pair).

    Same scale shape as :func:`multi_rule_pairs`; the salt plan is
    computed over the UNION of both sides' block keys so a block hot on
    either side gets salted.
    """
    if not rules:
        raise ValueError("multi_rule_pairs_link needs at least one rule")
    if rules_b is not None and len(rules_b) != len(rules):
        raise ValueError("rules_b must pair up with rules one-to-one")
    # project both sides to one minimal schema (the two tables' own
    # columns differ) — only the id rides the pair shuffle
    tagged_a = _union_all(
        [t.select_columns([id_col, "rule", "block_key"])
         for t in _tag_rules(records_a, rules)]
    )
    tagged_b = _union_all(
        [t.select_columns([id_col, "rule", "block_key"])
         for t in _tag_rules(records_b, rules_b or rules)]
    )

    both_keys = tagged_a.select_columns(["block_key"]).union(
        tagged_b.select_columns(["block_key"])
    )
    plan, bcount = bs.plan_salts(both_keys, BlockingConfig(cap=cap))
    dropped = set(bcount.notes.get("dropped_block_keys", []))

    def tag(side: str):
        def fn(b: pa.Table) -> pa.Table:
            return b.append_column("_side", pa.array([side] * len(b)))

        return fn

    ea = bs.expand_pair_groups(
        tagged_a.map_batches(tag("a"), batch_format="pyarrow"),
        plan, id_col, side="a", dropped=dropped,
    )
    eb = bs.expand_pair_groups(
        tagged_b.map_batches(tag("b"), batch_format="pyarrow"),
        plan, id_col, side="b", dropped=dropped,
    )
    # a cell only ever contains one rule's rows (keys are remixed with the
    # rule index), so the pair's rule_a == rule_b by construction
    pairs = generate_pairs_link(ea.union(eb), ["rule"], id_col=id_col)

    from .canonical import pa_column_type

    return _dedupe_pairs_min_rule(
        pairs,
        pa_column_type(records_a, id_col),
        pa_column_type(records_b, id_col),
        num_partitions,
    )
