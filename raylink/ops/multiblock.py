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
from ..stages.pairs import generate_pairs_dedupe
from ..stages.sortedrun import sorted_group_scan

__all__ = ["multi_rule_pairs"]


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
    per_rule = []
    for i, rule in enumerate(rules):
        # SQL equi-join semantics: a null in any of the rule's columns
        # means the record does not block under that rule
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
    tagged = per_rule[0]
    for other in per_rule[1:]:
        tagged = tagged.union(other)

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
            pa.field("id_a", id_type),
            pa.field("id_b", id_type),
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
