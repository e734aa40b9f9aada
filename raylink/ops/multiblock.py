"""Multi-rule (OR) blocking: the union of several blocking rules' pairs.

Real ER deployments block on several rules at once — "same nation OR
(same segment AND same balance band)" — because no single key has full
recall.  The reference's config takes exactly one key set per run
(FastLink.jl runs one blocking pass; users union runs by hand), so this
op is the one-call version: candidate pairs from EVERY rule, exactly one
row per pair, tagged with the lowest rule index that produced it.

Scale shape:

- ONE pass derives each record's block key under ALL rules (``rk_j``
  int64 columns; -1 marks a null rule column, which excludes the record
  from that rule — SQL equi-join semantics);
- per rule the keyed records union LAZILY (a record replicates once per
  rule it is valid under, never more) with the rule's key remixed by the
  rule index so blocks never collide across rules;
- hot blocks go through the same salt plan / cap machinery as the
  linkage pipeline (``plan_salts``), so one degenerate rule (a constant
  column) cannot produce an unbounded cell;
- cross-rule dedup costs NO extra shuffle: the lower-rule keys ride into
  the pair generator, and a pair surfacing in rule *i*'s cell is dropped
  when its two records also co-block under any rule *j* < *i* — rule
  *j*'s cell is the one that emits it (the classic multi-pass blocking
  exclusion: emit where not previously matched).  "Co-blocks under rule
  j" is the same key-equality predicate that defines rule *j*'s cells,
  so the suppression is exactly consistent with what rule *j* emits.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..config import BlockingConfig
from ..functions.hashing import combine_hashes, hash64_array
from ..stages import blocking as bs
from ..stages.pairs import _default_partitions
from ..stages.sortedrun import sorted_group_scan

__all__ = ["multi_rule_pairs", "multi_rule_pairs_link"]


def _strip_soundex(colname: str) -> tuple[str, bool]:
    if colname.startswith("soundex(") and colname.endswith(")"):
        return colname[8:-1], True
    return colname, False


def _with_rule_keys(
    records: ray.data.Dataset,
    rules: list[list[str]],
    id_col: str,
    keep_cols: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """Project to ``id_col`` + ``keep_cols`` + one int63 key column per
    rule (``rk_j``; -1 where any of the rule's columns is null).  Same
    hashing as ``stages.blocking.derive_block_keys`` so cells match the
    single-rule path exactly."""

    def add_keys(batch: pa.Table) -> pa.Table:
        out: dict[str, pa.Array] = {id_col: batch.column(id_col)}
        for c in keep_cols:
            out[c] = batch.column(c)
        for j, rule in enumerate(rules):
            h = None
            valid = None
            for colname in rule:
                src, use_soundex = _strip_soundex(colname)
                arr = batch.column(src)
                v = pc.is_valid(arr).to_numpy(zero_copy_only=False)
                col = arr.to_numpy(zero_copy_only=False)
                if use_soundex:
                    from ..functions.soundex import soundex

                    col = np.array(
                        [soundex(x) if x is not None else "" for x in col],
                        dtype=object,
                    )
                hk = hash64_array(col)
                h = hk if h is None else combine_hashes(h, hk)
                valid = v if valid is None else (valid & v)
            k = bs._to_i63(h)
            k[~valid] = -1
            out[f"rk{j}"] = pa.array(k, type=pa.int64())
        return pa.table(out)

    need = {id_col, *keep_cols}
    for rule in rules:
        for colname in rule:
            need.add(_strip_soundex(colname)[0])
    return records.select_columns(sorted(need)).map_batches(
        add_keys, batch_format="pyarrow"
    )


def _fan_out_rules(
    keyed: ray.data.Dataset,
    n_rules: int,
    id_col: str,
    keep_cols: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """Lazy union of per-rule datasets: rule-valid rows only, with
    ``block_key`` (rule-remixed), ``rule``, and all lower rules' keys."""
    parts = []
    for i in range(n_rules):
        def tag(batch: pa.Table, i: int = i) -> pa.Table:
            rk = batch.column(f"rk{i}").to_numpy(zero_copy_only=False)
            sel = rk != -1
            batch = batch.filter(pa.array(sel))
            rk = rk[sel]
            cols: dict[str, pa.Array] = {id_col: batch.column(id_col)}
            for c in keep_cols:
                cols[c] = batch.column(c)
            # lower-rule keys ride along for the min-rule suppression
            # (rule n-1's own key is never consulted, so only n-1 key
            # columns travel; rows from rule <= j carry -1 there)
            for j in range(min(i, n_rules - 1)):
                cols[f"rk{j}"] = batch.column(f"rk{j}")
            for j in range(min(i, n_rules - 1), n_rules - 1):
                cols[f"rk{j}"] = pa.array(
                    np.full(len(rk), -1, dtype=np.int64)
                )
            cols["rule"] = pa.array(np.full(len(rk), i, dtype=np.int64))
            # int63 like derive_block_keys: the downstream block machinery
            # (count/filter/salt membership) assumes int64-safe keys
            cols["block_key"] = pa.array(
                bs._to_i63(hash64_array(rk, seed=i + 1)), type=pa.int64()
            )
            return pa.table(cols)

        parts.append(keyed.map_batches(tag, batch_format="pyarrow"))
    ds = parts[0]
    for other in parts[1:]:
        ds = ds.union(other)
    return ds


def _suppress_lower(
    cols: dict[str, np.ndarray],
    rule: int,
    ia: np.ndarray,
    ib: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Drop index pairs that also co-block under any rule j < rule —
    that rule's cell is the one that emits them (min-rule semantics)."""
    if rule == 0 or len(ia) == 0:
        return ia, ib
    keep = np.ones(len(ia), dtype=bool)
    for j in range(rule):
        rk = cols[f"rk{j}"]
        keep &= ~((rk[ia] == rk[ib]) & (rk[ia] != -1))
    return ia[keep], ib[keep]


def _gen_pairs_min_rule(
    expanded: ray.data.Dataset,
    id_col: str,
    id_type: pa.DataType,
    link: bool,
    num_partitions: int | None,
    fields: tuple[str, ...] = (),
    field_types: dict[str, pa.DataType] | None = None,
) -> ray.data.Dataset:
    """Pair generation with in-cell min-rule suppression.

    Modeled on ``stages.pairs.generate_pairs_dedupe`` /
    ``generate_pairs_link`` (same triangle / salt-rectangle cell walk,
    same ``id_a < id_b`` canonicalization for self-link), but suppressed
    pairs never materialize.  Output carries ``(id_a, id_b, rule)`` plus
    ``f_a``/``f_b`` for each of ``fields`` (comparison payload for a
    downstream scorer — the linkage pipeline's multi-rule path).
    """
    sf = [pa.field("id_a", id_type), pa.field("id_b", id_type),
          pa.field("rule", pa.int64())]
    for f in fields:
        t = (field_types or {}).get(f, pa.string())
        sf.append(pa.field(f"{f}_a", t))
        sf.append(pa.field(f"{f}_b", t))
    out_schema = pa.schema(sf)

    def emit(cols: dict, rule: int, ia: np.ndarray, ib: np.ndarray) -> dict:
        ids = cols[id_col]
        if not link:
            swap = ids[ia] > ids[ib]
            ia, ib = np.where(swap, ib, ia), np.where(swap, ia, ib)
        out = {
            "id_a": ids[ia],
            "id_b": ids[ib],
            "rule": np.full(len(ia), rule, dtype=np.int64),
        }
        for f in fields:
            col = cols[f]
            out[f"{f}_a"] = col[ia]
            out[f"{f}_b"] = col[ib]
        return out

    def empty(cols: dict) -> dict:
        out = {
            "id_a": np.asarray(cols[id_col])[:0],
            "id_b": np.asarray(cols[id_col])[:0],
            "rule": np.array([], dtype=np.int64),
        }
        for f in fields:
            c = np.asarray(cols[f])[:0]
            out[f"{f}_a"] = c
            out[f"{f}_b"] = c
        return out

    def gen(group: dict[str, np.ndarray]) -> dict:
        if len(group[id_col]) < 2:
            return empty(group)
        cols = {k: np.asarray(v) for k, v in group.items()}
        rule = int(cols["rule"][0])
        sub_i = int(cols["sub_i"][0])
        sub_j = int(cols["sub_j"][0])
        if link:
            side = cols["_side"]
            a_rows = np.flatnonzero(side == "a")
            b_rows = np.flatnonzero(side == "b")
            if len(a_rows) == 0 or len(b_rows) == 0:
                return empty(cols)
            ia = np.repeat(a_rows, len(b_rows))
            ib = np.tile(b_rows, len(a_rows))
        elif sub_i == sub_j:
            order = np.argsort(cols[id_col], kind="stable")
            ti, tj = np.triu_indices(len(cols[id_col]), k=1)
            ia, ib = order[ti], order[tj]
        else:
            salt = cols["salt"]
            left = np.flatnonzero(salt == sub_i)
            right = np.flatnonzero(salt == sub_j)
            if len(left) == 0 or len(right) == 0:
                return empty(cols)
            ia = np.repeat(left, len(right))
            ib = np.tile(right, len(left))
        ia, ib = _suppress_lower(cols, rule, ia, ib)
        return emit(cols, rule, ia, ib)

    return sorted_group_scan(
        expanded,
        "pg_key",
        gen,
        empty,
        num_partitions=num_partitions or _default_partitions(),
        out_schema=out_schema,
    )


def multi_rule_pairs_from_keyed(
    keyed: ray.data.Dataset,
    n_rules: int,
    id_col: str,
    id_type: pa.DataType,
    blocking: BlockingConfig,
    fields: tuple[str, ...] = (),
    field_types: dict[str, pa.DataType] | None = None,
    num_partitions: int | None = None,
):
    """Pair rows from a ``_with_rule_keys`` output: fan-out → salt plan →
    singleton filter → in-cell min-rule pair generation.  ``fields``
    columns of ``keyed`` ride into the pair rows as ``f_a``/``f_b``
    (comparison payload).  Returns ``(pairs, BlockingCounters)`` — the
    linkage pipeline's multi-rule entry point.
    """
    # materialize the id+keys projection: the block-count pass and the
    # expansion both consume it, and without pinning each would re-run
    # the upstream read/keying (it is the narrow table — fields ride
    # along only when the caller needs comparison payload)
    tagged = _fan_out_rules(
        keyed, n_rules, id_col, keep_cols=tuple(fields)
    ).materialize()
    plan, bcount, counts = bs.analyze_blocks(tagged, blocking)
    # singleton blocks generate no pairs — drop them before the shuffle
    tagged = bs.filter_to_multi_blocks(tagged, counts=counts)
    expanded = bs.expand_pair_groups(
        tagged,
        plan,
        id_col,
        side=None,
        dropped=set(bcount.notes.get("dropped_block_keys", [])),
    )
    pairs = _gen_pairs_min_rule(
        expanded,
        id_col,
        id_type,
        link=False,
        num_partitions=num_partitions,
        fields=tuple(fields),
        field_types=field_types,
    )
    return pairs, bcount


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
    from .canonical import pa_column_type

    keyed = _with_rule_keys(records, rules, id_col)
    pairs, _ = multi_rule_pairs_from_keyed(
        keyed,
        len(rules),
        id_col,
        pa_column_type(records, id_col),
        BlockingConfig(cap=cap),
        num_partitions=num_partitions,
    )
    return pairs


def multi_rule_pairs_link_from_keyed(
    keyed_a: ray.data.Dataset,
    keyed_b: ray.data.Dataset,
    n_rules: int,
    id_col_a: str,
    id_col_b: str,
    id_type: pa.DataType,
    blocking: BlockingConfig,
    fields: tuple[str, ...] = (),
    field_types: dict[str, pa.DataType] | None = None,
    num_partitions: int | None = None,
):
    """Two-table pair rows from two ``_with_rule_keys`` outputs.

    Both id columns unify to ``_pair_id`` internally (the pair output is
    ``id_a`` from A / ``id_b`` from B regardless); the salt plan sees the
    COMBINED block populations, and blocks with fewer than 2 members
    across both sides are dropped before the shuffle.  Returns
    ``(pairs, BlockingCounters)``.
    """

    def rename_to_pair_id(old: str):
        def fn(b: pa.Table) -> pa.Table:
            return b.rename_columns(
                [("_pair_id" if c == old else c) for c in b.column_names]
            )

        return fn

    # materialized for the same reason as the self-link path: the
    # combined count pass and the per-side expansions each consume them
    tagged_a = _fan_out_rules(
        keyed_a.map_batches(rename_to_pair_id(id_col_a), batch_format="pyarrow"),
        n_rules, "_pair_id", keep_cols=tuple(fields),
    ).materialize()
    tagged_b = _fan_out_rules(
        keyed_b.map_batches(rename_to_pair_id(id_col_b), batch_format="pyarrow"),
        n_rules, "_pair_id", keep_cols=tuple(fields),
    ).materialize()
    both_keys = tagged_a.select_columns(["block_key"]).union(
        tagged_b.select_columns(["block_key"])
    )
    plan, bcount, counts = bs.analyze_blocks(both_keys, blocking)
    dropped = set(bcount.notes.get("dropped_block_keys", []))
    # a pair needs >= 2 members in the block across BOTH sides
    tagged_a = bs.filter_to_multi_blocks(tagged_a, counts=counts)
    tagged_b = bs.filter_to_multi_blocks(tagged_b, counts=counts)

    def tag(side: str):
        def fn(b: pa.Table) -> pa.Table:
            return b.append_column("_side", pa.array([side] * len(b)))

        return fn

    ea = bs.expand_pair_groups(
        tagged_a.map_batches(tag("a"), batch_format="pyarrow"),
        plan, "_pair_id", side="a", dropped=dropped,
    )
    eb = bs.expand_pair_groups(
        tagged_b.map_batches(tag("b"), batch_format="pyarrow"),
        plan, "_pair_id", side="b", dropped=dropped,
    )
    pairs = _gen_pairs_min_rule(
        ea.union(eb),
        "_pair_id",
        id_type,
        link=True,
        num_partitions=num_partitions,
        fields=tuple(fields),
        field_types=field_types,
    )
    return pairs, bcount


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
    rows whose respective column tuples hash equal (values must share a
    dtype across sides; key hashes cover values only, not column names).
    Both sides must carry ``id_col``.  Output: ``id_a`` (from A),
    ``id_b`` (from B), ``rule`` (int64, smallest producing rule).

    Same scale shape as :func:`multi_rule_pairs`; the salt plan is
    computed over the UNION of both sides' block keys so a block hot on
    either side gets salted.
    """
    if not rules:
        raise ValueError("multi_rule_pairs_link needs at least one rule")
    if rules_b is not None and len(rules_b) != len(rules):
        raise ValueError("rules_b must pair up with rules one-to-one")
    from .canonical import pa_column_type

    pairs, _ = multi_rule_pairs_link_from_keyed(
        _with_rule_keys(records_a, rules, id_col),
        _with_rule_keys(records_b, rules_b or rules, id_col),
        len(rules),
        id_col,
        id_col,
        pa_column_type(records_a, id_col),
        BlockingConfig(cap=cap),
        num_partitions=num_partitions,
    )
    return pairs
