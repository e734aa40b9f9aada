"""Candidate-pair generation inside (salted) pair-groups.

Replaces the reference's implicit full cross join (fastlink.jl:20,
emlink.jl:174): one ``groupby(pg_key)`` shuffle co-locates each pair-group
cell, and a vectorized per-group UDF emits the pairs:

- dedupe, diagonal cell (i==i): the strict upper triangle over members
  sorted by id — orientation ``id_a < id_b`` exactly once per unordered pair
  (the self-link filter SURVEY.md §2.7 calls for; the reference declares
  ``dedupe_only`` in its config schema but never implements it).
- dedupe, off-diagonal cell (i<j): full cross of salt-i members x salt-j
  members, orientation normalized to ``id_a < id_b``.
- link: A-side members x B-side members of the cell.

Pair rows carry only the configured comparison-field columns (suffixed
``_a``/``_b``) plus ids — never the full transcript text (SURVEY.md §7
"Very wide records").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .sortedrun import sorted_group_scan

__all__ = ["generate_pairs_dedupe", "generate_pairs_link", "generate_pairs_snm", "generate_pairs_snm_link", "pair_schema"]


def _emit(
    batch_cols: dict[str, np.ndarray],
    fields: list[str],
    id_col: str,
    ia: np.ndarray,
    ib: np.ndarray,
) -> dict[str, np.ndarray]:
    """Build a pair batch from row indices (ia -> _a side, ib -> _b side)."""
    ids = batch_cols[id_col]
    swap = ids[ia] > ids[ib]
    ia_f = np.where(swap, ib, ia)
    ib_f = np.where(swap, ia, ib)
    out: dict[str, np.ndarray] = {
        "id_a": ids[ia_f],
        "id_b": ids[ib_f],
    }
    for f in fields:
        col = batch_cols[f]
        out[f"{f}_a"] = col[ia_f]
        out[f"{f}_b"] = col[ib_f]
    return out


def _emit_link(
    a_cols: dict[str, np.ndarray],
    b_cols: dict[str, np.ndarray],
    fields: list[str],
    id_col: str,
    ia: np.ndarray,
    ib: np.ndarray,
) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {
        "id_a": a_cols[id_col][ia],
        "id_b": b_cols[id_col][ib],
    }
    for f in fields:
        out[f"{f}_a"] = a_cols[f][ia]
        out[f"{f}_b"] = b_cols[f][ib]
    return out


def _empty_pairs(fields: list[str], cols: dict[str, np.ndarray], id_col: str):
    out = {
        "id_a": cols[id_col][:0],
        "id_b": cols[id_col][:0],
    }
    for f in fields:
        out[f"{f}_a"] = cols[f][:0]
        out[f"{f}_b"] = cols[f][:0]
    return out


def _default_partitions() -> int:
    import ray

    return max(32, 2 * int(ray.cluster_resources().get("CPU", 8)))


def pair_schema(
    source_schema: pa.Schema | None, fields: list[str], id_col: str
) -> pa.Schema | None:
    """Explicit pair-row schema (id_a, id_b, f_a, f_b...) from the source
    records' Arrow schema.  Pinning types stops an all-null string slice in
    one output block from being type-inferred as null/float and breaking
    Arrow schema unification at the next shuffle (a real hazard on nullable
    comparison fields)."""
    if source_schema is None:
        return None
    try:
        id_type = source_schema.field(id_col).type
        out = [pa.field("id_a", id_type), pa.field("id_b", id_type)]
        for f in fields:
            t = source_schema.field(f).type
            out.append(pa.field(f"{f}_a", t))
            out.append(pa.field(f"{f}_b", t))
        return pa.schema(out)
    except KeyError:
        return None


def generate_pairs_dedupe(
    records: ray.data.Dataset,
    fields: list[str],
    id_col: str = "conv_id",
    num_partitions: int | None = None,
    source_schema: pa.Schema | None = None,
) -> ray.data.Dataset:
    """Self-link pair generation over salted pair-groups (one shuffle).

    Input is repartitioned so the groupby fans out over enough reduce tasks
    (the reduce-partition count follows the input block count)."""

    def gen(group: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        if len(group[id_col]) < 2:  # cheap early-out before any conversion
            return _empty_pairs(fields, group, id_col)
        cols = {k: np.asarray(v) for k, v in group.items()}
        n = len(cols[id_col])
        sub_i = int(cols["sub_i"][0])
        sub_j = int(cols["sub_j"][0])
        if sub_i == sub_j:
            if n < 2:
                return _empty_pairs(fields, cols, id_col)
            order = np.argsort(cols[id_col], kind="stable")
            ia, ib = np.triu_indices(n, k=1)
            return _emit(cols, fields, id_col, order[ia], order[ib])
        salt = cols["salt"]
        left = np.flatnonzero(salt == sub_i)
        right = np.flatnonzero(salt == sub_j)
        if len(left) == 0 or len(right) == 0:
            return _empty_pairs(fields, cols, id_col)
        ia = np.repeat(left, len(right))
        ib = np.tile(right, len(left))
        return _emit(cols, fields, id_col, ia, ib)

    n = num_partitions or _default_partitions()
    return sorted_group_scan(
        records,
        "pg_key",
        gen,
        lambda batch: _empty_pairs(fields, batch, id_col),
        num_partitions=n,
        out_schema=pair_schema(source_schema, fields, id_col),
    )


def generate_pairs_link(
    records: ray.data.Dataset,
    fields: list[str],
    id_col: str = "id",
    num_partitions: int | None = None,
    source_schema: pa.Schema | None = None,
) -> ray.data.Dataset:
    """Two-table link pair generation; ``records`` must carry a ``_side``
    column ("a"/"b") from the union of the two expanded inputs."""

    def gen(group: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        cols = {k: np.asarray(v) for k, v in group.items()}
        side = cols["_side"]
        a_rows = np.flatnonzero(side == "a")
        b_rows = np.flatnonzero(side == "b")
        if len(a_rows) == 0 or len(b_rows) == 0:
            return _empty_pairs(fields, cols, id_col)
        ia = np.repeat(a_rows, len(b_rows))
        ib = np.tile(b_rows, len(a_rows))
        return _emit_link(cols, cols, fields, id_col, ia, ib)

    n = num_partitions or _default_partitions()
    return sorted_group_scan(
        records,
        "pg_key",
        gen,
        lambda batch: _empty_pairs(fields, batch, id_col),
        num_partitions=n,
        out_schema=pair_schema(source_schema, fields, id_col),
    )


def generate_pairs_snm(
    records: ray.data.Dataset,
    fields: list[str],
    id_col: str,
    key_col: str,
    window: int,
    num_partitions: int | None = None,
    source_schema: pa.Schema | None = None,
) -> ray.data.Dataset:
    """Sorted-neighborhood candidate generation (Hernandez-Stolfo 1995)
    as a drop-in alternative to the salted equality-blocking plan:
    pairs are the records within ``window`` positions of each other
    under ``ORDER BY (key_col, id_col)`` — ``N*(window-1)`` candidates
    regardless of key skew, where a hot equality block goes quadratic.
    Null-key records generate no candidates (same contract as a null
    block key).

    Output schema matches :func:`generate_pairs_dedupe` exactly
    (``id_a, id_b, f_a, f_b ...`` with ``id_a < id_b``), so the scorer
    and everything downstream are blocking-strategy-agnostic.  The
    comparison fields ride THROUGH the slab scan (``carry_cols``) and
    emit directly on both pair sides — no join ever happens, so the
    plan is one range-partition exchange (global rank) plus one slab
    sort, exactly two shuffles of the projected records.
    """
    from ..ops.snm import sorted_neighborhood_pairs

    n_parts = num_partitions or _default_partitions()
    raw = sorted_neighborhood_pairs(
        records.select_columns(
            list(dict.fromkeys([key_col, id_col, *fields]))
        ),
        key_col,
        id_col,
        window=window,
        num_partitions=n_parts,
        carry_cols=list(fields),
    )

    schema = pair_schema(source_schema, fields, id_col)

    def orient(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        a = np.asarray(batch["id_a"])
        b = np.asarray(batch["id_b"])
        swap = a > b
        out = {
            "id_a": np.where(swap, b, a),
            "id_b": np.where(swap, a, b),
        }
        for f in fields:
            fa = np.asarray(batch[f"{f}_a"])
            fb = np.asarray(batch[f"{f}_b"])
            out[f"{f}_a"] = np.where(swap, fb, fa)
            out[f"{f}_b"] = np.where(swap, fa, fb)
        if schema is not None:
            import pyarrow as _pa

            arrays = []
            for fld in schema:
                arr = out[fld.name]
                arrays.append(
                    _pa.array(arr, type=fld.type, from_pandas=True)
                )
            return _pa.Table.from_arrays(arrays, schema=schema)
        return out

    return raw.map_batches(orient, batch_format="numpy")


def generate_pairs_snm_link(
    da: ray.data.Dataset,
    db: ray.data.Dataset,
    fields: list[str],
    id_a_col: str,
    id_b_col: str,
    key_col: str,
    window: int,
    num_partitions: int | None = None,
    source_schema: pa.Schema | None = None,
) -> ray.data.Dataset:
    """Two-table sorted-neighborhood candidates (multi-source SNM): both
    tables merge into ONE sorted order over ``key_col`` and every
    cross-table pair within ``window`` merged positions is emitted —
    the standard generalization (window counts positions over the
    merged list, so a run of same-side records consumes window slots,
    exactly as in the single-list form).

    The rank tiebreaker is side-prefixed (``"a|<id>"`` / ``"b|<id>"``)
    so an id value appearing in BOTH tables still yields a total order
    — without it, two identical (key, id) rows would rank in
    block-layout-dependent order and the pair set would be
    nondeterministic.  Output schema matches
    :func:`generate_pairs_link` (``id_a`` from table A, ``id_b`` from
    table B, fields suffixed).
    """
    from ..ops.snm import sorted_neighborhood_pairs

    n_parts = num_partitions or _default_partitions()

    def prep(side: str, id_col: str):
        def fn(t: pa.Table) -> pa.Table:
            names = [
                ("_pair_id" if c == id_col else c) for c in t.column_names
            ]
            t = t.rename_columns(names)
            id_arr = t.column("_pair_id")
            n_null = pc.sum(
                pc.is_null(id_arr, nan_is_null=True)
            ).as_py() or 0
            if n_null:
                # astype(str) would turn these into the literal "None",
                # colliding same-side null-id rows — exactly the
                # nondeterministic order __rank_id exists to prevent.
                # Refuse loudly, matching global_rank's null-key policy.
                raise ValueError(
                    f"{n_null} null ids in table {side!r}; "
                    "ids must be non-null for SNM link pairing"
                )
            ids = id_arr.to_numpy(zero_copy_only=False)
            rank_id = np.char.add(
                f"{side}|", ids.astype(str)
            ).astype(object)
            t = t.append_column(
                "_side", pa.array([side] * len(t), type=pa.string())
            )
            return t.append_column(
                "__rank_id", pa.array(rank_id, type=pa.string())
            )

        return fn

    union = (
        da.select_columns(
            list(dict.fromkeys([key_col, id_a_col, *fields]))
        ).map_batches(prep("a", id_a_col), batch_format="pyarrow")
    ).union(
        db.select_columns(
            list(dict.fromkeys([key_col, id_b_col, *fields]))
        ).map_batches(prep("b", id_b_col), batch_format="pyarrow")
    )
    # the sort key is usually itself a comparison field — carry it too
    carry = list(dict.fromkeys(["_pair_id", *fields, "_side"]))
    raw = sorted_neighborhood_pairs(
        union,
        key_col,
        "__rank_id",
        window=window,
        num_partitions=n_parts,
        carry_cols=carry,
    )

    schema = pair_schema(source_schema, fields, "_pair_id")

    def cross_orient(batch: dict[str, np.ndarray]) -> dict:
        sa = np.asarray(batch["_side_a"])
        sb = np.asarray(batch["_side_b"])
        keep = sa != sb
        swap = sa[keep] == "b"  # put table A on the _a side
        out: dict[str, np.ndarray] = {}
        for base in ["_pair_id", *fields]:
            va = np.asarray(batch[f"{base}_a"])[keep]
            vb = np.asarray(batch[f"{base}_b"])[keep]
            name_a = "id_a" if base == "_pair_id" else f"{base}_a"
            name_b = "id_b" if base == "_pair_id" else f"{base}_b"
            out[name_a] = np.where(swap, vb, va)
            out[name_b] = np.where(swap, va, vb)
        if schema is not None:
            arrays = [
                pa.array(out[f.name], type=f.type, from_pandas=True)
                for f in schema
            ]
            return pa.Table.from_arrays(arrays, schema=schema)
        return out

    return raw.map_batches(cross_orient, batch_format="numpy")
