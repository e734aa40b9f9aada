"""Deduplication operators for large-scale corpus pipelines.

Beyond the reference's probabilistic linkage, a 100 TB training-data engine
needs the classic dedup family.  Every operator here is expressed as Ray
Data transforms: vectorized ``map_batches`` for signatures, one
``groupby(bucket)`` shuffle for candidate generation, and a verify pass — no
driver-side loops over the corpus.

- :func:`exact_dedup` — hash-partitioned exact duplicate groups (keep-first
  by min id).
- :func:`minhash_lsh_dedup` — shingle -> minhash -> banded LSH buckets ->
  candidate pairs -> signature-estimated Jaccard filter.
- :func:`simhash_dedup` — 64-bit simhash, pigeonhole banding, Hamming verify.
- :func:`ngram_jaccard_dedup` — exact char-n-gram (or DuckDB-compatible
  char-set) Jaccard within blocking groups.
- :func:`embedding_cosine_dedup` — random-hyperplane LSH buckets over an
  embedding column, exact cosine verify.

All bucketed pair generators cap bucket size with an explicit ``oversize``
counter column in the returned stats — oversized buckets are truncated
loudly, never silently.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.strdist import char_jaccard

__all__ = [
    "exact_dedup",
    "exact_dedup_edges",
    "minhash_signatures",
    "minhash_lsh_dedup",
    "minhash_lsh_dedup_cross",
    "simhash_signatures",
    "simhash_dedup",
    "ngram_jaccard_dedup",
    "embedding_cosine_dedup",
    "embedding_cosine_pairs_exact",
]

_MERSENNE = (1 << 61) - 1

#: 16-bit popcount table for vectorized 64-bit Hamming distance
_POP16 = np.array([bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    m = np.uint64(0xFFFF)
    return (
        _POP16[(x & m).astype(np.int64)]
        + _POP16[((x >> np.uint64(16)) & m).astype(np.int64)]
        + _POP16[((x >> np.uint64(32)) & m).astype(np.int64)]
        + _POP16[((x >> np.uint64(48)) & m).astype(np.int64)]
    ).astype(np.int64)


def _default_partitions() -> int:
    import ray

    return max(32, 2 * int(ray.cluster_resources().get("CPU", 8)))


# --------------------------------------------------------------------------
# exact
# --------------------------------------------------------------------------


def exact_dedup(
    ds: ray.data.Dataset,
    col: str,
    id_col: str,
    driver_threshold: int = 20_000_000,
) -> ray.data.Dataset:
    """Exact duplicate groups by ``col``: one row per distinct value with the
    kept (minimum) id and the duplicate count.

    The canonical 'exact dedup = hash partition + per-group first' shape,
    realized as per-block (min, count) PARTIALS + a merge — Ray's sort-based
    row aggregate burns ~100us/row in Python merge code, while the partials
    (one row per distinct value per block) are orders of magnitude fewer.
    Small partial sets merge on the driver; larger ones shuffle ONLY the
    partials through a sorted-run scan.
    """
    keep_col = f"keep_{id_col}"

    def partial(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        df = pd.DataFrame({col: batch[col], id_col: batch[id_col]})
        g = df.groupby(col, dropna=False, sort=False)[id_col].agg(["min", "size"])
        return {
            col: np.asarray(g.index.to_numpy(), dtype=object),
            keep_col: g["min"].to_numpy(),
            "n_dups": g["size"].to_numpy().astype(np.int64),
        }

    partials = ds.select_columns([col, id_col]).map_batches(
        partial, batch_format="numpy", batch_size=None
    ).materialize()
    if partials.count() <= driver_threshold:
        df = partials.to_pandas()
        g = (
            df.groupby(col, dropna=False, sort=False)
            .agg(**{keep_col: (keep_col, "min"), "n_dups": ("n_dups", "sum")})
            .reset_index()
        )
        return ray.data.from_pandas(g)

    # at-scale: shuffle only the partials; merge runs via sorted-run scan
    from ..stages.sortedrun import sorted_group_scan

    def merge(group: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        return {
            col: np.asarray(group[col])[:1],
            keep_col: np.asarray([np.min(group[keep_col])]),
            "n_dups": np.asarray([np.sum(group["n_dups"])], dtype=np.int64),
        }

    def empty(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        return {
            col: np.asarray(batch[col])[:0],
            keep_col: np.asarray(batch[keep_col])[:0],
            "n_dups": np.empty(0, dtype=np.int64),
        }

    n_part = _default_partitions()
    return sorted_group_scan(partials, col, merge, empty, num_partitions=n_part)


# --------------------------------------------------------------------------
# minhash + LSH
# --------------------------------------------------------------------------


_FNV = np.uint64(1099511628211)


def _mix64(h: np.ndarray) -> np.ndarray:
    """Finalizer (xorshift-multiply avalanche) over uint64 values."""
    with np.errstate(over="ignore"):
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(0xFF51AFD7ED558CCD)
        h = h ^ (h >> np.uint64(29))
    return h


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Unique 64-bit hashes of the text's byte k-grams, fully vectorized.

    ``sliding_window_view`` + a polynomial byte hash (uint64 wraparound)
    replace the previous per-window ``zlib.crc32`` Python loop (~1 ms per
    document at corpus text lengths).
    """
    b = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
    if len(b) == 0:
        return np.array([0], dtype=np.uint64)
    with np.errstate(over="ignore"):
        if len(b) < k:
            w = b[None, :].astype(np.uint64)
            pows = _FNV ** np.arange(len(b), dtype=np.uint64)
        else:
            w = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
            pows = _FNV ** np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = (w * pows[None, :]).sum(axis=1, dtype=np.uint64)
    return np.unique(_mix64(h))


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    shingle_k: int = 5,
    seed: int = 4242,
) -> ray.data.Dataset:
    """Add a ``minhash`` binary column (num_perm x uint64 packed)."""
    a_params, b_params = _perm_params(num_perm, seed)

    def sig(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        blobs = []
        for t in texts:
            sh = _shingle_hashes(t, shingle_k)
            # (S, P) affine hashes mod Mersenne prime, column-min
            prod = (sh[:, None] * a_params[None, :] + b_params[None, :]) % _MERSENNE
            blobs.append(prod.min(axis=0).astype(np.uint64).tobytes())
        return pa.table(
            {
                id_col: batch.column(id_col),
                "minhash": pa.array(blobs, type=pa.binary()),
            }
        )

    return ds.map_batches(sig, batch_format="pyarrow")


def _band_expand(
    batch: pa.Table, id_col: str, bands: int, rows: int
) -> dict[str, pa.Array]:
    """Vectorized band-bucket expansion of a signature batch: one output
    row per (doc, band) with a 31-bit band hash packed under the band
    index into one int64 ``bucket_key``.  Replaces the previous
    per-doc-per-band ``zlib.crc32`` Python loop with a columnwise
    xorshift-multiply fold (``_mix64``) over the band's uint64 rows —
    the hash only gates candidate generation (est-Jaccard filtering is
    exact downstream), so any avalanche hash is equivalent."""
    ids = batch.column(id_col)
    blobs_col = batch.column("minhash")
    n = len(batch)
    M = np.frombuffer(
        b"".join(blobs_col.to_pylist()), dtype=np.uint64
    ).reshape(n, bands, rows)
    h = np.zeros((n, bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for r in range(rows):
            h = _mix64(h ^ M[:, :, r])
        # salt by band index so identical row values in different bands
        # land in different buckets
        h = _mix64(h ^ np.arange(bands, dtype=np.uint64)[None, :])
    bh = (h & np.uint64(0x7FFFFFFF)).astype(np.int64).reshape(-1)
    band_idx = np.tile(np.arange(bands, dtype=np.int64), n)
    take = pa.array(np.repeat(np.arange(n, dtype=np.int64), bands))
    return {
        id_col: ids.take(take),
        "band": pa.array(band_idx.astype(np.int32), type=pa.int32()),
        "bucket_key": pa.array((band_idx << 32) | bh, type=pa.int64()),
        "minhash": blobs_col.take(take),
    }


def _bucket_pairs(
    buckets: ray.data.Dataset,
    id_col: str,
    payload_col: str | None,
    bucket_cols: list[str],
    cap: int = 2000,
    carry_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """Triangle pairs within each bucket (sorted-run scan + vectorized emit).

    Buckets larger than ``cap`` are truncated to their ``cap`` smallest ids
    and flagged via the ``truncated`` column (explicit, never silent).
    Runs through :func:`raylink.stages.sortedrun.sorted_group_scan` — the
    bucket columns hash into one scan key — because ``groupby.map_groups``
    costs ~300us/group of slicing machinery and dedup corpora have many
    tiny buckets.
    """

    def gen(group: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        ids = np.asarray(group[id_col])
        empty_ids = ids[:0]
        out_empty = {
            "id_a": empty_ids,
            "id_b": empty_ids,
            "truncated": np.zeros(0, dtype=np.int8),
        }
        if payload_col is not None:
            pl = np.asarray(group[payload_col])
            out_empty["payload_a"] = pl[:0]
            out_empty["payload_b"] = pl[:0]
        for c in carry_cols or []:
            out_empty[c] = np.asarray(group[c])[:0]
        n = len(ids)
        if n < 2:
            return out_empty
        order = np.argsort(ids, kind="stable")
        truncated = 0
        if n > cap:
            order = order[:cap]
            n = cap
            truncated = 1
        ia, ib = np.triu_indices(n, k=1)
        out = {
            "id_a": ids[order[ia]],
            "id_b": ids[order[ib]],
            "truncated": np.full(len(ia), truncated, dtype=np.int8),
        }
        if payload_col is not None:
            pl = np.asarray(group[payload_col])
            out["payload_a"] = pl[order[ia]]
            out["payload_b"] = pl[order[ib]]
        for c in carry_cols or []:
            # group-constant columns (e.g. which LSH table emitted this
            # bucket) survive onto the pair rows
            out[c] = np.full(len(ia), np.asarray(group[c])[0])
        return out

    from ..functions.hashing import scan_key63
    from ..stages.sortedrun import sorted_group_scan

    def add_key(batch: pa.Table) -> pa.Table:
        key = scan_key63(
            batch.column(c).to_numpy(zero_copy_only=False)
            for c in bucket_cols
        )
        return batch.append_column("_scan_key", pa.array(key, type=pa.int64()))

    keyed = buckets.map_batches(add_key, batch_format="pyarrow")
    n_part = max(32, 2 * int(ray.cluster_resources().get("CPU", 8)))
    return sorted_group_scan(
        keyed,
        "_scan_key",
        gen,
        lambda batch: gen({k: np.asarray(v)[:0] for k, v in batch.items()}),
        num_partitions=n_part,
    )


def minhash_lsh_dedup(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.7,
    seed: int = 4242,
    bucket_cap: int = 2000,
) -> ray.data.Dataset:
    """Near-duplicate pairs by minhash LSH.

    Returns ``(id_a, id_b, est_jaccard)`` with signature-estimated Jaccard
    >= threshold.  bands * rows == num_perm; the usual S-curve picks
    (bands, rows) so the collision probability at ``threshold`` is high.
    """
    assert num_perm % bands == 0
    rows = num_perm // bands
    sigs = minhash_signatures(
        ds, text_col, id_col, num_perm=num_perm, shingle_k=shingle_k, seed=seed
    )

    # the 31-bit band hash packs under the band index into one int64
    # bucket key; pair generation + estimation + cross-band dedup then run in
    # ONE sorted-run scan with first-band-wins: a pair is emitted only by the
    # lowest band in which its signatures collide, so no distinct-pairs
    # shuffle is needed afterwards.  (If an earlier colliding bucket was
    # truncated at ``bucket_cap``, the pair is dropped like it would have
    # been there — both designs approximate under truncation.)
    def band_rows(batch: pa.Table) -> pa.Table:
        return pa.table(_band_expand(batch, id_col, bands, rows))

    banded = sigs.map_batches(band_rows, batch_format="pyarrow")

    def _empty(group: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        ids = np.asarray(group[id_col])
        return {
            "id_a": ids[:0],
            "id_b": ids[:0],
            "est_jaccard": np.zeros(0, dtype=np.float64),
        }

    def gen(group: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        ids = np.asarray(group[id_col])
        n = len(ids)
        if n < 2:
            return _empty(group)
        band = int(np.asarray(group["band"])[0])
        order = np.argsort(ids, kind="stable")
        if n > bucket_cap:
            order = order[:bucket_cap]
            n = bucket_cap
        blobs = np.asarray(group["minhash"], dtype=object)[order]
        M = np.frombuffer(b"".join(blobs), dtype=np.uint64).reshape(n, num_perm)
        ia, ib = np.triu_indices(n, k=1)
        out_a, out_b, out_est = [], [], []
        ids_o = ids[order]
        for c0 in range(0, len(ia), 262144):  # bound the (P, num_perm) mask
            ca, cb = ia[c0 : c0 + 262144], ib[c0 : c0 + 262144]
            eq = M[ca] == M[cb]
            keep = np.ones(len(ca), dtype=bool)
            for b2 in range(band):  # first-band-wins
                keep &= ~eq[:, b2 * rows : (b2 + 1) * rows].all(axis=1)
            est = eq.mean(axis=1)
            keep &= est >= threshold
            idx = np.flatnonzero(keep)
            out_a.append(ids_o[ca[idx]])
            out_b.append(ids_o[cb[idx]])
            out_est.append(est[idx])
        return {
            "id_a": np.concatenate(out_a),
            "id_b": np.concatenate(out_b),
            "est_jaccard": np.concatenate(out_est),
        }

    from ..stages.sortedrun import sorted_group_scan

    return sorted_group_scan(
        banded.select_columns([id_col, "band", "minhash", "bucket_key"]),
        "bucket_key",
        gen,
        _empty,
        num_partitions=_default_partitions(),
    )


def minhash_lsh_dedup_cross(
    new_ds: ray.data.Dataset,
    corpus_ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.7,
    seed: int = 4242,
    bucket_cap: int = 2000,
) -> ray.data.Dataset:
    """Cross-corpus near-dedup: which NEW documents near-duplicate an
    EXISTING corpus — the incremental-ingest shape (don't re-admit
    content the training set already has).  Same banded LSH plan as
    :func:`minhash_lsh_dedup`, but the two sides are tagged and only
    new×corpus pairs are generated inside each bucket (within-side
    pairs are the self-dedup's job).  Returns
    ``(id_new, id_corpus, est_jaccard)`` with first-band-wins cross-band
    dedup, so no distinct-pairs shuffle afterwards.

    Scale: the corpus side contributes signature rows only — it is
    never re-shingled per new batch, and neither side materializes
    beyond its (id, band, signature) rows entering the one sorted scan.
    """
    assert num_perm % bands == 0
    rows = num_perm // bands

    def banded_side(ds: ray.data.Dataset, side: int) -> ray.data.Dataset:
        sigs = minhash_signatures(
            ds, text_col, id_col,
            num_perm=num_perm, shingle_k=shingle_k, seed=seed,
        )

        def band_rows(batch: pa.Table) -> pa.Table:
            cols = _band_expand(batch, id_col, bands, rows)
            cols["side"] = pa.array(
                np.full(len(cols["band"]), side, dtype=np.int8),
                type=pa.int8(),
            )
            return pa.table(cols)

        return sigs.map_batches(band_rows, batch_format="pyarrow")

    banded = banded_side(new_ds, 0).union(banded_side(corpus_ds, 1))

    def _empty(group: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        ids = np.asarray(group[id_col])
        return {
            "id_new": ids[:0],
            "id_corpus": ids[:0],
            "est_jaccard": np.zeros(0, dtype=np.float64),
        }

    def gen(group: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        ids = np.asarray(group[id_col])
        side = np.asarray(group["side"])
        band = int(np.asarray(group["band"])[0])
        # deterministic PER-SIDE truncation: a global smallest-ids cut
        # would silently drop the entire new side whenever corpus ids
        # sort first (the usual incremental-ingest id convention), so
        # cap each side at bucket_cap/2 and give unused slack to the
        # other — both sides always survive a hot bucket
        order = np.argsort(ids, kind="stable")
        side_o = side[order]
        if len(order) > bucket_cap:
            new_all = order[side_o == 0]
            cor_all = order[side_o == 1]
            half = bucket_cap // 2
            n_new = min(len(new_all), max(half, bucket_cap - len(cor_all)))
            n_cor = min(len(cor_all), bucket_cap - n_new)
            order = np.sort(
                np.concatenate((new_all[:n_new], cor_all[:n_cor]))
            )
            side_o = side[order]
        ids_o = ids[order]
        new_rows = np.flatnonzero(side_o == 0)
        cor_rows = np.flatnonzero(side_o == 1)
        if len(new_rows) == 0 or len(cor_rows) == 0:
            return _empty(group)
        blobs = np.asarray(group["minhash"], dtype=object)[order]
        M = np.frombuffer(b"".join(blobs), dtype=np.uint64).reshape(
            len(ids_o), num_perm
        )
        ia = np.repeat(new_rows, len(cor_rows))
        ib = np.tile(cor_rows, len(new_rows))
        out_a, out_b, out_est = [], [], []
        for c0 in range(0, len(ia), 262144):
            ca, cb = ia[c0 : c0 + 262144], ib[c0 : c0 + 262144]
            eq = M[ca] == M[cb]
            keep = np.ones(len(ca), dtype=bool)
            for b2 in range(band):  # first-band-wins
                keep &= ~eq[:, b2 * rows : (b2 + 1) * rows].all(axis=1)
            est = eq.mean(axis=1)
            keep &= est >= threshold
            idx = np.flatnonzero(keep)
            out_a.append(ids_o[ca[idx]])
            out_b.append(ids_o[cb[idx]])
            out_est.append(est[idx])
        return {
            "id_new": np.concatenate(out_a),
            "id_corpus": np.concatenate(out_b),
            "est_jaccard": np.concatenate(out_est),
        }

    from ..stages.sortedrun import sorted_group_scan

    return sorted_group_scan(
        banded.select_columns(
            [id_col, "band", "minhash", "bucket_key", "side"]
        ),
        "bucket_key",
        gen,
        _empty,
        num_partitions=_default_partitions(),
    )


# --------------------------------------------------------------------------
# simhash
# --------------------------------------------------------------------------


def simhash_signatures(
    ds: ray.data.Dataset, text_col: str, id_col: str
) -> ray.data.Dataset:
    """64-bit simhash over whitespace tokens, vectorized across the batch.

    Tokens of ALL documents explode into one flat array, hash in one
    vectorized ``hash64_array`` call (SipHash, C speed — the previous
    per-token ``zlib.crc32`` Python loop cost ~1 ms/doc), expand into a
    (T, 64) bit matrix, and per-document bit votes come from ONE
    ``np.add.reduceat`` over the doc boundaries.
    """
    from ..functions.hashing import hash64_array

    def sig(batch: pa.Table) -> pa.Table:
        texts = pd.Series(batch.column(text_col).to_pylist(), dtype=object)
        toks = texts.fillna("").str.split()
        counts = toks.str.len().to_numpy(np.int64)
        out = np.zeros(len(texts), dtype=np.int64)
        nz = np.flatnonzero(counts > 0)
        if len(nz):
            flat = toks.iloc[nz].explode().to_numpy()
            hs = hash64_array(flat)  # (T,) uint64, one C call
            bits = (
                (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)
            ).astype(np.int32)
            starts = np.concatenate([[0], np.cumsum(counts[nz])[:-1]])
            votes = np.add.reduceat(bits, starts, axis=0)  # (D, 64)
            maj = votes * 2 > counts[nz][:, None]  # bit set on majority
            packed = (
                maj.astype(np.uint64)
                << np.arange(64, dtype=np.uint64)[None, :]
            ).sum(axis=1, dtype=np.uint64)
            out[nz] = packed.view(np.int64)
        return pa.table(
            {id_col: batch.column(id_col), "simhash": pa.array(out, type=pa.int64())}
        )

    return ds.map_batches(sig, batch_format="pyarrow")


def simhash_dedup(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    bucket_cap: int = 2000,
) -> ray.data.Dataset:
    """Near-dup pairs with simhash Hamming distance <= max_hamming.

    Pigeonhole banding: split 64 bits into ``max_hamming + 1`` bands — any
    pair within distance ``max_hamming`` agrees exactly on >= 1 band.
    Recall is exact except inside buckets larger than ``bucket_cap``
    (giant template families), which are truncated to their cap smallest
    ids — at corpus scale the full quadratic pair list of such a family is
    the thing a dedup pipeline exists to avoid; downstream clustering
    still connects the family through the emitted pairs.
    """
    n_bands = max_hamming + 1
    width = 64 // n_bands
    sigs = simhash_signatures(ds, text_col, id_col)

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        sh = batch.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
        idx, bandc, bitsc, sigc = [], [], [], []
        for b in range(n_bands):
            lo = b * width
            w = width if b < n_bands - 1 else 64 - lo
            bits = (sh >> np.uint64(lo)) & np.uint64((1 << w) - 1)
            idx.extend(range(len(sh)))
            bandc.extend([b] * len(sh))
            bitsc.extend(bits.astype(np.int64))
            sigc.extend(sh.view(np.int64))
        return pa.table(
            {
                id_col: ids.take(pa.array(idx, type=pa.int64())),
                "band": pa.array(bandc, type=pa.int32()),
                "band_bits": pa.array(bitsc, type=pa.int64()),
                "simhash": pa.array(sigc, type=pa.int64()),
            }
        )

    # band values fit in ``width+`` bits, so (band, band_bits) packs exactly
    # into one int64 bucket key.  Pair generation, Hamming verification, and
    # cross-band dedup all run in ONE sorted-run scan: first-band-wins means
    # a pair is emitted only by the lowest band in which it collides, so no
    # distinct-pairs shuffle follows.  (Under ``bucket_cap`` truncation the
    # suppressed pair may have been dropped by the earlier band — both this
    # and the old emit-everywhere+dedup design approximate in that case.)
    def add_key(batch: pa.Table) -> pa.Table:
        band = batch.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
        bits = batch.column("band_bits").to_numpy(zero_copy_only=False)
        key = (band << np.int64(56)) ^ (bits & np.int64((1 << 56) - 1))
        return batch.append_column("bucket_key", pa.array(key, type=pa.int64()))

    banded = sigs.map_batches(band_rows, batch_format="pyarrow").map_batches(
        add_key, batch_format="pyarrow"
    )

    def _empty(group: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        ids = np.asarray(group[id_col])
        return {
            "id_a": ids[:0],
            "id_b": ids[:0],
            "hamming": np.zeros(0, dtype=np.int64),
        }

    def gen(group: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        ids = np.asarray(group[id_col])
        n = len(ids)
        if n < 2:
            return _empty(group)
        band = int(np.asarray(group["band"])[0])
        order = np.argsort(ids, kind="stable")
        if n > bucket_cap:
            order = order[:bucket_cap]
            n = bucket_cap
        sh = np.asarray(group["simhash"])[order].astype(np.int64).view(np.uint64)
        ids_o = ids[order]
        ia, ib = np.triu_indices(n, k=1)
        A, B = sh[ia], sh[ib]
        keep = np.ones(len(ia), dtype=bool)
        for b2 in range(band):  # first-band-wins
            lo = b2 * width
            w = width if b2 < n_bands - 1 else 64 - lo
            mask_v = np.uint64((1 << w) - 1)
            keep &= ((A >> np.uint64(lo)) & mask_v) != ((B >> np.uint64(lo)) & mask_v)
        dist = _popcount64(A ^ B)
        keep &= dist <= max_hamming
        idx = np.flatnonzero(keep)
        return {
            "id_a": ids_o[ia[idx]],
            "id_b": ids_o[ib[idx]],
            "hamming": dist[idx],
        }

    from ..stages.sortedrun import sorted_group_scan

    return sorted_group_scan(
        banded.select_columns([id_col, "band", "simhash", "bucket_key"]),
        "bucket_key",
        gen,
        _empty,
        num_partitions=_default_partitions(),
    )


# --------------------------------------------------------------------------
# n-gram / char jaccard
# --------------------------------------------------------------------------


def ngram_jaccard_dedup(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    group_cols: list[str],
    threshold: float = 0.8,
    ngram_k: int = 3,
    char_set_mode: bool = False,
    bucket_cap: int = 2000,
) -> ray.data.Dataset:
    """Exact n-gram Jaccard pairs within blocking groups.

    ``char_set_mode=True`` uses character-SET Jaccard (DuckDB ``jaccard()``
    semantics) instead of k-gram sets — useful as a SQL-checkable oracle.
    That mode precomputes each RECORD's character set as a 128-bit ASCII
    mask (two uint64 columns) and FUSES the verify into the bucket scan:
    per group, the strict upper triangle of pairwise popcount Jaccards is
    computed as broadcast uint64 AND/OR matrices and only pairs clearing
    ``threshold`` are ever emitted — no candidate-pair rows exist.
    Non-ASCII records (bytes != characters) ride along with their raw text
    and use a scalar fallback.  K-gram mode keeps the generic
    bucket-pairs + per-pair verify path.
    """
    if char_set_mode:
        return _charset_jaccard_dedup(
            ds, text_col, id_col, group_cols, threshold, bucket_cap
        )

    def add_payload(batch: pa.Table) -> pa.Table:
        return batch.select([id_col, text_col, *group_cols])

    pairs = _bucket_pairs(
        ds.map_batches(add_payload, batch_format="pyarrow"),
        id_col,
        text_col,
        group_cols,
        cap=bucket_cap,
    )

    def verify(batch: pa.Table) -> pa.Table:
        ta = batch.column("payload_a").to_pylist()
        tb = batch.column("payload_b").to_pylist()
        n = len(ta)
        sim = np.empty(n, dtype=np.float64)
        for i, (x, y) in enumerate(zip(ta, tb)):
            x = x or ""
            y = y or ""
            gx = {x[j : j + ngram_k] for j in range(max(len(x) - ngram_k + 1, 1))}
            gy = {y[j : j + ngram_k] for j in range(max(len(y) - ngram_k + 1, 1))}
            inter = len(gx & gy)
            sim[i] = inter / (len(gx) + len(gy) - inter) if (gx or gy) else 1.0
        keep = sim >= threshold
        sub = batch.take(pa.array(np.flatnonzero(keep)))
        return pa.table(
            {
                "id_a": sub.column("id_a"),
                "id_b": sub.column("id_b"),
                "jaccard": pa.array(sim[keep], type=pa.float64()),
            }
        )

    return pairs.map_batches(verify, batch_format="pyarrow")


def _charset_jaccard_dedup(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    group_cols: list[str],
    threshold: float,
    bucket_cap: int,
) -> ray.data.Dataset:
    """Character-set Jaccard with the verify fused into the bucket scan."""

    def add_masks(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        n = len(texts)
        lo = np.zeros(n, dtype=np.uint64)
        hi = np.zeros(n, dtype=np.uint64)
        fb: list = [None] * n  # raw text for non-ASCII rows only
        for i, t in enumerate(texts):
            b = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8)
            if len(b) and b.max() >= 128:
                fb[i] = t
                continue
            u = np.unique(b).astype(np.uint64)
            if (u < 64).any():
                lo[i] = (np.uint64(1) << u[u < 64]).sum()
            hs = u[u >= 64] - np.uint64(64)
            if len(hs):
                hi[i] = (np.uint64(1) << hs).sum()
        out = batch.select([id_col, *group_cols])
        out = out.append_column("_cj_lo", pa.array(lo.view(np.int64), type=pa.int64()))
        out = out.append_column("_cj_hi", pa.array(hi.view(np.int64), type=pa.int64()))
        return out.append_column("_cj_fb", pa.array(fb, type=pa.string()))

    from ..functions.hashing import scan_key63
    from ..stages.sortedrun import sorted_group_scan

    def add_key(batch: pa.Table) -> pa.Table:
        key = scan_key63(
            batch.column(c).to_numpy(zero_copy_only=False)
            for c in group_cols
        )
        return batch.append_column("_scan_key", pa.array(key, type=pa.int64()))

    keyed = ds.map_batches(add_masks, batch_format="pyarrow").map_batches(
        add_key, batch_format="pyarrow"
    )

    def _empty(group: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        ids = np.asarray(group[id_col])
        return {
            "id_a": ids[:0],
            "id_b": ids[:0],
            "jaccard": np.empty(0, dtype=np.float64),
            "truncated": np.empty(0, dtype=np.int8),
        }

    def gen(group: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        ids = np.asarray(group[id_col])
        n = len(ids)
        if n < 2:
            return _empty(group)
        order = np.argsort(ids, kind="stable")
        truncated = 0
        if n > bucket_cap:
            order = order[:bucket_cap]
            n = bucket_cap
            truncated = 1
        ids = ids[order]
        lo = np.asarray(group["_cj_lo"])[order].view(np.uint64)
        hi = np.asarray(group["_cj_hi"])[order].view(np.uint64)
        fb = np.asarray(group["_cj_fb"], dtype=object)[order]
        out_a, out_b, out_j = [], [], []
        chunk = max(1, 2_000_000 // max(n, 1))
        for c0 in range(0, n, chunk):
            rows = slice(c0, min(c0 + chunk, n))
            inter = _popcount64(lo[rows, None] & lo[None, :]) + _popcount64(
                hi[rows, None] & hi[None, :]
            )
            union = _popcount64(lo[rows, None] | lo[None, :]) + _popcount64(
                hi[rows, None] | hi[None, :]
            )
            with np.errstate(invalid="ignore", divide="ignore"):
                sim = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
            ri, ci = np.nonzero(sim >= threshold)
            keep = (ri + c0) < ci  # strict upper triangle
            ri, ci = ri[keep], ci[keep]
            out_a.append(ids[ri + c0])
            out_b.append(ids[ci])
            out_j.append(sim[ri, ci])
        if not out_a:
            return _empty(group)
        id_a = np.concatenate(out_a)
        id_b = np.concatenate(out_b)
        jac = np.concatenate(out_j)
        # non-ASCII rows: recompute their pairs scalar-exactly
        bad = np.flatnonzero(pd.notna(fb))
        if len(bad):
            bad_ids = set(ids[bad].tolist())
            mask = np.array(
                [a in bad_ids or b in bad_ids for a, b in zip(id_a, id_b)]
            )
            id_a, id_b, jac = id_a[~mask], id_b[~mask], jac[~mask]
            extra_a, extra_b, extra_j = [], [], []
            charset = {
                int(i): (set(fb[i]) if fb[i] is not None else None)
                for i in range(n)
            }
            for i in range(n):
                for j in range(i + 1, n):
                    if fb[i] is None and fb[j] is None:
                        continue
                    sx = charset[i] if charset[i] is not None else _mask_charset(lo[i], hi[i])
                    sy = charset[j] if charset[j] is not None else _mask_charset(lo[j], hi[j])
                    u2 = len(sx | sy)
                    s = (len(sx & sy) / u2) if u2 else 1.0
                    if s >= threshold:
                        extra_a.append(ids[i])
                        extra_b.append(ids[j])
                        extra_j.append(s)
            if extra_a:
                id_a = np.concatenate([id_a, np.asarray(extra_a)])
                id_b = np.concatenate([id_b, np.asarray(extra_b)])
                jac = np.concatenate([jac, np.asarray(extra_j)])
        return {
            "id_a": id_a,
            "id_b": id_b,
            "jaccard": jac,
            "truncated": np.full(len(id_a), truncated, dtype=np.int8),
        }

    n_part = _default_partitions()
    return sorted_group_scan(keyed, "_scan_key", gen, _empty, num_partitions=n_part)


def _mask_charset(lo: np.uint64, hi: np.uint64) -> set:
    """Reconstruct the ASCII character set from a 128-bit mask."""
    out = set()
    for b in range(64):
        if (int(lo) >> b) & 1:
            out.add(chr(b))
        if (int(hi) >> b) & 1:
            out.add(chr(b + 64))
    return out


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------


def embedding_cosine_dedup(
    ds: ray.data.Dataset,
    emb_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_planes: int | None = None,
    n_tables: int | None = None,
    seed: int = 7,
    bucket_cap: int = 4000,
    dim: int | None = None,
) -> ray.data.Dataset:
    """Near-duplicate pairs by cosine similarity over an embedding column.

    Multi-table random-hyperplane LSH: each of ``n_tables`` independent
    tables buckets vectors by the sign pattern of ``n_planes`` projections;
    exact cosine verify inside buckets; a pair is charged to its FIRST
    shared table only (the first-band-wins rule minhash/simhash already
    use), so no distinct-pairs shuffle is needed.  ``n_planes`` defaults to
    the value that gives ~50% per-table collision at ``threshold``
    (p = 1 - arccos(threshold)/pi per plane; n = log(0.5)/log(p)), so
    recall across T tables is ~1 - 0.5^T.  The scale path — brute force
    within buckets only.
    """
    p = 1.0 - np.arccos(min(max(threshold, -1.0), 1.0)) / np.pi
    if n_planes is None:
        n_planes = int(max(4, min(16, round(np.log(0.5) / np.log(max(p, 0.55))))))
    if n_tables is None:
        # enough independent tables that a pair AT the threshold is caught
        # with >=95% probability: T = ln(0.05)/ln(1 - p^planes).  Low
        # thresholds genuinely need many tables (replication cost is T
        # rows/record) — the 16-table cap bounds that cost and is the one
        # knob trading recall for shuffle volume at scale.
        p_table = max(min(p, 1.0 - 1e-9), 1e-9) ** n_planes
        n_tables = int(
            max(2, min(16, np.ceil(np.log(0.05) / np.log(1.0 - p_table))))
        )
    rng = np.random.default_rng(seed)
    state: dict = {"planes": None}

    def bucket(batch: pa.Table) -> pa.Table:
        from .ann import _as_matrix

        if len(batch) == 0:
            # guard BEFORE the lazy plane init: a width-0 empty batch
            # must not cache wrong-dimension hyperplanes for later ones
            return pa.table(
                {
                    id_col: pa.array(
                        [], type=batch.schema.field(id_col).type
                    ),
                    "_table": pa.array([], type=pa.int8()),
                    "bucket": pa.array([], type=pa.int64()),
                    "unit": pa.array([], type=pa.binary()),
                }
            )
        emb = _as_matrix(batch.column(emb_col))
        if state["planes"] is None:
            r = np.random.default_rng(seed)
            state["planes"] = [
                r.standard_normal((emb.shape[1], n_planes))
                for _ in range(n_tables)
            ]
        n = len(emb)
        keys = np.empty((n, n_tables), dtype=np.int64)
        for t, pl in enumerate(state["planes"]):
            signs = (emb @ pl) > 0
            k = np.zeros(n, dtype=np.int64)
            for b in range(n_planes):
                k |= signs[:, b].astype(np.int64) << b
            keys[:, t] = k
        norm = np.linalg.norm(emb, axis=1)
        norm[norm == 0] = 1.0
        unit = (emb / norm[:, None]).astype(np.float32)
        # payload = all table keys (int64 x T) || unit vector (float32 x d):
        # the pair stage needs both sides' full key vectors for the
        # first-shared-table filter
        payloads = [
            keys[i].tobytes() + unit[i].tobytes() for i in range(n)
        ]
        # replicate each record into its bucket row per table
        out_id, out_tab, out_key, out_pl = [], [], [], []
        for t in range(n_tables):
            out_tab.append(np.full(n, t, dtype=np.int8))
            out_key.append(keys[:, t])
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(np.tile(ids, n_tables)),
                "_table": pa.array(np.concatenate(out_tab), type=pa.int8()),
                "bucket": pa.array(np.concatenate(out_key), type=pa.int64()),
                "unit": pa.array(payloads * n_tables, type=pa.binary()),
            }
        )

    bucketed = ds.map_batches(bucket, batch_format="pyarrow")
    cand = _bucket_pairs(
        bucketed, id_col, "unit", ["_table", "bucket"], cap=bucket_cap,
        carry_cols=["_table"],
    )
    key_bytes = 8 * n_tables

    def verify(batch: pa.Table) -> pa.Table:
        ua = batch.column("payload_a").to_pylist()
        ub = batch.column("payload_b").to_pylist()
        n = len(ua)
        sim = np.empty(n, dtype=np.float64)
        first_shared = np.empty(n, dtype=np.int64)
        for i, (x, y) in enumerate(zip(ua, ub)):
            ka = np.frombuffer(x[:key_bytes], dtype=np.int64)
            kb = np.frombuffer(y[:key_bytes], dtype=np.int64)
            shared = np.flatnonzero(ka == kb)
            first_shared[i] = shared[0] if len(shared) else -1
            sim[i] = float(
                np.dot(
                    np.frombuffer(x[key_bytes:], dtype=np.float32),
                    np.frombuffer(y[key_bytes:], dtype=np.float32),
                )
            )
        # a pair appears in every shared table\'s bucket; keep it ONLY in
        # the FIRST shared table (the first-band-wins rule — exactly-once
        # emission with no distinct-pairs shuffle)
        table = batch.column("_table").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (sim >= threshold) & (first_shared == table)
        sub = batch.take(pa.array(np.flatnonzero(keep)))
        return pa.table(
            {
                "id_a": sub.column("id_a"),
                "id_b": sub.column("id_b"),
                "cosine": pa.array(sim[keep], type=pa.float64()),
            }
        )

    return cand.map_batches(verify, batch_format="pyarrow")


def embedding_cosine_pairs_exact(
    ds: ray.data.Dataset,
    emb_col: str,
    id_col: str,
    threshold: float,
    broadcast_limit: int = 2_000_000,
) -> ray.data.Dataset:
    """EXACT all-pairs cosine near-duplicates (small-table verification path).

    Broadcasts the full (unit-normalized) embedding matrix once via
    ``ray.put`` and runs one matmul per input block against it — O(N^2 d)
    but fully vectorized and shuffle-free.  Guarded by ``broadcast_limit``
    rows: beyond that use :func:`embedding_cosine_dedup` (LSH buckets), the
    scale path.  Returns (id_a, id_b, cosine) for id_a < id_b with
    ``cosine >= threshold``.
    """
    mat_parts, id_parts, n_rows = [], [], 0
    for b in ds.select_columns([id_col, emb_col]).iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        # enforce the limit DURING collection so the guard fires before
        # the driver heap fills, not after the whole table is resident
        n_rows += b.num_rows
        if n_rows > broadcast_limit:
            raise ValueError(
                f">{broadcast_limit} rows exceed the exact-path broadcast "
                f"limit; use embedding_cosine_dedup (LSH)"
            )
        id_parts.append(b.column(id_col).to_numpy(zero_copy_only=False))
        mat_parts.append(
            np.stack([np.asarray(e, dtype=np.float64) for e in b.column(emb_col).to_pylist()])
        )
    ids = np.concatenate(id_parts)
    mat = np.concatenate(mat_parts)
    norm = np.linalg.norm(mat, axis=1)
    norm[norm == 0] = 1.0
    unit = mat / norm[:, None]
    order = np.argsort(ids, kind="stable")
    ids, unit = ids[order], unit[order]
    ref = ray.put((ids, unit))
    n = len(ids)
    chunk = max(1, 4_000_000 // max(n, 1))
    starts = list(range(0, n, chunk))
    import ray.data as rd

    def score(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        all_ids, all_unit = ray.get(ref)
        out_a, out_b, out_c = [], [], []
        for s0 in np.asarray(batch["id"], dtype=np.int64):
            s0 = int(s0)
            rows = slice(s0, min(s0 + chunk, n))
            sims = all_unit[rows] @ all_unit.T
            ri, ci = np.nonzero(np.round(sims, 6) >= threshold)
            keep = (ri + s0) < ci  # strict upper triangle: id_a < id_b
            ri, ci = ri[keep], ci[keep]
            out_a.append(all_ids[ri + s0])
            out_b.append(all_ids[ci])
            out_c.append(sims[ri, ci])
        return {
            "id_a": np.concatenate(out_a) if out_a else np.empty(0, dtype=np.int64),
            "id_b": np.concatenate(out_b) if out_b else np.empty(0, dtype=np.int64),
            "cosine": np.concatenate(out_c) if out_c else np.empty(0, dtype=np.float64),
        }

    return rd.from_items(
        [{"id": s} for s in starts], override_num_blocks=len(starts)
    ).map_batches(score, batch_format="numpy", batch_size=None)


def exact_dedup_edges(
    ds: ray.data.Dataset,
    col: str,
    id_col: str,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-row duplicate edges: every row paired with its exact-duplicate
    group's keeper (minimum ``id_col``) — the input to connected
    components, emitted in ONE sorted-run scan.

    Rows shuffle once, range-partitioned by an int64 hash of ``col`` (far
    cheaper to sort than wide strings); within each hash run the group
    function sub-groups by the EXACT value, so a hash collision can never
    merge distinct groups.  This replaces the dedup-then-join-back shape
    (which shuffles the wide column twice — once into the join's build
    side, once probe-side) with a single one-sided exchange.
    """
    from ..functions.hashing import hash64_array
    from ..stages.sortedrun import sorted_group_scan

    def with_hash(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        return {
            id_col: np.asarray(batch[id_col]),
            col: np.asarray(batch[col]),
            "__h": hash64_array(np.asarray(batch[col])).astype(np.int64),
        }

    hashed = ds.select_columns([col, id_col]).map_batches(
        with_hash, batch_format="numpy"
    )

    keep_col = f"keep_{id_col}"

    def group_fn(batch: dict[str, np.ndarray]) -> dict:
        df = pd.DataFrame({col: batch[col], id_col: batch[id_col]})
        keeper = df.groupby(col, dropna=False, sort=False)[id_col].transform(
            "min"
        )
        return {
            id_col: df[id_col].to_numpy(),
            keep_col: keeper.to_numpy(),
        }

    def empty_fn(batch: dict[str, np.ndarray]) -> dict:
        return {
            id_col: np.asarray(batch[id_col])[:0],
            keep_col: np.asarray(batch[id_col])[:0],
        }

    return sorted_group_scan(
        hashed,
        "__h",
        group_fn,
        empty_fn,
        num_partitions or _default_partitions(),
    )
