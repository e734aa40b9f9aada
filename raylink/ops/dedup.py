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

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.strdist import char_jaccard

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_dedup",
    "simhash_signatures",
    "simhash_dedup",
    "ngram_jaccard_dedup",
    "embedding_cosine_dedup",
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
    ds: ray.data.Dataset, col: str, id_col: str
) -> ray.data.Dataset:
    """Exact duplicate groups by ``col``: one row per distinct value with the
    kept (minimum) id and the duplicate count.  Hash-partitioned groupby —
    the canonical 'exact dedup = hash partition + per-group first' shape."""
    from ray.data.aggregate import AggregateFn  # noqa: F401  (doc pointer)

    grouped = ds.groupby(col).aggregate(
        _min_agg(id_col), _count_agg()
    )
    return grouped


def _min_agg(col: str):
    from ray.data.aggregate import Min

    return Min(col, alias_name=f"keep_{col}")


def _count_agg():
    from ray.data.aggregate import Count

    return Count(alias_name="n_dups")


# --------------------------------------------------------------------------
# minhash + LSH
# --------------------------------------------------------------------------


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    b = (text or "").encode("utf-8")
    if len(b) < k:
        return np.array([zlib.crc32(b)], dtype=np.uint64)
    return np.unique(
        np.array(
            [zlib.crc32(b[i : i + k]) for i in range(len(b) - k + 1)],
            dtype=np.uint64,
        )
    )


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


def _bucket_pairs(
    buckets: ray.data.Dataset,
    id_col: str,
    payload_col: str | None,
    bucket_cols: list[str],
    cap: int = 2000,
) -> ray.data.Dataset:
    """Triangle pairs within each bucket (groupby shuffle + vectorized emit).

    Buckets larger than ``cap`` are truncated to their ``cap`` smallest ids
    and flagged via the ``truncated`` column (explicit, never silent).
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
        return out

    return buckets.groupby(bucket_cols).map_groups(gen, batch_format="numpy")


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

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        blobs = batch.column("minhash").to_pylist()
        out_id, out_band, out_hash, out_blob = [], [], [], []
        for i, blob in enumerate(blobs):
            sig = np.frombuffer(blob, dtype=np.uint64)
            for b in range(bands):
                band = sig[b * rows : (b + 1) * rows]
                h = zlib.crc32(band.tobytes(), b) & 0x7FFFFFFF
                out_id.append(i)
                out_band.append(b)
                out_hash.append(h)
                out_blob.append(blob)
        return pa.table(
            {
                id_col: ids.take(pa.array(out_id, type=pa.int64())),
                "band": pa.array(out_band, type=pa.int32()),
                "band_hash": pa.array(out_hash, type=pa.int64()),
                "minhash": pa.array(out_blob, type=pa.binary()),
            }
        )

    # band_hash is 31-bit, so (band, band_hash) packs exactly into one int64
    # bucket key; pair generation + estimation + cross-band dedup then run in
    # ONE sorted-run scan with first-band-wins: a pair is emitted only by the
    # lowest band in which its signatures collide, so no distinct-pairs
    # shuffle is needed afterwards.  (If an earlier colliding bucket was
    # truncated at ``bucket_cap``, the pair is dropped like it would have
    # been there — both designs approximate under truncation.)
    def add_key(batch: pa.Table) -> pa.Table:
        band = batch.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
        bh = batch.column("band_hash").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket_key", pa.array((band << 32) | bh, type=pa.int64())
        )

    banded = sigs.map_batches(band_rows, batch_format="pyarrow").map_batches(
        add_key, batch_format="pyarrow"
    )

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


# --------------------------------------------------------------------------
# simhash
# --------------------------------------------------------------------------


def simhash_signatures(
    ds: ray.data.Dataset, text_col: str, id_col: str
) -> ray.data.Dataset:
    """64-bit simhash over whitespace tokens (crc32-seeded bit votes)."""

    def sig(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        out = np.empty(len(texts), dtype=np.int64)
        bit_cols = np.arange(64, dtype=np.uint64)
        for i, t in enumerate(texts):
            toks = (t or "").split()
            if not toks:
                out[i] = 0
                continue
            hs = np.array(
                [
                    zlib.crc32(tok.encode()) | (zlib.crc32(tok.encode(), 7) << 32)
                    for tok in toks
                ],
                dtype=np.uint64,
            )
            bits = (hs[:, None] >> bit_cols[None, :]) & np.uint64(1)
            votes = bits.sum(axis=0) * 2 - len(toks)
            val = np.uint64(0)
            for b in range(64):
                if votes[b] > 0:
                    val |= np.uint64(1) << np.uint64(b)
            out[i] = np.int64(val.astype(np.int64))
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
    """

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
        sim = np.empty(len(ta), dtype=np.float64)
        for i, (x, y) in enumerate(zip(ta, tb)):
            x = x or ""
            y = y or ""
            if char_set_mode:
                sim[i] = char_jaccard(x, y) if x and y else (1.0 if x == y else 0.0)
            else:
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


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------


def embedding_cosine_dedup(
    ds: ray.data.Dataset,
    emb_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 7,
    bucket_cap: int = 4000,
    dim: int | None = None,
) -> ray.data.Dataset:
    """Near-duplicate pairs by cosine similarity over an embedding column.

    Random-hyperplane LSH: bucket = sign pattern of ``n_planes`` projections
    (collision probability ``(1 - theta/pi)^n``); exact cosine verify inside
    buckets.  The scale path — brute force within buckets only.
    """
    state: dict = {}

    def bucket(batch: pa.Table) -> pa.Table:
        emb = np.stack(
            [np.asarray(e, dtype=np.float64) for e in batch.column(emb_col).to_pylist()]
        )
        if "planes" not in state:
            rng = np.random.default_rng(seed)
            state["planes"] = rng.standard_normal((emb.shape[1], n_planes))
        signs = (emb @ state["planes"]) > 0
        key = np.zeros(len(emb), dtype=np.int64)
        for p in range(n_planes):
            key |= signs[:, p].astype(np.int64) << p
        norm = np.linalg.norm(emb, axis=1)
        norm[norm == 0] = 1.0
        unit = emb / norm[:, None]
        return pa.table(
            {
                id_col: batch.column(id_col),
                "bucket": pa.array(key, type=pa.int64()),
                "unit": pa.array(
                    [u.astype(np.float32).tobytes() for u in unit], type=pa.binary()
                ),
            }
        )

    bucketed = ds.map_batches(bucket, batch_format="pyarrow")
    cand = _bucket_pairs(bucketed, id_col, "unit", ["bucket"], cap=bucket_cap)

    def verify(batch: pa.Table) -> pa.Table:
        ua = batch.column("payload_a").to_pylist()
        ub = batch.column("payload_b").to_pylist()
        sim = np.array(
            [
                float(
                    np.dot(
                        np.frombuffer(x, dtype=np.float32),
                        np.frombuffer(y, dtype=np.float32),
                    )
                )
                for x, y in zip(ua, ub)
            ]
        )
        keep = sim >= threshold
        sub = batch.take(pa.array(np.flatnonzero(keep)))
        return pa.table(
            {
                "id_a": sub.column("id_a"),
                "id_b": sub.column("id_b"),
                "cosine": pa.array(sim[keep], type=pa.float64()),
            }
        )

    return cand.map_batches(verify, batch_format="pyarrow")
