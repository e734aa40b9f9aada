"""Dataset-level text-analysis operators (map_batches over pyarrow)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions import textstats

__all__ = [
    "with_token_counts",
    "with_language_id",
    "with_quality_scores",
    "with_fingerprints",
    "chunk_documents",
    "mark_contaminated",
    "mark_contaminated_ngrams",
    "ngram_set",
    "token_frequency_scores",
    "redact_text",
    "repetition_scores",
    "token_ngram_windows",
    "token_window_hashes",
    "token_window_hash_starts",
    "extract_pattern",
    "normalize_text",
    "with_bpe_token_counts",
    "BPE_PRETOKEN_PATTERN",
]


def with_token_counts(
    ds: ray.data.Dataset, text_col: str = "text", out_col: str = "n_tokens"
) -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        t = batch.column(text_col).to_numpy(zero_copy_only=False)
        return batch.append_column(
            out_col, pa.array(textstats.token_counts(t), type=pa.int64())
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def with_language_id(
    ds: ray.data.Dataset,
    text_col: str = "text",
    out_col: str = "lang_pred",
    default: str = "und",
    method: str = "stopwords",
) -> ray.data.Dataset:
    """Append a language guess per document.

    ``method="stopwords"`` is the cheap screening heuristic (top-15
    function-word vote per language — fast, weak on short or
    shared-vocabulary text); ``method="trigram"`` is the real
    classifier: character-trigram log-likelihood profiles
    (:mod:`raylink.functions.langprofiles`), built once per worker
    process and scored fully vectorized.
    """
    if method == "stopwords":
        classify = textstats.language_id
    elif method == "trigram":
        from ..functions.langprofiles import trigram_language_id as classify
    else:
        raise ValueError(f"unknown language-id method: {method!r}")

    def fn(batch: pa.Table) -> pa.Table:
        t = batch.column(text_col).to_numpy(zero_copy_only=False)
        return batch.append_column(
            out_col,
            pa.array(classify(t, default=default), type=pa.string()),
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def with_quality_scores(
    ds: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        t = batch.column(text_col).to_numpy(zero_copy_only=False)
        cols = textstats.quality_scores(t)
        out = batch
        for name, arr in cols.items():
            if name in batch.column_names:
                continue
            out = out.append_column(name, pa.array(arr))
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def with_fingerprints(
    ds: ray.data.Dataset,
    text_col: str = "text",
    winnow: bool = False,
    k: int = 8,
    window: int = 4,
) -> ray.data.Dataset:
    """Add ``fingerprint`` (whole-doc rolling hash); optionally
    ``winnow_fps`` (packed int64 winnowing fingerprints)."""

    def fn(batch: pa.Table) -> pa.Table:
        t = batch.column(text_col).to_numpy(zero_copy_only=False)
        out = batch.append_column(
            "fingerprint",
            pa.array(textstats.doc_fingerprint(t), type=pa.int64()),
        )
        if winnow:
            blobs = [
                textstats.winnowing_fingerprints(x or "", k=k, window=window).tobytes()
                for x in t
            ]
            out = out.append_column("winnow_fps", pa.array(blobs, type=pa.binary()))
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def chunk_documents(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 64,
    overlap: int = 16,
) -> ray.data.Dataset:
    """Split documents into overlapping fixed-token-window chunks (the
    standard LLM-training prep step): chunk ``i`` covers whitespace tokens
    ``[i*stride, i*stride + max_tokens)`` with ``stride = max_tokens -
    overlap``; the last chunk is the first one reaching the end.  Every
    doc yields >= 1 chunk (empty text -> one empty chunk), so no document
    is silently dropped.

    A flat_map-shaped batch transform: output rows ~= input rows x
    (n_tokens / stride), each batch expanded locally — no shuffle at all.
    """
    if overlap >= max_tokens:
        raise ValueError("overlap must be < max_tokens")
    stride = max_tokens - overlap

    def fn(batch: pa.Table) -> pa.Table:
        import pandas as pd

        texts = pd.Series(
            batch.column(text_col).to_numpy(zero_copy_only=False),
            dtype="object",
        ).fillna("")
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        toks = texts.str.findall(r"\S+")
        n = toks.str.len().to_numpy(np.int64)
        n_chunks = np.where(
            n <= max_tokens, 1, -(-(n - overlap) // stride)
        ).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(n)), n_chunks)
        chunk_idx = np.arange(len(doc_idx)) - np.repeat(
            np.concatenate(([0], np.cumsum(n_chunks)[:-1])), n_chunks
        )
        starts = chunk_idx * stride
        ends = np.minimum(starts + max_tokens, n[doc_idx])
        tok_lists = toks.to_numpy()
        chunk_text = [
            " ".join(tok_lists[d][s:e])
            for d, s, e in zip(doc_idx, starts, ends)
        ]
        return pa.table(
            {
                id_col: pa.array(ids[doc_idx]),
                "chunk_idx": pa.array(chunk_idx),
                "chunk_text": pa.array(chunk_text, type=pa.string()),
                "n_tokens": pa.array(ends - starts),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def mark_contaminated(
    ds: ray.data.Dataset,
    probes: list[str],
    text_col: str = "text",
    out_col: str = "contaminated",
) -> ray.data.Dataset:
    """Benchmark decontamination: flag documents containing ANY probe as an
    exact substring (the standard test-set leakage check).

    The probe set is the SMALL side: shipped once inside the transform
    closure (Ray serializes it per task graph, not per batch) and scanned
    with one vectorized ``str.contains(regex alternation)`` pass per batch
    — never a join, never a shuffle.  For probe sets beyond closure size,
    move them to ``ray.put`` and resolve in ``__init__`` of an actor-pool
    stage (same pattern as the multimodal decoders).
    """
    import re as _re

    if not probes:
        raise ValueError("probes must be non-empty")
    pat = "|".join(_re.escape(p) for p in probes)

    def fn(batch: pa.Table) -> pa.Table:
        import pandas as pd

        s = pd.Series(
            batch.column(text_col).to_numpy(zero_copy_only=False),
            dtype="object",
        ).fillna("")
        hit = s.str.contains(pat, regex=True).to_numpy()
        return batch.append_column(out_col, pa.array(hit, type=pa.bool_()))

    return ds.map_batches(fn, batch_format="pyarrow")


def token_frequency_scores(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_vocab: int = 1 << 20,
) -> ray.data.Dataset:
    """Corpus-frequency document scoring — the train-then-score shape of a
    model-based quality filter: pass 1 builds the unigram count model
    (per-block combine -> driver merge, capped at ``max_vocab`` most
    frequent tokens with an explicit flag), broadcast once via
    ``ray.put``; pass 2 scores each doc with one exploded ``map`` +
    ``groupby-sum`` per batch.

    Scores stay in INTEGER space (sum of corpus counts over the doc's
    tokens + token count) so the result is exactly reproducible across
    engines; callers derive mean-frequency / rarity ratios downstream.
    Docs whose tokens are all outside the (capped) vocab, or empty docs,
    are dropped — inner-join semantics.
    """
    import pandas as pd

    import ray as _ray

    def explode_counts(batch: pa.Table) -> pa.Table:
        s = pd.Series(
            batch.column(text_col).to_numpy(zero_copy_only=False),
            dtype="object",
        ).fillna("")
        toks = s.str.split().explode()
        toks = toks[toks.notna()]
        uniq, cnt = np.unique(toks.to_numpy(), return_counts=True)
        return pa.table(
            {
                "token": pa.array(uniq, type=pa.string()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    parts_ds = (
        ds.select_columns([text_col])
        .map_batches(explode_counts, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    if parts_ds.count() > 5_000_000:
        # giant-vocab path: merge the per-block partials distributed and
        # keep only the top max_vocab before anything reaches the driver
        from ..stages.sortedrun import sorted_group_scan

        def merge(group: dict[str, np.ndarray]) -> dict:
            return {
                "token": np.asarray(group["token"])[:1],
                "n": np.asarray([np.sum(group["n"])], dtype=np.int64),
            }

        def empty(batch: dict[str, np.ndarray]) -> dict:
            return {
                "token": np.asarray(batch["token"])[:0],
                "n": np.empty(0, dtype=np.int64),
            }

        parts_ds = sorted_group_scan(
            parts_ds, "token", merge, empty, 64
        ).sort("n", descending=True).limit(max_vocab)
    parts = parts_ds.to_pandas()
    vocab = parts.groupby("token")["n"].sum()
    if len(vocab) > max_vocab:
        vocab = vocab.sort_values(ascending=False).head(max_vocab)
    vocab_ref = _ray.put(vocab)

    def score(batch: pa.Table) -> pa.Table:
        v = _ray.get(vocab_ref)
        s = pd.Series(
            batch.column(text_col).to_numpy(zero_copy_only=False),
            dtype="object",
        ).fillna("")
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        toks = s.str.split().explode()
        toks = toks[toks.notna()]
        freq = toks.map(v)
        ok = freq.notna()
        df = pd.DataFrame(
            {
                "i": toks.index.to_numpy()[ok.to_numpy()],
                "f": freq[ok].to_numpy(np.int64),
            }
        )
        g = df.groupby("i")["f"].agg(["sum", "count"])
        return pa.table(
            {
                id_col: pa.array(ids[g.index.to_numpy()]),
                "freq_sum": pa.array(g["sum"].to_numpy().astype(np.int64)),
                "n_vocab_tokens": pa.array(
                    g["count"].to_numpy().astype(np.int64)
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def redact_text(
    ds: ray.data.Dataset,
    text_col: str = "text",
    rules: list[tuple[str, str]] | None = None,
    out_col: str = "text_redacted",
    count_col: str = "n_redactions",
) -> ray.data.Dataset:
    """Regex redaction / PII scrubbing: apply ``rules`` — a list of
    ``(pattern, replacement)`` — left to right to ``text_col``, appending
    the scrubbed text and the total match count.

    Map-only (zero shuffle); patterns compile ONCE per task closure, and
    each rule runs as one vectorized ``pandas.str`` kernel over the whole
    batch — no per-row Python.  Patterns must stay in the RE2-compatible
    subset (no backrefs/lookarounds) so the DuckDB ``regexp_replace(...,
    'g')`` oracle computes the identical transform.

    Default rules are placeholder entity masks for the synthetic corpus;
    real PII rules (emails, phone numbers, SSNs) are plain character-class
    regexes and drop straight in.
    """
    import re

    if rules is None:
        rules = [
            (r"\bcustomer\b", "<ENTITY>"),
            (r"\b(key|hash)\b", "<TOKEN>"),
        ]
    compiled = [(re.compile(p), r) for p, r in rules]

    def fn(batch: pa.Table) -> pa.Table:
        import pandas as pd

        s = pd.Series(
            batch.column(text_col).to_numpy(zero_copy_only=False),
            dtype="object",
        ).fillna("")
        n = np.zeros(len(s), dtype=np.int64)
        for pat, repl in compiled:
            n += s.str.count(pat).to_numpy(np.int64)
            s = s.str.replace(pat, repl, regex=True)
        batch = batch.append_column(out_col, pa.array(s, type=pa.string()))
        return batch.append_column(count_col, pa.array(n, type=pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def repetition_scores(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    passthrough: bool = False,
) -> ray.data.Dataset:
    """Gopher-style repetition signals: per document, the whitespace-token
    count, distinct-token count, modal-token count, and the duplicate-token
    ratio ``(n_words - n_distinct) / max(n_words, 1)`` as half-up e4 fixed
    point — the standard "excessively repetitive document" quality filter.

    Map-only (each doc's counts depend only on itself); the per-batch
    kernel is pandas ``split + explode`` and two C-speed groupbys — no
    per-row Python.  Integer counts + fixed-point ratio make the output
    exactly reproducible, so the DuckDB oracle (unnest + group by) matches
    bit-for-bit.
    """
    import pandas as pd

    def fn(batch: pa.Table) -> pa.Table:
        s = pd.Series(
            batch.column(text_col).to_numpy(zero_copy_only=False),
            dtype="object",
        ).fillna("")
        n = len(s)
        toks = s.str.split().explode()
        toks = toks[toks.notna()]
        n_words = np.zeros(n, dtype=np.int64)
        n_distinct = np.zeros(n, dtype=np.int64)
        top_count = np.zeros(n, dtype=np.int64)
        if len(toks):
            df = pd.DataFrame(
                {"i": toks.index.to_numpy(np.int64), "w": toks.to_numpy()}
            )
            per = df.groupby(["i", "w"], sort=False).size()
            lvl = per.index.get_level_values(0).to_numpy(np.int64)
            cnt = per.to_numpy(np.int64)
            np.add.at(n_words, lvl, cnt)
            np.add.at(n_distinct, lvl, 1)
            np.maximum.at(top_count, lvl, cnt)
        dup_e4 = np.floor(
            (n_words - n_distinct) / np.maximum(n_words, 1) * 10000 + 0.5
        ).astype(np.int64)
        sig = {
            "n_words": pa.array(n_words),
            "n_distinct_words": pa.array(n_distinct),
            "top_word_count": pa.array(top_count),
            "dup_ratio_e4": pa.array(dup_e4),
        }
        if passthrough:
            out = batch
            for name, arr in sig.items():
                out = out.append_column(name, arr)
            return out
        return pa.table({id_col: batch.column(id_col), **sig})

    return ds.map_batches(fn, batch_format="pyarrow")


def ngram_set(texts, n: int) -> set[str]:
    """All word ``n``-grams (single-space-joined) of the given texts —
    whitespace tokenization, same normalization as
    :func:`mark_contaminated_ngrams`'s document side.  Driver-side:
    probe sets are eval benchmarks, small by definition."""
    out: set[str] = set()
    for t in texts:
        toks = str(t or "").split()
        for i in range(len(toks) - n + 1):
            out.add(" ".join(toks[i : i + n]))
    return out


def _explode_tokens(texts):
    """ONE tokenization for every window kernel: flat whitespace tokens,
    each token's positional row index, and per-row token counts."""
    import pandas as pd

    s = pd.Series(texts, dtype="object").fillna("").astype(str)
    s = s.reset_index(drop=True)
    e = s.str.split().explode()
    e = e[e.notna()]
    flat = e.to_numpy(dtype=object)
    doc_pos = e.index.to_numpy()
    tok_counts = np.zeros(len(s), dtype=np.int64)
    if len(doc_pos):
        np.add.at(tok_counts, doc_pos, 1)
    return flat, doc_pos, tok_counts


def token_ngram_windows(texts, n: int):
    """Every in-document window of ``n`` consecutive whitespace tokens,
    vectorized (one explode + ``n-1`` shifted object-array concats).

    Returns ``(doc_pos, grams, tok_counts)``: the positional row index of
    each valid window, the single-space-joined n-gram strings, and the
    per-row token counts.  Windows never cross document boundaries.  The
    shared kernel behind :func:`mark_contaminated_ngrams` and the Bloom
    decontaminator; :func:`token_window_hashes` is the sibling that
    hashes windows without materializing the strings.
    """
    flat, doc_pos, tok_counts = _explode_tokens(texts)
    m = len(flat)
    if m < n:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=object),
            tok_counts,
        )
    k = m - n + 1
    ng = flat[:k].copy()
    for j in range(1, n):
        ng = ng + " "
        ng = ng + flat[j : k + j]
    valid = doc_pos[:k] == doc_pos[n - 1 :]
    return doc_pos[:k][valid], ng[valid], tok_counts


def token_window_hashes(texts, n: int):
    """Hash variant of :func:`token_ngram_windows`: one SipHash pass
    over the tokens, then ``n-1`` vectorized order-dependent combines
    over shifted views — measured 2× cheaper than building the joined
    n-gram strings on a 4M-doc corpus, with the same collision
    guarantee (identical token sequences collide by construction,
    distinct ones at ~2^-63).

    Returns ``(doc_pos, window_hashes_uint64, tok_counts)``; same
    tokenization and cross-document-boundary exclusion as the string
    sibling (both build on :func:`_explode_tokens`).
    """
    doc_pos, _, h, tok_counts = token_window_hash_starts(texts, n)
    return doc_pos, h, tok_counts


def token_window_hash_starts(texts, n: int, check_hash: bool = False):
    """:func:`token_window_hashes` plus each window's WITHIN-document
    start token index — returns ``(doc_pos, win_start, window_hashes,
    tok_counts)``.  ``win_start[i]`` is the 0-based position of the
    window's first token inside its own document, the coordinate a
    span-removal pass needs to map a duplicated gram back onto the
    document's token array.

    With ``check_hash=True`` a fifth element is appended: a SECOND
    window hash built from a re-keyed (genuinely independent) SipHash
    over the same tokens.  Two distinct n-grams collide only if they
    collide in BOTH families (~2^-128 per pair), which a destructive
    consumer (span REMOVAL) needs where the stats sibling tolerates the
    single-family rate."""
    from ..functions.hashing import combine_hashes, hash64_array

    flat, doc_pos, tok_counts = _explode_tokens(texts)
    m = len(flat)
    if m < n:
        empty = (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.uint64),
            tok_counts,
        )
        return empty + (np.empty(0, dtype=np.uint64),) if check_hash else empty

    def windows(th: np.ndarray, k: int) -> np.ndarray:
        h = th[:k].copy()
        for j in range(1, n):
            h = combine_hashes(h, th[j : k + j])
        return h

    k = m - n + 1
    h = windows(hash64_array(flat), k)
    valid = doc_pos[:k] == doc_pos[n - 1 :]
    vpos = np.flatnonzero(valid)
    vdoc = doc_pos[vpos]
    # within-doc start = flat index minus the doc's first flat index
    doc_first_flat = np.concatenate(
        [[0], np.cumsum(tok_counts, dtype=np.int64)]
    )[:-1]
    win_start = vpos - doc_first_flat[vdoc]
    out = (vdoc, win_start.astype(np.int64), h[valid], tok_counts)
    if check_hash:
        h2 = windows(
            hash64_array(flat, hash_key="raylink-spanchk!"), k
        )
        out = out + (h2[valid],)
    return out


def mark_contaminated_ngrams(
    ds: ray.data.Dataset,
    probe_ngrams: set[str],
    n: int,
    text_col: str = "text",
    out_col: str = "contaminated",
) -> ray.data.Dataset:
    """Benchmark decontamination by token n-gram overlap (the GPT-3 /
    Pile convention, stricter than substring probes): a document is
    contaminated iff ANY window of ``n`` consecutive whitespace tokens
    equals a probe n-gram.

    Scale design: the probe n-gram set is broadcast once (``ray.put``);
    each batch tokenizes via one vectorized explode, builds every
    in-document window with ``n-1`` shifted object-array concatenations
    (no per-row Python), and flags via one ``isin`` — map-only, no
    shuffle, the corpus streams through.  Windows never cross document
    boundaries.
    """
    import pandas as pd
    import ray as _ray

    probe_ref = _ray.put(pd.Index(sorted(probe_ngrams)))

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].to_numpy(dtype=object)
        doc_pos, grams, _ = token_ngram_windows(texts, n)
        flagged = np.zeros(len(batch), dtype=bool)
        if len(grams):
            hits = pd.Series(grams).isin(_ray.get(probe_ref)).to_numpy()
            flagged[np.unique(doc_pos[hits])] = True
        out = batch.reset_index(drop=True)
        out[out_col] = flagged
        return out

    return ds.map_batches(fn, batch_format="pandas")


def extract_pattern(
    ds: ray.data.Dataset,
    pattern: str,
    col: str = "text",
    out_col: str = "extracted",
    group: int = 1,
) -> ray.data.Dataset:
    """Vectorized regex capture: first match of ``pattern``'s capture
    ``group`` per row, null when the pattern (or the input) is missing —
    the structured-field-extraction primitive (ids out of URLs, versions
    out of headers, numbers out of logs).

    Map-only; the regex compiles ONCE per worker process via the
    module-level pandas machinery (``str.extract`` caches compiled
    patterns), so the corpus streams through at C speed.  Stick to the
    RE2-compatible subset (no backreferences/lookbehind) if the result
    must match a ``regexp_extract`` SQL oracle.
    """
    import re as _re

    compiled = _re.compile(pattern)
    if compiled.groups < group or group < 1:
        raise ValueError(
            f"pattern has {compiled.groups} capture group(s); "
            f"requested group {group}"
        )

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[col].astype("object")
        # index by POSITION: str.extract names columns after named
        # capture groups, so label indexing [group - 1] would KeyError
        # on e.g. (?P<num>...)
        ext = s.str.extract(compiled, expand=True).iloc[:, group - 1]
        out = batch.copy()
        out[out_col] = ext.where(ext.notna(), None).astype("object")
        return out

    return ds.map_batches(fn, batch_format="pandas")


def normalize_text(
    ds: ray.data.Dataset,
    col: str = "text",
    out_col: str = "text_norm",
    form: str = "NFC",
    lowercase: bool = True,
    collapse_whitespace: bool = True,
) -> ray.data.Dataset:
    """Canonical text normalization for dedup/compare keys: Unicode
    normalization (NFC by default — é composed vs decomposed become one
    byte sequence), lowercasing, and whitespace-run collapse+trim.
    Nulls stay null.

    Map-only, vectorized pandas ``.str`` kernels; the standard
    pre-pass before exact dedup or fingerprinting so byte-level
    variants of the same text collide.  The whitespace class is an
    EXPLICIT character set (ASCII controls + every Unicode White_Space
    code point) rather than ``\\s``, because Python's ``\\s`` is
    Unicode-wide while RE2's (DuckDB's) is ASCII-only — the explicit
    class makes the engine and the ``normalize_docs`` SQL oracle
    byte-identical on NBSP / line-separator / CJK-space inputs too.
    """
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown Unicode normalization form: {form!r}")

    ws_class = (
        "[\\t\\n\\x0b\\x0c\\r\\x1c-\\x1f \\x85\\xa0\\u1680"
        "\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000]+"
    )

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        import pandas as pd

        s = batch[col].astype("object")
        mask = s.notna()
        t = s[mask].astype(str).str.normalize(form)
        if lowercase:
            t = t.str.lower()
        if collapse_whitespace:
            # runs collapse to one ASCII space; edge runs become a
            # single leading/trailing space, removed by the plain-space
            # strip (mirrors SQL trim(), which strips spaces only)
            t = t.str.replace(ws_class, " ", regex=True).str.strip(" ")
        out = batch.copy()
        res = pd.Series([None] * len(batch), dtype="object", index=s.index)
        res[mask] = t
        out[out_col] = res
        return out

    return ds.map_batches(fn, batch_format="pandas")


# GPT-2-style pre-tokenizer, RE2-compatible subset: letter runs, digit
# runs, punctuation runs (each absorbing one leading space), whitespace
# runs.  Explicit ASCII whitespace class — NOT \s — so the engine
# (Python re, Unicode \s) and the SQL oracle (RE2, ASCII \s) tokenize
# byte-identically; non-ASCII whitespace lands in the punctuation class
# on BOTH sides.
BPE_PRETOKEN_PATTERN = (
    r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r\x0b\x0c]+"
    r"|[ \t\n\r\x0b\x0c]+"
)


def with_bpe_token_counts(
    ds: ray.data.Dataset,
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
) -> ray.data.Dataset:
    """Per-document count of BPE-style PRE-tokens (the GPT-2 pretokenizer
    shape: a subword tokenizer splits within these, never across them) —
    the standard cheap proxy for real tokenizer counts when sizing
    training mixes, next to the whitespace counter
    (:func:`with_token_counts`).  Null text counts 0.

    Map-only; one compiled-regex ``str.findall``-length pass per batch.
    """
    import re as _re

    compiled = _re.compile(BPE_PRETOKEN_PATTERN)

    def fn(batch: pa.Table) -> pa.Table:
        import pandas as pd

        s = pd.Series(
            batch.column(text_col).to_numpy(zero_copy_only=False),
            dtype="object",
        ).fillna("")
        n = s.str.count(compiled).to_numpy(dtype=np.int64)
        return batch.append_column(out_col, pa.array(n, type=pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")
