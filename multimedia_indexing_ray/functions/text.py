"""Text analysis kernels: token stats, language-ID heuristic, quality,
fingerprinting (rolling hash), shingles/minhash/simhash primitives.

Large-scale training-data-pipeline operators (engine extensions beyond the
reference; SURVEY.md §2 maps the reference's per-image descriptor stats
`visual/extraction/AbstractFeatureExtractor.java:20-24` to per-document
scalar features).  Counting kernels use RE2 via pyarrow.compute so a SQL
oracle using the same RE2 patterns (DuckDB regexp_*) matches exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"\S+"
# BPE-ish pre-tokenizer (GPT-2 style, minus the RE2-unsupported
# lookahead and the whitespace-run branch): contraction suffixes,
# space-prefixed letter/digit runs, space-prefixed symbol runs.
# RE2-compatible so the pyarrow kernel and DuckDB count identically.
BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"
PUNCT_RE = r"[.,!?;:]"
STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "it")
STOP_RE = r"\b(" + "|".join(STOPWORDS) + r")\b"

# tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic (deterministic; ties broken by this ordering)
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "la", "que", "los", "es"),
    "zh": ("de", "shi", "le", "zai", "he"),
}


def token_count(text) -> np.ndarray:
    """Whitespace token count — the `\\S+` RE2 kernel, the ONLY variant
    bit-identical to the DuckDB oracle: utf8_split_whitespace also splits
    on NBSP/em-space and ascii_split_whitespace also splits on vertical
    tab, both diverging from RE2's \s = [\t\n\f\r ] (verified)."""
    return pc.count_substring_regex(text, TOKEN_RE).to_numpy(zero_copy_only=False).astype(np.int64)


def bpe_token_count(text) -> np.ndarray:
    """Count of BPE-ish pre-tokens — the cheap token-budget estimator
    for training-data pipelines."""
    return pc.count_substring_regex(text, BPE_RE).to_numpy(zero_copy_only=False).astype(np.int64)


def char_count(text) -> np.ndarray:
    return pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)


def punct_count(text) -> np.ndarray:
    return pc.count_substring_regex(text, PUNCT_RE).to_numpy(zero_copy_only=False).astype(np.int64)


def stopword_count(text) -> np.ndarray:
    return pc.count_substring_regex(text, STOP_RE).to_numpy(zero_copy_only=False).astype(np.int64)


# PII-style scrub patterns (RE2, shared verbatim with the DuckDB oracle).
# Email/phone are the classic training-data redaction targets; TERM_RE is
# the domain-term redaction list exercised by the synthetic corpus (whose
# 31-word vocabulary contains no digits/@ — emails/phones verify as zero).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?[0-9][0-9 ().-]{7,}[0-9]"
REDACT_TERM_RE = r"\b(customer|order|value)\b"
REDACT_TOKEN = "[REDACTED]"


def scrub_count(text, pattern: str) -> np.ndarray:
    """Non-overlapping RE2 match count for a scrub pattern."""
    return pc.count_substring_regex(text, pattern).to_numpy(zero_copy_only=False).astype(np.int64)


def scrub_replace(text, pattern: str, replacement: str = REDACT_TOKEN) -> pa.Array:
    """Replace every RE2 match with a redaction token (PII scrub).

    Vectorized `pc.replace_substring_regex`; semantics identical to
    DuckDB `regexp_replace(text, pattern, replacement, 'g')` (both RE2),
    so the scrubbed text is hash-verifiable against the SQL oracle.
    Reference analog: the name-mangling string rewrites of
    `examples/FolderIndexingMT.java:136` generalized to regex redaction.
    """
    out = pc.replace_substring_regex(text, pattern=pattern, replacement=replacement)
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def langid(text) -> np.ndarray:
    """Stopword-marker language-ID heuristic; 'und' when no marker hits."""
    scores = []
    for lang, words in LANG_MARKERS.items():
        patt = r"\b(" + "|".join(words) + r")\b"
        scores.append(pc.count_substring_regex(text, patt).to_numpy(zero_copy_only=False))
    mat = np.stack(scores, axis=1)
    best = np.argmax(mat, axis=1)  # first max wins — deterministic tie rule
    langs = np.array(list(LANG_MARKERS.keys()), dtype=object)
    out = langs[best]
    out[mat.max(axis=1) == 0] = "und"
    return out


def md5_fingerprint(texts: "list[str]") -> "list[str]":
    """Exact content fingerprint (dedup key)."""
    return [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]


def _hash64(tokens: np.ndarray, seed: int) -> np.ndarray:
    """Stable 64-bit hashes of a string array (seeded)."""
    import pandas as pd

    return pd.util.hash_array(tokens, hash_key=f"{seed:016d}"[:16], categorize=False)


def tokenize(text: str) -> "list[str]":
    import re

    return re.findall(TOKEN_RE, text)


# FNV-1a over Unicode code points — a stable hash BOTH numpy (vectorized,
# no per-row loop) and DuckDB SQL (list_reduce over split(s,'') + ascii)
# can compute bit-identically, making sketch operators oracle-checkable.
FNV_BASIS = 2166136261
FNV_BASIS2 = 40389339  # second pass basis for the 64-bit composition
FNV_PRIME = 16777619


def fnv1a32_str(strings: np.ndarray, basis: int = FNV_BASIS) -> np.ndarray:
    """Vectorized FNV-1a-32 over each string's code points.

    Empty-string convention matches the DuckDB fold exactly: DuckDB's
    split('', '') yields [''] with ascii('') = 0, i.e. ONE fold step with
    code point 0 — so an empty string hashes to (basis ^ 0) * prime,
    NOT the bare basis (verified against the SQL).  Iterates over
    CHARACTER POSITIONS (max width), each step a whole-array numpy op —
    no per-row Python."""
    a = np.asarray(strings, dtype="U")
    n = len(a)
    if n == 0:
        return np.empty(0, np.uint64)
    width = max(a.dtype.itemsize // 4, 1)
    cp = a.view(np.uint32).reshape(n, width).astype(np.uint64)
    lens = (cp != 0).sum(axis=1)  # no NUL inside tokens
    h = np.full(n, basis, dtype=np.uint64)
    prime = np.uint64(FNV_PRIME)
    mask32 = np.uint64(0xFFFFFFFF)
    for p in range(int(lens.max()) if n else 0):
        nh = ((h ^ cp[:, p]) * prime) & mask32
        h = np.where(lens > p, nh, h)
    empty = lens == 0
    if empty.any():
        h = np.where(empty, (np.uint64(basis) * prime) & mask32, h)
    return h


def fnv64_str(strings: np.ndarray) -> np.ndarray:
    """64-bit hash = (fnv32(basis1) << 32) | fnv32(basis2) — SQL:
    CAST(pass1 AS UBIGINT) * 4294967296 + pass2."""
    hi = fnv1a32_str(strings, FNV_BASIS)
    lo = fnv1a32_str(strings, FNV_BASIS2)
    return (hi << np.uint64(32)) | lo


def shingles(tokens: "list[str]", k: int = 3) -> "list[str]":
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]


def minhash_signature(shingle_list: "list[str]", num_hashes: int = 64) -> np.ndarray:
    """Min-wise signature via seeded 64-bit hash families (k=num_hashes).

    One base hash per shingle + (a*h+b) universal rehash per family —
    the standard mergeable-sketch construction."""
    if not shingle_list:
        return np.full(num_hashes, np.uint64(2**64 - 1), dtype=np.uint64)
    base = _hash64(np.array(shingle_list, dtype=object), 0)
    rng = np.random.default_rng(12345)
    a = rng.integers(1, 2**61, num_hashes, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 2**61, num_hashes, dtype=np.uint64)
    # (num_hashes, n_shingles) universal hashing, wrap-around arithmetic
    vals = (a[:, None] * base[None, :] + b[:, None])  # uint64 overflow wraps
    return vals.min(axis=1)


def simhash64(tokens: "list[str]") -> np.uint64:
    """64-bit SimHash over token hashes (unweighted, FNV-based so a DuckDB
    oracle can recompute it)."""
    if not tokens:
        return np.uint64(0)
    h = fnv64_str(np.array(tokens, dtype=object))
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    votes = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return out


def flat_tokens(text_col) -> "tuple[np.ndarray, np.ndarray]":
    """Whitespace tokens for a whole Arrow string column, flattened:
    (flat object array of tokens, per-doc token counts).  Tokenization is
    the Arrow C kernel split_pattern_regex — no per-doc Python loop; empty
    tokens from leading/trailing whitespace are dropped (== re.findall)."""
    if isinstance(text_col, pa.Table):
        raise TypeError("pass a column")
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    toks = pc.split_pattern_regex(text_col, pattern=r"\s+")
    n_docs = len(toks)
    counts = np.diff(toks.offsets.to_numpy())
    vals = toks.flatten()
    # empty-token mask computed by the Arrow kernel (not a per-token
    # Python comprehension over an object array)
    nonempty = pc.greater(pc.utf8_length(vals), 0).to_numpy(zero_copy_only=False)
    flat = vals.to_numpy(zero_copy_only=False)
    if not nonempty.all():
        doc_of = np.repeat(np.arange(n_docs), counts)
        flat = flat[nonempty]
        counts = np.bincount(doc_of[nonempty], minlength=n_docs)
    return flat, counts.astype(np.int64)


def distinct_doc_token_pairs(
    text_col,
) -> "tuple[np.ndarray, np.ndarray, np.ndarray]":
    """DISTINCT (document, token) pairs for a whole Arrow string column:
    (doc_idx int64, tok_id int64, uniq_tokens) — the shared kernel behind
    every document-frequency partial (tf-idf, BM25, chi-square): encode
    pairs as doc*|batch_vocab|+tok in int64 (safe while batch_docs x
    batch_vocab < 2^63 — any practical batch), one np.unique dedups.
    A df partial is then ``np.bincount(tok_id, minlength=len(uniq))``."""
    flat, counts = flat_tokens(text_col)
    if len(flat) == 0:
        e = np.array([], np.int64)
        return e, e, np.array([], object)
    doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    uniq, tok_id = np.unique(flat, return_inverse=True)
    pair = np.unique(doc_of * np.int64(len(uniq)) + tok_id)
    return pair // len(uniq), pair % len(uniq), uniq


def repetition_stats(text_col) -> "tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]":
    """Gopher-style repetition signals per document, fully vectorized:
    (n_tokens, n_distinct, top_token_n, top_bigram_n).

    top_token_n = occurrences of the most frequent token; top_bigram_n =
    occurrences of the most frequent adjacent token pair (0 when < 2
    tokens).  Counts (not fractions) so the SQL oracle compares int64
    bit-exactly; quality *ratios* are single divisions downstream.
    Tokenization = the `\\S+` family via flat_tokens (RE2 parity)."""
    flat, counts = flat_tokens(text_col)
    n_docs = len(counts)
    n_distinct = np.zeros(n_docs, np.int64)
    top_token = np.zeros(n_docs, np.int64)
    top_bigram = np.zeros(n_docs, np.int64)
    if len(flat):
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        uniq, tok_id = np.unique(flat, return_inverse=True)
        nv = np.int64(len(uniq))
        key = doc_of * nv + tok_id
        ukey, kcount = np.unique(key, return_counts=True)
        kdoc = ukey // nv
        n_distinct = np.bincount(kdoc, minlength=n_docs).astype(np.int64)
        np.maximum.at(top_token, kdoc, kcount)
        # adjacent pairs within a doc: factorize the pair id first so the
        # (doc, pair) composite key stays within int64
        same = doc_of[1:] == doc_of[:-1]
        if same.any():
            pair = tok_id[:-1][same] * nv + tok_id[1:][same]
            upair, pinv = np.unique(pair, return_inverse=True)
            bkey = doc_of[:-1][same] * np.int64(len(upair)) + pinv
            ub, bcount = np.unique(bkey, return_counts=True)
            np.maximum.at(top_bigram, ub // np.int64(len(upair)), bcount)
    return counts, n_distinct, top_token, top_bigram


def top_term_batch(
    text_col, vocab: np.ndarray, df: np.ndarray
) -> "tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]":
    """Salient-term extraction per document: the token maximizing
    (tf DESC, corpus df ASC, token ASC) — the integer-exact analog of
    tf-idf argmax (rarest-in-corpus breaks tf ties; no float idf, so the
    SQL oracle's row_number() picks the identical term).

    `vocab` must be sorted ascending with `df[i]` = number of docs in the
    WHOLE corpus containing vocab[i] (the broadcast small side).  Returns
    (doc_mask, top_term, tf, df_of_term) where doc_mask marks docs with
    >= 1 token."""
    flat, counts = flat_tokens(text_col)
    n_docs = len(counts)
    mask = counts > 0
    terms = np.empty(n_docs, object)
    tfs = np.zeros(n_docs, np.int64)
    dfs = np.zeros(n_docs, np.int64)
    if len(flat):
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        uniq, tok_id = np.unique(flat, return_inverse=True)
        nv = np.int64(len(uniq))
        ukey, tf = np.unique(doc_of * nv + tok_id, return_counts=True)
        kdoc, ktok = ukey // nv, ukey % nv
        # corpus df lookup for each distinct (doc, token); the contract
        # requires vocab to cover the corpus — verify membership so a
        # missing token fails loudly instead of reading a neighbor's df
        pos = np.clip(np.searchsorted(vocab, uniq[ktok]), 0, len(vocab) - 1)
        if len(vocab) == 0 or not np.all(vocab[pos] == uniq[ktok]):
            missing = uniq[ktok][~(vocab[pos] == uniq[ktok])][:5] if len(vocab) else uniq[:5]
            raise ValueError(f"top_term_batch: tokens missing from vocab: {missing!r}")
        kdf = df[pos]
        # first row per doc after ordering by (tf desc, df asc, token asc);
        # ukey is already sorted by (doc, token asc), so a stable lexsort
        # on (df, -tf, doc) keeps token-asc as the final tie rule
        order = np.lexsort((kdf, -tf, kdoc))
        first = np.unique(kdoc[order], return_index=True)[1]
        sel = order[first]
        terms[kdoc[sel]] = uniq[ktok[sel]]
        tfs[kdoc[sel]] = tf[sel]
        dfs[kdoc[sel]] = kdf[sel]
    return mask, terms, tfs, dfs


def simhash64_batch(text_col) -> np.ndarray:
    """Vectorized SimHash for a whole column: tokenize (Arrow), hash
    (vectorized FNV), per-doc bit votes via segmented reduceat.  Returns
    int64 (two's-complement of the uint64 hash); empty docs -> 0."""
    flat, counts = flat_tokens(text_col)
    n_docs = len(counts)
    sim = np.zeros(n_docs, dtype=np.uint64)
    if len(flat):
        h = fnv64_str(flat)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        contrib = 2 * bits - 1
        nz = counts > 0
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])[nz].astype(np.int64)
        votes = np.add.reduceat(contrib, starts, axis=0)
        bitvals = (votes > 0).astype(np.uint64)
        sim[nz] = (bitvals << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1)
    return sim.astype(np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    return np.array([bin(int(v)).count("1") for v in np.atleast_1d(x)], dtype=np.int64)


def winnow_fingerprints(text: str, k: int = 8, window: int = 4) -> "list[int]":
    """Winnowing document fingerprint: k-gram rolling hashes, min per
    window (Schleimer et al., SIGMOD 2003 — public algorithm)."""
    if len(text) < k:
        return []
    grams = np.array([text[i : i + k] for i in range(len(text) - k + 1)], dtype=object)
    h = fnv1a32_str(grams)  # SQL-recomputable (substr + the same fold)
    if len(h) <= window:
        return [int(h.min())]
    from numpy.lib.stride_tricks import sliding_window_view

    mins = sliding_window_view(h, window).min(axis=1)
    return sorted(set(int(v) for v in mins))


def winnow_sets_batch(
    texts: "list[str]", k: int = 8, window: int = 4, cell_budget: int = 32_000_000
) -> "tuple[np.ndarray, np.ndarray]":
    """Full distinct fingerprint SETS per doc (the winnowing index the
    n_fp/min_fp summary is derived from): returns (flat int64 fingerprints
    in doc order, per-doc counts).  Same length-sorted chunking as
    winnow_batch; each doc's slice is sorted ascending and distinct."""
    n = len(texts)
    counts = np.zeros(n, dtype=np.int64)
    if n == 0:
        return np.empty(0, np.int64), counts
    lens_all = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    order = np.argsort(lens_all, kind="stable")
    chunk_idx, chunk_counts, chunk_flat = [], [], []
    start = 0
    while start < n:
        end = start + 1
        while end < n:
            w = max(int(lens_all[order[end]]), 1)
            if (end - start + 1) * w > cell_budget:
                break
            end += 1
        idx = order[start:end]
        nf, _, flat = _winnow_chunk([texts[i] for i in idx], k, window, collect=True)
        counts[idx] = nf
        chunk_idx.append(idx)
        chunk_counts.append(nf)
        chunk_flat.append(flat)
        start = end
    all_idx = np.concatenate(chunk_idx)
    all_counts = np.concatenate(chunk_counts)
    all_flat = np.concatenate(chunk_flat) if chunk_flat else np.empty(0, np.int64)
    # reorder the chunk-concatenated fps back to original doc order with a
    # vectorized repeat/gather (no per-doc slicing loop)
    offs = np.concatenate([[0], np.cumsum(all_counts)])
    pos = np.argsort(all_idx, kind="stable")
    lens = all_counts[pos]
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64), counts
    inner = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(lens)[:-1]]), lens
    )
    gather = np.repeat(offs[pos], lens) + inner
    return all_flat[gather], counts


def winnow_batch(
    texts: "list[str]", k: int = 8, window: int = 4, cell_budget: int = 32_000_000
) -> "tuple[np.ndarray, np.ndarray]":
    """Vectorized winnowing over a whole batch: codepoint matrices, FNV
    over k-gram windows in k vector steps, window-min via a stride view —
    no per-doc Python.  Returns (n_fingerprints int64, min_fingerprint
    int64) per doc, identical to winnow_fingerprints.

    The 'U' matrix pads every doc to the longest doc's width, so docs are
    processed in LENGTH-SORTED chunks bounded by ``cell_budget`` cells —
    one long document cannot inflate the whole batch's memory n_docs-fold."""
    n = len(texts)
    n_fp = np.zeros(n, dtype=np.int64)
    min_fp = np.zeros(n, dtype=np.int64)
    if n == 0:
        return n_fp, min_fp
    lens_all = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    order = np.argsort(lens_all, kind="stable")
    start = 0
    while start < n:
        end = start + 1
        width = max(int(lens_all[order[end - 1]]), 1)
        while end < n:
            w = max(int(lens_all[order[end]]), 1)
            if (end - start + 1) * w > cell_budget:
                break
            width = w
            end += 1
        idx = order[start:end]
        nf, mf = _winnow_chunk([texts[i] for i in idx], k, window)
        n_fp[idx] = nf
        min_fp[idx] = mf
        start = end
    return n_fp, min_fp


def _winnow_chunk(
    texts: "list[str]", k: int, window: int, collect: bool = False
):
    """Returns (n_fp, min_fp) — and, with collect=True, additionally the
    flat int64 array of each row's distinct fingerprints in chunk-row
    order (each row's slice sorted ascending)."""
    from numpy.lib.stride_tricks import sliding_window_view

    n = len(texts)
    n_fp = np.zeros(n, dtype=np.int64)
    min_fp = np.zeros(n, dtype=np.int64)
    if n == 0:
        return (n_fp, min_fp, np.empty(0, np.int64)) if collect else (n_fp, min_fp)
    a = np.asarray(texts, dtype="U")
    width = max(a.dtype.itemsize // 4, 1)
    if width < k:
        return (n_fp, min_fp, np.empty(0, np.int64)) if collect else (n_fp, min_fp)
    cp = a.view(np.uint32).reshape(n, width).astype(np.uint64)
    lens = (cp != 0).sum(axis=1)
    # FNV-1a over each k-codepoint window: k vector steps on (n, width-k+1)
    grams = sliding_window_view(cp, k, axis=1)  # (n, width-k+1, k) view
    h = np.full(grams.shape[:2], FNV_BASIS, dtype=np.uint64)
    prime = np.uint64(FNV_PRIME)
    mask32 = np.uint64(0xFFFFFFFF)
    for j in range(k):
        h = ((h ^ grams[:, :, j]) * prime) & mask32
    n_grams = np.maximum(lens - k + 1, 0)
    pos = np.arange(h.shape[1])[None, :]
    invalid = pos >= n_grams[:, None]
    h = np.where(invalid, np.uint64(2**63), h)  # sentinel > any fnv32
    # window-of-`window` minima over valid gram positions
    if h.shape[1] >= window:
        wmins = sliding_window_view(h, window, axis=1).min(axis=2)
    else:
        wmins = h.min(axis=1, keepdims=True)
    n_mins = np.where(n_grams > window, n_grams - window + 1, (n_grams > 0).astype(np.int64))
    # short docs (<= window grams): single fingerprint = min of all grams
    few = (n_grams > 0) & (n_grams <= window)
    many = n_grams > window
    uniq = None
    srt = None
    if many.any():
        wm = wmins[many]
        mpos = np.arange(wm.shape[1])[None, :]
        wm = np.where(mpos >= n_mins[many][:, None], np.uint64(2**63), wm)
        srt = np.sort(wm, axis=1)
        valid = srt < np.uint64(2**63)
        uniq = valid.copy()
        uniq[:, 1:] &= srt[:, 1:] != srt[:, :-1]
        n_fp[many] = uniq.sum(axis=1)
        min_fp[many] = srt[:, 0].astype(np.int64)
    if few.any():
        min_fp[few] = h[few].min(axis=1).astype(np.int64)  # h sentinel-masked
        n_fp[few] = 1
    if not collect:
        return n_fp, min_fp
    # flat per-row distinct fp sets in chunk-row order: place the "many"
    # rows' mask-selected values and the "few" rows' single min with one
    # repeat/gather each (row-major boolean indexing preserves row order)
    offs = np.concatenate([[0], np.cumsum(n_fp)])
    flat = np.empty(int(offs[-1]), dtype=np.int64)
    if many.any():
        rows = np.flatnonzero(many)
        lens = n_fp[rows]
        inner = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(lens)[:-1]]), lens
        )
        tgt = np.repeat(offs[rows], lens) + inner
        flat[tgt] = srt[uniq].astype(np.int64)
    if few.any():
        flat[offs[np.flatnonzero(few)]] = min_fp[few]
    return n_fp, min_fp, flat


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def normalize_nfc_truncate(texts: "list[str]", max_chars: int) -> "tuple[list[str], list[int]]":
    """NFC-normalize + truncate to max_chars codepoints (the text analog
    of the reference's max-pixels rescale, `visual/extraction/ImageScaling.java:96-155`).

    Uses unicodedata (matches DuckDB's nfc_normalize); pyarrow's
    utf8_normalize was observed NOT to compose in this environment.
    """
    import unicodedata

    norm = [unicodedata.normalize("NFC", t) for t in texts]
    return [t[:max_chars] for t in norm], [len(t) for t in norm]


def chunk_tokens(text_col, doc_ids: np.ndarray, width: int):
    """Token-budget chunking for a whole batch: returns (doc_id,
    chunk_idx, chunk_text, n_tokens) numpy/Arrow arrays.  Chunks tile the
    batch's flat token array exactly, so the batch needs ONE ListArray
    build and ONE Arrow binary_join — no per-doc Python.  Empty docs emit
    no chunks."""
    flat, counts = flat_tokens(text_col)
    if len(flat) == 0:
        e = np.empty(0, np.int64)
        return e, e, pa.array([], pa.string()), e
    n_chunks = -(-counts // width)
    doc_of_chunk = np.repeat(np.arange(len(counts), dtype=np.int64), n_chunks)
    total = int(n_chunks.sum())
    inner = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(n_chunks)[:-1]]), n_chunks
    )
    doc_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    starts = doc_start[doc_of_chunk] + width * inner
    offsets = np.concatenate([starts, [len(flat)]]).astype(np.int64)
    lst = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()) if len(flat) < 2**31 else pa.array(offsets),
        pa.array(flat, pa.string()),
    )
    import pyarrow.compute as _pc

    return (
        doc_ids[doc_of_chunk],
        inner,
        _pc.binary_join(lst, " "),
        np.diff(offsets).astype(np.int64),
    )
