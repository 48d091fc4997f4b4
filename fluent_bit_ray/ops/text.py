"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting — all vectorized or tight-loop per batch, no external
models (deterministic heuristics suitable for a 100 TB first-pass filter).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "du", "que"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "que", "en"},
}


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token + byte counts, fully vectorized (no Python loop).
    Null text is an empty document (0 bytes, 0 tokens) — the package-wide
    fill_null(text, '') contract, matched by the oracle's coalesce."""
    text = pc.fill_null(batch[text_col], "")
    trimmed = pc.utf8_trim_whitespace(text)
    tokens = pc.utf8_split_whitespace(trimmed)
    # split('') yields [''], not []: empty/whitespace-only text has 0 tokens
    counts = pc.if_else(
        pc.equal(trimmed, ""),
        pa.scalar(0, pa.int64()),
        pc.cast(pc.list_value_length(tokens), pa.int64()),
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_bytes": pc.cast(pc.binary_length(text), pa.int64()),
            "n_tokens": counts,
        }
    )


_BPE_ISH = None


def bpe_ish_token_count(texts: list[str]) -> list[int]:
    """BPE-ish subword count: GPT-2-style pre-tokenizer regex (public)."""
    global _BPE_ISH
    if _BPE_ISH is None:
        import re

        _BPE_ISH = re.compile(
            r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
        )
    return [len(_BPE_ISH.findall(t or "")) for t in texts]


def _doc_tokens(text_col) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Shared tokenizer: (flat token array, per-doc flat bounds, n_tokens).

    Matches str.split() via trim + utf8_split_whitespace (Unicode
    whitespace, like Python's split; ~5x faster than the regex `\\s+`
    kernel and identical on ASCII-whitespace text, which is what the SQL
    oracles' string_split_regex(trim(text), '\\s+') checks against);
    empty/whitespace-only docs count 0 tokens but still contribute one ''
    entry to the flat array (harmless: '' has length 0 and is never a
    stopword).
    """
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    trimmed = pc.utf8_trim_whitespace(pc.fill_null(text_col, ""))
    lists = pc.utf8_split_whitespace(trimmed)
    raw = np.asarray(pc.list_value_length(lists)).astype(np.int64)
    n_tokens = np.where(np.asarray(pc.equal(trimmed, "")), 0, raw)
    bounds = np.concatenate(([0], np.cumsum(raw)))
    return pc.list_flatten(lists), bounds, n_tokens


def _per_doc_sum(values: np.ndarray, bounds: np.ndarray) -> np.ndarray:
    # int64 accumulator for integer/bool inputs (exact), float64 for floats
    # (a hardcoded int64 here silently truncated unigram_logprob's NLLs).
    dtype = (np.float64 if np.issubdtype(np.asarray(values).dtype, np.floating)
             else np.int64)
    cs = np.concatenate(([0], np.cumsum(values, dtype=dtype)))
    return cs[bounds[1:]] - cs[bounds[:-1]]


def token_count_partial(col) -> pa.Table:
    """Map-side unigram partial: whitespace-tokenize a string column and
    value_count the non-empty tokens. The shared first stage of
    unigram_logprob, pmi_collocations and the CMS exact check — one
    tokenizer contract, one place to fix it. Returns (token, cnt)."""
    flat, _, _ = _doc_tokens(col)
    vc = flat.filter(pc.not_equal(flat, "")).value_counts()
    return pa.table({"token": vc.field("values"),
                     "cnt": pc.cast(vc.field("counts"), pa.int64())})


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality features: length, punct ratio, stopword ratio,
    mean token length — the C4/Gopher-style cheap filters, all Arrow/numpy
    kernels (no Python row loop). "Punctuation" is spec'd as the regex
    class [^A-Za-z0-9\\s] so the engine and the SQL oracle agree exactly.
    """
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    filled = pc.fill_null(text, "")
    n_chars = np.asarray(pc.utf8_length(filled)).astype(np.int64)
    punct = np.asarray(
        pc.count_substring_regex(filled, r"[^A-Za-z0-9\s]")
    ).astype(np.int64)
    flat, bounds, n_tokens = _doc_tokens(text)
    tok_len = np.asarray(pc.utf8_length(flat)).astype(np.int64)
    sum_len = _per_doc_sum(tok_len, bounds)
    is_stop = np.asarray(
        pc.is_in(
            pc.utf8_lower(flat),
            value_set=pa.array(sorted(_LANG_PROFILES["en"])),
        )
    ).astype(np.int64)
    stop_cnt = _per_doc_sum(is_stop, bounds)
    nc = np.maximum(n_chars, 1)
    nt = np.maximum(n_tokens, 1)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pa.array(n_chars),
            "punct_ratio": pa.array(
                np.where(n_chars > 0, punct / nc, 0.0)
            ),
            "stopword_ratio": pa.array(
                np.where(n_tokens > 0, stop_cnt / nt, 0.0)
            ),
            "mean_token_len": pa.array(
                np.where(n_tokens > 0, sum_len / nt, 0.0)
            ),
        }
    )


# stable global stopword index across all profiles (for the one-pass
# membership scatter in lang_id_batch)
_ALL_STOPS = sorted(set().union(*_LANG_PROFILES.values()))
_STOP_IDX = {w: i for i, w in enumerate(_ALL_STOPS)}


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stopword-profile language ID (deterministic heuristic), vectorized:
    one is_in/index_in pass over the flat token stream, a boolean
    (doc x stopword) presence scatter, and per-language column sums.
    Ties resolve to the first language in profile order (en, de, fr, es);
    zero matches -> 'und' — same contract as the SQL oracle's CASE.
    """
    flat, bounds, n_tokens = _doc_tokens(batch[text_col])
    n_docs = len(n_tokens)
    low = pc.utf8_lower(flat)
    codes = pc.index_in(low, value_set=pa.array(_ALL_STOPS))
    codes = np.asarray(pc.fill_null(codes, -1)).astype(np.int64)
    doc_idx = np.repeat(np.arange(n_docs), np.diff(bounds))
    hit = codes >= 0
    present = np.zeros((n_docs, len(_ALL_STOPS)), dtype=bool)
    present[doc_idx[hit], codes[hit]] = True  # DISTINCT (doc, word) pairs
    langs = list(_LANG_PROFILES)
    scores = np.zeros((n_docs, len(langs)), dtype=np.int64)
    for j, lang in enumerate(langs):
        cols = [_STOP_IDX[w] for w in _LANG_PROFILES[lang]]
        scores[:, j] = present[:, cols].sum(axis=1)
    best = scores.argmax(axis=1)  # argmax -> FIRST max (profile order wins)
    pred = np.asarray(langs, dtype=object)[best]
    pred[scores.max(axis=1) == 0] = "und"
    return pa.table(
        {"doc_id": batch["doc_id"], "lang_pred": pa.array(pred, pa.string())}
    )


def fingerprint_batch(
    batch: pa.Table, text_col: str = "text", window: int = 8
) -> pa.Table:
    """Winnowing-style document fingerprint: rolling token hashes, keep the
    min hash per window, fingerprint = hash of the selected set.

    Vectorized: Arrow tokenize + dictionary-encode (each DISTINCT token pays
    ONE blake2b call, scattered back by code), numpy sliding-window min over
    the flat hash stream for the winnowing pass, lexsort-dedup for the
    per-doc `sorted(set(sel))`, and one digest call per doc over the packed
    selected values (byte-identical to incremental update() calls). Values
    are bit-identical to the historical per-token loop for ASCII-whitespace
    text (the Arrow tokenizer is the same `\\s+` split the other text
    kernels and their SQL oracles use).
    """
    flat, bounds, n_tokens = _doc_tokens(batch[text_col])
    n_docs = len(n_tokens)
    raw = np.diff(bounds)
    fps = np.zeros(n_docs, dtype=np.uint64)
    if len(flat):
        enc = flat.dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        uh = np.fromiter(
            (
                struct.unpack(
                    "<Q", hashlib.blake2b(u.encode(), digest_size=8).digest()
                )[0]
                for u in uniq
            ),
            dtype=np.uint64,
            count=len(uniq),
        )
        codes = np.asarray(enc.indices).astype(np.int64)
        H = uh[codes]
        # per-doc min in one reduceat (docs are contiguous in the flat stream)
        doc_min = np.minimum.reduceat(H, bounds[:-1])
        live = n_tokens > 0
        short = live & (raw <= window)
        sel_docs = [np.flatnonzero(short)]
        sel_vals = [doc_min[short]]
        long = live & (raw > window)
        if long.any():
            W = np.lib.stride_tricks.sliding_window_view(H, window).min(axis=1)
            j = np.arange(len(W))
            doc_of_j = np.repeat(np.arange(n_docs), raw)[: len(W)]
            mask = long[doc_of_j] & (j <= bounds[doc_of_j + 1] - window)
            sel_docs.append(doc_of_j[mask])
            sel_vals.append(W[mask])
        D = np.concatenate(sel_docs)
        V = np.concatenate(sel_vals)
        order = np.lexsort((V, D))
        D, V = D[order], V[order]
        keep = np.ones(len(D), dtype=bool)
        keep[1:] = (D[1:] != D[:-1]) | (V[1:] != V[:-1])
        D, V = D[keep], V[keep]
        packed = V.astype("<u8").tobytes()
        starts = np.concatenate(([0], np.cumsum(np.bincount(D, minlength=n_docs))))
        for i in np.flatnonzero(live):
            fps[i] = (
                struct.unpack(
                    "<Q",
                    hashlib.blake2b(
                        packed[starts[i] * 8 : starts[i + 1] * 8], digest_size=8
                    ).digest(),
                )[0]
                & 0x7FFFFFFFFFFFFFFF
            )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array(fps.astype(np.int64), pa.int64()),
        }
    )


def _group_runs(doc: np.ndarray, code: np.ndarray):
    """Run-length groups of (doc, code) pairs: returns (group start indices
    into the lexsorted order, per-group counts, per-group doc, sort order).
    Both inputs are int64; equality is exact (codes come from Arrow
    dictionary encoding, i.e. exact string identity)."""
    order = np.lexsort((code, doc))
    d, c = doc[order], code[order]
    new = np.ones(len(d), dtype=bool)
    new[1:] = (d[1:] != d[:-1]) | (c[1:] != c[:-1])
    starts = np.flatnonzero(new)
    counts = np.diff(np.concatenate((starts, [len(d)])))
    return starts, counts, d[starts], order


def repetition_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    table A1, the public repetition filters), fully vectorized:

      dup_line_frac      — fraction of newline-split lines that repeat an
                           earlier identical line in the same doc
                           ((n_lines - n_distinct) / n_lines)
      dup_line_char_frac — fraction of line characters sitting in repeated
                           occurrences (sum over distinct lines of
                           (count-1)*len / total line chars)
      top_2gram_frac     — occurrences of the doc's most frequent token
                           2-gram over the doc's 2-gram count (n_tokens-1)

    Per-doc metrics only — no cross-batch state, so the stage is a plain
    map_batches with no shuffle. Lines are exact-string groups via Arrow
    dictionary encoding + lexsort run-lengths; 2-grams pair adjacent
    dictionary codes so equality stays exact (no hashing).
    """
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    filled = pc.fill_null(text, "")
    n_docs = len(filled)

    # ---- line metrics
    line_lists = pc.split_pattern(filled, "\n")
    n_lines = np.asarray(pc.list_value_length(line_lists)).astype(np.int64)
    lbounds = np.concatenate(([0], np.cumsum(n_lines)))
    flat_lines = pc.list_flatten(line_lists)
    llen = np.asarray(pc.utf8_length(flat_lines)).astype(np.int64)
    total_chars = _per_doc_sum(llen, lbounds)
    enc = flat_lines.dictionary_encode()
    lcodes = np.asarray(enc.indices).astype(np.int64)
    ldoc = np.repeat(np.arange(n_docs, dtype=np.int64), n_lines)
    starts, counts, gdoc, order = _group_runs(ldoc, lcodes)
    n_distinct = np.bincount(gdoc, minlength=n_docs).astype(np.int64)
    # chars in repeated occurrences: (count-1) * line length, per group
    glen = llen[order][starts]
    dup_chars = np.bincount(
        gdoc, weights=(counts - 1) * glen, minlength=n_docs
    )
    nl = np.maximum(n_lines, 1)
    dup_line_frac = np.where(n_lines > 0, (n_lines - n_distinct) / nl, 0.0)
    dup_line_char_frac = np.where(
        total_chars > 0, dup_chars / np.maximum(total_chars, 1), 0.0
    )

    # ---- top token-2-gram fraction
    flat, bounds, n_tokens = _doc_tokens(text)
    top_frac = np.zeros(n_docs, dtype=np.float64)
    n2 = np.maximum(n_tokens - 1, 0)
    if len(flat) and n2.sum() > 0:
        tenc = flat.dictionary_encode()
        tcodes = np.asarray(tenc.indices).astype(np.int64)
        raw = np.diff(bounds)
        tdoc = np.repeat(np.arange(n_docs, dtype=np.int64), raw)
        # adjacent-pair key; same doc only (last token of a doc pairs with
        # the next doc's first token — masked out below)
        a, b = tcodes[:-1], tcodes[1:]
        same = tdoc[:-1] == tdoc[1:]
        ndict = len(tenc.dictionary)
        key = a[same] * np.int64(ndict) + b[same]
        gdoc2 = tdoc[:-1][same]
        s2, c2, d2, _ = _group_runs(gdoc2, key)
        # per-doc max group count: doc segments are contiguous after lexsort
        doc_seg = np.ones(len(d2), dtype=bool)
        doc_seg[1:] = d2[1:] != d2[:-1]
        seg_starts = np.flatnonzero(doc_seg)
        seg_max = np.maximum.reduceat(c2, seg_starts)
        top_frac[d2[seg_starts]] = seg_max / n2[d2[seg_starts]]

    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "dup_line_frac": pa.array(dup_line_frac),
            "dup_line_char_frac": pa.array(dup_line_char_frac),
            "top_2gram_frac": pa.array(top_frac),
        }
    )


# PII patterns (RE2 syntax — the same engine behind Arrow's
# replace_substring_regex and DuckDB's regexp_replace, so the engine and
# the SQL oracle match byte-for-byte). Public filter shapes; redaction
# order is email -> IPv4 -> phone, each pass counting on the PREVIOUS
# pass's output so classes never double-count.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b"


def pii_redact_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Redact emails, IPv4 addresses, and phone-shaped numbers with typed
    placeholders, returning the scrubbed text plus per-doc counts — one
    Arrow RE2 pass per class, no Python row loop."""
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    t0 = pc.fill_null(text, "")
    n_em = pc.cast(pc.count_substring_regex(t0, PII_EMAIL), pa.int64())
    t1 = pc.replace_substring_regex(t0, PII_EMAIL, "<EMAIL>")
    n_ip = pc.cast(pc.count_substring_regex(t1, PII_IPV4), pa.int64())
    t2 = pc.replace_substring_regex(t1, PII_IPV4, "<IP>")
    n_ph = pc.cast(pc.count_substring_regex(t2, PII_PHONE), pa.int64())
    t3 = pc.replace_substring_regex(t2, PII_PHONE, "<PHONE>")
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "text": t3,
            "n_emails": n_em,
            "n_ips": n_ip,
            "n_phones": n_ph,
        }
    )


def _doc_ngrams(text_col, n: int) -> pa.Array:
    """Within-doc space-joined token n-grams from the flat stream (no
    cross-doc grams): gram i of a doc spans tokens [i, i+n). Vectorized —
    the per-gram indices come from the bounds arithmetic, the join from
    one binary_join_element_wise over shifted views."""
    flat, bounds, n_tokens = _doc_tokens(text_col)
    if n == 1:
        return flat.filter(pc.not_equal(flat, ""))
    raw = np.diff(bounds)
    counts = np.maximum(raw - (n - 1), 0)
    counts[n_tokens == 0] = 0
    total = int(counts.sum())
    if total == 0:
        return pa.array([], pa.string())
    starts = np.repeat(bounds[:-1], counts) + (
        np.arange(total) - np.repeat(np.concatenate(([0], np.cumsum(counts)))[:-1], counts)
    )
    views = [
        flat.take(pa.array(starts + j, pa.int64())) for j in range(n)
    ]
    return pc.binary_join_element_wise(*views, " ")


def vocab_topk(ds, text_col: str = "text", k: int = 100,
               ngram: int = 1) -> pa.Table:
    """Corpus-wide top-k most frequent whitespace token n-grams (ngram=1:
    plain vocabulary; 2: bigrams, never crossing doc boundaries), ordered
    by (count desc, token asc) — the vocabulary/statistics pass of a
    corpus build. Map-side value_counts means only (distinct gram,
    partial count) rows leave each block; one hash exchange keyed on the
    gram sums partials (each gram lives in exactly one shard, so
    shard-local top-k is globally safe); the driver merges shards * k
    candidate rows.
    """
    from ..shuffle import hash_exchange

    def partial(batch: pa.Table) -> pa.Table:
        grams = _doc_ngrams(batch[text_col], ngram)
        vc = grams.value_counts()
        return pa.table(
            {
                "token": vc.field("values"),
                "cnt": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    def _topk(t: pa.Table) -> pa.Table:
        g = t.group_by(["token"]).aggregate([("cnt", "sum")])
        g = g.rename_columns(["token", "cnt"])
        order = pc.sort_indices(
            g, sort_keys=[("cnt", "descending"), ("token", "ascending")]
        )
        return g.take(order[:k])

    parts = ds.map_batches(partial, batch_format="pyarrow")
    out = hash_exchange(parts.to_arrow_refs(), ["token"], _topk)
    if out is None:
        return pa.table({"token": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    order = pc.sort_indices(
        out, sort_keys=[("cnt", "descending"), ("token", "ascending")]
    )
    return out.take(order[:k])


def unigram_logprob(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-doc mean unigram negative log-likelihood under the corpus's own
    unigram model — the CCNet-style cheap LM-quality proxy (public method):
    rare-token-heavy (junky) docs score high, common-prose docs low.

    Two phases: (1) global token counts via map-side value_counts partials
    + one token-keyed hash exchange (the unigram vocab of even a web-scale
    corpus fits a worker heap), broadcast once with ray.put; (2) a pure
    scoring map — index_in against the broadcast vocab, vectorized ln,
    per-doc mean. Docs with zero tokens are omitted (no likelihood).
    """
    import ray

    from ..shuffle import hash_exchange

    def partial(batch: pa.Table) -> pa.Table:
        return token_count_partial(batch[text_col])

    def _sum(t: pa.Table) -> pa.Table:
        g = t.group_by(["token"]).aggregate([("cnt", "sum")])
        return g.rename_columns(["token", "cnt"])

    parts = ds.map_batches(partial, batch_format="pyarrow")
    vocab = hash_exchange(parts.to_arrow_refs(), ["token"], _sum,
                          combine_fn=_sum)
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "nll": pa.array([], pa.float64())})
    if vocab is None:
        return empty
    total = float(pc.sum(vocab["cnt"]).as_py())
    vref = ray.put(
        (vocab["token"].combine_chunks()
         if isinstance(vocab["token"], pa.ChunkedArray) else vocab["token"],
         vocab["cnt"].to_numpy(zero_copy_only=False).astype(np.float64))
    )

    def score(batch: pa.Table) -> pa.Table:
        tokens, cnts = ray.get(vref)
        flat, bounds, n_tokens = _doc_tokens(batch[text_col])
        idx = np.asarray(
            pc.fill_null(pc.index_in(flat, value_set=tokens), -1)
        ).astype(np.int64)
        # ''-placeholder tokens of empty docs aren't in the vocab
        # (index_in yields null -> cast to 0-count sentinel), but their
        # docs have n_tokens == 0 and are dropped below anyway
        safe = np.where(idx < 0, 0, idx)
        nll_tok = -np.log(cnts[safe] / total)
        sums = _per_doc_sum(np.where(idx < 0, 0.0, nll_tok), bounds)
        live = n_tokens > 0
        return pa.table(
            {
                id_col: batch[id_col].filter(pa.array(live)),
                "nll": pa.array(
                    sums[live] / n_tokens[live], pa.float64()
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def bigram_count_partial(col) -> pa.Table:
    """Map-side bigram partial: adjacent SAME-DOC token pairs counted per
    block — dictionary-encode the flat token stream once, composite-code
    the (prev, next) id pairs into one int64, np.unique with counts, no
    Python loop. Returns (u, w, cnt)."""
    flat, bounds, _ = _doc_tokens(col)
    n = len(flat)
    empty = pa.table({"u": pa.array([], pa.string()),
                      "w": pa.array([], pa.string()),
                      "cnt": pa.array([], pa.int64())})
    if n == 0:
        return empty
    d = flat.dictionary_encode()
    codes = np.asarray(d.indices, dtype=np.int64)
    # a bigram starts at every flat slot except each doc's LAST token
    # (empty docs hold one '' placeholder = their own last token, so they
    # and 1-token docs contribute nothing)
    starts = np.ones(n, dtype=bool)
    starts[bounds[1:] - 1] = False
    i = np.nonzero(starts)[0]
    if not len(i):
        return empty
    k = len(d.dictionary)
    comp = codes[i] * k + codes[i + 1]
    uniq, cnt = np.unique(comp, return_counts=True)
    return pa.table({
        "u": d.dictionary.take(pa.array(uniq // k, pa.int64())),
        "w": d.dictionary.take(pa.array(uniq % k, pa.int64())),
        "cnt": pa.array(cnt.astype(np.int64)),
    })


def bigram_logprob(ds, text_col: str = "text", id_col: str = "doc_id",
                   k_smooth: float = 0.5):
    """Per-doc mean conditional bigram negative log-likelihood under the
    corpus's own add-k-smoothed bigram model — the step up from
    `unigram_logprob` toward the CCNet/KenLM quality signal (public
    method): P(w|u) = (c(u,w) + k) / (c(u,·) + k·V) with V the corpus
    vocabulary size, so repetitive/templated prose scores low NLL and
    token-salad scores high even when its unigrams are common.

    Phases: (1) ONE counting pass + ONE (u,w)-keyed exchange carrying
    both the bigram counts and the vocabulary (distinct tokens ride as
    null-w rows, so V costs no second corpus read); prefix totals c(u,·)
    are a vocabulary-sized group-by over that table, not another pass;
    (2) a pure scoring map — tokens mapped to vocab ids once, bigram
    lookups by binary search over the broadcast sorted composite codes,
    one reduceat mean per doc. Docs with <2 tokens are
    omitted (no bigram likelihood). Partitioning assumption (documented,
    same as tfidf/unigram): the corpus BIGRAM table fits a worker heap —
    the scale knob is min-count pruning at the exchange, which changes
    pruned bigrams to the unseen-mass k/(c(u)+kV) path."""
    import ray

    from ..shuffle import hash_exchange

    def _sum_big(t: pa.Table) -> pa.Table:
        # null w = unigram-vocab carrier rows; Arrow group_by keys null
        # as its own group, so both kinds merge through one aggregate
        g = t.group_by(["u", "w"]).aggregate([("cnt", "sum")])
        return g.rename_columns(["u", "w", "cnt"])

    _empty_uw = pa.table({"u": pa.array([], pa.string()),
                          "w": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})

    def both_partial(col) -> pa.Table:
        """One tokenize per batch serves BOTH the bigram counts and the
        vocabulary: distinct non-empty tokens travel as (token, NULL,
        cnt) rows through the same (u, w)-keyed exchange — the separate
        unigram pass this op used to run re-read and re-tokenized the
        whole corpus just to learn V."""
        flat, bounds, _ = _doc_tokens(col)
        n = len(flat)
        if n == 0:
            return _empty_uw
        d = flat.dictionary_encode()
        codes = np.asarray(d.indices, dtype=np.int64)
        k = len(d.dictionary)
        cnts = np.bincount(codes, minlength=k).astype(np.int64)
        keep = np.asarray(pc.not_equal(d.dictionary, ""))
        uni_t = pa.table({
            "u": d.dictionary.filter(pa.array(keep)),
            "w": pa.nulls(int(keep.sum()), pa.string()),
            "cnt": pa.array(cnts[keep]),
        })
        starts = np.ones(n, dtype=bool)
        starts[bounds[1:] - 1] = False
        i = np.nonzero(starts)[0]
        if not len(i):
            return uni_t
        comp = codes[i] * k + codes[i + 1]
        uniq, cnt = np.unique(comp, return_counts=True)
        big_t = pa.table({
            "u": d.dictionary.take(pa.array(uniq // k, pa.int64())),
            "w": d.dictionary.take(pa.array(uniq % k, pa.int64())),
            "cnt": pa.array(cnt.astype(np.int64)),
        })
        return pa.concat_tables([uni_t, big_t])

    parts = ds.map_batches(
        lambda b: both_partial(b[text_col]), batch_format="pyarrow"
    )
    merged = hash_exchange(parts.to_arrow_refs(), ["u", "w"], _sum_big,
                           combine_fn=_sum_big)
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "nll": pa.array([], pa.float64())})
    if merged is None or merged.num_rows == 0:
        return empty
    is_uni = pc.is_null(merged["w"])
    vocab = merged.filter(is_uni)["u"].combine_chunks()
    big = merged.filter(pc.invert(is_uni)).combine_chunks()
    v_size = float(len(vocab))
    if big.num_rows == 0:
        return empty

    # vocab-id-indexed model arrays (collision-free composite = u_id*V+w_id)
    u_id = np.asarray(
        pc.index_in(big["u"], value_set=vocab), dtype=np.int64)
    w_id = np.asarray(
        pc.index_in(big["w"], value_set=vocab), dtype=np.int64)
    comp = u_id * len(vocab) + w_id
    order = np.argsort(comp)
    comp_sorted = comp[order]
    cnt_sorted = big["cnt"].to_numpy(zero_copy_only=False).astype(
        np.float64)[order]
    prefix = np.zeros(len(vocab), dtype=np.float64)
    np.add.at(prefix, u_id, big["cnt"].to_numpy(zero_copy_only=False))
    model = ray.put((vocab, comp_sorted, cnt_sorted, prefix))
    kk = float(k_smooth)

    def score(batch: pa.Table) -> pa.Table:
        toks, comps, cnts, pref = ray.get(model)
        flat, bounds, n_tokens = _doc_tokens(batch[text_col])
        n = len(flat)
        nb = np.diff(bounds) - 1  # bigrams per doc (raw >= 1 always)
        live = nb > 0
        if not live.any():
            return empty
        idx = np.asarray(
            pc.fill_null(pc.index_in(flat, value_set=toks), -1),
            dtype=np.int64)
        starts = np.ones(n, dtype=bool)
        starts[bounds[1:] - 1] = False
        i = np.nonzero(starts)[0]
        c_comp = idx[i] * len(toks) + idx[i + 1]
        pos = np.searchsorted(comps, c_comp)
        pos_c = np.minimum(pos, len(comps) - 1)
        hit = comps[pos_c] == c_comp
        c = np.where(hit, cnts[pos_c], 0.0)
        cu = pref[np.maximum(idx[i], 0)]
        nll_big = -np.log((c + kk) / (cu + kk * v_size))
        bbounds = np.concatenate(([0], np.cumsum(np.maximum(nb, 0))))
        sums = _per_doc_sum(nll_big, bbounds)
        return pa.table({
            id_col: batch[id_col].filter(pa.array(live)),
            "nll": pa.array(sums[live] / nb[live], pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def tfidf_scores(ds, text_col: str = "text", id_col: str = "doc_id",
                 min_df: int = 1):
    """Per-doc TF-IDF mass: sum over token occurrences of ln(N / df(token))
    — the DSIR-style importance signal for data selection (rare-vocabulary
    documents weigh more). Fully SQL-oracle-able.

    Phase 1 (document frequencies): per block, the DISTINCT (doc, token)
    pairs are counted per token — dictionary-encode + composite-code
    np.unique, no Python loop — and the per-token partials merge through
    one token-keyed hash exchange. Tokens with df < min_df are dropped at
    the merge (the standard vocab truncation; the SQL twin applies the
    same filter), bounding the broadcast vocabulary.
    Phase 2: pure scoring map — index_in against the ray.put vocab, idf
    per occurrence, one reduceat per doc. Docs with zero kept tokens
    score 0.0 (they still appear — selection needs every doc ranked).

    Scale notes: the df exchange moves (distinct-token, count) rows only;
    the broadcast is the TRUNCATED vocab. N (corpus doc count) is an
    exact count() on pruned metadata.
    """
    import ray

    from ..shuffle import hash_exchange

    def df_partial(batch: pa.Table) -> pa.Table:
        flat, bounds, n_tokens = _doc_tokens(batch[text_col])
        flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
        if len(flat) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        enc = flat.dictionary_encode()
        codes = np.asarray(enc.indices).astype(np.int64)
        n_docs = len(n_tokens)
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(bounds))
        # distinct (doc, token) pairs via composite codes — one np.unique
        n_vocab = len(enc.dictionary)
        pairs = np.unique(doc_of * n_vocab + codes)
        tok_of_pair = (pairs % n_vocab).astype(np.int64)
        df = np.bincount(tok_of_pair, minlength=n_vocab).astype(np.int64)
        keep = df > 0
        toks = enc.dictionary.filter(pa.array(keep))
        mask_empty = pc.not_equal(toks, "")
        return pa.table(
            {"token": toks, "df": pa.array(df[keep])}
        ).filter(mask_empty)

    def df_merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["token"]).aggregate([("df", "sum")])
        g = g.rename_columns(["token", "df"])
        return g.filter(pc.greater_equal(g["df"], min_df))

    n_total = float(ds.count())
    df_table = hash_exchange(
        ds.select_columns([text_col]).map_batches(
            df_partial, batch_format="pyarrow"
        ).to_arrow_refs(),
        ["token"],
        df_merge,
    )
    if df_table is None:
        df_table = pa.table({"token": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
    tok_col = df_table["token"]
    if isinstance(tok_col, pa.ChunkedArray):
        tok_col = tok_col.combine_chunks()
    vref = ray.put(
        (tok_col, df_table["df"].to_numpy(zero_copy_only=False).astype(np.float64))
    )

    def score(batch: pa.Table) -> pa.Table:
        tokens, dfs = ray.get(vref)
        flat, bounds, n_tokens = _doc_tokens(batch[text_col])
        idx = np.asarray(
            pc.fill_null(pc.index_in(flat, value_set=tokens), -1)
        ).astype(np.int64)
        safe = np.where(idx < 0, 0, idx)
        if len(dfs):
            idf = np.log(n_total / dfs[safe])
        else:
            idf = np.zeros(len(safe))
        sums = _per_doc_sum(np.where(idx < 0, 0.0, idf), bounds)
        return pa.table(
            {
                id_col: batch[id_col],
                "tfidf": pa.array(sums, pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def bm25_scores(ds, terms: list, text_col: str = "text",
                id_col: str = "doc_id", k1: float = 1.2, b: float = 0.75):
    """Okapi BM25 relevance of every document against a fixed query-term
    list — the retrieval-style scorer used to mine topic-targeted
    training data at corpus scale (tfidf_scores ranks by rarity mass;
    this ranks by query match with saturation + length normalization).
    idf uses the Lucene/Robertson form ln(1 + (N - df + .5)/(df + .5)),
    which stays positive for df > N/2 terms.

    Scale shape: phase 1 streams ONE tiny partial row per block (n_docs,
    n_tokens, df per query term — per-term Arrow equality over the flat
    token stream, per-doc reduceat, nothing Python-per-row) and reduces
    the partials with a Dataset sum — bytes moved are O(blocks × terms).
    Phase 2 is a pure scoring map over the same vectorized tf kernel:
    corpus constants ride the closure (they are a handful of floats; no
    re-shuffle, no broadcast table). Every doc appears, zero-match docs
    score 0.0 — selection needs the full ranking.
    """
    terms = list(terms)

    def stats_partial(batch: pa.Table) -> pa.Table:
        flat, bounds, n_tokens = _doc_tokens(batch[text_col])
        cols = {"n_docs": pa.array([batch.num_rows], pa.int64()),
                "n_tok": pa.array([int(n_tokens.sum())], pa.int64())}
        for i, term in enumerate(terms):
            eq = np.asarray(pc.equal(flat, term)).astype(np.int64) \
                if len(flat) else np.zeros(0, np.int64)
            per_doc = _per_doc_sum(eq, bounds)
            cols[f"df_{i}"] = pa.array([int((per_doc > 0).sum())], pa.int64())
        return pa.table(cols)

    stats = (ds.select_columns([text_col])
             .map_batches(stats_partial, batch_format="pyarrow")
             .sum(["n_docs", "n_tok"] + [f"df_{i}" for i in range(len(terms))]))
    n = float(stats["sum(n_docs)"] or 0)
    if n == 0:
        return ds.select_columns([id_col]).map_batches(
            lambda t: t.append_column(
                "bm25", pa.array(np.zeros(t.num_rows), pa.float64())),
            batch_format="pyarrow")
    avgdl = float(stats["sum(n_tok)"] or 0) / n
    idf = np.array([
        np.log(1.0 + (n - float(stats[f"sum(df_{i})"] or 0) + 0.5)
               / (float(stats[f"sum(df_{i})"] or 0) + 0.5))
        for i in range(len(terms))])

    def score(batch: pa.Table) -> pa.Table:
        flat, bounds, n_tokens = _doc_tokens(batch[text_col])
        dl = n_tokens.astype(np.float64)
        norm = k1 * (1.0 - b + (b * dl / avgdl if avgdl > 0 else 0.0))
        total = np.zeros(batch.num_rows, np.float64)
        for i, term in enumerate(terms):
            eq = np.asarray(pc.equal(flat, term)).astype(np.int64) \
                if len(flat) else np.zeros(0, np.int64)
            tf = _per_doc_sum(eq, bounds).astype(np.float64)
            den = tf + norm
            total += idf[i] * np.divide(
                tf * (k1 + 1.0), den, out=np.zeros_like(tf),
                where=den > 0)  # den == 0 only at b == 1 with dl == 0
        return pa.table({id_col: batch[id_col],
                         "bm25": pa.array(total, pa.float64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")


_URL_PARTS = (
    ("scheme", r"^([A-Za-z][A-Za-z0-9+.\-]*)://"),
    ("host", r"^(?:[A-Za-z][A-Za-z0-9+.\-]*://)?([^/:?#]*)"),
    ("port", r"^(?:[A-Za-z][A-Za-z0-9+.\-]*://)?[^/:?#]*:([0-9]+)"),
    ("path", r"^(?:[A-Za-z][A-Za-z0-9+.\-]*://)?[^/?#]*(/[^?#]*)"),
    ("query", r"\?([^#]*)"),
    ("fragment", r"#(.*)$"),
)


def url_parts_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Vectorized URL decomposition (scheme/host/port/path/query/fragment)
    — the per-host/per-path keys a web-corpus pipeline groups on. One
    Arrow RE2 scan per part with the EXACT patterns the SQL oracle uses
    (regexp_extract parity: no match -> empty string; NULL url -> NULL
    url and NULL parts, like every DuckDB function on NULL input)."""
    col = batch[url_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    valid = pc.is_valid(col)
    filled = pc.fill_null(col, "")
    nulls = pa.scalar(None, pa.string())
    out = {url_col: col}
    for name, pat in _URL_PARTS:
        ex = pc.extract_regex(filled, _named(pat))
        part = pc.if_else(pc.is_valid(ex), ex.field("g"), "")
        out[name] = pc.if_else(valid, part, nulls)
    return pa.table(out)


def _named(pat: str) -> str:
    """Insert a name on the FIRST capturing group (Arrow extract_regex
    needs named groups; the SQL twin uses the same pattern with group 1).
    Non-capturing `(?:` groups are untouched."""
    i = 0
    while True:
        i = pat.index("(", i)
        if pat[i : i + 3] != "(?:":
            return pat[:i] + "(?P<g>" + pat[i + 1 :]
        i += 1


def normalize_text_batch(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    lower: bool = True,
    strip_punct: bool = False,
) -> pa.Table:
    """Standard corpus normalization, all Arrow kernels: lowercase,
    whitespace runs collapsed to single spaces, outer whitespace trimmed,
    optionally the [^A-Za-z0-9\\s] punctuation class removed (the same
    class the quality oracle specs). Emits (id, norm_text). The SQL twin
    is lower/regexp_replace with identical patterns."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    if lower:
        col = pc.utf8_lower(col)
    if strip_punct:
        col = pc.replace_substring_regex(col, r"[^A-Za-z0-9\s]", "")
    col = pc.replace_substring_regex(col, r"\s+", " ")
    col = pc.utf8_trim_whitespace(col)
    return pa.table({id_col: batch[id_col], "norm_text": col})


def inverted_index(ds, text_col: str = "text", id_col: str = "doc_id",
                   min_df: int = 1, shard_output_dir=None):
    """Search-index build: token -> (document frequency, the full posting
    list as a comma-joined doc-id string sorted ascending). A token posts
    once per doc no matter how often it repeats (DISTINCT pairs), matching
    `string_agg(doc_id, ',' ORDER BY doc_id)` over DISTINCT unnested
    tokens in SQL.

    Scale shape: map-side the batch flattens to DISTINCT fixed-width
    (token, doc_id) pairs — the only thing that crosses the wire — and
    ONE token-hash exchange co-locates each token's postings; the
    shard-local assembly sorts once by (token, doc_id) and joins digits
    per group (group count = vocabulary, not corpus). A stopword-grade
    hot token concentrates its postings in one shard — set `min_df`/
    stopword filtering upstream, or pass `shard_output_dir` so shards
    stream straight to parquet (index segments), never the driver.
    """
    import pandas as pd

    from ..shuffle import hash_exchange

    def pairs(batch: pa.Table) -> pa.Table:
        toks, bounds, _ = _doc_tokens(batch[text_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        docs = np.repeat(ids, np.diff(bounds))
        df = pd.DataFrame({"token": toks.to_pandas(), "doc": docs})
        df = df[df["token"] != ""].drop_duplicates()
        return pa.table({"token": pa.array(df["token"].to_numpy(), pa.string()),
                         "doc": df["doc"].to_numpy()})

    def finish(t: pa.Table) -> pa.Table:
        df = (t.to_pandas().drop_duplicates()  # pairs may repeat across blocks
              .sort_values(["token", "doc"], kind="stable"))
        df["doc"] = df["doc"].astype(str)
        g = df.groupby("token", sort=False)["doc"]
        out = pd.DataFrame({"df": g.size(), "postings": g.agg(",".join)})
        out = out[out["df"] >= min_df].reset_index()
        return pa.Table.from_pandas(
            out, preserve_index=False,
            schema=pa.schema([("token", pa.string()), ("df", pa.int64()),
                              ("postings", pa.string())]))

    parts = ds.select_columns([id_col, text_col]).map_batches(
        pairs, batch_format="pyarrow")
    out = hash_exchange(parts.to_arrow_refs(), ["token"], finish,
                        shard_output_dir=shard_output_dir)
    if shard_output_dir is not None:
        return None
    if out is None:
        return pa.table({"token": pa.array([], pa.string()),
                         "df": pa.array([], pa.int64()),
                         "postings": pa.array([], pa.string())})
    return out


def char_entropy_batch(batch: pa.Table, text_col: str = "text",
                       id_col: str = "doc_id") -> pa.Table:
    """Byte-level Shannon entropy per document (bits/byte) — the
    gibberish/compression quality signal: natural text sits ~4.0-4.5,
    random base64 near 6, repeated filler near 0. The SQL twin is
    byte-exact on ANY corpus: it expands each char to its UTF-8 bytes
    arithmetically from the codepoint, so non-ASCII text agrees too.

    Pure map — no shuffle, no state. Vectorized: ONE buffer concat per
    batch, one bincount over (doc_index * 256 + byte) composite codes,
    per-doc -sum(p*log2(p)) via reduceat; empty docs are NULL.
    """
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    data = col.to_pandas().str.encode("utf-8")
    lens = data.str.len().to_numpy().astype(np.int64)
    n = len(lens)
    flat = np.frombuffer(b"".join(data), dtype=np.uint8).astype(np.int64)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    counts = np.bincount(doc_idx * 256 + flat, minlength=n * 256)
    counts = counts.reshape(n, 256).astype(np.float64)
    tot = counts.sum(axis=1)
    safe_tot = np.where(tot == 0, 1.0, tot)
    p = counts / safe_tot[:, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = np.where(p > 0, p * np.log2(p), 0.0)
    ent = -terms.sum(axis=1)
    return pa.table({
        id_col: batch[id_col],
        "entropy": pa.array(np.where(tot == 0, np.nan, ent)),
    })


def pmi_collocations(ds, text_col: str = "text", min_count: int = 5):
    """Pointwise mutual information of within-doc adjacent token pairs —
    the classic collocation / phrase-detection signal (word2vec-style
    phrase merging): pmi(w1,w2) = ln(P(w1,w2) / (P(w1)·P(w2))) with
    P(w1,w2) = c(w1,w2)/N_bigrams and P(w) = c(w)/N_tokens. Only pairs
    with c(w1,w2) >= min_count are scored (the standard noise floor —
    rare-pair PMI is dominated by sampling error). Returns
    (w1, w2, cnt, pmi), one row per qualifying pair.

    Scale shape: ONE corpus scan and ONE w1-keyed exchange carry both
    count families — the single tokenization pass emits unigram rows as
    (w, null, cnt) alongside bigram rows (w1, w2, cnt); grouping by
    (w1, w2) inside a w1-hashed shard is exact because every copy of a
    pair shares its w1. The distinct vocab + min_count-truncated pairs
    fit a worker heap (same contract as unigram_logprob/tfidf).
    N_bigrams rides the same exchange as one (null, null) total row per
    shard — real tokens are never null (the whitespace split yields
    non-empty strings), so neither sentinel family collides — and the
    scoring pass is one vectorized index_in + log over the pair table.
    """
    from ..shuffle import _group_sum, hash_exchange

    empty = pa.table({
        "w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
        "cnt": pa.array([], pa.int64()), "pmi": pa.array([], pa.float64()),
    })

    def both_partial(b: pa.Table) -> pa.Table:
        flat, bounds, n_tokens = _doc_tokens(b[text_col])
        vc = flat.filter(pc.not_equal(flat, "")).value_counts()
        uni = pa.table({
            "w1": vc.field("values"),
            "w2": pa.nulls(len(vc), pa.string()),
            "cnt": pc.cast(vc.field("counts"), pa.int64()),
        })
        raw = np.diff(bounds)
        counts = np.maximum(raw - 1, 0)
        counts[n_tokens == 0] = 0
        total = int(counts.sum())
        if total == 0:
            return uni
        offs = np.concatenate(([0], np.cumsum(counts)))[:-1]
        starts = np.repeat(bounds[:-1], counts) + (
            np.arange(total, dtype=np.int64) - np.repeat(offs, counts))
        g = pa.table({
            "w1": flat.take(pa.array(starts, pa.int64())),
            "w2": flat.take(pa.array(starts + 1, pa.int64())),
        }).group_by(["w1", "w2"]).aggregate([([], "count_all")])
        big = g.rename_columns(["w1", "w2", "cnt"]).set_column(
            2, "cnt", pc.cast(g["count_all"], pa.int64()))
        return pa.concat_tables([uni, big])

    def merge(t: pa.Table) -> pa.Table:
        g = _group_sum(t, ["w1", "w2"], ["cnt"])
        is_uni = pc.is_null(g["w2"])
        uni = g.filter(is_uni)
        big = g.filter(pc.invert(is_uni))
        shard_total = pc.sum(big["cnt"]).as_py() or 0
        keep = big.filter(pc.greater_equal(big["cnt"], min_count))
        sentinel = pa.table({
            "w1": pa.array([None], pa.string()),
            "w2": pa.array([None], pa.string()),
            "cnt": pa.array([int(shard_total)], pa.int64()),
        })
        return pa.concat_tables([uni, keep, sentinel])

    merged = hash_exchange(
        ds.map_batches(both_partial, batch_format="pyarrow").to_arrow_refs(),
        ["w1"],
        merge,
        combine_fn=lambda t: _group_sum(t, ["w1", "w2"], ["cnt"]),
    )
    if merged is None:
        return empty
    sent = pc.is_null(merged["w1"])
    nb = float(pc.sum(merged.filter(sent)["cnt"]).as_py() or 0)
    rest = merged.filter(pc.invert(sent))
    is_uni = pc.is_null(rest["w2"])
    vocab = pa.table({"token": rest.filter(is_uni)["w1"],
                      "cnt": rest.filter(is_uni)["cnt"]})
    pairs = rest.filter(pc.invert(is_uni))
    if vocab.num_rows == 0:
        return empty
    nu = float(pc.sum(vocab["cnt"]).as_py())
    if pairs.num_rows == 0 or nb == 0:
        return empty
    tok = vocab["token"]
    if isinstance(tok, pa.ChunkedArray):
        tok = tok.combine_chunks()
    cn = vocab["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
    i1 = np.asarray(pc.index_in(pairs["w1"], value_set=tok)).astype(np.int64)
    i2 = np.asarray(pc.index_in(pairs["w2"], value_set=tok)).astype(np.int64)
    c = pairs["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
    # expression shape mirrors the SQL oracle exactly: ln of the ratio of
    # the pair probability to the product of the marginals
    pmi = np.log((c / nb) / ((cn[i1] / nu) * (cn[i2] / nu)))
    return pa.table({
        "w1": pairs["w1"], "w2": pairs["w2"], "cnt": pairs["cnt"],
        "pmi": pa.array(pmi, pa.float64()),
    })


def log_templates(ds, text_col: str = "text", min_count: int = 1):
    """Drain-lite log-template mining: every message collapses to its
    TEMPLATE by masking the variable fragments — `0x`-hex runs first
    (`0x[0-9a-fA-F]+` -> `<HEX>`), then digit runs (`[0-9]+` -> `<NUM>`)
    — and templates are counted corpus-wide; the classic first pass of
    log-pattern analysis (Drain/Spell lineage, deterministic masked-
    token form so a SQL regexp_replace twin reproduces it exactly).
    Null messages form the SQL GROUP BY null group. Returns
    (template, cnt) for templates with cnt >= min_count.

    Scale shape: two Arrow regex kernels + per-block value_counts, ONE
    template-keyed exchange of (template, partial-count) rows — the
    template set, not the log stream, crosses the wire."""
    from ..shuffle import _group_sum, hash_exchange

    def partial(b: pa.Table) -> pa.Table:
        col = b[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        t = pc.replace_substring_regex(col, r"0x[0-9a-fA-F]+", "<HEX>")
        t = pc.replace_substring_regex(t, r"[0-9]+", "<NUM>")
        # Arrow value_counts already counts null as its own value — the
        # SQL GROUP BY null group comes through with no special casing
        vc = t.value_counts()
        return pa.table({"template": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    def merge(t: pa.Table) -> pa.Table:
        g = _group_sum(t, ["template"], ["cnt"])
        return g.filter(pc.greater_equal(g["cnt"], min_count))

    out = hash_exchange(
        ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs(),
        ["template"], merge,
        combine_fn=lambda t: _group_sum(t, ["template"], ["cnt"]))
    if out is None:
        return pa.table({"template": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    return out


def template_novelty(ds, text_col: str = "text", ts_col: str = "ts",
                     bucket_us: int = 86_400_000_000):
    """Per-window template counts with FIRST-SEEN novelty flags — the
    "new error signature this window" alerting pass layered on the
    Drain-lite masking above: every message collapses to its template
    (hex runs then digit runs masked), is counted per (time bucket,
    template), and a row is flagged `is_new` iff its bucket is that
    template's earliest. Null-timestamp rows form a null bucket that is
    never new and never advances first-seen (SQL min() semantics).

    Scale shape: masking + one Arrow group_by per block emit
    (bucket, template, cnt) partials; ONE template-keyed exchange
    co-locates each template's whole window history, so first-seen is a
    shard-local group-min — the (template x window) matrix, not the log
    stream, crosses the wire. Returns (bucket, template, cnt, is_new)."""
    from ..shuffle import _group_sum, hash_exchange

    def partial(b: pa.Table) -> pa.Table:
        col = b[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        t = pc.replace_substring_regex(col, r"0x[0-9a-fA-F]+", "<HEX>")
        t = pc.replace_substring_regex(t, r"[0-9]+", "<NUM>")
        from .profile import _as_comparable

        # exact epoch-µs whatever the storage unit (s/ms/us/ns)
        ts, _ = _as_comparable(b[ts_col])
        bucket = pc.divide(ts, bucket_us)
        g = pa.table({"bucket": bucket, "template": t}).group_by(
            ["bucket", "template"]).aggregate([([], "count_all")])
        return g.rename_columns(["bucket", "template", "cnt"])

    def merge(t: pa.Table) -> pa.Table:
        g = _group_sum(t, ["template", "bucket"], ["cnt"])
        df = g.to_pandas()
        first = df.loc[df["bucket"].notna()].groupby(
            "template", dropna=False)["bucket"].min()
        fb = df["template"].map(first)
        is_new = (df["bucket"].notna() & fb.notna()
                  & (df["bucket"] == fb))
        # bucket/template/cnt stay the Arrow columns: a from_pandas
        # round-trip floats the int64 bucket when a null-ts row is in
        # the shard, clashing with sibling shards at the concat
        return pa.table({
            "bucket": g["bucket"],
            "template": g["template"],
            "cnt": g["cnt"],
            "is_new": pa.array(is_new.to_numpy(dtype=bool)),
        })

    out = hash_exchange(
        ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs(),
        ["template"], merge,
        combine_fn=lambda t: _group_sum(t, ["template", "bucket"], ["cnt"]))
    if out is None:
        return pa.table({"bucket": pa.array([], pa.int64()),
                         "template": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64()),
                         "is_new": pa.array([], pa.bool_())})
    return out


_URL_CANON_RULES: tuple = (
    (r"#.*$", ""),            # fragment
    (r"[?&]utm_[^&#]*", ""),  # tracking params, wherever they sit
    (r"\?$", ""),             # dangling '?' once every param is gone
)


def url_canonicalize_batch(batch: pa.Table, url_col: str = "url",
                           out_col: str = "canon") -> pa.Table:
    """URL canonicalization — the web-corpus dedup key: lowercase, strip
    `#fragment`, strip `utm_*` tracking params, strip a dangling `?`.
    One Arrow RE2 `replace_substring_regex` pass per rule, and the SQL
    twin applies the IDENTICAL patterns in the identical order via
    `regexp_replace(..., 'g')` — both engines are RE2, so the rule list
    is parity by construction. Scope (documented): the whole URL is
    lowercased (host case never matters; these corpora carry case-free
    paths), and a utm param FIRST in a multi-param query leaves a
    '&'-led tail in both engine and twin — canonicalization is a rule
    list, not a URL parser. Nulls canonicalize to ''."""
    col = batch[url_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.utf8_lower(pc.fill_null(col, ""))
    for pat, repl in _URL_CANON_RULES:
        col = pc.replace_substring_regex(col, pat, repl)
    return batch.append_column(out_col, col)


def tokenize_ids(ds, text_col: str = "text", id_col: str = "doc_id",
                 k: int = 256):
    """Vocabulary-indexed tokenization — the corpus -> token-id encode
    step of a training-data build: ids 0..k-1 are the top-k corpus
    tokens in (count desc, token asc) rank order, every other token maps
    to the OOV id k. Per non-empty doc: the order-preserving
    space-joined id sequence plus token/OOV counts (empty docs encode to
    nothing, like the other token ops).

    Phase 1 reuses vocab_topk's exchange (only (distinct token, partial
    count) rows move); the k-row vocab broadcasts once via ray.put.
    Phase 2 is a pure map: index_in against the broadcast token array IS
    the id (the vocab arrives rank-ordered), ids render with one Arrow
    int->string cast, and the per-doc join is pc.binary_join over a
    ListArray rebuilt from the flat bounds — no Python row loop.
    """
    import ray

    vocab = vocab_topk(ds, text_col=text_col, k=k)
    tok = vocab["token"]
    if isinstance(tok, pa.ChunkedArray):
        tok = tok.combine_chunks()
    vref = ray.put(tok)

    def encode(batch: pa.Table) -> pa.Table:
        tokens = ray.get(vref)
        flat, bounds, n_tokens = _doc_tokens(batch[text_col])
        idx = np.asarray(
            pc.fill_null(pc.index_in(flat, value_set=tokens), k)
        ).astype(np.int64)
        id_str = pc.cast(pa.array(idx, pa.int64()), pa.string())
        lists = pa.ListArray.from_arrays(
            pa.array(bounds, pa.int32()), id_str)
        joined = pc.binary_join(lists, " ")
        n_oov = _per_doc_sum((idx == k).astype(np.int64), bounds)
        live = n_tokens > 0
        mask = pa.array(live)
        return pa.table({
            id_col: batch[id_col].filter(mask),
            "n_tokens": pa.array(n_tokens[live], pa.int64()),
            "n_oov": pa.array(n_oov[live], pa.int64()),
            "ids": joined.filter(mask),
        })

    return ds.map_batches(encode, batch_format="pyarrow")


def token_coverage(ds, text_col: str = "text", k: int = 100) -> pa.Table:
    """Zipf head-coverage curve: for the top-k corpus tokens in
    (count desc, token asc) rank order, the cumulative fraction of ALL
    corpus tokens that ranks 1..r cover — the curve that sizes a
    vocabulary (how big must k be for 95% coverage). Reuses the
    vocab_topk exchange for the head and an exact scalar aggregate for
    the denominator, so only (distinct token, partial count) rows and
    one number ever move; the k-row cumsum happens on the driver."""
    vocab = vocab_topk(ds, text_col=text_col, k=k)

    def _tot(b: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array(
            [int(_doc_tokens(b[text_col])[2].sum())], pa.int64())})

    total = ds.map_batches(_tot, batch_format="pyarrow").sum("n")
    cnt = vocab["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    cum = np.cumsum(cnt, dtype=np.int64)
    return pa.table({
        "rank": pa.array(np.arange(1, len(cnt) + 1, dtype=np.int64)),
        "token": vocab["token"],
        "cnt": pa.array(cnt, pa.int64()),
        "coverage": pa.array(cum / float(total or 1), pa.float64()),
    })


def extract_all(ds, id_col: str, text_col: str, pattern: str,
                out_col: str = "m"):
    """Multi-match regex extraction, flattened to one row per match —
    the log-pipeline fan-out the single-match parser path doesn't cover
    (pull every IP / token / URL out of a free-text field). Non-
    overlapping leftmost matches in document order, like
    `regexp_extract_all` + unnest; null/matchless texts contribute no
    rows. Pure per-batch flat map (zero shuffle, streams at any scale);
    the pattern is compiled once per task and the scan loop is the C
    regex engine per row — same cost model as the html-extract stage.

    Dialect note: keep patterns in the RE2-compatible subset (character
    classes, quantifiers, anchors; no backrefs/lookarounds) so the
    Python `re` scan is match-identical to the DuckDB/RE2 oracle."""
    import re

    rx = re.compile(pattern)
    if rx.groups:
        # findall returns groups when present; regexp_extract_all
        # returns the whole match — keep them aligned
        raise ValueError("extract_all pattern must not contain capture "
                         "groups (use (?:...) instead)")

    def flat(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        texts = t[text_col].to_pylist()
        out_ids: list = []
        out_ms: list[str] = []
        for i, s in zip(ids, texts):
            if not s:
                continue
            ms = rx.findall(s)
            if ms:
                out_ids.extend([i] * len(ms))
                out_ms.extend(ms)
        return pa.table({
            id_col: pa.array(out_ids, t.schema.field(id_col).type),
            out_col: pa.array(out_ms, pa.string()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        flat, batch_format="pyarrow")


# Gopher §A1.1 repetition-free quality rules use this fixed 8-word English
# indicator set (Rae et al. 2021, public appendix)
_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_filter_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-rule document gates (Rae et al. 2021 §A1.1, public rules) —
    the quality-filter set next to c4_filter_batch, fully vectorized:

    - word count in [50, 100000]
    - mean word length in [3, 10]
    - symbol-to-word ratio < 0.1 (symbols: '#', non-overlapping '...', '…')
    - < 90% of lines start with a bullet ('•' or '- ')
    - < 30% of lines end with an ellipsis ('...' or '…')
    - > 80% of words contain at least one [A-Za-z] character
    - at least 2 DISTINCT hits from the fixed 8-word English stop set

    `kept` is the conjunction. Tokenization shares _doc_tokens (the
    string_split_regex('\\s+') contract every text oracle checks); lines
    split on '\\n' exactly (DuckDB split(text, chr(10))); substring counts
    are non-overlapping left-to-right on BOTH sides (pc.count_substring vs
    the length-difference-of-replace idiom). Ratios are 0.0 for empty
    docs (n_words = 0) like quality_score_batch; an empty doc still has
    one line ('' splits to ['']) on both sides.

    Domain note (shared with c4_filter_batch/text_stats): Arrow's
    whitespace class is Unicode while RE2's '\\s' is ASCII, so exotic
    whitespace (U+00A0 etc.) diverges from the SQL twin — the corpus
    contract is ASCII whitespace."""
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    filled = pc.fill_null(text, "")

    flat, bounds, n_words = _doc_tokens(text)
    nw = np.maximum(n_words, 1)
    tok_len = np.asarray(pc.utf8_length(flat)).astype(np.int64)
    mean_word_len = np.where(
        n_words > 0, _per_doc_sum(tok_len, bounds) / nw, 0.0
    )
    symbols = (
        np.asarray(pc.count_substring(filled, "#")).astype(np.int64)
        + np.asarray(pc.count_substring(filled, "...")).astype(np.int64)
        + np.asarray(pc.count_substring(filled, "…")).astype(np.int64)
    )
    symbol_ratio = np.where(n_words > 0, symbols / nw, 0.0)

    lines = pc.split_pattern(filled, "\n")
    n_lines = np.asarray(pc.list_value_length(lines)).astype(np.int64)
    line_bounds = np.concatenate(([0], np.cumsum(n_lines)))
    flat_lines = pc.list_flatten(lines)
    is_bullet = np.asarray(
        pc.or_(pc.starts_with(flat_lines, "•"),
               pc.starts_with(flat_lines, "- "))
    ).astype(np.int64)
    is_ellipsis = np.asarray(
        pc.or_(pc.ends_with(flat_lines, "..."),
               pc.ends_with(flat_lines, "…"))
    ).astype(np.int64)
    nl = np.maximum(n_lines, 1)  # '' yields one line, so n_lines >= 1
    bullet_frac = _per_doc_sum(is_bullet, line_bounds) / nl
    ellipsis_frac = _per_doc_sum(is_ellipsis, line_bounds) / nl

    has_alpha = np.asarray(
        pc.match_substring_regex(flat, "[A-Za-z]")
    ).astype(np.int64)
    alpha_frac = np.where(
        n_words > 0, _per_doc_sum(has_alpha, bounds) / nw, 0.0
    )

    low = pc.utf8_lower(flat)
    stop_hits = np.zeros(len(n_words), dtype=np.int64)
    for w in _GOPHER_STOPS:
        eq = np.asarray(pc.equal(low, w)).astype(np.int64)
        stop_hits += (_per_doc_sum(eq, bounds) > 0).astype(np.int64)

    kept = (
        (n_words >= 50) & (n_words <= 100000)
        & (mean_word_len >= 3.0) & (mean_word_len <= 10.0)
        & (symbol_ratio < 0.1)
        & (bullet_frac < 0.9)
        & (ellipsis_frac < 0.3)
        & (alpha_frac > 0.8)
        & (stop_hits >= 2)
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": pa.array(n_words),
            "mean_word_len": pa.array(mean_word_len),
            "symbol_ratio": pa.array(symbol_ratio),
            "bullet_frac": pa.array(bullet_frac),
            "ellipsis_frac": pa.array(ellipsis_frac),
            "alpha_frac": pa.array(alpha_frac),
            "stop_hits": pa.array(stop_hits),
            "kept": pa.array(kept),
        }
    )


def c4_filter_batch(batch: pa.Table, text_col: str = "text",
                    min_words: int = 5) -> pa.Table:
    """C4-style document gates (Raffel et al. 2020 §2.2, public rules),
    fully vectorized: whitespace word count, terminal-punctuation ending,
    curly-brace presence (code/templating tell), and a case-insensitive
    "lorem ipsum" placeholder scan — plus the conjunction `kept`.

    Every predicate is a single Arrow RE2/substring kernel, chosen so a
    DuckDB twin reproduces each flag bit-exactly (the `c4_filters`
    oracle): trim == regexp_replace('^\\s+|\\s+$'), the word split is the
    same '\\s+' split as text_stats, and the regex scans share RE2
    semantics with regexp_matches. Domain note (shared with text_stats):
    Arrow's whitespace class is Unicode while RE2's '\\s' is ASCII, so
    exotic whitespace (U+00A0 etc.) diverges — the corpus contract is
    ASCII whitespace, property-tested over that domain."""
    text = batch[text_col]
    tr = pc.utf8_trim_whitespace(text)
    n_words = pc.if_else(
        pc.equal(tr, ""),
        pa.scalar(0, pa.int64()),
        pc.cast(pc.list_value_length(pc.utf8_split_whitespace(tr)), pa.int64()),
    )
    ends_terminal = pc.match_substring_regex(tr, '[.!?"]$')
    has_brace = pc.match_substring(text, "{")
    has_lorem = pc.match_substring_regex(text, "(?i)lorem ipsum")
    kept = pc.and_(
        pc.and_(pc.greater_equal(n_words, min_words), ends_terminal),
        pc.and_(pc.invert(has_brace), pc.invert(has_lorem)),
    )
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_words": n_words,
        "ends_terminal": ends_terminal,
        "has_brace": has_brace,
        "has_lorem": has_lorem,
        "kept": kept,
    })


def token_kl_shift(
    ds,
    split_col: str,
    split_a: str,
    text_col: str = "text",
    k: int = 10,
    add_k: float = 0.5,
):
    """Token-distribution shift report: the top-k tokens by contribution
    to KL(P_a || P_b), where side `a` is the rows with `split_col ==
    split_a` and side `b` is everything else — "what changed in this
    corpus slice" for ingestion-drift / source-mix monitoring. Add-k
    smoothing over the union vocabulary keeps every term finite.

    Scale shape: per-block per-side value_counts partials (distinct
    tokens only) cross ONE token-keyed exchange; the shard refs never
    concatenate on the driver — pass 2 reduces each shard to a 3-number
    total (sum_a, sum_b, vocab rows), pass 3 scores contributions
    shard-locally with the broadcast totals and emits k candidate rows
    per shard. The SQL twin mirrors the smoothing expression verbatim so
    the float contributions are bit-comparable."""
    import ray

    from ..shuffle import hash_exchange

    def partial(batch: pa.Table) -> pa.Table:
        # null split values belong to side b (SQL CASE ... ELSE 0): fill
        # BEFORE inverting so invert(null)=null can't drop the row
        side_a = pc.fill_null(pc.equal(batch[split_col], split_a), False)
        outs = []
        for flag, is_a in ((side_a, True), (pc.invert(side_a), False)):
            sub = batch.filter(flag)
            toks = _doc_ngrams(sub[text_col], 1)
            if not len(toks):
                continue
            vc = toks.value_counts()
            cnt = pc.cast(vc.field("counts"), pa.int64())
            zero = pa.nulls(len(cnt), pa.int64()).fill_null(0)
            outs.append(pa.table({
                "token": vc.field("values"),
                "c_a": cnt if is_a else zero,
                "c_b": zero if is_a else cnt,
            }))
        if not outs:
            return pa.table({"token": pa.array([], pa.string()),
                             "c_a": pa.array([], pa.int64()),
                             "c_b": pa.array([], pa.int64())})
        return pa.concat_tables(outs)

    def regroup(t: pa.Table) -> pa.Table:
        g = t.group_by(["token"]).aggregate([("c_a", "sum"), ("c_b", "sum")])
        return g.rename_columns(["token", "c_a", "c_b"])

    refs = hash_exchange(
        ds.select_columns([split_col, text_col]).map_batches(
            partial, batch_format="pyarrow").to_arrow_refs(),
        ["token"], regroup, combine_fn=regroup, return_refs=True,
    )
    refs = [r for r in refs if r is not None]
    if not refs:
        return pa.table({"token": pa.array([], pa.string()),
                         "c_a": pa.array([], pa.int64()),
                         "c_b": pa.array([], pa.int64()),
                         "contrib": pa.array([], pa.float64())})

    def totals(t):
        if t is None or not t.num_rows:
            return (0, 0, 0)
        return (int(pc.sum(t["c_a"]).as_py() or 0),
                int(pc.sum(t["c_b"]).as_py() or 0), t.num_rows)

    totals_r = ray.remote(totals)
    tot = ray.get([totals_r.remote(r) for r in refs])
    na = sum(x[0] for x in tot)
    nb = sum(x[1] for x in tot)
    v = sum(x[2] for x in tot)

    def top_contrib(t, _na=na, _nb=nb, _v=v):
        if t is None or not t.num_rows:
            return None
        ca = np.asarray(t["c_a"], dtype=np.float64)
        cb = np.asarray(t["c_b"], dtype=np.float64)
        p_a = (ca + add_k) / (_na + add_k * _v)
        p_b = (cb + add_k) / (_nb + add_k * _v)
        contrib = p_a * np.log(p_a / p_b)
        t = t.append_column("contrib", pa.array(contrib, pa.float64()))
        order = pc.sort_indices(t, sort_keys=[("contrib", "descending"),
                                              ("token", "ascending")])
        return t.take(order[:k])

    top_r = ray.remote(top_contrib)
    cands = [c for c in ray.get(
        [top_r.remote(r) for r in refs]) if c is not None]
    merged = pa.concat_tables(cands)
    order = pc.sort_indices(merged, sort_keys=[("contrib", "descending"),
                                               ("token", "ascending")])
    return merged.take(order[:k])


def readability_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Flesch-reading-ease-style readability signals, fully vectorized
    and SQL-twinnable: sentences = non-overlapping `[.!?]+` runs, words =
    the standard '\\s+' split, syllables = `[aeiouyAEIOUY]+` vowel-group
    runs (the classic deterministic approximation), and the Flesch score
    206.835 - 1.015*(words/sentences) - 84.6*(syllables/words). Docs with
    zero words or zero sentences emit NULL score (no division) — same
    CASE algebra as the oracle."""
    text = batch[text_col]
    tr = pc.utf8_trim_whitespace(text)
    words = pc.if_else(
        pc.equal(tr, ""),
        pa.scalar(0, pa.int64()),
        pc.cast(pc.list_value_length(pc.utf8_split_whitespace(tr)),
                pa.int64()),
    )
    sentences = pc.cast(pc.count_substring_regex(text, r"[.!?]+"),
                        pa.int64())
    syllables = pc.cast(pc.count_substring_regex(text, r"[aeiouyAEIOUY]+"),
                        pa.int64())
    wf = pc.cast(words, pa.float64())
    sf = pc.cast(sentences, pa.float64())
    yf = pc.cast(syllables, pa.float64())
    ok = pc.and_(pc.greater(words, 0), pc.greater(sentences, 0))
    score = pc.subtract(
        pc.subtract(pa.scalar(206.835, pa.float64()),
                    pc.multiply(pa.scalar(1.015, pa.float64()),
                                pc.divide(wf, sf))),
        pc.multiply(pa.scalar(84.6, pa.float64()), pc.divide(yf, wf)),
    )
    score = pc.if_else(ok, score, pa.nulls(batch.num_rows, pa.float64()))
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_words": words,
        "n_sentences": sentences,
        "n_syllables": syllables,
        "flesch": score,
    })
