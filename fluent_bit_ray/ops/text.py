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
    """Whitespace token + byte counts, fully vectorized (no Python loop)."""
    text = batch[text_col]
    trimmed = pc.utf8_trim_whitespace(text)
    tokens = pc.split_pattern_regex(trimmed, pattern=r"\s+")
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


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality features: length, punct ratio, stopword ratio,
    mean token length — the C4/Gopher-style cheap filters."""
    texts = batch[text_col].to_pylist()
    n = len(texts)
    n_chars = np.zeros(n, dtype=np.int64)
    punct_ratio = np.zeros(n)
    stop_ratio = np.zeros(n)
    mean_tok = np.zeros(n)
    stops = _LANG_PROFILES["en"]
    for i, t in enumerate(texts):
        t = t or ""
        n_chars[i] = len(t)
        if not t:
            continue
        punct_ratio[i] = sum(1 for c in t if not c.isalnum() and not c.isspace()) / len(t)
        toks = t.split()
        if toks:
            stop_ratio[i] = sum(1 for x in toks if x.lower() in stops) / len(toks)
            mean_tok[i] = sum(len(x) for x in toks) / len(toks)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pa.array(n_chars),
            "punct_ratio": pa.array(np.round(punct_ratio, 6)),
            "stopword_ratio": pa.array(np.round(stop_ratio, 6)),
            "mean_token_len": pa.array(np.round(mean_tok, 6)),
        }
    )


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stopword-profile language ID (deterministic heuristic)."""
    texts = batch[text_col].to_pylist()
    preds = []
    for t in texts:
        toks = [x.lower() for x in (t or "").split()]
        tokset = set(toks)
        best, best_score = "und", 0
        for lang, profile in _LANG_PROFILES.items():
            score = len(tokset & profile)
            if score > best_score:
                best, best_score = lang, score
        preds.append(best)
    return pa.table(
        {"doc_id": batch["doc_id"], "lang_pred": pa.array(preds, pa.string())}
    )


def fingerprint_batch(
    batch: pa.Table, text_col: str = "text", window: int = 8
) -> pa.Table:
    """Winnowing-style document fingerprint: rolling token hashes, keep the
    min hash per window, fingerprint = hash of the selected set."""
    texts = batch[text_col].to_pylist()
    fps = []
    for t in texts:
        toks = (t or "").split()
        if not toks:
            fps.append(0)
            continue
        hs = [
            struct.unpack(
                "<Q", hashlib.blake2b(x.encode(), digest_size=8).digest()
            )[0]
            for x in toks
        ]
        if len(hs) <= window:
            sel = [min(hs)]
        else:
            sel = [min(hs[i : i + window]) for i in range(len(hs) - window + 1)]
        acc = hashlib.blake2b(digest_size=8)
        for v in sorted(set(sel)):
            acc.update(struct.pack("<Q", v))
        fps.append(struct.unpack("<Q", acc.digest())[0] & 0x7FFFFFFFFFFFFFFF)
    return pa.table(
        {"doc_id": batch["doc_id"], "fingerprint": pa.array(fps, pa.int64())}
    )
