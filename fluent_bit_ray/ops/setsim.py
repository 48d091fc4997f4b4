"""Exact set-similarity self-join (PPJoin-style prefix filtering).

The minhash/simhash suite in `ops/dedup.py` finds near-duplicates
APPROXIMATELY (probabilistic recall); this operator is the exact
complement: every document pair whose token-set Jaccard similarity is
>= tau, with zero false negatives and zero false positives — the
candidate-verify shape of Chaudhuri et al. (SSJoin) / Xiao et al.
(PPJoin), re-expressed Ray-Data-first. The reference engine has no
similarity machinery at all (its only string matching is the router's
tag glob, `src/flb_router.c` — studied, not copied); this is part of the
training-data suite the engine adds on top.

Plan shape:

    map_batches: tokenize (the `ops/dedup` zero-copy Arrow split +
    vectorized polynomial hash), per-doc DISTINCT sorted hash set,
    prefix emission — each doc emits only its first
    (s - ceil(tau*s) + 1) tokens in the global order as posting rows
    →  ONE token-hash exchange co-locates each prefix token's postings
    →  shard-local candidate generation (pandas self-merge per token,
    doc_a < doc_b, size-ratio filter min >= tau*max) and exact verify.

Exactly-once emission without a second exchange: a candidate pair is
examined in EVERY group of a shared prefix token, but it is OWNED (and
emitted) only by the group of the SMALLEST shared prefix token — each
ownership test is one short intersect of the two prefixes, which both
travel for free as the head of the full sorted set.

Global token order: token hash order (i.e. pseudo-random). Any total
order is CORRECT for prefix filtering; the classic df-ascending order
is a pluggable optimization that needs a global document-frequency
pass — at 100 TB you'd add one `hash_reduce` for (token, df) and sort
each doc's set by (df, hash) instead, shrinking hot-token postings.

Partitioning assumption (documented): one PREFIX TOKEN's posting list
fits a reduce shard. Sets travel duplicated once per prefix token
(factor (1-tau)*s + 1 — small for high tau), and only verified
(doc_a, doc_b, jac) pairs leave the shards.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..shuffle import hash_exchange


def _doc_sets(texts) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc DISTINCT sorted token-hash sets.

    Returns (flat sorted-unique hashes, per-doc set sizes); doc j's set
    is flat[offsets[j]:offsets[j+1]] ascending, where offsets =
    cumsum of sizes."""
    from .dedup import _token_arrays

    flat, counts = _token_arrays(texts)
    # the polynomial hash is uint64; reinterpret as int64 (Arrow-storable)
    # BEFORE sorting so the global token order and the stored sets agree
    flat = flat.astype(np.uint64, copy=False).view(np.int64)
    if len(flat) == 0:
        return flat, counts
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    # sort by (doc, hash) then drop within-doc duplicate hashes: one
    # lexsort serves every doc in the batch
    order = np.lexsort((flat, doc_idx))
    f = flat[order]
    d = doc_idx[order]
    keep = np.ones(len(f), dtype=bool)
    keep[1:] = (f[1:] != f[:-1]) | (d[1:] != d[:-1])
    f = f[keep]
    d = d[keep]
    sizes = np.bincount(d, minlength=len(counts)).astype(np.int64)
    return f, sizes


def jaccard_join(
    ds,
    id_col: str,
    text_col: str,
    tau: float,
    shard_output_dir: Optional[str] = None,
):
    """All pairs (doc_a < doc_b) with token-set Jaccard >= tau, exact.

    Tokenization is whitespace-split (str.split() parity, matching the
    text-suite oracles); similarity is over DISTINCT tokens. Docs whose
    token set is empty never pair (SQL: no posting rows). Returns
    (da, db, jac) sorted by (da, db)."""
    if not 0.0 < tau <= 1.0:
        raise ValueError("tau must be in (0, 1]")

    def prep(t: pa.Table) -> pa.Table:
        ids = np.asarray(pc.cast(t[id_col], pa.int64()))
        flat, sizes = _doc_sets(t[text_col])
        nz = sizes > 0
        if not nz.any():
            return pa.table({
                "tok": pa.array([], pa.int64()),
                "doc": pa.array([], pa.int64()),
                "sz": pa.array([], pa.int64()),
                "set": pa.array([], pa.list_(pa.int64())),
            })
        # prefix length p = s - ceil(tau*s) + 1; the epsilon can only
        # LOWER ceil(tau*s) by one at float boundaries, which lengthens
        # the prefix — the safe direction (verification stays exact)
        req = np.ceil(tau * sizes - 1e-9).astype(np.int64)
        p = np.where(nz, sizes - req + 1, 0)
        offsets = np.concatenate(([0], np.cumsum(sizes)))
        sets = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(flat, pa.int64()))
        # one posting row per prefix token: doc j contributes its p[j]
        # smallest hashes (the set is stored ascending)
        doc_rep = np.repeat(np.arange(len(sizes), dtype=np.int64), p)
        within = np.arange(int(p.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(p)[:-1])), p)
        tok = flat[offsets[doc_rep] + within]
        return pa.table({
            "tok": pa.array(tok, pa.int64()),
            "doc": pa.array(ids[doc_rep], pa.int64()),
            "sz": pa.array(sizes[doc_rep], pa.int64()),
            "set": sets.take(pa.array(doc_rep, pa.int64())),
        })

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        da_out: list[int] = []
        db_out: list[int] = []
        jac_out: list[float] = []
        df = df.sort_values(["tok", "doc"], kind="stable")
        toks = df["tok"].to_numpy()
        docs = df["doc"].to_numpy()
        szs = df["sz"].to_numpy()
        sets = df["set"].to_numpy()
        starts = np.concatenate(
            ([0], np.nonzero(toks[1:] != toks[:-1])[0] + 1, [len(toks)]))
        for gi in range(len(starts) - 1):
            lo, hi = starts[gi], starts[gi + 1]
            g = hi - lo
            if g < 2:
                continue
            tok = toks[lo]
            gd = docs[lo:hi]
            gs = szs[lo:hi]
            # vectorized triangle: doc_a < doc_b and size-ratio filter
            ii, jj = np.triu_indices(g, k=1)
            ok = np.minimum(gs[ii], gs[jj]) + 1e-9 >= tau * np.maximum(
                gs[ii], gs[jj])
            for i, j in zip(ii[ok], jj[ok]):
                sa = sets[lo + i]
                sb = sets[lo + j]
                pa_len = len(sa) - int(np.ceil(tau * len(sa) - 1e-9)) + 1
                pb_len = len(sb) - int(np.ceil(tau * len(sb) - 1e-9)) + 1
                shared = np.intersect1d(
                    sa[:pa_len], sb[:pb_len], assume_unique=True)
                # owned by the smallest shared prefix token only:
                # exactly-once emission across all token groups/shards
                if len(shared) == 0 or shared[0] != tok:
                    continue
                inter = np.intersect1d(sa, sb, assume_unique=True).size
                jac = inter / (len(sa) + len(sb) - inter)
                if jac >= tau:
                    a, b = gd[i], gd[j]
                    if a > b:
                        a, b = b, a
                    da_out.append(int(a))
                    db_out.append(int(b))
                    jac_out.append(float(jac))
        return pa.table({
            "da": pa.array(da_out, pa.int64()),
            "db": pa.array(db_out, pa.int64()),
            "jac": pa.array(jac_out, pa.float64()),
        })

    res = hash_exchange(
        ds.select_columns([id_col, text_col]).map_batches(
            prep, batch_format="pyarrow").to_arrow_refs(),
        ["tok"], finish, shard_output_dir=shard_output_dir)
    if shard_output_dir is not None:
        return None
    empty = pa.table({"da": pa.array([], pa.int64()),
                      "db": pa.array([], pa.int64()),
                      "jac": pa.array([], pa.float64())})
    if res is None or res.num_rows == 0:
        return empty
    return res.sort_by([("da", "ascending"), ("db", "ascending")])
