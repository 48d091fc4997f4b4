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

    pass 1: per-block DISTINCT doc-set token document frequencies →
    `shuffle.hash_reduce` → (token, df) vocabulary broadcast once via
    ray.put (read zero-copy in every prep task)
    →  pass 2 map_batches: tokenize (the `ops/dedup` zero-copy Arrow
    split + vectorized polynomial hash), per-doc DISTINCT sorted hash
    set, prefix emission — each doc posts only its first
    (s - ceil(tau*s) + 1) tokens under the GLOBAL (df, token) order
    →  ONE prefix-token exchange co-locates each token's postings
    →  shard-local candidate generation (vectorized triangle per token
    group, size-ratio filter min >= tau*max) and exact verify.

Why df-ascending order matters: prefix filtering is correct under ANY
global token order, but its pruning power comes from prefixes holding
the RAREST tokens. Under a content-blind order (token hash), a
template-heavy corpus posts the same ubiquitous tokens from every
document and posting groups degenerate toward all-docs (measured 81 s
at sf0.1); df-ascending prefixes hold the content words, so a token's
posting group is bounded by its document frequency — rare by
construction. The df pass costs one extra read of the text column and
the vocabulary broadcast (documented assumption: the DISTINCT token
vocabulary fits a worker heap — the same assumption as the bigram-LM
and tf-idf ops; shard the vocab by token hash if it ever doesn't).

Verification is vectorized, not per-pair: each posting group
dictionary-encodes its members' sets locally and computes ALL pairwise
intersection sizes with one dense GEMM (g × local-vocab membership
matrix, BLAS), so even a degenerate corpus — tiny vocabulary,
everything pairwise similar, where prefix filtering provably cannot
prune (the true result is itself Ω(n²)) — verifies at matrix-multiply
speed. Tiny groups take a per-pair sorted-intersect path instead.

A pair verifies identically in every group of a shared prefix token
(<= prefix-length duplicates), so verified pairs chain object-store-
to-object-store (`return_refs`) into a second, pair-keyed exchange
that keeps one copy — no driver materialization on the wide path.

Partitioning assumptions (documented): one PREFIX TOKEN's posting list
fits a reduce shard, and its g² pair matrix fits that shard's heap —
both bounded by the token's document frequency, which the df-ascending
prefix order makes small on any corpus whose vocabulary grows with its
size. Sets travel duplicated once per prefix token (factor
(1-tau)*s + 1 — small for high tau), and only verified
(doc_a, doc_b, jac) pairs leave the shards.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..shuffle import hash_exchange, hash_reduce


def _doc_sets(texts) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc DISTINCT sorted token-hash sets.

    Returns (flat value-sorted-unique hashes, per-doc set sizes); doc
    j's set is flat[offsets[j]:offsets[j+1]] ascending, where offsets =
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


def _token_df(ds, text_col: str):
    """(sorted token array, df array) over DISTINCT per-doc tokens."""

    def partial(t: pa.Table) -> pa.Table:
        flat, _ = _doc_sets(t[text_col])
        uniq, cnt = np.unique(flat, return_counts=True)
        return pa.table({"tok": pa.array(uniq, pa.int64()),
                         "df": pa.array(cnt, pa.int64())})

    res = hash_reduce(
        ds.select_columns([text_col]).map_batches(
            partial, batch_format="pyarrow").to_arrow_refs(),
        ["tok"], ["df"])
    if res is None or res.num_rows == 0:
        return np.array([], np.int64), np.array([], np.int64)
    toks = np.asarray(res["tok"])
    dfs = np.asarray(res["df"])
    order = np.argsort(toks, kind="stable")
    return toks[order], dfs[order]


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
    import ray

    if not 0.0 < tau <= 1.0:
        raise ValueError("tau must be in (0, 1]")

    vocab, dfs = _token_df(ds, text_col)
    vocab_ref = ray.put((vocab, dfs))

    def prep(t: pa.Table) -> pa.Table:
        vtoks, vdfs = ray.get(vocab_ref)  # zero-copy plasma read
        ids = np.asarray(pc.cast(t[id_col], pa.int64()))
        flat, sizes = _doc_sets(t[text_col])
        nz = sizes > 0
        empty = pa.table({
            "tok": pa.array([], pa.int64()),
            "doc": pa.array([], pa.int64()),
            "sz": pa.array([], pa.int64()),
            "set": pa.array([], pa.list_(pa.int64())),
        })
        if not nz.any():
            return empty
        # prefix length p = s - ceil(tau*s) + 1; the epsilon can only
        # LOWER ceil(tau*s) by one at float boundaries, which lengthens
        # the prefix — the safe direction (verification stays exact)
        req = np.ceil(tau * sizes - 1e-9).astype(np.int64)
        p = np.where(nz, sizes - req + 1, 0)
        offsets = np.concatenate(([0], np.cumsum(sizes)))
        sets = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(flat, pa.int64()))
        # re-order each doc's set by the GLOBAL (df, token) order: one
        # lexsort serves the batch (doc-major, then df, then token)
        if len(vtoks):
            pos = np.clip(np.searchsorted(vtoks, flat), 0, len(vtoks) - 1)
            dfv = np.where(vtoks[pos] == flat, vdfs[pos], 0).astype(
                np.int64)
        else:  # unreachable when the df pass saw the same dataset
            dfv = np.zeros(len(flat), np.int64)
        doc_idx = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        order = np.lexsort((flat, dfv, doc_idx))
        flat_df = flat[order]
        # within-doc position under df order (doc runs are contiguous
        # and sizes unchanged by the re-sort)
        within = np.arange(len(flat_df), dtype=np.int64) - np.repeat(
            offsets[:-1], sizes)
        pfx_mask = within < p[doc_idx]
        pfx_flat = flat_df[pfx_mask]
        # one posting row per prefix token
        doc_rep = np.repeat(np.arange(len(sizes), dtype=np.int64), p)
        return pa.table({
            "tok": pa.array(pfx_flat, pa.int64()),
            "doc": pa.array(ids[doc_rep], pa.int64()),
            "sz": pa.array(sizes[doc_rep], pa.int64()),
            "set": sets.take(pa.array(doc_rep, pa.int64())),
        })

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        da_out: list[np.ndarray] = []
        db_out: list[np.ndarray] = []
        jac_out: list[np.ndarray] = []
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
            gd = docs[lo:hi]
            gs = szs[lo:hi].astype(np.int64)
            gsets = sets[lo:hi]
            # verify EVERY group pair exactly, vectorized: dictionary-
            # encode the group's tokens locally and compute all pairwise
            # intersection sizes with one dense GEMM (g × local-vocab
            # membership matrix) — exact, and BLAS-speed even when a
            # degenerate corpus (tiny vocab, everything similar) makes
            # the group all-docs. Falls back to per-pair sorted
            # intersects only for tiny groups where GEMM setup dominates.
            if g >= 16:
                allt = np.concatenate(gsets)
                uniq, inv = np.unique(allt, return_inverse=True)
                m = np.zeros((g, len(uniq)), np.float32)
                rows = np.repeat(np.arange(g, dtype=np.int64), gs)
                m[rows, inv] = 1.0
                inter = np.rint(m @ m.T).astype(np.int64)
                union = gs[:, None] + gs[None, :] - inter
                jac = inter / union
                ii, jj = np.triu_indices(g, k=1)
                hit = jac[ii, jj] >= tau
                ii, jj = ii[hit], jj[hit]
                da_out.append(gd[ii])
                db_out.append(gd[jj])
                jac_out.append(jac[ii, jj])
            else:
                ii, jj = np.triu_indices(g, k=1)
                ok = np.minimum(gs[ii], gs[jj]) + 1e-9 >= tau * np.maximum(
                    gs[ii], gs[jj])
                pa_da: list[int] = []
                pa_db: list[int] = []
                pa_j: list[float] = []
                for i, j in zip(ii[ok], jj[ok]):
                    sa = gsets[i]
                    sb = gsets[j]
                    inter = np.intersect1d(
                        sa, sb, assume_unique=True).size
                    jac = inter / (len(sa) + len(sb) - inter)
                    if jac >= tau:
                        pa_da.append(int(gd[i]))
                        pa_db.append(int(gd[j]))
                        pa_j.append(float(jac))
                da_out.append(np.asarray(pa_da, np.int64))
                db_out.append(np.asarray(pa_db, np.int64))
                jac_out.append(np.asarray(pa_j, np.float64))
        if not da_out:
            return pa.table({"da": pa.array([], pa.int64()),
                             "db": pa.array([], pa.int64()),
                             "jac": pa.array([], pa.float64())})
        da = np.concatenate(da_out).astype(np.int64)
        db = np.concatenate(db_out).astype(np.int64)
        jc = np.concatenate(jac_out).astype(np.float64)
        # doc-id order within the pair (group order is posting order)
        swap = da > db
        da2 = np.where(swap, db, da)
        db2 = np.where(swap, da, db)
        return pa.table({"da": pa.array(da2), "db": pa.array(db2),
                         "jac": pa.array(jc)})

    def dedup_pairs(t: pa.Table) -> pa.Table:
        # a pair verifies identically in every group of a shared prefix
        # token (<= prefix-length duplicates); keep one
        return t.group_by(["da", "db"]).aggregate([("jac", "min")]) \
            .rename_columns(["da", "db", "jac"])

    pair_refs = hash_exchange(
        ds.select_columns([id_col, text_col]).map_batches(
            prep, batch_format="pyarrow").to_arrow_refs(),
        ["tok"], finish, return_refs=True)
    res = hash_exchange(pair_refs, ["da", "db"], dedup_pairs,
                        shard_output_dir=shard_output_dir)
    if shard_output_dir is not None:
        return None
    empty = pa.table({"da": pa.array([], pa.int64()),
                      "db": pa.array([], pa.int64()),
                      "jac": pa.array([], pa.float64())})
    if res is None or res.num_rows == 0:
        return empty
    return res.sort_by([("da", "ascending"), ("db", "ascending")])
