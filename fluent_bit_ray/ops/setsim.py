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

    pass 0 (the ONLY read of the text column): map_batches tokenizes
    (the `ops/dedup` zero-copy Arrow split + vectorized polynomial
    hash) into per-doc DISTINCT sorted hash sets, materialized once as
    (id, set) Arrow blocks — both later passes read these blocks
    zero-copy from the object store instead of re-reading and
    re-tokenizing the corpus (the round-4 design executed the whole
    dataset twice; at bench scale that second execution was ~40% of
    wall time)
    →  df pass: ONE `shuffle.hash_exchange` over the set blocks whose
    map-side combiner emits per-chunk (tok, df) partials → global token
    RANKS under the (df, token) order, broadcast once via ray.put
    →  posting pass: per-block prefix emission (one remote task per set
    block, vocab read zero-copy) — each doc posts only its first
    (s - ceil(tau*s) + 1) token RANKS under the global order; the
    posting exchange then sizes its shards from the MEASURED posting
    bytes
    →  ONE prefix-rank exchange co-locates each rank's postings
    →  shard-local candidate generation (vectorized triangle per rank
    group), exact verify, and OWNER emission: a pair is emitted ONLY in
    the group of its smallest shared prefix rank, so every qualifying
    pair leaves exactly one shard exactly once — no second exchange, no
    downstream dedup.

Memory at scale: the materialized sets table is the corpus' distinct
token hashes (≤ the text bytes themselves) and lives in the object
store, which spills; the round-4 peak already included the strictly
LARGER posting table (sets duplicated once per prefix rank), so the
single-tokenize design does not raise the high-water mark.

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

Exactly-once emission: every shared prefix rank's group contains both
docs of a qualifying pair (both posted that rank), so the pair's OWNER
group — the smallest shared prefix rank — always sees it; ownership is
checked on verified pairs with one padded rank-matrix broadcast (h ×
p_max² int compares, p_max = (1-tau)·s_max + 1 prefix entries). The
round-3 design verified each pair in every shared group and removed the
duplicates with a second (da, db)-keyed exchange; owner emission keeps
the verify GEMM but deletes that whole all-to-all — at corpus scale the
output pair set never travels twice.

Partitioning assumptions (documented): one PREFIX RANK's posting list
fits a reduce shard, and its g² pair matrix fits that shard's heap —
both bounded by the token's document frequency, which the df-ascending
prefix order makes small on any corpus whose vocabulary grows with its
size. Sets travel duplicated once per prefix rank (factor
(1-tau)*s + 1 — small for high tau), and only owner-emitted verified
(doc_a, doc_b, jac) pairs leave the shards.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..shuffle import hash_exchange, hash_reduce

_PAD = np.iinfo(np.int64).max


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


def _df_combine(t: pa.Table) -> pa.Table:
    """Map-side combiner for the df exchange: a concatenated chunk of
    (id, set) blocks -> per-chunk (tok, df) partial counts. Set values
    are already per-doc DISTINCT, so counting flat occurrences counts
    documents."""
    la = t.combine_chunks().column("set").chunk(0) if t.num_rows else None
    flat = (np.asarray(la.values, dtype=np.int64)
            if la is not None else np.empty(0, np.int64))
    uniq, cnt = np.unique(flat, return_counts=True)
    return pa.table({"tok": pa.array(uniq, pa.int64()),
                     "df": pa.array(cnt.astype(np.int64), pa.int64())})


def _token_df(set_refs) -> tuple[np.ndarray, np.ndarray]:
    """(sorted token array, df array) over the materialized set blocks —
    one hash exchange whose split tasks read the blocks zero-copy and
    emit (tok, df) partials via `_df_combine`."""
    from functools import partial as _partial

    from ..shuffle import _group_sum

    gs = _partial(_group_sum, keys=["tok"], vals=["df"])
    # _df_combine output is already unique-per-chunk, so it IS the
    # map-side combine; gs merges the per-chunk partials in the shards
    res = hash_exchange(set_refs, ["tok"], gs, combine_fn=_df_combine)
    if res is None or res.num_rows == 0:
        return np.array([], np.int64), np.array([], np.int64)
    toks = np.asarray(res["tok"])
    dfs = np.asarray(res["df"])
    order = np.argsort(toks, kind="stable")
    return toks[order], dfs[order]


def _multi_slice_gather(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Flat gather indices for values[starts[i]:starts[i]+lens[i]] per i,
    concatenated — one vectorized fancy-index instead of a slice loop."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64)
    cum = np.concatenate(([0], np.cumsum(lens[:-1])))
    return np.repeat(starts - cum, lens) + np.arange(total, dtype=np.int64)


def _padded_ranks(off: np.ndarray, val: np.ndarray,
                  idx: np.ndarray) -> np.ndarray:
    """(len(idx), p_max) matrix of the selected docs' prefix ranks,
    PAD-filled — the owner check's broadcast operand."""
    p0 = off[idx]
    plen = off[idx + 1] - p0
    pmax = int(plen.max()) if len(plen) else 0
    padded = np.full((len(idx), max(pmax, 1)), _PAD, np.int64)
    rows = np.repeat(np.arange(len(idx), dtype=np.int64), plen)
    within = _multi_slice_gather(np.zeros(len(idx), np.int64), plen)
    padded[rows, within] = val[_multi_slice_gather(p0, plen)]
    return padded


# per-chunk element budget for the owner check's (chunk, p_max, p_max)
# broadcast temporaries: 4M int64 elements ~= 32 MB, independent of how
# many pairs a near-duplicate-dense group verifies
_OWNER_CHUNK_ELEMS = 1 << 22


def _owner_rank(padded: np.ndarray, ii: np.ndarray, jj: np.ndarray,
                chunk_elems: Optional[int] = None) -> np.ndarray:
    """Smallest rank present in BOTH pairs' prefixes, per (ii, jj) pair.

    PAD==PAD positions match each other but contribute _PAD, which never
    wins the min: the group's own rank is always shared, so the true
    owner is <= it < _PAD. Pairs are processed in bounded chunks: the
    broadcast temporaries are (pairs, p_max, p_max), which for a dense
    group (h ~ g^2/2 hits, long prefixes) would otherwise dwarf the g^2
    similarity matrix the heap sizing assumes."""
    if chunk_elems is None:
        chunk_elems = _OWNER_CHUNK_ELEMS
    pmax = padded.shape[1]
    out = np.empty(len(ii), np.int64)
    step = max(1, chunk_elems // max(1, pmax * pmax))
    for lo in range(0, len(ii), step):
        a = padded[ii[lo:lo + step]]
        b = padded[jj[lo:lo + step]]
        m = a[:, :, None] == b[:, None, :]
        out[lo:lo + step] = np.where(m, a[:, :, None], _PAD).min(axis=(1, 2))
    return out


def jaccard_join(
    ds,
    id_col: str,
    text_col: str,
    tau: float,
    shard_output_dir: Optional[str] = None,
    _owner_chunk_elems: Optional[int] = None,
):
    """All pairs (doc_a < doc_b) with token-set Jaccard >= tau, exact.

    Tokenization is whitespace-split (str.split() parity, matching the
    text-suite oracles); similarity is over DISTINCT tokens. Docs whose
    token set is empty never pair (SQL: no posting rows). Returns
    (da, db, jac) sorted by (da, db). With `shard_output_dir`, shards
    are keyed by owner prefix rank (each pair appears in exactly one
    shard file). `_owner_chunk_elems` overrides the owner check's
    per-chunk element budget (test knob: a closure-captured value ships
    by VALUE to Ray workers, unlike a monkeypatched module global which
    workers re-import at its default)."""
    import ray

    if not 0.0 < tau <= 1.0:
        raise ValueError("tau must be in (0, 1]")

    # pass 0 — the ONLY read/tokenize of the corpus: materialize per-doc
    # DISTINCT sorted token-hash sets as (id, set) blocks; both exchanges
    # below read these blocks zero-copy from the object store
    def make_sets(t: pa.Table) -> pa.Table:
        ids = np.asarray(pc.cast(t[id_col], pa.int64()))
        flat, sizes = _doc_sets(t[text_col])
        offsets = np.concatenate(([0], np.cumsum(sizes)))
        sets = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(flat, pa.int64()))
        return pa.table({"id": pa.array(ids, pa.int64()), "set": sets})

    set_refs = ds.select_columns([id_col, text_col]).map_batches(
        make_sets, batch_format="pyarrow").to_arrow_refs()

    vocab, dfs = _token_df(set_refs)
    # global prefix order = (df, token) ascending, as a dense rank so the
    # exchange key, the per-doc prefix lists, and the owner check all
    # speak the same integer
    gorder = np.lexsort((vocab, dfs))
    rank = np.empty(len(vocab), np.int64)
    rank[gorder] = np.arange(len(vocab), dtype=np.int64)
    vocab_ref = ray.put((vocab, rank))

    empty_posting = pa.table({
        "tok": pa.array([], pa.int64()),
        "doc": pa.array([], pa.int64()),
        "set": pa.array([], pa.list_(pa.int64())),
        "pfx": pa.array([], pa.list_(pa.int64())),
    })

    def prep(t: pa.Table) -> pa.Table:
        """Per-set-block posting emission: an (id, set) block -> posting
        rows (one per prefix rank per doc)."""
        vtoks, vranks = ray.get(vocab_ref)  # zero-copy plasma read
        tc = t.combine_chunks()
        ids = np.asarray(tc["id"])
        set_la = (tc.column("set").chunk(0) if tc.num_rows
                  else pa.array([], pa.list_(pa.int64())))
        set_offs = np.asarray(set_la.offsets, dtype=np.int64)
        flat = np.asarray(set_la.values, dtype=np.int64)
        sizes = set_offs[1:] - set_offs[:-1]
        if len(set_offs) and (set_offs[0] != 0 or set_offs[-1] != len(flat)):
            # sliced list array: .values spans the WHOLE buffer — compact
            # to the zero-based layout the offset math below assumes
            flat = flat[_multi_slice_gather(set_offs[:-1], sizes)]
        nz = sizes > 0
        if not nz.any():
            return empty_posting
        # prefix length p = s - ceil(tau*s) + 1; the epsilon can only
        # LOWER ceil(tau*s) by one at float boundaries, which lengthens
        # the prefix — the safe direction (verification stays exact)
        req = np.ceil(tau * sizes - 1e-9).astype(np.int64)
        p = np.where(nz, sizes - req + 1, 0)
        offsets = np.concatenate(([0], np.cumsum(sizes)))
        sets = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(flat, pa.int64()))
        # per-token global rank (every token was seen by the df pass on
        # the same dataset, so the searchsorted always hits)
        if len(vtoks):
            pos = np.clip(np.searchsorted(vtoks, flat), 0, len(vtoks) - 1)
            rankv = np.where(vtoks[pos] == flat, vranks[pos], 0).astype(
                np.int64)
        else:  # unreachable when the df pass saw the same dataset
            rankv = np.zeros(len(flat), np.int64)
        # re-order each doc's set by the global order: one lexsort serves
        # the batch (doc-major, then rank); within a doc ranks ascend
        doc_idx = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        order = np.lexsort((rankv, doc_idx))
        flat_rank = rankv[order]
        # within-doc position under the global order (doc runs are
        # contiguous and sizes unchanged by the re-sort)
        within = np.arange(len(flat_rank), dtype=np.int64) - np.repeat(
            offsets[:-1], sizes)
        pfx_mask = within < p[doc_idx]
        pfx_ranks = flat_rank[pfx_mask]
        pfx = pa.ListArray.from_arrays(
            pa.array(np.concatenate(([0], np.cumsum(p))), pa.int32()),
            pa.array(pfx_ranks, pa.int64()))
        # one posting row per prefix rank
        doc_rep = np.repeat(np.arange(len(sizes), dtype=np.int64), p)
        take = pa.array(doc_rep, pa.int64())
        # no size column: a doc's DISTINCT token count is exactly its
        # set-list length, which finish() reads off the list offsets
        return pa.table({
            "tok": pa.array(pfx_ranks, pa.int64()),
            "doc": pa.array(ids[doc_rep], pa.int64()),
            "set": sets.take(take),
            "pfx": pfx.take(take),
        })

    empty_pairs = pa.table({"da": pa.array([], pa.int64()),
                            "db": pa.array([], pa.int64()),
                            "jac": pa.array([], pa.float64())})

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty_pairs
        tc = t.combine_chunks()
        toks = np.asarray(tc["tok"])
        docs = np.asarray(tc["doc"])
        set_la = tc.column("set").chunk(0)
        set_off = np.asarray(set_la.offsets, dtype=np.int64)
        set_val = np.asarray(set_la.values, dtype=np.int64)
        pfx_la = tc.column("pfx").chunk(0)
        pfx_off = np.asarray(pfx_la.offsets, dtype=np.int64)
        pfx_val = np.asarray(pfx_la.values, dtype=np.int64)
        order = np.lexsort((docs, toks))
        st = toks[order]
        starts = np.concatenate(
            ([0], np.nonzero(st[1:] != st[:-1])[0] + 1, [len(st)]))
        da_out: list[np.ndarray] = []
        db_out: list[np.ndarray] = []
        jac_out: list[np.ndarray] = []
        for gi in range(len(starts) - 1):
            lo, hi = starts[gi], starts[gi + 1]
            g = hi - lo
            if g < 2:
                continue
            idx = order[lo:hi]
            r = int(st[lo])  # this group's prefix rank
            gd = docs[idx]
            s0 = set_off[idx]
            slen = set_off[idx + 1] - s0
            gs = slen  # doc's distinct-token count IS its set length
            # verify EVERY group pair exactly, vectorized: dictionary-
            # encode the group's tokens locally and compute all pairwise
            # intersection sizes with one dense GEMM (g × local-vocab
            # membership matrix) — exact, and BLAS-speed even when a
            # degenerate corpus (tiny vocab, everything similar) makes
            # the group all-docs. Falls back to per-pair sorted
            # intersects only for tiny groups where GEMM setup dominates.
            if g >= 16:
                allt = set_val[_multi_slice_gather(s0, slen)]
                uniq, inv = np.unique(allt, return_inverse=True)
                m = np.zeros((g, len(uniq)), np.float32)
                rows = np.repeat(np.arange(g, dtype=np.int64), slen)
                m[rows, inv] = 1.0
                inter = np.rint(m @ m.T).astype(np.int64)
                union = gs[:, None] + gs[None, :] - inter
                jac = inter / union
                ii, jj = np.triu_indices(g, k=1)
                hit = jac[ii, jj] >= tau
                ii, jj = ii[hit], jj[hit]
                if len(ii):
                    # owner emission: keep only pairs whose smallest
                    # shared prefix rank IS this group
                    padded = _padded_ranks(pfx_off, pfx_val, idx)
                    own = _owner_rank(padded, ii, jj,
                                      _owner_chunk_elems) == r
                    ii, jj = ii[own], jj[own]
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
                    sa = set_val[s0[i]:s0[i] + slen[i]]
                    sb = set_val[s0[j]:s0[j] + slen[j]]
                    inter = np.intersect1d(
                        sa, sb, assume_unique=True).size
                    jac = inter / (len(sa) + len(sb) - inter)
                    if jac < tau:
                        continue
                    fa = pfx_val[pfx_off[idx[i]]:pfx_off[idx[i] + 1]]
                    fb = pfx_val[pfx_off[idx[j]]:pfx_off[idx[j] + 1]]
                    shared = np.intersect1d(fa, fb, assume_unique=True)
                    if int(shared.min()) != r:  # another group owns it
                        continue
                    pa_da.append(int(gd[i]))
                    pa_db.append(int(gd[j]))
                    pa_j.append(float(jac))
                da_out.append(np.asarray(pa_da, np.int64))
                db_out.append(np.asarray(pa_db, np.int64))
                jac_out.append(np.asarray(pa_j, np.float64))
        if not da_out:
            return empty_pairs
        da = np.concatenate(da_out).astype(np.int64)
        db = np.concatenate(db_out).astype(np.int64)
        jc = np.concatenate(jac_out).astype(np.float64)
        # doc-id order within the pair (group order is posting order)
        swap = da > db
        da2 = np.where(swap, db, da)
        db2 = np.where(swap, da, db)
        return pa.table({"da": pa.array(da2), "db": pa.array(db2),
                         "jac": pa.array(jc)})

    # posting emission as one small task per set block (blocks read
    # zero-copy; vocab_ref dereferenced zero-copy inside each task). The
    # exchange then sizes its shard count from the MEASURED posting
    # bytes — at low tau postings dwarf the sets (each set travels once
    # per prefix rank), so sizing from set bytes would undershoot.
    prep_task = ray.remote(prep)
    res = hash_exchange(
        [prep_task.remote(r) for r in set_refs],
        ["tok"], finish, shard_output_dir=shard_output_dir)
    if shard_output_dir is not None:
        return None
    if res is None or res.num_rows == 0:
        return empty_pairs
    return res.sort_by([("da", "ascending"), ("db", "ascending")])
