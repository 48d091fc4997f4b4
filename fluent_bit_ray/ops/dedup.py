"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's scope (it has no dedup, SURVEY §2.6) — these are the
web-corpus operators a 100 TB pipeline needs, each designed Ray-Data-first:

- exact_dedup: hash-partitioned first-per-text. The exchange is keyed on a
  64-bit content hash and ships (hash, id, text) rows so collisions resolve
  exactly inside the shard; at corpus scale pass `shard_output_dir` so shard
  results stream to parquet instead of materializing on the driver.
- minhash_lsh_dedup: shingle → minhash signature → banded LSH buckets →
  per-bucket representative election. One groupby on (band, bucket-hash)
  whose keys are uniform 64-bit hashes (no skew), one groupby on doc id.
- simhash_dedup: 64-bit simhash; exact-simhash collision grouping.
- ngram_jaccard_pairs: candidate pairs from LSH buckets verified with exact
  n-gram Jaccard — the verification joins only WITHIN buckets.

All hashing is blake2b-derived and deterministic (no process salt).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE = (1 << 61) - 1


def add_text_hash(batch: pa.Table, text_col: str = "text", out: str = "text_hash") -> pa.Table:
    """Partitioning hash per text, vectorized (nulls hash like "" — they
    only share a shard; exactness is resolved by the in-shard group-by)."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    h = _hash_string_array(pc.fill_null(col, "")) & _U64(0x7FFFFFFFFFFFFFFF)
    return batch.append_column(out, pa.array(h.astype(np.int64)))


def exact_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_output_dir: Optional[str] = None,
) -> Optional[pa.Table]:
    """Keep the first (min id) document per exact text.

    Hash in map_batches -> hash_exchange on the 8-byte content hash (the
    exchange moves hash+id+text rows, co-locating candidates) -> per-shard
    group by the actual text (collisions resolved inside the shard).

    Returns a driver-side Table by default; pass `shard_output_dir` at
    corpus scale and each shard writes parquet instead (returns None).
    """
    from ..shuffle import hash_exchange

    ds = ds.map_batches(
        lambda b: add_text_hash(b, text_col), batch_format="pyarrow",
        batch_size=None,
    )

    def first_per_text(t: pa.Table) -> pa.Table:
        g = t.group_by([text_col]).aggregate([(id_col, "min")])
        g = g.rename_columns(
            [id_col if c == f"{id_col}_min" else c for c in g.column_names]
        )
        return g.select([id_col, text_col])

    out = hash_exchange(ds.to_arrow_refs(), ["text_hash"], first_per_text,
                        shard_output_dir=shard_output_dir)
    if shard_output_dir is not None:
        return None
    if out is None:
        return pa.table({id_col: pa.array([], pa.int64()),
                         text_col: pa.array([], pa.string())})
    return out


def soft_dedup_weights(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_output_dir: Optional[str] = None,
) -> Optional[pa.Table]:
    """SoftDeDup (He et al. 2024, public method): instead of DROPPING
    exact duplicates, keep every document and emit a training weight
    1/n for each member of an n-way exact-duplicate group — duplicates
    still contribute, proportionally down-weighted (sampling-temperature
    style reweighting at the dedup layer).

    Same exchange shape as exact_dedup: content-hash co-location, then a
    shard-local group-size computation by the ACTUAL text
    (collision-exact). The in-shard kernel is a dictionary-encode +
    bincount gather — no join, no per-row Python. NULL texts form ONE
    group (they all hash alike and so share a shard), matching SQL's
    `count(*) OVER (PARTITION BY text)` null partitioning.
    """
    from ..shuffle import hash_exchange

    ds = ds.map_batches(
        lambda b: add_text_hash(b, text_col), batch_format="pyarrow",
        batch_size=None,
    )

    def weights(t: pa.Table) -> pa.Table:
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        enc = col.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)  # NaN for null
        valid = ~np.isnan(codes) if codes.dtype.kind == "f" else np.ones(
            len(codes), bool)
        n = np.empty(len(codes), dtype=np.float64)
        iv = codes[valid].astype(np.int64)
        if iv.size:
            sizes = np.bincount(iv)
            n[valid] = sizes[iv]
        n_null = int((~valid).sum())
        if n_null:
            n[~valid] = n_null
        return pa.table(
            {
                id_col: t[id_col],
                "weight": pa.array(1.0 / n, pa.float64()),
            }
        )

    out = hash_exchange(ds.to_arrow_refs(), ["text_hash"], weights,
                        shard_output_dir=shard_output_dir)
    if shard_output_dir is not None:
        return None
    if out is None:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "weight": pa.array([], pa.float64())})
    return out


def keep_best_per_key(
    ds,
    key_col: str = "source",
    score_col: str = "n_chars",
    id_col: str = "doc_id",
    shard_output_dir: Optional[str] = None,
) -> Optional[pa.Table]:
    """URL-level dedup analog: keep ONE row per key — the max-score row,
    ties broken by min id (the web-corpus "keep the longest capture per
    url" rule; here `key_col` stands in for the url/host).

    Map-side argmax partial (≤ one candidate row per key per batch) →
    key-hash exchange moving only those winners (combiner re-argmaxes each
    split chunk) → shard-local argmax. Exchange traffic is bounded by
    #distinct-keys × #batches, never corpus rows, so a Zipf key
    distribution costs nothing extra: a hot key still contributes one
    candidate row per batch. Null keys group together (as ""); null
    scores sort last.
    """
    from ..shuffle import hash_exchange

    def best_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        keys = t[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        codes = np.asarray(
            pc.dictionary_encode(pc.fill_null(keys, "")).indices
        ).astype(np.int64)
        score = np.asarray(
            pc.fill_null(pc.cast(t[score_col], pa.float64()), -np.inf)
        )
        ids = np.asarray(t[id_col]).astype(np.int64)
        # primary: key group; secondary: score desc; tertiary: id asc
        order = np.lexsort((ids, -score, codes))
        sorted_codes = codes[order]
        first = np.concatenate(
            ([True], sorted_codes[1:] != sorted_codes[:-1])
        )
        return t.take(pa.array(order[first]))

    partials = ds.map_batches(best_rows, batch_format="pyarrow",
                              batch_size=None)
    out = hash_exchange(partials.to_arrow_refs(), [key_col], best_rows,
                        combine_fn=best_rows,
                        shard_output_dir=shard_output_dir)
    if shard_output_dir is not None:
        return None
    if out is None:
        arrow_sch = getattr(ds.schema(), "base_schema", None)
        return (arrow_sch.empty_table()
                if isinstance(arrow_sch, pa.Schema) else pa.table({}))
    return out


# ------------------------------------------------------------------ minhash

_U64 = np.uint64
# odd multiplier for the polynomial shingle combine (invertible mod 2^64)
_POLY_C = _U64(0x9E3779B97F4A7C15 | 1)
_POLY_C_INV = _U64(pow(int(_POLY_C), -1, 1 << 64))


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: mixes the weak polynomial combine into a
    well-distributed 64-bit hash (public-domain constants)."""
    with np.errstate(over="ignore"):
        x = (x + _U64(0x9E3779B97F4A7C15))
        x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)
        return x ^ (x >> _U64(31))


def _hash_string_array(sarr: pa.Array) -> np.ndarray:
    """Vectorized 64-bit hash of every string in an Arrow string array.

    Rolling polynomial over (byte+1) values using the global-prefix trick
    (see _shingle_hashes), splitmix64-finalized and xor'd with the length —
    zero per-string Python. Collision quality is adequate for LSH/dedup
    partitioning (a 64-bit mixed polynomial), and the hash is a documented
    engine contract, not a crypto primitive.
    """
    if isinstance(sarr, pa.ChunkedArray):
        sarr = sarr.combine_chunks()
    n = len(sarr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    bufs = sarr.buffers()
    odt = np.int64 if pa.types.is_large_string(sarr.type) else np.int32
    off = np.frombuffer(bufs[1], odt)[sarr.offset : sarr.offset + n + 1].astype(
        np.int64
    )
    data = np.frombuffer(bufs[2] or b"", np.uint8)[off[0] : off[-1]]
    off = off - off[0]
    lens = (off[1:] - off[:-1]).astype(np.uint64)
    m = len(data)
    with np.errstate(over="ignore"):
        h = data.astype(np.uint64) + _U64(1)
        ipw = np.empty(m + 1, dtype=np.uint64)
        pw = np.empty(m + 1, dtype=np.uint64)
        pw[0] = ipw[0] = 1
        if m:
            np.cumprod(np.full(m, _POLY_C, dtype=np.uint64), out=pw[1:])
            np.cumprod(np.full(m, _POLY_C_INV, dtype=np.uint64), out=ipw[1:])
            pref = np.concatenate(
                ([_U64(0)], np.cumsum(h * ipw[:m], dtype=np.uint64))
            )
        else:
            pref = np.zeros(1, dtype=np.uint64)
        s, e = off[:-1], off[1:]
        out = (pref[e] - pref[s]) * pw[np.maximum(e, 1) - 1]
        return _splitmix64(out ^ (lens * _U64(0x9E3779B97F4A7C15)))


def _token_arrays(texts) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize a batch -> (flat token-hash array, per-doc token counts).

    Accepts a Python list of strings OR an Arrow string array. The whole
    path is C/numpy: Arrow whitespace split, empty-token filtering (for
    str.split() parity), dictionary encode (each DISTINCT token hashed
    once), and the vectorized polynomial string hash — no per-token or
    per-doc Python.
    """
    if isinstance(texts, pa.ChunkedArray):
        arr = texts.combine_chunks()
    elif isinstance(texts, pa.Array):
        arr = texts
    else:
        arr = pa.array(
            [t if isinstance(t, str) else "" for t in texts], pa.string()
        )
    arr = pc.fill_null(arr, "")
    lists = pc.utf8_split_whitespace(arr)
    flat = pc.list_flatten(lists)
    raw_counts = np.asarray(pc.list_value_length(lists)).astype(np.int64)
    empty = np.asarray(pc.equal(flat, ""))
    counts = raw_counts
    if empty.any():
        # Arrow's split keeps ''-tokens at runs/edges where str.split()
        # drops them: subtract per-doc empty counts and filter them out
        cs = np.concatenate(([0], np.cumsum(empty, dtype=np.int64)))
        bounds = np.concatenate(([0], np.cumsum(raw_counts)))
        counts = raw_counts - (cs[bounds[1:]] - cs[bounds[:-1]])
        flat = flat.filter(pa.array(~empty))
    if len(flat) == 0:
        return np.empty(0, dtype=np.uint64), counts
    enc = pc.dictionary_encode(flat)
    codes = np.asarray(enc.indices).astype(np.int64)
    uh = _hash_string_array(enc.dictionary)
    return uh[codes], counts


def _shingle_hashes(
    flat_h: np.ndarray, counts: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Rolling polynomial k-shingle hashes over per-doc token-hash runs.

    Returns (shingle hash array, per-doc shingle counts). Docs shorter than
    k tokens contribute ONE shingle over all their tokens (the old
    " ".join(tokens) semantics); empty docs contribute none.

    Window hash over flat positions [i, j):
        H = (P[j] - P[i]) * c^(j-1)   where P[j] = sum_{t<j} h[t] * c^(-t)
    — all arithmetic wraps mod 2^64 (numpy uint64), c odd so c^(-1) exists.
    The global prefix telescopes, so windows never mix doc boundaries as
    long as [i, j) stays within one doc. splitmix64 finalizes each hash.
    """
    n_tok = len(flat_h)
    w = np.minimum(counts, k)  # per-doc window size
    sh_counts = np.where(counts > 0, np.maximum(counts - k + 1, 1), 0)
    total = int(sh_counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint64), sh_counts
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))

    with np.errstate(over="ignore"):
        # c^t and c^(-t) power ladders over flat positions
        pw = np.empty(n_tok, dtype=np.uint64)
        ipw = np.empty(n_tok, dtype=np.uint64)
        pw[0] = ipw[0] = 1
        if n_tok > 1:
            np.cumprod(np.full(n_tok - 1, _POLY_C, dtype=np.uint64), out=pw[1:])
            np.cumprod(np.full(n_tok - 1, _POLY_C_INV, dtype=np.uint64), out=ipw[1:])
        pref = np.concatenate(
            ([_U64(0)], np.cumsum(flat_h * ipw, dtype=np.uint64))
        )

        # window starts: per-doc arange, fully vectorized
        doc_of = np.repeat(np.arange(len(counts)), sh_counts)
        sh_off = np.concatenate(([0], np.cumsum(sh_counts)[:-1]))
        within = np.arange(total, dtype=np.int64) - np.repeat(sh_off, sh_counts)
        starts = np.repeat(offsets, sh_counts) + within
        ends = starts + np.repeat(w, sh_counts)

        h = (pref[ends] - pref[starts]) * pw[ends - 1]
        return _splitmix64(h), sh_counts


class MinHasher:
    """Batch-vectorized minhash with multiply-shift permutations.

    signature[i] = min over shingles of ((a_i * h + b_i) mod 2^64) — the
    multiply-add family over the full 64-bit ring (numpy wraparound IS the
    modulus), a_i odd. The whole batch is one numpy pipeline: unique-token
    blake2b (once per distinct token), rolling polynomial shingle combine,
    one outer product per shingle chunk, and np.minimum.reduceat over doc
    boundaries — no per-doc or per-shingle Python loop.
    """

    # shingle tile sized so num_perm x tile stays cache-resident (~4 MB):
    # streaming the full [num_perm, n_shingles] intermediate through DRAM
    # measured ~200x slower on low-memory-bandwidth hosts
    _TILE = 8192

    def __init__(self, num_perm: int = 64, shingle_k: int = 5, seed: int = 42):
        rng = np.random.RandomState(seed)
        a = rng.randint(1, 2**62, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.a = (a * np.uint64(2) + np.uint64(1))  # odd multipliers
        self.b = rng.randint(0, 2**62, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k

    def signature_batch(self, texts: list) -> np.ndarray:
        """Signatures for a batch -> uint64 [n_docs, num_perm]."""
        n_docs = len(texts)
        out = np.zeros((n_docs, self.num_perm), dtype=np.uint64)
        flat_h, counts = _token_arrays(texts)
        sh, sh_counts = _shingle_hashes(flat_h, counts, self.k)
        if len(sh) == 0:
            return out  # all docs empty -> zero signatures (old semantics)
        nonempty = sh_counts > 0
        starts = np.concatenate(([0], np.cumsum(sh_counts[nonempty])[:-1]))

        sigs = np.full(
            (self.num_perm, len(starts)), np.iinfo(np.uint64).max,
            dtype=np.uint64,
        )
        a, b = self.a, self.b
        buf = np.empty((self.num_perm, self._TILE), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for lo in range(0, len(sh), self._TILE):
                hi = min(lo + self._TILE, len(sh))
                w = hi - lo
                np.multiply(a[:, None], sh[None, lo:hi], out=buf[:, :w])
                np.add(buf[:, :w], b[:, None], out=buf[:, :w])
                # docs overlapping this tile: partial minima, merged into sigs
                d0 = int(np.searchsorted(starts, lo, "right")) - 1
                d1 = int(np.searchsorted(starts, hi, "left"))
                idx = np.clip(starts[d0:d1], lo, hi) - lo
                part = np.minimum.reduceat(buf[:, :w], idx, axis=1)
                np.minimum(sigs[:, d0:d1], part, out=sigs[:, d0:d1])
        out[nonempty] = sigs.T
        return out

    def signature(self, text: str) -> np.ndarray:
        return self.signature_batch([text])[0]


def minhash_lsh_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    shard_output_dir: Optional[str] = None,
    propagate: bool = True,
    max_rounds: int = 16,
):
    """LSH near-dup clustering: returns (doc_id, rep_id) — rep_id is the
    elected representative (the min doc id of the doc's CONNECTED
    COMPONENT in the bucket-sharing graph). rep_id == doc_id means "keep".

    Pipeline: map_batches(signatures) -> flat rows (band, bucket_hash, id)
    -> bucket exchange (shard-local rep election + per-doc combine) ->
    doc-id exchange (global per-doc min) -> label-propagation rounds to a
    FIXPOINT (propagate=True): each round labels flow doc -> bucket ->
    doc through two more hash exchanges, and the loop stops when the
    (monotonically non-increasing) label sum stops changing — so rep
    chains across transitive bucket overlaps (A~B in bucket 1, B~C in
    bucket 2) fully collapse and every rep maps to itself by
    construction. Near-dup components are shallow, so this converges in
    1-2 extra rounds. All shuffles move fixed-width rows only and CHAIN
    through the object store (return_refs) — the driver never holds the
    O(docs) rep table (it only reduces per-shard label SUMS per round);
    at corpus scale pass `shard_output_dir` and the final shards stream
    to parquet instead (returns None).
    """
    if num_perm % bands:
        raise ValueError(
            f"num_perm ({num_perm}) must be divisible by bands ({bands}) — "
            "trailing permutations would be silently discarded"
        )
    rows_per_band = num_perm // bands
    hasher_holder: dict = {}

    def to_buckets(batch: pa.Table) -> pa.Table:
        h = hasher_holder.get("h")
        if h is None:
            h = MinHasher(num_perm, shingle_k)
            hasher_holder["h"] = h
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sigs = h.signature_batch(batch[text_col])  # [n, num_perm]
        n = len(ids)
        # band bucket hash: polynomial combine of the band's segment values
        # + the band index as seed, splitmix-finalized — vectorized over
        # the whole [n, bands] grid at once
        seg = sigs.reshape(n, bands, rows_per_band)
        with np.errstate(over="ignore"):
            bh = np.zeros((n, bands), dtype=np.uint64)
            for r in range(rows_per_band):  # rows_per_band is small (2-8)
                bh = bh * _POLY_C + seg[:, :, r]
            bh = _splitmix64(
                bh ^ (np.arange(bands, dtype=np.uint64) * _U64(0xABCD1234))
            )
        bucket = (bh & _U64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, bands)),
                "band": pa.array(
                    np.tile(np.arange(bands, dtype=np.int32), n)
                ),
                "bucket": pa.array(bucket.reshape(-1)),
            }
        )

    from ..shuffle import hash_exchange

    buckets = ds.map_batches(to_buckets, batch_format="pyarrow", batch_size=None)

    def bucket_reps(t: pa.Table) -> pa.Table:
        # all rows of a (band,bucket) land in this shard: shard-local rep
        # election (grouped-min transform), then per-doc min across the
        # shard's buckets — the map-side combine for the final per-doc min
        df = t.to_pandas()
        df["rep_id"] = df.groupby(["band", "bucket"])[id_col].transform("min")
        out = df.groupby(id_col, as_index=False)["rep_id"].min()
        return pa.Table.from_pandas(out, preserve_index=False)

    def doc_min(t: pa.Table) -> pa.Table:
        # (name-based rename: pyarrow's aggregate column ORDER is not
        # stable across versions, only the `<col>_min` naming is)
        g = t.group_by([id_col]).aggregate([("rep_id", "min")])
        g = g.rename_columns(
            ["rep_id" if c == "rep_id_min" else c for c in g.column_names]
        )
        return g.select([id_col, "rep_id"])

    edge_refs = buckets.to_arrow_refs()
    cand_refs = hash_exchange(
        edge_refs, ["band", "bucket"], bucket_reps, return_refs=True,
    )
    label_refs = hash_exchange(
        cand_refs, [id_col], doc_min, combine_fn=doc_min, return_refs=True,
    )
    label_refs = [r for r in label_refs if r is not None]

    if propagate:
        import ray

        label_sum = ray.remote(
            lambda t: 0 if t is None else (pc.sum(t["rep_id"]).as_py() or 0)
        )

        def _sum(refs) -> int:
            return sum(ray.get([label_sum.remote(r) for r in refs]))

        def edges_with_labels(t: pa.Table) -> Optional[pa.Table]:
            # shard holds all of its docs' edge rows AND label rows (the
            # concat promotes missing columns to null -> pandas floats;
            # cast back — every doc has a label, so no NaN survives)
            df = t.to_pandas()
            lab = df[df["band"].isna()][[id_col, "rep_id"]]
            ed = df[df["band"].notna()][[id_col, "band", "bucket"]]
            if not len(ed):
                return None
            m = ed.merge(lab, on=id_col, how="left")
            for c in ("band", "bucket", "rep_id"):
                m[c] = m[c].astype("int64")
            return pa.Table.from_pandas(
                m[[id_col, "band", "bucket", "rep_id"]], preserve_index=False
            )

        def bucket_min_labels(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            df["rep_id"] = df.groupby(["band", "bucket"])["rep_id"].transform("min")
            out = df.groupby(id_col, as_index=False)["rep_id"].min()
            return pa.Table.from_pandas(out, preserve_index=False)

        prev = _sum(label_refs)
        for _ in range(max_rounds):
            joined = hash_exchange(
                list(edge_refs) + list(label_refs), [id_col],
                edges_with_labels, return_refs=True,
            )
            relabeled = hash_exchange(
                joined, ["band", "bucket"], bucket_min_labels,
                return_refs=True,
            )
            new_refs = hash_exchange(
                relabeled, [id_col], doc_min, combine_fn=doc_min,
                return_refs=True,
            )
            label_refs = [r for r in new_refs if r is not None]
            cur = _sum(label_refs)
            if cur == prev:  # labels only decrease: fixpoint reached
                break
            prev = cur

    out = hash_exchange(
        label_refs, [id_col], doc_min, shard_output_dir=shard_output_dir,
    )
    if shard_output_dir is not None:
        return None
    if out is None:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "rep_id": pa.array([], pa.int64())})
    return out


# ------------------------------------------------------------------ simhash

def simhash_batch(texts: list) -> np.ndarray:
    """64-bit simhash per doc -> uint64 [n_docs], fully vectorized.

    bit i (MSB-first) is set when the +1/-1 vote over that bit of every
    token hash is positive. Tokens hash once per DISTINCT token (see
    _token_arrays); the vote is one reduceat over a [tokens, 64] bit
    matrix — no per-token Python loop.
    """
    n_docs = len(texts)
    flat_h, counts = _token_arrays(texts)
    out = np.zeros(n_docs, dtype=np.uint64)
    n_tok = len(flat_h)
    if n_tok == 0:
        return out
    nonempty = counts > 0
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    starts = offsets[nonempty]
    ones = np.zeros((len(starts), 64), dtype=np.int64)
    # token-axis tiles keep the unpacked [tile, 64] bit matrix cache-resident
    # (the full matrix is 64x the token stream — DRAM-bandwidth-bound)
    TILE = 16384
    for lo in range(0, n_tok, TILE):
        hi = min(lo + TILE, n_tok)
        # [w, 8] big-endian bytes -> [w, 64] bits, MSB-first
        bits = np.unpackbits(
            flat_h[lo:hi, None].astype(">u8").view(np.uint8), axis=1
        ).astype(np.int32)
        d0 = int(np.searchsorted(starts, lo, "right")) - 1
        d1 = int(np.searchsorted(starts, hi, "left"))
        idx = np.clip(starts[d0:d1], lo, hi) - lo
        ones[d0:d1] += np.add.reduceat(bits, idx, axis=0)
    votes = 2 * ones - counts[nonempty, None]  # (+1 per set bit, -1 else)
    packed = np.packbits(votes > 0, axis=1)  # MSB-first, 8 bytes per doc
    out[nonempty] = packed.view(">u8").reshape(-1)
    return out


def simhash64(text: str) -> int:
    return int(simhash_batch([text])[0])


def simhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                  shard_output_dir: Optional[str] = None):
    """Exact-simhash dedup: (doc_id, simhash, rep_id=min id per simhash).
    Pass `shard_output_dir` at corpus scale: reduce shards stream to
    parquet instead of concatenating on the driver (returns None)."""

    def add_sim(batch: pa.Table) -> pa.Table:
        sims = (
            simhash_batch(batch[text_col]) & np.uint64(0x7FFFFFFFFFFFFFFF)
        ).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "simhash": pa.array(sims),
            }
        )

    from ..shuffle import hash_exchange

    simmed = ds.map_batches(add_sim, batch_format="pyarrow", batch_size=None)

    def reps(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["rep_id"] = df.groupby("simhash")[id_col].transform("min")
        return pa.Table.from_pandas(df, preserve_index=False)

    out = hash_exchange(simmed.to_arrow_refs(), ["simhash"], reps,
                        shard_output_dir=shard_output_dir)
    if shard_output_dir is not None:
        return None
    if out is None:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "simhash": pa.array([], pa.int64()),
                         "rep_id": pa.array([], pa.int64())})
    return out


def _shingles(tokens: list[str], k: int) -> set:
    if len(tokens) < k:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)}


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = _shingles(a.split(), n), _shingles(b.split(), n)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter) if (sa or sb) else 0.0


def _pair_table(a: np.ndarray, b: np.ndarray) -> pa.Table:
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    return pa.table(
        {"id_a": pa.array(lo, type=pa.int64()), "id_b": pa.array(hi, pa.int64())}
    )


def _block_pairs_task(threshold, id_col, vec_col, ta, tb=None,
                      out_path=None):
    from .ann import _batch_matrix, _normalize, drop_invalid_vectors

    ta = drop_invalid_vectors(ta, vec_col)
    cross_empty = False
    if tb is not None:
        tb = drop_invalid_vectors(tb, vec_col)
        cross_empty = tb.num_rows == 0
    if ta.num_rows == 0 or cross_empty:
        # a fully-invalid block contributes no candidate pairs
        if out_path is not None:
            return 0  # count contract: pairs live on storage
        return _pair_table(np.array([], np.int64), np.array([], np.int64))
    ids_a = ta[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    ma = _normalize(_batch_matrix(ta, vec_col))
    if tb is None:
        sims = ma @ ma.T
        r, c = np.nonzero(np.triu(sims >= threshold, 1))
        out = _pair_table(ids_a[r], ids_a[c])
    else:
        ids_b = tb[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mb = _normalize(_batch_matrix(tb, vec_col))
        r, c = np.nonzero(ma @ mb.T >= threshold)
        out = _pair_table(ids_a[r], ids_b[c])
    if out_path is not None:
        if out.num_rows:
            from ..state import storage

            # shared storage on a multi-node cluster (same contract as
            # shuffle._reduce_shard; see state/storage.py) — create the
            # directory on the executing node; fsspec URIs accepted
            storage.makedirs(storage.dirname(out_path))
            storage.write_parquet(out, out_path)
        return out.num_rows  # pairs live on storage, not the driver
    return out


def embedding_neardup_pairs_blocked(
    ds,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    shard_output_dir: Optional[str] = None,
    max_in_flight: Optional[int] = None,
    max_blocks: int = 256,
):
    """EXACT embedding-cosine near-dup pairs without a whole-corpus
    broadcast: a blocked pair-join over the Dataset's Arrow blocks.

    Each of the B(B+1)/2 tasks reads TWO blocks from the object store and
    emits only its above-threshold pairs — per-task memory is O(block²)
    sims and no task ever holds the full matrix. All-pairs at a loose
    threshold is inherently O(N²) compute; for the near-identical regime
    use the IVF bucketed path below, which trades exactness at loose
    thresholds for bucket-local compute.

    Driver-memory contract (round-4 fix; previously a ray.get over ALL
    B(B+1)/2 futures): tasks are submitted through a BOUNDED in-flight
    window (ray.wait-paced, default 4×CPUs), so driver-held futures and
    task arguments stay flat in B. Results:
    - `shard_output_dir` set → each task writes its own parquet shard and
      returns only a row count; returns None (corpus-scale path — the
      same contract as hash_exchange's shard_output_dir).
    - otherwise a driver-side pa.Table of pairs (output-sized) — and the
      task count is GATED at `max_blocks` blocks (~32k tasks): beyond
      that a driver-side pair table is the wrong tool, and the error
      points at the IVF path / shard_output_dir.
    """
    import ray

    refs = ds.to_arrow_refs()
    B = len(refs)
    if shard_output_dir is None and B > max_blocks:
        raise ValueError(
            f"embedding_neardup_pairs_blocked: {B} blocks means "
            f"{B * (B + 1) // 2} block-pair tasks with a driver-side "
            "result. Pass shard_output_dir= to stream pair shards to "
            "storage, or use embedding_neardup_pairs_ivf (the scale path)."
        )
    cpus = int(ray.cluster_resources().get("CPU", 8))
    window = max_in_flight or 4 * cpus
    task = ray.remote(_block_pairs_task)

    def submissions():
        for i in range(B):
            yield (refs[i], None, i, i)
            for j in range(i + 1, B):
                yield (refs[i], refs[j], i, j)

    parts: list[pa.Table] = []
    total_pairs = 0

    def collect(ref) -> None:
        nonlocal total_pairs
        res = ray.get(ref)
        if shard_output_dir is not None:
            total_pairs += int(res)
        elif res.num_rows:
            parts.append(res)

    pending: list = []
    for ta, tb, i, j in submissions():
        out_path = (
            None
            if shard_output_dir is None
            else f"{shard_output_dir.rstrip('/')}/pairs_{i:05d}_{j:05d}.parquet"
        )
        pending.append(
            task.remote(threshold, id_col, vec_col, ta, tb, out_path))
        if len(pending) >= window:
            done, pending = ray.wait(pending, num_returns=1)
            collect(done[0])
    while pending:
        done, pending = ray.wait(pending, num_returns=1)
        collect(done[0])

    if shard_output_dir is not None:
        return None
    if not parts:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64())})
    return pa.concat_tables(parts)


def embedding_neardup_pairs_ivf(
    ds,
    threshold: float = 0.98,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """IVF-bucketed near-dup pairs — the 100-TB-scale path.

    Every vector is assigned to its `n_probe` nearest coarse centroids
    (deterministic sample, ops/ann.ivf_build_centroids), the exchange
    co-locates buckets, and pair GEMMs run bucket-locally; a final
    group-by dedups pairs found in several buckets. APPROXIMATE for
    loosely-similar pairs (a qualifying pair in disjoint probe sets is
    missed); EXACT for identical/near-identical vectors, which share
    probe sets by construction — the regime this path is for.
    """
    from .ann import (
        _batch_matrix,
        _normalize,
        drop_invalid_vectors,
        ivf_build_centroids,
    )
    from ..shuffle import hash_exchange

    cents = ivf_build_centroids(ds, n_centroids, vec_col)
    holder = {"c": cents}

    def assign(batch: pa.Table) -> pa.Table:
        batch = drop_invalid_vectors(batch, vec_col)
        c = holder["c"]
        if batch.num_rows == 0:
            return batch.select([id_col, vec_col]).append_column(
                "_bucket", pa.array([], pa.int64()))
        mat = _normalize(_batch_matrix(batch, vec_col))
        probes = np.argsort(-(mat @ c.T), kind="stable", axis=1)[:, :n_probe]
        n = batch.num_rows
        rep = batch.select([id_col, vec_col]).take(
            pa.array(np.repeat(np.arange(n, dtype=np.int64), n_probe))
        )
        return rep.append_column(
            "_bucket", pa.array(probes.reshape(-1).astype(np.int64))
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    def shard_pairs(t: pa.Table) -> pa.Table:
        t = t.sort_by([("_bucket", "ascending")])
        b = np.asarray(t["_bucket"].combine_chunks())
        starts = np.r_[0, np.nonzero(np.diff(b))[0] + 1, len(b)]
        parts = []
        for s, e in zip(starts[:-1], starts[1:]):
            if e - s < 2:
                continue
            parts.append(
                _block_pairs_task(threshold, id_col, vec_col, t.slice(s, e - s))
            )
        if not parts:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        merged = pa.concat_tables(parts)
        return merged.group_by(["id_a", "id_b"]).aggregate([])  # shard dedup

    out = hash_exchange(assigned.to_arrow_refs(), ["_bucket"], shard_pairs)
    if out is None:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64())})
    # cross-shard dedup (a pair can surface in buckets on two shards);
    # the pair list is tiny relative to the corpus
    return out.group_by(["id_a", "id_b"]).aggregate([])


def verify_pairs_jaccard(
    ds_pairs, docs_by_id: dict, threshold: float = 0.8, n: int = 3,
    id_col: str = "doc_id",
):
    """Verify LSH candidate pairs with exact n-gram Jaccard.

    docs_by_id is a broadcast dict (ray.put at the driver) — candidate pairs
    after LSH are tiny relative to the corpus, and verification happens
    within map_batches against the broadcast store.
    """
    import ray

    def verify(batch: pa.Table) -> pa.Table:
        docs = ray.get(docs_by_id) if isinstance(docs_by_id, ray.ObjectRef) else docs_by_id
        keep_a, keep_b, score = [], [], []
        for ia, ib in zip(batch[id_col].to_pylist(), batch["rep_id"].to_pylist()):
            if ia == ib:
                continue
            j = ngram_jaccard(docs.get(ia, ""), docs.get(ib, ""), n)
            if j >= threshold:
                keep_a.append(ia)
                keep_b.append(ib)
                score.append(round(j, 6))
        return pa.table(
            {
                id_col: pa.array(keep_a, pa.int64()),
                "dup_of": pa.array(keep_b, pa.int64()),
                "jaccard": pa.array(score, pa.float64()),
            }
        )

    return ds_pairs.map_batches(verify, batch_format="pyarrow")


# ------------------------------------------------------------- line dedup

def _explode_lines(b: pa.Table, text_col: str, id_col: str, min_len: int,
                   extra: Optional[str] = None) -> pa.Table:
    """Shared doc->line explode for the line-level cleaners: one row per
    line with (doc id, line index, line, 64-bit line hash, keep_always
    for sub-min_len lines), plus an optional carried column (`extra`,
    e.g. the boilerplate grouping key). Vectorized: Arrow split + numpy
    repeat, no per-doc Python."""
    text = b[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lines = pc.split_pattern(pc.fill_null(text, ""), "\n")
    flat = pc.list_flatten(lines)
    lens = np.asarray(pc.list_value_length(lines)).astype(np.int64)
    ids = np.asarray(b[id_col]).astype(np.int64)
    doc = np.repeat(ids, lens)
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    idx = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, lens)
    keep = pc.less(pc.utf8_length(flat), min_len)
    cols = {
        id_col: pa.array(doc),
        "idx": pa.array(idx),
        "line": flat,
        "line_hash": pa.array(_hash_string_array(flat).astype(np.int64)),
        "keep_always": keep,
    }
    if extra is not None:
        rep = np.repeat(np.arange(b.num_rows, dtype=np.int64), lens)
        col = b[extra]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        cols[extra] = col.take(pa.array(rep))
    return pa.table(cols)


def _rebuild_docs(t: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """Shared line->doc reassembly: original line order within each doc,
    newline-joined. Docs with zero surviving lines never reach here (no
    empty husks by construction)."""
    df = t.to_pandas().sort_values([id_col, "idx"])
    g = (
        df.groupby(id_col, sort=False)["line"]
        .agg("\n".join)
        .reset_index()
        .rename(columns={"line": text_col})
    )
    return pa.Table.from_pandas(g, preserve_index=False)


def line_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 10,
):
    """C4-style exact LINE dedup: keep only the globally FIRST occurrence
    (min (doc_id, line_idx)) of every line of `min_len`+ characters, then
    reassemble documents in original line order. Lines shorter than
    `min_len` (blank separators, stubs) are always kept. Documents whose
    every line was removed disappear from the output (no empty husks).

    Scale shape: explode is a vectorized map (Arrow split + numpy repeat),
    then TWO chained hash exchanges — first on the 64-bit line hash
    (first-occurrence election, collision-exact: the group key is the
    actual line), then on doc id (order-preserving reassembly) — moving
    each surviving line exactly twice through the object store.
    """
    from ..shuffle import hash_exchange

    def explode(b: pa.Table) -> pa.Table:
        return _explode_lines(b, text_col, id_col, min_len)

    def elect(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        short = df[df["keep_always"]]
        long = df[~df["keep_always"]]
        if len(long):
            key = long[id_col] * 1_000_000_000 + long["idx"]
            long = long.loc[key.groupby(long["line"]).idxmin()]
        import pandas as pd

        out = pd.concat([short, long], ignore_index=True)
        return pa.Table.from_pandas(
            out[[id_col, "idx", "line"]], preserve_index=False
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow", batch_size=None)
    kept_refs = hash_exchange(
        exploded.to_arrow_refs(), ["line_hash"], elect, return_refs=True
    )
    kept_refs = [r for r in kept_refs if r is not None]
    out = hash_exchange(
        kept_refs, [id_col], lambda t: _rebuild_docs(t, text_col, id_col))
    if out is None:
        return pa.table({id_col: pa.array([], pa.int64()),
                         text_col: pa.array([], pa.string())})
    return out.select([id_col, text_col])


def boilerplate_lines(
    ds,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 10,
    min_docs: int = 3,
):
    """Per-group boilerplate removal (the C4/RefinedWeb cleaning step
    line_dedup doesn't cover): a line of `min_len`+ characters appearing
    in >= `min_docs` DISTINCT documents of the same group (site/source)
    is template chrome — nav bars, cookie banners, footers — and EVERY
    occurrence in that group is removed (line_dedup keeps the first;
    boilerplate keeps none). Short lines always survive; docs whose
    every line was removed disappear (no empty husks).

    Scale shape mirrors line_dedup: vectorized explode, ONE exchange on
    the 64-bit line hash (frequency election is collision-exact — the
    group key is (group, line) itself), one exchange on doc id for the
    order-preserving reassembly. The distinct-doc count per (group,
    line) never leaves its shard.
    """
    from ..shuffle import hash_exchange

    def elect(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        short = df[df["keep_always"]]
        long = df[~df["keep_always"]]
        if len(long):
            nd = long.groupby([group_col, "line"], sort=False,
                              dropna=False)[id_col].transform("nunique")
            long = long[nd.to_numpy() < min_docs]
        out = pd.concat([short, long], ignore_index=True)
        return pa.Table.from_pandas(
            out[[id_col, "idx", "line"]], preserve_index=False
        )

    exploded = ds.map_batches(
        lambda b: _explode_lines(b, text_col, id_col, min_len,
                                 extra=group_col),
        batch_format="pyarrow", batch_size=None)
    kept_refs = hash_exchange(
        exploded.to_arrow_refs(), ["line_hash"], elect, return_refs=True
    )
    kept_refs = [r for r in kept_refs if r is not None]
    out = hash_exchange(
        kept_refs, [id_col], lambda t: _rebuild_docs(t, text_col, id_col))
    if out is None:
        return pa.table({id_col: pa.array([], pa.int64()),
                         text_col: pa.array([], pa.string())})
    return out.select([id_col, text_col])


# --------------------------------------------------------------- dup spans

def _span_tokens(batch: pa.Table, text_col: str):
    """Whitespace tokens per doc: (flat token array, per-doc counts).

    Contract: len(flat) == counts.sum() — every window/offset computation
    downstream (_shingle_hashes, _span_window_rows) cumsum's counts to
    index flat. Arrow's split of an empty/whitespace-only doc yields one
    '' element; zeroing that doc's count WITHOUT dropping the element
    (the pre-fix behavior) shifted every later doc's offsets by one,
    silently corrupting dup_spans/decontaminate on corpora containing
    empty documents."""
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    trimmed = pc.utf8_trim_whitespace(pc.fill_null(text, ""))
    lists = pc.utf8_split_whitespace(trimmed)
    raw = np.asarray(pc.list_value_length(lists)).astype(np.int64)
    empty = np.asarray(pc.equal(trimmed, ""))
    counts = np.where(empty, 0, raw)
    flat = pc.list_flatten(lists)
    if empty.any():
        flat = flat.filter(pa.array(np.repeat(~empty, raw)))
    return flat, counts


def _tokens_table(batch: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """(id, toks list<string>) block — the materialized single-tokenize
    form of the span front end: downstream window passes read these
    blocks zero-copy instead of re-reading and re-splitting the text."""
    flat, counts = _span_tokens(batch, text_col)
    offs = np.concatenate(([0], np.cumsum(counts)))
    toks = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), flat)
    return pa.table({id_col: pc.cast(batch[id_col], pa.int64()),
                     "toks": toks})


def _span_tokens_from_table(t: pa.Table, id_col: str):
    """(flat tokens, per-doc counts, ids) off a _tokens_table block."""
    if t.num_rows == 0 or "toks" not in t.column_names:
        # Ray passes EMPTY blocks through map_batches without running
        # the fn, so an empty block still has the pre-tokenize schema
        return (pa.array([], pa.string()), np.empty(0, np.int64),
                np.empty(0, np.int64))
    tc = t.combine_chunks()
    ids = np.asarray(tc[id_col]).astype(np.int64)
    la = (tc.column("toks").chunk(0) if tc.num_rows
          else pa.array([], pa.list_(pa.string())))
    offs = np.asarray(la.offsets, dtype=np.int64)
    flat = la.values
    counts = offs[1:] - offs[:-1]
    if len(offs) and (offs[0] != 0 or offs[-1] != len(flat)):
        # sliced list array: .values spans the whole buffer — compact
        gather = np.repeat(offs[:-1] - np.concatenate(
            ([0], np.cumsum(counts[:-1]))), counts) + np.arange(
            int(counts.sum()), dtype=np.int64)
        flat = flat.take(pa.array(gather, pa.int64()))
    return flat, counts, ids


def _span_window_rows(batch: pa.Table, text_col: str, id_col: str, k: int):
    """(hash, doc id, flat start position, flat tokens) for every full
    k-token window — the shared front end of dup_spans / decontaminate.
    Docs shorter than k tokens contribute no windows."""
    flat, counts = _span_tokens(batch, text_col)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    return _window_rows(flat, counts, ids, k)


def _window_rows(flat, counts: np.ndarray, ids: np.ndarray, k: int):
    """Core of _span_window_rows over already-tokenized arrays."""
    fh = _hash_string_array(flat)
    sh, sh_counts = _shingle_hashes(fh, counts, k)
    if len(sh) == 0:  # no windows at all (empty or all-empty-doc block)
        z = np.empty(0, np.int64)
        return z, z, z, flat
    # drop the short-doc single pseudo-shingle (< k tokens)
    keep = np.repeat(counts >= k, sh_counts)
    sh_off = np.concatenate(([0], np.cumsum(sh_counts)[:-1]))
    within = (
        np.arange(len(sh), dtype=np.int64) - np.repeat(sh_off, sh_counts)
    )
    tok_off = np.concatenate(([0], np.cumsum(counts)[:-1]))
    fstart = np.repeat(tok_off, sh_counts) + within
    doc = np.repeat(ids, sh_counts)
    return sh[keep].astype(np.int64), doc[keep], fstart[keep], flat


def _gather_window_strings(
    flat: pa.Array, fstart: np.ndarray, k: int
) -> pa.Array:
    """Window strings at the given flat start positions: one vectorized
    gather of k tokens per window + binary_join (space-separated)."""
    gather = (fstart[:, None] + np.arange(k, dtype=np.int64)).ravel()
    toks = flat.take(pa.array(gather, pa.int64()))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lists = pa.ListArray.from_arrays(
        pa.array(np.arange(0, len(gather) + 1, k, dtype=np.int32), pa.int32()),
        toks,
    )
    return pc.binary_join(lists, " ")


def dup_spans(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_k: int = 16,
    shard_output_dir: Optional[str] = None,
):
    """Duplicated-span detection (the ExactSubstr-style training-data
    filter, Lee et al. 2022, re-expressed over hash exchanges): for every
    document, count the k-token windows whose EXACT token sequence occurs
    at least twice anywhere in the corpus. Returns (doc_id, dup_windows)
    for documents with at least one duplicated window; docs shorter than
    span_k contribute no windows.

    Exact without shipping window text for the whole corpus. The text is
    read and tokenized ONCE (materialized (id, toks) blocks; both window
    passes read them zero-copy from the object store) — then two passes:
      A. rolling 64-bit window hashes (the minhash shingle kernel) flow
         through one hash exchange that keeps only hashes seen >= 2 times;
         the surviving CANDIDATE hash set (tiny: only near-dup material)
         is broadcast with ray.put;
      B. a second pass over the SAME token blocks re-derives hashes,
         reconstructs the window STRINGS only at candidate positions,
         and a second exchange groups candidates by the actual string
         (collision-exact), emitting per-doc partial counts merged by
         hash_reduce.

    The per-doc result is corpus-sized at scale: pass `shard_output_dir`
    and each reduce shard writes its own parquet file (returns None)
    instead of materializing on the driver.
    """
    import ray

    from ..shuffle import hash_exchange, hash_reduce

    tok_refs = ds.select_columns([id_col, text_col]).map_batches(
        lambda b: _tokens_table(b, text_col, id_col),
        batch_format="pyarrow", batch_size=None).to_arrow_refs()

    def pass_a(t: pa.Table) -> pa.Table:
        flat, counts, ids = _span_tokens_from_table(t, id_col)
        h, doc, _, _ = _window_rows(flat, counts, ids, span_k)
        return pa.table({"h": pa.array(h), id_col: pa.array(doc)})

    def dup_hashes(t: pa.Table) -> Optional[pa.Table]:
        g = t.group_by(["h"]).aggregate([("h", "count")])
        g = g.filter(pc.greater_equal(g["h_count"], 2))
        return g.select(["h"]) if g.num_rows else None

    a_task = ray.remote(pass_a)
    cand = hash_exchange([a_task.remote(r) for r in tok_refs],
                         ["h"], dup_hashes)
    if cand is None:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "dup_windows": pa.array([], pa.int64())})
    cand_sorted = np.sort(cand["h"].to_numpy(zero_copy_only=False))
    cand_ref = ray.put(cand_sorted)

    def pass_b(t: pa.Table) -> pa.Table:
        cands = ray.get(cand_ref)
        tflat, counts, ids = _span_tokens_from_table(t, id_col)
        h, doc, fstart, flat = _window_rows(tflat, counts, ids, span_k)
        pos = np.searchsorted(cands, h)
        pos[pos >= len(cands)] = 0
        idx = np.flatnonzero(cands[pos] == h)
        if len(idx) == 0:
            return pa.table(
                {
                    "h": pa.array([], pa.int64()),
                    "w": pa.array([], pa.string()),
                    id_col: pa.array([], pa.int64()),
                }
            )
        # reconstruct window strings ONLY at candidate positions
        ws = _gather_window_strings(flat, fstart[idx], span_k)
        return pa.table(
            {"h": pa.array(h[idx]), "w": ws, id_col: pa.array(doc[idx])}
        )

    def exact_dup_counts(t: pa.Table) -> Optional[pa.Table]:
        df = t.to_pandas()
        sizes = df.groupby("w")["w"].transform("size")
        df = df[sizes >= 2]
        if not len(df):
            return None
        out = df.groupby(id_col, as_index=False).size()
        out = out.rename(columns={"size": "dup_windows"})
        return pa.Table.from_pandas(out, preserve_index=False)

    b_task = ray.remote(pass_b)
    part_refs = hash_exchange([b_task.remote(r) for r in tok_refs],
                              ["h"], exact_dup_counts, return_refs=True)
    part_refs = [r for r in part_refs if r is not None]
    out = hash_reduce(part_refs, [id_col], ["dup_windows"],
                      shard_output_dir=shard_output_dir)
    if shard_output_dir is not None:
        return None
    if out is None:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "dup_windows": pa.array([], pa.int64())})
    return out


# ----------------------------------------------------------- decontaminate

_BLOOM_K = 4  # double-hashing probes per element


def _bloom_positions(h: np.ndarray, bloom_bits: int) -> np.ndarray:
    """k probe positions per hash via double hashing: pos_i = h1 + i*h2
    (mod 2^bloom_bits). Returns [len(h), k] uint64."""
    mask = np.uint64((1 << bloom_bits) - 1)
    hu = h.astype(np.uint64)
    h1 = hu & mask
    h2 = (hu >> np.uint64(32)) | np.uint64(1)  # odd -> full-cycle stride
    i = np.arange(_BLOOM_K, dtype=np.uint64)[None, :]
    return (h1[:, None] + i * h2[:, None]) & mask


def _bloom_set(bits: np.ndarray, h: np.ndarray, bloom_bits: int) -> None:
    pos = _bloom_positions(h, bloom_bits).ravel()
    np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                     (1 << (pos & np.uint64(7))).astype(np.uint8))


def _bloom_test(bits: np.ndarray, h: np.ndarray, bloom_bits: int) -> np.ndarray:
    pos = _bloom_positions(h, bloom_bits)
    byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
    hit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1
    return hit.all(axis=1)


def decontaminate(
    train_ds,
    bench_ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_k: int = 8,
    shard_output_dir: Optional[str] = None,
    bloom_bits: Optional[int] = None,
):
    """Benchmark decontamination (the GPT-3-appendix-style n-gram overlap
    filter, public method): for every TRAIN document, count the k-token
    windows whose EXACT token sequence occurs anywhere in the benchmark
    corpus. Returns (doc_id, contaminated_windows) for train docs with at
    least one overlapping window — drop or flag them downstream.

    Exact, sized for a huge train side and a small bench side (benchmark
    suites are MBs against a 100 TB corpus):
      1. bench pass: rolling window hashes -> per-shard unique -> broadcast
         sorted hash array (8 bytes per distinct bench window);
      2. train pass: windows gated by the broadcast set (searchsorted);
         candidate window strings reconstructed vectorized at the few
         surviving positions;
      3. bench rows (h, window string) and train candidate rows
         (h, window string, doc id) meet in one hash exchange keyed on h,
         where the join is by the actual string (collision-exact);
         per-doc partial counts merge through hash_reduce.

    Pass `shard_output_dir` at corpus scale: reduce shards stream their
    parquet files instead of materializing the result on the driver.

    `bloom_bits`: the bench gate's scale dial. The default (None) gate is
    the exact sorted hash array (8 bytes per DISTINCT bench window) — the
    right call for MB-scale benchmark suites. For a LARGE "bench" side
    (cross-corpus overlap, an earlier snapshot), pass bloom_bits=B to gate
    with a fixed 2^B-bit Bloom bitset instead: per-block bitsets OR-merge
    up a fan-in tree, the broadcast is 2^B/8 bytes REGARDLESS of bench
    size, and Bloom false positives only cost exchange traffic — the
    string-exact join downstream removes them, so the RESULT is identical
    to the exact gate (same driver oracle covers both paths).
    """
    import ray

    from ..shuffle import hash_exchange, hash_reduce

    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "contaminated_windows": pa.array([], pa.int64())})

    if bloom_bits is None:
        def bench_hashes(batch: pa.Table) -> pa.Table:
            h, _, _, _ = _span_window_rows(batch, text_col, id_col, span_k)
            return pa.table({"h": pa.array(np.unique(h))})

        a = bench_ds.map_batches(
            bench_hashes, batch_format="pyarrow", batch_size=None
        )
        refs = a.to_arrow_refs()
        from ..shuffle import refs_total_bytes

        # the exact gate ends up sorted on the DRIVER either way (ray.put
        # below), so the cross-block dedup exchange only pays off when the
        # per-block unique arrays are collectively big; for the MB-scale
        # benchmark suites this path is designed for, skipping that task
        # wave and unique-ing on the driver is strictly faster. 64 MiB of
        # 8-byte hashes ≈ 8M distinct windows — past that, keep the
        # exchange (or use bloom_bits, the real large-side dial).
        total = refs_total_bytes(refs)
        if total is not None and total <= (64 << 20):
            parts = [t["h"].to_numpy(zero_copy_only=False)
                     for t in ray.get(refs)
                     if t is not None and t.num_rows]
            if not parts:
                return empty
            gate = np.unique(np.concatenate(parts))  # unique output sorted
        else:
            uniq = hash_exchange(
                refs, ["h"],
                lambda t: pa.table({"h": pc.unique(t["h"])}),
            )
            if uniq is None:
                return empty
            gate = np.sort(uniq["h"].to_numpy(zero_copy_only=False))
        gate_ref = ray.put(gate)

        def _gate(bs, h: np.ndarray) -> np.ndarray:
            pos = np.searchsorted(bs, h)
            pos[pos >= len(bs)] = 0
            return np.flatnonzero(bs[pos] == h)
    else:
        nbytes = 1 << (bloom_bits - 3)

        def bench_bits(batch: pa.Table) -> pa.Table:
            h, _, _, _ = _span_window_rows(batch, text_col, id_col, span_k)
            bits = np.zeros(nbytes, dtype=np.uint8)
            _bloom_set(bits, h, bloom_bits)
            return pa.table({"bits": pa.array([bits.tobytes()], pa.large_binary())})

        @ray.remote
        def or_group(*tables):
            acc = np.zeros(nbytes, dtype=np.uint8)
            for t in tables:
                # empty input blocks pass through map_batches with their
                # ORIGINAL schema (Ray skips the fn) — no bits to OR
                if t is None or "bits" not in t.column_names:
                    continue
                for buf in t["bits"].to_pylist():
                    acc |= np.frombuffer(buf, dtype=np.uint8)
            return pa.table({"bits": pa.array([acc.tobytes()], pa.large_binary())})

        refs = bench_ds.map_batches(
            bench_bits, batch_format="pyarrow", batch_size=None
        ).to_arrow_refs()
        fanin = 32
        while len(refs) > 1:
            refs = [or_group.remote(*refs[i : i + fanin])
                    for i in range(0, len(refs), fanin)]
        if not refs:
            return empty
        final_bits = np.frombuffer(
            ray.get(refs[0])["bits"].to_pylist()[0], dtype=np.uint8
        )
        if not final_bits.any():
            return empty
        gate_ref = ray.put(final_bits)

        def _gate(bs, h: np.ndarray) -> np.ndarray:
            return np.flatnonzero(_bloom_test(bs, h, bloom_bits))

    def _emit(batch: pa.Table, side: int) -> pa.Table:
        h, doc, fstart, flat = _span_window_rows(batch, text_col, id_col, span_k)
        if side == 0:  # train: gate by the broadcast bench structure
            idx = _gate(ray.get(gate_ref), h)
        else:  # bench: every window is relevant by construction
            idx = np.arange(len(h), dtype=np.int64)
        if len(idx) == 0:
            return pa.table(
                {
                    "h": pa.array([], pa.int64()),
                    "w": pa.array([], pa.string()),
                    id_col: pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                }
            )
        ws = _gather_window_strings(flat, fstart[idx], span_k)
        return pa.table(
            {
                "h": pa.array(h[idx]),
                "w": ws,
                id_col: pa.array(doc[idx]),
                "side": pa.array(
                    np.full(len(idx), side, dtype=np.int8), pa.int8()
                ),
            }
        )

    train = train_ds.map_batches(
        lambda b: _emit(b, 0), batch_format="pyarrow", batch_size=None
    )
    bench = bench_ds.map_batches(
        lambda b: _emit(b, 1), batch_format="pyarrow", batch_size=None
    )

    def mark(t: pa.Table) -> Optional[pa.Table]:
        is_bench = pc.equal(t["side"], pa.scalar(1, pa.int8()))
        bw = t.filter(is_bench)
        tr = t.filter(pc.invert(is_bench))
        if tr.num_rows == 0 or bw.num_rows == 0:
            return None
        hit = pc.is_in(tr["w"], value_set=pc.unique(bw["w"]))
        tr = tr.filter(hit)
        if not tr.num_rows:
            return None
        g = tr.group_by([id_col]).aggregate([(id_col, "count")])
        return g.rename_columns([id_col, "contaminated_windows"])

    refs = list(train.to_arrow_refs()) + list(bench.to_arrow_refs())
    part_refs = hash_exchange(refs, ["h"], mark, return_refs=True)
    out = hash_reduce(part_refs, [id_col], ["contaminated_windows"],
                      shard_output_dir=shard_output_dir)
    if shard_output_dir is not None:
        return None
    return empty if out is None else out


def corpus_diff(
    old_ds,
    new_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_output_dir: Optional[str] = None,
) -> Optional[pa.Table]:
    """Snapshot diff between two corpus versions — the incremental-
    ingestion primitive: per doc id, `added` (new only), `removed` (old
    only), `changed` (both, content differs), `unchanged`. Exact by
    CONTENT STRING comparison (not hash), so the result is
    collision-proof; each side's (id, text) moves through the id-keyed
    exchange exactly once, and the shard body is a vectorized two-side
    pivot (no per-doc Python). `shard_output_dir` streams the (corpus-
    sized) result to sharded parquet at scale.

    Contract: ids are unique WITHIN each side (the snapshot invariant —
    run exact_dedup/keep_best first if not).
    """
    from ..shuffle import hash_exchange

    def prep(side: int):
        def f(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    id_col: b[id_col],
                    "_text": pc.fill_null(pc.cast(b[text_col], pa.large_string()), ""),
                    "_side": pa.array(
                        np.full(b.num_rows, side, dtype=np.int8)
                    ),
                }
            )

        return f

    def finish(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        side = t["_side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, ids))
        ids_s = ids[order]
        side_s = side[order]
        txt = t["_text"].take(pa.array(order, pa.int64()))
        n = len(ids_s)
        first = np.ones(n, dtype=bool)
        first[1:] = ids_s[1:] != ids_s[:-1]
        starts = np.flatnonzero(first)
        counts = np.diff(np.concatenate((starts, [n])))
        out_ids = ids_s[starts]
        status = np.empty(len(starts), dtype=object)
        single = counts == 1
        # singletons: side 0 -> removed, side 1 -> added
        status[single & (side_s[starts] == 0)] = "removed"
        status[single & (side_s[starts] == 1)] = "added"
        both = ~single  # exactly two rows (old, new) after the sort
        if both.any():
            same = np.asarray(
                pc.equal(
                    txt.take(pa.array(starts[both], pa.int64())),
                    txt.take(pa.array(starts[both] + 1, pa.int64())),
                )
            )
            status[both] = np.where(same, "unchanged", "changed")
        return pa.table(
            {
                id_col: pa.array(out_ids),
                "status": pa.array(status.tolist(), pa.string()),
            }
        )

    refs = (
        old_ds.map_batches(prep(0), batch_format="pyarrow").to_arrow_refs()
        + new_ds.map_batches(prep(1), batch_format="pyarrow").to_arrow_refs()
    )
    return hash_exchange(refs, [id_col], finish,
                         shard_output_dir=shard_output_dir)


def split_leakage(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    splits: Optional[dict] = None,
) -> pa.Table:
    """Cross-split contamination audit — the train/val/test leakage check
    of a corpus build: exact-duplicate text groups whose members land in
    MORE THAN ONE deterministic hash split (such duplicates leak eval
    data into training). Composes the exact-dedup exchange with
    hash_split: per-block partials pre-combine to one (text, min id,
    total, per-split counts) row per distinct text per block, the 8-byte
    content-hash exchange co-locates candidates, and the shard regroups
    by the ACTUAL text (collision-exact) keeping groups spanning >1
    split. Returns (group_id = min doc_id, n_docs, n_splits)."""
    from ..shuffle import hash_exchange
    from .sample import hash_split_batch

    labels = list(splits or {"train": 0.98, "val": 0.01, "test": 0.01})
    ncols = [f"n_{i}" for i in range(len(labels))]

    def _regroup(t: pa.Table) -> pa.Table:
        g = t.group_by(["text_hash", text_col]).aggregate(
            [("gid", "min"), ("n", "sum")] + [(c, "sum") for c in ncols]
        )
        ren = {"gid_min": "gid", "n_sum": "n"}
        ren.update({f"{c}_sum": c for c in ncols})
        return g.rename_columns([ren.get(c, c) for c in g.column_names])

    def partial(b: pa.Table) -> pa.Table:
        b = add_text_hash(b, text_col)
        sp = hash_split_batch(b, id_col, splits)["split"]
        if isinstance(sp, pa.ChunkedArray):
            sp = sp.combine_chunks()
        cols = {
            "text_hash": b["text_hash"],
            text_col: b[text_col],
            "gid": b[id_col],
            "n": pa.array(np.ones(len(b), np.int64)),
        }
        for i, lab in enumerate(labels):
            cols[ncols[i]] = pc.cast(pc.equal(sp, lab), pa.int64())
        return _regroup(pa.table(cols))

    def finish(t: pa.Table) -> pa.Table:
        g = _regroup(t)
        nsplits = np.zeros(g.num_rows, dtype=np.int64)
        for c in ncols:
            nsplits += (g[c].to_numpy(zero_copy_only=False) > 0)
        mask = pa.array(nsplits > 1)
        return pa.table({
            "group_id": g["gid"].filter(mask),
            "n_docs": g["n"].filter(mask),
            "n_splits": pa.array(nsplits[nsplits > 1], pa.int64()),
        })

    out = hash_exchange(
        ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs(),
        ["text_hash"], finish, combine_fn=_regroup,
    )
    if out is None:
        return pa.table({"group_id": pa.array([], pa.int64()),
                         "n_docs": pa.array([], pa.int64()),
                         "n_splits": pa.array([], pa.int64())})
    return out


def dup_group_histogram(ds, text_col: str = "text") -> pa.Table:
    """Duplicate-group SIZE histogram — the dedup health report
    ("how much of the corpus is 2x/10x/1000x replicated?") run before
    committing to a dedup pass. Output: one row per observed group size
    with the number of exact-content groups of that size.

    Engine shape: per-block exact (text, n) partial counts, ONE
    text-keyed hash exchange (the combiner re-sums, so only distinct
    strings per block cross the wire), shard-local exact group sizes
    (strings co-locate with their group — collision-free by
    construction), then each shard emits its own (size, n_groups)
    histogram partial: the driver-side fan-in holds at most
    #shards x #distinct-sizes tiny rows, never one row per group."""
    from ..shuffle import hash_exchange

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by([text_col]).aggregate([([], "count_all")])
        return g.rename_columns([text_col, "n"])

    def regroup(t: pa.Table) -> pa.Table:
        g = t.group_by([text_col]).aggregate([("n", "sum")])
        return g.rename_columns([text_col, "n"])

    def finish(t: pa.Table) -> pa.Table:
        sizes = regroup(t)["n"]
        h = pa.table({"sz": sizes}).group_by(["sz"]).aggregate(
            [([], "count_all")])
        return h.rename_columns(["sz", "n_groups"])

    out = hash_exchange(
        ds.select_columns([text_col]).map_batches(
            partial, batch_format="pyarrow").to_arrow_refs(),
        [text_col], finish, combine_fn=regroup,
    )
    if out is None:
        return pa.table({"sz": pa.array([], pa.int64()),
                         "n_groups": pa.array([], pa.int64())})
    merged = out.group_by(["sz"]).aggregate([("n_groups", "sum")])
    return merged.rename_columns(["sz", "n_groups"])
