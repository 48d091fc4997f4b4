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

import hashlib
import struct
from typing import Iterable, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE = (1 << 61) - 1


def _hash64(s: str, seed: int = 0) -> int:
    h = hashlib.blake2b(s.encode(), digest_size=8, salt=seed.to_bytes(8, "little"))
    return struct.unpack("<Q", h.digest())[0]


def _hash_column(texts: Iterable[Optional[str]], seed: int = 0) -> list[Optional[int]]:
    return [None if t is None else _hash64(t, seed) & 0x7FFFFFFFFFFFFFFF for t in texts]


def add_text_hash(batch: pa.Table, text_col: str = "text", out: str = "text_hash") -> pa.Table:
    return batch.append_column(
        out, pa.array(_hash_column(batch[text_col].to_pylist()), pa.int64())
    )


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


# ------------------------------------------------------------------ minhash

def _shingles(tokens: list[str], k: int) -> set:
    if len(tokens) < k:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)}


class MinHasher:
    """Vectorized minhash with multiply-shift permutations.

    signature[i] = min over shingles of ((a_i * h + b_i) mod 2^64) — the
    multiply-add family over the full 64-bit ring (numpy wraparound IS the
    modulus), avoiding object-dtype bignum math. a_i odd for invertibility.
    """

    def __init__(self, num_perm: int = 64, shingle_k: int = 5, seed: int = 42):
        rng = np.random.RandomState(seed)
        a = rng.randint(1, 2**62, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.a = (a * np.uint64(2) + np.uint64(1))  # odd multipliers
        self.b = rng.randint(0, 2**62, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text.split(), self.k)
        if not sh:
            return np.zeros(self.num_perm, dtype=np.uint64)
        hv = np.array([_hash64(s) for s in sh], dtype=np.uint64)
        with np.errstate(over="ignore"):
            m = np.outer(self.a, hv) + self.b[:, None]
        return m.min(axis=1)


def minhash_lsh_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
):
    """LSH near-dup clustering: returns (doc_id, rep_id) — rep_id is the
    elected representative (min doc id over all shared buckets, one
    propagation round). rep_id == doc_id means "keep".

    Pipeline: map_batches(signatures) -> flat rows (band, bucket_hash, id)
    -> groupby bucket -> (id, min id in bucket) -> groupby id -> min rep.
    Both shuffles move fixed-width rows only.
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
        ids, bandl, buckl = [], [], []
        for did, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            sig = h.signature(text or "")
            for b in range(bands):
                seg = sig[b * rows_per_band : (b + 1) * rows_per_band]
                bh = _hash64(",".join(map(str, seg)), seed=b) & 0x7FFFFFFFFFFFFFFF
                ids.append(did)
                bandl.append(b)
                buckl.append(bh)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "band": pa.array(bandl, pa.int32()),
                "bucket": pa.array(buckl, pa.int64()),
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

    cand = hash_exchange(buckets.to_arrow_refs(), ["band", "bucket"], bucket_reps)
    if cand is None:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "rep_id": pa.array([], pa.int64())})

    # final per-doc min over shard partials: cand holds at most
    # (num_shards × docs) pre-combined rows — one driver-side group_by
    # (name-based rename: pyarrow's aggregate column ORDER is not stable
    # across versions, only the `<col>_min` naming is)
    g = cand.group_by([id_col]).aggregate([("rep_id", "min")])
    g = g.rename_columns(
        ["rep_id" if c == "rep_id_min" else c for c in g.column_names]
    )
    return g.select([id_col, "rep_id"])


# ------------------------------------------------------------------ simhash

def simhash64(text: str) -> int:
    tokens = text.split()
    if not tokens:
        return 0
    v = np.zeros(64, dtype=np.int64)
    for tok in tokens:
        h = _hash64(tok)
        bits = np.unpackbits(np.frombuffer(struct.pack(">Q", h), dtype=np.uint8))
        v += np.where(bits == 1, 1, -1)
    out = 0
    for i, x in enumerate(v):
        if x > 0:
            out |= 1 << (63 - i)
    return out


def simhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact-simhash dedup: (doc_id, simhash, rep_id=min id per simhash)."""

    def add_sim(batch: pa.Table) -> pa.Table:
        sims = [
            simhash64(t or "") & 0x7FFFFFFFFFFFFFFF
            for t in batch[text_col].to_pylist()
        ]
        return pa.table(
            {
                id_col: batch[id_col],
                "simhash": pa.array(sims, pa.int64()),
            }
        )

    from ..shuffle import hash_exchange

    simmed = ds.map_batches(add_sim, batch_format="pyarrow", batch_size=None)

    def reps(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["rep_id"] = df.groupby("simhash")[id_col].transform("min")
        return pa.Table.from_pandas(df, preserve_index=False)

    out = hash_exchange(simmed.to_arrow_refs(), ["simhash"], reps)
    if out is None:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "simhash": pa.array([], pa.int64()),
                         "rep_id": pa.array([], pa.int64())})
    return out


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = _shingles(a.split(), n), _shingles(b.split(), n)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter) if (sa or sb) else 0.0


def embedding_neardup_pairs(
    ds,
    queries_ref,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Embedding-cosine near-duplicate pairs: (id_a, id_b) with id_a < id_b
    and cosine >= threshold.

    The full (normalized) matrix is broadcast once; each batch does one
    GEMM against it and emits only the above-threshold pairs — at corpus
    scale, replace the broadcast side with IVF buckets (ops/ann.ivf_topk)
    so candidates are bucket-local.
    """
    import numpy as np
    import ray

    from .ann import _batch_matrix, _normalize, _maybe_get

    cache: dict = {}

    def pairs(batch: pa.Table) -> pa.Table:
        q = cache.get("q")
        if q is None:
            q = _maybe_get(queries_ref)
            q = {"ids": q["ids"], "mat": _normalize(q["mat"].astype(np.float64))}
            cache["q"] = q
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        mat = _normalize(_batch_matrix(batch, vec_col))
        sims = mat @ q["mat"].T  # [nb, nq]
        a_out, b_out = [], []
        rows, cols = np.nonzero(sims >= threshold)
        for r, c in zip(rows, cols):
            ia, ib = int(ids[r]), int(q["ids"][c])
            if ia < ib:
                a_out.append(ia)
                b_out.append(ib)
        return pa.table(
            {
                "id_a": pa.array(a_out, pa.int64()),
                "id_b": pa.array(b_out, pa.int64()),
            }
        )

    return ds.map_batches(pairs, batch_format="pyarrow", batch_size=None)


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
