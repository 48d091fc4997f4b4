"""Similarity search over an embedding column (`list<float>`).

Ray-Data-first ANN:
- brute_force_topk: the exactness baseline — the query matrix is `ray.put`
  ONCE and each map_batches task does one float64 GEMM against its batch,
  emitting per-batch top-k; a final per-query merge keeps the global top-k.
  Shuffle volume = O(num_queries × k × batches), never the vectors.
- ivf_topk: the scale path — vectors are bucketed by nearest of C coarse
  centroids (deterministic sample), queries probe only the P closest
  buckets. Same partial-topk merge, ~C/P times less compute.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import pyarrow as pa


def _maybe_get(obj: Any) -> Any:
    import ray

    if isinstance(obj, ray.ObjectRef):
        return ray.get(obj)
    return obj


def drop_invalid_vectors(batch: pa.Table, col: str) -> pa.Table:
    """Filter out rows whose embedding is NULL or empty. A row with no
    vector cannot participate in any similarity computation — the SQL
    twins agree for free (list_cosine_similarity against NULL is NULL and
    never ranks). Every vector op filters through this BEFORE extracting
    ids/matrix so row alignment is preserved."""
    import pyarrow.compute as pc

    arr = batch[col]
    lens = pc.list_value_length(arr)
    mask = pc.and_(pc.is_valid(arr),
                   pc.fill_null(pc.greater(lens, 0), False))
    if pc.all(mask).as_py():
        return batch
    return batch.filter(mask)


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        return np.empty((0, 0), dtype=np.float64)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    # guard the reshape: a NULL/empty row makes len(flat) // len(arr)
    # compute a WRONG dim and silently scramble vector->row association
    # (worse than a crash); ragged dims are a schema violation. Callers
    # drop null/empty rows via drop_invalid_vectors first.
    if len(flat) != 0 and len(flat) % len(arr) == 0:
        dim = len(flat) // len(arr)
        if bool(arr.null_count == 0):
            import pyarrow.compute as pc

            lens = pc.unique(pc.list_value_length(arr))
            if len(lens) == 1:
                return flat.reshape(len(arr), dim)
    raise ValueError(
        f"embedding column {col!r} has NULL/empty or ragged rows; filter "
        "with ops.ann.drop_invalid_vectors before vector kernels"
    )


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class _PartialTopK:
    """map_batches fn: per-batch cosine top-k against the broadcast queries."""

    def __init__(self, queries_ref: Any, k: int, id_col: str, vec_col: str,
                 exclude_ids: Optional[set] = None):
        q = _maybe_get(queries_ref)  # {"ids": np[int64], "mat": np[nq, d]}
        self.q_ids = q["ids"]
        self.q_mat = _normalize(q["mat"].astype(np.float64))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col
        self.exclude = exclude_ids or set()

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = drop_invalid_vectors(batch, self.vec_col)
        if batch.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        mat = _normalize(_batch_matrix(batch, self.vec_col))
        sims = self.q_mat @ mat.T  # [nq, nb]
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.q_ids):
            row = sims[qi]
            order = np.lexsort((ids, -row))  # score desc, id asc — deterministic
            taken = 0
            for j in order:
                vid = int(ids[j])
                if vid == int(qid) or vid in self.exclude:
                    continue
                out_q.append(int(qid))
                out_v.append(vid)
                out_s.append(float(row[j]))
                taken += 1
                if taken >= self.k:
                    break
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


_TOPK_CACHE: dict = {}


def brute_force_topk(
    ds,
    queries_ref: Any,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Exact cosine top-k. Returns (query_id, vec_id, rank) — rank 1-based,
    ordered by (score desc, vec_id asc); ints only for stable comparison.

    Task-based with a per-worker cache of the normalized query matrix (same
    broadcast pattern as enrichment — no actor pool startup on the hot path).
    The cache keys on the ObjectRef hex (globally unique); plain-dict query
    sets are rebuilt per batch — a repr-based key could collide between
    different matrices. The cache keeps only the latest few entries.
    """
    import ray

    cacheable = isinstance(queries_ref, ray.ObjectRef)
    cache_key = (
        (queries_ref.hex(), k, id_col, vec_col) if cacheable else None
    )

    def partial_fn(batch: pa.Table) -> pa.Table:
        if cache_key is None:
            return _PartialTopK(queries_ref, k, id_col, vec_col)(batch)
        fn = _TOPK_CACHE.get(cache_key)
        if fn is None:
            while len(_TOPK_CACHE) >= 4:  # bound worker memory
                _TOPK_CACHE.pop(next(iter(_TOPK_CACHE)))
            fn = _PartialTopK(queries_ref, k, id_col, vec_col)
            _TOPK_CACHE[cache_key] = fn
        return fn(batch)

    partial = ds.map_batches(partial_fn, batch_format="pyarrow", batch_size=None)

    def merge(group: pa.Table) -> pa.Table:
        idx = pa.compute.sort_indices(
            group,
            sort_keys=[("score", "descending"), ("vec_id", "ascending")],
        )
        top = group.take(idx[:k])
        return pa.table(
            {
                "query_id": top["query_id"],
                "vec_id": top["vec_id"],
                "rank": pa.array(range(1, top.num_rows + 1), pa.int64()),
            }
        )

    return partial.groupby("query_id").map_groups(merge, batch_format="pyarrow")


def make_query_ref(ids: np.ndarray, mat: np.ndarray):
    """Broadcast the query set once (driver side)."""
    import ray

    return ray.put({"ids": np.asarray(ids, dtype=np.int64), "mat": np.asarray(mat)})


# ---------------------------------------------------------------------- IVF

def ivf_build_centroids(ds, n_centroids: int, vec_col: str = "embedding",
                        sample_batches: int = 4) -> np.ndarray:
    """Deterministic coarse centroids: first N vectors (k-means would drift
    per-run; for a deterministic engine the fixed sample is the contract)."""
    it = ds.iter_batches(batch_format="pyarrow", batch_size=max(256, n_centroids))
    mats = []
    count = 0
    for b in it:
        b = drop_invalid_vectors(b, vec_col)
        if b.num_rows == 0:
            continue  # invalid-only batches don't consume the budget
        mats.append(_batch_matrix(b, vec_col))
        count += 1
        if sum(m.shape[0] for m in mats) >= n_centroids or count >= sample_batches:
            break
    if not mats:
        raise ValueError(
            "ivf_build_centroids: no valid vectors to sample (every row "
            "has a NULL/empty embedding — see ops.ann.drop_invalid_vectors)"
        )
    all_m = np.concatenate(mats, axis=0)[:n_centroids]
    return _normalize(all_m)


def ivf_topk(
    ds,
    queries_ref: Any,
    centroids: np.ndarray,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """IVF-style ANN: bucket by nearest centroid, probe the closest buckets.

    Approximate: recall < 1 when true neighbors live outside probed buckets.
    """
    cent_ref_holder = {"c": _normalize(centroids.astype(np.float64))}

    def assign(batch: pa.Table) -> pa.Table:
        batch = drop_invalid_vectors(batch, vec_col)
        if batch.num_rows == 0:
            return batch.append_column(
                "_ivf_bucket", pa.array([], pa.int64()))
        c = cent_ref_holder["c"]
        mat = _normalize(_batch_matrix(batch, vec_col))
        bucket = (mat @ c.T).argmax(axis=1).astype(np.int64)
        return batch.append_column("_ivf_bucket", pa.array(bucket))

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    q = _maybe_get(queries_ref)
    qmat = _normalize(q["mat"].astype(np.float64))
    c = cent_ref_holder["c"]
    probes = np.argsort(-(qmat @ c.T), axis=1)[:, :n_probe]  # [nq, n_probe]
    probe_sets = {int(b) for row in probes for b in row}

    import pyarrow.compute as pc

    probe_arr = pa.array(sorted(probe_sets), pa.int64())
    filtered = assigned.map_batches(
        lambda b: b.filter(pc.is_in(b["_ivf_bucket"], value_set=probe_arr)),
        batch_format="pyarrow",
    )
    return brute_force_topk(filtered, queries_ref, k, id_col, vec_col)


# ------------------------------------------------------------ quantization

def _quantize_rows(X: np.ndarray):
    """Per-vector symmetric int8 quantization: 1 byte/dim + 1 float32
    scale — 4x less object-store/storage footprint than float32, ~8x vs
    float64."""
    scale = np.abs(X).max(axis=1) / 127.0
    scale[scale == 0] = 1.0
    Q = np.clip(np.rint(X / scale[:, None]), -127, 127).astype(np.int8)
    return Q, scale.astype(np.float32)


def quantize_embeddings(ds, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Storage form for a 100 TB embedding table: (id, qvec binary of
    exactly d bytes per row, scale float32). The binary column is built
    zero-copy from the int8 buffer with an arange offsets vector (no
    per-row Python). Variable-width `binary` — not fixed_size_binary(d) —
    so an EMPTY or all-invalid block (d unknowable there) emits the SAME
    column type as every other block and the dataset schema stays
    unifiable; the uniform per-row length is a value property."""

    def qz(b: pa.Table) -> pa.Table:
        b = drop_invalid_vectors(b, vec_col)
        if b.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "qvec": pa.array([], pa.binary()),
                 "scale": pa.array([], pa.float32())}
            )
        X = _batch_matrix(b, vec_col)
        Q, scale = _quantize_rows(X)
        d = Q.shape[1] if Q.ndim == 2 and Q.shape[0] else 0
        offsets = np.arange(len(Q) + 1, dtype=np.int32) * d
        qvec = pa.Array.from_buffers(
            pa.binary(), len(Q),
            [None, pa.py_buffer(offsets), pa.py_buffer(Q.tobytes())],
        )
        return pa.table(
            {id_col: b[id_col], "qvec": qvec,
             "scale": pa.array(scale, pa.float32())}
        )

    return ds.map_batches(qz, batch_format="pyarrow")


def quantized_topk(
    ds,
    queries_ref: Any,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank_factor: int = 4,
):
    """Memory-scaled ANN: int8-approximate candidate generation + EXACT
    float64 re-rank, so the final top-k normally equals brute_force_topk
    bit-for-bit (same driver oracle covers both).

    Stage 1 scans the corpus in the quantized representation (at scale
    this is the stored `quantize_embeddings` table — 4-8x less I/O and
    heap than the float path), emitting rerank_factor*k candidates per
    query per block by approximate cosine; a query-keyed hash exchange
    then reduces those to a GLOBAL per-query top-(rerank_factor*k), so
    the gathered id set is bounded by nq * rerank_factor * k no matter
    how many blocks the corpus has. Stage 2 gathers only that set and
    runs the exact brute-force kernel on the tiny subset. Approximation
    lives solely in candidate RECALL: a true neighbor is missed only if
    quantization error pushes it below the per-query candidate rank.
    """
    import ray
    import pyarrow.compute as pc

    from ..shuffle import hash_exchange

    q = _maybe_get(queries_ref)
    qmat32 = _normalize(q["mat"].astype(np.float64)).astype(np.float32)
    q_ids = np.asarray(q["ids"], dtype=np.int64)
    m = rerank_factor * k + 1  # +1 headroom for the self-match exclusion

    def approx(batch: pa.Table) -> pa.Table:
        batch = drop_invalid_vectors(batch, vec_col)
        if batch.num_rows == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "vec_id": pa.array([], pa.int64()),
                 "approx": pa.array([], pa.float64())}
            )
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        X = _batch_matrix(batch, vec_col)
        Q, scale = _quantize_rows(X)
        Xq = Q.astype(np.float32) * scale[:, None]
        Xq = _normalize(Xq.astype(np.float64)).astype(np.float32)
        sims = qmat32 @ Xq.T
        take = min(m, sims.shape[1])
        part = np.argpartition(-sims, take - 1, axis=1)[:, :take]
        rows_q = np.repeat(np.arange(len(q_ids)), take)
        cand = part.ravel()
        return pa.table(
            {
                "query_id": pa.array(q_ids[rows_q]),
                "vec_id": pa.array(ids[cand], pa.int64()),
                "approx": pa.array(
                    sims[rows_q, cand].astype(np.float64), pa.float64()
                ),
            }
        )

    def per_query_topm(t: pa.Table) -> pa.Table:
        # (approx desc, vec_id asc)-best m per query — same lexsort+rank
        # idiom as ops/sample, fixed-width rows only
        qi = t["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vi = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sc = t["approx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((vi, -sc, qi))
        qo = qi[order]
        new = np.ones(len(qo), dtype=bool)
        new[1:] = qo[1:] != qo[:-1]
        starts = np.flatnonzero(new)
        rank = np.arange(len(qo)) - np.repeat(
            starts, np.diff(np.concatenate((starts, [len(qo)])))
        )
        keep = order[rank < m]
        return t.take(pa.array(np.sort(keep)))

    parts = ds.map_batches(approx, batch_format="pyarrow", batch_size=None)
    topm = hash_exchange(
        parts.to_arrow_refs(), ["query_id"], per_query_topm,
        combine_fn=per_query_topm,
    )
    if topm is None or topm.num_rows == 0:
        return ds.map_batches(lambda b: pa.table(
            {"query_id": pa.array([], pa.int64()),
             "vec_id": pa.array([], pa.int64()),
             "rank": pa.array([], pa.int64())}), batch_format="pyarrow")
    cset = pc.unique(topm["vec_id"].combine_chunks())
    cref = ray.put(cset)

    def filt(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.is_in(pc.cast(b[id_col], pa.int64()), value_set=ray.get(cref))
        )

    survivors = ds.map_batches(filt, batch_format="pyarrow")
    return brute_force_topk(survivors, queries_ref, k, id_col, vec_col)


def hard_negative_topk(
    ds,
    queries_ref: Any,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
):
    """Hard-negative mining (contrastive-training curation, public
    recipe): for each query, the exact cosine top-k among vectors whose
    `label_col` DIFFERS from the query's — the closest wrong-class
    examples. Same broadcast-once / per-batch-partial / per-query-merge
    shape as brute_force_topk; null-label candidates are excluded (SQL
    `e.label <> q.label` semantics). queries_ref holds
    {"ids", "mat", "labels"}."""
    import ray

    def partial_fn(batch: pa.Table) -> pa.Table:
        q = _maybe_get(queries_ref)
        q_ids = np.asarray(q["ids"], dtype=np.int64)
        q_labels = np.asarray(q["labels"])
        q_mat = _normalize(np.asarray(q["mat"], dtype=np.float64))
        batch = drop_invalid_vectors(batch, vec_col)
        lab = batch[label_col]
        if isinstance(lab, pa.ChunkedArray):
            lab = lab.combine_chunks()
        valid = pa.compute.is_valid(lab)
        batch = batch.filter(valid)
        if not batch.num_rows:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        labels = batch[label_col].to_numpy(zero_copy_only=False)
        mat = _normalize(_batch_matrix(batch, vec_col))
        sims = q_mat @ mat.T  # [nq, nb]
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(q_ids):
            ql = q_labels[qi]
            # SQL `e.label <> q.label` is never true for a NULL query
            # label: such a query yields no negatives at all
            if ql is None or (isinstance(ql, float) and np.isnan(ql)):
                continue
            row = np.where(labels == ql, -np.inf, sims[qi])
            order = np.lexsort((ids, -row))
            taken = 0
            for j in order:
                if taken >= k or not np.isfinite(row[j]):
                    break
                out_q.append(int(qid))
                out_v.append(int(ids[j]))
                out_s.append(float(row[j]))
                taken += 1
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    partial = ds.map_batches(partial_fn, batch_format="pyarrow",
                             batch_size=None)

    def merge(group: pa.Table) -> pa.Table:
        idx = pa.compute.sort_indices(
            group, sort_keys=[("score", "descending"), ("vec_id", "ascending")])
        top = group.take(idx[:k])
        return pa.table({
            "query_id": top["query_id"],
            "vec_id": top["vec_id"],
            "rank": pa.array(range(1, top.num_rows + 1), pa.int64()),
        })

    return partial.groupby("query_id").map_groups(
        merge, batch_format="pyarrow")
