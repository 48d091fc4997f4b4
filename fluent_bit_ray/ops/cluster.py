"""Distributed Lloyd's k-means over an embedding column.

The data-curation tool the ANN/IVF suite was missing: `ops/ann
.ivf_build_centroids` deliberately uses a deterministic sample ("k-means
would drift per-run"); this module supplies the real thing with the drift
controlled — deterministic init (first-k vectors, same contract as the IVF
sampler) and a fixed iteration count, so the fit is reproducible for a
given block layout (float partial-sum order is the only per-layout
wobble, ~1e-12).

Scale shape (the canonical Ray Data iterative pattern):
- centroids are broadcast ONCE per iteration via `ray.put` (never
  re-shipped per batch);
- each `map_batches` task emits a k-row partial — per-cluster count,
  vector sum, and inertia — so the driver reduces k × n_blocks tiny rows
  per iteration and never sees a record;
- the input Dataset is optionally `materialize()`d once before the loop
  (`cache=True`): k passes over the same blocks amortize the parquet
  read. This is the documented exception to "never materialize
  mid-pipeline" — an iterative algorithm re-reads its input `iters`
  times; on a corpus larger than the object store, pass `cache=False`
  and pay the re-read (Ray spills either way, nothing lands on the
  driver).

Lloyd's monotonicity (inertia measured at assignment time never
increases) is surfaced in the fit result and oracle-checked by the
`kmeans_invariant` driver query.

Reference note: the reference engine (michiel/fluent-bit) has no
clustering; this is part of the LLM-training-data operator suite built
on the same embeddings table as ops/ann and ops/dedup.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from .ann import _batch_matrix


def _partial_stats(batch: pa.Table, cent: np.ndarray, vec_col: str) -> pa.Table:
    """One block's k-row partial: per-cluster count, component sums,
    inertia. Assignment is a single GEMM + argmin; sums are C-level
    scatter-adds."""
    X = _batch_matrix(batch, vec_col)
    k, d = cent.shape
    # |x-c|^2 = |x|^2 - 2 x.c + |c|^2 ; argmin needs only the last two terms
    cross = X @ cent.T
    c2 = (cent * cent).sum(axis=1)
    scores = c2[None, :] - 2.0 * cross
    assign = scores.argmin(axis=1)
    x2 = (X * X).sum(axis=1)
    inertia = float((x2 + scores[np.arange(len(X)), assign]).sum())
    counts = np.bincount(assign, minlength=k).astype(np.int64)
    sums = np.zeros((k, d), dtype=np.float64)
    np.add.at(sums, assign, X)
    return pa.table(
        {
            "cluster": pa.array(np.arange(k, dtype=np.int64)),
            "count": pa.array(counts),
            "vec_sum": pa.array(list(sums), pa.list_(pa.float64())),
            "inertia": pa.array(
                np.where(np.arange(k) == 0, inertia, 0.0), pa.float64()
            ),
        }
    )


def _init_centroids(ds, k: int, vec_col: str) -> np.ndarray:
    """Deterministic init: the first k vectors in dataset order (the
    ivf_build_centroids contract — reproducible, no RNG)."""
    mats: list[np.ndarray] = []
    have = 0
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=max(256, k)):
        mats.append(_batch_matrix(b, vec_col))
        have += mats[-1].shape[0]
        if have >= k:
            break
    m = np.concatenate(mats, axis=0)
    if m.shape[0] < k:
        raise ValueError(f"k={k} exceeds corpus size {m.shape[0]}")
    return m[:k].copy()


def kmeans_fit(
    ds,
    k: int = 8,
    vec_col: str = "embedding",
    iters: int = 10,
    cache: bool = True,
) -> tuple[np.ndarray, dict]:
    """Fit k centroids with `iters` Lloyd's rounds; returns
    (centroids[k,d], info) where info carries the per-iteration inertia
    history (measured at assignment time, so Lloyd's guarantees it is
    non-increasing) and the final per-cluster counts."""
    import ray

    if cache:
        ds = ds.materialize()
    cent = _init_centroids(ds, k, vec_col)
    history: list[float] = []
    counts = None
    for _ in range(iters):
        cent_ref = ray.put(cent)

        def stats(b: pa.Table, _ref=cent_ref) -> pa.Table:
            return _partial_stats(b, ray.get(_ref), vec_col)

        partials = ds.map_batches(stats, batch_format="pyarrow").take_all()
        k_, d = cent.shape
        counts = np.zeros(k_, dtype=np.int64)
        sums = np.zeros((k_, d), dtype=np.float64)
        inertia = 0.0
        for row in partials:
            c = int(row["cluster"])
            counts[c] += int(row["count"])
            sums[c] += np.asarray(row["vec_sum"], dtype=np.float64)
            inertia += float(row["inertia"])
        history.append(inertia)
        nonzero = counts > 0
        new = cent.copy()  # empty cluster keeps its previous centroid
        new[nonzero] = sums[nonzero] / counts[nonzero, None]
        cent = new
    return cent, {"inertia": history, "counts": counts}


def kmeans_assign(
    ds,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Streaming assignment of every vector to its nearest centroid;
    emits (id, cluster, dist2). Centroids broadcast once via ray.put."""
    import ray

    cent_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        X = _batch_matrix(batch, vec_col)
        c2 = (cent * cent).sum(axis=1)
        scores = c2[None, :] - 2.0 * (X @ cent.T)
        a = scores.argmin(axis=1)
        x2 = (X * X).sum(axis=1)
        d2 = np.maximum(x2 + scores[np.arange(len(X)), a], 0.0)
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(a.astype(np.int64)),
                "dist2": pa.array(d2, pa.float64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def kmeans_invariants(
    ds,
    k: int = 8,
    iters: int = 5,
    vec_col: str = "embedding",
    rel_tol: float = 1e-9,
) -> pa.Table:
    """Oracle-checkable structural invariants of a full fit+assign:
    - n_points: every vector got exactly one assignment (the verify pass
      counts rows, so ids are not needed here — use kmeans_assign for
      per-id output);
    - n_bad_argmin: assignments re-verified against the final centroids
      in an independent pass (argmin mismatch count; 0);
    - n_inertia_increases: Lloyd's monotonicity violations across the
      history (0 up to float tolerance);
    - clusters_ok: 1 <= clusters used <= k.
    """
    import ray

    cent, info = kmeans_fit(ds, k=k, iters=iters, vec_col=vec_col)
    cent_ref = ray.put(cent)

    def verify(batch: pa.Table, _ref=cent_ref) -> pa.Table:
        """Per-block (rows, violations) partial: the GEMM-path assignment
        is re-checked against an INDEPENDENT distance formulation — an
        explicit per-centroid |x - c|^2 loop — so a broken expansion
        (|x|^2 - 2x.c + |c|^2) or a stale broadcast can't self-certify."""
        c = ray.get(_ref)
        X = _batch_matrix(batch, vec_col)
        c2 = (c * c).sum(axis=1)
        scores = c2[None, :] - 2.0 * (X @ c.T)
        a = scores.argmin(axis=1)
        x2 = (X * X).sum(axis=1)
        d2_assigned = x2 + scores[np.arange(len(X)), a]
        true_min = np.full(len(X), np.inf)
        for j in range(c.shape[0]):
            diff = X - c[j][None, :]
            true_min = np.minimum(true_min, (diff * diff).sum(axis=1))
        eps = 1e-9 * (1.0 + np.abs(true_min))
        bad = int((d2_assigned > true_min + eps).sum())
        return pa.table(
            {
                "rows": pa.array([len(X)], pa.int64()),
                "bad": pa.array([bad], pa.int64()),
            }
        )

    partials = ds.map_batches(verify, batch_format="pyarrow").take_all()
    n_points = sum(int(r["rows"]) for r in partials)
    n_bad = sum(int(r["bad"]) for r in partials)

    hist = info["inertia"]
    increases = sum(
        1
        for prev, cur in zip(hist, hist[1:])
        if cur > prev * (1 + rel_tol) + rel_tol
    )
    used = int((np.asarray(info["counts"]) > 0).sum())
    return pa.table(
        {
            "n_points": pa.array([n_points], pa.int64()),
            "n_bad_argmin": pa.array([n_bad], pa.int64()),
            "n_inertia_increases": pa.array([increases], pa.int64()),
            "clusters_ok": pa.array([int(1 <= used <= k)], pa.int64()),
        }
    )
