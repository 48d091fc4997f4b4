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

from .ann import _batch_matrix, drop_invalid_vectors


def _partial_stats(batch: pa.Table, cent: np.ndarray, vec_col: str) -> pa.Table:
    """One block's k-row partial: per-cluster count, component sums,
    inertia. Assignment is a single GEMM + argmin; sums are C-level
    scatter-adds."""
    batch = drop_invalid_vectors(batch, vec_col)
    k, d = cent.shape
    if batch.num_rows == 0:
        return pa.table(
            {
                "cluster": pa.array(np.arange(k, dtype=np.int64)),
                "count": pa.array(np.zeros(k, dtype=np.int64)),
                "vec_sum": pa.array(
                    list(np.zeros((k, d), dtype=np.float64)),
                    pa.list_(pa.float64()),
                ),
                "inertia": pa.array(np.zeros(k, dtype=np.float64)),
            }
        )
    X = _batch_matrix(batch, vec_col)
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
        b = drop_invalid_vectors(b, vec_col)
        if b.num_rows == 0:
            continue
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
        batch = drop_invalid_vectors(batch, vec_col)
        cent = ray.get(cent_ref)
        if batch.num_rows == 0:
            X = np.zeros((0, cent.shape[1]), dtype=np.float64)
        else:
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
        batch = drop_invalid_vectors(batch, vec_col)
        c = ray.get(_ref)
        if batch.num_rows == 0:
            X = np.zeros((0, c.shape[1]), dtype=np.float64)
        else:
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


def pca_fit(ds, vec_col: str = "embedding", n_components: int = 8):
    """Distributed PCA over an embedding column — the dimensionality-
    reduction step of an embedding curation pipeline (dedup/ANN at lower
    d, whitening before clustering). Classic MapReduce sufficient-stats
    shape: each block emits ONE (n, column-sum[d], gram d x d) partial —
    fixed-width regardless of rows — the driver sums partials, forms the
    POPULATION covariance (matches SQL var_pop), and eigendecomposes the
    tiny d x d matrix locally. No vector ever leaves its block.

    Determinism: component signs are pinned (largest-|coefficient| entry
    positive) so the fit is reproducible; float partial-sum order is the
    only per-layout wobble (~1e-12, same contract as kmeans_fit).

    Returns (mean[d], components[n_components, d] row-major,
    eigvals_all[d] descending, info)."""

    def part(t: pa.Table) -> pa.Table:
        t = drop_invalid_vectors(t, vec_col)
        if t.num_rows == 0:
            # dimension unknown on an all-invalid block: emit a no-op
            # partial the reducer drops (n=0, empty sums)
            return pa.table({"n": pa.array([0], pa.int64()),
                             "s": pa.array([[]], pa.list_(pa.float64())),
                             "g": pa.array([[]], pa.list_(pa.float64()))})
        X = _batch_matrix(t, vec_col)
        g = X.T @ X
        return pa.table({
            "n": pa.array([len(X)], pa.int64()),
            "s": pa.array([X.sum(axis=0).tolist()]),
            "g": pa.array([g.reshape(-1).tolist()]),
        })

    rows = ds.select_columns([vec_col]).map_batches(
        part, batch_format="pyarrow").take_all()
    rows = [r for r in rows if r["n"] > 0]  # all-invalid-block no-ops
    if not rows:
        raise ValueError("pca_fit: empty input")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"], np.float64) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"], np.float64) for r in rows], axis=0)
    d = len(s)
    mean = s / n
    cov = g.reshape(d, d) / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2.0
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals)[::-1]
    eigvals = eigvals[order]
    comps = eigvecs[:, order].T  # rows = components
    # pin signs: the largest-|coefficient| entry of each component > 0
    piv = np.argmax(np.abs(comps), axis=1)
    signs = np.sign(comps[np.arange(d), piv])
    signs[signs == 0] = 1.0
    comps = comps * signs[:, None]
    info = {"n": int(n), "explained": eigvals[:n_components].tolist(),
            "trace": float(eigvals.sum())}
    return mean, comps[:n_components], eigvals, info


def pca_transform(ds, mean: np.ndarray, components: np.ndarray,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  out_col: str = "pc"):
    """Project every vector onto the fitted components: model broadcast
    ONCE via ray.put, one GEMM per block, output (id, pc list<double>).
    Pure map — streams at read speed."""
    import ray

    ref = ray.put((np.asarray(mean, np.float64),
                   np.asarray(components, np.float64)))

    def proj(t: pa.Table) -> pa.Table:
        t = drop_invalid_vectors(t, vec_col)
        mu, W = ray.get(ref)
        if t.num_rows == 0:
            X = np.zeros((0, mu.shape[0]), dtype=np.float64)
        else:
            X = _batch_matrix(t, vec_col)
        P = (X - mu[None, :]) @ W.T
        return pa.table({id_col: t[id_col],
                         out_col: pa.array(P.tolist())})

    return ds.map_batches(proj, batch_format="pyarrow")


def pca_invariants(ds, vec_col: str = "embedding",
                   n_components: int = 8, tol: float = 1e-6) -> pa.Table:
    """SQL-pinnable PCA contract (the kmeans_invariant pattern, but with
    a REAL cross-engine number): `trace_cov` reports the SUM OF ALL
    EIGENVALUES, which the DuckDB twin recomputes INDEPENDENTLY as the
    sum of per-dimension var_pop — they agree iff the distributed
    sufficient-stats covariance is right. The violation counters pin the
    linear-algebra contracts: components orthonormal, eigenvalues
    descending, and the projected data's per-component variance equal to
    its eigenvalue (verified by a second distributed pass over the
    PROJECTIONS' sufficient stats)."""
    mean, comps, eigvals, info = pca_fit(ds, vec_col, n_components)
    k, d = comps.shape
    gram = comps @ comps.T
    n_orth = int((np.abs(gram - np.eye(k)) > 1e-8).sum())
    n_desc = int((np.diff(eigvals) > 1e-12).sum())

    proj = pca_transform(ds, mean, comps, vec_col=vec_col)

    def pstats(t: pa.Table) -> pa.Table:
        P = _batch_matrix(t, "pc")  # zero-copy flatten, not to_pylist
        return pa.table({
            "n": pa.array([len(P)], pa.int64()),
            "s": pa.array([P.sum(axis=0).tolist()]),
            "q": pa.array([(P * P).sum(axis=0).tolist()]),
        })

    rows = proj.map_batches(pstats, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"], np.float64) for r in rows], axis=0)
    q = np.sum([np.asarray(r["q"], np.float64) for r in rows], axis=0)
    pvar = q / n - (s / n) ** 2
    n_pvar = int((np.abs(pvar - eigvals[:k]) > tol).sum())
    return pa.table({
        "n_vectors": pa.array([n], pa.int64()),
        "trace_cov": pa.array([float(eigvals.sum())], pa.float64()),
        "n_orth_violations": pa.array([n_orth], pa.int64()),
        "n_pvar_violations": pa.array([n_pvar], pa.int64()),
        "n_eig_order_violations": pa.array([n_desc], pa.int64()),
    })


def _tiled_min_components(ids: np.ndarray, Xn: np.ndarray, tau: float,
                          tile: int = 1024) -> np.ndarray:
    """Min-id connected-component labels of the graph {(i,j): cos >= tau}
    WITHOUT materializing the n×n adjacency: similarity is computed one
    tile×tile GEMM at a time (peak extra memory O(tile²), not O(n²)), each
    tile pair's thresholded edges run a local vectorized scatter-min
    fixpoint, and the local components merge into a global union-find
    (path-compressed; ≤ #involved-nodes unions per tile pair). Components
    — and therefore reps — are identical to the dense formulation for any
    tile size: the union over tile pairs of edge subsets IS the full edge
    set, and union-find is order-independent."""
    n = len(ids)
    parent = np.arange(n, dtype=np.int64)

    def find(i: int) -> int:
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:
            parent[i], i = root, parent[i]
        return root

    for a in range(0, n, tile):
        A = Xn[a:a + tile]
        for c in range(a, n, tile):
            S = A @ Xn[c:c + tile].T
            hit = S >= tau
            if c == a:
                hit = np.triu(hit, k=1)  # self-pairs / double-count off
            li, lj = np.nonzero(hit)
            if not len(li):
                continue
            gi = li + a
            gj = lj + c
            # local fixpoint over this tile pair's edges: labels are
            # LOCAL node indices so pointer-jumping (lab[lab]) is valid
            nodes, inv = np.unique(np.concatenate([gi, gj]),
                                   return_inverse=True)
            ei = inv[: len(gi)]
            ej = inv[len(gi):]
            lab = np.arange(len(nodes), dtype=np.int64)
            while True:
                before = lab.copy()
                m = np.minimum(lab[ei], lab[ej])
                np.minimum.at(lab, ei, m)
                np.minimum.at(lab, ej, m)
                lab = np.minimum(lab, lab[lab])
                if np.array_equal(lab, before):
                    break
            for x in range(len(nodes)):
                r = int(lab[x])
                if r != x:
                    ra, rb = find(int(nodes[x])), find(int(nodes[r]))
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    roots = np.fromiter((find(i) for i in range(n)), dtype=np.int64,
                        count=n)
    # component representative = MIN ID over the component
    min_id = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(min_id, roots, ids)
    return min_id[roots]


def semdedup(
    ds,
    k: Optional[int] = None,
    tau: float = 0.97,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 4,
    target_cluster_rows: int = 4096,
    tile: int = 1024,
    cache: bool = True,
) -> pa.Table:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, public method):
    k-means clusters bound the candidate space, then each cluster runs an
    exact within-cluster cosine pass — pairs at >= `tau` union into one
    semantic group whose minimum id becomes the representative. Output:
    one (id, rep_id, cluster) row per input vector.

    Scale shape: the whole point of the clustering stage is that the
    O(n²) cosine GEMM runs per CLUSTER, never per corpus — candidate
    work scales with the largest cluster. Two dials keep that honest at
    any corpus size (round-4 fix; previously k=8 fixed + dense n²
    adjacency per cluster):
    - `k` defaults to DATA-DERIVED: ceil(n / target_cluster_rows)
      (floored at 8, capped at n), so the expected cluster stays
      ~target_cluster_rows no matter how big the corpus — the Abbas et
      al. recipe, where k grows with n (50k clusters for LAION);
    - the within-cluster pass is a TILED GEMM + union-find
      (_tiled_min_components): peak per-shard extra memory is O(tile²),
      never O(cluster²).
    Cluster co-location is ONE hash exchange of (id, vector, cluster)
    rows (shard count itself data-derived per shuffle.py's sizing rule).
    Zero-norm vectors are similar to nothing but themselves. `cache`
    materializes the input once — the documented iterative-algorithm
    exception (kmeans iters + count + assign reread the same blocks);
    pass cache=False on a corpus larger than the object store."""
    import ray

    from ..shuffle import hash_exchange
    from .ann import _normalize

    if cache:
        ds = ds.materialize()
    if k is None:
        n = ds.count()
        if not n:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "rep_id": pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64())})
        k = min(int(n), max(8, -(-int(n) // target_cluster_rows)))
    # caching (or declining to) is handled above, once, for all passes
    cent, _ = kmeans_fit(ds, k=k, vec_col=vec_col, iters=iters, cache=False)
    cent_ref = ray.put(np.asarray(cent, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        batch = drop_invalid_vectors(batch, vec_col)
        c = ray.get(cent_ref)
        if batch.num_rows == 0:
            X = np.zeros((0, c.shape[1]), dtype=np.float64)
        else:
            X = _batch_matrix(batch, vec_col)
        scores = (c * c).sum(axis=1)[None, :] - 2.0 * (X @ c.T)
        return pa.table({
            id_col: batch[id_col],
            vec_col: batch[vec_col],
            "cluster": pa.array(scores.argmin(axis=1).astype(np.int64)),
        })

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out_id: list[np.ndarray] = []
        out_rep: list[np.ndarray] = []
        out_cl: list[np.ndarray] = []
        # loop over DISTINCT CLUSTERS in the shard (k-bounded), all the
        # per-vector work inside is numpy
        for cl, g in df.groupby("cluster", sort=False):
            ids = g[id_col].to_numpy(dtype=np.int64)
            X = np.vstack(g[vec_col].to_numpy())
            Xn = _normalize(X.astype(np.float64))
            labels = _tiled_min_components(ids, Xn, tau, tile=tile)
            out_id.append(ids)
            out_rep.append(labels)
            out_cl.append(np.full(len(ids), int(cl), dtype=np.int64))
        if not out_id:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "rep_id": pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64())})
        return pa.table({
            id_col: pa.array(np.concatenate(out_id)),
            "rep_id": pa.array(np.concatenate(out_rep)),
            "cluster": pa.array(np.concatenate(out_cl)),
        })

    out = hash_exchange(
        ds.map_batches(assign, batch_format="pyarrow").to_arrow_refs(),
        ["cluster"], finish,
    )
    if out is None:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "rep_id": pa.array([], pa.int64()),
                         "cluster": pa.array([], pa.int64())})
    return out
