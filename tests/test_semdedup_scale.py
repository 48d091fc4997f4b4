"""SemDeDup scale fixes (round-4 verdict item #2): data-derived k and the
tiled-GEMM union-find replacing the dense per-cluster adjacency.

The correctness pin is parity: _tiled_min_components must produce exactly
the dense formulation's components for ANY tile size. The scale pin is a
tracemalloc bound: peak extra memory on a pathological all-duplicates
cluster stays O(tile²) where the dense path would need O(n²)."""

import numpy as np
import pyarrow as pa
import pytest

from fluent_bit_ray.ops.ann import _normalize
from fluent_bit_ray.ops.cluster import _tiled_min_components


def _dense_min_labels(ids: np.ndarray, Xn: np.ndarray,
                      tau: float) -> np.ndarray:
    """The pre-round-4 dense reference, kept here as the parity oracle."""
    adj = (Xn @ Xn.T) >= tau
    np.fill_diagonal(adj, True)
    labels = ids.copy()
    while True:
        m = np.where(adj, labels[None, :], np.iinfo(np.int64).max)
        new = m.min(axis=1)
        if np.array_equal(new, labels):
            break
        labels = new
    return labels


def _corpus(seed: int, n: int, d: int, n_dup_groups: int,
            group_size: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    # plant near-dup groups: members = base + tiny noise (cos ~ 1)
    for g in range(n_dup_groups):
        base = rng.normal(size=d)
        idx = rng.choice(n, size=group_size, replace=False)
        X[idx] = base[None, :] + rng.normal(scale=1e-4, size=(group_size, d))
    ids = rng.permutation(n).astype(np.int64) * 7 + 3  # non-contiguous ids
    return ids, _normalize(X)


class TestTiledParity:
    @pytest.mark.parametrize("tile", [1, 3, 17, 64, 4096])
    def test_matches_dense_any_tile(self, tile):
        ids, Xn = _corpus(seed=1, n=257, d=16, n_dup_groups=9,
                          group_size=11)
        got = _tiled_min_components(ids, Xn, tau=0.97, tile=tile)
        exp = _dense_min_labels(ids, Xn, tau=0.97)
        assert np.array_equal(got, exp)

    def test_chained_components(self):
        # A~B and B~C but A!~C: one component via transitivity, min id rep
        a = np.array([1.0, 0.0])
        b_dir = np.array([np.cos(0.20), np.sin(0.20)])
        c_dir = np.array([np.cos(0.40), np.sin(0.40)])
        X = np.vstack([a, b_dir, c_dir])
        tau = np.cos(0.25)  # a.b and b.c above, a.c below
        ids = np.array([30, 10, 20], dtype=np.int64)
        for tile in (1, 2, 3):
            got = _tiled_min_components(ids, _normalize(X), tau, tile=tile)
            assert got.tolist() == [10, 10, 10]

    def test_zero_norm_isolated(self):
        X = np.vstack([np.zeros(4), np.zeros(4), np.ones(4)])
        ids = np.array([5, 2, 9], dtype=np.int64)
        got = _tiled_min_components(ids, _normalize(X), tau=0.9, tile=2)
        # zero vectors are similar to nothing, not even each other
        assert got.tolist() == [5, 2, 9]

    def test_all_duplicates_single_group(self):
        n = 500
        X = np.tile(np.array([0.3, -0.7, 0.2]), (n, 1))
        ids = np.arange(100, 100 + n, dtype=np.int64)
        got = _tiled_min_components(ids, _normalize(X), tau=0.97, tile=64)
        assert (got == 100).all()


class TestTiledParityFuzz:
    """Hypothesis fuzz over corpus shape, threshold and tile size — the
    dense-equivalence claim must hold for EVERY (n, tau, tile), not just
    the hand-picked cases above."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        seed=st.integers(0, 10_000),
        n=st.integers(2, 120),
        d=st.integers(2, 12),
        tau=st.floats(0.5, 0.999),
        tile=st.integers(1, 140),
        dup_groups=st.integers(0, 6),
    )
    def test_fuzz_matches_dense(self, seed, n, d, tau, tile, dup_groups):
        rng = np.random.default_rng(seed)
        X = rng.normal(size=(n, d))
        for _ in range(dup_groups):
            sz = int(rng.integers(2, max(3, n // 3)))
            idx = rng.choice(n, size=min(sz, n), replace=False)
            X[idx] = rng.normal(size=d)[None, :] + rng.normal(
                scale=1e-5, size=(len(idx), d))
        ids = rng.permutation(n).astype(np.int64) * 3 + 1
        Xn = _normalize(X)
        got = _tiled_min_components(ids, Xn, tau=tau, tile=tile)
        exp = _dense_min_labels(ids, Xn, tau=tau)
        assert np.array_equal(got, exp)


class TestBoundedMemory:
    def test_peak_is_tile_bounded_not_n_squared(self):
        """n=3000 all-near-identical vectors: the dense path needs the
        n×n float similarity (72 MB) + n×n bool adjacency (9 MB); the
        tiled path with tile=256 must peak far below that."""
        import tracemalloc

        n, d, tile = 3000, 32, 256
        rng = np.random.default_rng(7)
        base = rng.normal(size=d)
        X = base[None, :] + rng.normal(scale=1e-5, size=(n, d))
        Xn = _normalize(X)
        ids = np.arange(n, dtype=np.int64)
        tracemalloc.start()
        got = _tiled_min_components(ids, Xn, tau=0.97, tile=tile)
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        assert (got == 0).all()  # one giant dup group, min id rep
        dense_bytes = n * n * 8
        assert peak < dense_bytes // 2, (peak, dense_bytes)


class TestDerivedK:
    def test_k_default_grows_with_n(self, ray_session):
        import ray

        from fluent_bit_ray.ops.cluster import semdedup

        rng = np.random.default_rng(3)
        n = 600
        X = rng.normal(size=(n, 8))
        t = pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(X.tolist(), pa.list_(pa.float32())),
        })
        ds = ray.data.from_arrow(t)
        # target 64 rows/cluster -> ceil(600/64)=10 clusters requested;
        # structure must hold and every vector must be assigned once
        out = semdedup(ds, tau=0.999, target_cluster_rows=64,
                       tile=128).to_pandas()
        assert len(out) == n
        assert sorted(out["vec_id"].tolist()) == list(range(n))
        assert (out["rep_id"] <= out["vec_id"]).all()
        assert out["cluster"].nunique() >= 2
