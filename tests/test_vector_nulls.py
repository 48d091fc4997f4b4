"""Adversarial embeddings: NULL and empty vector rows must be DROPPED by
every vector op (a row with no vector cannot rank — list_cosine_similarity
against NULL is NULL in the SQL twins), never silently scrambled.

Regression anchor: `_batch_matrix` used `len(flat) // len(arr)` for the
dim, so one NULL row made every later vector mis-associate with its id —
wrong answers, no crash. Now: invalid rows filter out via
drop_invalid_vectors; a ragged (mixed-dim) column raises loudly."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from fluent_bit_ray.ops.ann import (
    _batch_matrix,
    brute_force_topk,
    drop_invalid_vectors,
)


def _emb_table(with_bad=True):
    vecs = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0], [1.0, 0.1]]
    ids = [0, 1, 2, 3]
    labels = [0, 1, 0, 1]
    if with_bad:
        vecs += [None, []]
        ids += [90, 91]
        labels += [0, 1]
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )


class TestBatchMatrixGuards:
    def test_null_row_raises_not_scrambles(self):
        t = _emb_table()
        with pytest.raises(ValueError, match="NULL/empty or ragged"):
            _batch_matrix(t, "embedding")

    def test_ragged_dims_raise(self):
        t = pa.table(
            {"embedding": pa.array([[1.0, 2.0], [1.0, 2.0, 3.0]],
                                   pa.list_(pa.float32()))}
        )
        with pytest.raises(ValueError, match="ragged"):
            _batch_matrix(t, "embedding")

    def test_drop_invalid_filters_null_and_empty(self):
        t = _emb_table()
        clean = drop_invalid_vectors(t, "embedding")
        assert clean["vec_id"].to_pylist() == [0, 1, 2, 3]
        # clean input passes through untouched (same object path)
        t2 = _emb_table(with_bad=False)
        assert drop_invalid_vectors(t2, "embedding") is t2

    def test_clean_matrix_unchanged(self):
        t = _emb_table(with_bad=False)
        m = _batch_matrix(t, "embedding")
        assert m.shape == (4, 2) and m[3, 1] == pytest.approx(0.1, rel=1e-6)


@pytest.mark.usefixtures("ray_session")
class TestOpsDropInvalidRows:
    def _results_equal(self, a, b):
        import pandas as pd

        pa_, pb = a.to_pandas(), b.to_pandas()
        cols = sorted(pa_.columns)
        pa_ = pa_[cols].sort_values(cols).reset_index(drop=True)
        pb = pb[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(pa_, pb)

    def test_brute_topk_ignores_invalid_rows(self):
        q = ray.put({"ids": np.array([0], np.int64),
                     "mat": np.array([[1.0, 0.0]], np.float64)})
        dirty = ray.data.from_arrow(_emb_table(True))
        clean = ray.data.from_arrow(_emb_table(False))
        out_d = brute_force_topk(dirty, q, k=2)
        out_c = brute_force_topk(clean, q, k=2)
        td = out_d if isinstance(out_d, pa.Table) else pa.Table.from_pandas(
            out_d.to_pandas())
        tc = out_c if isinstance(out_c, pa.Table) else pa.Table.from_pandas(
            out_c.to_pandas())
        self._results_equal(td, tc)
        assert 90 not in td.to_pandas()["vec_id"].tolist()

    def test_kmeans_and_semdedup_ignore_invalid_rows(self):
        from fluent_bit_ray.ops.cluster import kmeans_fit

        dirty = ray.data.from_arrow(_emb_table(True))
        clean = ray.data.from_arrow(_emb_table(False))
        cd, infod = kmeans_fit(dirty, k=2, iters=3, cache=False)
        cc, infoc = kmeans_fit(clean, k=2, iters=3, cache=False)
        assert np.allclose(np.asarray(cd), np.asarray(cc))

    def test_neardup_blocked_ignores_invalid_rows(self):
        from fluent_bit_ray.ops.dedup import embedding_neardup_pairs_blocked

        t = _emb_table(True)
        # duplicate vec 0 so a real pair exists
        t2 = pa.table(
            {
                "vec_id": pa.array([50], pa.int64()),
                "embedding": pa.array([[1.0, 0.0]], pa.list_(pa.float32())),
                "label": pa.array([0], pa.int32()),
            }
        )
        ds = ray.data.from_arrow(pa.concat_tables([t, t2]))
        pairs = embedding_neardup_pairs_blocked(ds, threshold=0.999)
        got = set(map(tuple, pairs.to_pandas()[["id_a", "id_b"]].values))
        assert (0, 50) in got
        assert not any(90 in p or 91 in p for p in got)


class TestReviewEdgeCases:
    """Round-5 second-review regressions: schema stability and sampling
    over all-invalid blocks."""

    def test_quantize_schema_stable_across_invalid_blocks(self, ray_session):
        from fluent_bit_ray.ops.ann import quantize_embeddings

        all_bad = pa.table(
            {
                "vec_id": pa.array([7, 8], pa.int64()),
                "embedding": pa.array([None, None], pa.list_(pa.float32())),
                "label": pa.array([0, 0], pa.int32()),
            }
        )
        mixed = ray.data.from_arrow(_emb_table(False)).union(
            ray.data.from_arrow(all_bad)
        )
        rows = quantize_embeddings(mixed).take_all()  # schema must unify
        assert sorted(r["vec_id"] for r in rows) == [0, 1, 2, 3]
        assert all(len(r["qvec"]) == 2 for r in rows)

    def test_ivf_centroids_skip_invalid_blocks(self, ray_session):
        from fluent_bit_ray.ops.ann import ivf_build_centroids

        all_bad = pa.table(
            {
                "vec_id": pa.array([7], pa.int64()),
                "embedding": pa.array([None], pa.list_(pa.float32())),
                "label": pa.array([0], pa.int32()),
            }
        )
        # invalid-only block first: must not consume the sample budget
        ds = ray.data.from_arrow(all_bad).union(
            ray.data.from_arrow(_emb_table(False))
        )
        c = ivf_build_centroids(ds, n_centroids=2)
        assert c.shape == (2, 2)
        only_bad = ray.data.from_arrow(all_bad)
        with pytest.raises(ValueError, match="no valid vectors"):
            ivf_build_centroids(only_bad, n_centroids=2)

    def test_compaction_resume_ignores_partial_tmp(self, tmp_path):
        import os

        import pyarrow.parquet as pq

        from fluent_bit_ray.sinks.compact import compact_parquet_dir

        src = str(tmp_path / "src")
        os.makedirs(src)
        for i in range(3):
            pq.write_table(
                pa.table({"k": pa.array([i], pa.int64())}),
                os.path.join(src, f"p_{i}.parquet"),
            )
        out = str(tmp_path / "out")
        os.makedirs(out)
        # a truncated tmp from a crashed run must not block or corrupt
        with open(os.path.join(out, "bin_deadbeef.parquet.tmp"), "wb") as f:
            f.write(b"partial")
        stats = compact_parquet_dir(src, out, target_bytes=1 << 20)
        assert stats["rows"] == 3
        finals = [f for f in os.listdir(out) if f.endswith(".parquet")]
        assert len(finals) == 1
        assert sorted(pq.read_table(
            os.path.join(out, finals[0]))["k"].to_pylist()) == [0, 1, 2]


@pytest.mark.usefixtures("ray_session")
class TestSoftDedup:
    """SoftDeDup weights: 1/group-size per exact-text group, nulls form
    one group (SQL PARTITION BY parity), singletons weigh 1.0."""

    def test_hand_weights(self):
        from fluent_bit_ray.ops.dedup import soft_dedup_weights

        t = pa.table(
            {
                "doc_id": pa.array(range(7), pa.int64()),
                "text": pa.array(
                    ["a", "a", "a", "b", None, None, ""], pa.string()),
            }
        )
        out = soft_dedup_weights(ray.data.from_arrow(t))
        w = dict(zip(out["doc_id"].to_pylist(), out["weight"].to_pylist()))
        assert w[0] == w[1] == w[2] == pytest.approx(1 / 3)
        assert w[3] == 1.0
        assert w[4] == w[5] == pytest.approx(1 / 2)  # null partition
        assert w[6] == 1.0  # empty string is its own group, not null's
        # mass conservation: group weights sum to one per distinct text
        assert sum(w.values()) == pytest.approx(4.0)
