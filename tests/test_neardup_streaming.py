"""Round-4 verdict item #4: the blocked embedding near-dup path streams.

Pins: (a) shard_output_dir routes every task's pairs to its own parquet
shard and returns None — nothing pair-shaped lands on the driver; (b) the
sharded result is IDENTICAL to the driver-side table; (c) the block-count
gate points loose callers at the IVF path."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fluent_bit_ray.ops.dedup import embedding_neardup_pairs_blocked


def _vec_ds(n: int, n_blocks: int, seed: int = 11):
    import ray

    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 8))
    # plant near-dup pairs: clone every 10th vector with tiny noise
    X[1::10] = X[::10][: len(X[1::10])] + rng.normal(
        scale=1e-5, size=(len(X[1::10]), 8))
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(X.tolist(), pa.list_(pa.float32())),
    })
    return ray.data.from_arrow(t).repartition(n_blocks)


class TestStreamingBlockedPairs:
    def test_sharded_output_matches_driver_table(self, ray_session,
                                                 tmp_path):
        ds = _vec_ds(300, n_blocks=6)
        direct = embedding_neardup_pairs_blocked(
            ds, threshold=0.99).to_pandas()
        out_dir = str(tmp_path / "pairs")
        ret = embedding_neardup_pairs_blocked(
            ds, threshold=0.99, shard_output_dir=out_dir, max_in_flight=4)
        assert ret is None  # nothing pair-shaped returned to the driver
        files = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
        assert files
        sharded = pa.concat_tables(
            [pq.read_table(f) for f in files]).to_pandas()
        key = ["id_a", "id_b"]
        assert (
            sorted(map(tuple, direct[key].to_numpy().tolist()))
            == sorted(map(tuple, sharded[key].to_numpy().tolist()))
        )
        assert len(direct) >= 25  # the planted clones were found

    def test_block_gate_points_at_scale_paths(self, ray_session):
        ds = _vec_ds(64, n_blocks=8)
        with pytest.raises(ValueError, match="ivf|shard_output_dir"):
            embedding_neardup_pairs_blocked(ds, max_blocks=4)

    def test_bounded_window_still_exact(self, ray_session):
        # a 1-deep in-flight window serializes the tasks; results must
        # not depend on completion order
        ds = _vec_ds(200, n_blocks=5, seed=3)
        a = embedding_neardup_pairs_blocked(
            ds, threshold=0.99, max_in_flight=1).to_pandas()
        b = embedding_neardup_pairs_blocked(
            ds, threshold=0.99, max_in_flight=64).to_pandas()
        key = ["id_a", "id_b"]
        assert sorted(map(tuple, a[key].to_numpy().tolist())) == sorted(
            map(tuple, b[key].to_numpy().tolist()))
