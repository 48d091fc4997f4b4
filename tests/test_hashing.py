"""The exchange key-hash contract: a logical key value must hash (and
therefore shard) identically no matter which block representation it
arrives in — int64, float64 after a pandas round-trip (one null anywhere
floats the whole column), dictionary-encoded, or with nulls present.
The round-4 adversarial-events sweep caught per-key DUPLICATE aggregate
rows produced by exactly this instability."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fluent_bit_ray._hashing import hash_columns, splitmix64


def _h1(values, typ):
    return hash_columns(pa.table({"k": pa.array(values, typ)}), ["k"])


class TestTypeStability:
    def test_int_vs_floated_int(self):
        # the pandas-poisoned form: int64 column -> float64 via one null
        ints = _h1([1, 2, 3, 7003], pa.int64())
        floats = _h1([1.0, 2.0, 3.0, 7003.0], pa.float64())
        np.testing.assert_array_equal(ints, floats)

    def test_null_is_one_group_everywhere(self):
        a = _h1([None, 5], pa.int64())
        b = _h1([None, 5.0], pa.float64())
        c = _h1([None, "x"], pa.string())
        assert a[0] == b[0] == c[0]          # null sentinel, any type
        assert a[1] == b[1] != a[0]

    def test_null_vs_zero_distinct(self):
        h = _h1([None, 0], pa.int64())
        assert h[0] != h[1]

    def test_narrow_ints_widen(self):
        np.testing.assert_array_equal(
            _h1([1, 250], pa.int32()), _h1([1, 250], pa.int64()))

    def test_dictionary_decodes(self):
        plain = _h1(["a", "bb", None], pa.string())
        enc = pa.table(
            {"k": pa.array(["a", "bb", None]).dictionary_encode()})
        np.testing.assert_array_equal(hash_columns(enc, ["k"]), plain)

    def test_fractional_floats_differ_from_truncation(self):
        h = _h1([2.0, 2.5], pa.float64())
        assert h[0] != h[1]

    def test_timestamp_matches_int64_us(self):
        us = [1_704_067_200_000_000, 1_704_067_260_000_000]
        ts = pa.array(us, pa.timestamp("us"))
        np.testing.assert_array_equal(
            hash_columns(pa.table({"k": ts}), ["k"]), _h1(us, pa.int64()))

    def test_multi_column_order_sensitive(self):
        t = pa.table({"a": pa.array([1, 1], pa.int64()),
                      "b": pa.array([2, 3], pa.int64())})
        h_ab = hash_columns(t, ["a", "b"])
        h_ba = hash_columns(t, ["b", "a"])
        assert h_ab[0] != h_ab[1]
        assert h_ba[0] != h_ba[1]

    def test_negative_zero_and_nan_canonical(self):
        h = _h1([-0.0, 0.0], pa.float64())
        assert h[0] == h[1]

    def test_strings_sliced_offsets(self):
        arr = pa.array(["pad", "a", "bb", "ccc"])
        sl = arr.slice(1, 3)
        np.testing.assert_array_equal(
            hash_columns(pa.table({"k": sl}), ["k"]),
            _h1(["a", "bb", "ccc"], pa.string()))

    def test_distribution_not_degenerate(self):
        h = _h1(list(range(10_000)), pa.int64())
        shards = np.bincount((h % 8).astype(np.int64), minlength=8)
        assert shards.min() > 1000  # roughly uniform


class TestSplitChunkColocation:
    def test_floated_block_colocates_with_int_block(self):
        from fluent_bit_ray.shuffle import _split_chunk

        k = 8
        ints = pa.table({"user": pa.array([12, 7, 12, 99], pa.int64()),
                         "v": pa.array([1, 2, 3, 4], pa.int64())})
        # the same users arriving as a pandas-floated block (held a null)
        floated = pa.table(
            {"user": pa.array([12.0, None, 7.0], pa.float64()),
             "v": pa.array([5, 6, 7], pa.int64())})
        shards_a = _split_chunk(["user"], None, k, ints)
        shards_b = _split_chunk(["user"], None, k, floated)

        def shard_of(shards, user):
            for i, t in enumerate(shards):
                if t is not None and t.num_rows:
                    vals = [u for u in t["user"].to_pylist()
                            if u is not None and int(u) == user]
                    if vals:
                        return i
            return None

        for u in (12, 7):
            assert shard_of(shards_a, u) == shard_of(shards_b, u), u

    def test_splitmix_is_uint64(self):
        out = splitmix64(np.arange(4, dtype=np.uint64))
        assert out.dtype == np.uint64
        assert len(set(out.tolist())) == 4


@pytest.mark.usefixtures("ray_session")
class TestNastyCorpusSmoke:
    """End-to-end pin of the duplicate-row class: a window aggregate over
    events whose blocks mix null and non-null int keys must emit exactly
    one row per (key, bucket)."""

    def test_tumbling_no_duplicate_groups(self):
        import ray.data

        from fluent_bit_ray.ops.windows import tumbling_agg

        n = 500
        t = pa.table({
            "user_id": pa.array(
                [None if i % 97 == 0 else i % 7 for i in range(n)],
                pa.int64()),
            "ts": pa.array(
                [None if i % 101 == 0 else 1_704_067_200_000_000 + i * 1_000_000
                 for i in range(n)], pa.timestamp("us")),
            "value": pa.array(
                [None if i % 89 == 0 else float(i) for i in range(n)],
                pa.float64()),
        })
        ds = ray.data.from_arrow(t).repartition(8)
        out = tumbling_agg(ds, "user_id", "ts", 60, "value").to_pandas()
        groups = out[["user_id", "bucket"]].astype("float64")
        assert not groups.duplicated().any()
