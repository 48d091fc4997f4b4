"""Data-derived exchange sizing (shuffle.py sizing rule).

Round-4 verdict item #1: the fixed 32-shard cap became a parallelism FLOOR
with byte-derived growth. These tests pin the rule's math, the measurement
paths (object-store refs + non-executing Dataset estimate), and — the real
gate — that every exchange-based query stays hash-green when a tiny
FBR_TARGET_SHARD_BYTES forces the over-32-shard topology on sf data.
"""

import os

import duckdb
import hashlib
import pandas as pd
import pyarrow as pa
import pytest

from fluent_bit_ray.shuffle import (
    DEFAULT_TARGET_SHARD_BYTES,
    MAX_SHARDS,
    dataset_size_estimate,
    refs_total_bytes,
    shards_for_bytes,
)


class TestSizingRule:
    def test_floor_when_unknown_or_small(self):
        assert shards_for_bytes(None, 8) == 8
        assert shards_for_bytes(0, 8) == 8
        assert shards_for_bytes(1, 8) == 8
        assert shards_for_bytes(DEFAULT_TARGET_SHARD_BYTES, 8) == 8

    def test_grows_with_bytes(self):
        t = DEFAULT_TARGET_SHARD_BYTES
        assert shards_for_bytes(t + 1, 8) == 8  # ceil = 2 < floor
        assert shards_for_bytes(100 * t, 8) == 100
        # 100 TB of exchanged rows is NOT 32 shards
        assert shards_for_bytes(100 << 40, 32) == min(
            MAX_SHARDS, -(-(100 << 40) // t))

    def test_cap(self):
        assert shards_for_bytes(1 << 60, 8) == MAX_SHARDS

    def test_env_override(self, monkeypatch):
        monkeypatch.setenv("FBR_TARGET_SHARD_BYTES", "1024")
        assert shards_for_bytes(1024 * 50, 8) == 50
        monkeypatch.setenv("FBR_TARGET_SHARD_BYTES", "junk")
        assert shards_for_bytes(DEFAULT_TARGET_SHARD_BYTES * 3, 2) == 3


class TestMeasurement:
    def test_refs_total_bytes(self, ray_session):
        import ray

        t = pa.table({"a": pa.array(range(10_000), pa.int64())})
        refs = [ray.put(t), ray.put(t)]
        total = refs_total_bytes(refs)
        assert total is not None and total > 2 * 10_000 * 8 * 0.9

    def test_dataset_estimate_never_executes(self, ray_session, sf_dir):
        import ray

        ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"))
        root = dataset_size_estimate(ds)
        assert root is not None and root > 0
        # a transformed dataset falls back to the nearest sized ancestor
        # (the read) without triggering execution
        mapped = ds.select_columns(["user_id", "ts"]).map_batches(
            lambda b: b, batch_format="pyarrow")
        est = dataset_size_estimate(mapped)
        assert est == root
        # still lazy: no execution snapshot was produced by the estimate
        assert "snapshot_operator=None" in str(mapped._plan)


def _value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return hashlib.sha256(
        df.to_csv(index=False, float_format="%.6f").encode()).hexdigest()


def test_kilo_shard_exchange_equals_small(ray_session, sf_dir):
    """num_returns stress: a 1200-shard exchange (the topology a ~150 GB
    exchanged payload would demand under the default target) must return
    exactly the 8-shard result."""
    import ray

    from fluent_bit_ray.shuffle import hash_reduce

    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id"])

    def part(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id"]).aggregate([([], "count_all")])
        return g.rename_columns(["user_id", "n"])

    refs = ds.map_batches(part, batch_format="pyarrow").to_arrow_refs()
    a = hash_reduce(refs, ["user_id"], ["n"], num_shards=8)
    b = hash_reduce(refs, ["user_id"], ["n"], num_shards=1200)
    assert a.sort_by([("user_id", "ascending")]).equals(
        b.sort_by([("user_id", "ascending")]))


# the exchange-based queries the round-3 verdict names as the gate;
# session_stats added in r5 when the keyed window family moved from
# groupby("_shard").map_groups onto shuffle.hash_exchange
_FORCED_QUERIES = ["sliding_window", "asof_join", "percentiles",
                   "minhash_invariant", "tumbling_window", "session_stats"]


@pytest.mark.parametrize("name", _FORCED_QUERIES)
def test_forced_many_shards_hash_green(name, ray_session, sf_dir,
                                       monkeypatch):
    """With a 2 KiB shard target the sf corpus demands hundreds of shards
    (>32 — the old cap's regime); results must hash-match the oracle."""
    monkeypatch.setenv("FBR_TARGET_SHARD_BYTES", "2048")
    import __ray_entry__ as entrymod

    got = entrymod.queries()[name](sf_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    if hasattr(got, "to_pandas"):  # Dataset -> Table -> DataFrame
        got = got.to_pandas()

    sql = entrymod.oracle_sql()[name]
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    exp = con.execute(sql).fetchdf()
    con.close()

    assert sorted(got.columns) == sorted(exp.columns)
    assert len(got) == len(exp)
    assert _value_hash(got) == _value_hash(exp)
