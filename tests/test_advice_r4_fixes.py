"""Pins for the round-4 ADVICE fixes.

1. Pre-epoch (negative event_ns) times clamp to bucket 0 on BOTH the
   engine side (numpy floor div would give -1/-2/... ) and the DuckDB
   oracle side (integer `//` truncates toward zero) — -1 stays reserved
   for NULL event time, so the sentinel can never collide.
2. The WARC fixture / lineage resume caches key on a corpus CONTENT
   fingerprint, so an in-place rebuild at the same path invalidates them.
"""

import os

import duckdb
import numpy as np
import pyarrow as pa

from fluent_bit_ray.sinks.writers import SinkWriteStage
from fluent_bit_ray.pipelines.queries import _corpus_fingerprint

MIN_NS = 60 * 10**9


def _bucket_of(event_ns_values):
    """Run the flagship partial-agg bucket math over a one-sink table."""
    stage = SinkWriteStage([], out_dir=None)
    n = len(event_ns_values)
    t = pa.table(
        {
            "_time": pa.array(event_ns_values, pa.int64()),
            "lang": pa.array(["en"] * n),
            "host": pa.array([f"h{i}" for i in range(n)]),
            "text": pa.array(["x"] * n),
        }
    )
    agg = stage._partial_agg(t, "s")
    out = dict(zip(agg["host"].to_pylist(), agg["bucket"].to_pylist()))
    return [out[f"h{i}"] for i in range(n)]


def test_negative_event_ns_clamps_to_bucket_zero():
    vals = [None, -1, -MIN_NS - 1, -10**18, 0, MIN_NS - 1, MIN_NS, 3 * MIN_NS + 5]
    got = _bucket_of(vals)
    assert got == [-1, 0, 0, 0, 0, 0, 1, 3]


def test_engine_bucket_matches_duckdb_oracle_expression():
    """The exact SQL expression used by the oracles must agree with the
    engine for negative, zero, boundary and positive event_ns."""
    vals = [-1, -MIN_NS, -MIN_NS - 1, 0, 1, MIN_NS - 1, MIN_NS, 7 * MIN_NS]
    got = _bucket_of(vals)
    con = duckdb.connect()
    sql = con.execute(
        "SELECT COALESCE(greatest(v, 0) // 60000000000, -1) FROM "
        "(SELECT unnest(?::BIGINT[]) AS v)",
        [vals],
    ).fetchall()
    assert got == [r[0] for r in sql]
    # and the numpy floor-div the engine uses equals both after the clamp
    np_bucket = np.maximum(np.array(vals, np.int64), 0) // MIN_NS
    assert got == np_bucket.tolist()


def test_null_sentinel_never_collides_with_clamped_bucket():
    # a null time and a pre-epoch time must land in DIFFERENT buckets
    null_b, pre_b = _bucket_of([None, -30 * 10**9])
    assert null_b == -1 and pre_b == 0


def test_corpus_fingerprint_tracks_content(tmp_path):
    d = str(tmp_path)
    f = os.path.join(d, "part0.parquet")
    with open(f, "wb") as fh:
        fh.write(b"aaaa")
    fp1 = _corpus_fingerprint(d)
    assert fp1 == _corpus_fingerprint(d)  # stable
    with open(f, "wb") as fh:
        fh.write(b"bbbbbbbb")  # size change
    fp2 = _corpus_fingerprint(d)
    assert fp2 != fp1
    with open(os.path.join(d, "part1.parquet"), "wb") as fh:
        fh.write(b"cc")  # new shard
    assert _corpus_fingerprint(d) != fp2
