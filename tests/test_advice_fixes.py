"""Regression tests for the round-1 ADVICE findings.

Covers: strptime-style range rejection, reference-faithful time-key
retention (json keeps on failed lookup, regex drops even with Time_Keep),
RANGE-semantics sliding windows with timestamp ties, NAT-sentinel handling
in the sink time path, and the throttle timeless-bucket sentinel.
"""

import numpy as np
import pyarrow as pa

from fluent_bit_ray.functions.timeparse import TimeFormat, parse_time_str
from fluent_bit_ray.parsers.core import NAT, Parser
from fluent_bit_ray.sinks.writers import _times_sec
from fluent_bit_ray.stages.throttle import TIMELESS_BUCKET, ThrottleFilter


class TestTimeRangeChecks:
    def test_out_of_range_rejected(self):
        tf = TimeFormat("%Y-%m-%d %H:%M:%S")
        # glibc strptime rejects these; they must NOT normalize
        assert parse_time_str("2018-13-01 00:00:00", tf) is None  # month 13
        assert parse_time_str("2018-00-01 00:00:00", tf) is None  # month 0
        assert parse_time_str("2018-01-00 00:00:00", tf) is None  # day 0
        assert parse_time_str("2018-01-32 00:00:00", tf) is None  # day 32
        assert parse_time_str("2018-01-01 99:00:00", tf) is None  # hour 99
        assert parse_time_str("2018-01-01 00:79:00", tf) is None  # minute 79
        assert parse_time_str("2018-01-01 00:00:79", tf) is None  # second 79

    def test_leap_second_and_bounds_accepted(self):
        tf = TimeFormat("%Y-%m-%d %H:%M:%S")
        assert parse_time_str("2018-12-31 23:59:60", tf) is not None  # leap sec
        assert parse_time_str("2018-01-01 00:00:00", tf) is not None
        assert parse_time_str("2018-12-31 23:59:59", tf) is not None


class TestTimeKeyRetention:
    def _json_parser(self, keep=False):
        return Parser(
            name="p", fmt="json", fields=["time", "msg"],
            time_format="%Y-%m-%dT%H:%M:%S", time_keep=keep,
        )

    def test_json_failed_lookup_keeps_key_row(self):
        ts, rec = self._json_parser().parse_row('{"time":"not-a-time","msg":"x"}')
        assert ts is None
        assert rec == {"time": "not-a-time", "msg": "x"}

    def test_json_success_removes_key_row(self):
        ts, rec = self._json_parser().parse_row(
            '{"time":"2018-02-21T17:26:53","msg":"x"}'
        )
        assert ts == 1519234013 * 10**9
        assert rec == {"msg": "x"}

    def test_json_nonstring_time_kept_row(self):
        ts, rec = self._json_parser().parse_row('{"time":12345,"msg":"x"}')
        assert ts is None
        assert rec == {"time": 12345, "msg": "x"}

    def test_json_batch_matches_row(self):
        p = self._json_parser()
        vals = [
            '{"time":"not-a-time","msg":"a"}',
            '{"time":"2018-02-21T17:26:53","msg":"b"}',
            '{"time":999,"msg":"c"}',
        ]
        out = p.parse_batch(vals)
        assert out["time"] == ["not-a-time", None, 999]
        assert list(out["_time"]) == [NAT, 1519234013 * 10**9, NAT]

    def test_regex_failed_lookup_drops_key_even_with_keep(self):
        # cb_results early-returns on failed lookup BEFORE the Time_Keep check
        p = Parser(
            name="r", fmt="regex",
            regex=r"^(?<time>\S+) (?<msg>.*)$",
            time_format="%Y-%m-%dT%H:%M:%S", time_keep=True,
        )
        ts, rec = p.parse_row("bogus hello")
        assert ts is None
        assert rec == {"msg": "hello"}
        out = p.parse_batch(["bogus hello", "2018-02-21T17:26:53 hi"])
        assert out["time"] == [None, "2018-02-21T17:26:53"]
        msg = out["msg"]
        msg = msg.to_pylist() if hasattr(msg, "to_pylist") else msg
        assert msg == ["hello", "hi"]


class TestSlidingWindowTies:
    def test_equal_ts_peers_counted(self, ray_session):
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.windows import sliding_count

        df = pd.DataFrame(
            {
                "user_id": [1, 1, 1, 1],
                "ts": pd.to_datetime(
                    ["2020-01-01 00:00:00", "2020-01-01 00:00:00",
                     "2020-01-01 00:10:00", "2020-01-01 00:10:00"]
                ),
                "event_id": [1, 2, 3, 4],
            }
        )
        out = (
            sliding_count(ray.data.from_pandas(df), "user_id", "ts", 300)
            .to_pandas()
            .sort_values("event_id")
        )
        # RANGE BETWEEN ... CURRENT ROW includes equal-ts peers: 2,2 not 1,2
        assert out["window_count"].tolist() == [2, 2, 2, 2]


class TestSinkNatHandling:
    def test_nat_sentinel_treated_as_no_time(self):
        t = pa.table({"_time": pa.array([NAT, 10**9], pa.int64())})
        assert _times_sec(t).tolist() == [0.0, 1.0]

    def test_null_treated_as_no_time(self):
        t = pa.table({"_time": pa.array([None, 2 * 10**9], pa.int64())})
        assert _times_sec(t).tolist() == [0.0, 2.0]


class TestThrottleSentinel:
    def test_pre_epoch_not_merged_with_timeless(self):
        thr = ThrottleFilter(rate=1, window=1, interval_sec=1)
        assert thr.bucket_of(-1) == -1  # genuine pre-epoch ts keeps bucket -1
        assert thr.bucket_of(None) == TIMELESS_BUCKET
        assert thr.bucket_of(NAT) == TIMELESS_BUCKET
        assert TIMELESS_BUCKET != -1

    def test_precap_bounds_buckets_without_changing_result(self):
        thr = ThrottleFilter(rate=2, window=1, interval_sec=1, tiebreaker="id")
        t = pa.table(
            {
                "_time": pa.array(
                    [5 * 10**8] * 6 + [15 * 10**8] * 3, pa.int64()
                ),
                "id": pa.array(list(range(6)) + [10, 11, 12], pa.int64()),
            }
        )
        t = thr.add_bucket_column(t)
        capped = thr.precap_batch(t)
        # at most cap=2 rows survive per bucket, and they are the first 2
        # by (bucket, _time, id)
        assert capped.num_rows == 4
        assert sorted(capped["id"].to_pylist()) == [0, 1, 10, 11]


class TestSinkRetry:
    def test_transient_errors_retried_then_succeed(self):
        from fluent_bit_ray.sinks.retry import RetryPolicy

        calls = {"n": 0}
        waits = []

        def flaky():
            calls["n"] += 1
            if calls["n"] < 3:
                raise OSError("transient")
            return "ok"

        p = RetryPolicy(retry_limit=3)
        assert p.run(flaky, token="t", sleep=waits.append) == "ok"
        assert calls["n"] == 3 and len(waits) == 2
        assert all(0 <= w <= 2.0 for w in waits)

    def test_exhaustion_reraises(self):
        import pytest as _pytest

        from fluent_bit_ray.sinks.retry import RetryPolicy

        def always():
            raise OSError("down")

        with _pytest.raises(OSError):
            RetryPolicy(retry_limit=2).run(always, sleep=lambda s: None)

    def test_backoff_deterministic_and_capped(self):
        from fluent_bit_ray.sinks.retry import backoff_full_jitter

        a = [backoff_full_jitter(n, "tok") for n in range(8)]
        b = [backoff_full_jitter(n, "tok") for n in range(8)]
        assert a == b  # deterministic across runs
        assert all(0 <= x <= 2.0 for x in a)  # capped
