"""Regression tests for the round-2 self-review findings (heterogeneous
record assembly, null window keys, msgpack str-mode/32-bit widths,
iso8601 fraction edges)."""

import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fluent_bit_ray.functions.records import records_to_table
from fluent_bit_ray.sources.msgpack_io import (
    iter_forward_frames,
    msgpack_pack,
    msgpack_unpack,
    pack_event_time,
)


class TestRecordsToTable:
    def test_later_only_keys_survive(self):
        t = records_to_table([{"a": 1}, {"a": 2, "b": "x"}])
        assert t.column_names == ["a", "b"]
        assert t["b"].to_pylist() == [None, "x"]

    def test_non_string_keys_normalized(self):
        t = records_to_table([{1: "x", "s": 2}])
        assert t.column_names == ["1", "s"]
        assert t["1"].to_pylist() == ["x"]


class TestKubernetesBatchSchema:
    def test_first_row_unmatched_keeps_kubernetes_column(self):
        from fluent_bit_ray.stages.kubernetes import KubernetesFilter

        tag = ("kube.var.log.containers.kubernetes.mypod_default_app-"
               + "a" * 64 + ".log")
        meta = {"mypod": {"metadata": {"name": "mypod", "uid": "u1"},
                          "spec": {"nodeName": "n1"}}}
        f = KubernetesFilter(meta, registry=None)
        t = pa.table(
            {
                "log": pa.array(['{"k":1}\n', '{"k":2}\n']),
                "_tag": pa.array(["nomatch.tag", tag]),
            }
        )
        out = f.process_batch(t)
        assert "kubernetes" in out.column_names
        rows = out.to_pylist()
        assert rows[0]["kubernetes"] is None  # unmatched: untouched
        assert rows[1]["kubernetes"]["pod_id"] == "u1"
        assert rows[1]["k"] == 2  # Merge_Log keys survive too


class TestWindowNullKeys:
    def _ds(self, ray_session=None):
        import ray.data

        df = pd.DataFrame(
            {
                "user_id": pd.array([1, 1, None, None, 2], dtype="Int64"),
                "ts": pd.to_datetime(
                    ["2020-01-01 00:00:00", "2020-01-01 00:01:00",
                     "2020-01-01 00:00:30", "2020-01-01 00:01:30",
                     "2020-01-01 00:00:00"]
                ),
                "event_id": [1, 2, 3, 4, 5],
                "value": [1.0, 2.0, 3.0, 4.0, 5.0],
            }
        )
        return ray.data.from_pandas(df)

    def test_sliding_count_null_keys(self, ray_session):
        from fluent_bit_ray.ops.windows import sliding_count

        out = (
            sliding_count(self._ds(), "user_id", "ts", 300)
            .to_pandas().sort_values("event_id")
        )
        # all 5 rows survive; null-key rows window together
        assert out["window_count"].tolist() == [1, 2, 1, 2, 1]

    def test_tumbling_null_keys_not_dropped(self, ray_session):
        from fluent_bit_ray.ops.windows import tumbling_agg

        out = tumbling_agg(self._ds(), "user_id", "ts", 600, "value").to_pandas()
        assert int(out["records"].sum()) == 5  # nothing silently dropped

    def test_session_null_keys_one_session(self, ray_session):
        from fluent_bit_ray.ops.windows import session_windows

        out = session_windows(self._ds(), "user_id", "ts", 600).to_pandas()
        assert int(out["events"].sum()) == 5
        null_rows = out[out["user_id"].isna()]
        assert len(null_rows) == 1 and null_rows["events"].iloc[0] == 2


class TestMsgpackEdges:
    def test_str_framed_packed_forward_roundtrips(self):
        # PackedForward payload framed as msgpack STR (fluentd allows str
        # or bin): inner bytes are not valid UTF-8 and must survive
        entries = b"".join(
            msgpack_pack([pack_event_time(i * 10**9), {"n": i}])
            for i in (1, 2)
        )
        payload = entries.decode("utf-8", "surrogateescape")
        frame = msgpack_pack(["t.pk", payload])
        got = list(iter_forward_frames(frame))
        assert got == [("t.pk", [(10**9, {"n": 1}), (2 * 10**9, {"n": 2})])]

    def test_32bit_widths_roundtrip(self):
        big_str = "x" * 70000
        big_bytes = b"y" * 70000
        big_list = list(range(70000))
        big_map = {f"k{i}": i for i in range(70000)}
        for v in (big_str, big_bytes, big_list, big_map):
            enc = msgpack_pack(v)
            out, used = msgpack_unpack(enc)
            assert used == len(enc) and out == v

    def test_invalid_utf8_str_lossless(self):
        raw = b"\xa3\x92\xd7\x00"  # fixstr(3) of invalid-utf8 bytes
        s, _ = msgpack_unpack(raw)
        assert s.encode("utf-8", "surrogateescape") == b"\x92\xd7\x00"


class TestHttpIsoEdges:
    def test_fraction_never_overflows_to_seven_digits(self):
        from fluent_bit_ray.sinks.writers import format_http

        # ns value whose float-seconds representation rounds up to the
        # next whole second
        ns = 2_300_000 * 10**9 + 999_999_999
        t = pa.table({"_time": pa.array([ns], pa.int64()),
                      "n": pa.array([1], pa.int64())})
        out = format_http(t, ["n"], date_format="iso8601")
        assert '.999999Z' in out and '.1000000Z' not in out

    def test_pre_epoch_time_valid(self):
        from fluent_bit_ray.sinks.writers import format_http

        t = pa.table({"_time": pa.array([-500_000_000], pa.int64()),
                      "n": pa.array([1], pa.int64())})
        out = format_http(t, ["n"], date_format="iso8601")
        assert '"date":"1969-12-31T23:59:59.500000Z"' in out


class TestSecondReviewFixes:
    def test_invalid_utf8_record_values_reach_arrow_lossily(self):
        from fluent_bit_ray.sources.msgpack_io import frames_to_table, msgpack_pack

        # fixstr of invalid-utf8 bytes inside a record value AND the tag
        bad = b"\xa3\x92\xd7\x00"
        frame = (
            b"\x92" + bad + b"\x91\x92\x01\x81\xa3log" + bad
        )  # [tag, [[1, {"log": <bad>}]]]
        t = frames_to_table(frame)
        assert t.num_rows == 1  # no crash; surrogates degraded to U+FFFD
        assert "�" in t["log"].to_pylist()[0]
        assert "�" in t["_tag"].to_pylist()[0]

    def test_udf_filter_batch_key_union(self):
        import pyarrow as pa

        from fluent_bit_ray.stages.throttle import UdfFilter

        def add_key(rec):
            rec["tagged"] = True
            return rec

        f = UdfFilter(row_fn=add_key)
        t = pa.table({"msg": pa.array(["a", "b"])})
        mask = pa.array([False, True])  # first row untouched
        out = f.process_batch(t, mask=mask)
        assert out["tagged"].to_pylist() == [None, True]

    def test_lua_script_routing(self, tmp_path):
        # round 5 supersedes the old lupa-pointing error: a .lua Script
        # always routes to the REAL Lua filter (stages/lua.py), executed
        # by lupa when importable and by the bundled minilua subset
        # interpreter (functions/minilua.py) otherwise
        from fluent_bit_ray.pipelines.config import build_filter
        from fluent_bit_ray.parsers import DEFAULT_REGISTRY
        from fluent_bit_ray.stages.lua import LuaFilter

        script = tmp_path / "functions.lua"
        script.write_text(
            "function process(tag, ts, r) return 0, 0, 0 end")
        sec = {"name": ["lua"], "script": [str(script)],
               "call": ["process"]}
        assert isinstance(build_filter(sec, DEFAULT_REGISTRY), LuaFilter)

    def test_ext16_ext32_roundtrip(self):
        from fluent_bit_ray.sources.msgpack_io import (
            ExtType, msgpack_pack, msgpack_unpack,
        )

        for n in (300, 70000):
            e = ExtType(5, b"z" * n)
            enc = msgpack_pack(e)
            out, used = msgpack_unpack(enc)
            assert used == len(enc) and out == e


class TestThirdReviewFixes:
    def test_journal_underscore_fields_reach_sinks(self, ray_session, tmp_path):
        from fluent_bit_ray.sinks.writers import SinkWriteStage, SinkSpec
        import pyarrow as pa

        t = pa.table(
            {
                "_tag": pa.array(["journal.nginx.service"]),
                "_time": pa.array([10**9], pa.int64()),
                "MESSAGE": pa.array(["hi"]),
                "_SYSTEMD_UNIT": pa.array(["nginx.service"]),
                "_PID": pa.array(["42"]),
            }
        )
        stage = SinkWriteStage([SinkSpec("s", ("*",), "json")], str(tmp_path))
        stage(t)
        import glob

        body = open(glob.glob(str(tmp_path / "s" / "*.jsonl"))[0]).read()
        # journald trusted metadata must reach the sink (in_systemd output)
        assert '"_SYSTEMD_UNIT":"nginx.service"' in body
        assert '"_PID":"42"' in body

    def test_forward_sink_emits_msgpack_maps(self):
        import pyarrow as pa

        from fluent_bit_ray.sinks.writers import format_forward
        from fluent_bit_ray.sources.msgpack_io import iter_forward_frames

        t = pa.table(
            {
                "_tag": pa.array(["a.b"]),
                "_time": pa.array([10**9], pa.int64()),
                "labels": pa.array([{"k": "v"}], pa.map_(pa.string(), pa.string())),
            }
        )
        payload = format_forward(t, ["labels"])
        [(tag, entries)] = list(iter_forward_frames(payload))
        assert entries[0][1]["labels"] == {"k": "v"}  # a MAP, not [["k","v"]]

    def test_interval_validation(self):
        import pytest as _pytest

        from fluent_bit_ray.sources.host_metrics import cpu_sample, disk_sample

        with _pytest.raises(ValueError, match="Interval_Sec"):
            cpu_sample(0)
        with _pytest.raises(ValueError, match="Interval_Sec"):
            disk_sample(-1)


class TestFourthReviewFixes:
    """Null-timestamp NULLS LAST parity for the window/lag family (the
    oracle SQL orders `BY ts, id` — DuckDB default places NULL ts LAST,
    NaT's raw int64 sentinel placed it first), plus empty/NaN/overflow
    hardening surfaced by the round-3 range review."""

    def _events(self):
        return pd.DataFrame(
            {
                "user_id": [1, 1, 1, 2, 2],
                "event_id": [1, 2, 3, 4, 5],
                "event_type": ["A", "B", "A", "B", "C"],
                "ts": pd.to_datetime(
                    [None, "2024-01-01 00:00:02", "2024-01-01 00:00:03",
                     "2024-01-01 00:00:01", None]),
                "value": [10.0, 20.0, 30.0, 5.0, None],
            }
        )

    def _duck(self, sql):
        import duckdb

        # fresh connection + explicit register: a global relation named
        # "events" registered by any other test would shadow the frame scan
        con = duckdb.connect()
        con.register("events", self._events())
        return con.sql(sql).df()

    def test_moving_avg_null_ts_sorts_last(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.windows import moving_avg

        got = (moving_avg(ray.data.from_pandas(self._events()), window=4,
                          num_shards=2).to_pandas()
               .sort_values("event_id").reset_index(drop=True))
        want = self._duck(
            "SELECT user_id, event_id, avg(value) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) "
            "AS mov_avg FROM events ORDER BY event_id")
        assert got["mov_avg"].round(6).fillna(-1).tolist() == \
            want["mov_avg"].round(6).fillna(-1).tolist()

    def test_running_totals_null_ts(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.windows import running_totals

        got = (running_totals(ray.data.from_pandas(self._events()),
                              num_shards=2).to_pandas()
               .sort_values("event_id").reset_index(drop=True))
        want = self._duck(
            "SELECT user_id, event_id, epoch_us(ts) AS ts_us, "
            "count(*) OVER w AS cum_n, sum(value) OVER w AS cum_sum "
            "FROM events WINDOW w AS (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) "
            "ORDER BY event_id")
        assert got["cum_n"].tolist() == want["cum_n"].tolist()
        assert got["cum_sum"].fillna(-1).tolist() == \
            want["cum_sum"].fillna(-1).tolist()
        # epoch_us(NULL) IS NULL, not the NaT sentinel
        assert [None if pd.isna(x) else int(x) for x in got["ts_us"]] == [
            None if pd.isna(x) else int(x) for x in want["ts_us"]]

    def test_lag_deltas_null_ts(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.windows import lag_deltas

        got = (lag_deltas(ray.data.from_pandas(self._events()),
                          num_shards=2).to_pandas()
               .sort_values("event_id").reset_index(drop=True))
        want = self._duck(
            "SELECT user_id, event_id, lag(value) OVER w AS prev_value, "
            "epoch(ts) - lag(epoch(ts)) OVER w AS gap_sec "
            "FROM events WINDOW w AS (PARTITION BY user_id "
            "ORDER BY ts, event_id) ORDER BY event_id")
        assert got["prev_value"].fillna(-1).tolist() == \
            want["prev_value"].fillna(-1).tolist()
        assert got["gap_sec"].fillna(-1).round(6).tolist() == \
            want["gap_sec"].fillna(-1).round(6).tolist()

    def test_transitions_null_ts(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.windows import transition_counts

        got = transition_counts(ray.data.from_pandas(self._events()),
                                num_shards=2).to_pandas()
        pairs = {(r.from_type, r.to_type): r.n for r in got.itertuples()}
        want = self._duck(
            "WITH o AS (SELECT user_id, event_type, lag(event_type) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS prev "
            "FROM events) SELECT prev AS from_type, event_type AS to_type, "
            "count(*) AS n FROM o WHERE prev IS NOT NULL "
            "GROUP BY prev, event_type")
        wpairs = {(r.from_type, r.to_type): r.n for r in want.itertuples()}
        assert pairs == wpairs

    def test_collect_per_key_null_ts(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.windows import collect_per_key

        got = (collect_per_key(ray.data.from_pandas(self._events()),
                               num_shards=2).to_pandas()
               .sort_values("user_id").reset_index(drop=True))
        want = self._duck(
            "SELECT user_id, string_agg(event_type, '>' ORDER BY ts, "
            "event_id) AS seq FROM events GROUP BY user_id "
            "ORDER BY user_id")
        assert got["seq"].tolist() == want["seq"].tolist()

    def test_mad_outliers_empty_input(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.stats import mad_outliers

        empty = pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                              "value": pd.Series([], dtype="float64")})
        out = mad_outliers(ray.data.from_pandas(empty), "user_id", "value")
        t = out if isinstance(out, pa.Table) else pa.Table.from_pandas(
            out.to_pandas())
        assert t.num_rows == 0
        for c in ("med", "mad", "is_outlier"):
            assert c in t.column_names

    def test_histogram_ignores_nan(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.stats import histogram_fixed_bins

        df = pd.DataFrame({"v": [1.0, np.nan, 2.0, None, 3.0]})
        out = histogram_fixed_bins(
            ray.data.from_pandas(df), "v", bins=4).to_pandas()
        # NaN neither poisons the min/max pass nor lands in a bucket
        assert int(out["cnt"].sum()) == 3
        assert out["bucket"].between(0, 3).all()

    def test_knuth_hash_sql_hugeint_safe(self):
        import duckdb

        from fluent_bit_ray.ops.sample import knuth_hash, knuth_hash_sql

        big = np.array([3474748173, 4294967295, 7, 0], dtype=np.int64)
        want = knuth_hash(big).tolist()
        got = [r[0] for r in duckdb.sql(
            "SELECT " + knuth_hash_sql("id") + " FROM (SELECT "
            "unnest([3474748173, 4294967295, 7, 0]) AS id)").fetchall()]
        assert got == want


class TestEwmaCusum:
    """ewma (recursive-CTE-only recurrence) and cusum_drift (prefix-min
    identity) — engine vs direct per-key reference recurrences, plus the
    repartition-invariance every exchange op gets."""

    def _events(self, n=300, seed=11):
        rng = np.random.default_rng(seed)
        df = pd.DataFrame({
            "user_id": rng.integers(0, 12, n),
            "event_id": np.arange(1, n + 1),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
            "value": np.round(
                np.where(rng.random(n) < 0.1, np.nan, rng.random(n) * 300),
                2),
        })
        df.loc[3, "ts"] = pd.NaT
        return df

    def _ref_frames(self, df):
        df = df[df["value"].notna()].copy()
        ns = df["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
        ns = np.where(ns == np.iinfo(np.int64).min,
                      np.iinfo(np.int64).max, ns)
        df["_k"] = ns
        return df.sort_values(["user_id", "_k", "event_id"])

    def test_ewma_matches_reference_recurrence(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.windows import ewma

        df = self._events()
        got = (ewma(ray.data.from_pandas(df).repartition(5), num_shards=3)
               .to_pandas().sort_values("event_id").reset_index(drop=True))
        ref = {}
        for _, g in self._ref_frames(df).groupby("user_id"):
            y = None
            for eid, v in zip(g["event_id"], g["value"]):
                y = v if y is None else 0.5 * v + 0.5 * y
                ref[eid] = y
        assert len(got) == len(ref)
        for eid, y in zip(got["event_id"], got["ewma"]):
            assert abs(ref[eid] - y) < 1e-9

    def test_cusum_matches_reference_recurrence(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.windows import cusum_drift

        df = self._events()
        got = (cusum_drift(ray.data.from_pandas(df).repartition(4),
                           num_shards=3)
               .to_pandas().sort_values("event_id").reset_index(drop=True))
        ref = {}
        for _, g in self._ref_frames(df).groupby("user_id"):
            s, base = 0.0, None
            for eid, v in zip(g["event_id"], g["value"]):
                base = v if base is None else base
                s = max(0.0, s + (v - base))
                ref[eid] = s
        assert len(got) == len(ref)
        drifts = 0
        for eid, s, f in zip(got["event_id"], got["cusum"], got["is_drift"]):
            assert abs(ref[eid] - s) < 1e-9
            assert f == (s > 150.005)
            drifts += bool(f)
        assert 0 < drifts < len(got)  # both classes present

    def test_empty_and_all_null(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.windows import cusum_drift, ewma

        df = pd.DataFrame({
            "user_id": [1, 2], "event_id": [1, 2],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]),
            "value": [np.nan, np.nan]})
        assert ewma(ray.data.from_pandas(df)).to_pandas().empty
        assert cusum_drift(ray.data.from_pandas(df)).to_pandas().empty


class TestSessionize:
    def test_matches_duckdb_with_null_ts(self, ray_session):
        import duckdb
        import ray.data

        from fluent_bit_ray.ops.windows import sessionize

        events = pd.DataFrame({
            "user_id": [1, 1, 1, 1, 2, 2],
            "event_id": [1, 2, 3, 4, 5, 6],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:10:00",
                 "2024-01-01 02:00:00", None,
                 "2024-01-01 00:00:00", None]),
        })
        got = (sessionize(ray.data.from_pandas(events).repartition(3),
                          gap_sec=1800, num_shards=2)
               .to_pandas().sort_values("event_id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("events", events)
        want = con.sql(
            "WITH o AS (SELECT user_id, event_id, ts, "
            "CASE WHEN lag(epoch_us(ts)) OVER w IS NULL "
            "OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 "
            "THEN 1 ELSE 0 END AS brk FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
            "SELECT user_id, event_id, CAST(sum(brk) OVER (PARTITION BY "
            "user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) "
            "AS BIGINT) AS session_seq FROM o ORDER BY event_id").df()
        assert got["session_seq"].tolist() == want["session_seq"].tolist()
        # semantic spot-check: 10-min gap same session, 2h gap breaks,
        # null-ts row itself does NOT break (SQL NULL > thr is not true)
        byid = dict(zip(got["event_id"], got["session_seq"]))
        assert (byid[1], byid[2], byid[3]) == (1, 1, 2)
        assert byid[4] == 2  # null ts after valid ts: same session
        assert byid[6] == 1  # user 2's null-ts row joins session 1


class TestRankDist:
    def test_matches_duckdb_with_ties_and_single_row_key(self, ray_session):
        import duckdb
        import ray.data

        from fluent_bit_ray.ops.windows import rank_dist

        events = pd.DataFrame({
            "event_type": ["a", "a", "a", "a", "b", "c"],
            "event_id": [1, 2, 3, 4, 5, 6],
            "value": [10.0, 10.0, 5.0, None, 7.0, 7.0],
        })
        got = (rank_dist(ray.data.from_pandas(events).repartition(2),
                         "event_type", "value", num_shards=2)
               .to_pandas().sort_values("event_id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("events", events)
        want = con.sql(
            "SELECT event_type, event_id, value, "
            "percent_rank() OVER w AS pct_rank, cume_dist() OVER w AS cume "
            "FROM events WHERE value IS NOT NULL "
            "WINDOW w AS (PARTITION BY event_type ORDER BY value DESC) "
            "ORDER BY event_id").df()
        assert got["pct_rank"].round(9).tolist() == \
            want["pct_rank"].round(9).tolist()
        assert got["cume"].round(9).tolist() == want["cume"].round(9).tolist()
        # tied top pair: pct 0, cume 2/3; single-row keys: pct 0, cume 1
        byid = {r.event_id: (r.pct_rank, r.cume) for r in got.itertuples()}
        assert byid[1] == (0.0, 2 / 3) and byid[2] == (0.0, 2 / 3)
        assert byid[3] == (1.0, 1.0)
        assert byid[5] == (0.0, 1.0) and byid[6] == (0.0, 1.0)


class TestLeadDeltas:
    def test_matches_duckdb_with_null_ts(self, ray_session):
        import duckdb
        import ray.data

        from fluent_bit_ray.ops.windows import lead_deltas

        events = pd.DataFrame({
            "user_id": [1, 1, 1, 2],
            "event_id": [1, 2, 3, 4],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:00:05", None,
                 "2024-01-02 00:00:00"]),
            "value": [10.0, 20.0, 30.0, None],
        })
        got = (lead_deltas(ray.data.from_pandas(events), num_shards=2)
               .to_pandas().sort_values("event_id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("events", events)
        want = con.sql(
            "SELECT user_id, event_id, lead(value) OVER w AS next_value, "
            "lead(epoch(ts)) OVER w - epoch(ts) AS gap_sec "
            "FROM events WINDOW w AS (PARTITION BY user_id "
            "ORDER BY ts, event_id) ORDER BY event_id").df()
        assert got["next_value"].fillna(-1).tolist() == \
            want["next_value"].fillna(-1).tolist()
        assert got["gap_sec"].fillna(-1).round(6).tolist() == \
            want["gap_sec"].fillna(-1).round(6).tolist()
        # the null-ts row sorts last: row 2's next is row 3 (gap NULL),
        # row 3 is the key's last; user 2's single row has no lead
        byid = {r.event_id: (r.next_value, r.gap_sec)
                for r in got.itertuples()}
        assert byid[1] == (20.0, 5.0)
        assert byid[2][0] == 30.0 and pd.isna(byid[2][1])
        assert pd.isna(byid[3][0]) and pd.isna(byid[4][0])
