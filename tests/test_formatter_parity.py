"""Vectorized-formatter parity: every Arrow-vectorized sink formatter must
stay byte-identical to the historical per-row reference implementation
(kept here as the test oracle, mirroring the pre-vectorization code).

These cover the formatters vectorized in round 3 — influxdb line protocol,
kafka/splunk/http mp-json bodies, and the json_stream/json_lines bracket
transform — on a deterministic mixed-type table with nulls, escapables,
overrides, and empty inputs.
"""

from __future__ import annotations

import datetime

import numpy as np
import pyarrow as pa

from fluent_bit_ray.functions.escape import flb_json_escape
from fluent_bit_ray.functions.mp_json import mp_json_value
from fluent_bit_ray.sinks import writers


def mixed_table(n: int = 3000) -> pa.Table:
    return pa.table(
        {
            "_tag": pa.array(["cpu.0" if i % 2 else None for i in range(n)]),
            "_time": pa.array(
                np.arange(n, dtype=np.int64) * 10**9 + 123456789
            ),
            "msg": pa.array(
                [f'm,{{}}[]"\\{i}\u00e9' if i % 5 else None for i in range(n)]
            ),
            "lvl": pa.array([i % 8 if i % 3 else None for i in range(n)]),
            "ratio": pa.array(
                [i * 0.25 if i % 7 else None for i in range(n)]
            ),
            "ok": pa.array([bool(i % 2) if i % 11 else None for i in range(n)]),
            "@timestamp": pa.array(
                ["override" if i % 13 == 0 else None for i in range(n)]
            ),
            "time": pa.array(
                ["rec-time" if i % 17 == 0 else None for i in range(n)]
            ),
            "date": pa.array(
                ["rec-date" if i % 9 == 0 else None for i in range(n)]
            ),
        }
    )


COLS = ["msg", "lvl", "ratio", "ok"]


def old_influx(table, record_cols, seq_name="_seq", seq_start=0,
               auto_tags=False, tag_keys=None):
    n = table.num_rows
    tags = table["_tag"].to_pylist() if "_tag" in table.column_names else [""] * n
    tags = [t if t is not None else "None" for t in tags]
    times = table["_time"].to_pylist() if "_time" in table.column_names else [None] * n
    tag_key_set = set(tag_keys or ())
    out = []
    seq = seq_start
    for i, rec in enumerate(writers._row_iter(table, record_cols)):
        if seq + 1 >= 100000:
            emitted = 1
        else:
            emitted = seq
            seq += 1
        head = [f"{tags[i]},{seq_name}={emitted}"]
        body = []
        for k, v in rec.items():
            quote = False
            if isinstance(v, bool):
                sval = "TRUE" if v else "FALSE"
            elif isinstance(v, (int, np.integer)):
                sval = str(int(v))
            elif isinstance(v, (float, np.floating)):
                sval = f"{float(v):f}"
            elif isinstance(v, str):
                quote = True
                sval = '"' + flb_json_escape(v) + '"'
            else:
                continue
            tagged = (quote and auto_tags) or k in tag_key_set
            (head if tagged else body).append(f"{k}={sval}")
        if not body:
            continue
        t = times[i]
        ts_ns = 0 if t is None else int(t)
        out.append(",".join(head) + " " + ",".join(body) + f" {ts_ns}")
    return "\n".join(out) + ("\n" if out else "")


def old_kafka(table, record_cols, timestamp_key="@timestamp"):
    times = writers._times_sec(table)
    out = []
    for i, rec in enumerate(writers._row_iter(table, record_cols)):
        body = {timestamp_key: float(times[i])}
        body.update(rec)
        out.append(mp_json_value(body))
    return "\n".join(out) + ("\n" if out else "")


def old_splunk(table, record_cols, send_raw=False):
    times = writers._times_sec(table)
    out = []
    for i, rec in enumerate(writers._row_iter(table, record_cols)):
        if send_raw:
            body = {"time": float(times[i]), **rec}
        else:
            body = {"time": float(times[i]), "event": dict(rec)}
        out.append(mp_json_value(body))
    return "".join(out)


def old_http(table, record_cols, date_key="date", date_format="double",
             out_format="json"):
    iso = date_format == "iso8601"
    times = None if iso else writers._times_sec(table)
    times_ns = writers._times_ns(table) if iso else None
    bodies = []
    for i, rec in enumerate(writers._row_iter(table, record_cols)):
        if iso:
            sec, rem = divmod(int(times_ns[i]), 1_000_000_000)
            dt = datetime.datetime.fromtimestamp(sec, datetime.timezone.utc)
            date_val = dt.strftime("%Y-%m-%dT%H:%M:%S") + f".{rem // 1000:06d}Z"
        else:
            date_val = float(times[i])
        body = {date_key: date_val}
        body.update(rec)
        bodies.append(mp_json_value(body))
    out = "[" + ", ".join(bodies) + "]"
    if out_format in ("json_stream", "json_lines"):
        out = slow_transform(out, "\n" if out_format == "json_lines" else " ")
    return out


def slow_transform(out, sep):
    chars = list(out)
    level = 0
    in_string = in_escape = False
    for j, ch in enumerate(chars):
        if in_escape:
            in_escape = False
        elif ch == "\\":
            in_escape = True
        elif ch == '"':
            in_string = not in_string
        elif not in_string:
            if ch == "{":
                level += 1
            elif ch == "}":
                level -= 1
            elif ch in "[]" and level == 0:
                chars[j] = " "
            elif ch == "," and level == 0:
                chars[j] = sep
    return "".join(chars)


class TestInfluxParity:
    def test_default_and_tagged(self):
        t = mixed_table()
        assert writers.format_influxdb(t, COLS) == old_influx(t, COLS)
        assert writers.format_influxdb(
            t, COLS, auto_tags=True, tag_keys=("lvl",)
        ) == old_influx(t, COLS, auto_tags=True, tag_keys=("lvl",))

    def test_seq_wrap_and_empty(self):
        t = mixed_table(10)
        assert writers.format_influxdb(
            t, COLS, seq_start=99996
        ) == old_influx(t, COLS, seq_start=99996)
        assert writers.format_influxdb(t.slice(0, 0), COLS) == ""


class TestKafkaSplunkParity:
    def test_kafka_with_and_without_override(self):
        t = mixed_table()
        for cols in (COLS, ["msg", "@timestamp", "lvl"]):
            assert writers.format_kafka_json(t, cols) == old_kafka(t, cols)

    def test_splunk_envelope_raw_and_time_override(self):
        t = mixed_table()
        for cols in (COLS, ["time", "msg"]):
            for raw in (False, True):
                assert writers.format_splunk(
                    t, cols, send_raw=raw
                ) == old_splunk(t, cols, send_raw=raw)


class TestHttpParity:
    def test_full_matrix(self):
        t = mixed_table(800)
        for cols in (COLS, ["msg", "date", "lvl"]):
            for df in ("double", "iso8601"):
                for of in ("json", "json_stream", "json_lines"):
                    assert writers.format_http(
                        t, cols, date_format=df, out_format=of
                    ) == old_http(t, cols, date_format=df, out_format=of)

    def test_empty_table(self):
        t = mixed_table(4).slice(0, 0)
        for of in ("json", "json_stream", "json_lines"):
            assert writers.format_http(
                t, COLS, out_format=of
            ) == old_http(t, COLS, out_format=of)


class TestBracketTransformParity:
    CASES = [
        '[{"a":1}, {"b":[1,2,{"c":"}]"}]}, {"s":"q\\"x, [y]"}]',
        '[{"nested":{"deep":[1,2]}}, {"esc":"a\\\\"}, {"u":"h\u00e9, w [x]"}]',
        "[]",
        '[{"only":1}]',
        '[{"bs":"\\\\\\\\"}, {"q":"\\""}, {"mix":"a\\\\\\","}]',
    ]

    def test_cases(self):
        for c in self.CASES:
            for sep in ("\n", " "):
                assert writers._brackets_transform(c, sep) == slow_transform(c, sep)
