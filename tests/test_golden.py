"""FIXTURES.md F5: hand-written golden micro-corpus with hand-computed
expectations — checked-in literals, independent of both the engine and the
Python oracle (guards against engine+oracle co-drift). Modeled on the
reference's golden corpus (tests/runtime/data/kubernetes/*.out).
"""

import datetime

import pyarrow as pa
import pytest

from fluent_bit_ray.pipelines.weblog import DEFAULT_SINKS, WeblogParseStage
from fluent_bit_ray.router import Router
from fluent_bit_ray.sinks.writers import SinkWriteStage

E = 1519234013 * 10**9  # 2018-02-21T17:26:53Z

ROWS = [
    # (url, warc_epoch_s, text, lang)
    ("https://ga.example.com/a", 1519234013,
     '9.8.7.6 - frank [21/Feb/2018:17:26:53 +0000] "GET /a HTTP/1.0" 200 100', "en"),
    ("https://gb.example.org/b", 1519234013,
     '1.2.3.4 - - [21/Feb/2018:22:56:53 +0530] "POST /b HTTP/1.0" 503 7', "de"),
    ("https://gc.example.net/c", 1519234013,
     '5.5.5.5 - - [21/Feb/2018:11:26:53 -0600] "PUT /c HTTP/1.0" 404 0 "http://r" "ua"', "xx"),
    ("https://gd.example.com/d", 1519234013,
     '{"log":"2.2.2.2 - - [21/Feb/2018:17:26:53 +0000] \\"GET /d HTTP/1.0\\" 500 9\\n",'
     '"stream":"stdout","time":"2018-02-21T17:26:53.123456789Z"}', "en"),
    ("https://ge.example.io/e", 1519234014,
     '{"log":"plain message","stream":"stderr","time":"2018-02-21T17:26:54.5Z"}', "fr"),
    ("https://gf.example.com/f", 1519234015,
     '{"log":"say \\"hi\\"\\n","stream":"stdout","time":"2018-02-21T17:26:55.000000001Z"}', "ja"),
    ("https://gg.example.org/g", 1519234013,
     "<13>Feb 21 17:26:53 hostx app[1]: m1", "en"),
    ("https://gh.example.net/h", 1519234013,
     "<5>Feb  5 01:02:03 hosty daemon: hello", "es"),
    ("https://gi.example.com/i", 1519234013,
     "<99>Feb 21 17:26:53 hostz x[2]: ", "xx"),
    ("https://gj.example.com/j", 1519234013,
     "this is not any known format", "en"),
    ("https://gk.example.org/k", 1519234013, '{"log": truncated', "de"),
    ("https://gl.example.io/l", 1519234013, "<abc>Feb 21 bad syslog", "de"),
]

# hand-computed per-row expectations (None = key absent)
EXPECT = [
    dict(ok=True, time=E, client_host="9.8.7.6", user="frank", method="GET",
         code="200", size="100", extracted=ROWS[0][2], sinks={"sink_en", "sink_all"}),
    dict(ok=True, time=E, client_host="1.2.3.4", method="POST", code="503",
         size="7", extracted=ROWS[1][2],
         sinks={"sink_intl", "sink_all", "sink_errors"}),
    dict(ok=True, time=E, client_host="5.5.5.5", method="PUT", code="404",
         size="0", referer="http://r", agent="ua", extracted=ROWS[2][2],
         sinks={"sink_all"}),
    dict(ok=True, time=E + 123456789, client_host="2.2.2.2", method="GET",
         code="500", size="9\n", stream="stdout",
         extracted='2.2.2.2 - - [21/Feb/2018:17:26:53 +0000] "GET /d HTTP/1.0" 500 9\n',
         sinks={"sink_en", "sink_all", "sink_errors"}),
    dict(ok=True, time=(1519234014 * 10**9) + 500_000_000, stream="stderr",
         client_host=None, code=None, extracted="plain message",
         sinks={"sink_intl", "sink_all"}),
    dict(ok=True, time=(1519234015 * 10**9) + 1, stream="stdout",
         extracted='say "hi"\n', sinks={"sink_intl", "sink_all"}),
    dict(ok=True, time=E, client_host="hostx", pri="13", ident="app", pid="1",
         message="m1", extracted=ROWS[6][2], sinks={"sink_en", "sink_all"}),
    dict(ok=True, time=1517792523 * 10**9, client_host="hosty", pri="5",
         ident="daemon", pid="", message="hello", extracted=ROWS[7][2],
         sinks={"sink_intl", "sink_all"}),
    dict(ok=True, time=E, client_host="hostz", pri="99", ident="x", pid="2",
         message="", extracted=ROWS[8][2], sinks={"sink_all"}),
    dict(ok=False, time=E, code=None, extracted=ROWS[9][2],
         sinks={"sink_en", "sink_all"}),
    dict(ok=False, time=E, extracted=ROWS[10][2], sinks={"sink_intl", "sink_all"}),
    dict(ok=False, time=E, extracted=ROWS[11][2], sinks={"sink_intl", "sink_all"}),
]


def golden_batch() -> pa.Table:
    return pa.table(
        {
            "url": pa.array([r[0] for r in ROWS]),
            "warc_ts": pa.array(
                [datetime.datetime.fromtimestamp(r[1], datetime.timezone.utc) for r in ROWS],
                pa.timestamp("us", tz="UTC"),
            ),
            "text": pa.array([r[2] for r in ROWS]),
            "lang": pa.array([r[3] for r in ROWS]),
        }
    )


class TestGoldenCorpus:
    def test_hand_computed_expectations(self):
        out = WeblogParseStage()(golden_batch())
        rows = out.to_pylist()
        router = Router([s.route() for s in DEFAULT_SINKS])
        from fluent_bit_ray.stages.grep import GrepFilter

        greps = {
            s.name: GrepFilter(list(s.grep)) if s.grep else None for s in DEFAULT_SINKS
        }
        assert len(rows) == len(EXPECT)
        for i, (row, exp) in enumerate(zip(rows, EXPECT)):
            assert row["_parse_ok"] == exp["ok"], f"row {i} parse_ok"
            assert row["_time"] == exp["time"], f"row {i} time"
            assert row["extracted_text"] == exp["extracted"], f"row {i} extracted"
            for field in ("client_host", "user", "method", "code", "size",
                          "referer", "agent", "stream", "pri", "ident", "pid",
                          "message"):
                if field in exp:
                    assert row.get(field) == exp[field], f"row {i} {field}"
            sinks = set()
            for s in router.route_row(row["_tag"]):
                g = greps[s]
                if g is not None:
                    rec = {k: v for k, v in row.items() if v is not None}
                    if g.process_row(rec) is None:
                        continue
                sinks.add(s)
            assert sinks == exp["sinks"], f"row {i} sinks"

    def test_golden_aggregate_counts(self):
        stage = SinkWriteStage(DEFAULT_SINKS, None)
        batch = WeblogParseStage()(golden_batch())
        agg = stage(batch)
        totals = {}
        for r in agg.to_pylist():
            t = totals.setdefault(r["sink"], [0, 0, 0])
            t[0] += r["records"]
            t[1] += r["bytes"]
            t[2] += r["parse_failures"]
        # hand-counted: en rows {0,3,6,9}; intl {1,4,5,7,10,11}; errors {1,3}
        assert totals["sink_en"][0] == 4
        assert totals["sink_intl"][0] == 6
        assert totals["sink_all"][0] == 12
        assert totals["sink_errors"][0] == 2
        assert totals["sink_all"][2] == 3  # rows 9, 10, 11 fail parse
        assert totals["sink_all"][1] == sum(len(r[2].encode()) for r in ROWS)


class TestInfluxKafkaFormats:
    """Formatter goldens mirroring the C emitters (influxdb.c, kafka.c)."""

    def _table(self):
        import numpy as np
        import pyarrow as pa

        return pa.table(
            {
                "_tag": pa.array(["cpu.0", "cpu.0"]),
                "_time": pa.array(
                    [1519234013 * 10**9 + 500, 1519234014 * 10**9], pa.int64()
                ),
                "host": pa.array(["serverA", "serverB"]),
                "usage": pa.array([0.5, None], pa.float64()),
                "count": pa.array([3, 4], pa.int64()),
                "up": pa.array([True, False]),
            }
        )

    def test_influxdb_lines(self):
        from fluent_bit_ray.sinks.writers import format_influxdb

        out = format_influxdb(self._table(), ["host", "usage", "count", "up"])
        assert out == (
            'cpu.0,_seq=0 host="serverA",usage=0.500000,count=3,up=TRUE'
            " 1519234013000000500\n"
            'cpu.0,_seq=1 host="serverB",count=4,up=FALSE'
            " 1519234014000000000\n"
        )

    def test_influxdb_tag_keys_move_to_head(self):
        from fluent_bit_ray.sinks.writers import format_influxdb

        out = format_influxdb(
            self._table(), ["host", "count"], tag_keys=("host",)
        )
        assert out.splitlines()[0] == (
            'cpu.0,_seq=0,host="serverA" count=3 1519234013000000500'
        )

    def test_influxdb_all_tagged_dropped(self):
        from fluent_bit_ray.sinks.writers import format_influxdb

        out = format_influxdb(
            self._table(), ["host"], auto_tags=True
        )
        assert out == ""  # every field tagged -> record dropped

    def test_kafka_json_bodies(self):
        from fluent_bit_ray.sinks.writers import format_kafka_json

        out = format_kafka_json(self._table(), ["host", "count", "up"])
        lines = out.splitlines()
        assert lines[0] == (
            '{"@timestamp":1519234013.000000, "host":"serverA", '
            '"count":3, "up":true}'
        )
        assert lines[1] == (
            '{"@timestamp":1519234014.000000, "host":"serverB", '
            '"count":4, "up":false}'
        )


class TestHttpFormat:
    """out_http body goldens (http.c:38-160): date injection + the
    json_stream/json_lines top-level character transform."""

    def _table(self):
        import pyarrow as pa

        return pa.table(
            {
                "_time": pa.array(
                    [1519234013 * 10**9 + 360920913, 1519234014 * 10**9],
                    pa.int64(),
                ),
                "msg": pa.array(["a[1],b", "two"]),
                "n": pa.array([1, 2], pa.int64()),
            }
        )

    def test_json_array_double_date(self):
        from fluent_bit_ray.sinks.writers import format_http

        out = format_http(self._table(), ["msg", "n"])
        assert out == (
            '[{"date":1519234013.360921, "msg":"a[1],b", "n":1}, '
            '{"date":1519234014.000000, "msg":"two", "n":2}]'
        )

    def test_iso8601_date(self):
        from fluent_bit_ray.sinks.writers import format_http

        out = format_http(self._table(), ["n"], date_format="iso8601")
        assert out.startswith('[{"date":"2018-02-21T17:26:53.360920Z", "n":1}')

    def test_json_lines_transform(self):
        from fluent_bit_ray.sinks.writers import format_http

        out = format_http(self._table(), ["msg", "n"], out_format="json_lines")
        # top-level brackets blanked, top-level comma -> newline; string
        # content (including brackets/commas inside values) untouched
        assert out == (
            ' {"date":1519234013.360921, "msg":"a[1],b", "n":1}\n'
            ' {"date":1519234014.000000, "msg":"two", "n":2} '
        )


class TestSplunkFormat:
    """out_splunk HEC envelope golden (splunk.c:47-148): `{"time":<%f>,
    "event":{...}}` per record, objects concatenated with NO separator
    (splunk.c:129), Splunk_Send_Raw flattens pairs to the top level."""

    def _table(self):
        import pyarrow as pa

        return pa.table(
            {
                "_tag": pa.array(["app.a", "app.a"]),
                "_time": pa.array(
                    [1519234013 * 10**9 + 500_000_000, 1519234014 * 10**9],
                    pa.int64(),
                ),
                "host": pa.array(["serverA", "serverB"]),
                "count": pa.array([3, 4], pa.int64()),
            }
        )

    def test_event_envelope(self):
        from fluent_bit_ray.sinks.writers import format_splunk

        out = format_splunk(self._table(), ["host", "count"])
        assert out == (
            '{"time":1519234013.500000, "event":{"host":"serverA", "count":3}}'
            '{"time":1519234014.000000, "event":{"host":"serverB", "count":4}}'
        )

    def test_send_raw_flattens(self):
        from fluent_bit_ray.sinks.writers import format_splunk

        out = format_splunk(self._table(), ["host", "count"], send_raw=True)
        assert out == (
            '{"time":1519234013.500000, "host":"serverA", "count":3}'
            '{"time":1519234014.000000, "host":"serverB", "count":4}'
        )

    def test_config_surface(self, tmp_path, ray_session):
        import glob

        from fluent_bit_ray.pipelines.config import run_config

        out = tmp_path / "o"
        res = run_config(
            """
[INPUT]
    Name dummy
    Dummy {"msg":"hi"}
    Samples 1
    Tag app.x

[OUTPUT]
    Name splunk
    Match app.*
""",
            out_root=str(out),
        )
        assert res.counts["file_0"] == 1
        files = glob.glob(str(out / "file_0" / "*.splunk"))
        assert files
        body = open(files[0]).read()
        assert body.startswith('{"time":') and '"event":{"msg":"hi"}}' in body
