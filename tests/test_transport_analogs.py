"""Goldens for the transport/SaaS format analogs added in round 5:

- out_nats PUB framing + JSON body (plugins/out_nats/nats.c:75-215)
- out_kafka_rest records envelope (plugins/out_kafka_rest/kafka.c:34-168)
- out_td msgpack import payload + gzip container (plugins/out_td/td.c:40-130,
  td_http.c:32-196)
- out_azure Log Analytics body + SharedKey signing (plugins/out_azure/
  azure.c:42-232)
- in_mqtt capture decode (plugins/in_mqtt/mqtt_prot.c:112-387)
- in_serial capture framing (plugins/in_serial/in_serial.c:40-230)

Expectations are hand-computed literals (FIXTURES.md F5 convention) so the
formatters can't co-drift with any engine-side oracle.
"""

import json

import pyarrow as pa
import pytest

from fluent_bit_ray.sinks import writers
from fluent_bit_ray.sources import transports


def _table():
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


class TestNatsFormat:
    def test_pub_frames(self):
        out = writers.format_nats(_table(), ["host", "count", "up"])
        body = (
            '[[1519234013.000000, {"tag":"cpu.0", "host":"serverA", '
            '"count":3, "up":true}], '
            '[1519234014.000000, {"tag":"cpu.0", "host":"serverB", '
            '"count":4, "up":false}]]'
        ).encode()
        assert out == b"PUB cpu.0 %d\r\n" % len(body) + body + b"\r\n"

    def test_one_frame_per_tag(self):
        t = _table().set_column(0, "_tag", pa.array(["a.x", "b.y"]))
        out = writers.format_nats(t, ["count"])
        assert out.count(b"PUB ") == 2
        assert b"PUB a.x " in out and b"PUB b.y " in out

    def test_empty(self):
        assert writers.format_nats(_table().slice(0, 0), ["host"]) == b""


class TestKafkaRestFormat:
    def test_envelope(self):
        out = writers.format_kafka_rest(_table(), ["host", "usage", "count"])
        assert out == (
            '{"records":['
            '{"value":{"@timestamp":"2018-02-21T17:26:53.500Z", '
            '"host":"serverA", "usage":0.500000, "count":3}}, '
            '{"value":{"@timestamp":"2018-02-21T17:26:54.0Z", '
            '"host":"serverB", "count":4}}'
            "]}"
        )

    def test_partition_key_and_tag(self):
        out = writers.format_kafka_rest(
            _table(), ["count"], include_tag_key=True,
            partition=5, message_key="mk",
        )
        assert out.startswith(
            '{"records":[{"partition":5, "key":"mk", '
            '"value":{"@timestamp":"2018-02-21T17:26:53.500Z", '
            '"_flb-key":"cpu.0", "count":3}}'
        )

    def test_nsec_not_zero_padded(self):
        # kafka.c:134-137 prints tv_nsec with %PRIu64 — 500 ns is ".500Z",
        # not ".000000500Z"
        out = writers.format_kafka_rest(_table(), ["count"])
        assert '"@timestamp":"2018-02-21T17:26:53.500Z"' in out

    def test_empty(self):
        out = writers.format_kafka_rest(_table().slice(0, 0), ["host"])
        assert out == '{"records":[]}'


class TestTdFormat:
    def test_msgpack_stream(self):
        from fluent_bit_ray.sources.msgpack_io import iter_msgpack_stream

        payload = writers.format_td(_table(), ["host", "usage", "count"])
        maps = list(iter_msgpack_stream(payload))
        assert maps == [
            {"time": 1519234013, "host": "serverA", "usage": 0.5, "count": 3},
            {"time": 1519234014, "host": "serverB", "count": 4},
        ]
        # "time" is the FIRST key (td.c:118-120)
        assert list(maps[0])[0] == "time"

    def test_gzip_container(self):
        payload = writers.format_td(_table(), ["host"])
        gz = writers.gzip_td_payload(payload)
        # pinned header (td_http.c:56-68): magic, deflate, mtime=0, OS=0xFF
        assert gz[:10] == b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff"
        import gzip as _gzip

        assert _gzip.decompress(gz) == payload

    def test_request_headers(self):
        h = writers.td_request_headers("APIKEY", "mydb", "logs")
        assert h["method"] == "PUT"
        assert h["uri"] == "/v3/table/import/mydb/logs/msgpack.gz"
        assert h["Authorization"] == "TD1 APIKEY"
        assert h["Content-Type"] == "application/gzip"


class TestAzureFormat:
    def test_body(self):
        out = writers.format_azure(_table(), ["host", "count"])
        assert out == (
            '[{"@timestamp":1519234013.000000, "host":"serverA", "count":3}, '
            '{"@timestamp":1519234014.000000, "host":"serverB", "count":4}]'
        )

    def test_custom_time_key_and_empty(self):
        out = writers.format_azure(_table(), ["count"], time_key="ts")
        assert out.startswith('[{"ts":1519234013.000000')
        assert writers.format_azure(_table().slice(0, 0), ["host"]) == "[]"

    def test_shared_key_signature_golden(self):
        # HMAC-SHA256 golden, computed independently of the implementation
        h = writers.azure_shared_key_headers(
            "wsid",
            "MDEyMzQ1Njc4OWFiY2RlZjAxMjM0NTY3ODlhYmNkZWY=",
            100,
            "Wed, 21 Feb 2018 17:26:53 GMT",
            log_type="weblogs",
        )
        assert h["Authorization"] == (
            "SharedKey wsid:Rzu5xE6kMyTE1GRPKdxBDXfYjORUIKbEs9tNhjIxhBk="
        )
        assert h["uri"] == (
            "https://wsid.ods.opinsights.azure.com"
            "/api/logs?api-version=2016-04-01"
        )
        assert h["Log-Type"] == "weblogs"
        assert h["x-ms-date"] == "Wed, 21 Feb 2018 17:26:53 GMT"


class TestMqttCapture:
    def _capture(self, tmp_path, messages, **kw):
        p = str(tmp_path / "cap.mqtt")
        transports.write_mqtt_capture(p, messages, **kw)
        with open(p, "rb") as f:
            return f.read()

    def test_roundtrip_with_qos_and_ping(self, tmp_path):
        msgs = [
            (f"sensors/t{i}", json.dumps({"v": i}).encode()) for i in range(7)
        ]
        buf = self._capture(tmp_path, msgs, qos_cycle=(0, 1, 2), ping_every=3)
        recs = transports.mqtt_records(buf)
        assert recs == [{"topic": f"sensors/t{i}", "v": i} for i in range(7)]

    def test_non_json_and_non_map_dropped(self, tmp_path):
        msgs = [
            ("a", b"not json"),
            ("b", b"[1,2]"),
            ("c", b'{"ok":1}'),
            ("d", b'"scalar"'),
        ]
        buf = self._capture(tmp_path, msgs)
        assert transports.mqtt_records(buf) == [{"topic": "c", "ok": 1}]

    def test_must_open_with_connect(self):
        # a bare PUBLISH with no CONNECT = protocol error (mqtt_prot.c:297)
        frame = bytes([0x30, 7]) + b"\x00\x01t" + b'{"a":1}'[:4]
        with pytest.raises(transports.MqttProtocolError):
            list(transports.iter_mqtt_publish(frame))

    def test_disconnect_starts_new_session(self, tmp_path):
        p1 = self._capture(tmp_path, [("x", b'{"n":1}')])
        recs = transports.mqtt_records(p1 + p1)  # two full sessions
        assert recs == [{"topic": "x", "n": 1}, {"topic": "x", "n": 1}]

    def test_truncated_tail_dropped(self, tmp_path):
        buf = self._capture(tmp_path, [("x", b'{"n":1}'), ("y", b'{"n":2}')])
        recs = transports.mqtt_records(buf[:-6])  # cuts into DISCONNECT+last
        assert {"topic": "x", "n": 1} in recs

    def test_large_payload_varint(self, tmp_path):
        big = json.dumps({"blob": "x" * 20000}).encode()  # 3-byte varint
        buf = self._capture(tmp_path, [("big", big)])
        recs = transports.mqtt_records(buf)
        assert len(recs) == 1 and len(recs[0]["blob"]) == 20000

    def test_four_byte_varint_rejected(self):
        # the reference's overflow guard errors on a 4th length byte
        # (mqtt_prot.c:319-321) even when it terminates
        buf = bytes([0x10, 0x80, 0x80, 0x80, 0x01]) + b"\x00" * 16
        with pytest.raises(transports.MqttProtocolError):
            list(transports.iter_mqtt_publish(buf))


class TestSerialCapture:
    def test_separator_mode(self):
        recs = transports.serial_records(b"\x00l1|l2||l3", separator="|")
        assert recs == [{"msg": "l1"}, {"msg": "l2"}, {"msg": "l3"}]

    def test_leading_crlf_stripped(self):
        recs = transports.serial_records(b"\nl1|l2|", separator="|")
        assert recs == [{"msg": "l1"}, {"msg": "l2"}]

    def test_json_mode_wraps_under_msg(self):
        # process_pack wraps EVERY value under "msg" (in_serial.c:85-88)
        recs = transports.serial_records(
            b'{"a":1} [1,2] "x" 7', fmt="json"
        )
        assert recs == [
            {"msg": {"a": 1}}, {"msg": [1, 2]}, {"msg": "x"}, {"msg": 7}
        ]

    def test_json_mode_incomplete_tail_unconsumed(self):
        recs = transports.serial_records(b'{"a":1} {"b":', fmt="json")
        assert recs == [{"msg": {"a": 1}}]

    def test_raw_mode(self):
        assert transports.serial_records(b"hello world") == [
            {"msg": "hello world"}
        ]
        assert transports.serial_records(b"") == []


class TestTransportConfigWiring:
    """[INPUT] Name mqtt/serial and the four SaaS outputs parse + run
    through the classic-config engine."""

    def test_mqtt_input_dataset(self, tmp_path, ray_session):
        p = str(tmp_path / "cap.mqtt")
        transports.write_mqtt_capture(
            p, [("t/a", b'{"v": 1}'), ("t/b", b'{"v": 2}')]
        )
        ds = transports.mqtt_capture_dataset([p])
        rows = sorted(ds.take_all(), key=lambda r: r["topic"])
        assert [r["topic"] for r in rows] == ["t/a", "t/b"]
        assert json.loads(rows[0]["payload"]) == {"v": 1}

    def test_serial_input_dataset(self, tmp_path, ray_session):
        p = str(tmp_path / "cap.bin")
        with open(p, "wb") as f:
            f.write(b"one;two;three;")
        ds = transports.serial_capture_dataset([p], separator=";")
        assert sorted(r["msg"] for r in ds.take_all()) == [
            "one", "three", "two"
        ]

    def test_config_builds_specs(self):
        from fluent_bit_ray.pipelines.config import build_output

        spec = build_output({"name": ["kafka_rest"], "time_key": ["t"]}, 0)
        assert spec.fmt == "kafka_rest"
        assert dict(spec.fmt_options)["time_key"] == "t"
        assert build_output({"name": ["nats"]}, 0).fmt == "nats"
        assert build_output({"name": ["td"]}, 0).fmt == "td"
        assert build_output({"name": ["azure"]}, 0).fmt == "azure"

    def test_mqtt_to_nats_end_to_end(self, tmp_path, ray_session):
        from fluent_bit_ray.pipelines.config import run_config

        cap = tmp_path / "session.mqtt"
        transports.write_mqtt_capture(
            str(cap),
            [("iot/a", b'{"v": 1}'), ("iot/b", b'{"v": 2}')],
        )
        out = tmp_path / "out"
        conf = f"""
[INPUT]
    Name mqtt
    Path {cap}
    Tag  iot.cap

[OUTPUT]
    Name  nats
    Match iot.*
"""
        res = run_config(conf, out_root=str(out))
        assert res.counts["file_0"] == 2
        import os

        files = os.listdir(out / "file_0")
        assert files and files[0].endswith(".nats")
        body = (out / "file_0" / files[0]).read_bytes()
        assert body.startswith(b"PUB iot.cap ")
        assert b'"topic":"iot/a"' in body and b'"payload":' in body

    def test_serial_to_td_end_to_end(self, tmp_path, ray_session):
        from fluent_bit_ray.pipelines.config import run_config
        from fluent_bit_ray.sources.msgpack_io import iter_msgpack_stream

        cap = tmp_path / "tty.bin"
        cap.write_bytes(b"m1;m2;m3;")
        out = tmp_path / "out"
        conf = f"""
[INPUT]
    Name      serial
    File      {cap}
    Separator ;

[OUTPUT]
    Name  td
    Match *
"""
        res = run_config(conf, out_root=str(out))
        assert res.counts["file_0"] == 3
        import gzip as _gzip
        import os

        files = [f for f in os.listdir(out / "file_0")
                 if f.endswith(".msgpack.gz")]
        assert files
        recs = []
        for f in files:
            payload = _gzip.decompress((out / "file_0" / f).read_bytes())
            recs += list(iter_msgpack_stream(payload))
        assert sorted(r["msg"] for r in recs) == ["m1", "m2", "m3"]
        assert all(r["time"] == 0 for r in recs)  # no capture timestamps

    def test_unknown_input_still_errors(self):
        from fluent_bit_ray.parsers.core import ParserRegistry
        from fluent_bit_ray.pipelines.config import build_input

        with pytest.raises(ValueError, match="http"):
            build_input({"name": ["http"]}, ParserRegistry())
