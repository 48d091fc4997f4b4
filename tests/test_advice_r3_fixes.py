"""Round-3 ADVICE.md fixes.

1. records_to_table must not raise ArrowInvalid on mixed-type columns
   (legal in msgpack forward streams / concatenated JSON; the reference's
   schemaless msgpack core accepts them) — it degrades the column to
   string/JSON instead.
2. format_influxdb sequence wrap matches influxdb.c:129-135: the emitted
   value is 1 AT the wrap iteration and the counter freezes, pinning all
   later records to 1.
3. [INPUT] Name syslog / forward with no Path raise a clear config error.
"""

import pyarrow as pa
import pytest

from fluent_bit_ray.functions.records import records_to_table
from fluent_bit_ray.sinks.writers import format_influxdb
from fluent_bit_ray.sources.msgpack_io import (
    frames_to_table,
    msgpack_pack,
    pack_event_time,
)


class TestMixedTypeRecords:
    def test_int_then_string(self):
        t = records_to_table([{"v": 1}, {"v": "str"}])
        assert t["v"].to_pylist() == ["1", "str"]
        assert t.schema.field("v").type == pa.string()

    def test_scalar_then_nested(self):
        t = records_to_table([{"v": 1.5}, {"v": {"a": [1, 2]}}, {"v": None}])
        assert t["v"].to_pylist() == ["1.5", '{"a":[1,2]}', None]

    def test_bool_and_bytes_stringify(self):
        t = records_to_table([{"v": True}, {"v": b"raw"}, {"v": 3}])
        assert t["v"].to_pylist() == ["true", "raw", "3"]

    def test_homogeneous_untouched(self):
        t = records_to_table([{"a": 1, "b": "x"}, {"a": 2}])
        assert t.schema.field("a").type == pa.int64()
        assert t["b"].to_pylist() == ["x", None]

    def test_through_forward_frames(self):
        # the ADVICE repro: int-then-string field through a forward frame
        buf = msgpack_pack(
            ["t.a", [[pack_event_time(1_000), {"v": 1}],
                     [pack_event_time(2_000), {"v": "str"}]]]
        )
        t = frames_to_table(buf)
        assert t.num_rows == 2
        assert t["v"].to_pylist() == ["1", "str"]
        assert t["_time"].to_pylist() == [1_000, 2_000]


class TestInfluxSeqWrap:
    def test_wrap_pins_to_one(self):
        n = 6
        table = pa.table(
            {
                "_tag": pa.array(["t"] * n),
                "_time": pa.array([10] * n, pa.int64()),
                "k": pa.array([1] * n, pa.int64()),
            }
        )
        out = format_influxdb(table, ["k"], seq_start=99997)
        seqs = [line.split(",")[1].split(" ")[0] for line in out.splitlines()]
        # 99997, 99998, then the wrap branch fires (99998+1>=100000 is
        # False... 99999+1>=100000 True) -> 99997, 99998, 1, 1, 1, 1
        assert seqs == ["_seq=99997", "_seq=99998", "_seq=1",
                        "_seq=1", "_seq=1", "_seq=1"]

    def test_no_wrap_normal_increment(self):
        table = pa.table(
            {"_tag": pa.array(["t"] * 3), "_time": pa.array([0] * 3, pa.int64()),
             "k": pa.array([1] * 3, pa.int64())}
        )
        out = format_influxdb(table, ["k"])
        seqs = [line.split(",")[1].split(" ")[0] for line in out.splitlines()]
        assert seqs == ["_seq=0", "_seq=1", "_seq=2"]


class TestMissingPathConfigError:
    def _build(self, conf: str):
        from fluent_bit_ray.pipelines.config import run_config

        return run_config(conf)

    def test_syslog_needs_path(self, tmp_path):
        conf = "[INPUT]\n    Name syslog\n"
        with pytest.raises(ValueError, match="syslog needs Path"):
            self._build(conf)

    def test_forward_needs_path(self, tmp_path):
        conf = "[INPUT]\n    Name forward\n"
        with pytest.raises(ValueError, match="forward needs Path"):
            self._build(conf)
