"""msgpack codec + forward-protocol reader tests (fw_prot.c / flb_time.c
semantics: frame modes, EventTime fixext8, wire-level encodings)."""

import struct

import pyarrow as pa
import pytest

from fluent_bit_ray.sources.msgpack_io import (
    ExtType,
    decode_event_time,
    forward_file_dataset,
    frames_to_table,
    iter_forward_frames,
    msgpack_pack,
    msgpack_unpack,
    pack_event_time,
    write_forward_file,
)


def rt(obj):
    data = msgpack_pack(obj)
    out, off = msgpack_unpack(data)
    assert off == len(data)
    return out


class TestCodec:
    def test_roundtrip_scalars(self):
        for v in (None, True, False, 0, 1, 127, 128, 255, 256, 65535, 65536,
                  2**32, -1, -32, -33, -2**31, -2**31 - 1, 1.5, -0.25,
                  "", "abc", "x" * 40, "x" * 300, b"", b"\x00\xff", b"y" * 300):
            assert rt(v) == v

    def test_roundtrip_containers(self):
        v = {"a": [1, 2, {"b": None}], "c": "d", "e": [True, 2.5, b"zz"],
             "big": list(range(20))}
        assert rt(v) == v
        assert rt(list(range(100))) == list(range(100))
        assert rt({f"k{i}": i for i in range(40)}) == {f"k{i}": i for i in range(40)}

    def test_roundtrip_ext(self):
        e = ExtType(0, b"\x01\x02\x03\x04\x05\x06\x07\x08")
        assert rt(e) == e
        assert rt(ExtType(5, b"abc")) == ExtType(5, b"abc")

    def test_wire_level_golden(self):
        # spot-check exact encodings against the public msgpack spec
        assert msgpack_pack(5) == b"\x05"
        assert msgpack_pack(-1) == b"\xff"
        assert msgpack_pack("hi") == b"\xa2hi"
        assert msgpack_pack([1, 2]) == b"\x92\x01\x02"
        assert msgpack_pack({"a": 1}) == b"\x81\xa1a\x01"
        assert msgpack_pack(None) == b"\xc0"
        # fixext8 EventTime: 0xd7, type 0, 4B sec BE, 4B nsec BE
        assert (
            msgpack_pack(pack_event_time(3 * 10**9 + 7))
            == b"\xd7\x00" + struct.pack(">II", 3, 7)
        )

    def test_decode_foreign_encodings(self):
        # str16 / array16 / map16 / uint64 produced by other encoders
        s = "q" * 70000
        data = b"\xdb" + struct.pack(">I", len(s)) + s.encode()
        assert msgpack_unpack(data)[0] == s
        assert msgpack_unpack(b"\xcf" + struct.pack(">Q", 2**63))[0] == 2**63


class TestEventTime:
    def test_int_float_ext(self):
        assert decode_event_time(3) == 3 * 10**9
        assert decode_event_time(1.5) == 1_500_000_000
        assert decode_event_time(ExtType(0, struct.pack(">II", 10, 99))) == 10 * 10**9 + 99

    def test_bad_ext_len(self):
        with pytest.raises(ValueError):
            decode_event_time(ExtType(0, b"\x01"))


class TestFrames:
    ENTRIES = [(10**9, {"k": 1}), (2 * 10**9, {"k": 2, "s": "x"})]

    def test_three_modes_roundtrip(self, tmp_path):
        p = str(tmp_path / "f.msgpack")
        write_forward_file(
            p,
            [
                ("t.fw", self.ENTRIES, "forward"),
                ("t.pk", self.ENTRIES, "packed"),
                ("t.msg", self.ENTRIES[:1], "message"),
            ],
        )
        frames = list(iter_forward_frames(open(p, "rb").read()))
        assert [f[0] for f in frames] == ["t.fw", "t.pk", "t.msg", "t.msg"][:len(frames)]
        assert frames[0][1] == self.ENTRIES
        assert frames[1][1] == self.ENTRIES
        assert frames[2][1] == self.ENTRIES[:1]

    def test_message_mode_int_time(self):
        # plain-integer time (FLB_TIME_ETFMT_INT) in message mode
        buf = msgpack_pack(["tag.a", 7, {"m": "v"}])
        assert list(iter_forward_frames(buf)) == [("tag.a", [(7 * 10**9, {"m": "v"})])]

    def test_invalid_frames_raise(self):
        with pytest.raises(ValueError):
            list(iter_forward_frames(msgpack_pack("not-an-array")))
        with pytest.raises(ValueError):
            list(iter_forward_frames(msgpack_pack([42, [[1, {}]]])))  # bad tag
        with pytest.raises(ValueError):
            list(iter_forward_frames(msgpack_pack(["t", 1])))  # message, no map

    def test_frames_to_table(self, tmp_path):
        p = str(tmp_path / "f.msgpack")
        write_forward_file(p, [("t.a", self.ENTRIES, "forward")])
        t = frames_to_table(open(p, "rb").read())
        assert t["_tag"].to_pylist() == ["t.a", "t.a"]
        assert t["_time"].to_pylist() == [10**9, 2 * 10**9]
        assert t["k"].to_pylist() == [1, 2]
        assert t["s"].to_pylist() == [None, "x"]


@pytest.mark.usefixtures("ray_session")
class TestForwardDataset:
    def test_dataset_and_config_input(self, tmp_path):
        p = str(tmp_path / "dump.msgpack")
        write_forward_file(
            p,
            [("evt.a", TestFrames.ENTRIES, "forward"),
             ("evt.b", TestFrames.ENTRIES, "packed")],
        )
        ds = forward_file_dataset([p])
        rows = ds.take_all()
        assert len(rows) == 4
        assert {r["_tag"] for r in rows} == {"evt.a", "evt.b"}

        from fluent_bit_ray.pipelines.config import run_config

        res = run_config(
            f"""
[INPUT]
    Name forward
    Path {p}

[OUTPUT]
    Name counter
    Match evt.*
"""
        )
        assert res.counts["counter_0"] == 4


@pytest.mark.usefixtures("ray_session")
class TestForwardSinkRoundTrip:
    def test_output_forward_reads_back(self, tmp_path):
        import glob

        from fluent_bit_ray.pipelines.config import run_config
        from fluent_bit_ray.sources.msgpack_io import (
            forward_file_dataset,
            write_forward_file,
        )

        # in: a forward dump; out: [OUTPUT] Name forward re-emits frames
        dump = str(tmp_path / "in.msgpack")
        entries = [(10**9, {"svc": "api", "n": 1}), (2 * 10**9, {"svc": "web", "n": 2})]
        write_forward_file(dump, [("app.a", entries, "forward")])
        out = tmp_path / "out"
        res = run_config(
            f"""
[INPUT]
    Name forward
    Path {dump}

[OUTPUT]
    Name forward
    Match app.*
""",
            out_root=str(out),
        )
        assert res.counts["file_0"] == 2
        files = glob.glob(str(out / "file_0" / "*.msgpack"))
        assert files
        rows = forward_file_dataset(files).take_all()
        got = sorted((r["_tag"], r["_time"], r["svc"], r["n"]) for r in rows)
        assert got == [("app.a", 10**9, "api", 1), ("app.a", 2 * 10**9, "web", 2)]


class TestCFastPathParity:
    """The C `msgpack` wheel stream decoder must agree byte-for-byte with
    the pure-Python reference decoder (msgpack_io.iter_msgpack_stream picks
    the wheel when importable; the fallback is the parity oracle)."""

    CASES = [
        [["tag.a", [[1, {"k": "v"}], [2, {"k": 2}]]]],
        [["t", ExtType(0, struct.pack(">II", 7, 9)), {"m": {"n": [1, None, True]}}]],
        [["p", b"".join(msgpack_pack([i, {"x": "y" * i}]) for i in range(1, 4))]],
        [[{"nonstr": 1}, -5, 2.5, "s", b"\xff\x00", list(range(40))]],
    ]

    def _decode_both(self, buf):
        import fluent_bit_ray.sources.msgpack_io as m

        assert m._msgpack is not None, "msgpack wheel expected in container"
        fast = list(m.iter_msgpack_stream(buf))
        saved = m._msgpack
        m._msgpack = None
        try:
            slow = list(m.iter_msgpack_stream(buf))
        finally:
            m._msgpack = saved
        return fast, slow

    def test_stream_parity(self):
        for objs in self.CASES:
            buf = b"".join(msgpack_pack(o) for o in objs)
            fast, slow = self._decode_both(buf)
            assert fast == slow == objs

    def test_surrogate_and_ext_parity(self):
        # invalid-UTF-8 str payload (surrogateescape both ways) + fixext8
        raw = bytearray(msgpack_pack(["x", [[pack_event_time(10**9), {"s": "ab"}]]]))
        i = bytes(raw).index(b"ab")
        raw[i:i + 2] = b"\xff\xfe"
        fast, slow = self._decode_both(bytes(raw))
        assert fast == slow
        t = frames_to_table(bytes(raw))
        assert t["s"].to_pylist() == ["��"]

    def test_frames_parity_all_modes(self, tmp_path):
        import fluent_bit_ray.sources.msgpack_io as m

        p = str(tmp_path / "f.msgpack")
        entries = [(i * 10**9 + 5, {"id": i, "s": f"v{i}", "f": i / 2}) for i in range(50)]
        write_forward_file(p, [("t.fw", entries, mode)
                               for mode in ("forward", "packed", "message")])
        buf = open(p, "rb").read()
        fast = frames_to_table(buf)
        saved = m._msgpack
        m._msgpack = None
        try:
            slow = frames_to_table(buf)
        finally:
            m._msgpack = saved
        assert fast.equals(slow)
        assert fast.num_rows == 150
