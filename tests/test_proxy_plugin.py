"""External (proxy) plugin ABI analog — sinks/proxy.py. Pins the
flb_plugin_proxy.c symbol contract (Register/Init/Flush/Exit), the
FLB_OK/FLB_ERROR/FLB_RETRY return semantics, and the raw-event-buffer
encode/decode, plus a classic-config end-to-end run."""

import json
import os

import pyarrow as pa
import pytest

from fluent_bit_ray.sinks import proxy


def _write(tmp_path, name, body):
    p = tmp_path / name
    p.write_text(body)
    return str(p)


def _table():
    return pa.table(
        {
            "_tag": pa.array(["a.x", "b.y", "a.x"]),
            "_time": pa.array([10**9, 2 * 10**9, 3 * 10**9], pa.int64()),
            "k": pa.array(["v1", "v2", "v3"]),
            "n": pa.array([1, None, 3], pa.int64()),
        }
    )


class TestPackDecode:
    def test_roundtrip_groups_by_tag(self):
        bufs = proxy.pack_proxy_events(_table(), ["k", "n"])
        assert set(bufs) == {"a.x", "b.y"}
        ev = proxy.decode_proxy_events(bufs["a.x"])
        assert ev == [(10**9, {"k": "v1", "n": 1}),
                      (3 * 10**9, {"k": "v3", "n": 3})]
        # null value -> absent key (engine record convention)
        ev_b = proxy.decode_proxy_events(bufs["b.y"])
        assert ev_b == [(2 * 10**9, {"k": "v2"})]


class TestContract:
    def test_missing_symbols_rejected(self, tmp_path):
        p = _write(tmp_path, "bad.py", "x = 1\n")
        with pytest.raises(proxy.ProxyPluginError, match="FLBPluginRegister"):
            proxy.ProxyPlugin(p)

    def test_register_fills_definition_and_init_gets_props(self, tmp_path):
        p = _write(
            tmp_path, "ok.py",
            "seen = {}\n"
            "def FLBPluginRegister(d):\n"
            "    d['name'] = 'demo'\n"
            "    d['desc'] = 'demo plugin'\n"
            "def FLBPluginInit(props):\n"
            "    seen.update(props)\n"
            "    return 1\n"
            "def FLBPluginFlush(data, tag):\n"
            "    return 1\n",
        )
        pl = proxy.ProxyPlugin(p, {"topic": "t1"})
        assert pl.definition["name"] == "demo"
        assert pl._load(p).seen == {"topic": "t1"}

    def test_init_error_rejected(self, tmp_path):
        p = _write(
            tmp_path, "initfail.py",
            "def FLBPluginRegister(d): d['name'] = 'x'\n"
            "def FLBPluginInit(props): return 0\n"  # FLB_ERROR
            "def FLBPluginFlush(data, tag): return 1\n",
        )
        with pytest.raises(proxy.ProxyPluginError, match="FLB_ERROR"):
            proxy.ProxyPlugin(p)

    def test_flush_error_raises(self, tmp_path):
        p = _write(
            tmp_path, "flusherr.py",
            "def FLBPluginRegister(d): d['name'] = 'x'\n"
            "def FLBPluginFlush(data, tag): return 0\n",
        )
        with pytest.raises(proxy.ProxyPluginError, match="FLB_ERROR"):
            proxy.ProxyPlugin(p).flush(b"", "t")

    def test_flush_retry_bounded_then_ok(self, tmp_path):
        p = _write(
            tmp_path, "retry.py",
            "calls = []\n"
            "def FLBPluginRegister(d): d['name'] = 'x'\n"
            "def FLBPluginFlush(data, tag):\n"
            "    calls.append(tag)\n"
            "    return 2 if len(calls) < 3 else 1\n",  # RETRY, RETRY, OK
        )
        pl = proxy.ProxyPlugin(p)
        pl.flush(b"", "t")  # succeeds on 3rd attempt
        assert len(pl._load(p).calls) == 3

    def test_flush_retry_exhaustion(self, tmp_path):
        p = _write(
            tmp_path, "retry4.py",
            "def FLBPluginRegister(d): d['name'] = 'x'\n"
            "def FLBPluginFlush(data, tag): return 2\n",
        )
        with pytest.raises(proxy.ProxyPluginError, match="FLB_RETRY"):
            proxy.ProxyPlugin(p).flush(b"", "t", max_retries=1)

    def test_none_return_is_ok(self, tmp_path):
        p = _write(
            tmp_path, "noret.py",
            "def FLBPluginRegister(d): d['name'] = 'x'\n"
            "def FLBPluginFlush(data, tag): pass\n",
        )
        proxy.ProxyPlugin(p).flush(b"", "t")  # no raise


@pytest.mark.usefixtures("ray_session")
class TestConfigEndToEnd:
    def test_tail_to_proxy_output(self, tmp_path):
        from fluent_bit_ray.pipelines.config import run_config

        sink = tmp_path / "sink.jsonl"
        plugin = _write(
            tmp_path, "dump.py",
            "import json\n"
            "from fluent_bit_ray.sinks.proxy import decode_proxy_events\n"
            "_d = {}\n"
            "def FLBPluginRegister(d): d['name'] = 'dump'\n"
            "def FLBPluginInit(props):\n"
            "    _d['path'] = props['path']\n"
            "    return 1\n"
            "def FLBPluginFlush(data, tag):\n"
            "    with open(_d['path'], 'a') as f:\n"
            "        for ts, rec in decode_proxy_events(data):\n"
            "            f.write(json.dumps([tag, rec], sort_keys=True)"
            " + '\\n')\n"
            "    return 1\n",
        )
        log = tmp_path / "in.log"
        log.write_text("m=one\nm=two\n")
        conf = f"""
[PARSER]
    Name   kvm
    Format regex
    Regex  ^m=(?<m>\\S+)$

[INPUT]
    Name   tail
    Path   {log}
    Parser kvm
    Tag    px.demo

[OUTPUT]
    Name   proxy
    Match  px.*
    Script {plugin}
    Path   {sink}
"""
        res = run_config(conf, out_root=str(tmp_path / "out"))
        # proxy outputs are named as their own instance kind, not file_N
        assert res.counts["proxy_0"] == 2
        assert res.metrics["output"]["proxy_0"]["proc_records"] == 2
        lines = [json.loads(x) for x in sink.read_text().splitlines()]
        assert sorted(r["m"] for _t, r in lines) == ["one", "two"]
        assert all(t == "px.demo" for t, _r in lines)

    def test_proxy_delivers_without_out_root(self, tmp_path):
        # a proxy sink needs no output directory: FLBPluginFlush IS the
        # delivery — run_config without out_root must still invoke it
        from fluent_bit_ray.pipelines.config import run_config

        sink = tmp_path / "sink.txt"
        plugin = _write(
            tmp_path, "count.py",
            "_d = {}\n"
            "def FLBPluginRegister(d): d['name'] = 'count'\n"
            "def FLBPluginInit(props):\n"
            "    _d['path'] = props['path']\n"
            "    return 1\n"
            "def FLBPluginFlush(data, tag):\n"
            "    from fluent_bit_ray.sinks.proxy import decode_proxy_events\n"
            "    with open(_d['path'], 'a') as f:\n"
            "        f.write(f'{len(decode_proxy_events(data))}\\n')\n"
            "    return 1\n",
        )
        log = tmp_path / "in.log"
        log.write_text("x\ny\nz\n")
        conf = f"""
[INPUT]
    Name tail
    Path {log}
    Tag  t.a

[OUTPUT]
    Name   proxy
    Match  *
    Script {plugin}
    Path   {sink}
"""
        res = run_config(conf)  # NO out_root
        assert res.counts["proxy_0"] == 3
        assert sum(int(x) for x in sink.read_text().split()) == 3
