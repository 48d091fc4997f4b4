"""Classic-mode config engine tests (the fluent-bit-user migration surface)."""

import os

import pyarrow as pa
import pytest

from fluent_bit_ray.pipelines.config import parse_classic, run_config


CONF = """
[SERVICE]
    Flush 5

[PARSER]
    Name   kv
    Format regex
    Regex  ^(?<k>\\S+)=(?<v>\\d+)$
    Types  v:integer

[INPUT]
    Name    dummy
    Dummy   {"log": "x=41", "level": "info"}
    Samples 20
    Tag     t.demo

[FILTER]
    Name         parser
    Match        t.*
    Key_Name     log
    Parser       kv
    Reserve_Data On

[FILTER]
    Name   grep
    Match  *
    Regex  level info

[OUTPUT]
    Name   counter
    Match  t.*
"""


class TestParseClassic:
    def test_sections_and_repeated_keys(self):
        secs = parse_classic(CONF)
        names = [s["__name__"] for s in secs]
        assert names == ["service", "parser", "input", "filter", "filter", "output"]
        grep = secs[4]
        assert grep["regex"] == ["level info"]


@pytest.mark.usefixtures("ray_session")
class TestRunConfig:
    def test_dummy_parser_grep_counter(self):
        res = run_config(CONF)
        assert res.counts == {"counter_0": 20}

    def test_tail_file_pipeline(self, tmp_path):
        log = tmp_path / "in.log"
        log.write_text("a=1\nb=2\nnotkv\n")
        conf = f"""
[PARSER]
    Name   kv
    Format regex
    Regex  ^(?<k>\\S+)=(?<v>\\d+)$

[INPUT]
    Name   tail
    Path   {log}
    Parser kv
    Tag    files.demo

[OUTPUT]
    Name   file
    Match  files.*
    Format json

[OUTPUT]
    Name   counter
    Match  *
"""
        out = tmp_path / "out"
        res = run_config(conf, out_root=str(out))
        assert res.counts["counter_1"] == 3  # parse failure still flows (raw log)
        files = os.listdir(out / "file_0")
        assert files
        content = (out / "file_0" / files[0]).read_text()
        assert content.startswith("files.demo: [")

    def test_unsupported_plugin_clear_error(self):
        # in_http (a stub even in the reference) stays the one named
        # exclusion; mqtt/serial are capture analogs that demand a Path
        with pytest.raises(ValueError, match="unsupported input plugin"):
            run_config("[INPUT]\n    Name http\n[OUTPUT]\n    Name null\n")
        with pytest.raises(ValueError, match="needs Path"):
            run_config("[INPUT]\n    Name mqtt\n[OUTPUT]\n    Name null\n")


@pytest.mark.usefixtures("ray_session")
class TestMultilineAndEnrich:
    def test_multiline_tail(self, tmp_path):
        log = tmp_path / "stack.log"
        log.write_text(
            "2018-02-21 ERROR boom\n"
            "  at foo()\n"
            "  at bar()\n"
            "2018-02-21 INFO ok\n"
        )
        conf = f"""
[PARSER]
    Name   lvl
    Format regex
    Regex  ^(?<date>\\d{{4}}-\\d{{2}}-\\d{{2}}) (?<level>[A-Z]+) (?<message>.*)$

[INPUT]
    Name             tail
    Path             {log}
    Multiline        On
    Parser_Firstline lvl
    Tag              ml.x

[OUTPUT]
    Name  counter
    Match *
"""
        from fluent_bit_ray.pipelines.config import run_config

        res = run_config(conf)
        # 4 physical lines -> 2 logical records
        assert res.counts == {"counter_0": 2}

    def test_enrich_filter_from_json_dim(self, tmp_path):
        import json

        dim = tmp_path / "dim.json"
        dim.write_text(json.dumps({"u1": {"geo": "us", "tier": "gold"}}))
        out = tmp_path / "out"
        conf = f"""
[INPUT]
    Name    dummy
    Dummy   {{"user": "u1", "log": "x"}}
    Samples 3
    Tag     t.e

[FILTER]
    Name       enrich
    Match      *
    Lookup     {dim}
    Key_Name   user
    Nest_under usermeta

[OUTPUT]
    Name   file
    Match  *
    Format json
"""
        from fluent_bit_ray.pipelines.config import run_config

        res = run_config(conf, out_root=str(out))
        assert res.counts["file_0"] == 3
        import glob as g

        content = open(g.glob(str(out / "file_0" / "*.jsonl"))[0]).read()
        assert '"usermeta":{"geo":"us","tier":"gold"}' in content


@pytest.mark.usefixtures("ray_session")
class TestReviewFixes:
    def test_modify_rules_apply_in_config_order(self):
        # Rename a->b BEFORE Set a x: fluent-bit yields b=<old a>, a=x
        conf = """
[INPUT]
    Name    dummy
    Dummy   {"a": "orig"}
    Samples 1
    Tag     t

[FILTER]
    Name   modify
    Match  *
    Rename a b
    Set    a x

[OUTPUT]
    Name  counter
    Match *
"""
        from fluent_bit_ray.pipelines.config import parse_classic, build_filter
        from fluent_bit_ray.parsers.core import DEFAULT_REGISTRY

        sec = [s for s in parse_classic(conf) if s["__name__"] == "filter"][0]
        f = build_filter(sec, DEFAULT_REGISTRY)
        assert f.rules == [("rename", "a", "b"), ("set", "a", "x")]
        out = f.process_row({"a": "orig"})
        assert out == {"b": "orig", "a": "x"}

    def test_throttle_filter_in_config(self):
        conf = """
[INPUT]
    Name    dummy
    Dummy   {"m": "x"}
    Samples 50
    Tag     t

[FILTER]
    Name     throttle
    Match    *
    Rate     3
    Window   1
    Interval 60

[OUTPUT]
    Name  counter
    Match *
"""
        from fluent_bit_ray.pipelines.config import run_config

        res = run_config(conf)
        # dummy records have no _time -> one shared bucket capped at 3
        assert res.counts == {"counter_0": 3}

    def test_null_output_writes_no_files(self, tmp_path):
        conf = """
[INPUT]
    Name    dummy
    Dummy   {"m": "x"}
    Samples 2
    Tag     t

[OUTPUT]
    Name  null
    Match *
"""
        from fluent_bit_ray.pipelines.config import run_config
        import os

        res = run_config(conf, out_root=str(tmp_path / "o"))
        assert res.counts == {"null_0": 2}
        assert not os.path.exists(tmp_path / "o" / "null_0")

    def test_tab_separated_config(self):
        from fluent_bit_ray.pipelines.config import parse_classic

        secs = parse_classic("[INPUT]\n\tName\tdummy\n\tTag\tt.x\n")
        assert secs[0]["name"] == ["dummy"] and secs[0]["tag"] == ["t.x"]


@pytest.mark.usefixtures("ray_session")
class TestWaveRecovery:
    def test_crash_between_stamp_and_lineage_rolls_forward(self, tmp_path):
        import glob as g
        import json
        import os

        from fluent_bit_ray.pipelines.weblog import run_weblog
        from fluent_bit_ray.state import checkpoint as ckpt
        from fluent_bit_ray.synth import pages_path

        pages = pages_path(600, partitions=4)
        out = str(tmp_path / "o")
        r1 = run_weblog(pages, out, wave_size=2, resume=False)
        baseline = {
            (x["sink"], x["lang"], x["host"], x["bucket"]): x["records"]
            for x in r1["aggregate"].to_pylist()
        }
        # simulate the crash window: delete the lineage records of one
        # committed wave (stamp + agg parquet remain)
        wave_dirs = g.glob(os.path.join(ckpt.agg_dir(out), "wave_*"))
        stamp = json.load(open(os.path.join(wave_dirs[0], "_WAVE_DONE")))
        for pid in stamp["partitions"]:
            os.remove(ckpt.lineage_path(out, pid))
        r2 = run_weblog(pages, out, wave_size=2, resume=True)
        # roll-forward: no partition reprocessed, aggregates unchanged
        assert r2["partitions_processed"] == 0
        got = {
            (x["sink"], x["lang"], x["host"], x["bucket"]): x["records"]
            for x in r2["aggregate"].to_pylist()
        }
        assert got == baseline


@pytest.mark.usefixtures("ray_session")
class TestRandomHeadDelimiter:
    def test_random_input(self):
        from fluent_bit_ray.pipelines.config import run_config

        conf = """
[INPUT]
    Name    random
    Samples 7
    Seed    1

[OUTPUT]
    Name  counter
    Match *
"""
        r1 = run_config(conf)
        r2 = run_config(conf)
        assert r1.counts == r2.counts == {"counter_0": 7}  # deterministic

    def test_head_input_lines(self, tmp_path):
        from fluent_bit_ray.pipelines.config import run_config

        f = tmp_path / "h.txt"
        f.write_text("l1\nl2\nl3\nl4\n")
        res = run_config(f"""
[INPUT]
    Name  head
    File  {f}
    Lines 2

[OUTPUT]
    Name  counter
    Match *
""")
        assert res.counts == {"counter_0": 2}

    def test_csv_custom_delimiter(self, tmp_path):
        from fluent_bit_ray.pipelines.config import run_config

        out = tmp_path / "o"
        run_config(f"""
[INPUT]
    Name    dummy
    Dummy   {{"a": "1", "b": "2"}}
    Samples 1
    Tag     t

[OUTPUT]
    Name      file
    Match     *
    Format    csv
    Delimiter ;
""", out_root=str(out))
        import glob as g

        content = open(g.glob(str(out / "file_0" / "*.csv"))[0]).read()
        assert ';"1";"2"' in content


@pytest.mark.usefixtures("ray_session")
class TestSyslogInput:
    def test_name_syslog_parses_and_drops_failures(self, tmp_path):
        p = tmp_path / "a.log"
        p.write_text(
            "<13>Feb 21 17:26:53 myhost app1[77]: hello world\n"
            "*** junk that no parser accepts ***\n"
            "<9>Feb 21 17:26:54 other app2: second line\n"
        )
        from fluent_bit_ray.parsers import DEFAULT_REGISTRY
        from fluent_bit_ray.pipelines.config import build_input

        ds, tag = build_input(
            {"name": ["syslog"], "path": [str(p)], "parser": ["syslog-rfc3164"]},
            DEFAULT_REGISTRY,
        )
        rows = sorted(ds.take_all(), key=lambda r: r["time"])
        assert tag == "syslog.0"
        assert len(rows) == 2  # junk line dropped (syslog_prot.c skip path)
        assert rows[0]["host"] == "myhost" and rows[0]["pid"] == "77"
        assert rows[0]["message"] == "hello world"
        assert rows[1]["ident"] == "app2" and rows[1]["pid"] == ""
        # year injection: 2018 epoch for Feb 21 17:26:53/54 UTC
        assert rows[0]["_time"] == 1519234013 * 10**9
        assert rows[1]["_time"] == 1519234014 * 10**9


@pytest.mark.usefixtures("ray_session")
class TestExecInput:
    def test_exec_plain_lines(self):
        from fluent_bit_ray.parsers import DEFAULT_REGISTRY
        from fluent_bit_ray.pipelines.config import build_input

        ds, tag = build_input(
            {"name": ["exec"], "command": ["printf 'one\\ntwo\\n'"]},
            DEFAULT_REGISTRY,
        )
        assert tag == "exec.0"
        assert [r["exec"] for r in ds.take_all()] == ["one", "two"]

    def test_exec_with_parser_drops_failures(self):
        from fluent_bit_ray.parsers import DEFAULT_REGISTRY
        from fluent_bit_ray.pipelines.config import build_input

        cmd = (
            "printf '<13>Feb 21 17:26:53 hostx app[9]: ok\\nnot syslog\\n'"
        )
        ds, _ = build_input(
            {"name": ["exec"], "command": [cmd], "parser": ["syslog-rfc3164"]},
            DEFAULT_REGISTRY,
        )
        rows = ds.take_all()
        assert len(rows) == 1
        assert rows[0]["host"] == "hostx" and rows[0]["message"] == "ok"


@pytest.mark.usefixtures("ray_session")
class TestForwardToNewSinksE2E:
    def test_forward_grep_influxdb_kafka(self, tmp_path):
        from fluent_bit_ray.sources.msgpack_io import write_forward_file
        from fluent_bit_ray.pipelines.config import run_config

        dump = str(tmp_path / "in.msgpack")
        entries = [
            (10**9, {"svc": "api", "code": "500", "n": 1}),
            (2 * 10**9, {"svc": "web", "code": "200", "n": 2}),
            (3 * 10**9, {"svc": "api", "code": "503", "n": 3}),
        ]
        write_forward_file(dump, [("app.metrics", entries, "forward")])
        out = tmp_path / "out"
        res = run_config(
            f"""
[INPUT]
    Name forward
    Path {dump}

[FILTER]
    Name grep
    Match app.*
    Regex code ^5\\d\\d$

[OUTPUT]
    Name influxdb
    Match app.*
    Path sink

[OUTPUT]
    Name kafka
    Match app.*
""",
            out_root=str(out),
        )
        assert res.counts["file_0"] == 2  # 200 row dropped by grep
        import glob as g

        files = g.glob(str(out / "file_0" / "*.influx"))
        assert len(files) == 1
        body = open(files[0]).read()
        lines = body.strip().splitlines()
        assert lines[0] == (
            'app.metrics,_seq=0 svc="api",code="500",n=1 1000000000'
        )
        assert lines[1] == (
            'app.metrics,_seq=1 svc="api",code="503",n=3 3000000000'
        )


@pytest.mark.usefixtures("ray_session")
class TestLuaScriptFilter:
    def test_python_script_udf(self, tmp_path):
        script = tmp_path / "udf.py"
        script.write_text(
            "def process(record):\n"
            "    if record.get('drop') == 'yes':\n"
            "        return None\n"
            "    record['tagged'] = True\n"
            "    return record\n"
        )
        from fluent_bit_ray.pipelines.config import run_config

        res = run_config(
            f"""
[INPUT]
    Name dummy
    Dummy {{"msg":"keep","drop":"no"}}
    Samples 3

[INPUT]
    Name dummy
    Dummy {{"msg":"gone","drop":"yes"}}
    Samples 2

[FILTER]
    Name lua
    Match *
    Script {script}
    Call process

[OUTPUT]
    Name counter
    Match *
"""
        )
        assert res.counts["counter_0"] == 3  # the 2 drop=yes records dropped


@pytest.mark.usefixtures("ray_session")
class TestHostSamplerInputs:
    def test_cpu_mem_disk_shapes(self):
        from fluent_bit_ray.parsers import DEFAULT_REGISTRY
        from fluent_bit_ray.pipelines.config import build_input

        ds, tag = build_input(
            {"name": ["cpu"], "interval_sec": ["0.05"]}, DEFAULT_REGISTRY
        )
        row = ds.take_all()[0]
        assert tag == "cpu.0"
        assert {"cpu_p", "user_p", "system_p"} <= set(row)
        assert "cpu0.p_cpu" in row and row["cpu_p"] >= 0.0

        ds, _ = build_input({"name": ["mem"]}, DEFAULT_REGISTRY)
        row = ds.take_all()[0]
        assert row["Mem.total"] > 0
        assert row["Mem.used"] + row["Mem.free"] == row["Mem.total"]
        assert {"Swap.total", "Swap.used", "Swap.free"} <= set(row)

        ds, _ = build_input(
            {"name": ["disk"], "interval_sec": ["0.05"]}, DEFAULT_REGISTRY
        )
        row = ds.take_all()[0]
        assert set(row) >= {"read_size", "write_size"}

    def test_proc_and_health(self):
        from fluent_bit_ray.parsers import DEFAULT_REGISTRY
        from fluent_bit_ray.pipelines.config import build_input

        # our own python process is definitely alive
        ds, _ = build_input(
            {"name": ["proc"], "proc_name": ["python"]}, DEFAULT_REGISTRY
        )
        row = ds.take_all()[0]
        assert row["proc_name"] == "python"
        if row["alive"]:
            assert row["pid"] > 0 and row.get("mem.VmRSS", 0) > 0

        ds, _ = build_input(
            {"name": ["health"], "host": ["127.0.0.1"], "port": ["1"]},
            DEFAULT_REGISTRY,
        )
        assert ds.take_all()[0]["alive"] in (False, True)

    def test_netif_loopback(self):
        from fluent_bit_ray.parsers import DEFAULT_REGISTRY
        from fluent_bit_ray.pipelines.config import build_input

        import os
        if not os.path.exists("/proc/net/dev"):
            pytest.skip("no /proc/net/dev")
        with open("/proc/net/dev") as f:
            ifaces = [l.partition(":")[0].strip() for l in f if ":" in l]
        if not ifaces:
            pytest.skip("no interfaces")
        ds, _ = build_input(
            {"name": ["netif"], "interface": [ifaces[0]],
             "interval_sec": ["0.05"]},
            DEFAULT_REGISTRY,
        )
        row = ds.take_all()[0]
        assert f"{ifaces[0]}.rx.bytes" in row
        assert f"{ifaces[0]}.tx.packets" in row


@pytest.mark.usefixtures("ray_session")
class TestKmsgInput:
    def test_kmsg_drain(self):
        import os

        from fluent_bit_ray.parsers import DEFAULT_REGISTRY
        from fluent_bit_ray.pipelines.config import build_input

        if not os.access("/dev/kmsg", os.R_OK):
            pytest.skip("/dev/kmsg unreadable")
        ds, tag = build_input(
            {"name": ["kmsg"], "max_records": ["50"]}, DEFAULT_REGISTRY
        )
        rows = ds.take_all()
        assert tag == "kmsg.0"
        assert rows, "kernel ring should have boot messages"
        r = rows[0]
        assert set(r) >= {"priority", "sequence", "sec", "usec", "msg"}
        assert 0 <= r["priority"] <= 7 and r["msg"]


@pytest.mark.usefixtures("ray_session")
class TestSystemdExportInput:
    def _dump(self, tmp_path):
        # journal export format: text fields, one BINARY field (embedded
        # newline), double-underscore synthetic fields, two entries
        msg2 = b"line one\nline two"
        data = (
            b"__CURSOR=s=abc\n"
            b"__REALTIME_TIMESTAMP=1519234013000001\n"
            b"_SYSTEMD_UNIT=nginx.service\n"
            b"PRIORITY=6\n"
            b"MESSAGE=hello world\n"
            b"\n"
            b"__REALTIME_TIMESTAMP=1519234014000000\n"
            b"PRIORITY=3\n"
            b"MESSAGE\n" + len(msg2).to_bytes(8, "little") + msg2 + b"\n"
            b"\n"
        )
        p = tmp_path / "dump.export"
        p.write_bytes(data)
        return str(p)

    def test_export_parse_and_dynamic_tag(self, tmp_path):
        from fluent_bit_ray.parsers import DEFAULT_REGISTRY
        from fluent_bit_ray.pipelines.config import build_input

        ds, _ = build_input(
            {"name": ["systemd"], "path": [self._dump(tmp_path)],
             "tag": ["journal.*"]},
            DEFAULT_REGISTRY,
        )
        rows = sorted(ds.take_all(), key=lambda r: r["_time"])
        assert len(rows) == 2
        assert rows[0]["_tag"] == "journal.nginx.service"
        assert rows[0]["MESSAGE"] == "hello world"
        assert rows[0]["_time"] == 1519234013000001 * 1000
        assert rows[0]["PRIORITY"] == "6"
        assert "__CURSOR" not in rows[0]  # synthetic fields excluded
        # second entry: no unit -> 'unknown'; binary field decoded
        assert rows[1]["_tag"] == "journal.unknown"
        assert rows[1]["MESSAGE"] == "line one\nline two"
