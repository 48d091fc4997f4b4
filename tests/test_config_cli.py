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
        with pytest.raises(ValueError, match="unsupported input plugin"):
            run_config("[INPUT]\n    Name cpu\n[OUTPUT]\n    Name null\n")


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
