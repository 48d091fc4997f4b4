"""PipelineResult.metrics — the /api/v1/metrics shape analog
(src/flb_metrics_exporter.c + flb_input.c:177-178 / flb_output.c:305-310
counter titles). Pins the nested dict, the PRE-FILTER input counting
order (flb_input.h:570-590: metrics sum, THEN flb_filter_do), and the
per-instance keying."""

import pytest

from fluent_bit_ray.pipelines.config import run_config


@pytest.mark.usefixtures("ray_session")
class TestMetricsSnapshot:
    def test_shape_and_prefilter_input_counting(self, tmp_path):
        log = tmp_path / "in.log"
        log.write_text("a=1\nb=2\ndrop=3\nnotkv\n")
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

[FILTER]
    Name    grep
    Match   *
    Exclude k drop

[OUTPUT]
    Name   counter
    Match  *
"""
        res = run_config(conf)
        # input counts BEFORE the grep filter ran: all 4 physical lines
        # (incl. the parse-failure raw line), not the 3 surviving records
        assert res.metrics["input"]["tail.0"]["records"] == 4
        # bytes follows the engine's bytes_col convention (the weblog
        # flowcounter plane): length of the surviving raw-text column —
        # here only the parse-failure row keeps its `log` ("notkv", 5);
        # parsed rows became fields. The faithful cross-checked counter
        # is records (the oracle's plane); bytes is engine-defined.
        assert res.metrics["input"]["tail.0"]["bytes"] == len("notkv")
        out = res.metrics["output"]["counter_0"]
        assert out["proc_records"] == 3  # drop=3 grepped out
        assert set(out) == {
            "proc_records", "proc_bytes", "errors", "retries",
            "retries_failed",
        }
        assert out["errors"] == 0 and out["retries"] == 0

    def test_multiple_instances_keyed_separately(self, tmp_path):
        l1 = tmp_path / "one.log"
        l1.write_text("x\n")
        l2 = tmp_path / "two.log"
        l2.write_text("y\nz\n")
        conf = f"""
[INPUT]
    Name tail
    Path {l1}
    Tag  a.one

[INPUT]
    Name tail
    Path {l2}
    Tag  a.two

[OUTPUT]
    Name  counter
    Match a.one

[OUTPUT]
    Name  null
    Match *
"""
        res = run_config(conf)
        assert res.metrics["input"]["tail.0"]["records"] == 1
        assert res.metrics["input"]["tail.1"]["records"] == 2
        assert res.metrics["output"]["counter_0"]["proc_records"] == 1
        assert res.metrics["output"]["null_1"]["proc_records"] == 3
