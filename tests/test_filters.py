"""Filter-chain tests: each filter's batch path vs its row-oracle twin.

Mirrors the reference's runtime black-box tests (tests/runtime/filter_*.c):
synthetic records through the filter, asserted on observable output.
Convention under test: NULL column value == absent key.
"""

import pyarrow as pa
import pytest

from fluent_bit_ray.router import Route, Router, compute_tags, host_from_url, router_match
from fluent_bit_ray.stages import (
    FilterChain,
    GrepFilter,
    HostEnricher,
    ModifyFilter,
    NestFilter,
    ParserFilter,
    RecordModifierFilter,
)
from fluent_bit_ray.parsers import DEFAULT_REGISTRY


def _clean(v):
    if isinstance(v, list) and all(isinstance(x, tuple) for x in v):
        v = dict(v)  # arrow map -> dict (empty list == empty map here)
    if isinstance(v, dict):
        return {k: _clean(x) for k, x in v.items() if x is not None}
    return v


def to_records(table: pa.Table) -> list[dict]:
    """Rows as dicts with nulls dropped recursively (null == absent key)."""
    return [
        {k: _clean(v) for k, v in row.items() if v is not None}
        for row in table.to_pylist()
    ]


def oracle_records(filt, table: pa.Table) -> list[dict]:
    out = []
    for rec in to_records(table):
        r = filt.process_row(rec)
        if r is not None:
            out.append({k: _clean(v) for k, v in r.items() if v is not None})
    return out


SAMPLE = pa.table(
    {
        "log": ["error: disk full", "ok fine", "error: cpu", None, "warn"],
        "level": ["error", "info", "error", "debug", None],
        "code": [500, 200, 503, 200, 404],
    }
)


class TestGrep:
    def test_regex_keep(self):
        f = GrepFilter([("regex", "log", "^error")])
        got = to_records(f.process_batch(SAMPLE))
        assert got == oracle_records(f, SAMPLE)
        assert [r["log"] for r in got] == ["error: disk full", "error: cpu"]

    def test_exclude(self):
        f = GrepFilter([("exclude", "level", "debug|info")])
        got = to_records(f.process_batch(SAMPLE))
        assert got == oracle_records(f, SAMPLE)
        # missing field (null log row) kept by exclude
        assert len(got) == 3

    def test_rule_order_and_missing_field(self):
        f = GrepFilter([("regex", "nope", ".")])
        assert f.process_batch(SAMPLE).num_rows == 0

    def test_non_string_column_regex_drops(self):
        f = GrepFilter([("regex", "code", "5")])
        assert f.process_batch(SAMPLE).num_rows == 0


class TestRecordModifier:
    def test_remove_and_record(self):
        f = RecordModifierFilter(remove_keys=["lev*"], records=[("site", "x1")])
        got = to_records(f.process_batch(SAMPLE))
        assert got == oracle_records(f, SAMPLE)
        assert all("level" not in r and r["site"] == "x1" for r in got)

    def test_whitelist(self):
        f = RecordModifierFilter(whitelist_keys=["log"])
        got = to_records(f.process_batch(SAMPLE))
        assert got == oracle_records(f, SAMPLE)
        assert set().union(*(set(r) for r in got)) == {"log"}


class TestModify:
    def test_conditional_set_and_rename(self):
        f = ModifyFilter(
            rules=[("set", "level", "ERROR"), ("rename", "log", "message")],
            conditions=[("key_value_equals", "level", "error")],
        )
        got = to_records(f.process_batch(SAMPLE))
        assert got == oracle_records(f, SAMPLE)
        assert got[0]["level"] == "ERROR" and got[0]["message"] == "error: disk full"
        assert "log" not in got[0]
        # non-matching rows untouched
        assert got[1]["level"] == "info" and got[1]["log"] == "ok fine"

    def test_add_only_when_absent(self):
        f = ModifyFilter(rules=[("add", "level", "none")])
        got = to_records(f.process_batch(SAMPLE))
        assert got == oracle_records(f, SAMPLE)
        assert got[4]["level"] == "none"
        assert got[0]["level"] == "error"

    def test_soft_rename_respects_existing(self):
        t = pa.table({"a": ["1", "2"], "b": [None, "keep"]})
        f = ModifyFilter(rules=[("rename", "a", "b")])
        got = to_records(f.process_batch(t))
        assert got == oracle_records(f, t)
        assert got == [{"b": "1"}, {"a": "2", "b": "keep"}]

    def test_hard_rename_and_copies(self):
        t = pa.table({"a": ["1", None], "b": ["x", "y"]})
        for op, expect0 in [
            ("hard_rename", {"b": "1"}),
            ("copy", {"a": "1", "b": "x"}),
            ("hard_copy", {"a": "1", "b": "1"}),
        ]:
            f = ModifyFilter(rules=[(op, "a", "b")])
            got = to_records(f.process_batch(t))
            assert got == oracle_records(f, t), op
            assert got[0] == expect0, op

    def test_remove_wildcard(self):
        t = pa.table({"k1": ["a"], "k2": ["b"], "other": ["c"]})
        f = ModifyFilter(rules=[("remove_wildcard", "k")])
        assert to_records(f.process_batch(t)) == [{"other": "c"}]


class TestNest:
    def test_nest_then_lift_roundtrip(self):
        t = pa.table(
            {"kube_pod": ["p1", None], "kube_ns": ["default", "sys"], "log": ["a", "b"]}
        )
        nest = NestFilter("nest", wildcard=["kube_*"], nest_under="kubernetes")
        nested = nest.process_batch(t)
        got = to_records(nested)
        assert got == oracle_records(nest, t)
        assert got[0]["kubernetes"] == {"kube_pod": "p1", "kube_ns": "default"}
        lift = NestFilter("lift", nested_under="kubernetes")
        back = to_records(lift.process_batch(nested))
        assert back == oracle_records(lift, nested)
        assert back[0] == {"log": "a", "kube_pod": "p1", "kube_ns": "default"}

    def test_nest_all_null_gives_absent_submap(self):
        t = pa.table({"kube_pod": [None], "log": ["x"]})
        nest = NestFilter("nest", wildcard=["kube_*"], nest_under="k")
        got = to_records(nest.process_batch(t))
        assert got == [{"log": "x"}]


class TestParserFilter:
    def test_parse_field_with_fallback_chain(self):
        apache = DEFAULT_REGISTRY.get("apache")
        docker = DEFAULT_REGISTRY.get("docker")
        t = pa.table(
            {
                "text": [
                    '1.2.3.4 - - [21/Feb/2018:17:26:53 +0000] "GET /a HTTP/1.0" 200 5',
                    '{"log":"hello\\n","stream":"stdout","time":"2018-02-21T17:26:53.5Z"}',
                    "unparseable junk",
                ],
                "lang": ["en", "de", "fr"],
            }
        )
        f = ParserFilter("text", [apache, docker], reserve_data=True)
        out = f.process_batch(t)
        got = to_records(out)
        assert got == oracle_records(f, t)
        assert got[0]["host"] == "1.2.3.4" and got[0]["lang"] == "en"
        assert got[1]["log"] == "hello\n" and got[1]["stream"] == "stdout"
        # failure row passes unchanged
        assert got[2]["text"] == "unparseable junk" and not got[2]["_parse_ok"]
        assert got[0]["_time"] == 1519234013 * 10**9
        assert got[1]["_time"] == 1519234013 * 10**9 + 500_000_000

    def test_no_reserve_drops_originals(self):
        apache = DEFAULT_REGISTRY.get("apache")
        t = pa.table(
            {
                "text": ['1.2.3.4 - - [21/Feb/2018:17:26:53 +0000] "GET /a HTTP/1.0" 200 5'],
                "lang": ["en"],
            }
        )
        f = ParserFilter("text", [apache], reserve_data=False)
        got = to_records(f.process_batch(t))
        assert got == oracle_records(f, t)
        assert "lang" not in got[0] and "text" not in got[0]
        assert got[0]["code"] == "200"


class TestEnrich:
    LOOKUP = {
        "h1.example.com": {"geo": "us", "org": "acme", "labels": {"a": "1"}},
        "h2.example.org": {"geo": "eu", "org": "globex", "labels": {}},
    }

    def test_hit_and_miss(self):
        t = pa.table({"host": ["h1.example.com", "h2.example.org", "h9.example.io"]})
        f = HostEnricher(self.LOOKUP)
        got = to_records(f.process_batch(t))
        oracle = [
            {k: v for k, v in f.process_row(r).items() if v is not None}
            for r in to_records(t)
        ]
        assert got == oracle
        assert got[0]["meta"] == {"geo": "us", "org": "acme", "labels": {"a": "1"}}
        assert "meta" not in got[2]  # miss -> null struct


class TestRouter:
    def test_match_semantics(self):
        assert router_match("web.en.h1.example.com", "web.en.*")
        assert router_match("abc", "*")
        assert router_match("abc", "a*c")
        assert not router_match("abc", "a*d")
        assert router_match("aXbXc", "a*b*c")
        assert not router_match("web.de.x", "web.en.*")
        assert router_match("x", "x")
        assert not router_match("xy", "x")
        # '*' crosses dots (no path semantics)
        assert router_match("web.en.host", "web.*host")

    def test_masks_and_fanout(self):
        router = Router(
            [
                Route("sink_en", ("web.en.*",)),
                Route("sink_intl", ("web.de.*", "web.fr.*")),
                Route("sink_all", ("*",)),
            ]
        )
        tags = pa.array(["web.en.a", "web.de.b", "web.xx.c"])
        masks = router.masks(tags)
        assert masks["sink_en"].to_pylist() == [True, False, False]
        assert masks["sink_intl"].to_pylist() == [False, True, False]
        assert masks["sink_all"].to_pylist() == [True, True, True]
        assert router.route_row("web.de.b") == ["sink_intl", "sink_all"]

    def test_compute_tags_and_host(self):
        urls = pa.array(["https://h1.example.com/x", "https://h2.org/y"])
        hosts = host_from_url(urls)
        assert hosts.to_pylist() == ["h1.example.com", "h2.org"]
        tags = compute_tags(pa.array(["en", "de"]), hosts)
        assert tags.to_pylist() == ["web.en.h1.example.com", "web.de.h2.org"]


class TestFilterChain:
    def test_chain_with_tag_match(self):
        t = pa.table(
            {
                "_tag": ["web.en.a", "web.de.b", "web.en.c"],
                "log": ["x", "y", "z"],
            }
        )
        chain = FilterChain(
            [
                ("web.en.*", RecordModifierFilter(records=[("en_only", "1")])),
                ("*", RecordModifierFilter(records=[("all", "1")])),
            ]
        )
        got = to_records(chain.apply_batch(t))
        # column-set change applies batch-wide; VALUES only on matched rows
        assert all(r["all"] == "1" for r in got)
        assert got[0]["en_only"] == "1"
