"""Parser engine tests: stock parsers, decoders, batch/row equivalence.

Black-box style mirrors the reference's runtime tests (tests/runtime/
filter_parser.c and the kubernetes golden corpus docker lines).
"""

import numpy as np
import pyarrow as pa
import pytest

from fluent_bit_ray.parsers import (
    DEFAULT_REGISTRY,
    NAT,
    DecoderRule,
    Parser,
    apply_decoders,
)

APACHE_LINE = (
    '192.168.1.1 - alice [21/Feb/2018:17:26:53 +0000] '
    '"GET /index.html HTTP/1.0" 200 3477'
)
APACHE_LINE_FULL = (
    '10.0.0.9 - - [21/Feb/2018:17:26:54 -0600] '
    '"POST /submit HTTP/1.0" 500 12 "http://ref.example" "curl/7.58"'
)
DOCKER_LINE = (
    '{"log":"192.168.1.1 - - [21/Feb/2018:17:26:53 +0000] '
    '\\"GET / HTTP/1.0\\" 200 777\\n","stream":"stdout",'
    '"time":"2018-02-21T17:26:53.360920913Z"}'
)
SYSLOG_LINE = "<6>Feb 21 17:26:53 myhost myapp[1234]: hello from syslog"


class TestApacheParser:
    def setup_method(self):
        self.p = DEFAULT_REGISTRY.get("apache")

    def test_basic(self):
        ts, rec = self.p.parse_row(APACHE_LINE)
        assert ts == 1519234013 * 10**9
        assert rec == {
            "host": "192.168.1.1",
            "user": "alice",
            "method": "GET",
            "path": "/index.html",
            "code": "200",
            "size": "3477",
            "referer": "",
            "agent": "",
        }
        # time dropped (Time_Keep default Off); non-participating optional
        # captures emit EMPTY strings (onig cb semantics, flb_regex.c:29-58)
        assert "time" not in rec

    def test_full_with_referer(self):
        ts, rec = self.p.parse_row(APACHE_LINE_FULL)
        assert ts == (1519234014 + 6 * 3600) * 10**9
        assert rec["referer"] == "http://ref.example"
        assert rec["agent"] == "curl/7.58"

    def test_failure(self):
        ts, rec = self.p.parse_row("not an apache line at all")
        assert rec is None and ts is None

    def test_batch_matches_rows(self):
        lines = [APACHE_LINE, APACHE_LINE_FULL, "garbage", None]
        out = self.p.parse_batch(lines)
        assert list(out["_parse_ok"]) == [True, True, False, False]
        assert out["_time"][0] == 1519234013 * 10**9
        assert out["_time"][2] == NAT
        # field columns may be lists OR Arrow arrays (the RE2 fast path
        # keeps them Arrow end-to-end)
        host = out["host"]
        host = host.to_pylist() if hasattr(host, "to_pylist") else host
        assert host == ["192.168.1.1", "10.0.0.9", None, None]
        ref = out["referer"]
        ref = ref.to_pylist() if hasattr(ref, "to_pylist") else ref
        assert ref == ["", "http://ref.example", None, None]
        assert "time" not in out


class TestDockerParser:
    def setup_method(self):
        self.p = DEFAULT_REGISTRY.get("docker")

    def test_row(self):
        ts, rec = self.p.parse_row(DOCKER_LINE)
        assert ts == 1519234013 * 10**9 + 360920913
        # Decode_Field_As escaped log -> quotes unescaped, newline real
        assert rec["log"] == (
            '192.168.1.1 - - [21/Feb/2018:17:26:53 +0000] "GET / HTTP/1.0" 200 777\n'
        )
        assert rec["stream"] == "stdout"
        # Time_Keep On keeps the raw time field
        assert rec["time"] == "2018-02-21T17:26:53.360920913Z"

    def test_batch(self):
        out = self.p.parse_batch([DOCKER_LINE, "{bad json", '"a string"'])
        assert list(out["_parse_ok"]) == [True, False, False]
        assert out["log"][0].endswith("777\n")
        assert out["time"][0] == "2018-02-21T17:26:53.360920913Z"

    def test_batch_arrow_input(self):
        # json/ltsv parse_batch must accept an Arrow column directly (the
        # map_batches boundary hands Arrow arrays; the regex path already
        # did) — including nulls, empties, and truncated escapes
        import pyarrow as pa

        out = self.p.parse_batch(
            pa.array([DOCKER_LINE, '{"log":"trunc \\', None, ""])
        )
        assert list(out["_parse_ok"]) == [True, False, False, False]
        assert out["log"][0].endswith("777\n")

    def test_batch_arrow_input_ltsv(self):
        import pyarrow as pa

        from fluent_bit_ray.parsers.core import Parser

        p = Parser(name="l", fmt="ltsv", fields=["host", "status"])
        out = p.parse_batch(pa.array(["host:a\tstatus:200", "notltsv", None]))
        assert list(out["_parse_ok"]) == [True, False, False]
        assert out["host"][0] == "a"


class TestSyslogParser:
    def test_year_injection(self):
        p = DEFAULT_REGISTRY.get("syslog-rfc3164")
        ts, rec = p.parse_row(SYSLOG_LINE, now_year=2018)
        assert ts == 1519234013 * 10**9
        assert rec["pri"] == "6"
        assert rec["host"] == "myhost"
        assert rec["ident"] == "myapp"
        assert rec["pid"] == "1234"
        assert rec["message"] == "hello from syslog"
        assert rec["time"] == "Feb 21 17:26:53"  # Time_Keep On


class TestTypesAndLtsv:
    def test_types_casting(self):
        p = Parser(
            name="t",
            fmt="regex",
            regex=r"^(?<word>[a-z]+) (?<num>\d+) (?<flag>\S+)$",
            types={"num": "integer", "flag": "bool"},
        )
        _, rec = p.parse_row("abc 42 true")
        assert rec == {"word": "abc", "num": 42, "flag": True}
        out = p.parse_batch(["abc 42 true", "zz 7 false"])
        assert out["num"].to_pylist() == [42, 7]
        assert out["flag"].to_pylist() == [True, False]

    def test_ltsv(self):
        p = Parser(name="l", fmt="ltsv", fields=["host", "req", "status"])
        _, rec = p.parse_row("host:1.2.3.4\treq:GET /\tstatus:200")
        assert rec == {"host": "1.2.3.4", "req": "GET /", "status": "200"}
        out = p.parse_batch(["host:a\treq:r\tstatus:200", "notltsv"])
        assert list(out["_parse_ok"]) == [True, False]


class TestDecoders:
    def test_decode_field_json_appends_extra_keys_at_end(self):
        rules = [DecoderRule("field", "json", "log")]
        rec = {"a": 1, "log": '{\\"k\\":\\"v\\",\\"n\\":2}', "z": "last"}
        out = apply_decoders(rules, rec)
        # original field keeps its original value; decoded keys appended
        assert list(out.keys()) == ["a", "log", "z", "k", "n"]
        assert out["log"] == rec["log"]
        assert out["k"] == "v" and out["n"] == 2

    def test_decode_field_as_json_replaces_value(self):
        rules = [DecoderRule("field_as", "json", "log")]
        out = apply_decoders(rules, {"log": '{"k":1}'})
        assert out["log"] == {"k": 1}

    def test_try_next_chain(self):
        rules = [
            DecoderRule("field", "json", "log", "try_next"),
            DecoderRule("field_as", "escaped", "log"),
        ]
        out = apply_decoders(rules, {"log": "plain \\n text"})
        assert out["log"] == "plain \n text"

    def test_non_string_untouched(self):
        rules = [DecoderRule("field_as", "escaped", "log")]
        out = apply_decoders(rules, {"log": 42})
        assert out["log"] == 42


class TestConfLoader:
    def test_roundtrip(self):
        from fluent_bit_ray.parsers import ParserRegistry

        reg = ParserRegistry()
        reg.load_conf(
            """
[PARSER]
    Name   mini
    Format regex
    Regex  ^(?<k>\\S+) (?<v>\\d+)$
    Types  v:integer
"""
        )
        _, rec = reg.get("mini").parse_row("x 5")
        assert rec == {"k": "x", "v": 5}


class TestMultiDocJson:
    """flb_pack_json_state analog: concatenated-JSON tokenizing."""

    def test_multiple_docs_one_buffer(self):
        from fluent_bit_ray.parsers.multidoc import consume_json_stream

        docs, used = consume_json_stream('{"a":1}{"b":2} {"c":3}')
        assert docs == [{"a": 1}, {"b": 2}, {"c": 3}]
        assert used == len('{"a":1}{"b":2} {"c":3}')

    def test_partial_tail_unconsumed(self):
        from fluent_bit_ray.parsers.multidoc import consume_json_stream

        buf = '{"a":1}{"b":'
        docs, used = consume_json_stream(buf)
        assert docs == [{"a": 1}]
        assert buf[used:] == '{"b":'  # pending tail kept for the next read

    def test_non_map_docs_filtered(self):
        from fluent_bit_ray.parsers.multidoc import concat_json_records

        assert concat_json_records('3 {"a":1} [1,2] {"b":2}') == [
            {"a": 1}, {"b": 2}
        ]

    def test_whitespace_and_empty(self):
        from fluent_bit_ray.parsers.multidoc import consume_json_stream

        assert consume_json_stream("  \n\t ") == ([], 5)
        assert consume_json_stream("") == ([], 0)


class TestArrowRegexFastPathParity:
    """The RE2 batch fast path must agree exactly with the Python engine
    (the parity reference) — including no-match rows, non-participating
    groups, empty strings, multiline payloads, and non-ASCII rows (which
    the fast path must route back through the Python engine because RE2
    character classes are ASCII-only)."""

    def _both(self, parser, values):
        import numpy as np

        n = len(values)
        import pyarrow as pa

        ok_fast = np.zeros(n, dtype=bool)
        cols_fast = parser._regex_batch_arrow(values, ok_fast)
        assert cols_fast is not None, "pattern unexpectedly not RE2-compatible"
        cols_fast = {
            f: (c.to_pylist() if isinstance(c, pa.Array) else c)
            for f, c in cols_fast.items()
        }
        ok_slow = np.zeros(n, dtype=bool)
        cols_slow = {f: [None] * n for f in parser._re.groupindex}
        parser._regex_batch_python(values, ok_slow, cols_slow, range(n))
        return (ok_fast.tolist(), cols_fast), (ok_slow.tolist(), cols_slow)

    def test_apache_corpus_parity(self):
        from fluent_bit_ray.parsers.core import DEFAULT_REGISTRY

        p = DEFAULT_REGISTRY.get("apache")
        values = [
            APACHE_LINE, APACHE_LINE_FULL, "garbage", None, "",
            'h - - [x] "GET /a" 200 1',           # no optional tail
            "line1\n" + APACHE_LINE,               # multiline: ^ anchors line 2
            APACHE_LINE.replace("GET", "GÉT"),  # non-ASCII -> python row
            "h x - - [t] \"GET /\" 200 5",   # NBSP inside [^ ]* span
        ]
        fast, slow = self._both(p, values)
        assert fast == slow

    def test_syslog_parity(self):
        from fluent_bit_ray.parsers.core import DEFAULT_REGISTRY

        p = DEFAULT_REGISTRY.get("syslog-rfc3164")
        values = ["<13>Feb 21 17:26:53 host app[1]: hello", "junk", None, ""]
        fast, slow = self._both(p, values)
        assert fast == slow

    def test_non_re2_pattern_falls_back(self):
        import numpy as np

        from fluent_bit_ray.parsers.core import Parser

        p = Parser(name="backref", fmt="regex", regex=r"(?<a>\w+) \1")
        ok = np.zeros(1, dtype=bool)
        assert p._regex_batch_arrow(["x x"], ok) is None  # backref: RE2 no
        # and the full parse_batch still works via the python engine
        out = p.parse_batch(["x x", "y z"])
        assert list(out["_parse_ok"]) == [True, False]
        assert out["a"] == ["x", None]
