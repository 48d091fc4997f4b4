"""Unit tests for the pure scalar kernels (escape / time / typecast).

Time-format cases mirror the reference's table-driven tests
(tests/internal/parser.c:26-60): tz offsets incl. ±hh:mm, fractional seconds,
year injection.
"""

import numpy as np
import pyarrow as pa
import pytest

from fluent_bit_ray.functions import (
    TimeFormat,
    cast_column,
    flb_json_escape,
    parse_time_column,
    parse_time_str,
    typecast_value,
    unescape_string,
    unescape_string_utf8,
)


class TestJsonEscape:
    def test_plain(self):
        assert flb_json_escape("hello world") == "hello world"

    def test_quote_backslash(self):
        assert flb_json_escape('a"b\\c') == 'a\\"b\\\\c'

    def test_short_controls(self):
        assert flb_json_escape("\n\t\r\b\f\a\v") == "\\n\\t\\r\\b\\f\\a\\v"

    def test_other_controls(self):
        assert flb_json_escape("\x00\x1f\x7f") == "\\u0000\\u001f\\u007f"

    def test_bmp_unicode_lower_hex(self):
        assert flb_json_escape("é") == "\\u00e9"
        assert flb_json_escape("日") == "\\u65e5"

    def test_astral_raw_codepoint_not_surrogate(self):
        # reference emits the raw codepoint hex (src/flb_utils.c:607-612)
        assert flb_json_escape("\U0001F600") == "\\u1f600"


class TestUnescape:
    def test_known_escapes(self):
        assert unescape_string("a\\nb\\tc") == "a\nb\tc"

    def test_backslash_dropped_for_unknown(self):
        assert unescape_string('\\"x\\q') == '"xq'

    def test_double_backslash_then_n(self):
        # \\n -> first backslash dropped, then \n -> newline (reference quirk)
        assert unescape_string("\\\\n") == "\n"

    def test_trailing_backslash_dropped(self):
        assert unescape_string("abc\\") == "abc"

    def test_no_escape_passthrough_identity(self):
        s = "no escapes here"
        assert unescape_string(s) is s

    def test_utf8_unicode_escape(self):
        assert unescape_string_utf8("caf\\u00e9") == "café"
        assert unescape_string_utf8("\\x41\\102") == "AB"

    def test_utf8_json_escape_kept_literal(self):
        assert unescape_string_utf8('a\\"b') == 'a\\"b'
        assert unescape_string_utf8("a\\nb") == "a\nb"


APACHE_FMT = "%d/%b/%Y:%H:%M:%S %z"
DOCKER_FMT = "%Y-%m-%dT%H:%M:%S.%L"
SYSLOG_FMT = "%b %d %H:%M:%S"


class TestTimeParse:
    def test_apache_utc(self):
        tf = TimeFormat(APACHE_FMT)
        # 2018-02-21T17:26:53Z == 1519234013
        assert parse_time_str("21/Feb/2018:17:26:53 +0000", tf) == 1519234013 * 10**9

    def test_apache_positive_offset(self):
        tf = TimeFormat(APACHE_FMT)
        # +05:30 east -> epoch is 5.5h earlier
        assert (
            parse_time_str("21/Feb/2018:17:26:53 +0530", tf)
            == (1519234013 - 19800) * 10**9
        )

    def test_apache_negative_offset(self):
        tf = TimeFormat(APACHE_FMT)
        assert (
            parse_time_str("21/Feb/2018:17:26:53 -0600", tf)
            == (1519234013 + 21600) * 10**9
        )

    def test_docker_fractional_ns_and_z(self):
        tf = TimeFormat(DOCKER_FMT)
        got = parse_time_str("2018-02-21T17:26:53.360920913Z", tf)
        assert got == 1519234013 * 10**9 + 360920913

    def test_docker_frac_with_offset(self):
        tf = TimeFormat(DOCKER_FMT)
        got = parse_time_str("2018-02-21T17:26:53.5+01:00", tf)
        assert got == (1519234013 - 3600) * 10**9 + 500_000_000

    def test_year_injection(self):
        tf = TimeFormat(SYSLOG_FMT)
        # "Feb 21 17:26:53" + injected year 2018
        assert parse_time_str("Feb 21 17:26:53", tf, now_year=2018) == 1519234013 * 10**9

    def test_year_injection_double_space_day(self):
        tf = TimeFormat(SYSLOG_FMT)
        got = parse_time_str("Feb  5 01:02:03", tf, now_year=2018)
        assert got == 1517792523 * 10**9

    def test_time_offset_applied_when_no_tz(self):
        tf = TimeFormat("%Y-%m-%d %H:%M:%S", time_offset=3600)
        assert parse_time_str("2018-02-21 18:26:53", tf) == (1519234013) * 10**9

    def test_unparseable_returns_none(self):
        tf = TimeFormat(APACHE_FMT)
        assert parse_time_str("not a time", tf) is None

    def test_column(self):
        tf = TimeFormat(APACHE_FMT)
        arr = parse_time_column(
            ["21/Feb/2018:17:26:53 +0000", None, "garbage"], tf
        )
        assert arr[0] == 1519234013 * 10**9
        assert arr[1] == np.iinfo(np.int64).min
        assert arr[2] == np.iinfo(np.int64).min


class TestTypecast:
    @pytest.mark.parametrize(
        "val,typ,expected",
        [
            ("123", "integer", 123),
            ("-7", "integer", -7),
            ("12abc", "integer", 12),
            ("abc", "integer", 0),
            ("3.5", "float", 3.5),
            ("junk", "float", 0.0),
            ("ff", "hex", 255),
            ("0xFF", "hex", 255),
            ("zz", "hex", 0),
            ("true", "bool", True),
            ("FALSE", "bool", False),
            ("trueish", "bool", True),  # prefix match, like the C strncasecmp
            ("nope", "bool", "nope"),  # cast error keeps string
            ("x", "string", "x"),
        ],
    )
    def test_scalar(self, val, typ, expected):
        assert typecast_value(val, typ) == expected

    def test_column_matches_scalar(self):
        vals = ["123", "-7", "12abc", "abc", None]
        col = cast_column(pa.array(vals), "integer")
        assert col.to_pylist() == [123, -7, 12, 0, None]

        fvals = ["3.5", "junk", "1e3", None]
        col = cast_column(pa.array(fvals), "float")
        assert col.to_pylist() == [3.5, 0.0, 1000.0, None]

    def test_bool_column_clean(self):
        col = cast_column(pa.array(["true", "FALSE", "True"]), "bool")
        assert col.to_pylist() == [True, False, True]

    def test_bool_column_with_error_degrades_to_string(self):
        col = cast_column(pa.array(["true", "nope"]), "bool")
        assert col.to_pylist() == ["true", "nope"]
