"""Time tables ported from the reference's internal parser tests
(tests/internal/parser.c:26-97 + tests/internal/data/parser/regex.conf):
timezone offsets, year injection, fractional seconds, fixed UTC offsets —
each (format, value, epoch, frac, utc_offset) row asserted against
TimeFormat.parse.
"""

import pytest

from fluent_bit_ray.functions.timeparse import TimeFormat, _parse_tz

# tz_entries_ok (parser.c:26-32): value -> seconds east
TZ_OK = [
    ("+0000", 0),
    ("+00:00", 0),
    ("+00:59", 3540),
    ("-0600", -21600),
    ("-06:00", -21600),
]

# time_entries (parser.c:54-97): (Time_Format, value, epoch, frac, utc_offset)
TIME_ENTRIES = [
    # year injection (old syslog); reference runs these with now in 2017
    ("%b %d %H:%M:%S", "Feb 16 04:06:58", 1487239618, 0, -21600),
    ("%b %d %H:%M:%S.%L", "Feb 16 04:06:58.1234", 1487239618, 0.1234, -21600),
    ("%b %d %H:%M:%S %z", "Feb 16 04:06:58 -0600", 1487239618, 0, 0),
    ("%b %d %H:%M:%S.%L %z", "Feb 16 04:06:58.1234 -0600", 1487239618, 0.1234, 0),
    # same instant across timezones
    ("%m/%d/%Y %H:%M:%S %z", "07/17/2017 20:17:03 +0000", 1500322623, 0, 0),
    ("%m/%d/%Y %H:%M:%S %z", "07/18/2017 01:47:03 +0530", 1500322623, 0, 0),
    ("%m/%d/%Y %H:%M:%S %z", "07/18/2017 01:47:03 +05:30", 1500322623, 0, 0),
    ("%m/%d/%Y %H:%M:%S %z", "07/18/2017 05:17:03 +0900", 1500322623, 0, 0),
    ("%m/%d/%Y %H:%M:%S %z", "07/17/2017 22:17:03 +0200", 1500322623, 0, 0),
    ("%m/%d/%Y %H:%M:%S.%L %z", "07/17/2017 22:17:03.1 +0200", 1500322623, 0.1, 0),
    ("%m/%d/%Y %H:%M:%S.%L %z", "07/17/2017 22:17:03.1 +02:00", 1500322623, 0.1, 0),
    # fixed Time_Offset, no tz in the value
    ("%m/%d/%Y %H:%M:%S", "07/18/2017 01:47:03", 1500322623, 0, 19800),
    ("%m/%d/%Y %H:%M:%S", "07/18/2017 05:17:03", 1500322623, 0, 32400),
    ("%m/%d/%Y %H:%M:%S", "07/17/2017 22:17:03", 1500322623, 0, 7200),
    ("%m/%d/%Y %H:%M:%S.%L", "07/17/2017 22:17:03.1", 1500322623, 0.1, 7200),
    # default UTC, incl. literal Z suffixes
    ("%m/%d/%Y %H:%M:%S", "07/17/2017 20:17:03", 1500322623, 0, 0),
    ("%m/%d/%Y %H:%M:%SZ", "07/17/2017 20:17:03Z", 1500322623, 0, 0),
    ("%m/%d/%Y %H:%M:%S.%LZ", "07/17/2017 20:17:03.1234Z", 1500322623, 0.1234, 0),
]


class TestReferenceTzTable:
    @pytest.mark.parametrize("val,diff", TZ_OK)
    def test_tz_ok(self, val, diff):
        assert _parse_tz(val) == diff

    def test_tz_invalid_minutes_rejected_in_formats(self):
        # '+00:90' must not parse as a %z capture (parser.c tz_entries_error)
        tf = TimeFormat("%Y-%m-%d %H:%M:%S %z")
        assert tf.parse("2017-07-17 20:17:03 +00:90", 2017) is None


class TestReferenceTimeTable:
    @pytest.mark.parametrize("fmt,value,epoch,frac,offset", TIME_ENTRIES)
    def test_entry(self, fmt, value, epoch, frac, offset):
        tf = TimeFormat(fmt, time_offset=offset)
        got = tf.parse(value, now_year=2017)
        assert got is not None, (fmt, value)
        expected = epoch * 10**9 + int(round(frac * 10**9))
        assert got == expected, (fmt, value, got, expected)


class TestClfFastPathParity:
    """The pandas CLF fast path in parse_time_column must agree with the
    exact per-row parser on every input — including the rows it must route
    to the fallback (leap seconds, civil-days-normalized impossible dates,
    prefix-match trailing garbage, lowercase months)."""

    def test_column_matches_rowwise(self):
        import numpy as np

        from fluent_bit_ray.functions.timeparse import (
            TimeFormat,
            parse_time_column,
        )

        tf = TimeFormat("%d/%b/%Y:%H:%M:%S %z")
        values = [
            "21/Feb/2018:17:26:53 +0000",
            "21/Feb/2018:17:26:53 -0630",
            "31/Feb/2018:00:00:00 +0000",   # civil-days normalization
            "21/feb/2018:17:26:53 +0000",   # lowercase month
            "21/February/2018:17:26:53 +0000",
            "21/Feb/2018:17:26:60 +0000",   # leap second
            "21/Feb/2018:17:26:53 +0000 trailing",  # prefix match
            "99/Feb/2018:17:26:53 +0000",
            "garbage", "", None,
            "01/Jan/1970:00:00:00 +0000",
        ]
        col = parse_time_column(values, tf, 2018)
        NAT = np.iinfo(np.int64).min
        for i, v in enumerate(values):
            exact = tf.parse(v, 2018) if isinstance(v, str) else None
            want = NAT if exact is None else exact
            assert col[i] == want, (i, v, col[i], exact)
