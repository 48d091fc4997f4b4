"""Event-time parsing with fluent-bit `flb_parser_time_lookup` semantics.

Reference parity (studied, not copied): src/flb_parser.c:610-719 —
- year injection when the format lacks ``%Y`` (the record's year is taken
  from an injected deterministic "now", reference flb_parser.c:640-671;
  the reference uses wall-clock ``time(NULL)``, we require an explicit
  ``now`` for reproducibility — documented divergence);
- ``%L`` fractional seconds: the format is cut before ``.%L``, the fraction
  is parsed manually, and a trailing timezone (``Z`` / ``±hh:mm`` / ``±hhmm``)
  is honored (reference flb_parser.c:203-240, 677-709);
- when the format carries no ``%z`` and no fractional tz, the configured
  ``Time_Offset`` is applied (reference flb_parser.c:712-716);
- epoch = UTC-interpreted struct-tm minus gmtoff.

The format is compiled ONCE to an anchored regex (strptime is prefix-match in
C; Python's is full-match, hence the regex route), then applied per value.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional, Sequence

import numpy as np

_MONTHS = {
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5, "jun": 6,
    "jul": 7, "aug": 8, "sep": 9, "oct": 10, "nov": 11, "dec": 12,
}

# strptime token -> regex fragment (named groups consumed by _fields_to_epoch)
_TOKENS = {
    "%Y": r"(?P<Y>\d{4})",
    "%y": r"(?P<y>\d{2})",
    "%m": r"(?P<m>\d{1,2})",
    "%b": r"(?P<b>[A-Za-z]{3})",
    "%B": r"(?P<b>[A-Za-z]+)",
    "%d": r"(?P<d>\s?\d{1,2})",
    "%e": r"(?P<d>\s?\d{1,2})",
    "%H": r"(?P<H>\d{1,2})",
    "%M": r"(?P<M>\d{1,2})",
    "%S": r"(?P<S>\d{1,2})",
    # minutes restricted to 00-59: the reference rejects offsets like +00:90
    # (tests/internal/parser.c tz_entries_error)
    "%z": r"(?P<z>Z|[+-]\d{2}:?[0-5]\d)",
    "%%": "%",
}

# fractional-seconds tail: optional space before the tz, like the
# reference's frac_tzone handling of "…:58.1234 -0600"
_TZ_RE = re.compile(r"^\s*(Z|[+-]\d{2}:?[0-5]\d)")


def _days_from_civil(y: int, m: int, d: int) -> int:
    """Days since 1970-01-01 (proleptic Gregorian), Hinnant's civil algorithm."""
    y -= m <= 2
    era = (y if y >= 0 else y - 399) // 400
    yoe = y - era * 400
    doy = (153 * (m + (-3 if m > 2 else 9)) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def _parse_tz(z: str) -> int:
    """Offset string -> seconds east of UTC. 'Z' -> 0."""
    if z == "Z":
        return 0
    sign = -1 if z[0] == "-" else 1
    z = z[1:].replace(":", "")
    return sign * (int(z[:2]) * 3600 + int(z[2:4]) * 60)


def _compile_fmt(fmt: str) -> re.Pattern:
    """Compile an strptime-style format to an anchored-at-start regex.

    Literal whitespace in the format matches ``\\s+`` (C strptime skips runs
    of whitespace); ``%T`` expands to ``%H:%M:%S``.
    """
    fmt = fmt.replace("%T", "%H:%M:%S")
    out = []
    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%" and i + 1 < len(fmt):
            tok = fmt[i : i + 2]
            frag = _TOKENS.get(tok)
            if frag is None:
                raise ValueError(f"unsupported strptime token {tok!r} in {fmt!r}")
            out.append(frag)
            i += 2
        elif ch.isspace():
            out.append(r"\s+")
            while i < len(fmt) and fmt[i].isspace():
                i += 1
        else:
            out.append(re.escape(ch))
            i += 1
    return re.compile("".join(out))


@dataclass
class TimeFormat:
    """Compiled Time_Format + Time_Offset (+Time_Keep is handled by parsers)."""

    fmt: str
    time_offset: int = 0  # seconds east of UTC (parsed from e.g. "+0530")
    with_year: bool = field(init=False)
    with_tz: bool = field(init=False)
    frac_secs: bool = field(init=False)
    _regex: re.Pattern = field(init=False, repr=False)

    def __post_init__(self) -> None:
        fmt = self.fmt
        self.with_year = "%Y" in fmt or "%y" in fmt
        self.with_tz = "%z" in fmt
        self.frac_secs = "%L" in fmt
        if self.frac_secs:
            # cut the format right before ".%L" (reference flb_parser.c:203-219)
            idx = fmt.index("%L")
            if idx > 0 and fmt[idx - 1] == ".":
                idx -= 1
            fmt = fmt[:idx]
        if not self.with_year:
            fmt = "%Y " + fmt  # year-injection format (flb_parser.c:656-671)
        self._regex = _compile_fmt(fmt)

    def parse(self, value: str, now_year: int) -> Optional[int]:
        """Parse one time string -> epoch nanoseconds (UTC), or None."""
        if not self.with_year:
            value = f"{now_year} {value}"
        m = self._regex.match(value)
        if m is None:
            return None
        g = m.groupdict()
        if g.get("Y"):
            year = int(g["Y"])
        elif g.get("y"):
            yy = int(g["y"])  # POSIX strptime: 69-99 -> 1900s, 00-68 -> 2000s
            year = 1900 + yy if yy >= 69 else 2000 + yy
        else:
            year = 1970
        if g.get("b"):
            month = _MONTHS.get(g["b"][:3].lower())
            if month is None:
                return None
        else:
            month = int(g["m"]) if g.get("m") else 1
        day = int(g["d"]) if g.get("d") else 1
        hh = int(g["H"]) if g.get("H") else 0
        mm = int(g["M"]) if g.get("M") else 0
        ss = int(g["S"]) if g.get("S") else 0
        # range checks mirroring glibc strptime (which rejects out-of-range
        # components; the tokens above are \d{1,2} so e.g. %H=99 would
        # otherwise normalize into a garbage epoch). %S allows 60 (leap
        # second), like strptime's 0-60.
        if not (1 <= month <= 12 and 1 <= day <= 31 and hh <= 23
                and mm <= 59 and ss <= 60):
            return None

        ns = 0
        gmtoff: Optional[int] = _parse_tz(g["z"]) if g.get("z") else None

        if self.frac_secs:
            rest = value[m.end():]
            if rest.startswith("."):
                j = 1
                while j < len(rest) and rest[j].isdigit():
                    j += 1
                frac = rest[1:j]
                if frac:
                    ns = int(round(float("0." + frac) * 1_000_000_000))
                tzm = _TZ_RE.match(rest[j:])
                if tzm:
                    gmtoff = _parse_tz(tzm.group(1))

        if gmtoff is None:
            gmtoff = self.time_offset  # flb_parser.c:712-716

        epoch = (
            _days_from_civil(year, month, day) * 86400 + hh * 3600 + mm * 60 + ss - gmtoff
        )
        return epoch * 1_000_000_000 + ns


def parse_time_str(value: str, tf: TimeFormat, now_year: int = 2018) -> Optional[int]:
    """Convenience single-value wrapper. Returns epoch ns or None."""
    return tf.parse(value, now_year)


_NAT = np.iinfo(np.int64).min

# strings the pandas ISO8601 fast path is allowed to handle — anything not
# matching falls back to the exact per-row parser, so the fast path can never
# diverge from the reference semantics. A timezone is only allowed AFTER a
# fraction: the reference's cut-at-%L parser IGNORES a bare tz suffix
# (flb_parser.c frac branch requires '.'), while pandas would honor it; a
# trailing bare 'Z' is equivalent to the ignored-tz default offset 0 and
# stays allowed.
_ISO_SAFE = re.compile(
    r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d{1,9}(Z|[+-]\d{2}:?\d{2})?|Z)?$"
)




def parse_time_column(
    values: Sequence[Optional[str]], tf: TimeFormat, now_year: int = 2018
) -> np.ndarray:
    """Parse a column of time strings -> int64 epoch-ns array (NaT = int64 min).

    Hot-path structure:
    - ISO-8601-with-fraction formats (docker/rfc5424) go through pandas'
      vectorized C parser, guarded by `_ISO_SAFE` so semantics stay exactly
      the reference's; non-conforming rows fall back to the exact parser;
    - other formats memoize per distinct string — log streams repeat the
      same second across many records, so the compiled-regex parse runs
      once per distinct value, not once per row.
    """
    n = len(values)
    out = np.full(n, _NAT, dtype=np.int64)
    parse = tf.parse

    pending = range(n)
    if (
        tf.frac_secs
        and tf.fmt.startswith("%Y-%m-%dT%H:%M:%S")
        and tf.time_offset == 0
    ):
        import pandas as pd

        ser = pd.Series(values, dtype="object")
        safe = ser.str.match(_ISO_SAFE, na=False)
        parsed = pd.to_datetime(
            ser.where(safe), format="ISO8601", utc=True, errors="coerce"
        )
        ns = parsed.values.view("int64")  # NaT == int64 min == _NAT
        out = np.where(safe.to_numpy() & (ns != _NAT), ns, _NAT)
        pending = np.nonzero(out == _NAT)[0]
    # NOTE: a pandas fast path for the CLF format "%d/%b/%Y:%H:%M:%S %z"
    # was measured SLOWER than the memoized exact parser below (67k vs 79k
    # rows/s/core through the parse stage): log streams repeat timestamps,
    # so the per-distinct-value cache beats pandas' per-row %z strptime.
    # tests/test_timeparse_reference.py::TestClfFastPathParity keeps the
    # column/row parity contract pinned either way.

    cache: dict = {}
    missing = cache.get  # sentinel-free lookup via default object
    sentinel = object()
    for i in pending:
        v = values[i]
        if v is None:
            continue
        r = missing(v, sentinel)
        if r is sentinel:
            r = parse(v, now_year)
            cache[v] = r
        out[i] = _NAT if r is None else r
    return out
