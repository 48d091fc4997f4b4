"""String escape/unescape kernels with fluent-bit reference semantics.

These are the pure functions behind the "byte-identical extracted text per
url" invariant: the parser decoders' unescape rules and the JSON sink's
escaping rules.

Reference parity (studied, not copied):
- JSON escaping: ``flb_utils_write_str`` (reference src/flb_utils.c:491-626).
- ``Decode_Field_As escaped``: ``unescape_string``
  (reference src/flb_parser_decoder.c:178-229).
- ``Decode_Field_As escaped_utf8``: ``unescape_string_utf8``
  (reference src/flb_parser_decoder.c:138-176).

Documented divergences from the C code (deliberate — the C behavior is
undefined/buggy at these edges):
- A trailing lone backslash is dropped (the C code copies one out-of-bounds
  byte, in practice the NUL terminator).
- ``unescape_string_utf8`` does not reproduce the reference's off-by-one NUL
  write at ``count_in - 1`` (which can clobber the last output byte).
- Invalid UTF-8 cannot occur here: inputs are Python ``str`` (already decoded),
  so the reference's "skip rest of string on invalid UTF-8" branch is moot.
"""

from __future__ import annotations

# Control-char short escapes used by flb_utils_write_str (\a..\r range,
# reference src/flb_utils.c:528-553). Note \a and \v are NON-STANDARD JSON
# escapes that the reference emits; we reproduce them for byte equality.
_SHORT_ESCAPES = {
    0x07: "\\a",
    0x08: "\\b",
    0x09: "\\t",
    0x0A: "\\n",
    0x0B: "\\v",
    0x0C: "\\f",
    0x0D: "\\r",
}

# Unescape map for the `escaped` decoder (reference flb_parser_decoder.c:186-215).
_UNESCAPE_MAP = {
    "n": "\n",
    "a": "\a",
    "b": "\b",
    "t": "\t",
    "v": "\v",
    "f": "\f",
    "r": "\r",
}


import re

# anything needing escaping: quote, backslash, C0 controls, DEL, non-ASCII
_NEEDS_ESCAPE = re.compile(r'["\\\x00-\x1f\x7f-\U0010FFFF]')


def flb_json_escape(s: str) -> str:
    """Escape a string exactly like the reference JSON encoder.

    Semantics (src/flb_utils.c:491-626):
    - ``\\`` and ``"`` -> backslash-escaped
    - U+0007..U+000D  -> two-char escapes ``\\a \\b \\t \\n \\v \\f \\r``
    - other C0 controls and U+007F -> ``\\uXXXX`` (lowercase hex)
    - U+0080..U+FFFF -> ``\\uXXXX`` (lowercase hex)
    - > U+FFFF -> ``\\uXXXXX…`` — the RAW codepoint in hex, NOT a surrogate
      pair (snprintf "%04x" on a >16-bit value); nonstandard but reproduced.

    Hot path: one C-level regex scan decides whether any escaping is needed
    (most log fields escape to themselves); escaping itself is a single
    C-level ``str.translate`` over a memoizing table.
    """
    if _NEEDS_ESCAPE.search(s) is None:
        return s
    return s.translate(_ESC_TABLE)


class _EscapeTable(dict):
    """codepoint -> replacement, lazily memoized for non-ASCII."""

    def __missing__(self, cp: int) -> str:
        v = "\\u%04x" % cp if cp >= 0x80 else chr(cp)
        self[cp] = v
        return v


_ESC_TABLE = _EscapeTable()
_ESC_TABLE[ord("\\")] = "\\\\"
_ESC_TABLE[ord('"')] = '\\"'
for _c, _e in _SHORT_ESCAPES.items():
    _ESC_TABLE[_c] = _e
for _c in list(range(0x07)) + list(range(0x0E, 0x20)) + [0x7F]:
    _ESC_TABLE[_c] = "\\u%04x" % _c


def unescape_string(s: str) -> str:
    """``Decode_Field_As escaped`` semantics (flb_parser_decoder.c:178-229).

    - ``\\n \\a \\b \\t \\v \\f \\r`` -> the control character
    - ``\\`` followed by ANY other char -> the backslash is dropped and the
      next char is re-examined on the next iteration (so ``\\\\n`` -> newline,
      ``\\"`` -> ``"``, ``\\q`` -> ``q``)
    - trailing lone ``\\`` -> dropped (see module docstring)
    """
    if "\\" not in s:
        return s
    out: list[str] = []
    append = out.append
    i = 0
    n = len(s)
    while i < n:
        ch = s[i]
        if ch == "\\" and i + 1 < n:
            nxt = s[i + 1]
            rep = _UNESCAPE_MAP.get(nxt)
            if rep is not None:
                append(rep)
                i += 2
            else:
                # backslash dropped; next char re-processed
                i += 1
            continue
        if ch == "\\":  # trailing backslash
            break
        append(ch)
        i += 1
    return "".join(out)


_JSON_ESCAPE_NEXT = {'"', "'", "\\", "/"}

_UTF8_SINGLE = {
    "n": "\n",
    "t": "\t",
    "r": "\r",
    "b": "\b",
    "f": "\f",
    "v": "\v",
    "a": "\a",
}


def _read_escape_sequence(s: str, i: int) -> tuple[str, int]:
    """Read one escape sequence starting AFTER the backslash at ``s[i]``.

    Mirrors libutf8's ``u8_read_escape_sequence`` used by the reference:
    supports ``\\uXXXX`` (4 hex), ``\\UXXXXXXXX`` (8 hex), ``\\xH..``,
    octal digits, and single-char escapes. Returns (char, chars_consumed).
    """
    c = s[i]
    if c == "u" or c == "U":
        width = 4 if c == "u" else 8
        j = i + 1
        hexs = ""
        while j < len(s) and len(hexs) < width and s[j] in "0123456789abcdefABCDEF":
            hexs += s[j]
            j += 1
        if hexs:
            cp = int(hexs, 16)
            try:
                return chr(cp), j - i
            except ValueError:
                return "�", j - i
        return c, 1
    if c == "x":
        j = i + 1
        hexs = ""
        while j < len(s) and len(hexs) < 2 and s[j] in "0123456789abcdefABCDEF":
            hexs += s[j]
            j += 1
        if hexs:
            return chr(int(hexs, 16)), j - i
        return c, 1
    if c in "01234567":
        j = i
        octs = ""
        while j < len(s) and len(octs) < 3 and s[j] in "01234567":
            octs += s[j]
            j += 1
        return chr(int(octs, 8)), j - i
    if c in _UTF8_SINGLE:
        return _UTF8_SINGLE[c], 1
    return c, 1


def unescape_string_utf8(s: str) -> str:
    """``Decode_Field_As escaped_utf8`` semantics (flb_parser_decoder.c:138-176).

    ``\\`` followed by one of ``" ' \\ /`` is kept LITERALLY (backslash
    preserved); any other ``\\X`` is decoded as a C/UTF-8 escape sequence
    (``\\uXXXX``, ``\\xHH``, octal, ``\\n`` etc.).
    """
    if "\\" not in s:
        return s
    out: list[str] = []
    append = out.append
    i = 0
    n = len(s)
    while i < n:
        ch = s[i]
        if ch == "\\" and i + 1 < n and s[i + 1] not in _JSON_ESCAPE_NEXT:
            decoded, consumed = _read_escape_sequence(s, i + 1)
            append(decoded)
            i += 1 + consumed
            continue
        append(ch)
        i += 1
    return "".join(out)
