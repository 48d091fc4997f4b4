"""Tag-based routing — fluent-bit Match semantics, vectorized.

Reference parity (studied, not copied): `flb_router_match`
(src/flb_router.c:32-72) implements glob matching with `*` only (no `?`, no
alternation); `*` matches any substring including the empty one, and the
whole tag must be consumed. That is exactly anchored-regex `^...$` with `*`
-> `.*`, which is how we vectorize it: one
`pc.match_substring_regex(tag_column, anchored_pattern)` per sink produces
that sink's boolean route mask (the per-sink analog of the reference's
`routes_mask` bitmask, src/flb_task.c:234-278). Rows may match several sinks
(fan-out duplicates rows per sink); rows matching none are dropped
(zero-route task drop, src/flb_task.c:280-287).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc


def match_to_regex(pattern: str) -> str:
    """Match pattern -> anchored RE2/re regex string (`*` -> `.*`)."""
    parts = pattern.split("*")
    return "^" + ".*".join(re.escape(p) for p in parts) + "$"


def router_match(tag: str, pattern: str) -> bool:
    """Scalar oracle twin (same semantics as the anchored regex)."""
    return re.match(match_to_regex(pattern), tag) is not None


@dataclass(frozen=True)
class Route:
    sink: str
    patterns: tuple[str, ...]  # a sink may have several Match patterns (OR)

    def regex(self) -> str:
        if not self.patterns:
            # no Match rule -> routes NOTHING (flb_router); empty char class
            # matches nothing and is valid in both re and RE2
            return r"[^\s\S]"
        return "|".join(match_to_regex(p) for p in self.patterns)


class Router:
    """Compiled route table: sink name -> OR of Match patterns."""

    def __init__(self, routes: list[Route]):
        self.routes = routes
        self._compiled = [(r.sink, r.regex()) for r in routes]

    def masks(self, tags: pa.Array) -> dict[str, pa.Array]:
        """Per-sink boolean mask over a tag column (vectorized)."""
        out = {}
        for sink, rx in self._compiled:
            out[sink] = pc.fill_null(pc.match_substring_regex(tags, rx), False)
        return out

    def route_row(self, tag: str) -> list[str]:
        """Oracle twin: list of sinks a tag routes to."""
        return [s for s, rx in self._compiled if re.search(rx, tag) is not None]


def compute_tags(
    lang: pa.Array, host: pa.Array, prefix: str = "web"
) -> pa.Array:
    """The input stage's dynamic tag: `{prefix}.{lang}.{host}`.

    Analog of in_tail's `prefix.path` dyntag (SURVEY §1.2); vectorized
    string concat, dictionary-encoding left to Arrow. NULL components
    render as empty segments (`web..host`): a reference record always
    HAS a tag, so a null lang/host must not null the tag and silently
    drop the row from every sink — `sink_all`'s `*` still takes it,
    matching the SQL twin's unconditional `sink_all` branch.
    """
    return pc.binary_join_element_wise(
        pa.scalar(prefix), lang, host, ".",
        null_handling="replace", null_replacement="",
    )


def host_from_url(urls: pa.Array) -> pa.Array:
    """Extract the host from `https://host/path` urls (vectorized).

    DuckDB-regexp_extract parity (the SQL twins' host expression): a
    NON-MATCHING url yields '' while a NULL url stays NULL — the two
    cases group separately everywhere hosts are grouped raw
    (host_skew, visitors); the flagship's partial agg then folds both
    to '' via its fill_null sentinel, same as the twin's COALESCE."""
    ex = pc.extract_regex(urls, r"^[a-z]+://(?P<h>[^/]+)")
    h = pc.fill_null(pc.struct_field(ex, "h"), "")
    return pc.if_else(pc.is_valid(urls), h, pa.scalar(None, pa.string()))
