"""filter_grep — per-record keep/drop by field regex.

Reference parity (studied, not copied): plugins/filter_grep/grep.c:120-209 —
- ``Regex <field> <pattern>``: keep only records whose field matches;
  missing field or non-string value -> DROP (grep.c:163-171, 185-187);
- ``Exclude <field> <pattern>``: drop records whose field matches; missing
  field -> KEEP;
- rules evaluate in config order; the first failing rule is decisive
  (all Regex rules must pass AND no Exclude rule may hit).

Execution is a vectorized boolean mask (`pc.match_substring_regex`), not a
row filter — semantics identical, no Python row loop.
"""

from __future__ import annotations

import re
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc


class GrepFilter:
    def __init__(self, rules: list[tuple[str, str, str]]):
        """rules: [(kind, field, pattern)] with kind in {"regex","exclude"}."""
        for kind, _, _ in rules:
            if kind not in ("regex", "exclude"):
                raise ValueError(f"grep rule kind {kind!r}")
        self.rules = rules
        # Onig Ruby semantics: ^/$ are line anchors (re.M / RE2 (?m))
        self._compiled = [(k, f, re.compile(p, re.MULTILINE)) for k, f, p in rules]

    def process_batch(self, table: pa.Table, mask: Optional[pa.Array] = None) -> pa.Table:
        n = table.num_rows
        keep = pa.array([True] * n) if n else pa.array([], pa.bool_())
        for kind, field, pattern in self.rules:
            if field in table.column_names:
                col = table[field]
                if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                    hit = pc.fill_null(
                        pc.match_substring_regex(col, "(?m)" + pattern), False
                    )
                    rule_keep = hit if kind == "regex" else pc.invert(hit)
                else:
                    # non-string value: regex rule drops, exclude keeps
                    rule_keep = pa.array([kind == "exclude"] * n)
            else:
                rule_keep = pa.array([kind == "exclude"] * n)
            keep = pc.and_(keep, rule_keep)
        if mask is not None:
            keep = pc.or_(keep, pc.invert(mask))  # untouched when tag not matched
        return table.filter(keep)

    def process_row(self, record: dict) -> Optional[dict]:
        for kind, field, creg in self._compiled:
            val = record.get(field)
            if kind == "regex":
                if not isinstance(val, str) or creg.search(val) is None:
                    return None
            else:
                if isinstance(val, str) and creg.search(val) is not None:
                    return None
        return record
