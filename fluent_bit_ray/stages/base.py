"""Filter-chain machinery.

The reference applies an ordered list of filter instances to each chunk whose
tag matches the filter's Match pattern (src/flb_filter.c:67-108), inline at
ingest. Here a chain is an ordered list of vectorized Batch→Batch callables
composed into ONE `map_batches` function; per-filter tag matching becomes a
boolean row mask (tags are per-row in this engine, see SURVEY §1.4).

Conventions:
- a batch is a `pyarrow.Table`; record keys are columns; a NULL value means
  "key absent from this record" (fluent-bit maps are schemaless);
- engine-internal columns are underscore-prefixed (`_time`, `_tag`,
  `_parse_ok`) and invisible to key-wildcard operations;
- every filter also implements `process_row(record) -> record|None` — the
  pure-Python row-at-a-time oracle twin used by equality tests.
"""

from __future__ import annotations

from typing import Optional, Protocol, runtime_checkable

import pyarrow as pa
import pyarrow.compute as pc

from ..router import match_to_regex

INTERNAL_PREFIX = "_"

# engine-internal columns: an EXPLICIT set, not the bare "_" prefix —
# journald trusted fields (_PID, _SYSTEMD_UNIT, ...) are single-underscore
# USER data and must reach sinks (in_systemd semantics); only these names
# (plus transient stage columns, always dropped before the sink) are ours
ENGINE_COLS = frozenset({
    "_tag", "_time", "_parse_ok", "_src", "_src_path",
    "_throttle_bucket", "_shard", "_bucket", "_ivf_bucket",
})


@runtime_checkable
class Filter(Protocol):
    def process_batch(self, table: pa.Table, mask: Optional[pa.Array] = None) -> pa.Table:
        """Vectorized transform; `mask` limits effect to tag-matched rows."""
        ...

    def process_row(self, record: dict) -> Optional[dict]:
        """Oracle twin. None = record dropped."""
        ...


def record_columns(table: pa.Table) -> list[str]:
    return [c for c in table.column_names if c not in ENGINE_COLS]


def get_col(table: pa.Table, name: str):
    return table[name] if name in table.column_names else None


def set_col(table: pa.Table, name: str, arr) -> pa.Table:
    if name in table.column_names:
        return table.set_column(table.schema.get_field_index(name), name, arr)
    return table.append_column(name, arr)


def drop_cols(table: pa.Table, names: set[str]) -> pa.Table:
    keep = [c for c in table.column_names if c not in names]
    return table.select(keep)


class FilterChain:
    """Ordered (match_pattern, filter) list -> one batch function.

    `apply_batch` is what goes into `map_batches`; `apply_row` is the oracle.
    """

    def __init__(self, entries: list[tuple[str, Filter]]):
        self.entries = [(pat, match_to_regex(pat), f) for pat, f in entries]

    def apply_batch(self, table: pa.Table, tag_col: str = "_tag") -> pa.Table:
        for pat, regex, filt in self.entries:
            if table.num_rows == 0:
                break
            if pat == "*" or tag_col not in table.column_names:
                mask = None
            else:
                mask = pc.match_substring_regex(table[tag_col], regex)
                mask = pc.fill_null(mask, False)
                if not pc.any(mask).as_py():
                    continue
            table = filt.process_batch(table, mask)
        return table

    def apply_row(self, record: dict, tag: Optional[str] = None) -> Optional[dict]:
        import re

        for pat, regex, filt in self.entries:
            if pat != "*" and tag is not None and not re.search(regex, tag):
                continue
            record = filt.process_row(record)
            if record is None:
                return None
        return record
