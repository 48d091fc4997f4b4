"""filter_nest — nest keys under a submap / lift a submap's keys.

Reference parity (studied, not copied): plugins/filter_nest/nest.c:34-120,
196-260 —
- ``Operation nest`` + ``Wildcard k`` (literal or ``prefix*``) +
  ``Nest_under name``: move all matching keys into a submap appended under
  ``name``;
- ``Operation lift`` + ``Nested_under name``: splice the submap's keys up
  into the parent record (appended at the end, submap key removed).

Arrow mapping: nest = `pa.StructArray.from_arrays` over the matched columns;
lift = `pc.struct_field` per child + column flatten. Rows where every nested
source key is null get a NULL struct (absent submap).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .base import INTERNAL_PREFIX, set_col


class NestFilter:
    def __init__(
        self,
        operation: str,
        wildcard: Optional[list[str]] = None,
        nest_under: Optional[str] = None,
        nested_under: Optional[str] = None,
    ):
        if operation not in ("nest", "lift"):
            raise ValueError(f"nest operation {operation!r}")
        if operation == "nest" and (not wildcard or not nest_under):
            raise ValueError("nest needs Wildcard + Nest_under")
        if operation == "lift" and not nested_under:
            raise ValueError("lift needs Nested_under")
        self.operation = operation
        self.wildcard = wildcard or []
        self.nest_under = nest_under
        self.nested_under = nested_under
        self._exact = {w for w in self.wildcard if not w.endswith("*")}
        self._prefix = [w[:-1] for w in self.wildcard if w.endswith("*")]

    def _key_matches(self, key: str) -> bool:
        return key in self._exact or any(key.startswith(p) for p in self._prefix)

    def process_batch(self, table: pa.Table, mask: Optional[pa.Array] = None) -> pa.Table:
        """Tag mask: the column SET changes batch-wide (columns can't vary
        per row), but VALUES move only for masked rows — unmasked rows keep
        their keys at top level (nest) / their submap intact (lift)."""
        n = table.num_rows
        if self.operation == "nest":
            matched = [
                c
                for c in table.column_names
                if not c.startswith(INTERNAL_PREFIX) and self._key_matches(c)
            ]
            if not matched:
                return table
            children = []
            for c in matched:
                ch = table[c]
                if isinstance(ch, pa.ChunkedArray):
                    ch = ch.combine_chunks()
                if mask is not None:  # only masked rows donate their value
                    ch = pc.if_else(mask, ch, pa.nulls(n, ch.type))
                children.append(ch)
            all_null = np.ones(n, dtype=bool)
            for ch in children:
                all_null &= np.asarray(pc.is_null(ch))
            struct = pa.StructArray.from_arrays(
                children, names=matched, mask=pa.array(all_null)
            )
            if mask is None:
                out = table.select(
                    [c for c in table.column_names if c not in matched]
                )
            else:  # unmasked rows keep their top-level values
                out = table
                for c in matched:
                    col = out[c]
                    if isinstance(col, pa.ChunkedArray):
                        col = col.combine_chunks()
                    kept = pc.if_else(mask, pa.nulls(n, col.type), col)
                    if kept.null_count == n:
                        out = out.drop_columns([c])
                    else:
                        out = set_col(out, c, kept)
            return out.append_column(self.nest_under, struct)

        # lift
        if self.nested_under not in table.column_names:
            return table
        col = table[self.nested_under]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if not pa.types.is_struct(col.type):
            return table
        lift_m = pc.is_valid(col)
        if mask is not None:
            lift_m = pc.and_(lift_m, mask)
        for field in col.type:
            child = pc.struct_field(col, field.name)
            child = pc.if_else(lift_m, child, pa.nulls(n, field.type))
            if field.name in table.column_names:
                prev = table[field.name]
                if isinstance(prev, pa.ChunkedArray):
                    prev = prev.combine_chunks()
                child = pc.if_else(lift_m, child, prev)
            table = set_col(table, field.name, child)
        remaining = pc.if_else(
            lift_m, pa.nulls(n, col.type), col
        )
        if remaining.null_count == n:
            return table.drop_columns([self.nested_under])
        return set_col(table, self.nested_under, remaining)

    def process_row(self, record: dict) -> Optional[dict]:
        if self.operation == "nest":
            sub = {k: v for k, v in record.items() if self._key_matches(k)}
            out = {k: v for k, v in record.items() if k not in sub}
            if sub:
                out[self.nest_under] = sub
            return out
        sub = record.get(self.nested_under)
        if not isinstance(sub, dict):
            return record
        out = {k: v for k, v in record.items() if k != self.nested_under}
        for k, v in sub.items():
            out[k] = v
        return out
