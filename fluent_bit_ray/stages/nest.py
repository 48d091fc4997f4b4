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
        n = table.num_rows
        if self.operation == "nest":
            matched = [
                c
                for c in table.column_names
                if not c.startswith(INTERNAL_PREFIX) and self._key_matches(c)
            ]
            if not matched:
                return table
            children = [
                table[c].combine_chunks() if isinstance(table[c], pa.ChunkedArray) else table[c]
                for c in matched
            ]
            all_null = np.ones(n, dtype=bool)
            for ch in children:
                all_null &= np.asarray(pc.is_null(ch))
            struct = pa.StructArray.from_arrays(
                children, names=matched, mask=pa.array(all_null)
            )
            out = table.select([c for c in table.column_names if c not in matched])
            return out.append_column(self.nest_under, struct)

        # lift
        if self.nested_under not in table.column_names:
            return table
        col = table[self.nested_under]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if not pa.types.is_struct(col.type):
            return table
        out = table.select(
            [c for c in table.column_names if c != self.nested_under]
        )
        parent_null = pc.is_null(col)
        for field in col.type:
            child = pc.struct_field(col, field.name)
            # absent submap -> absent lifted keys
            child = pc.if_else(parent_null, pa.nulls(table.num_rows, field.type), child)
            out = set_col(out, field.name, child)
        return out

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
