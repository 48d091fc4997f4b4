"""filter_record_modifier — key projection + literal append.

Reference parity (studied, not copied):
plugins/filter_record_modifier/filter_modifier.c:32-120, 245-356 —
- ``Remove_key k``: drop keys; a trailing ``*`` prefix-matches
  (filter_modifier.c:58-61);
- ``Whitelist_key k``: keep only listed keys (mutually exclusive with
  Remove_key, :115-118);
- ``Record k v``: append a literal key/value to every record (:311-330).

Pure column projection + constant-column append — zero row work.

Divergence: the reference appends `Record` keys even when the key already
exists (duplicate msgpack map entries); Arrow columns are unique, so an
existing key is overwritten in place.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

from .base import INTERNAL_PREFIX, record_columns, set_col


class RecordModifierFilter:
    def __init__(
        self,
        remove_keys: Optional[list[str]] = None,
        whitelist_keys: Optional[list[str]] = None,
        records: Optional[list[tuple[str, str]]] = None,
    ):
        if remove_keys and whitelist_keys:
            raise ValueError("Remove_key and Whitelist_key are mutually exclusive")
        self.remove_keys = remove_keys or []
        self.whitelist_keys = whitelist_keys or []
        self.records = records or []
        self._remove_exact = {k for k in self.remove_keys if not k.endswith("*")}
        self._remove_prefix = [k[:-1] for k in self.remove_keys if k.endswith("*")]

    def _key_removed(self, key: str) -> bool:
        if key in self._remove_exact:
            return True
        return any(key.startswith(p) for p in self._remove_prefix)

    def process_batch(self, table: pa.Table, mask: Optional[pa.Array] = None) -> pa.Table:
        # column-set ops can't vary per row; a partial tag mask applies the
        # projection to the whole batch (documented in stages/base.py)
        keep = []
        for c in table.column_names:
            if c.startswith(INTERNAL_PREFIX):
                keep.append(c)
            elif self.whitelist_keys:
                if c in self.whitelist_keys:
                    keep.append(c)
            elif not self._key_removed(c):
                keep.append(c)
        out = table.select(keep)
        n = out.num_rows
        for k, v in self.records:
            if mask is not None:
                import pyarrow.compute as pc

                prev = out[k] if k in out.column_names else pa.nulls(n, pa.string())
                if not pa.types.is_string(prev.type):
                    prev = pc.cast(prev, pa.string())
                arr = pc.if_else(mask, pa.scalar(v, pa.string()), prev)
            else:
                arr = pa.array([v] * n, pa.string())
            out = set_col(out, k, arr)
        return out

    def process_row(self, record: dict) -> Optional[dict]:
        if self.whitelist_keys:
            out = {k: v for k, v in record.items() if k in self.whitelist_keys}
        else:
            out = {k: v for k, v in record.items() if not self._key_removed(k)}
        for k, v in self.records:
            out[k] = v
        return out
