"""filter_modify — conditional per-record field rewrites.

Reference parity (studied, not copied): plugins/filter_modify/modify.c —
- Conditions (ALL must hold for a record, :513-572): ``Key_exists``,
  ``Key_does_not_exist``, ``Key_value_equals``, ``Key_value_does_not_equal``;
- Rules applied in config order to records meeting the conditions
  (:603-913): ``Rename`` (soft: only when the new key is absent),
  ``Hard_rename`` (overwrite), ``Add`` (only when absent), ``Set``
  (overwrite), ``Remove``, ``Remove_wildcard`` (prefix), ``Copy`` (only when
  new absent), ``Hard_copy`` (overwrite).

Vectorized as per-column `pc.if_else` merges under the condition mask; keys
created by a rule are appended at the end of the column list, matching the
reference's append-in-iteration-order key placement (SURVEY §2.3).

Divergence: Arrow columns are monotyped — moving a value between columns of
different types casts both to string (fluent-bit maps carry per-row types).
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

from .base import INTERNAL_PREFIX, set_col

_CONDS = ("key_exists", "key_does_not_exist", "key_value_equals", "key_value_does_not_equal")
_RULES = ("rename", "hard_rename", "add", "set", "remove", "remove_wildcard", "copy", "hard_copy")


def _unify(a, b):
    """Make two arrays type-compatible for if_else (cast to string if mixed)."""
    if a.type == b.type:
        return a, b
    return pc.cast(a, pa.string()), pc.cast(b, pa.string())


class ModifyFilter:
    def __init__(
        self,
        rules: list[tuple],  # (op, key[, value_or_newkey])
        conditions: Optional[list[tuple]] = None,  # (cond, key[, value])
    ):
        for r in rules:
            if r[0] not in _RULES:
                raise ValueError(f"modify rule {r[0]!r}")
        for c in conditions or []:
            if c[0] not in _CONDS:
                raise ValueError(f"modify condition {c[0]!r}")
        self.rules = rules
        self.conditions = conditions or []

    # ------------------------------------------------------------- batch
    def _condition_mask(self, table: pa.Table) -> pa.Array:
        n = table.num_rows
        m = pa.array([True] * n)
        for cond in self.conditions:
            op, key = cond[0], cond[1]
            col = table[key] if key in table.column_names else None
            if op == "key_exists":
                part = pc.is_valid(col) if col is not None else pa.array([False] * n)
            elif op == "key_does_not_exist":
                part = pc.is_null(col) if col is not None else pa.array([True] * n)
            elif op == "key_value_equals":
                if col is None:
                    part = pa.array([False] * n)
                else:
                    part = pc.fill_null(pc.equal(pc.cast(col, pa.string()), cond[2]), False)
            else:  # key_value_does_not_equal
                if col is None:
                    part = pa.array([True] * n)
                else:
                    part = pc.fill_null(
                        pc.not_equal(pc.cast(col, pa.string()), cond[2]), True
                    )
            m = pc.and_(m, part)
        return m

    def process_batch(self, table: pa.Table, mask: Optional[pa.Array] = None) -> pa.Table:
        n = table.num_rows
        if n == 0:
            return table
        m = self._condition_mask(table)
        if mask is not None:
            m = pc.and_(m, mask)
        if not pc.any(m).as_py():
            return table

        for rule in self.rules:
            op = rule[0]
            if op in ("add", "set"):
                key, value = rule[1], rule[2]
                col = table[key] if key in table.column_names else None
                if col is None:
                    newc = pc.if_else(m, pa.scalar(value, pa.string()),
                                      pa.nulls(n, pa.string()))
                    table = set_col(table, key, newc)
                else:
                    apply_m = m if op == "set" else pc.and_(m, pc.is_null(col))
                    vcol = col if pa.types.is_string(col.type) else pc.cast(col, pa.string())
                    table = set_col(table, key, pc.if_else(apply_m, pa.scalar(value, pa.string()), vcol))
            elif op == "remove":
                key = rule[1]
                if key in table.column_names:
                    col = table[key]
                    table = set_col(table, key, pc.if_else(m, pa.nulls(n, col.type), col))
            elif op == "remove_wildcard":
                prefix = rule[1]
                for c in list(table.column_names):
                    if c.startswith(INTERNAL_PREFIX):
                        continue
                    if c.startswith(prefix):
                        col = table[c]
                        table = set_col(table, c, pc.if_else(m, pa.nulls(n, col.type), col))
            elif op in ("rename", "hard_rename", "copy", "hard_copy"):
                old, new = rule[1], rule[2]
                if old not in table.column_names:
                    continue
                ocol = table[old]
                ncol = table[new] if new in table.column_names else pa.nulls(n, ocol.type)
                ocolu, ncolu = _unify(
                    ocol.combine_chunks() if isinstance(ocol, pa.ChunkedArray) else ocol,
                    ncol.combine_chunks() if isinstance(ncol, pa.ChunkedArray) else ncol,
                )
                if op in ("rename", "copy"):
                    apply_m = pc.and_(pc.and_(m, pc.is_valid(ocolu)), pc.is_null(ncolu))
                else:
                    apply_m = pc.and_(m, pc.is_valid(ocolu))
                table = set_col(table, new, pc.if_else(apply_m, ocolu, ncolu))
                if op in ("rename", "hard_rename"):
                    table = set_col(
                        table, old,
                        pc.if_else(apply_m, pa.nulls(n, ocolu.type), ocolu),
                    )
        # a column nulled on every row is an absent key everywhere: drop it so
        # renames/removes don't leave residual columns (null == absent)
        touched = {
            r[1] for r in self.rules if r[0] in ("remove", "rename", "hard_rename")
        }
        drop = [
            c for c in table.column_names
            if c in touched and table[c].null_count == table.num_rows
        ]
        if drop:
            table = table.drop_columns(drop)
        return table

    # --------------------------------------------------------------- row
    def _conditions_hold(self, record: dict) -> bool:
        for cond in self.conditions:
            op, key = cond[0], cond[1]
            present = record.get(key) is not None
            if op == "key_exists" and not present:
                return False
            if op == "key_does_not_exist" and present:
                return False
            if op == "key_value_equals" and (
                not present or str(record[key]) != cond[2]
            ):
                return False
            if op == "key_value_does_not_equal" and (
                present and str(record[key]) == cond[2]
            ):
                return False
        return True

    def process_row(self, record: dict) -> Optional[dict]:
        if not self._conditions_hold(record):
            return record
        rec = dict(record)
        for rule in self.rules:
            op = rule[0]
            if op == "add":
                if rec.get(rule[1]) is None:
                    rec[rule[1]] = rule[2]
            elif op == "set":
                rec[rule[1]] = rule[2]
            elif op == "remove":
                rec.pop(rule[1], None)
            elif op == "remove_wildcard":
                for k in [k for k in rec if k.startswith(rule[1])]:
                    del rec[k]
            elif op in ("rename", "copy"):
                old, new = rule[1], rule[2]
                if rec.get(old) is not None and rec.get(new) is None:
                    rec[new] = rec[old]
                    if op == "rename":
                        del rec[old]
            elif op in ("hard_rename", "hard_copy"):
                old, new = rule[1], rule[2]
                if rec.get(old) is not None:
                    rec[new] = rec[old]
                    if op == "hard_rename":
                        del rec[old]
        return rec
