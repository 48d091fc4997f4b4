"""filter_parser — parse one field in place with a list of named parsers.

Reference parity (studied, not copied):
plugins/filter_parser/filter_parser.c:169-328 —
- find ``Key_Name``, run the configured parsers IN ORDER until one succeeds
  (:236-277);
- on success the record is REPLACED by the parsed map; event time is set
  from the parsed time when nonzero (:260-263);
- ``Reserve_Data On`` keeps the other original fields (merged after the
  parsed map, :283-300);
- ``Preserve_Key On`` keeps the raw source field (:264-270);
- on failure the record passes unchanged (:305-308).

Vectorized: parser 1 runs over the whole batch; only its failures are re-fed
to parser 2, etc. Output columns are the union of all parsers' fields (a
stable schema per stage); `_parse_ok` and `_time` are engine columns.

Divergence: reference merge can produce duplicate msgpack keys when an
original field collides with a parsed one under Reserve_Data; here the
parsed value wins for parsed rows.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..parsers.core import NAT, Parser
from .base import record_columns, set_col


class ParserFilter:
    def __init__(
        self,
        key_name: str,
        parsers: list[Parser],
        reserve_data: bool = False,
        preserve_key: bool = False,
        now_year: int = 2018,
        set_time: bool = True,
    ):
        """set_time=False: parsed fields merge but the record keeps its
        existing event time (Merge_Log-style secondary parses must not
        downgrade an ns-precision time with a seconds-precision one)."""
        if not parsers:
            raise ValueError("ParserFilter needs at least one parser")
        self.key_name = key_name
        self.parsers = parsers
        self.reserve_data = reserve_data
        self.preserve_key = preserve_key
        self.now_year = now_year
        self.set_time = set_time
        # stable union of output fields in parser order
        fields: list[str] = []
        for p in parsers:
            for f in p.output_fields():
                if f not in fields:
                    fields.append(f)
        self.out_fields = fields

    def process_batch(self, table: pa.Table, mask: Optional[pa.Array] = None) -> pa.Table:
        n = table.num_rows
        if n == 0 or self.key_name not in table.column_names:
            return table
        src = table[self.key_name]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        values = src.to_pylist()

        ok = np.zeros(n, dtype=bool)
        ts = np.full(n, NAT, dtype=np.int64)
        # vectorized scatter bookkeeping: per field, contribution arrays from
        # each parser plus a take-index per output row (-1 -> null). The
        # merge then runs as ONE concat+take per field — no Python-object
        # materialization of parsed values on the hot path.
        parts: dict[str, list] = {f: [] for f in self.out_fields}
        hits_at: dict[str, list] = {f: [] for f in self.out_fields}
        sel: dict[str, np.ndarray] = {
            f: np.full(n, -1, dtype=np.int64) for f in self.out_fields
        }
        lens: dict[str, int] = {f: 0 for f in self.out_fields}

        pending = np.arange(n)
        if mask is not None:
            pending = pending[np.asarray(mask)]
        for parser in self.parsers:
            if len(pending) == 0:
                break
            sub = [values[i] for i in pending]
            out = parser.parse_batch(sub, self.now_year)
            sub_ok = np.asarray(out["_parse_ok"])
            hit = pending[sub_ok]
            pos = np.flatnonzero(sub_ok)
            ok[hit] = True
            ts[hit] = np.asarray(out["_time"])[sub_ok]
            for f in parser.output_fields():
                col = out.get(f)
                if col is None:
                    continue
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                elif not isinstance(col, pa.Array):
                    try:
                        col = pa.array(col)
                    except (pa.ArrowInvalid, pa.ArrowTypeError):
                        # mixed python types in one parser column (json):
                        # keep the object path for this contribution
                        obj = np.empty(len(col), dtype=object)
                        obj[:] = col
                        col = obj
                parts[f].append(col)
                hits_at[f].append((hit, pos))
                sel[f][hit] = lens[f] + pos
                lens[f] += len(col)
            pending = pending[~sub_ok]

        def _merge_field(f: str) -> pa.Array:
            if not parts[f]:
                return pa.nulls(n, pa.string())
            try:
                arrs = [
                    p for p in parts[f] if isinstance(p, pa.Array)
                ]
                if len(arrs) != len(parts[f]):
                    raise pa.ArrowInvalid("object contribution")
                allv = arrs[0] if len(arrs) == 1 else pa.concat_arrays(arrs)
                idx = pa.array(sel[f], mask=sel[f] < 0)
                return pc.take(allv, idx)
            except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
                # fallback: object scatter (exactly the historical merge) for
                # fields with mixed types within/across parsers
                merged = np.full(n, None, dtype=object)
                for p, (hit, pos) in zip(parts[f], hits_at[f]):
                    vals = p.to_pylist() if isinstance(p, pa.Array) else list(p)
                    varr = np.empty(len(vals), dtype=object)
                    varr[:] = vals
                    merged[hit] = varr[pos]
                return pa.array(merged)

        ok_arr = pa.array(ok)
        # original record columns: dropped for parsed rows unless Reserve_Data
        for c in record_columns(table):
            if c == self.key_name:
                if not self.preserve_key:
                    col = table[c]
                    table = set_col(
                        table, c, pc.if_else(ok_arr, pa.nulls(n, col.type), col)
                    )
                continue
            if not self.reserve_data and c not in sel:
                col = table[c]
                table = set_col(
                    table, c, pc.if_else(ok_arr, pa.nulls(n, col.type), col)
                )

        # parsed columns merged in (parsed value wins on parsed rows)
        for f in self.out_fields:
            parsed = _merge_field(f)
            if pa.types.is_null(parsed.type):
                parsed = pc.cast(parsed, pa.string())
            if f in table.column_names:
                existing = table[f]
                if isinstance(existing, pa.ChunkedArray):
                    existing = existing.combine_chunks()
                if existing.type != parsed.type:
                    existing = pc.cast(existing, pa.string())
                    parsed = pc.cast(parsed, pa.string())
                table = set_col(table, f, pc.if_else(ok_arr, parsed, existing))
            else:
                table = set_col(table, f, parsed)

        # event time: parsed time when valid, else previous _time (null = none)
        ts_arr = pa.array(ts, mask=(ts == NAT))
        if not self.set_time:
            ts_arr = pa.nulls(n, pa.int64())
        use_parsed = pc.and_(ok_arr, pc.is_valid(ts_arr))
        if "_time" in table.column_names:
            prev = table["_time"]
            if isinstance(prev, pa.ChunkedArray):
                prev = prev.combine_chunks()
            table = set_col(table, "_time", pc.if_else(use_parsed, ts_arr, prev))
        else:
            table = set_col(
                table, "_time", pc.if_else(use_parsed, ts_arr, pa.nulls(n, pa.int64()))
            )
        # rows outside the tag mask are "untouched": they keep their prior
        # _parse_ok instead of being clobbered to this stage's False
        if mask is not None and "_parse_ok" in table.column_names:
            prev_ok = table["_parse_ok"]
            if isinstance(prev_ok, pa.ChunkedArray):
                prev_ok = prev_ok.combine_chunks()
            ok_out = pc.if_else(mask, ok_arr, prev_ok)
        else:
            ok_out = ok_arr
        table = set_col(table, "_parse_ok", ok_out)
        return table

    def process_row(self, record: dict) -> Optional[dict]:
        """Oracle twin. Uses '_time'/'_parse_ok' pseudo-keys like the batch path."""
        val = record.get(self.key_name)
        rec = dict(record)
        if not isinstance(val, str):
            rec["_parse_ok"] = False
            return rec
        for parser in self.parsers:
            ts, parsed = parser.parse_row(val, self.now_year)
            if parsed is None:
                continue
            from .base import ENGINE_COLS

            out = {k: v for k, v in record.items() if k in ENGINE_COLS}
            if self.reserve_data:
                keep = {
                    k: v
                    for k, v in record.items()
                    if k not in ENGINE_COLS
                    and (k != self.key_name or self.preserve_key)
                }
            else:
                keep = (
                    {self.key_name: val} if self.preserve_key else {}
                )
            out.update(parsed)
            for k, v in keep.items():
                if k not in parsed:
                    out[k] = v
            if ts is not None and self.set_time:
                out["_time"] = ts
            out["_parse_ok"] = True
            return out
        rec["_parse_ok"] = False
        return rec
