"""filter_throttle — rate limiting, re-expressed over event time.

Reference parity (studied, not copied): plugins/filter_throttle/throttle.c —
a sliding window of ``Window`` panes advanced every ``Interval`` seconds by a
wall-clock ticker thread (:67-87, :190-194); a record is dropped when
``total/size >= Rate`` else counted (:90-99).

Batch-engine mapping (SURVEY §2.3): wall-clock windows are not reproducible,
so this is the documented semantic shift to EVENT-TIME tumbling buckets: per
bucket of ``interval_sec`` the first ``rate * window`` records (ordered by
event time, ties by stable input order) pass. Implemented as
`groupby(bucket).map_groups(cap)` — a shuffle on the bucket key, which is
time-partitioned and therefore evenly spread (no skew concern).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from ..parsers.core import NAT


# "no event time" bucket sentinel: int64 min is unreachable by floor division
# (|ts//interval_ns| <= 2^63/1e9 ~ 9.3e9 for interval_sec >= 1), so genuine
# pre-epoch timestamps in [-interval, 0) keep their own bucket -1 instead of
# being merged with timeless records under one shared cap
TIMELESS_BUCKET = int(np.iinfo(np.int64).min)


class ThrottleFilter:
    def __init__(
        self,
        rate: int,
        window: int = 5,
        interval_sec: int = 1,
        tiebreaker: Optional[str] = None,
    ):
        self.cap = int(rate) * int(window)
        self.interval_ns = int(interval_sec) * 1_000_000_000
        # deterministic ordering within a bucket: event time, then tiebreaker
        self.sort_keys = [("_time", "ascending")] + (
            [(tiebreaker, "ascending")] if tiebreaker else []
        )

    def bucket_of(self, time_ns) -> int:
        if time_ns is None or time_ns == NAT:
            return TIMELESS_BUCKET
        return time_ns // self.interval_ns

    def add_bucket_column(self, table: pa.Table) -> pa.Table:
        if "_time" not in table.column_names:
            # no event time in the stream at all: single shared bucket
            return table.append_column(
                "_throttle_bucket",
                pa.array(np.full(table.num_rows, TIMELESS_BUCKET, dtype=np.int64)),
            )
        col = table["_time"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # _time may carry real nulls (ParserFilter) or the NAT sentinel
        ts = np.asarray(col.fill_null(NAT))
        bucket = np.where(ts == NAT, TIMELESS_BUCKET, ts // self.interval_ns)
        return table.append_column("_throttle_bucket", pa.array(bucket, pa.int64()))

    def precap_batch(self, table: pa.Table) -> pa.Table:
        """In-batch combiner: keep at most `cap` rows per bucket (partial
        top-k by the same sort order the global cap uses) BEFORE the shuffle.

        This bounds the skewed groups — in particular the timeless bucket,
        which would otherwise collect the entire no-event-time stream on one
        reducer — to cap x num_batches rows, without changing the result:
        the global first-`cap` of a bucket is contained in the union of the
        per-batch first-`cap`s under the same ordering.
        """
        n = table.num_rows
        if n <= self.cap:
            return table
        keys = [("_throttle_bucket", "ascending")] + [
            k for k in self.sort_keys if k[0] in table.column_names
        ]
        order = pa.compute.sort_indices(table, sort_keys=keys)
        t = table.take(order)
        b = np.asarray(t["_throttle_bucket"].combine_chunks())
        idx = np.arange(n, dtype=np.int64)
        is_start = np.r_[True, b[1:] != b[:-1]]
        run_first = np.maximum.accumulate(np.where(is_start, idx, 0))
        keep = (idx - run_first) < self.cap
        if keep.all():
            return table  # original order preserved when nothing drops
        return t.filter(pa.array(keep))

    def cap_group(self, group: pa.Table) -> pa.Table:
        """map_groups fn: keep the first `cap` records by event time."""
        if group.num_rows <= self.cap:
            return group.drop_columns(["_throttle_bucket"])
        keys = [k for k in self.sort_keys if k[0] in group.column_names]
        if not keys:  # timeless stream: cap in arrival order
            return group.slice(0, self.cap).drop_columns(["_throttle_bucket"])
        order = pa.compute.sort_indices(group, sort_keys=keys)
        return group.take(order[: self.cap]).drop_columns(["_throttle_bucket"])

    def apply_dataset(self, ds):
        """Dataset-level application (needs the per-bucket global view)."""
        ds = ds.map_batches(self.add_bucket_column, batch_format="pyarrow")
        ds = ds.map_batches(self.precap_batch, batch_format="pyarrow")
        return ds.groupby("_throttle_bucket").map_groups(
            self.cap_group, batch_format="pyarrow"
        )

    # oracle twin: stateful scan in input order
    def make_row_oracle(self):
        counts: dict[int, int] = {}

        def process_row(record: dict) -> Optional[dict]:
            b = self.bucket_of(record.get("_time", NAT))
            c = counts.get(b, 0)
            if c >= self.cap:
                return None
            counts[b] = c + 1
            return record

        return process_row


class StdoutFilter:
    """filter_stdout (plugins/filter_stdout/stdout.c:30-69): pass-through."""

    def __init__(self, sample: int = 0):
        self.sample = sample
        self.seen: list[dict] = []

    def process_batch(self, table: pa.Table, mask: Optional[pa.Array] = None) -> pa.Table:
        if self.sample and len(self.seen) < self.sample:
            self.seen.extend(table.slice(0, self.sample - len(self.seen)).to_pylist())
        return table

    def process_row(self, record: dict) -> Optional[dict]:
        if self.sample and len(self.seen) < self.sample:
            self.seen.append(dict(record))
        return record


class UdfFilter:
    """filter_lua analog (plugins/filter_lua/lua.c:292-411): arbitrary
    per-record UDF. code semantics: callable(record) -> record | None (drop).

    The vectorized variant accepts a batch_fn(pa.Table) -> pa.Table for users
    who can express their UDF columnar; otherwise the row fn is applied via
    a per-row loop (the documented slow path, as in the reference).
    """

    def __init__(self, row_fn=None, batch_fn=None):
        if row_fn is None and batch_fn is None:
            raise ValueError("UdfFilter needs row_fn or batch_fn")
        self.row_fn = row_fn
        self.batch_fn = batch_fn

    def process_batch(self, table: pa.Table, mask: Optional[pa.Array] = None) -> pa.Table:
        if self.batch_fn is not None:
            # columnar UDFs see the whole batch; per-row tag masking is the
            # row_fn path's job (documented, like the reference's chunk-level
            # filter application)
            return self.batch_fn(table)
        m = mask.to_pylist() if mask is not None else None
        rows = []
        for i, rec in enumerate(table.to_pylist()):
            if m is not None and not m[i]:
                rows.append(rec)  # tag not matched: record untouched
                continue
            out = self.row_fn(rec)
            if out is not None:
                rows.append(out)
        if not rows:
            return table.slice(0, 0)
        from ..functions.records import records_to_table

        # key-union assembly: UDFs add keys, and from_pylist would drop
        # any key absent from the batch's first (possibly unmatched) row
        return records_to_table(rows)

    def process_row(self, record: dict) -> Optional[dict]:
        if self.row_fn is not None:
            return self.row_fn(record)
        from ..functions.records import records_to_table

        out = self.batch_fn(records_to_table([record]))
        lst = out.to_pylist()
        return lst[0] if lst else None
