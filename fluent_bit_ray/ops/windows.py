"""Event-time window aggregates over a keyed stream.

The reference has only wall-clock sliding caps (filter_throttle) and
tumbling buckets (out_flowcounter); Ray Data has no watermarks. Per the
batch re-expression (SURVEY §2.6): treat the input as an ordered partitioned
log — `groupby(key).map_groups(fn)` hands each key's rows to a pandas body
that sorts by ts and windows locally. Ordering assumption: all rows of one
key fit one group (Ray groupby guarantees key co-location); ts order within
the group is established by the sort inside `fn`, so input order is free.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _epoch_ns(series: pd.Series) -> pd.Series:
    """datetime series -> int64 epoch ns regardless of stored unit.

    pandas `datetime64[us].astype('int64')` yields MICROseconds — always
    normalize to ns first."""
    return series.astype("datetime64[ns]").astype("int64")


def sliding_count(
    ds,
    key_col: str,
    ts_col: str,
    window_sec: int,
    out_col: str = "window_count",
):
    """Per row: count of same-key rows with ts in [t - window, t] (inclusive
    both ends — SQL `RANGE BETWEEN <w> PRECEDING AND CURRENT ROW`).
    Returns a Dataset of (key, id columns..., out_col).
    """

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(ts_col).reset_index(drop=True)
        ns = _epoch_ns(df[ts_col]).to_numpy()
        w = window_sec * 10**9
        # searchsorted, not pandas rolling: rolling counts only rows UP TO the
        # current positional row, while RANGE ... CURRENT ROW includes ALL
        # peer rows with an equal timestamp (ties -> 2,2 not 1,2)
        counts = np.searchsorted(ns, ns, side="right") - np.searchsorted(
            ns, ns - w, side="left"
        )
        df[out_col] = counts.astype("int64")
        return df

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


def tumbling_agg(
    ds,
    key_col: str,
    ts_col: str,
    window_sec: int,
    value_col: str,
):
    """Per (key, tumbling window): count + sum — the flowcounter shape
    expressed through the generic window path (groupby + in-group pandas)."""

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        bucket = (_epoch_ns(df[ts_col]) // (window_sec * 10**9)).astype("int64")
        g = df.assign(bucket=bucket).groupby("bucket", as_index=False).agg(
            records=(value_col, "size"), total=(value_col, "sum")
        )
        g[key_col] = df[key_col].iloc[0]
        return g[[key_col, "bucket", "records", "total"]]

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


def session_windows(
    ds,
    key_col: str,
    ts_col: str,
    gap_sec: int,
):
    """Session windows: consecutive same-key events within `gap_sec` belong
    to one session. Returns (key, session_start ns, events) per session."""

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(ts_col).reset_index(drop=True)
        ns = _epoch_ns(df[ts_col])
        new_session = (ns.diff() > gap_sec * 10**9).fillna(True)
        sid = new_session.cumsum()
        g = df.assign(_sid=sid, _ns=ns).groupby("_sid")
        out = g.agg(session_start=("_ns", "min"), events=("_ns", "size")).reset_index(drop=True)
        out[key_col] = df[key_col].iloc[0]
        return out[[key_col, "session_start", "events"]]

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")
