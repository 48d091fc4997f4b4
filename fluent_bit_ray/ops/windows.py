"""Event-time window aggregates over a keyed stream.

The reference has only wall-clock sliding caps (filter_throttle) and
tumbling buckets (out_flowcounter); Ray Data has no watermarks. Per the
batch re-expression (SURVEY §2.6): treat the input as an ordered partitioned
log. Keys are HASH-SHARDED and each shard's many keys are processed by ONE
pandas body (sort by key+ts, then vectorized run/group math) — a
`groupby(key).map_groups` would pay a Python call and a pandas frame per
key, which at 10^8 users becomes the stage cost. The shuffle moves each row
once, keyed by a uniform hash, so Zipf-skewed keys spread evenly (skew
lives WITHIN a key; a single key's rows still co-locate, which is the
correctness requirement).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

#: parallelism FLOOR for the shard exchange, not a cap: the actual shard
#: count is data-derived (shuffle.py sizing rule — ceil(input_bytes /
#: TARGET_SHARD_BYTES) when that exceeds the floor), so a shard's pandas
#: frame stays bounded at any corpus size. Functions whose shard state is
#: lighter declare smaller floors (16/32) purely for small-input latency.
DEFAULT_SHARDS = 64


def _epoch_ns(series: pd.Series) -> pd.Series:
    """datetime series -> int64 epoch ns regardless of stored unit.

    pandas `datetime64[us].astype('int64')` yields MICROseconds — always
    normalize to ns first."""
    return series.astype("datetime64[ns]").astype("int64")


_NAT = np.iinfo(np.int64).min


def _sort_ns(ns: np.ndarray) -> np.ndarray:
    """Sort key for `ORDER BY ts` with SQL's default ASC NULLS LAST.

    NaT's raw int64 sentinel is int64 MIN, which would sort null-ts rows
    FIRST — DuckDB/ANSI default places them LAST. Remap the sentinel to
    int64 max for the lexsort key only (value math keeps the raw array so
    null ts still yields NULL outputs where the SQL twin does)."""
    return np.where(ns == _NAT, np.iinfo(np.int64).max, ns)


def _shard_body_finish(per_shard, key_col: str, keep_empty: bool = False):
    """Wrap a pandas shard body as a hash_exchange `finish_fn`.

    The reduce shard holds ALL rows of every key hashed to it (the
    exchange's co-location guarantee), so the body's pandas math is
    unchanged. Pandas conversion happens INSIDE the shard; because
    pandas floats an integer key column whenever the shard holds a null
    key, the key column is restored to its original Arrow type before
    the table leaves the shard (exact: the floats are round-tripped
    int64 keys, NaN -> null) — every shard emits one stable schema, so
    the old post-shuffle restoration stage is gone. A shard whose body
    returns ZERO rows returns None instead of an empty table (unless
    `keep_empty`): empty pandas frames infer float64 for what are
    really string/int columns, and one such shard would poison the
    final Arrow concat's schema unification."""
    import pyarrow.compute as pc

    def finish(t: pa.Table) -> pa.Table:
        key_type = (t.schema.field(key_col).type
                    if key_col in t.column_names else None)
        out = pa.Table.from_pandas(per_shard(t.to_pandas()),
                                   preserve_index=False)
        if out.num_rows == 0 and not keep_empty:
            return None
        if (key_type is not None and key_col in out.column_names
                and pa.types.is_integer(key_type)):
            col = out[key_col]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if pa.types.is_floating(col.type):
                arr = pa.array(col.to_numpy(zero_copy_only=False),
                               from_pandas=True)
                out = out.set_column(
                    out.column_names.index(key_col), key_col,
                    pc.cast(arr, key_type, safe=False))
        return out

    return finish


def _keyed_exchange_refs(ds, key_col, num_shards, floor, per_shard):
    """Dataset -> one Arrow-native key-hash exchange -> per-shard result
    refs (object-store resident; empty shards are None refs)."""
    from ..shuffle import auto_shards_for_dataset, hash_exchange

    if num_shards is None:
        num_shards = auto_shards_for_dataset(ds, floor)
    return hash_exchange(
        ds.to_arrow_refs(),
        [key_col],
        _shard_body_finish(per_shard, key_col),
        num_shards=num_shards,
        return_refs=True,
    )


def _keyed_map_groups(ds, key_col, num_shards, floor, per_shard):
    """Keyed shard family core: ONE shuffle.hash_exchange keyed on the
    Arrow-native key hash, the same pandas math per reduce shard.

    This replaces the r1-r4 `groupby("_shard").map_groups(pandas)` path:
    Ray Data's sort-based shuffle (tens of seconds of fixed overhead on
    sub-10M-row inputs), its per-shard pandas conversion and the
    post-shuffle float-key restoration stage are all gone — the exchange
    moves each row once by hash, shard bodies are unchanged, and results
    stay in the object store (ray.data.from_arrow_refs) so callers keep
    chaining map_batches. Null keys hash like any value and co-locate;
    skew lives WITHIN a key, which still fits one shard by construction
    (module docstring)."""
    import ray
    import ray.data

    refs = _keyed_exchange_refs(ds, key_col, num_shards, floor, per_shard)

    @ray.remote
    def _has_rows(t) -> bool:
        return t is not None and t.num_rows > 0

    live = [r for r, ok in zip(refs, ray.get([_has_rows.remote(r)
                                              for r in refs])) if ok]
    if live:
        return ray.data.from_arrow_refs(live)
    # fully-empty input (or every shard empty): run the body once over an
    # empty table with the input schema so the output schema is still the
    # body's (every body handles len==0)
    sch = ds.schema()
    empty = pa.Table.from_arrays(
        [pa.array([], type=t) for t in sch.types], names=sch.names)
    return ray.data.from_arrow(
        _shard_body_finish(per_shard, key_col, keep_empty=True)(empty))


def _finish(df: pd.DataFrame) -> pd.DataFrame:
    # the exchange path carries no helper column; errors="ignore" keeps
    # bodies source-compatible with the old _shard-column shuffle
    return df.drop(columns=["_shard"], errors="ignore")


def sliding_count(
    ds,
    key_col: str,
    ts_col: str,
    window_sec: int,
    out_col: str = "window_count",
    num_shards: Optional[int] = None,
):
    """Per row: count of same-key rows with ts in [t - window, t] (inclusive
    both ends — SQL `RANGE BETWEEN <w> PRECEDING AND CURRENT ROW`).
    Returns a Dataset of (key, id columns..., out_col).
    """
    w = window_sec * 10**9

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col]).reset_index(drop=True)
        ns = _epoch_ns(df[ts_col]).to_numpy()
        if len(ns) == 0:
            df[out_col] = np.array([], dtype="int64")
            return _finish(df)
        # composite-space searchsorted: place each key's run in its own
        # disjoint block so ONE pair of searchsorted calls serves every key
        # in the shard (peers with equal ts included on both ends).
        # use_na_sentinel=False: null keys get a REAL code (sort_values
        # places them last, factorize assigns codes in first-appearance
        # order, so codes stay non-decreasing — the sentinel -1 would make
        # the composite array unsorted and corrupt the binary search)
        codes = pd.factorize(df[key_col], use_na_sentinel=False)[0].astype(np.int64)
        base = ns - ns.min()
        span = int(base.max()) + w + 2
        n_keys = int(codes.max()) + 1
        if span > 0 and n_keys <= (2**62) // span:
            comp = codes * span + base
            counts = np.searchsorted(comp, comp, side="right") - np.searchsorted(
                comp, comp - w, side="left"
            )
        else:  # composite space would overflow: per-run fallback
            counts = np.empty(len(ns), dtype=np.int64)
            starts = np.r_[0, np.nonzero(np.diff(codes))[0] + 1, len(codes)]
            for s, e in zip(starts[:-1], starts[1:]):
                seg = ns[s:e]
                counts[s:e] = np.searchsorted(seg, seg, side="right") - (
                    np.searchsorted(seg, seg - w, side="left")
                )
        df[out_col] = counts.astype("int64")
        return _finish(df)

    return _keyed_map_groups(ds, key_col, num_shards, DEFAULT_SHARDS, per_shard)


def tumbling_agg(
    ds,
    key_col: str,
    ts_col: str,
    window_sec: int,
    value_col: str,
    num_shards: Optional[int] = None,
):
    """Per (key, tumbling window): count + sum — the flowcounter shape
    expressed through the generic window path (one C-level pandas groupby
    per shard, all the shard's keys at once)."""

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        dt = df[ts_col].astype("datetime64[ns]")
        # nullable Int64 bucket: a null ts is the SQL NULL bucket group,
        # not the garbage INT64_MIN // window the raw cast produced; the
        # extension dtype also keeps the output schema identical across
        # shards with and without null-ts rows
        bucket = (dt.astype("int64") // (window_sec * 10**9)).astype(
            "Int64")
        bucket[dt.isna()] = pd.NA
        g = (
            df.assign(bucket=bucket)
            # dropna=False: null keys form their own group (the previous
            # per-key map_groups path emitted one, and silently losing
            # rows is never acceptable in an aggregate)
            .groupby([key_col, "bucket"], as_index=False, sort=False, dropna=False)
            .agg(records=(value_col, "size"), total=(value_col, "sum"),
                 _nn=(value_col, "count"))
        )
        # SQL sum() over an all-null group is NULL, not 0
        g.loc[g["_nn"] == 0, "total"] = np.nan
        return g[[key_col, "bucket", "records", "total"]]

    return _keyed_map_groups(ds, key_col, num_shards, DEFAULT_SHARDS, per_shard)


def session_windows(
    ds,
    key_col: str,
    ts_col: str,
    gap_sec: int,
    num_shards: Optional[int] = None,
):
    """Session windows: consecutive same-key events within `gap_sec` belong
    to one session. Returns (key, session_start ns, events) per session."""

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col]).reset_index(drop=True)
        ns = _epoch_ns(df[ts_col])
        valid = df[ts_col].notna().to_numpy()
        # null-safe key-change detection (NaN != NaN would split every
        # null-key row into its own session): factorize codes compare equal
        codes = pd.factorize(df[key_col], use_na_sentinel=False)[0]
        key_change = np.r_[True, codes[1:] != codes[:-1]]
        # exact int64 gap test (Series.diff floats int64 and ±ULP at
        # 1.7e18 ns could flip an exactly-gap boundary); a null-ts row
        # never breaks (SQL: NULL - lag > gap is never true) — it sorts
        # last in its key, so it joins the key's final session, and the
        # wrapped NaT subtraction at its position is masked by `valid`
        nsv = ns.to_numpy()
        d = np.zeros(len(nsv), dtype=np.int64)
        with np.errstate(over="ignore"):
            d[1:] = nsv[1:] - nsv[:-1]
        new_session = pd.Series((d > gap_sec * 10**9) & valid
                                | key_change)
        # NaT's int64 form must not win the session min — mask
        # to +inf for the min, NULL the start when no valid ts exists
        ns_for_min = ns.where(pd.Series(valid),
                              np.iinfo(np.int64).max).astype("int64")
        sid = new_session.cumsum()
        g = df.assign(_sid=sid, _ns=ns_for_min, _ok=valid).groupby(
            [key_col, "_sid"], sort=False, dropna=False
        )
        out = g.agg(session_start=("_ns", "min"), events=("_ns", "size"),
                    _nv=("_ok", "sum"))
        out = out.reset_index()
        start = out["session_start"].astype("Int64")
        start[out["_nv"] == 0] = pd.NA
        out["session_start"] = start
        return out[[key_col, "session_start", "events"]]

    return _keyed_map_groups(ds, key_col, num_shards, DEFAULT_SHARDS, per_shard)


def running_totals(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    num_shards: Optional[int] = None,
):
    """Per-key running aggregates over event time — the cumulative-counter
    shape (a per-entity flowcounter in running form): for every row, the
    count and value-sum of all same-key rows up to and including it
    (order: ts, then id for deterministic ties). SQL parity: `count(*) /
    sum(val) OVER (PARTITION BY key ORDER BY ts, id ROWS UNBOUNDED
    PRECEDING)` — in particular cum_sum is NULL while a key's prefix has
    seen no non-null value (SQL SUM semantics), not 0.

    Hash-sharded like the window ops: ONE pandas body per shard serves
    all its keys — a composite sort, then per-key-resetting cumulative
    sums via the prefix-minus-group-start idiom (no per-key Python).
    Partitioning assumption (documented): one KEY's rows fit the shard.
    """

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(df[key_col], use_na_sentinel=False)
        ns = _epoch_ns(df[ts_col]).to_numpy()
        ids = df[id_col].to_numpy()
        order = np.lexsort((ids, _sort_ns(ns), codes))
        df = df.iloc[order].reset_index(drop=True)
        c = codes[order]
        new = np.ones(len(c), dtype=bool)
        new[1:] = c[1:] != c[:-1]
        starts = np.flatnonzero(new)
        reps = np.diff(np.concatenate((starts, [len(c)])))

        v = df[val_col].to_numpy(dtype=np.float64)
        nn = ~np.isnan(v)
        cs = np.cumsum(np.where(nn, v, 0.0))
        cn = np.cumsum(nn.astype(np.int64))
        # per-key reset: subtract the running value just BEFORE each
        # key's first row
        base_s = np.concatenate(([0.0], cs))[starts]
        base_n = np.concatenate(([0], cn))[starts]
        cum_sum = cs - np.repeat(base_s, reps)
        nonnull = cn - np.repeat(base_n, reps)
        cum_n = np.arange(len(c)) - np.repeat(starts, reps) + 1
        ns_s = ns[order]
        ts_us = pd.array(ns_s // 1000, dtype="Int64")
        ts_us[ns_s == _NAT] = pd.NA  # epoch_us(NULL) IS NULL
        out = pd.DataFrame(
            {
                key_col: df[key_col],
                id_col: df[id_col],
                "ts_us": ts_us,
                "cum_n": cum_n.astype(np.int64),
                "cum_sum": np.where(nonnull > 0, cum_sum, np.nan),
            }
        )
        return out

    return _keyed_map_groups(ds, key_col, num_shards, 16, per_shard)


def moving_avg(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    window: int = 4,
    num_shards: Optional[int] = None,
):
    """Per-key ROWS-frame moving average — `avg(val) OVER (PARTITION BY
    key ORDER BY ts, id ROWS BETWEEN window-1 PRECEDING AND CURRENT
    ROW)`: the smoothing/trend feature over event telemetry. Completes
    the window-shape coverage next to running_totals (unbounded frame),
    lag_deltas (single-row offset) and sliding_window (time RANGE).

    SQL AVG semantics: nulls inside the frame are excluded from both
    numerator and denominator; a frame with only nulls yields NULL.

    Same shard machinery as running_totals — one composite sort per
    shard, then the frame sums come from prefix-sum differences clipped
    at each key's first row (no per-key Python, no pandas .rolling).
    Partitioning assumption (documented): one KEY's rows fit the shard.
    """
    w = int(window)

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(df[key_col], use_na_sentinel=False)
        ns = _epoch_ns(df[ts_col]).to_numpy()
        ids = df[id_col].to_numpy()
        order = np.lexsort((ids, _sort_ns(ns), codes))
        df = df.iloc[order].reset_index(drop=True)
        c = codes[order]
        new = np.ones(len(c), dtype=bool)
        new[1:] = c[1:] != c[:-1]
        starts = np.flatnonzero(new)
        reps = np.diff(np.concatenate((starts, [len(c)])))
        pos = np.arange(len(c)) - np.repeat(starts, reps)

        v = df[val_col].to_numpy(dtype=np.float64)
        nn = ~np.isnan(v)
        csE = np.concatenate(([0.0], np.cumsum(np.where(nn, v, 0.0))))
        cnE = np.concatenate(([0], np.cumsum(nn.astype(np.int64))))
        # frame start: w-1 rows back, clipped at the key's first row
        lo = np.arange(len(c)) - np.minimum(pos, w - 1)
        fsum = csE[np.arange(len(c)) + 1] - csE[lo]
        fcnt = cnE[np.arange(len(c)) + 1] - cnE[lo]
        with np.errstate(invalid="ignore", divide="ignore"):
            avg = np.where(fcnt > 0, fsum / np.maximum(fcnt, 1), np.nan)
        return pd.DataFrame(
            {
                key_col: df[key_col],
                id_col: df[id_col],
                "mov_avg": avg,
            }
        )

    return _keyed_map_groups(ds, key_col, num_shards, 16, per_shard)


def lag_deltas(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    num_shards: Optional[int] = None,
):
    """Per-key lag features: for each row, the previous same-key row's
    value and the inter-arrival gap in seconds (nulls for a key's first
    row) — `lag(...) OVER (PARTITION BY key ORDER BY ts, id)` parity.
    The inter-arrival delta is THE session/abuse/rate telemetry feature.
    Same shard machinery as running_totals: one composite sort per shard,
    the lag is a shifted view with the per-key first row nulled."""

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(df[key_col], use_na_sentinel=False)
        ns = _epoch_ns(df[ts_col]).to_numpy()
        ids = df[id_col].to_numpy()
        order = np.lexsort((ids, _sort_ns(ns), codes))
        df = df.iloc[order].reset_index(drop=True)
        c = codes[order]
        ns_s = ns[order]
        v = df[val_col].to_numpy(dtype=np.float64)
        first = np.ones(len(c), dtype=bool)
        first[1:] = c[1:] != c[:-1]
        prev_v = np.concatenate(([np.nan], v[:-1]))
        prev_ns = np.concatenate(([0], ns_s[:-1]))
        prev_v[first] = np.nan
        gap = (ns_s - prev_ns) / 1e9
        gap[first] = np.nan
        # epoch(NULL) is NULL on either side of the subtraction
        nat = ns_s == _NAT
        gap[nat | np.concatenate(([False], nat[:-1]))] = np.nan
        return pd.DataFrame(
            {
                key_col: df[key_col],
                id_col: df[id_col],
                "prev_value": prev_v,
                "gap_sec": gap,
            }
        )

    return _keyed_map_groups(ds, key_col, num_shards, 16, per_shard)


def rank_per_key(
    ds,
    key_col: str,
    val_col: str,
    id_col: str = "event_id",
    descending: bool = True,
    num_shards: Optional[int] = None,
):
    """Per-key rank() AND dense_rank() over `val_col` for EVERY row —
    the full ranked output the selection ops (topn_per_key) don't emit:
    `rank()/dense_rank() OVER (PARTITION BY key ORDER BY val DESC)`.
    Ties share a rank; rank() then skips (gaps), dense_rank() doesn't.
    Null values rank last (as one tied group), like SQL NULLS LAST.

    Same shard machinery as the other window ops (one pandas body per
    key shard, composite lexsort, run-length rank arithmetic — no
    per-key Python). Partitioning assumption: one KEY's rows fit the
    shard."""

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(df[key_col], use_na_sentinel=False)
        v = df[val_col].to_numpy(dtype=np.float64)
        # SQL DESC NULLS LAST: nulls form one trailing tied group
        vkey = np.where(np.isnan(v), -np.inf if descending else np.inf, v)
        ids = df[id_col].to_numpy()
        order = np.lexsort((ids, -vkey if descending else vkey, codes))
        df = df.iloc[order].reset_index(drop=True)
        c = codes[order]
        vs = vkey[order]
        new_key = np.ones(len(c), dtype=bool)
        new_key[1:] = c[1:] != c[:-1]
        key_starts = np.flatnonzero(new_key)
        key_reps = np.diff(np.concatenate((key_starts, [len(c)])))
        pos = np.arange(len(c)) - np.repeat(key_starts, key_reps)
        new_val = new_key.copy()
        new_val[1:] |= vs[1:] != vs[:-1]
        # rank(): 1 + position-within-key of the value group's first row
        grp_start_pos = pos[new_val]
        grp_reps = np.diff(np.concatenate(
            (np.flatnonzero(new_val), [len(c)])))
        rnk = np.repeat(grp_start_pos, grp_reps) + 1
        # dense_rank(): per-key-resetting cumsum of value-group starts
        nv = new_val.astype(np.int64)
        cs = np.cumsum(nv)
        drnk = cs - np.repeat(cs[key_starts] - 1, key_reps)
        return pd.DataFrame(
            {
                key_col: df[key_col],
                id_col: df[id_col],
                val_col: df[val_col],
                "rnk": rnk.astype(np.int64),
                "drnk": drnk.astype(np.int64),
            }
        )

    return _keyed_map_groups(ds, key_col, num_shards, 16, per_shard)


def transition_counts(
    ds,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_shards: Optional[int] = None,
):
    """Markov transition matrix over keyed event streams: global counts
    of consecutive (from_type, to_type) pairs within each key's
    time-ordered stream (deterministic (ts, id) tie order) — the user-
    journey / state-machine telemetry aggregate. A key's first event has
    no predecessor and contributes nothing; transitions never cross
    keys.

    Scale shape: the lag pairing runs in the usual key-shard pandas body
    (one composite sort per shard, shifted view with per-key firsts
    nulled), each shard emits pre-combined (from, to, n) partials, and a
    tiny hash reduce merges them — the wide exchange moves event rows
    once; the second exchange moves only |types|^2-bounded partials."""

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(df[key_col], use_na_sentinel=False)
        ns = _epoch_ns(df[ts_col]).to_numpy()
        ids = df[id_col].to_numpy()
        order = np.lexsort((ids, _sort_ns(ns), codes))
        tv = df[type_col].to_numpy()[order]
        c = codes[order]
        first = np.ones(len(c), dtype=bool)
        first[1:] = c[1:] != c[:-1]
        prev = np.concatenate(([None], tv[:-1]))
        # SQL lag() can't distinguish "first row of the key" from "the
        # previous event's type was NULL" — WHERE prev IS NOT NULL drops
        # both, so transitions FROM a null type are dropped here too
        # (transitions TO a null type are kept: GROUP BY keeps NULL groups)
        keep = ~first & pd.notna(prev)
        out = pd.DataFrame({"from_type": prev[keep], "to_type": tv[keep]})
        g = (out.groupby(["from_type", "to_type"], sort=False,
                         dropna=False).size().rename("n").reset_index())
        # reset_index floats a type column whose surviving group keys are
        # all-NaN (a to-null-only shard) — keep both string-keyed columns
        # object-dtyped with real Nones so every shard emits string/null
        # Arrow columns, never double
        for col in ("from_type", "to_type"):
            g[col] = g[col].astype(object).where(pd.notna(g[col]), None)
        return g

    refs = _keyed_exchange_refs(ds, key_col, num_shards, 16, per_shard)
    from ..shuffle import hash_reduce

    out = hash_reduce(refs, ["from_type", "to_type"], ["n"])
    if out is None:  # no key had two events: empty, typed like the data
        return pa.table({"from_type": pa.array([], pa.string()),
                         "to_type": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    return out


def collect_per_key(
    ds,
    key_col: str = "user_id",
    val_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    sep: str = ">",
    num_shards: Optional[int] = None,
):
    """Ordered per-key collect: each key's values joined in event-time
    order into one string (SQL `string_agg(val, sep ORDER BY ts, id)`)
    — the session-path / user-journey export. One key-shard pandas body:
    composite sort, then a single groupby join. SQL string_agg SKIPS
    null values but GROUP BY still emits the group — a key whose values
    are ALL null appears with seq = NULL, and so it does here.
    Partitioning assumption: one KEY's rows fit the shard."""

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(df[key_col], use_na_sentinel=False)
        ns = _epoch_ns(df[ts_col]).to_numpy()
        ids = df[id_col].to_numpy()
        order = np.lexsort((ids, _sort_ns(ns), codes))
        df = df.iloc[order]
        keys = df[[key_col]].drop_duplicates()
        g = (df[df[val_col].notna()]
             .groupby(key_col, sort=False, dropna=False)[val_col]
             .agg(sep.join).rename("seq").reset_index())
        g = keys.merge(g, on=key_col, how="left")
        g["seq"] = g["seq"].astype("string")
        return g

    return _keyed_map_groups(ds, key_col, num_shards, 16, per_shard)


def funnel(
    ds,
    key_col: str,
    type_col: str,
    ts_col: str,
    steps: list,
    num_shards: Optional[int] = None,
):
    """k-step funnel (conversion analysis): per key, the earliest time of
    step 0, then for each later step i the earliest step-i event AT OR
    AFTER the key's step-(i-1) time (SQL `min(ts) ... WHERE ts >=
    prev_step_ts` — inclusive, so a same-timestamp event converts). Keys
    that never reach step 0 are excluded; a missed step leaves that and
    every later column NULL. Returns one row per step-0 key:
    (key, <step>_ts per step).

    Same scale shape as the other window ops: rows are pruned map-side to
    the step types and hash-sharded by key; ONE pandas body per shard
    serves all its keys — per step it is a C map + boolean filter +
    groupby-min, never a per-key Python loop.
    """
    steps = list(steps)

    def prune(t):
        # Arrow in/out: a pandas prune floated the int64 key column of
        # any block holding a null key, so the SAME key hashed (and
        # sharded) differently across blocks — per-key results doubled
        import pyarrow.compute as _pc

        keep = _pc.fill_null(_pc.is_in(t[type_col], value_set=pa.array(
            steps, t.schema.field(type_col).type)), False)
        return t.filter(keep).select([key_col, type_col, ts_col])

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        first = df[df[type_col] == steps[0]].groupby(key_col)[ts_col].min()
        out = first.rename(f"{steps[0]}_ts").to_frame()
        prev = first
        for st in steps[1:]:
            cand = df[df[type_col] == st]
            t0 = cand[key_col].map(prev)
            cur = (cand[cand[ts_col] >= t0]  # NaT prev compares False
                   .groupby(key_col)[ts_col].min().reindex(out.index))
            out[f"{st}_ts"] = cur
            prev = cur
        return out.reset_index()

    pruned = ds.map_batches(prune, batch_format="pyarrow")
    return _keyed_map_groups(pruned, key_col, num_shards, DEFAULT_SHARDS, per_shard)


def window_dedup(
    ds,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    window_us: int = 60_000_000,
    num_shards: Optional[int] = None,
):
    """Duplicate-event suppression: keep only the FIRST event per (key,
    type, tumbling window floor(epoch_us(ts)/window)) — the classic
    "suppress repeated identical messages within N seconds" log filter.
    SQL parity: `QUALIFY row_number() OVER (PARTITION BY key, type,
    epoch_us(ts) // window ORDER BY ts, id) = 1`, including null keys
    and types (PARTITION BY groups nulls together) and null timestamps
    (a null bucket groups all of a key's null-ts rows; within it every
    ts is null, so the id breaks the order, as in SQL).

    Scale shape: the usual key-shard pandas body — one composite
    lexsort per shard, a first-of-group boolean mask; survivors stream
    out with their original columns. Partitioning assumption: one KEY's
    rows fit the shard (the window sub-split only shrinks groups)."""

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        ck, _ = pd.factorize(df[key_col], use_na_sentinel=False)
        ct, _ = pd.factorize(df[type_col], use_na_sentinel=False)
        ns = _epoch_ns(df[ts_col]).to_numpy()
        # NaT's int64 sentinel lands every null-ts row of a (key, type)
        # in one impossible bucket — exactly SQL's NULL-bucket group
        cb = ns // (window_us * 1000)
        ids = df[id_col].to_numpy()
        order = np.lexsort((ids, ns, cb, ct, ck))
        ck, ct, cb = ck[order], ct[order], cb[order]
        first = np.ones(len(ck), dtype=bool)
        first[1:] = ((ck[1:] != ck[:-1]) | (ct[1:] != ct[:-1])
                     | (cb[1:] != cb[:-1]))
        return _finish(df.iloc[order[first]])

    return _keyed_map_groups(ds, key_col, num_shards, 16, per_shard)


def late_events(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    allowed_us: int = 86_400_000_000,
    num_shards: Optional[int] = None,
):
    """Out-of-order-arrival detection — the batch analog of a streaming
    watermark: arrival order is `id_col`; an event is LATE when its
    event time trails the key's running-max event time over strictly
    earlier arrivals by MORE than allowed_us. Returns (key, id,
    lateness_us) for the late rows only. SQL parity: `max(epoch_us(ts))
    OVER (PARTITION BY key ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING
    AND 1 PRECEDING)` as the watermark, `WHERE t < watermark -
    allowed`; null event times are never late and never advance the
    watermark (window max ignores NULLs), and a key's first arrival has
    no watermark (NULL comparison -> excluded).

    Scale shape: one key-shard pandas body — lexsort by (key, arrival),
    per-key integer cummax as the watermark, shifted one row; pure
    vectorized compare, late rows only leave the shard. All arithmetic
    is exact int64 (epoch-us exceeds float64's integer range, so a
    float path would be off by ±1 µs on a fraction of rows)."""

    SENT = np.iinfo(np.int64).min  # "no valid event time seen yet"

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(df[key_col], use_na_sentinel=False)
        ids = df[id_col].to_numpy()
        order = np.lexsort((ids, codes))
        df = df.iloc[order]
        c = codes[order]
        valid = df[ts_col].notna().to_numpy()
        # NaT's int64 value IS the sentinel (int64 min // 1000 keeps it
        # far below any real time); null rows never advance the cummax
        us = np.where(valid, _epoch_ns(df[ts_col]).to_numpy() // 1000,
                      SENT)
        cm = pd.Series(us).groupby(c).cummax().to_numpy()
        prior = np.empty(len(c), dtype=np.int64)
        prior[1:] = cm[:-1]
        first = np.ones(len(c), dtype=bool)
        first[1:] = c[1:] != c[:-1]
        prior[first] = SENT
        late = valid & (prior != SENT) & (us < prior - allowed_us)
        return pd.DataFrame({
            key_col: df[key_col].to_numpy()[late],
            id_col: ids[order][late],
            "lateness_us": prior[late] - us[late],
        })

    return _keyed_map_groups(ds, key_col, num_shards, 16, per_shard)


def counter_rate(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    num_shards: Optional[int] = None,
):
    """Per-sample counter rate with reset detection — the Prometheus
    rate() shape over a monotonic-counter metric, batch form: for each
    row (ordered by ts, id within its key), rate = (v - prev_v) / dt_sec
    — unless the counter RESET (v < prev_v, a process restart), in which
    case the counter restarted from 0 and rate = v / dt_sec. A key's
    first row, a null v or prev_v, and dt == 0 all yield NULL (SQL CASE
    parity). Returns (key, id, rate).

    Scale shape: the usual key-shard pandas body — composite lexsort,
    shifted views, pure float vector math; dt comes from exact int64 µs
    converted once."""

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(df[key_col], use_na_sentinel=False)
        tvalid = df[ts_col].notna().to_numpy()
        # null ts sorts LAST within its key (DuckDB ASC NULLS LAST) and
        # yields NULL rate for itself and any row lagging from it — NaT's
        # raw int64-min would instead sort it FIRST and fabricate a rate.
        us = np.where(tvalid, _epoch_ns(df[ts_col]).to_numpy() // 1000,
                      np.iinfo(np.int64).max)
        ids = df[id_col].to_numpy()
        order = np.lexsort((ids, us, codes))
        df = df.iloc[order]
        c = codes[order]
        t = us[order]
        tv = tvalid[order]
        v = df[val_col].to_numpy(dtype=np.float64)
        first = np.ones(len(c), dtype=bool)
        first[1:] = c[1:] != c[:-1]
        pv = np.concatenate(([np.nan], v[:-1]))
        pt = np.concatenate(([0], t[:-1]))
        ptv = np.concatenate(([False], tv[:-1]))
        pv[first] = np.nan
        dt = (t - pt) / 1e6
        with np.errstate(invalid="ignore", divide="ignore"):
            # NaN v or pv propagates to NaN; v < pv (reset) restarts at 0
            raw = np.where(v < pv, v, v - pv) / dt
        rate = np.where(first | ~tv | ~ptv | (dt == 0), np.nan, raw)
        return pd.DataFrame({
            key_col: df[key_col].to_numpy(),
            id_col: ids[order],
            "rate": rate,
        })

    return _keyed_map_groups(ds, key_col, num_shards, 16, per_shard)


def resample_ffill(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    step_us: int = 86_400_000_000,
    num_shards: Optional[int] = None,
):
    """Per-key time-series resampling with forward fill (gap filling —
    the metrics-dashboard densify step): each key gets one row per
    `step_us` bucket from its first to its last observation; a bucket's
    value is the LAST observation in it (by ts, id), and empty or
    null-valued buckets carry the most recent non-null bucket value
    forward (leading gaps stay NULL). Null-ts rows contribute nothing
    (SQL: their bucket is NULL and never joins the generated series).
    Returns (key, bucket, value).

    SQL twin: generate_series over each key's [min, max] bucket LEFT
    JOIN the last-per-bucket observations (IS NOT DISTINCT FROM so a
    null key fills its own series, as here), then `last_value(v IGNORE
    NULLS) OVER (PARTITION BY key ORDER BY bucket ROWS UNBOUNDED
    PRECEDING)`.

    Scale shape: one key-shard pandas body — last-per-bucket via
    composite lexsort + group-tail mask, the dense series from repeat/
    arange arithmetic, the fill one global maximum.accumulate over
    last-valid indices with a segment-start floor (no per-key Python).
    Partitioning assumption: one KEY's dense series fits the shard."""

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        valid = df[ts_col].notna().to_numpy()
        df = df[valid]
        if not len(df):
            return pd.DataFrame({key_col: df[key_col],
                                 "bucket": np.array([], np.int64),
                                 "value": np.array([], np.float64)})
        codes, uniq = pd.factorize(df[key_col], use_na_sentinel=False)
        us = _epoch_ns(df[ts_col]).to_numpy() // 1000
        b = us // step_us
        ids = df[id_col].to_numpy()
        order = np.lexsort((ids, us, b, codes))
        c, bo = codes[order], b[order]
        last = np.ones(len(c), dtype=bool)
        last[:-1] = (c[1:] != c[:-1]) | (bo[1:] != bo[:-1])
        obs_k, obs_b = c[last], bo[last]
        obs_v = df[val_col].to_numpy(dtype=np.float64)[order][last]
        # per-key bucket ranges (obs_k is sorted; one slot per key)
        nk = int(obs_k.max()) + 1
        mn = np.full(nk, np.iinfo(np.int64).max)
        mx = np.full(nk, np.iinfo(np.int64).min)
        np.minimum.at(mn, obs_k, obs_b)
        np.maximum.at(mx, obs_k, obs_b)
        keys_present = np.flatnonzero(mx >= mn)
        cnt = mx[keys_present] - mn[keys_present] + 1
        offs = np.concatenate(([0], np.cumsum(cnt)))
        total = int(offs[-1])
        key_rep = np.repeat(keys_present, cnt)
        buckets = (np.arange(total, dtype=np.int64)
                   - np.repeat(offs[:-1], cnt)
                   + np.repeat(mn[keys_present], cnt))
        # scatter observations into their dense positions
        slot_of = np.zeros(nk, dtype=np.int64)
        slot_of[keys_present] = np.arange(len(keys_present))
        pos = offs[slot_of[obs_k]] + (obs_b - mn[obs_k])
        vals = np.full(total, np.nan)
        vals[pos] = obs_v
        # forward fill, floored at each key's segment start
        idx = np.where(np.isnan(vals), -1, np.arange(total))
        ff = np.maximum.accumulate(idx)
        seg_start = np.repeat(offs[:-1], cnt)
        ok = ff >= seg_start  # -1 and carries from the previous key fail
        filled = np.where(ok, vals[np.where(ok, ff, 0)], np.nan)
        return pd.DataFrame({
            key_col: uniq[key_rep],
            "bucket": buckets,
            "value": filled,
        })

    return _keyed_map_groups(ds, key_col, num_shards, 16, per_shard)


def cohort_retention(
    ds,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_us: int = 604_800_000_000,
    num_shards: Optional[int] = None,
):
    """First-touch cohort retention — the product-analytics heatmap: each
    user joins the cohort of their FIRST event's epoch bucket (week by default,
    any `bucket_us`), and the cell (cohort_bucket, bucket_offset) counts
    the DISTINCT cohort users active that many buckets after first touch. Null user or ts rows drop
    (SQL: JOIN USING(user_id) never matches null; epoch_us(NULL) bucket
    never joins the cohort).

    Scale shape: ONE user-keyed hash exchange of pruned fixed-width
    (user, week) rows co-locates each user's full history, so the shard
    computes first-week, offsets and the per-(cohort, offset) DISTINCT
    user contribution locally — a user lives in exactly one shard, so the
    per-shard distinct counts sum exactly (no second distinct pass). The
    driver merge is a tiny group-sum over shards × live (cohort, offset)
    cells. Returns (cohort_week, week_offset, users)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..shuffle import hash_exchange

    def partial(t: pa.Table) -> pa.Table:
        # Arrow in/out: the old pandas form floated the int64 user
        # column of any block holding a null user (dtype survives the
        # notna filter), so that block's partial clashed with its
        # siblings at the exchange concat
        from .profile import _as_comparable

        t = t.filter(pc.and_(pc.is_valid(t[user_col]),
                             pc.is_valid(t[ts_col])))
        us, _ = _as_comparable(t[ts_col])  # exact epoch µs, any unit
        # int64 floor-div matches SQL epoch_us(ts) // week_us exactly
        w = np.asarray(us, dtype=np.int64) // bucket_us
        return pa.table({user_col: t[user_col],
                         "w": pa.array(w, pa.int64())})

    def per_shard(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        codes, _ = pd.factorize(df[user_col], use_na_sentinel=False)
        w = df["w"].to_numpy()
        order = np.lexsort((w, codes))
        c, ws = codes[order], w[order]
        first = np.ones(len(c), dtype=bool)
        first[1:] = c[1:] != c[:-1]
        # sorted by (user, week): the user's first row IS their min week
        cohort = np.repeat(ws[first], np.diff(
            np.flatnonzero(np.concatenate((first, [True])))))
        off = ws - cohort
        cells = pd.DataFrame({"cohort_bucket": cohort,
                              "bucket_offset": off,
                              "u": c}).drop_duplicates()
        g = (cells.groupby(["cohort_bucket", "bucket_offset"], sort=False)
             .size().reset_index(name="users"))
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    merged = hash_exchange(parts.to_arrow_refs(), [user_col], per_shard,
                           num_shards=num_shards)
    empty = pa.table({"cohort_bucket": pa.array([], pa.int64()),
                      "bucket_offset": pa.array([], pa.int64()),
                      "users": pa.array([], pa.int64())})
    if merged is None:
        return empty
    out = merged.group_by(["cohort_bucket", "bucket_offset"]).aggregate(
        [("users", "sum")])
    return pa.table({
        "cohort_bucket": out["cohort_bucket"],
        "bucket_offset": out["bucket_offset"],
        "users": pc.cast(out["users_sum"], pa.int64()),
    })


def interval_merge(
    ds,
    key_col: str = "user_id",
    start_col: str = "s",
    end_col: str = "e",
    num_shards: Optional[int] = None,
):
    """Gaps-and-islands interval coalescing per key: overlapping or
    touching [s, e] intervals (next.s <= running max(e)) merge into one
    span; returns (key, span_start, span_end, n_intervals) per island —
    the downtime/coverage-consolidation op. SQL parity: running
    max(e) OVER (... ROWS ... 1 PRECEDING), island = cumulative count of
    `s > prev_max` breaks, then GROUP BY (key, island).

    Key-shard pandas body like every window op: lexsort (key, s, e),
    segment-reset running max via np.maximum.accumulate on a
    key-offset composite, island ids by cumsum of breaks — no per-key
    Python. Null key forms its own group; null s or e rows are the
    caller's contract to exclude (SQL twin filters them)."""

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(df[key_col], use_na_sentinel=False)
        s = df[start_col].to_numpy()
        e = df[end_col].to_numpy()
        order = np.lexsort((e, s, codes))
        df = df.iloc[order]
        c, ss, ee = codes[order], s[order], e[order]
        n = len(c)
        first = np.ones(n, dtype=bool)
        first[1:] = c[1:] != c[:-1]
        # running max of e with reset at key starts: lift each key's run
        # far above the previous key's in a composite space, accumulate,
        # then project back — same trick as the searchsorted windows
        if n:
            lo = min(int(ee.min()), int(ss.min()))
            hi = max(int(ee.max()), int(ss.max()))
            span = (hi - lo) + 1
            lift = c.astype(np.int64) * span
            cm = np.maximum.accumulate(ee - lo + lift) - lift + lo
            prev_max = np.empty(n, dtype=np.int64)
            prev_max[1:] = cm[:-1]
            new_island = first | (ss > prev_max)
        else:
            new_island = first
        island = np.cumsum(new_island)
        g = (pd.DataFrame({key_col: df[key_col].to_numpy(),
                           "_i": island, "s": ss, "e": ee})
             .groupby([key_col, "_i"], sort=False, dropna=False)
             .agg(span_start=("s", "min"), span_end=("e", "max"),
                  n_intervals=("s", "size"))
             .reset_index()[[key_col, "span_start", "span_end",
                             "n_intervals"]])
        return g

    return _keyed_map_groups(ds, key_col, num_shards, 32, per_shard)


def last_touch_attribution(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    touch_value: str = "click",
    num_shards: Optional[int] = None,
):
    """Last-touch attribution — for every event, the id of the same
    key's most recent `touch_value` event at or before it (a touch
    attributes to itself): the marketing/attribution LOCF. SQL parity:
    `last_value(CASE WHEN type = touch THEN id END IGNORE NULLS)
    OVER (PARTITION BY key ORDER BY ts, id ROWS UNBOUNDED PRECEDING)`;
    null ts sorts LAST within its key (ASC NULLS LAST). Returns
    (key, id, touch_id) with touch_id null before a key's first touch.

    Key-shard pandas body: lexsort, forward-fill of the touch row's
    POSITION via np.maximum.accumulate with per-key reset (position
    -1 sentinel), one take — no per-key Python."""

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(df[key_col], use_na_sentinel=False)
        tvalid = df[ts_col].notna().to_numpy()
        us = np.where(tvalid, _epoch_ns(df[ts_col]).to_numpy() // 1000,
                      np.iinfo(np.int64).max)
        ids = df[id_col].to_numpy()
        order = np.lexsort((ids, us, codes))
        df = df.iloc[order]
        c = codes[order]
        ids = ids[order]
        n = len(c)
        is_touch = (df[type_col] == touch_value).to_numpy()
        pos = np.where(is_touch, np.arange(n, dtype=np.int64), -1)
        first = np.ones(n, dtype=bool)
        first[1:] = c[1:] != c[:-1]
        # per-key reset: lift positions by key * (n+1) so accumulate
        # never carries a touch across keys, then project back
        lift = c.astype(np.int64) * (n + 1)
        filled = np.maximum.accumulate(np.where(pos >= 0, pos + lift, -1))
        filled = filled - lift
        touch_pos = np.where((filled >= 0) & (filled < n), filled, -1)
        # float64 + NaN (not nullable Int64): the nullable-BIGINT window
        # result round-trips as float64 through pandas, and ids < 2^53
        # stay exact — matches the oracle frame byte-for-byte
        touch_id = np.where(
            touch_pos >= 0,
            ids[np.maximum(touch_pos, 0)].astype(np.float64), np.nan)
        return pd.DataFrame({
            key_col: df[key_col].to_numpy(),
            id_col: ids,
            "touch_id": touch_id,
        })

    return _keyed_map_groups(ds, key_col, num_shards, 16, per_shard)


def time_weighted_avg(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    num_shards: Optional[int] = None,
):
    """Per-key time-weighted average — the TWAP/gauge-averaging op: each
    value holds from its event until the key's next event, so
    twap = sum(v_i * (t_{i+1} - t_i)) / (t_last - t_first) over the
    key's (ts, id)-ordered valid events. Keys whose valid events span
    zero time (single event, or all at one instant) are omitted — no
    interval to average over. Rows with null ts or value are excluded
    up front (their hold semantics are undefined). SQL parity:
    lead(t) OVER (PARTITION BY key ORDER BY t, id), GROUP BY key,
    HAVING max(t) > min(t); the id tiebreak pins WHICH equal-ts value
    holds the nonzero interval to the next distinct timestamp.

    Key-shard pandas body like the other window ops: one lexsort
    (id, t, key), a shifted-diff for the hold durations (zeroed at key
    boundaries), one groupby-sum — no per-key Python."""

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[ts_col].notna() & df[val_col].notna()]
        if not len(df):
            return pd.DataFrame({key_col: pd.Series([], dtype=np.int64),
                                 "twap": pd.Series([], dtype=np.float64)})
        codes, _ = pd.factorize(df[key_col], use_na_sentinel=False)
        t = _epoch_ns(df[ts_col]).to_numpy() // 1000
        ids = df[id_col].to_numpy()
        order = np.lexsort((ids, t, codes))
        c, tt = codes[order], t[order]
        v = df[val_col].to_numpy()[order]
        n = len(c)
        same = np.zeros(n, dtype=bool)
        same[:-1] = c[:-1] == c[1:]
        dt = np.zeros(n, dtype=np.float64)
        dt[:-1] = tt[1:] - tt[:-1]
        dt[~same] = 0.0
        g = (pd.DataFrame({key_col: df[key_col].to_numpy()[order],
                           "_w": v * dt, "_dt": dt})
             .groupby(key_col, sort=False, dropna=False)
             .agg(w=("_w", "sum"), span=("_dt", "sum"))
             .reset_index())
        g = g[g["span"] > 0]
        return pd.DataFrame({key_col: g[key_col],
                             "twap": g["w"] / g["span"]})

    return _keyed_map_groups(ds, key_col, num_shards, 32, per_shard)


def ewma(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    alpha: float = 0.5,
    num_shards: Optional[int] = None,
):
    """Per-key exponential moving average over event time — the classic
    telemetry smoother: y_0 = x_0, y_t = alpha*x_t + (1-alpha)*y_{t-1}
    over each key's non-null values in (ts NULLS LAST, id) order. The
    recurrence is NOT window-function-expressible (SQL needs a recursive
    CTE — see the `ewma` oracle), which is exactly why an engine op
    earns its place next to moving_avg's linear ROWS frame.

    Scale shape: the usual key-shard pandas body; the recurrence runs in
    pandas' cython groupby-ewm kernel (adjust=False IS this recurrence),
    one call per shard for all its keys — no per-key Python. Null values
    are excluded up front (SQL twin filters them); rows emit in
    recurrence order. Partitioning assumption: one KEY fits the shard."""

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[val_col].notna()]
        if not len(df):
            return pd.DataFrame({key_col: df[key_col],
                                 id_col: df[id_col],
                                 "ewma": pd.Series([], dtype="float64")})
        codes, _ = pd.factorize(df[key_col], use_na_sentinel=False)
        ns = _epoch_ns(df[ts_col]).to_numpy()
        ids = df[id_col].to_numpy()
        order = np.lexsort((ids, _sort_ns(ns), codes))
        df = df.iloc[order].reset_index(drop=True)
        y = (df.groupby(codes[order], sort=False)[val_col]
             .ewm(alpha=alpha, adjust=False).mean()
             .reset_index(drop=True))
        return pd.DataFrame({key_col: df[key_col],
                             id_col: df[id_col],
                             "ewma": y.to_numpy(dtype=np.float64)})

    return _keyed_map_groups(ds, key_col, num_shards, 16, per_shard)


def cusum_drift(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    thresh: float = 150.005,
    num_shards: Optional[int] = None,
):
    """Per-key one-sided CUSUM drift detector: against each key's
    BASELINE (its first observation in event-time order), S+_t =
    max(0, S+_{t-1} + (x_t - baseline)) over (ts NULLS LAST, id),
    flagged when S+ exceeds `thresh` — the standard sustained-level-
    shift alarm on service telemetry (a single spike decays, a run of
    elevated values accumulates). The first-observation reference (vs a
    key mean) keeps deviations on the DATA's value lattice: a mean is
    generally non-representable in float64, and the resulting ~1e-12
    engine-vs-SQL accumulation skew lands measurably often on 6-decimal
    rounding boundaries of the verify hash (observed 65/10000 rows).

    The max(0, ...) recurrence vectorizes via the prefix-min identity
    S+_t = cs_t - min(0, min_{j<=t} cs_j) with cs the running sum of
    deviations — which also makes it EXACTLY window-function-expressible
    (the `cusum` oracle: first_value, one running sum, one running min —
    no recursive CTE). Engine: ONE key-shard body, groupby cumsum +
    cummin (both cython) — no extra exchange, since the baseline is the
    key's first sorted row. Null values are excluded (SQL twin filters).
    Returns (key, id, cusum, is_drift)."""

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[val_col].notna()]
        if not len(df):
            return pd.DataFrame({key_col: df[key_col], id_col: df[id_col],
                                 "cusum": pd.Series([], dtype="float64"),
                                 "is_drift": pd.Series([], dtype="bool")})
        codes, _ = pd.factorize(df[key_col], use_na_sentinel=False)
        ns = _epoch_ns(df[ts_col]).to_numpy()
        ids = df[id_col].to_numpy()
        order = np.lexsort((ids, _sort_ns(ns), codes))
        df = df.iloc[order].reset_index(drop=True)
        c = codes[order]
        v = df[val_col].to_numpy(dtype=np.float64)
        first = np.ones(len(c), dtype=bool)
        first[1:] = c[1:] != c[:-1]
        starts = np.flatnonzero(first)
        reps = np.diff(np.concatenate((starts, [len(c)])))
        baseline = np.repeat(v[starts], reps)
        dev = v - baseline
        cs = pd.Series(dev).groupby(c, sort=False).cumsum().to_numpy()
        run_min = pd.Series(cs).groupby(c, sort=False).cummin().to_numpy()
        s_plus = cs - np.minimum(0.0, run_min)
        return pd.DataFrame({key_col: df[key_col], id_col: df[id_col],
                             "cusum": s_plus,
                             "is_drift": s_plus > thresh})

    return _keyed_map_groups(ds, key_col, num_shards, 16, per_shard)


def sessionize(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_sec: int = 1800,
    num_shards: Optional[int] = None,
):
    """Per-EVENT sessionization: each row gets its key's session sequence
    number (1-based), where a new session starts at the key's first row
    or after a gap > `gap_sec` from the previous row in (ts NULLS LAST,
    id) order — the row-level twin of session_windows' aggregate form
    (every analytics stack's canonical event-stream op).

    SQL parity (the `sessionize` oracle): brk = CASE WHEN lag(ts) IS NULL
    OR gap > thr THEN 1 ELSE 0 END; session_seq = running sum of brk.
    Matching the SQL NULL algebra exactly: a row AFTER a null-ts
    predecessor breaks (lag(ts) IS NULL), while a null-ts row itself
    does NOT break (NULL > thr is not true) unless it is the key's
    first or follows another null ts. One key-shard pandas body:
    composite sort, vectorized break mask, per-key-resetting cumsum."""

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(df[key_col], use_na_sentinel=False)
        ns = _epoch_ns(df[ts_col]).to_numpy()
        ids = df[id_col].to_numpy()
        order = np.lexsort((ids, _sort_ns(ns), codes))
        df = df.iloc[order].reset_index(drop=True)
        c = codes[order]
        ns_s = ns[order]
        first = np.ones(len(c), dtype=bool)
        first[1:] = c[1:] != c[:-1]
        nat = ns_s == _NAT
        prev_nat = np.concatenate(([True], nat[:-1]))
        gap = np.empty(len(c), dtype=np.float64)
        gap[0] = np.nan
        gap[1:] = (ns_s[1:] - ns_s[:-1]) / 1e9
        both = ~nat & ~prev_nat & ~first
        brk = first | prev_nat | (both & (gap > gap_sec))
        # per-key-resetting running sum of breaks
        cs = np.cumsum(brk.astype(np.int64))
        starts = np.flatnonzero(first)
        reps = np.diff(np.concatenate((starts, [len(c)])))
        base = np.concatenate(([0], cs))[starts]
        seq = cs - np.repeat(base, reps)
        return pd.DataFrame({key_col: df[key_col], id_col: df[id_col],
                             "session_seq": seq.astype(np.int64)})

    return _keyed_map_groups(ds, key_col, num_shards, 16, per_shard)


def rank_dist(
    ds,
    key_col: str,
    val_col: str,
    id_col: str = "event_id",
    descending: bool = True,
    num_shards: Optional[int] = None,
):
    """Per-key percent_rank() and cume_dist() for every row — the
    distribution-position twins of rank_per_key (feature scaling /
    percentile badges over telemetry): percent_rank = (rank-1)/(n-1)
    (0 for a single-row key), cume_dist = |peers ranked at-or-before
    the row's tie group| / n. Null values are excluded up front (the
    SQL twin filters them — rank_per_key's NULLS LAST contract handles
    the keep-nulls case).

    Same key-shard run-length machinery as rank_per_key: one composite
    lexsort per shard, group sizes by run-length repeat — no per-key
    Python."""

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[val_col].notna()]
        if not len(df):
            return pd.DataFrame({key_col: df[key_col], id_col: df[id_col],
                                 val_col: df[val_col],
                                 "pct_rank": pd.Series([], dtype="float64"),
                                 "cume": pd.Series([], dtype="float64")})
        codes, _ = pd.factorize(df[key_col], use_na_sentinel=False)
        v = df[val_col].to_numpy(dtype=np.float64)
        ids = df[id_col].to_numpy()
        order = np.lexsort((ids, -v if descending else v, codes))
        df = df.iloc[order].reset_index(drop=True)
        c = codes[order]
        vs = v[order]
        new_key = np.ones(len(c), dtype=bool)
        new_key[1:] = c[1:] != c[:-1]
        key_starts = np.flatnonzero(new_key)
        key_reps = np.diff(np.concatenate((key_starts, [len(c)])))
        pos = np.arange(len(c)) - np.repeat(key_starts, key_reps)
        new_val = new_key.copy()
        new_val[1:] |= vs[1:] != vs[:-1]
        grp_start_pos = pos[new_val]
        grp_reps = np.diff(np.concatenate(
            (np.flatnonzero(new_val), [len(c)])))
        rnk = np.repeat(grp_start_pos, grp_reps) + 1
        grp_size = np.repeat(grp_reps, grp_reps)
        n = np.repeat(key_reps, key_reps).astype(np.float64)
        pct = np.where(n > 1, (rnk - 1) / np.maximum(n - 1, 1.0), 0.0)
        cume = (rnk - 1 + grp_size) / n
        return pd.DataFrame(
            {
                key_col: df[key_col],
                id_col: df[id_col],
                val_col: df[val_col],
                "pct_rank": pct,
                "cume": cume,
            }
        )

    return _keyed_map_groups(ds, key_col, num_shards, 16, per_shard)


def lead_deltas(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    num_shards: Optional[int] = None,
):
    """Per-key lead features: the NEXT same-key row's value and the gap
    to it in seconds (nulls for a key's last row) — lag_deltas' forward
    twin, `lead(...) OVER (PARTITION BY key ORDER BY ts, id)`. The
    time-TO-next gap is the churn / time-to-failure feature (how long
    until this entity acts again). Same machinery: composite sort,
    shifted view with per-key last rows nulled; epoch(NULL) nulls the
    gap on either side."""

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(df[key_col], use_na_sentinel=False)
        ns = _epoch_ns(df[ts_col]).to_numpy()
        ids = df[id_col].to_numpy()
        order = np.lexsort((ids, _sort_ns(ns), codes))
        df = df.iloc[order].reset_index(drop=True)
        c = codes[order]
        ns_s = ns[order]
        v = df[val_col].to_numpy(dtype=np.float64)
        last = np.ones(len(c), dtype=bool)
        last[:-1] = c[1:] != c[:-1]
        nxt_v = np.concatenate((v[1:], [np.nan]))
        nxt_ns = np.concatenate((ns_s[1:], [0]))
        nxt_v[last] = np.nan
        gap = (nxt_ns - ns_s) / 1e9
        gap[last] = np.nan
        nat = ns_s == _NAT
        gap[nat | np.concatenate((nat[1:], [False]))] = np.nan
        return pd.DataFrame(
            {
                key_col: df[key_col],
                id_col: df[id_col],
                "next_value": nxt_v,
                "gap_sec": gap,
            }
        )

    return _keyed_map_groups(ds, key_col, num_shards, 16, per_shard)


def session_stats(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    gap_sec: int = 1800,
    num_shards: Optional[int] = None,
):
    """Per-SESSION aggregate view of sessionize(): one row per (key,
    session) with event count, start/end time (exact epoch µs, nulls
    skipped like SQL min/max), landing page / exit page analogs (first
    and last `type_col` in (ts NULLS LAST, id) order) and the bounce
    flag (single-event session) — the web-analytics session rollup.

    Engine shape: the SAME one-pandas-body-per-key-shard scaffolding and
    break algebra as sessionize (a session never spans shards because a
    key never does), but the output is run-level: session boundaries are
    the break positions, so every aggregate is an O(rows) reduceat /
    boundary-index gather over the sorted shard — no per-session Python.

    SQL parity (`session_stats` oracle): the sessionize CTE feeding
    GROUP BY (key, session_seq) with count(*), min/max(ts) as epoch_us,
    first/last(type ORDER BY ts, id), count(*)=1 AS is_bounce."""

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(df[key_col], use_na_sentinel=False)
        ns = _epoch_ns(df[ts_col]).to_numpy()
        ids = df[id_col].to_numpy()
        order = np.lexsort((ids, _sort_ns(ns), codes))
        df = df.iloc[order].reset_index(drop=True)
        c = codes[order]
        ns_s = ns[order]
        n = len(c)
        if not n:
            return pd.DataFrame({
                key_col: df[key_col],
                "session_seq": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64"),
                "t_start_us": pd.Series([], dtype="Int64"),
                "t_end_us": pd.Series([], dtype="Int64"),
                "landing": pd.Series([], dtype=df[type_col].dtype),
                "exit_type": pd.Series([], dtype=df[type_col].dtype),
                "is_bounce": pd.Series([], dtype="bool"),
            })
        first = np.ones(n, dtype=bool)
        first[1:] = c[1:] != c[:-1]
        nat = ns_s == _NAT
        prev_nat = np.concatenate(([True], nat[:-1]))
        gap = np.empty(n, dtype=np.float64)
        gap[0] = np.nan
        gap[1:] = (ns_s[1:] - ns_s[:-1]) / 1e9
        both = ~nat & ~prev_nat & ~first
        brk = first | prev_nat | (both & (gap > gap_sec))
        cs = np.cumsum(brk.astype(np.int64))
        key_starts = np.flatnonzero(first)
        key_reps = np.diff(np.concatenate((key_starts, [n])))
        base = np.concatenate(([0], cs))[key_starts]
        seq = cs - np.repeat(base, key_reps)  # per-key 1-based session id

        starts = np.flatnonzero(brk)
        ends = np.concatenate((starts[1:], [n]))  # exclusive
        counts = ends - starts
        # ts within a session is ascending with NaT sorted last, so
        # t_start = first row's ts and t_end = last NON-NaT row's ts
        nn = np.cumsum(~nat)
        nn_before = np.concatenate(([0], nn))[starts]
        n_valid = nn[ends - 1] - nn_before
        t_start = ns_s[starts] // 1000
        t_start_valid = ~nat[starts]
        end_idx = starts + np.maximum(n_valid, 1) - 1
        t_end = ns_s[end_idx] // 1000
        t_end_valid = n_valid > 0
        types = df[type_col].to_numpy()
        start_us = pd.Series(np.where(t_start_valid, t_start, 0),
                             dtype="Int64").mask(~t_start_valid)
        end_us = pd.Series(np.where(t_end_valid, t_end, 0),
                           dtype="Int64").mask(~t_end_valid)
        return pd.DataFrame({
            key_col: df[key_col].to_numpy()[starts],
            "session_seq": seq[starts],
            "n_events": counts.astype(np.int64),
            "t_start_us": start_us,
            "t_end_us": end_us,
            "landing": types[starts],
            "exit_type": types[ends - 1],
            "is_bounce": counts == 1,
        })

    return _keyed_map_groups(ds, key_col, num_shards, 16, per_shard)


def gap_stats(
    ds,
    key_col: str,
    ts_us_col: str,
    id_col: str,
    threshold_sec: float,
    num_shards: Optional[int] = None,
):
    """Per-key inter-arrival gap report: count of gaps exceeding
    `threshold_sec` and the maximum gap (µs) between consecutive events
    in (ts, id) order — the outage/downtime detector over a per-host
    event stream. Keys with a single event report 0 gaps and a NULL max
    (SQL max() over an empty lag set). Null timestamps are excluded up
    front (both oracle sides agree on the population).

    Same key-shard scaffolding as the other window ops: one lexsort per
    shard, diff within key runs, reduceat aggregation — no per-key
    Python."""
    thr_us = int(threshold_sec * 1_000_000)

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[ts_us_col].notna()]
        n = len(df)
        if not n:
            return pd.DataFrame({
                key_col: df[key_col],
                "n_gaps": pd.Series([], dtype="int64"),
                "max_gap_us": pd.Series([], dtype="Int64"),
            })
        codes, _ = pd.factorize(df[key_col], use_na_sentinel=False)
        ts = df[ts_us_col].to_numpy(dtype=np.int64)
        ids = df[id_col].to_numpy()
        order = np.lexsort((ids, ts, codes))
        c = codes[order]
        t = ts[order]
        first = np.ones(n, dtype=bool)
        first[1:] = c[1:] != c[:-1]
        gap = np.empty(n, dtype=np.int64)
        gap[0] = -1
        gap[1:] = t[1:] - t[:-1]
        gap[first] = -1  # no predecessor within the key
        starts = np.flatnonzero(first)
        seg = np.cumsum(first) - 1
        n_gaps = np.bincount(
            seg, weights=(gap > thr_us).astype(np.float64),
            minlength=len(starts)).astype(np.int64)
        mx = np.maximum.reduceat(gap, starts)
        keys_out = df[key_col].to_numpy()[order][starts]
        max_us = pd.Series(mx, dtype="Int64").mask(mx < 0)
        return pd.DataFrame({key_col: keys_out,
                             "n_gaps": n_gaps,
                             "max_gap_us": max_us})

    return _keyed_map_groups(ds, key_col, num_shards, 16, per_shard)


def sliding_sum(
    ds,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_sec: int,
    out_col: str = "window_sum",
    num_shards: Optional[int] = None,
):
    """Per row: SUM of same-key values with ts in [t - window, t] — the
    RANGE-frame rolling-sum sibling of sliding_count (rate-limiting by
    bytes, rolling spend, rolling request volume). Same composite-space
    searchsorted boundaries; the frame sum is two prefix-sum gathers.
    Null values are excluded from the sum and an all-null frame yields
    NULL (SQL sum() semantics); null-ts rows are excluded up front (the
    twin filters them — RANGE null-peer algebra differs by engine)."""
    w = window_sec * 10**9

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[ts_col].notna()]
        df = df.sort_values([key_col, ts_col]).reset_index(drop=True)
        ns = _epoch_ns(df[ts_col]).to_numpy()
        if len(ns) == 0:
            df[out_col] = np.array([], dtype="float64")
            return _finish(df.drop(columns=[value_col], errors="ignore"))
        codes = pd.factorize(df[key_col],
                             use_na_sentinel=False)[0].astype(np.int64)
        base = ns - ns.min()
        nn = df[value_col].notna().to_numpy()
        v = np.where(nn, df[value_col].to_numpy(dtype=np.float64), 0.0)
        P = np.concatenate(([0.0], np.cumsum(v)))
        C = np.concatenate(([0], np.cumsum(nn.astype(np.int64))))
        left, right = _frame_bounds(codes, base, ns, w)
        sums = P[right] - P[left]
        cnt = C[right] - C[left]
        df[out_col] = pd.Series(sums).mask(cnt == 0)
        return _finish(df.drop(columns=[value_col]))

    return _keyed_map_groups(ds, key_col, num_shards, DEFAULT_SHARDS, per_shard)


def _frame_bounds(codes: np.ndarray, base: np.ndarray, ns: np.ndarray,
                  w: int) -> tuple[np.ndarray, np.ndarray]:
    """RANGE-frame [t-w, t] boundary indices for key-sorted rows: the
    composite-space double searchsorted when `codes * span` fits int64,
    else the per-key-run fallback (numpy int64 overflow is silent, so
    the guard is mandatory — hash sharding does NOT bound keys-per-shard
    relative to the time span)."""
    n = len(ns)
    span = int(base.max()) + w + 2
    n_keys = int(codes.max()) + 1
    if span > 0 and n_keys <= (2**62) // span:
        comp = codes * span + base
        right = np.searchsorted(comp, comp, side="right")
        left = np.searchsorted(comp, comp - w, side="left")
        return left, right
    right = np.empty(n, dtype=np.int64)
    left = np.empty(n, dtype=np.int64)
    starts = np.r_[0, np.nonzero(np.diff(codes))[0] + 1, n]
    for s, e in zip(starts[:-1], starts[1:]):
        seg = ns[s:e]
        right[s:e] = s + np.searchsorted(seg, seg, side="right")
        left[s:e] = s + np.searchsorted(seg, seg - w, side="left")
    return left, right


def _sliding_extreme(
    ds,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_sec: int,
    out_col: str,
    reduce_fn,
    fill: float,
    num_shards: Optional[int] = None,
):
    """Shared RANGE-frame MAX/MIN kernel: extremes are not
    prefix-decomposable, so the frame query runs on an O(n log n)
    SPARSE TABLE built with vectorized `reduce_fn` (np.maximum /
    np.minimum) over doubling windows; each row's answer is the reduce
    of two overlapping power-of-two gathers at the same
    composite-searchsorted boundaries the other sliding ops use. Null
    values never win (they enter the table as `fill` = ∓inf) and an
    all-null frame yields NULL; null-ts rows are excluded like the SQL
    twins."""
    w = window_sec * 10**9

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[ts_col].notna()]
        df = df.sort_values([key_col, ts_col]).reset_index(drop=True)
        ns = _epoch_ns(df[ts_col]).to_numpy()
        n = len(ns)
        if n == 0:
            df[out_col] = np.array([], dtype="float64")
            return _finish(df.drop(columns=[value_col], errors="ignore"))
        codes = pd.factorize(df[key_col],
                             use_na_sentinel=False)[0].astype(np.int64)
        base = ns - ns.min()
        left, right = _frame_bounds(codes, base, ns, w)

        nn = df[value_col].notna().to_numpy()
        v = np.where(nn, df[value_col].to_numpy(dtype=np.float64), fill)
        # sparse table: T[j][i] = reduce(v[i : i + 2^j])
        levels = [v]
        j = 1
        while (1 << j) <= n:
            prev = levels[-1]
            half = 1 << (j - 1)
            levels.append(reduce_fn(prev[:-half], prev[half:]))
            j += 1
        width = right - left  # >= 1 (frame includes the current row)
        lev = np.maximum(np.int64(0),
                         np.floor(np.log2(width)).astype(np.int64))
        out = np.empty(n, dtype=np.float64)
        for jj in range(len(levels)):  # loop over log2(n) levels, not rows
            m = lev == jj
            if not m.any():
                continue
            L = levels[jj]
            a = left[m]
            b = right[m] - (1 << jj)
            out[m] = reduce_fn(L[a], L[b])
        # mask all-null frames ONLY (an inf in the DATA must surface as
        # the frame extreme like SQL max/min)
        C = np.concatenate(([0], np.cumsum(nn.astype(np.int64))))
        df[out_col] = pd.Series(out).mask(C[right] - C[left] == 0)
        return _finish(df.drop(columns=[value_col]))

    return _keyed_map_groups(ds, key_col, num_shards, DEFAULT_SHARDS, per_shard)


def sliding_max(
    ds,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_sec: int,
    out_col: str = "window_max",
    num_shards: Optional[int] = None,
):
    """Per row: MAX of same-key values with ts in [t - window, t] — the
    peak detector (rolling peak rate / spend / latency). See
    _sliding_extreme for the sparse-table mechanics."""
    return _sliding_extreme(ds, key_col, ts_col, value_col, window_sec,
                            out_col, np.maximum, -np.inf, num_shards)


def sliding_min(
    ds,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_sec: int,
    out_col: str = "window_min",
    num_shards: Optional[int] = None,
):
    """Per row: MIN of same-key values with ts in [t - window, t] — the
    trough detector (rolling floor price / minimum headroom). Same
    sparse-table kernel as sliding_max with the reduce flipped."""
    return _sliding_extreme(ds, key_col, ts_col, value_col, window_sec,
                            out_col, np.minimum, np.inf, num_shards)


def sliding_spikes(
    ds,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_sec: int,
    z2_threshold: float = 9.0003,
    num_shards: Optional[int] = None,
):
    """Per row: rolling z-score spike flag — is the value more than ~3
    sigma from its trailing RANGE-frame peers? The anomaly gate run
    directly on telemetry streams. The row's own value is EXCLUDED from
    the frame stats (SQL EXCLUDE CURRENT ROW): with self-inclusion z²
    is bounded by n-1, so a 5-point frame could never flag a 3-sigma
    spike. Frame mean/variance come from prefix sums of (v, v²) at the
    shared searchsorted boundaries minus the own-row contribution,
    using the same (n,Σx,Σx²) identity as the SQL twin so the doubles
    track each other; the threshold is OFF-LATTICE (z² > 9.0003, the
    cusum trick) so float jitter cannot flip the boolean. Frames with
    fewer than 2 remaining non-null peers or zero variance are never
    spikes; null values don't enter the stats and are themselves never
    spikes."""
    w = window_sec * 10**9

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[ts_col].notna()]
        df = df.sort_values([key_col, ts_col]).reset_index(drop=True)
        ns = _epoch_ns(df[ts_col]).to_numpy()
        n = len(ns)
        if n == 0:
            df["is_spike"] = np.array([], dtype="bool")
            return _finish(df.drop(columns=[value_col], errors="ignore"))
        codes = pd.factorize(df[key_col],
                             use_na_sentinel=False)[0].astype(np.int64)
        base = ns - ns.min()
        left, right = _frame_bounds(codes, base, ns, w)
        nn = df[value_col].notna().to_numpy()
        v = np.where(nn, df[value_col].to_numpy(dtype=np.float64), 0.0)
        P1 = np.concatenate(([0.0], np.cumsum(v)))
        P2 = np.concatenate(([0.0], np.cumsum(v * v)))
        C = np.concatenate(([0], np.cumsum(nn.astype(np.int64))))
        # leave-one-out: subtract the own row's contribution (0 if null)
        cnt = (C[right] - C[left]).astype(np.float64) - nn
        sx = P1[right] - P1[left] - v
        sxx = P2[right] - P2[left] - v * v
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = sx / cnt
            var = (sxx - sx * sx / cnt) / (cnt - 1.0)
            dev = v - mean
            z2 = dev * dev / var
        spike = nn & (cnt >= 2) & (var > 0) & (z2 > z2_threshold)
        # re-verify CANDIDATES with frame-local sums: shard-global prefix
        # differences can leave a ~1e-9 residue where the true frame
        # variance is exactly 0 (constant heartbeat + an outlier), which
        # would explode z² — the SQL twin's per-frame sums see var=0.
        # Symmetrically, residue can push a truly-tiny-positive variance
        # to <= 0 and hide a spike, so near-zero-var rows re-verify too.
        # Both candidate classes are rare outside constant-valued feeds.
        with np.errstate(invalid="ignore"):
            vtol = 1e-9 * (np.abs(sxx) + 1.0)
            near_zero = nn & (cnt >= 2) & ~(var > vtol) & (dev * dev > 0)
        for i in np.flatnonzero(spike | near_zero):
            seg_v = v[left[i]:right[i]]
            seg_nn = nn[left[i]:right[i]]
            own = i - left[i]
            m = seg_nn.copy()
            m[own] = False
            fn = float(m.sum())
            fx = float(seg_v[m].sum())
            fxx = float((seg_v[m] * seg_v[m]).sum())
            fvar = (fxx - fx * fx / fn) / (fn - 1.0)
            if not (fvar > 0):
                spike[i] = False
            else:
                fd = v[i] - fx / fn
                spike[i] = bool(fd * fd / fvar > z2_threshold)
        df["is_spike"] = spike
        return _finish(df.drop(columns=[value_col]))

    return _keyed_map_groups(ds, key_col, num_shards, DEFAULT_SHARDS, per_shard)
