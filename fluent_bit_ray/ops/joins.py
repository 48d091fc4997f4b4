"""Temporal joins the Dataset API lacks: as-of join and range (band) join.

The reference engine has no join beyond the kube-metadata lookup
(`plugins/filter_kubernetes/kube_meta.c:760-781` — studied, not copied);
these are the temporal-join shapes a log/telemetry pipeline needs next
(correlate each event with the latest config/rate change; count errors
around each click). Re-expressed Ray-Data-first:

    per-side map_batches projection (key, epoch-us ts, side marker,
    pruned payload columns)  →  ONE key-hash exchange moving both sides'
    fixed-width rows once (`shuffle.hash_exchange`)  →  shard-local
    vectorized sort-merge: every key in the shard is served by a single
    composite-space `np.searchsorted` (the `ops/windows.py` trick — each
    key's run occupies a disjoint integer block, so no per-key Python).

Partitioning assumption (documented, same as the window ops): one KEY's
rows must fit the reduce shard, not the corpus — keys are spread by a
uniform hash, so Zipf key-count skew balances across shards. The exchange
moves each row exactly once and payloads are pruned to the columns the
join emits, so at 10^12 rows the traffic is the theoretical minimum for a
co-locating join. For a small right side, `stages/enrich.py` (broadcast)
is the cheaper plan; this operator is for big-big temporal joins.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..shuffle import hash_exchange

_GUARD = 2**62


def _prep_side(ds, key_col: str, ts_col: str, keep: dict[str, str], side: int):
    """Project one side to (key, _ts_us, _side, keep...) — pruned (and
    renamed) before the exchange so the shuffle never moves unused payload
    bytes. `keep` maps source column -> output column."""

    def prep(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        cols: dict = {key_col: t[key_col], "_ts_us": ts_us}
        cols["_side"] = pa.array(np.full(t.num_rows, side, dtype=np.int8))
        for src, dst in keep.items():
            cols[dst] = t[src]
        return pa.table(cols)

    return ds.map_batches(prep, batch_format="pyarrow")


def _int_left_cols(left_ds, left_cols: list[str]) -> set:
    """Left integer columns get null-promoted to float64 in the mixed shard
    frame (right rows carry nulls there); record which ones to cast back."""
    sch = left_ds.schema()
    arrow_sch = getattr(sch, "base_schema", sch)
    out = set()
    for name, typ in zip(arrow_sch.names, getattr(arrow_sch, "types", [])):
        if not isinstance(typ, pa.DataType):
            # pandas-backed datasets carry numpy dtypes here
            try:
                typ = pa.from_numpy_dtype(typ)
            except (pa.ArrowNotImplementedError, TypeError):
                continue
        if name in left_cols and pa.types.is_integer(typ):
            out.add(name)
    return out


def _sorted_right(codes: np.ndarray, ts: np.ndarray, r: np.ndarray):
    """Right-side row indices sorted by (key code, ts)."""
    return r[np.lexsort((ts[r], codes[r]))]


def _ensure_cols(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    """A reduce shard may hold rows from only ONE side (every key in it
    lacks the other side), in which case concat never saw the other side's
    columns — add them as all-NaN so the shard body and the cross-shard
    output schema stay uniform."""
    for c in cols:
        if c not in df.columns:
            df[c] = np.nan
    return df


def _composite(codes: np.ndarray, ts: np.ndarray, margin: int):
    """Map (key code, ts) into disjoint per-key integer blocks, or None when
    the composite space would overflow int64 (caller falls back per-key)."""
    base = ts - ts.min()
    span = int(base.max()) + margin + 2
    n_keys = int(codes.max()) + 1 if len(codes) else 1
    if span <= 0 or n_keys > _GUARD // span:
        return None
    return codes * span + base


def asof_join(
    left_ds,
    right_ds,
    key_col: str,
    ts_col: str,
    left_cols: list[str],
    right_val_col: str,
    out_ts: str = "asof_ts_us",
    out_val: str = "asof_value",
    shard_output_dir: Optional[str] = None,
    tolerance_us: Optional[int] = None,
) -> Optional[pa.Table]:
    """For each left row: the latest right row of the same key with
    right.ts <= left.ts (SQL `ASOF LEFT JOIN ... ON l.k = r.k AND
    l.ts >= r.ts`). Unmatched left rows keep nulls. Emits
    (left_cols..., key, ts_us, out_ts, out_val).

    `tolerance_us` bounds the staleness (pandas merge_asof(tolerance=...)
    / kdb wj semantics): a nearest-before match OLDER than the bound is
    nulled like a miss — the nearest-before row is the only candidate, so
    asof-then-filter IS tolerance-asof (the oracle wraps the plain ASOF
    SQL in a CASE on l.ts - r.ts)."""
    int_cols = _int_left_cols(left_ds, left_cols)

    def finish(t: pa.Table) -> pa.Table:
        df = _ensure_cols(t.to_pandas(), ["_rval", *left_cols])
        codes = pd.factorize(df[key_col], use_na_sentinel=False)[0].astype(np.int64)
        # SQL null-ts semantics: a timestamp comparison through NULL is
        # never true — null-ts right rows are no candidates and null-ts
        # left rows match nothing (the old int64 cast turned NaN into
        # INT64_MIN, silently letting two null-ts rows pair up). µs
        # magnitudes stay exact through the float mask (< 2^53).
        tvalid = df["_ts_us"].notna().to_numpy()
        ts = np.where(tvalid, np.nan_to_num(
            df["_ts_us"].to_numpy(dtype=np.float64)), 0.0).astype(np.int64)
        is_left = df["_side"].to_numpy() == 1
        l = np.flatnonzero(is_left)
        r = np.flatnonzero(~is_left & tvalid)
        match = np.full(len(l), -1, dtype=np.int64)
        if len(r) and len(l):
            ridx = _sorted_right(codes, ts, r)
            comp = _composite(codes, ts, 0)
            if comp is not None:
                pos = np.searchsorted(comp[ridx], comp[l], side="right") - 1
                ok = pos >= 0
                ok[ok] &= codes[ridx[pos[ok]]] == codes[l[ok]]
                match[ok] = ridx[pos[ok]]
            else:  # overflow fallback: binary-search per key run
                rc, rt = codes[ridx], ts[ridx]
                starts = np.r_[0, np.nonzero(np.diff(rc))[0] + 1, len(rc)]
                run_of = {rc[s]: (s, e) for s, e in zip(starts[:-1], starts[1:])}
                for i, li in enumerate(l):
                    se = run_of.get(codes[li])
                    if se is None:
                        continue
                    s, e = se
                    p = np.searchsorted(rt[s:e], ts[li], side="right") - 1
                    if p >= 0:
                        match[i] = ridx[s + p]
        match[~tvalid[l]] = -1
        ts_out = pd.array(ts[l], dtype="Int64")
        ts_out[~tvalid[l]] = pd.NA
        out = pd.DataFrame({key_col: df[key_col].to_numpy()[l],
                            "ts_us": ts_out})
        for c in left_cols:
            out[c] = df[c].to_numpy()[l]
            if c in int_cols:
                # nullable Int64: undoes the float promotion without
                # crashing on GENUINELY null left values (IntCastingNaN)
                out[c] = out[c].astype("Int64")
        hit = match >= 0
        if tolerance_us is not None:
            stale = np.zeros(len(l), dtype=bool)
            stale[hit] = (ts[l][hit] - ts[match[hit]]) > tolerance_us
            hit &= ~stale
        mts = np.full(len(l), np.nan)
        mval = np.full(len(l), np.nan)
        mts[hit] = ts[match[hit]].astype(np.float64)
        mval[hit] = df["_rval"].to_numpy()[match[hit]]
        out[out_ts] = mts
        out[out_val] = mval
        return pa.Table.from_pandas(out, preserve_index=False)

    lhs = _prep_side(left_ds, key_col, ts_col, {c: c for c in left_cols}, 1)
    rhs = _prep_side(right_ds, key_col, ts_col, {right_val_col: "_rval"}, 0)
    # the output is LEFT-side sized: pass shard_output_dir at corpus scale
    # so reduce shards stream parquet instead of landing on the driver
    return hash_exchange(
        lhs.to_arrow_refs() + rhs.to_arrow_refs(), [key_col], finish,
        shard_output_dir=shard_output_dir,
    )


def range_join_agg(
    left_ds,
    right_ds,
    key_col: str,
    ts_col: str,
    left_cols: list[str],
    right_val_col: str,
    lo_sec: int,
    hi_sec: int,
    out_n: str = "n_in_range",
    out_sum: str = "sum_in_range",
    shard_output_dir: Optional[str] = None,
) -> Optional[pa.Table]:
    """Band/range join in aggregate form: per left row, count and sum of
    same-key right rows with ts in [l.ts - lo_sec, l.ts + hi_sec], both
    ends inclusive (SQL `r.ts BETWEEN l.ts - lo AND l.ts + hi`). The raw
    pair output of a band join is quadratic in hot windows; the aggregate
    form keeps output linear in the left side, which is what the telemetry
    use cases (errors around a click) actually consume."""
    lo_us = lo_sec * 10**6
    hi_us = hi_sec * 10**6
    int_cols = _int_left_cols(left_ds, left_cols)

    def finish(t: pa.Table) -> pa.Table:
        df = _ensure_cols(t.to_pandas(), ["_rval", *left_cols])
        codes = pd.factorize(df[key_col], use_na_sentinel=False)[0].astype(np.int64)
        # SQL null-ts semantics: a timestamp comparison through NULL is
        # never true — null-ts right rows are no candidates and null-ts
        # left rows match nothing (the old int64 cast turned NaN into
        # INT64_MIN, silently letting two null-ts rows pair up). µs
        # magnitudes stay exact through the float mask (< 2^53).
        tvalid = df["_ts_us"].notna().to_numpy()
        ts = np.where(tvalid, np.nan_to_num(
            df["_ts_us"].to_numpy(dtype=np.float64)), 0.0).astype(np.int64)
        is_left = df["_side"].to_numpy() == 1
        l = np.flatnonzero(is_left)
        r = np.flatnonzero(~is_left & tvalid)
        n = np.zeros(len(l), dtype=np.int64)
        s = np.zeros(len(l), dtype=np.float64)
        if len(r) and len(l):
            ridx = _sorted_right(codes, ts, r)
            rv = np.nan_to_num(df["_rval"].to_numpy()[ridx].astype(np.float64))
            pre = np.concatenate(([0.0], np.cumsum(rv)))
            # margin lo+hi keeps every query window inside its key's block,
            # so ONE searchsorted pair serves all keys with no leakage
            comp = _composite(codes, ts, lo_us + hi_us)
            if comp is not None:
                cr = comp[ridx]
                lo_pos = np.searchsorted(cr, comp[l] - lo_us, side="left")
                hi_pos = np.searchsorted(cr, comp[l] + hi_us, side="right")
                n = hi_pos - lo_pos
                s = pre[hi_pos] - pre[lo_pos]
            else:
                rc, rt = codes[ridx], ts[ridx]
                starts = np.r_[0, np.nonzero(np.diff(rc))[0] + 1, len(rc)]
                run_of = {rc[a]: (a, b) for a, b in zip(starts[:-1], starts[1:])}
                for i, li in enumerate(l):
                    se = run_of.get(codes[li])
                    if se is None:
                        continue
                    a, b = se
                    p0 = a + np.searchsorted(rt[a:b], ts[li] - lo_us, side="left")
                    p1 = a + np.searchsorted(rt[a:b], ts[li] + hi_us, side="right")
                    n[i] = p1 - p0
                    s[i] = pre[p1] - pre[p0]
        n[~tvalid[l]] = 0
        s[~tvalid[l]] = 0.0
        out = pd.DataFrame({key_col: df[key_col].to_numpy()[l]})
        for c in left_cols:
            out[c] = df[c].to_numpy()[l]
            if c in int_cols:
                out[c] = out[c].astype("Int64")
        out[out_n] = n
        out[out_sum] = s
        return pa.Table.from_pandas(out, preserve_index=False)

    lhs = _prep_side(left_ds, key_col, ts_col, {c: c for c in left_cols}, 1)
    rhs = _prep_side(right_ds, key_col, ts_col, {right_val_col: "_rval"}, 0)
    return hash_exchange(
        lhs.to_arrow_refs() + rhs.to_arrow_refs(), [key_col], finish,
        shard_output_dir=shard_output_dir,
    )


def semi_join(ds, keys_ds, key_col: str, anti: bool = False):
    """Broadcast semi/anti join: keep rows whose key IS (semi) or IS NOT
    (anti) present in `keys_ds`'s key column. The filter side's DISTINCT
    keys are collected once (map-side unique partials -> driver unique)
    and broadcast via ray.put; the stream side is a pure `is_in` filter
    map — no shuffle at all. This is the small-filter-side twin of the
    big-big temporal joins above (same contract as stages/enrich.py:
    the DISTINCT key set fits a worker heap; for bigger filter sides use
    `semi_join_exchange` below — identical semantics via a key-hash
    exchange, oracle-checked to match this path exactly).

    Null keys follow SQL semantics: a null key never matches (dropped by
    semi), and anti KEEPS null-key rows only if the filter side is
    non-empty-null-free (SQL NOT IN is three-valued; we implement the
    NOT EXISTS form: null keys are kept by anti, dropped by semi).
    """
    import ray

    def uniq(b: pa.Table) -> pa.Table:
        col = b[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table({key_col: col.unique().drop_null()})

    tabs = ray.get(
        keys_ds.select_columns([key_col]).map_batches(
            uniq, batch_format="pyarrow"
        ).to_arrow_refs()
    )
    live = [t for t in tabs if t is not None and t.num_rows]
    key_set = None  # empty / all-null filter side: nothing matches
    if live:
        cat = pa.concat_tables(live, promote_options="default")[key_col]
        if isinstance(cat, pa.ChunkedArray):
            cat = cat.combine_chunks()
        cat = cat.unique().drop_null()
        if len(cat) and not pa.types.is_null(cat.type):
            key_set = cat
    set_ref = ray.put(key_set)

    def filt(b: pa.Table) -> pa.Table:
        ks = ray.get(set_ref)
        col = b[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if ks is None or pa.types.is_null(col.type):
            hit = pa.array(np.zeros(len(col), dtype=bool))
        else:
            hit = pc.fill_null(pc.is_in(col, value_set=ks), False)
        mask = pc.invert(hit) if anti else hit
        return b.filter(mask)

    return ds.map_batches(filt, batch_format="pyarrow")


def semi_join_exchange(
    ds,
    keys_ds,
    key_col: str,
    anti: bool = False,
    shard_output_dir: Optional[str] = None,
) -> Optional[pa.Table]:
    """The big-filter-side twin of `semi_join`: when the DISTINCT key set
    does NOT fit a worker heap, co-locate both sides with one key-hash
    exchange instead of broadcasting — stream rows and (map-side-deduped)
    filter keys meet in the shard, where membership is a vectorized
    is_in against the shard's slice of the filter keys. Null-key
    semantics match the broadcast path (NOT EXISTS form). The stream's
    full rows move once; pass `shard_output_dir` for corpus-sized
    outputs."""
    from ..shuffle import hash_exchange

    sch = ds.schema()
    arrow = getattr(sch, "base_schema", sch)
    stream_cols = list(arrow.names)
    empty = pa.schema(
        [(n, t) for n, t in zip(arrow.names, arrow.types)]
    ).empty_table()

    def prep_stream(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_side", pa.array(np.ones(b.num_rows, dtype=np.int8))
        )

    def prep_filter(b: pa.Table) -> pa.Table:
        col = b[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        u = col.unique().drop_null()
        return pa.table(
            {key_col: u,
             "_side": pa.array(np.zeros(len(u), dtype=np.int8))}
        )

    def finish(t: pa.Table) -> pa.Table:
        side = t["_side"]
        stream = t.filter(pc.equal(side, pa.scalar(1, pa.int8())))
        if stream.num_rows == 0 or not all(
            c in t.column_names for c in stream_cols
        ):
            # filter-only shard (or one-sided concat dropped stream cols)
            return empty
        fkeys = t.filter(pc.equal(side, pa.scalar(0, pa.int8())))[key_col]
        if isinstance(fkeys, pa.ChunkedArray):
            fkeys = fkeys.combine_chunks()
        fkeys = fkeys.unique().drop_null()
        col = stream[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if len(fkeys) == 0 or pa.types.is_null(col.type):
            hit = pa.array(np.zeros(stream.num_rows, dtype=bool))
        else:
            hit = pc.fill_null(
                pc.is_in(col, value_set=pc.cast(fkeys, col.type)), False
            )
        mask = pc.invert(hit) if anti else hit
        return stream.select(stream_cols).filter(mask)

    refs = (
        ds.map_batches(prep_stream, batch_format="pyarrow").to_arrow_refs()
        + keys_ds.select_columns([key_col]).map_batches(
            prep_filter, batch_format="pyarrow"
        ).to_arrow_refs()
    )
    out = hash_exchange(refs, [key_col], finish,
                        shard_output_dir=shard_output_dir)
    if shard_output_dir is not None:
        return None
    return empty if out is None else out


def _pa_type(typ) -> pa.DataType:
    """Ray schema type -> Arrow type: pandas-block datasets report numpy
    dtypes (and pandas extension dtypes like Int64) instead of Arrow."""
    if isinstance(typ, pa.DataType):
        return typ
    npd = getattr(typ, "numpy_dtype", typ)  # Int64Dtype -> int64
    try:
        return pa.from_numpy_dtype(npd)
    except (pa.ArrowNotImplementedError, TypeError, ValueError):
        return pa.string()  # object columns are strings in practice


def _arrow_schema(ds) -> pa.Schema:
    sch = ds.schema()
    base = getattr(sch, "base_schema", sch)
    return pa.schema(
        [pa.field(n, _pa_type(t)) for n, t in zip(base.names, base.types)])


def hash_join(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    left_keep: dict[str, str],
    right_keep: dict[str, str],
    how: str = "inner",
    out_key: Optional[str] = None,
    shard_output_dir: Optional[str] = None,
) -> Optional[pa.Table]:
    """General big-big equi-join (SQL `INNER` / `LEFT` / `FULL OUTER
    JOIN ... ON l.k = r.k`), the row-producing sibling of the temporal
    joins above. Both sides are fact-sized and the key may repeat on
    both (many-to-many emits the full per-key cross product, like SQL).
    For `outer`, the single output key column is `COALESCE(l.k, r.k)`
    and null-key rows from EITHER side surface unmatched.

    Plan: per-side map_batches projection renames the key to one shared
    column and prunes payload to exactly the emitted columns (`left_keep`
    / `right_keep` map source -> output name; output names must be
    disjoint) -> ONE key-hash exchange co-locates every key's rows from
    both sides -> shard-local `pd.merge` (a C hash join) per reduce
    shard. Each row moves exactly once; nothing key-global ever lands on
    the driver — pass `shard_output_dir` at corpus scale and the joined
    shards stream to parquet.

    SQL null semantics (pandas would match NaN==NaN, so nulls are handled
    explicitly): a null key never matches — right null-key rows are
    dropped on the map side (kept-but-unmatched for `outer`); left
    null-key rows are dropped for `inner` and emitted unmatched (all
    right columns null) for `left`/`outer`.

    Partitioning assumption (same as asof_join): one KEY's rows from both
    sides fit the reduce shard; a many-to-many hot key additionally
    multiplies output rows — for hot-key cross products use the aggregate
    form (`range_join_agg`) or pre-aggregate a side. For a small right
    side `stages/enrich.py` (broadcast) is the cheaper plan.
    """
    if how not in ("inner", "left", "outer"):
        raise ValueError(
            f"how must be 'inner', 'left' or 'outer', got {how!r}")
    overlap = set(left_keep.values()) & set(right_keep.values())
    if overlap:
        raise ValueError(f"output column collision across sides: {overlap}")
    key_out = out_key or left_key
    l_sch, r_sch = _arrow_schema(left_ds), _arrow_schema(right_ds)
    key_typ = l_sch.field(left_key).type
    # `_jx` is the EXCHANGE key: the shuffle hashes it via pandas, whose
    # dtype for an int64 arrow column flips to float64 as soon as a block
    # carries a null — so a null-free side would hash `1` while the other
    # hashes `1.0`, and the sides would never co-locate. Casting numeric
    # keys to float64 on BOTH sides pins one pandas dtype (and one hash)
    # regardless of null presence; exactness caveat: integer keys are
    # assumed < 2^53 in magnitude (the Int64 restore below shares it).
    numeric_key = pa.types.is_integer(key_typ) or pa.types.is_floating(key_typ)

    def _xkey(col):
        return pc.cast(col, pa.float64()) if numeric_key else col
    fields = [pa.field(key_out, l_sch.field(left_key).type)]
    fields += [pa.field(dst, l_sch.field(src).type) for src, dst in left_keep.items()]
    fields += [pa.field(dst, r_sch.field(src).type) for src, dst in right_keep.items()]
    target = pa.schema(fields)
    l_out = [key_out, *left_keep.values()]
    r_out = list(right_keep.values())

    def prep_left(t: pa.Table) -> pa.Table:
        cols: dict = {key_out: t[left_key]}
        for src, dst in left_keep.items():
            cols[dst] = t[src]
        cols["_side"] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        cols["_jx"] = _xkey(t[left_key])
        out = pa.table(cols)
        if how == "inner":  # SQL: null keys can never join — drop early
            out = out.filter(pc.is_valid(out[key_out]))
        return out

    def prep_right(t: pa.Table) -> pa.Table:
        cols = {key_out: t[right_key]}
        for src, dst in right_keep.items():
            cols[dst] = t[src]
        cols["_side"] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        cols["_jx"] = _xkey(t[right_key])
        out = pa.table(cols)
        if how != "outer":  # FULL OUTER keeps right null-key rows unmatched
            out = out.filter(pc.is_valid(t[right_key]))
        return out

    def finish(t: pa.Table) -> pa.Table:
        df = _ensure_cols(t.to_pandas(), [*l_out, *r_out])
        is_left = df["_side"].to_numpy() == 1
        # merge on the canonical `_jx` (one dtype across sides); the
        # original key rides along as left payload
        lf = df.loc[is_left, ["_jx", *l_out]]
        rf = df.loc[~is_left, ["_jx", *r_out]]
        null_l = lf["_jx"].isna()
        null_r = rf["_jx"].isna()
        matched = lf[~null_l].merge(
            rf[~null_r], on="_jx", how=how, sort=False)
        if how == "outer":
            # the shared key surfaces as COALESCE(l.key, r.key): for
            # right-only rows the left key payload is NaN but `_jx` IS
            # the right key (cast), so fill from it
            miss = matched[key_out].isna()
            if miss.any():
                matched.loc[miss, key_out] = matched.loc[miss, "_jx"]
        if how != "inner" and null_l.any():
            # unmatched-by-definition rows re-enter with null right cols
            matched = pd.concat(
                [matched, _ensure_cols(lf[null_l].copy(), r_out)],
                ignore_index=True,
            )
        if how == "outer" and null_r.any():
            # SQL: a null right key never matches — emit with all left
            # columns (incl. the coalesced key) null
            matched = pd.concat(
                [matched, _ensure_cols(rf[null_r].copy(), l_out)],
                ignore_index=True,
            )
        matched = matched[[*l_out, *r_out]]
        for f in target:
            # the mixed-side shard frame null-promotes ints to float64 and
            # leaves all-NaN float columns where a side was absent; coerce
            # back so every shard emits the one target schema
            if pd.api.types.is_float_dtype(matched[f.name]):
                if pa.types.is_integer(f.type):
                    matched[f.name] = matched[f.name].astype("Int64")
                elif not pa.types.is_floating(f.type):
                    col = matched[f.name]
                    matched[f.name] = col.astype(object).where(col.notna(), None)
        return pa.Table.from_pandas(
            matched, preserve_index=False, schema=target
        )

    refs = (
        left_ds.map_batches(prep_left, batch_format="pyarrow").to_arrow_refs()
        + right_ds.map_batches(prep_right, batch_format="pyarrow").to_arrow_refs()
    )
    out = hash_exchange(refs, ["_jx"], finish,
                        shard_output_dir=shard_output_dir)
    if shard_output_dir is not None:
        return None
    return target.empty_table() if out is None else out


def interval_join(
    left_ds,
    right_ds,
    key_col: str,
    start_col: str,
    end_col: str,
    id_col: str,
    tile_us: int = 60_000_000,
    shard_output_dir: Optional[str] = None,
) -> Optional[pa.Table]:
    """Interval-OVERLAP equi-key join (SQL `l.k = r.k AND l.s <= r.e AND
    r.s <= l.e`, closed intervals): pairs every left interval with every
    right interval of the same key that overlaps it — the
    interval-vs-interval sibling of range_join's point-vs-window. Rows
    with a null key/id/bound never join (SQL comparison semantics);
    INVERTED intervals (e < s) are kept, because the SQL predicate can
    still match them (e.g. l=[100,50] vs r=[40,200]) — tiles are
    assigned over the row's SPAN [min(s,e), max(s,e)] while the raw
    (s, e) values feed the predicate, so engine output equals the SQL
    join on any input.

    Plan: each side flat-maps its span onto the fixed time TILES it
    touches (vectorized repeat + offset arithmetic), ONE hash exchange
    on (key, tile) co-locates candidates, and a shard-local pd.merge +
    overlap filter emits pairs. A pair overlapping in several tiles is
    counted ONCE without a dedup exchange: only its OWNER tile — the
    tile containing max(l.s, r.s) — emits it. Proof both sides cover
    that tile whenever the predicate holds: take max = l.s (symmetric
    otherwise); l.s lies in l's span as an endpoint, and for r,
    l.s <= r.e <= max(r.s, r.e) and l.s >= r.s >= min(r.s, r.e), so
    l.s lies in r's span; spans cover contiguous tile ranges, hence
    both cover the tile of max(l.s, r.s).

    Partitioning assumptions (documented): one (key, tile)'s rows fit
    the reduce shard, and `tile_us` is chosen near the typical interval
    length — replication per row is O(interval_length / tile_us), while
    a too-large tile degrades toward per-key colocation.
    """
    from ..shuffle import hash_exchange

    def prep(side_flag: int):
        def fn(t: pa.Table) -> pa.Table:
            valid = pc.and_(
                pc.and_(pc.is_valid(t[key_col]), pc.is_valid(t[id_col])),
                pc.and_(pc.is_valid(t[start_col]), pc.is_valid(t[end_col])),
            )
            t = t.filter(valid)
            s = pc.cast(t[start_col], pa.int64()).to_numpy(
                zero_copy_only=False)
            e = pc.cast(t[end_col], pa.int64()).to_numpy(
                zero_copy_only=False)
            k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            t0 = np.minimum(s, e) // tile_us
            cnt = np.maximum(s, e) // tile_us - t0 + 1
            rep = np.repeat(np.arange(len(s), dtype=np.int64), cnt)
            starts = np.concatenate(([0], np.cumsum(cnt)))[:-1]
            intra = np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(
                starts, cnt)
            return pa.table({
                "k": pa.array(k[rep]),
                "tile": pa.array(t0[rep] + intra),
                "side": pa.array(
                    np.full(len(rep), side_flag, np.int8)),
                "id": pa.array(ids[rep]),
                "s": pa.array(s[rep]),
                "e": pa.array(e[rep]),
            })
        return fn

    empty = pa.schema([
        (key_col, pa.int64()), ("l_id", pa.int64()),
        ("r_id", pa.int64()), ("overlap_us", pa.int64()),
    ]).empty_table()

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        lf = df[df["side"] == 1]
        rf = df[df["side"] == 0]
        m = lf.merge(rf, on=["k", "tile"], suffixes=("_l", "_r"),
                     sort=False)
        if not len(m):
            return empty
        ls, le = m["s_l"].to_numpy(), m["e_l"].to_numpy()
        rs, re_ = m["s_r"].to_numpy(), m["e_r"].to_numpy()
        keep = ((ls <= re_) & (rs <= le)
                & (np.maximum(ls, rs) // tile_us
                   == m["tile"].to_numpy()))
        m = m[keep]
        return pa.table({
            key_col: pa.array(m["k"].to_numpy()),
            "l_id": pa.array(m["id_l"].to_numpy()),
            "r_id": pa.array(m["id_r"].to_numpy()),
            "overlap_us": pa.array(
                np.minimum(m["e_l"].to_numpy(), m["e_r"].to_numpy())
                - np.maximum(m["s_l"].to_numpy(), m["s_r"].to_numpy())),
        })

    refs = (
        left_ds.map_batches(prep(1), batch_format="pyarrow").to_arrow_refs()
        + right_ds.map_batches(prep(0), batch_format="pyarrow").to_arrow_refs()
    )
    out = hash_exchange(refs, ["k", "tile"], finish,
                        shard_output_dir=shard_output_dir)
    if shard_output_dir is not None:
        return None
    return empty if out is None else out


def set_op(
    left_ds,
    right_ds,
    cols: list[str],
    op: str = "intersect",
    shard_output_dir: Optional[str] = None,
) -> Optional[pa.Table]:
    """Distributed SQL set operation with DISTINCT semantics:
    ``intersect`` (rows in both sides) or ``except`` (rows in left and
    not in right), over the full `cols` tuple. NULLs compare equal, as
    in SQL set operations (NOT like join equality).

    Both sides are reduced to per-batch DISTINCT (cols, side) rows
    map-side, so only distinct tuples cross the wire; ONE hash exchange
    on `cols` co-locates each tuple's two side flags and a vectorized
    per-shard groupby decides membership. Corpus-sized outputs stream
    via `shard_output_dir` like the other exchanges.
    """
    if op not in ("intersect", "except"):
        raise ValueError(f"set_op: unknown op {op!r}")

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            d = t.select(cols).group_by(cols).aggregate([])
            return d.append_column(
                "_side", pa.array(np.full(d.num_rows, side, np.int8)))
        return fn

    def combine(t: pa.Table) -> pa.Table:
        return t.group_by(cols + ["_side"]).aggregate([])

    def finish(t: pa.Table) -> pa.Table:
        # Arrow groupby keeps NULL keys as groups and preserves types
        # (a pandas round-trip would NaN-coerce all-null key shards)
        mm = t.group_by(cols).aggregate(
            [("_side", "min"), ("_side", "max")])
        if op == "intersect":
            keep = pc.and_(pc.equal(mm["_side_min"], 0),
                           pc.equal(mm["_side_max"], 1))
        else:
            keep = pc.equal(mm["_side_max"], 0)
        return mm.filter(keep).select(cols)

    refs = list(
        left_ds.select_columns(cols).map_batches(
            tag(0), batch_format="pyarrow").to_arrow_refs()
    ) + list(
        right_ds.select_columns(cols).map_batches(
            tag(1), batch_format="pyarrow").to_arrow_refs()
    )
    out = hash_exchange(refs, cols, finish, combine_fn=combine,
                        shard_output_dir=shard_output_dir)
    if shard_output_dir is not None:
        return None
    if out is None:
        return _arrow_schema(left_ds.select_columns(cols)).empty_table()
    return out


def hot_keys(ds, key_col: str, min_count: int, per_batch_k: int = 16):
    """Cheap hot-key detector for the skew join: per-batch value_counts
    keeps only each block's `per_batch_k` most frequent keys (fixed
    per-block state), the driver sums those partials and returns keys
    whose summed LOWER-BOUND count reaches `min_count`. A key above
    min_count corpus-wide that is hot in most blocks is caught (the
    skew-join use case); a borderline key that is missed merely stays on
    the ordinary shuffle path — detection affects the PLAN, never the
    result. Reads only the key column."""
    import ray

    def partial(t: pa.Table) -> pa.Table:
        col = t[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vc = col.drop_null().value_counts()
        cnt = pc.cast(vc.field("counts"), pa.int64())
        tab = pa.table({"k": vc.field("values"), "cnt": cnt})
        order = pc.sort_indices(tab, sort_keys=[("cnt", "descending")])
        return tab.take(order[:per_batch_k])

    parts = [t for t in ray.get(
        ds.select_columns([key_col]).map_batches(
            partial, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows and "k" in t.column_names]
    if not parts:
        return None  # caller supplies an empty array of the key's type
    tot = pa.concat_tables(parts).group_by(["k"]).aggregate([("cnt", "sum")])
    hot = tot.filter(pc.greater_equal(tot["cnt_sum"], min_count))
    col = hot["k"]
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def skew_join(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    left_keep: dict[str, str],
    right_keep: dict[str, str],
    out_key: Optional[str] = None,
    min_hot_count: int = 100_000,
    salts: int = 8,
    shard_output_dir: Optional[str] = None,
) -> Optional[pa.Table]:
    """Skew-safe big-fact × dim INNER equi-join — the salted variant of
    `hash_join` for Zipf-distributed keys, where one hot key would
    otherwise funnel a large fraction of the fact table through a single
    reduce shard (the classic straggler at 100 TB).

    Plan: (0) `hot_keys` scans the LEFT key column only and returns the
    keys above `min_hot_count`; (1) both sides stream through ONE
    (key, salt) exchange — a hot LEFT row gets salt = row-index % salts
    (spreading the hot key over `salts` shards), a hot RIGHT row is
    REPLICATED once per salt so every salted shard can complete its
    matches locally; cold rows ride salt 0 unchanged. Shard-local
    pd.merge on (key, salt) — replicas can never cross-match because the
    salt is part of the merge key. Result is row-for-row identical to
    `hash_join(..., how="inner")` / SQL INNER JOIN; only the partitioning
    differs. Each fact row still moves exactly once; the replication cost
    is |hot right rows| × salts (dim-sized, bounded by design — for a
    hot-on-BOTH-sides many-to-many the cross product itself is the
    problem, use range_join_agg).

    Null semantics: a null key never matches; null-key rows are dropped
    map-side on both sides (INNER)."""
    overlap = set(left_keep.values()) & set(right_keep.values())
    if overlap:
        raise ValueError(f"output column collision across sides: {overlap}")
    import ray

    key_out = out_key or left_key
    l_sch, r_sch = _arrow_schema(left_ds), _arrow_schema(right_ds)
    key_typ = l_sch.field(left_key).type
    numeric_key = pa.types.is_integer(key_typ) or pa.types.is_floating(key_typ)

    def _xkey(col):
        # same canonical-dtype trick as hash_join: pandas hashes int64
        # and float64 differently and a null flips the block dtype
        return pc.cast(col, pa.float64()) if numeric_key else col

    hot = hot_keys(left_ds, left_key, min_hot_count)
    if hot is None:
        hot = pa.array([], key_typ)
    hot_ref = ray.put(hot)

    fields = [pa.field(key_out, key_typ)]
    fields += [pa.field(d, l_sch.field(s).type) for s, d in left_keep.items()]
    fields += [pa.field(d, r_sch.field(s).type) for s, d in right_keep.items()]
    target = pa.schema(fields)
    l_out = [key_out, *left_keep.values()]
    r_out = list(right_keep.values())

    def prep_left(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[left_key]))
        cols: dict = {key_out: t[left_key]}
        for s, d in left_keep.items():
            cols[d] = t[s]
        is_hot = np.asarray(pc.is_in(t[left_key], value_set=ray.get(hot_ref)))
        salt = np.where(is_hot,
                        np.arange(t.num_rows, dtype=np.int64) % salts, 0)
        cols["_side"] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        cols["_salt"] = pa.array(salt, pa.int64())
        cols["_jx"] = _xkey(t[left_key])
        return pa.table(cols)

    def prep_right(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[right_key]))
        is_hot = np.asarray(pc.is_in(t[right_key], value_set=ray.get(hot_ref)))
        n = t.num_rows
        # replicate hot rows once per salt; cold rows once with salt 0
        reps = np.where(is_hot, salts, 1).astype(np.int64)
        idx = np.repeat(np.arange(n, dtype=np.int64), reps)
        offs = np.concatenate(([0], np.cumsum(reps)))[:-1]
        salt = np.arange(len(idx), dtype=np.int64) - np.repeat(offs, reps)
        t = t.take(pa.array(idx, pa.int64()))
        cols = {key_out: t[right_key]}
        for s, d in right_keep.items():
            cols[d] = t[s]
        cols["_side"] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        cols["_salt"] = pa.array(salt, pa.int64())
        cols["_jx"] = _xkey(t[right_key])
        return pa.table(cols)

    def finish(t: pa.Table) -> pa.Table:
        df = _ensure_cols(t.to_pandas(), [*l_out, *r_out])
        is_left = df["_side"].to_numpy() == 1
        lf = df.loc[is_left, ["_jx", "_salt", *l_out]]
        rf = df.loc[~is_left, ["_jx", "_salt", *r_out]]
        m = lf.merge(rf, on=["_jx", "_salt"], how="inner", sort=False)
        m = m[[*l_out, *r_out]]
        for f in target:
            if pd.api.types.is_float_dtype(m[f.name]):
                if pa.types.is_integer(f.type):
                    m[f.name] = m[f.name].astype("Int64")
                elif not pa.types.is_floating(f.type):
                    col = m[f.name]
                    m[f.name] = col.astype(object).where(col.notna(), None)
        return pa.Table.from_pandas(m, preserve_index=False, schema=target)

    refs = (
        left_ds.map_batches(prep_left, batch_format="pyarrow").to_arrow_refs()
        + right_ds.map_batches(prep_right,
                               batch_format="pyarrow").to_arrow_refs()
    )
    out = hash_exchange(refs, ["_jx", "_salt"], finish,
                        shard_output_dir=shard_output_dir)
    if shard_output_dir is not None:
        return None
    return target.empty_table() if out is None else out


def cdc_upsert(
    base_ds,
    changes_ds,
    key_col: str,
    seq_col: str,
    val_col: str,
    del_col: str,
    base_key_col: Optional[str] = None,
    base_val_col: Optional[str] = None,
    shard_output_dir: Optional[str] = None,
):
    """Change-data-capture merge (MERGE INTO semantics): apply a changelog
    to a base snapshot, latest change per key wins. For every key the
    change with the highest `seq_col` decides: a delete tombstone
    (`del_col` true) removes the key from the output, any other change
    replaces the base value (or inserts the key if the base lacks it);
    keys with no change keep their base row. Null-keyed change rows are
    ignored (SQL join parity). Ties on `seq_col` break toward the later
    row in changelog order, mirroring log-replay semantics — drive it
    with a unique sequence (LSN/event id) for determinism.

    Scale shape: both sides are pruned to fixed-width (key, seq, value,
    tombstone) rows at the read, ONE key-hash exchange co-locates a
    key's base row with all its changes, and the shard body is a pure
    pandas latest-wins pass (sort by seq, drop_duplicates keep=last) —
    no key's CHANGE HISTORY needs to fit anywhere except its shard, and
    the output is keyspace-sized, streamable to parquet shards via
    `shard_output_dir` exactly like the dedup exchanges.

    Returns (key, value, src) with src in {'base', 'changed'}.
    """

    bkey = base_key_col or key_col
    bval = base_val_col or val_col

    def prep_base(t: pa.Table) -> pa.Table:
        out = pa.table({
            "k": t[bkey],
            "seq": pa.nulls(t.num_rows, pa.int64()),
            "v": pc.cast(t[bval], pa.float64()),
            "is_del": pa.nulls(t.num_rows, pa.bool_()),
            "side": pa.array(np.zeros(t.num_rows, np.int8)),
        })
        return out.filter(pc.is_valid(out["k"]))

    def prep_changes(t: pa.Table) -> pa.Table:
        out = pa.table({
            "k": t[key_col],
            "seq": pc.cast(t[seq_col], pa.int64()),
            "v": pc.cast(t[val_col], pa.float64()),
            # a null tombstone flag means "not a delete" (SQL: NOT NULL
            # IS NOT TRUE), and keeps the pandas bool path object-free
            "is_del": pc.fill_null(pc.cast(t[del_col], pa.bool_()), False),
            "side": pa.array(np.ones(t.num_rows, np.int8)),
        })
        return out.filter(pc.is_valid(out["k"]))

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ch = df[df["side"] == 1]
        # latest change per key: stable sort on seq, last row wins
        last = ch.sort_values("seq", kind="stable").drop_duplicates(
            "k", keep="last")
        live = last[~last["is_del"].astype(bool)][["k", "v"]]
        base = df[df["side"] == 0][["k", "v"]]
        # keys with ANY change (incl. deletes) drop their base row
        keep = base[~base["k"].isin(set(last["k"]))]
        return pa.table({
            "key": pa.array(
                np.concatenate([keep["k"].to_numpy(np.int64),
                                live["k"].to_numpy(np.int64)])
                if len(keep) + len(live) else np.array([], np.int64)),
            "value": pa.array(
                np.concatenate([keep["v"].to_numpy(np.float64),
                                live["v"].to_numpy(np.float64)])
                if len(keep) + len(live) else np.array([], np.float64)),
            "src": pa.array(["base"] * len(keep) + ["changed"] * len(live),
                            pa.string()),
        })

    refs = list(base_ds.map_batches(
        prep_base, batch_format="pyarrow").to_arrow_refs())
    refs += list(changes_ds.map_batches(
        prep_changes, batch_format="pyarrow").to_arrow_refs())
    out = hash_exchange(refs, ["k"], finish,
                        shard_output_dir=shard_output_dir)
    if shard_output_dir is not None:
        return None
    empty = pa.table({"key": pa.array([], pa.int64()),
                      "value": pa.array([], pa.float64()),
                      "src": pa.array([], pa.string())})
    return empty if out is None else out
