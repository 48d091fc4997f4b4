"""Distributed exact keyed quantiles.

The reference's only numeric summaries are count/bytes totals
(`plugins/out_flowcounter/out_flowcounter.c` — studied, not copied); a
telemetry engine also needs latency/value percentiles per key. Exact
quantiles are not decomposable into per-batch partials, so this is a real
co-locating exchange: prune to (key, value) fixed-width pairs at the read,
hash-exchange on the key, and compute every key's quantiles inside one
vectorized pandas body per shard.

Partitioning assumption (documented): one KEY's values fit a reduce shard
(per-category metric distributions — the usual case). For keys whose value
lists exceed a shard, `keyed_quantiles_approx` below is the scale path: a
fixed-bin histogram sketch whose per-key state is BINS counts regardless
of value volume — partials combine associatively, the exchange moves
(key, bin, count) rows only, and the estimate carries a hard error bound
of one bin width ((max-min)/bins per key), which the kmeans-style
invariant driver query verifies against the exact operator.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..shuffle import hash_exchange


def _key_groups(tc: pa.Table, key_col: str):
    """Type-stable key factorization: (unique-keys Arrow array, int64
    group id per row). A null key is its own group (the last id), like
    SQL GROUP BY. Keys never round-trip through pandas — an int64 key
    column holding one null would otherwise float the WHOLE column (and
    an all-null shard would infer double for a string key), so two
    shards of one exchange could emit incompatible schemas."""
    col = tc[key_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    enc = col.dictionary_encode()
    ind = enc.indices
    k = len(enc.dictionary)
    codes = ind.to_numpy(zero_copy_only=False)
    null_mask = np.asarray(pc.is_null(ind))
    gid = np.where(null_mask, k, codes).astype(np.int64)
    keys = enc.dictionary
    if null_mask.any():
        keys = pa.concat_arrays([keys, pa.nulls(1, keys.type)])
    return keys, gid


def _group_slices(gid: np.ndarray):
    """Row-index runs per group id: (sorted order, run starts) — loop
    over DISTINCT groups, not rows."""
    order = np.argsort(gid, kind="stable")
    g = gid[order]
    starts = np.concatenate(
        ([0], np.nonzero(g[1:] != g[:-1])[0] + 1, [len(g)]))
    return order, starts


def keyed_quantiles(
    ds,
    key_col: str,
    value_col: str,
    qs: Sequence[float] = (0.5, 0.95, 0.99),
    names: Sequence[str] = ("p50", "p95", "p99"),
) -> Optional[pa.Table]:
    """Per key: exact linear-interpolated quantiles of `value_col` (the
    SQL `quantile_cont` / numpy 'linear' definition), nulls ignored. A
    null KEY is its own group (SQL GROUP BY); keys whose values are all
    null produce no row (quantile_cont over nothing is NULL and the SQL
    twin drops it the same way)."""
    qlist = list(qs)

    def finish(t: pa.Table) -> pa.Table:
        tc = t.combine_chunks()
        keys, gid = _key_groups(tc, key_col)
        vals = tc[value_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        ok = ~np.isnan(vals)
        gid, vals = gid[ok], vals[ok]
        if not len(gid):  # every value in the shard was null
            cols = {key_col: keys.slice(0, 0)}
            for name in names:
                cols[name] = pa.array([], pa.float64())
            return pa.table(cols)
        order, starts = _group_slices(gid)
        key_ids = []
        rows = []
        # vectorized within each key: one np.quantile call computes all
        # requested quantiles over the key's values at C speed; the
        # Python loop is over DISTINCT KEYS in the shard, not rows
        for i in range(len(starts) - 1):
            sel = order[starts[i]:starts[i + 1]]
            key_ids.append(gid[sel[0]])
            rows.append(np.quantile(vals[sel], qlist, method="linear"))
        mat = np.asarray(rows, dtype=np.float64).reshape(
            len(rows), len(qlist))
        cols = {key_col: keys.take(pa.array(key_ids, pa.int64()))}
        for j, name in enumerate(names):
            cols[name] = pa.array(mat[:, j], pa.float64())
        return pa.table(cols)

    pruned = ds.select_columns([key_col, value_col])
    return hash_exchange(pruned.to_arrow_refs(), [key_col], finish)


def _keyed_ranges(ds, key_col: str, value_col: str) -> dict:
    """Per-key (min, max) via in-batch Arrow group_by partials merged with
    one key-hash exchange of tiny rows; collected to a driver dict for
    broadcast (assumption: the KEY CARDINALITY fits a heap — same contract
    as the broadcast enrich dim, and far smaller than any value list)."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by([key_col]).aggregate(
            [(value_col, "min"), (value_col, "max")]
        )
        return g.rename_columns([key_col, "vmin", "vmax"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by([key_col]).aggregate([("vmin", "min"), ("vmax", "max")])
        return g.rename_columns([key_col, "vmin", "vmax"])

    pruned = ds.select_columns([key_col, value_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    merged = hash_exchange(pruned.to_arrow_refs(), [key_col], merge,
                           combine_fn=merge)
    if merged is None:
        return {}
    return {
        r[key_col]: (r["vmin"], r["vmax"])
        for r in merged.to_pylist()
        if r["vmin"] is not None
    }


def keyed_quantiles_approx(
    ds,
    key_col: str,
    value_col: str,
    qs: Sequence[float] = (0.5, 0.95, 0.99),
    names: Sequence[str] = ("p50", "p95", "p99"),
    bins: int = 2048,
) -> Optional[pa.Table]:
    """Scale-path quantiles: fixed-bin histogram sketch per key.

    Two passes: (1) per-key (min, max) — tiny exchange; (2) per-batch
    sparse (key, bin, count) partials pre-combined in-batch, merged by an
    associative group-sum exchange, finished per key by interpolating the
    target rank inside its bin. Per-key sketch state is <= `bins` counts
    no matter how many values the key has — the over-shard regime the
    exact operator documents away. Estimates carry a hard bound:
    |approx - exact| <= (max-min)/bins per key.
    """
    import ray

    qlist = np.asarray(list(qs), dtype=np.float64)
    ranges = _keyed_ranges(ds, key_col, value_col)
    ranges_ref = ray.put(ranges)

    def sketch(t: pa.Table, _r=ranges_ref) -> pa.Table:
        rng = ray.get(_r)
        df = t.select([key_col, value_col]).to_pandas()
        # null keys are excluded from the sketch path: a numeric null key
        # round-trips as NaN in pandas but as None in the ranges dict, so
        # no stable lookup representation exists (the EXACT operator keeps
        # them; documented divergence)
        df = df[df[value_col].notna() & df[key_col].notna()]
        if not len(df):
            return pa.table(
                {key_col: pa.array([], t.schema.field(key_col).type),
                 "bin": pa.array([], pa.int64()),
                 "cnt": pa.array([], pa.int64())}
            )
        keys = df[key_col]
        # vectorized range lookup: Series-backed map, not a per-row lambda
        lo_s = pd.Series({k: v[0] for k, v in rng.items()})
        hi_s = pd.Series({k: v[1] for k, v in rng.items()})
        lo = keys.map(lo_s).to_numpy(dtype=np.float64)
        hi = keys.map(hi_s).to_numpy(dtype=np.float64)
        v = df[value_col].to_numpy(dtype=np.float64)
        width = np.where(hi > lo, hi - lo, 1.0)
        b = np.clip(((v - lo) / width * bins).astype(np.int64), 0, bins - 1)
        sub = pd.DataFrame({key_col: keys.to_numpy(), "bin": b})
        g = sub.groupby([key_col, "bin"], sort=False).size().reset_index(name="cnt")
        return pa.Table.from_pandas(g, preserve_index=False)

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by([key_col, "bin"]).aggregate([("cnt", "sum")])
        return g.rename_columns([key_col, "bin", "cnt"])

    def finish(t: pa.Table, _r=ranges) -> pa.Table:
        df = t.to_pandas()
        keys_out, rows = [], []
        for key, g in df.groupby(key_col, sort=False, dropna=False):
            lo, hi = _r[key]
            counts = np.zeros(bins, dtype=np.int64)
            # a reduce shard may still see one (key, bin) row per SPLIT
            # chunk (combine runs per chunk, not globally) — sum, not assign
            np.add.at(counts, g["bin"].to_numpy(), g["cnt"].to_numpy())
            n = counts.sum()
            cum = np.cumsum(counts)
            width = (hi - lo) / bins if hi > lo else 0.0
            est = np.empty(len(qlist))
            for j, q in enumerate(qlist):
                r = q * (n - 1)  # quantile_cont's 0-based target rank
                lo_r, hi_r = int(np.floor(r)), int(np.ceil(r))
                frac = r - lo_r

                def stat(rank: int) -> float:
                    b = int(np.searchsorted(cum, rank + 1))
                    if width == 0.0:
                        return lo
                    prev = cum[b - 1] if b else 0
                    inbin = counts[b]
                    # uniform-within-bin interpolation of the rank
                    off = (rank + 1 - prev) / inbin if inbin else 0.0
                    return lo + (b + off) * width

                est[j] = (1 - frac) * stat(lo_r) + frac * stat(hi_r)
            keys_out.append(key)
            rows.append(est)
        mat = np.asarray(rows).reshape(len(rows), len(qlist))
        out = {key_col: keys_out}
        for j, name in enumerate(names):
            out[name] = mat[:, j]
        return pa.Table.from_pandas(pd.DataFrame(out), preserve_index=False)

    pruned = ds.select_columns([key_col, value_col]).map_batches(
        sketch, batch_format="pyarrow"
    )
    return hash_exchange(pruned.to_arrow_refs(), [key_col], finish,
                         combine_fn=combine)


def keyed_quantiles_error_check(
    ds,
    key_col: str,
    value_col: str,
    qs: Sequence[float] = (0.5, 0.95, 0.99),
    bins: int = 2048,
) -> pa.Table:
    """Invariant table for the driver oracle: runs the exact operator and
    the sketch side by side and counts estimates outside the hard
    (max-min)/bins error bound (must be 0)."""
    names = [f"q{j}" for j in range(len(list(qs)))]
    exact = keyed_quantiles(ds, key_col, value_col, qs, names).to_pandas()
    approx = keyed_quantiles_approx(ds, key_col, value_col, qs, names,
                                    bins=bins).to_pandas()
    ranges = _keyed_ranges(ds, key_col, value_col)
    m = exact.merge(approx, on=key_col, suffixes=("_e", "_a"))
    viol = 0
    for _, row in m.iterrows():
        lo, hi = ranges[row[key_col]]
        bound = (hi - lo) / bins + 1e-9 * (1 + abs(hi) + abs(lo))
        for nm in names:
            if abs(row[f"{nm}_e"] - row[f"{nm}_a"]) > bound:
                viol += 1
    return pa.table(
        {
            "n_keys": pa.array([len(m)], pa.int64()),
            "n_violations": pa.array([viol], pa.int64()),
        }
    )


# ------------------------------------------------------------ heavy hitters


def _mg_compress(keys: pa.Array, cnts: np.ndarray, m: int):
    """Misra-Gries compress: keep at most m counters by subtracting the
    (m+1)-th largest count from all and dropping non-positives. Estimates
    stay lower bounds; total decrement across any merge tree is bounded
    by N/(m+1) (mergeable-summaries guarantee, Agarwal et al. 2013)."""
    if len(cnts) <= m:
        return keys, cnts
    order = np.argsort(-cnts, kind="stable")
    d = cnts[order[m]]
    keep = order[:m]
    new = cnts[keep] - d
    pos = new > 0
    idx = pa.array(keep[pos].astype(np.int64))
    return keys.take(idx), new[pos]


def _mg_summary_table(keys, cnts) -> pa.Table:
    return pa.table({"key": keys, "cnt": pa.array(cnts, pa.int64())})


def _mg_merge_tables(tables, m: int) -> pa.Table:
    live = [t for t in tables if t is not None and t.num_rows]
    if not live:
        return pa.table({"key": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    t = pa.concat_tables(live, promote_options="default")
    g = t.group_by(["key"]).aggregate([("cnt", "sum")])
    g = g.rename_columns(["key", "cnt"])
    keys = g["key"]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    k2, c2 = _mg_compress(keys, g["cnt"].to_numpy(zero_copy_only=False), m)
    return _mg_summary_table(k2, c2)


def heavy_hitters(
    ds,
    item_col: str,
    m: int = 256,
    fanin: int = 32,
    tokenize: bool = False,
) -> tuple[pa.Table, int]:
    """Corpus-wide frequent items via mergeable Misra-Gries summaries.

    Per block: an EXACT value_counts compressed to m counters; summaries
    then merge up a fan-in tree of remote tasks (each level moves <= m
    rows per summary), so no stage ever sees more than fanin * m rows —
    the all-to-all exchange `vocab_topk` needs is gone, at the price of
    the bounded underestimate. Returns (summary, n_items); every item
    with true count > n_items/(m+1) is guaranteed present, and every
    estimate e satisfies c_true - n_items/(m+1) <= e <= c_true.

    With tokenize=True the items are the whitespace tokens of `item_col`
    (the corpus-vocabulary use case; shares the oracle tokenizer).
    """
    import ray

    def summarize(b: pa.Table) -> pa.Table:
        if tokenize:
            from .text import _doc_tokens

            items, _, _ = _doc_tokens(b[item_col])
            items = items.filter(pc.not_equal(items, ""))
        else:
            items = b[item_col]
            if isinstance(items, pa.ChunkedArray):
                items = items.combine_chunks()
            items = items.drop_null()
        n = len(items)
        if n == 0:
            return pa.table({"key": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        vc = items.value_counts()
        keys = vc.field("values")
        cnts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        k2, c2 = _mg_compress(keys, cnts, m)
        t = _mg_summary_table(k2, c2)
        # per-summary item count rides along in a parallel column (row 0);
        # if compress cancelled every counter (all-equal counts), a
        # null-key carrier row keeps n in the stream
        if t.num_rows == 0:
            return pa.table({"key": pa.array([None], pa.string()),
                             "cnt": pa.array([0], pa.int64()),
                             "n": pa.array([n], pa.int64())})
        nn = np.zeros(t.num_rows, dtype=np.int64)
        nn[0] = n
        return t.append_column("n", pa.array(nn))

    summaries = ds.map_batches(summarize, batch_format="pyarrow")

    @ray.remote
    def merge_group(*tables):
        live = [t for t in tables if t is not None and t.num_rows]
        n = sum(int(pc.sum(t["n"]).as_py() or 0) for t in live)
        merged = _mg_merge_tables([t.select(["key", "cnt"]) for t in live], m)
        nn = np.zeros(merged.num_rows, dtype=np.int64)
        if len(nn):
            nn[0] = n
        elif n:
            # all counters cancelled but items existed: carry n anyway
            return pa.table({"key": pa.array([None], pa.string()),
                             "cnt": pa.array([0], pa.int64()),
                             "n": pa.array([n], pa.int64())})
        return merged.append_column("n", pa.array(nn))

    refs = summaries.to_arrow_refs()
    while len(refs) > 1:
        refs = [
            merge_group.remote(*refs[i : i + fanin])
            for i in range(0, len(refs), fanin)
        ]
    final = ray.get(refs[0]) if refs else None
    if final is None or final.num_rows == 0:
        return (pa.table({"key": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())}), 0)
    n_items = int(pc.sum(final["n"]).as_py() or 0)
    out = final.select(["key", "cnt"]).filter(pc.is_valid(final["key"]))
    return out, n_items


def heavy_hitters_error_check(
    ds,
    item_col: str,
    m: int = 256,
    tokenize: bool = False,
) -> pa.Table:
    """Invariant table for the driver oracle: exact corpus counts (one
    token-keyed exchange) vs the sketch. Violations (must be 0):
    - an item with true count > n/(m+1) missing from the sketch;
    - an estimate above its true count (MG estimates are lower bounds);
    - an estimate more than n/(m+1) below its true count."""
    from ..shuffle import hash_exchange

    sketch, n_items = heavy_hitters(ds, item_col, m=m, tokenize=tokenize)

    def exact_partial(b: pa.Table) -> pa.Table:
        if tokenize:
            from .text import _doc_tokens

            items, _, _ = _doc_tokens(b[item_col])
            items = items.filter(pc.not_equal(items, ""))
        else:
            items = b[item_col]
            if isinstance(items, pa.ChunkedArray):
                items = items.combine_chunks()
            items = items.drop_null()
        vc = items.value_counts()
        return pa.table({"key": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["key"]).aggregate([("cnt", "sum")])
        return g.rename_columns(["key", "cnt"])

    exact = hash_exchange(
        ds.select_columns([item_col]).map_batches(
            exact_partial, batch_format="pyarrow"
        ).to_arrow_refs(),
        ["key"],
        merge,
    )
    truth = (
        {} if exact is None
        else dict(zip(exact["key"].to_pylist(),
                      exact["cnt"].to_pylist()))
    )
    est = dict(zip(sketch["key"].to_pylist(), sketch["cnt"].to_pylist()))
    bound = n_items / (m + 1)
    viol = 0
    for k, c in truth.items():
        e = est.get(k)
        if e is None:
            if c > bound:
                viol += 1
        elif e > c or e < c - bound:
            viol += 1
    viol += sum(1 for k in est if k not in truth)  # phantom keys
    return pa.table(
        {
            "n_items": pa.array([n_items], pa.int64()),
            "n_violations": pa.array([viol], pa.int64()),
        }
    )


# ----------------------------------------------------------- HyperLogLog


def _msb_index(v: np.ndarray, bits: int) -> np.ndarray:
    """0-based index of the highest set bit per element (uint64 input),
    vectorized bit-twiddling (exact — no float log2, which breaks past
    2^53). v == 0 yields -1."""
    idx = np.full(len(v), -1, dtype=np.int64)
    x = v.copy()
    for s in (32, 16, 8, 4, 2, 1):
        if s < bits:
            y = x >> np.uint64(s)
            gt = y != 0
            idx[gt] += s
            x = np.where(gt, y, x)
    idx[v != 0] += 1
    return idx


def hll_registers(hashes: np.ndarray, p: int = 14) -> np.ndarray:
    """One block's HLL register array (2^p uint8): register = top p hash
    bits, value = max over items of (leading-zero count of the remaining
    64-p bits) + 1. Registers merge across blocks/nodes by elementwise
    MAX — fully associative/commutative (the HLL mergeability property).
    """
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(hashes) == 0:
        return regs
    h = hashes.astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    low = h & np.uint64((1 << (64 - p)) - 1)
    msb = _msb_index(low, 64 - p)
    rank = (64 - p) - msb  # msb=-1 (low==0) -> 64-p+1
    rank = np.where(msb < 0, 64 - p + 1, rank).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range (linear counting)
    correction; large-range correction is unnecessary at 64-bit."""
    m = float(len(regs))
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum()
    zeros = int((regs == 0).sum())
    if e <= 2.5 * m and zeros:
        return m * np.log(m / zeros)
    return float(e)


def hll_distinct(
    ds,
    item_col: str,
    p: int = 14,
    fanin: int = 32,
    tokenize: bool = False,
) -> float:
    """Approximate corpus-wide COUNT(DISTINCT item) with fixed 2^p-byte
    state: per-block registers, elementwise-max merged up a fan-in tree
    of remote tasks (the third mergeable sketch next to the quantile
    histogram and Misra-Gries). Standard error ~1.04/sqrt(2^p) (~0.8% at
    p=14). Deterministic for a given corpus — the item hash is the
    engine's fixed string hash."""
    import ray

    from .dedup import _hash_string_array

    def block_regs(b: pa.Table) -> pa.Table:
        if tokenize:
            from .text import _doc_tokens

            items, _, _ = _doc_tokens(b[item_col])
            items = items.filter(pc.not_equal(items, ""))
        else:
            items = b[item_col]
            if isinstance(items, pa.ChunkedArray):
                items = items.combine_chunks()
            items = items.drop_null()
        if len(items) == 0:
            regs = np.zeros(1 << p, dtype=np.uint8)
        else:
            regs = hll_registers(_hash_string_array(items.unique()), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.large_binary())})

    @ray.remote
    def max_group(*tables):
        acc = np.zeros(1 << p, dtype=np.uint8)
        for t in tables:
            if t is None or "regs" not in t.column_names:
                continue  # empty blocks pass through map_batches unmapped
            for buf in t["regs"].to_pylist():
                acc = np.maximum(acc, np.frombuffer(buf, dtype=np.uint8))
        return pa.table({"regs": pa.array([acc.tobytes()], pa.large_binary())})

    refs = ds.map_batches(
        block_regs, batch_format="pyarrow", batch_size=None
    ).to_arrow_refs()
    while len(refs) > 1:
        refs = [max_group.remote(*refs[i : i + fanin])
                for i in range(0, len(refs), fanin)]
    if not refs:
        return 0.0
    final = ray.get(refs[0])
    if "regs" not in final.column_names or final.num_rows == 0:
        return 0.0
    return hll_estimate(np.frombuffer(final["regs"].to_pylist()[0],
                                      dtype=np.uint8))


def hll_error_check(
    ds,
    item_col: str,
    p: int = 14,
    tokenize: bool = False,
    n_sigma: float = 6.0,
) -> pa.Table:
    """Invariant table for the driver oracle: the HLL estimate vs the
    exact distinct count (one item-keyed unique exchange), pinned to be
    within n_sigma standard errors (deterministic for a fixed corpus +
    the engine's fixed hash)."""

    def uniq_partial(b: pa.Table) -> pa.Table:
        if tokenize:
            from .text import _doc_tokens

            items, _, _ = _doc_tokens(b[item_col])
            items = items.filter(pc.not_equal(items, ""))
        else:
            items = b[item_col]
            if isinstance(items, pa.ChunkedArray):
                items = items.combine_chunks()
            items = items.drop_null()
        return pa.table({"key": items.unique()})

    merged = hash_exchange(
        ds.select_columns([item_col]).map_batches(
            uniq_partial, batch_format="pyarrow"
        ).to_arrow_refs(),
        ["key"],
        lambda t: pa.table({"key": pc.unique(t["key"])}),
    )
    exact = 0 if merged is None else merged.num_rows
    est = hll_distinct(ds, item_col, p=p, tokenize=tokenize)
    rel_err = abs(est - exact) / exact if exact else abs(est)
    bound = n_sigma * 1.04 / np.sqrt(1 << p)
    return pa.table(
        {
            "exact_distinct": pa.array([exact], pa.int64()),
            "within_bound": pa.array([int(rel_err <= bound)], pa.int64()),
        }
    )


def hll_distinct_per_key(
    ds,
    key_col: str,
    item_col: str,
    p: int = 12,
) -> Optional[pa.Table]:
    """Approximate COUNT(DISTINCT item) PER KEY (distinct visitors per
    host, distinct urls per domain): per block each key emits its SPARSE
    non-zero HLL registers as (key, reg, rank) rows — at most 2^p rows
    per key per block, usually far fewer — which merge through one
    key-hash exchange with a rank-MAX combiner. Estimation happens
    shard-locally per key; nothing key-sized ever lands on the driver.
    Emits (key, approx_distinct)."""
    from .dedup import _hash_string_array

    def partial(b: pa.Table) -> pa.Table:
        keys = b[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        items = b[item_col]
        if isinstance(items, pa.ChunkedArray):
            items = items.combine_chunks()
        valid = pc.and_(pc.is_valid(keys), pc.is_valid(items))
        keys = keys.filter(valid)
        items = items.filter(valid)
        if len(keys) == 0:
            return pa.table({key_col: pa.array([], b.schema.field(key_col).type),
                             "reg": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64())})
        h = _hash_string_array(pc.cast(items, pa.string()))
        codes, uniq = pd.factorize(
            pd.Series(keys.to_pandas()), use_na_sentinel=False
        )
        reg = (h >> np.uint64(64 - p)).astype(np.int64)
        low = h & np.uint64((1 << (64 - p)) - 1)
        msb = _msb_index(low, 64 - p)
        rank = np.where(msb < 0, 64 - p + 1, (64 - p) - msb).astype(np.int64)
        # sparse per-(key, reg) max via lexsort + run tails
        order = np.lexsort((rank, reg, codes))
        ck, cr, rk = codes[order], reg[order], rank[order]
        tail = np.ones(len(ck), dtype=bool)
        tail[:-1] = (ck[1:] != ck[:-1]) | (cr[1:] != cr[:-1])
        return pa.table(
            {
                key_col: pa.array(np.asarray(uniq, dtype=object)[ck[tail]]),
                "reg": pa.array(cr[tail]),
                "rank": pa.array(rk[tail]),
            }
        )

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by([key_col, "reg"]).aggregate([("rank", "max")])
        return g.rename_columns([key_col, "reg", "rank"])

    def finish(t: pa.Table) -> pa.Table:
        df = combine(t).to_pandas()
        keys_out, ests = [], []
        for key, g in df.groupby(key_col, sort=False, dropna=False):
            regs = np.zeros(1 << p, dtype=np.uint8)
            np.maximum.at(regs, g["reg"].to_numpy(),
                          g["rank"].to_numpy().astype(np.uint8))
            keys_out.append(key)
            ests.append(hll_estimate(regs))
        return pa.Table.from_pandas(
            pd.DataFrame({key_col: keys_out, "approx_distinct": ests}),
            preserve_index=False,
        )

    pruned = ds.select_columns([key_col, item_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    return hash_exchange(pruned.to_arrow_refs(), [key_col], finish,
                         combine_fn=combine)


def keyed_outliers(
    ds,
    key_col: str,
    value_col: str,
    id_col: str,
    z_threshold: float = 3.0,
) -> Optional[pa.Table]:
    """Per-key z-score outliers: rows whose value deviates more than
    z_threshold population standard deviations from their KEY's mean —
    the per-category anomaly gate (error-rate spikes per host, length
    outliers per domain).

    Two passes, both cheap: (1) per-key (n, sum, sumsq) moment partials
    combined in-batch and merged through one key-hash exchange of tiny
    rows, broadcast once via ray.put (key-cardinality contract, as the
    quantile ranges); (2) a pure flag map — vectorized z computation and
    filter, emitting (key, id, value, z). Nothing corpus-sized moves.
    """
    import ray

    def partial(t: pa.Table) -> pa.Table:
        v = pc.cast(t[value_col], pa.float64())
        sq = pc.multiply(v, v)
        g = pa.table(
            {key_col: t[key_col], "v": v, "sq": sq}
        ).group_by([key_col]).aggregate(
            [("v", "count"), ("v", "sum"), ("sq", "sum")]
        )
        return g.rename_columns([key_col, "n", "s", "ss"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by([key_col]).aggregate(
            [("n", "sum"), ("s", "sum"), ("ss", "sum")]
        )
        return g.rename_columns([key_col, "n", "s", "ss"])

    moments = hash_exchange(
        ds.select_columns([key_col, value_col]).map_batches(
            partial, batch_format="pyarrow"
        ).to_arrow_refs(),
        [key_col],
        merge,
        combine_fn=merge,
    )
    stats: dict = {}
    if moments is not None:
        for r in moments.to_pylist():
            n = r["n"]
            if not n:
                continue
            mu = r["s"] / n
            var = max(r["ss"] / n - mu * mu, 0.0)
            stats[r[key_col]] = (mu, float(np.sqrt(var)))
    sref = ray.put(stats)

    def flag(t: pa.Table, _s=sref) -> pa.Table:
        st = ray.get(_s)
        df = t.select([key_col, id_col, value_col]).to_pandas()
        df = df[df[value_col].notna()]
        if not len(df):
            return pa.table(
                {key_col: pa.array([], t.schema.field(key_col).type),
                 id_col: pa.array([], t.schema.field(id_col).type),
                 value_col: pa.array([], pa.float64()),
                 "z": pa.array([], pa.float64())}
            )
        # vectorized (C-speed) stat lookup — this runs per corpus row
        mu_s = pd.Series({k: v[0] for k, v in st.items()})
        sd_s = pd.Series({k: v[1] for k, v in st.items()})
        mu = df[key_col].map(mu_s).to_numpy(dtype=np.float64)
        sd = df[key_col].map(sd_s).to_numpy(dtype=np.float64)
        v = df[value_col].to_numpy(dtype=np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            z = (v - mu) / sd
        keep = (sd > 0) & (np.abs(z) > z_threshold)
        out = df[keep].copy()
        out["z"] = z[keep]
        out[value_col] = v[keep]
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.map_batches(flag, batch_format="pyarrow")


def pivot_sum(
    ds,
    key_col: str,
    cat_col: str,
    value_col: str,
    categories: Sequence[str],
) -> Optional[pa.Table]:
    """Long-to-wide pivot with sum aggregation — the reporting verb:
    one row per key, one column per category holding that category's
    value sum (SQL `sum(CASE WHEN cat = c THEN value END)`; NULL when
    the key has no rows in the category, never 0).

    `categories` is explicit (the output schema must be static for a
    distributed job — deriving it would be its own pass). Map-side
    (key, cat) partial sums via Arrow group_by keep the exchange moving
    tiny pre-combined rows; the shard-local pivot is one scatter per
    category.
    """
    cats = list(categories)

    def partial(t: pa.Table) -> pa.Table:
        v = pc.cast(t[value_col], pa.float64())
        tbl = pa.table({key_col: t[key_col], cat_col: t[cat_col], "v": v})
        tbl = tbl.filter(
            pc.and_(pc.is_valid(tbl["v"]),
                    pc.is_in(tbl[cat_col], value_set=pa.array(cats)))
        )
        g = tbl.group_by([key_col, cat_col]).aggregate([("v", "sum")])
        return g.rename_columns([key_col, cat_col, "v"])

    def finish(t: pa.Table) -> pa.Table:
        # group-sum combines split-chunk partials, after which (key, cat)
        # pairs are unique — the pivot is one plain scatter per category
        g = t.group_by([key_col, cat_col]).aggregate([("v", "sum")])
        df = g.rename_columns([key_col, cat_col, "v"]).to_pandas()
        keys, codes = np.unique(
            df[key_col].to_numpy(), return_inverse=True
        )
        vals = df["v"].to_numpy()
        out: dict = {key_col: keys}
        for c in cats:
            col = np.full(len(keys), np.nan)
            m = (df[cat_col] == c).to_numpy()
            col[codes[m]] = vals[m]
            out[f"{c}_sum"] = col
        return pa.Table.from_pandas(pd.DataFrame(out), preserve_index=False)

    pruned = ds.select_columns([key_col, cat_col, value_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    return hash_exchange(pruned.to_arrow_refs(), [key_col], finish)


def unpivot(
    ds,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
):
    """Wide-to-long melt, the inverse of `pivot_sum`: each input row emits
    one output row per value column as (ids..., column-name, value). SQL
    `UNPIVOT` / per-column `UNION ALL` parity; values are cast to float64
    so the long column has one type, and NULL cells stay NULL rows (SQL
    UNION ALL keeps them; use a filter after if you want UNPIVOT's
    null-dropping form).

    Purely map-side — no shuffle, no state: each batch melts to
    len(value_cols) stacked slices (zero-copy ids via table concat,
    one cast per column), so it streams at read speed.
    """
    ids, vals = list(id_cols), list(value_cols)

    def melt(t: pa.Table) -> pa.Table:
        parts = []
        for c in vals:
            parts.append(pa.table({
                **{i: t[i] for i in ids},
                var_name: pa.array(
                    np.full(t.num_rows, c, dtype=object), pa.string()),
                value_name: pc.cast(t[c], pa.float64()),
            }))
        return pa.concat_tables(parts)

    return ds.select_columns([*ids, *vals]).map_batches(
        melt, batch_format="pyarrow")


def rollup_sum(
    ds,
    k1: str,
    k2: str,
    value_col: str,
    out: str = "sum_value",
) -> pa.Table:
    """Two-level rollup — one pass computing sums at (k1, k2), (k1) and
    grand-total granularity (SQL `GROUP BY ROLLUP(k1, k2)`: rolled levels
    carry NULL in the rolled key). Null-key rows are EXCLUDED — enforced
    by a filter, since a data-NULL key would be indistinguishable from a
    roll-NULL without a GROUPING id column; the SQL twin filters the
    same way.

    Map-side (k1, k2) partial sums cross the wire, never raw rows; ONE
    exchange keyed on k1 alone co-locates everything a k1 group needs, so
    the (k1, k2) and (k1) levels are both exact in-shard. The grand total
    is emitted as one partial row per shard and folded on the driver — K
    rows, not data. Keying on k1 alone concentrates a hot k1 in one
    shard; for Zipf-hot k1 use ops/skew.salted aggregation for the fine
    level instead.
    """

    def partial(t: pa.Table) -> pa.Table:
        # null-key rows are EXCLUDED (enforced, not just assumed): a
        # data-NULL key is indistinguishable from a roll-NULL marker in
        # the output, so the contract filters them up front — the SQL
        # twins carry the same WHERE
        t = t.filter(pc.and_(pc.is_valid(t[k1]), pc.is_valid(t[k2])))
        g = pa.table({
            k1: t[k1], k2: t[k2],
            "v": pc.cast(t[value_col], pa.float64()),
        }).group_by([k1, k2]).aggregate([("v", "sum")])
        return g.rename_columns([k1, k2, "v"])

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        fine = (df.groupby([k1, k2], sort=False, as_index=False)["v"].sum())
        mid = df.groupby(k1, sort=False, as_index=False)["v"].sum()
        mid[k2] = None
        grand = pd.DataFrame({k1: [None], k2: [None],
                              "v": [df["v"].sum()], "_partial": [1]})
        fine["_partial"] = 0
        mid["_partial"] = 0
        return pa.Table.from_pandas(
            pd.concat([fine, mid[[k1, k2, "v", "_partial"]], grand],
                      ignore_index=True),
            preserve_index=False)

    refs = ds.select_columns([k1, k2, value_col]).map_batches(
        partial, batch_format="pyarrow").to_arrow_refs()
    merged = hash_exchange(refs, [k1], finish)
    if merged is None:
        return pa.table({k1: pa.array([], pa.string()),
                         k2: pa.array([], pa.string()),
                         out: pa.array([], pa.float64())})
    part = pc.equal(merged["_partial"], 1)
    shards = merged.filter(part)
    done = merged.filter(pc.invert(part)).select([k1, k2, "v"])
    grand = pa.table({
        k1: pa.nulls(1, merged.schema.field(k1).type),
        k2: pa.nulls(1, merged.schema.field(k2).type),
        "v": pa.array([pc.sum(shards["v"]).as_py() or 0.0], pa.float64()),
    })
    return pa.concat_tables([done, grand]).rename_columns([k1, k2, out])


def keyed_corr(
    ds,
    key_col: str,
    x_col: str,
    y_col: str,
) -> pa.Table:
    """Per-key Pearson correlation + least-squares regression of y on x
    (SQL `corr(y, x)` / `regr_slope(y, x)` / `regr_intercept(y, x)` /
    `regr_count(y, x)` per key) from MERGEABLE sufficient statistics:
    each batch contributes per-key (n, Σx, Σy, Σxx, Σyy, Σxy) rows —
    in-batch combined, summed through ONE key-hash exchange — and the
    closed forms finish per shard. Rows where either coordinate is NULL
    are excluded pairwise (the SQL regr_* semantics). Zero-variance keys
    (n < 2 or Sxx == 0 / Syy == 0) yield NULL corr/slope/intercept like
    the SQL aggregates.

    Raw co-moments in float64 are exact-enough only when the columns'
    magnitudes are moderate (|x|, |y| ≲ 1e6): cancellation error scales
    with mean²/variance. For epoch-like columns shift to a small origin
    first (the driver query uses seconds-of-day, not epoch seconds).
    """

    def partial(t: pa.Table) -> pa.Table:
        x = pc.cast(t[x_col], pa.float64())
        y = pc.cast(t[y_col], pa.float64())
        # zero-mask null pairs instead of filtering rows so a key whose
        # pairs are ALL null still groups (n=0 -> NULL stats, like SQL)
        ok = pc.and_kleene(pc.is_valid(x), pc.is_valid(y))
        zero = pa.scalar(0.0, pa.float64())
        xv = pc.if_else(ok, x, zero)
        yv = pc.if_else(ok, y, zero)
        g = pa.table({
            key_col: t[key_col],
            "n": pc.cast(pc.fill_null(ok, False), pa.float64()),
            "sx": xv, "sy": yv,
            "sxx": pc.multiply(xv, xv), "syy": pc.multiply(yv, yv),
            "sxy": pc.multiply(xv, yv),
        }).group_by([key_col]).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("syy", "sum"), ("sxy", "sum")]
        )
        return g.rename_columns(
            [key_col, "n", "sx", "sy", "sxx", "syy", "sxy"])

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by([key_col]).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("syy", "sum"), ("sxy", "sum")]
        )
        return g.rename_columns(
            [key_col, "n", "sx", "sy", "sxx", "syy", "sxy"])

    def finish(t: pa.Table) -> pa.Table:
        m = combine(t)
        # the KEY column stays Arrow end-to-end: a pandas round-trip
        # would float an int64 key holding one null, making this shard's
        # schema clash with its siblings at the driver concat
        n = m["n"].to_numpy(zero_copy_only=False)
        sx = m["sx"].to_numpy(zero_copy_only=False)
        sy = m["sy"].to_numpy(zero_copy_only=False)
        sxx = m["sxx"].to_numpy(zero_copy_only=False)
        syy = m["syy"].to_numpy(zero_copy_only=False)
        sxy = m["sxy"].to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            cxx = sxx - sx * sx / n
            cyy = syy - sy * sy / n
            cxy = sxy - sx * sy / n
            corr = cxy / np.sqrt(cxx * cyy)
            slope = cxy / cxx
            intercept = (sy - slope * sx) / n
        bad = (n < 2) | (cxx <= 0)
        corr[bad | (cyy <= 0)] = np.nan
        slope[bad] = np.nan
        intercept[bad] = np.nan
        # from_pandas=True maps the NaNs to Arrow NULLs, matching the
        # SQL aggregates' NULLs for degenerate keys
        return pa.table({
            key_col: m[key_col],
            "n_pairs": pa.array(n.astype(np.int64), pa.int64()),
            "corr": pa.array(corr, pa.float64(), from_pandas=True),
            "slope": pa.array(slope, pa.float64(), from_pandas=True),
            "intercept": pa.array(intercept, pa.float64(),
                                  from_pandas=True),
        })

    refs = ds.select_columns([key_col, x_col, y_col]).map_batches(
        partial, batch_format="pyarrow").to_arrow_refs()
    merged = hash_exchange(refs, [key_col], finish, combine_fn=combine)
    if merged is None:
        return pa.table({key_col: pa.array([], pa.string()),
                         "n_pairs": pa.array([], pa.int64()),
                         "corr": pa.array([], pa.float64()),
                         "slope": pa.array([], pa.float64()),
                         "intercept": pa.array([], pa.float64())})
    return merged


def mode_per_key(
    ds,
    key_col: str,
    value_col: str,
) -> pa.Table:
    """Per-key mode with a DETERMINISTIC tie-break: the most frequent
    non-null value per key, ties resolved to the smallest value (SQL
    `row_number() OVER (PARTITION BY key ORDER BY count DESC, value)`
    = 1 — pinned ordering, unlike the engine-defined tie of `mode()`).

    Map-side (key, value) count partials cross the wire — bounded by
    per-batch distinct pairs, never raw rows; ONE key-hash exchange sums
    them and elects each key's winner with a vectorized sort + first-row
    pick per key.
    """

    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col]
        ok = pc.is_valid(v)
        g = pa.table({
            key_col: t[key_col].filter(ok), value_col: v.filter(ok),
            "n": pa.array(np.ones(int(pc.sum(ok).as_py() or 0)),
                          pa.int64()),
        }).group_by([key_col, value_col]).aggregate([("n", "sum")])
        return g.rename_columns([key_col, value_col, "n"])

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by([key_col, value_col]).aggregate([("n", "sum")])
        return g.rename_columns([key_col, value_col, "n"])

    def finish(t: pa.Table) -> pa.Table:
        m = combine(t).combine_chunks()
        # Arrow-native winner election: keys never round-trip through
        # pandas (an int64 key with one null would float the column and
        # clash with sibling shards), and Arrow's sort orders any value
        # type the column can hold
        keys, gid = _key_groups(m, key_col)
        tmp = pa.table({"g": pa.array(gid, pa.int64()),
                        "n": m["n"], "v": m[value_col]})
        idx = np.asarray(pc.sort_indices(
            tmp, sort_keys=[("g", "ascending"), ("n", "descending"),
                            ("v", "ascending")]))
        gs = gid[idx]
        first = np.ones(len(gs), dtype=bool)
        first[1:] = gs[1:] != gs[:-1]
        sel = pa.array(idx[first], pa.int64())
        vals = (m[value_col].combine_chunks()
                if isinstance(m[value_col], pa.ChunkedArray)
                else m[value_col])
        ncol = (m["n"].combine_chunks()
                if isinstance(m["n"], pa.ChunkedArray) else m["n"])
        return pa.table({
            key_col: keys.take(pa.array(gs[first], pa.int64())),
            "mode": vals.take(sel),
            "n_mode": ncol.take(sel),
        })

    refs = ds.select_columns([key_col, value_col]).map_batches(
        partial, batch_format="pyarrow").to_arrow_refs()
    merged = hash_exchange(refs, [key_col], finish, combine_fn=combine)
    if merged is None:
        return pa.table({key_col: pa.array([], pa.string()),
                         "mode": pa.array([], pa.string()),
                         "n_mode": pa.array([], pa.int64())})
    return merged


def _skyline_2d(t: pa.Table, x_col: str, y_col: str):
    """Vectorized 2D maximal-points kernel: sort by (x desc, y desc),
    keep rows not dominated by a strictly-better-x prefix or a same-x
    higher y. Equal duplicate points all survive (neither dominates)."""
    if t is None or not t.num_rows:
        return None
    x = pc.cast(t[x_col], pa.float64()).to_numpy(zero_copy_only=False)
    y = pc.cast(t[y_col], pa.float64()).to_numpy(zero_copy_only=False)
    ok = ~(np.isnan(x) | np.isnan(y))
    idx = np.flatnonzero(ok)
    if not len(idx):
        return None
    order = idx[np.lexsort((-y[idx], -x[idx]))]
    xs, ys = x[order], y[order]
    new = np.ones(len(xs), bool)
    new[1:] = xs[1:] != xs[:-1]
    grp = np.cumsum(new) - 1
    # per-group max y is the group's first y (y desc within group)
    gmax = ys[new]
    # prefix max over strictly-better-x groups; the first group has no
    # prefix, so gate on grp > 0 rather than a -inf sentinel (a real
    # y == -inf point in the best-x group must stay on the frontier)
    before = np.maximum.accumulate(gmax)[grp - 1]
    keep = (ys == gmax[grp]) & ((grp == 0) | (ys > before))
    return t.take(pa.array(np.sort(order[keep])))


def skyline_2d(
    ds,
    x_col: str,
    y_col: str,
    fanin: int = 8,
) -> pa.Table:
    """Distributed 2D skyline (Pareto frontier, maximizing both
    columns): rows no other row dominates (>= in both dims, > in at
    least one). NULL/NaN coordinates never enter the frontier.

    Local skylines are a true combiner (a locally dominated row is
    globally dominated), so each block prunes first and only frontier
    candidates move; candidates then merge up a fan-in tree of
    skyline-of-union tasks, heavy_hitters-style — no all-to-all, the
    driver sees one table. Scale contract (documented): the FRONTIER
    fits a task heap — tight for correlated dims (the common case:
    score vs recency); anti-correlated uniform 2D data has an expected
    frontier of O(log n) but adversarial inputs can approach n.
    """
    import ray

    local = ray.remote(_skyline_2d)
    merge = ray.remote(
        lambda x, y, *ts: _skyline_2d(
            pa.concat_tables([p for p in ts if p is not None
                              and p.num_rows], promote_options="default")
            if any(p is not None and p.num_rows for p in ts) else None,
            x, y))
    refs = [local.remote(r, x_col, y_col) for r in ds.to_arrow_refs()]
    while len(refs) > 1:
        refs = [merge.remote(x_col, y_col, *refs[i : i + fanin])
                for i in range(0, len(refs), fanin)]
    out = ray.get(refs[0]) if refs else None
    if out is None:
        sch = _arrow_schema_of(ds)
        return sch.empty_table() if sch is not None else pa.table({})
    return out


def _arrow_schema_of(ds):
    try:
        s = ds.schema()
        return pa.schema(list(zip(s.names, s.types)))
    except Exception:
        return None


def count_distinct_per_key(
    ds,
    key_col: str,
    value_col: str,
    out: str = "n_distinct",
) -> pa.Table:
    """Exact per-key COUNT(DISTINCT value), nulls excluded like SQL.
    Map-side per-batch DISTINCT (key, value) pairs are all that cross
    the wire (the exact twin of `hll_distinct_per_key` — use that
    sketch when a key's distinct set is itself corpus-sized); ONE
    key-hash exchange, per-shard re-distinct + group count."""

    def partial(t: pa.Table) -> pa.Table:
        # null values stay as their own distinct row so a key whose
        # values are ALL null still groups (count 0, like SQL)
        return t.select([key_col, value_col]).group_by(
            [key_col, value_col]).aggregate([])

    def finish(t: pa.Table) -> pa.Table:
        d = t.group_by([key_col, value_col]).aggregate([])
        # Arrow "count" is valid-only: null value rows keep the key
        # alive but do not count
        g = d.group_by([key_col]).aggregate([(value_col, "count")])
        return g.rename_columns([key_col, out])

    refs = ds.select_columns([key_col, value_col]).map_batches(
        partial, batch_format="pyarrow").to_arrow_refs()
    merged = hash_exchange(refs, [key_col], finish, combine_fn=partial)
    if merged is None:
        return pa.table({key_col: pa.array([], pa.string()),
                         out: pa.array([], pa.int64())})
    return merged


def cube_sum(
    ds,
    k1: str,
    k2: str,
    value_col: str,
    out: str = "sum_value",
) -> pa.Table:
    """Two-key CUBE — sums at (k1, k2), (k1), (k2) and grand total in
    one pass (SQL `GROUP BY CUBE(k1, k2)`, rolled keys NULL). Key
    rows with a null key are excluded (enforced), same contract as
    `rollup_sum`.

    Map-side (k1, k2) partial sums feed TWO small exchanges of the same
    partial refs: the k1-keyed one finishes the (k1, k2) and (k1)
    levels exactly in-shard (grouping key ⊆ co-location key), the
    k2-keyed one finishes (k2); the grand total folds from the k1
    exchange's per-shard rows on the driver. Raw rows never re-ship —
    only pre-combined partials, twice."""

    def partial(t: pa.Table) -> pa.Table:
        # null-key rows are EXCLUDED (enforced, not just assumed): a
        # data-NULL key is indistinguishable from a roll-NULL marker in
        # the output, so the contract filters them up front — the SQL
        # twins carry the same WHERE
        t = t.filter(pc.and_(pc.is_valid(t[k1]), pc.is_valid(t[k2])))
        g = pa.table({
            k1: t[k1], k2: t[k2],
            "v": pc.cast(t[value_col], pa.float64()),
        }).group_by([k1, k2]).aggregate([("v", "sum")])
        return g.rename_columns([k1, k2, "v"])

    def finish_k1(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        fine = df.groupby([k1, k2], sort=False, as_index=False)["v"].sum()
        mid = df.groupby(k1, sort=False, as_index=False)["v"].sum()
        mid[k2] = None
        grand = pd.DataFrame({k1: [None], k2: [None],
                              "v": [df["v"].sum()], "_partial": [1]})
        fine["_partial"] = 0
        mid["_partial"] = 0
        return pa.Table.from_pandas(
            pd.concat([fine, mid[[k1, k2, "v", "_partial"]], grand],
                      ignore_index=True),
            preserve_index=False)

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by([k1, k2]).aggregate([("v", "sum")])
        return g.rename_columns([k1, k2, "v"])

    def finish_k2(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        m = df.groupby(k2, sort=False, as_index=False)["v"].sum()
        m[k1] = None
        return pa.Table.from_pandas(m[[k1, k2, "v"]],
                                    preserve_index=False)

    refs = ds.select_columns([k1, k2, value_col]).map_batches(
        partial, batch_format="pyarrow").to_arrow_refs()
    m1 = hash_exchange(refs, [k1], finish_k1, combine_fn=combine)
    m2 = hash_exchange(refs, [k2], finish_k2, combine_fn=combine)
    if m1 is None:
        return pa.table({k1: pa.array([], pa.string()),
                         k2: pa.array([], pa.string()),
                         out: pa.array([], pa.float64())})
    part = pc.equal(m1["_partial"], 1)
    shards = m1.filter(part)
    done = m1.filter(pc.invert(part)).select([k1, k2, "v"])
    grand = pa.table({
        k1: pa.nulls(1, m1.schema.field(k1).type),
        k2: pa.nulls(1, m1.schema.field(k2).type),
        "v": pa.array([pc.sum(shards["v"]).as_py() or 0.0], pa.float64()),
    })
    pieces = [done, grand]
    if m2 is not None:
        pieces.insert(1, m2.cast(done.schema))
    return pa.concat_tables(pieces).rename_columns([k1, k2, out])


def grouping_sets_sum(
    ds,
    k1: str,
    k2: str,
    value_col: str,
    out: str = "sum_value",
) -> pa.Table:
    """GROUP BY GROUPING SETS ((k1, k2), (k1), ()) with the standard
    GROUPING(k1, k2) bitmask id (gid 0 fine, 1 k2-rolled, 3 grand) —
    the arbitrary-level sibling that completes rollup_sum (prefix
    levels) and cube_sum (all levels). Null-key rows excluded (enforced),
    same contract as those two.

    Unlike cube, every requested level here is k1-groupable, so ONE
    k1-keyed exchange of map-side (k1, k2) partials finishes (k1, k2)
    and (k1) exactly in-shard and the grand total folds from per-shard
    partials on the driver — raw rows never re-ship, and no second
    exchange is needed."""

    def partial(t: pa.Table) -> pa.Table:
        # null-key rows are EXCLUDED (enforced, not just assumed): a
        # data-NULL key is indistinguishable from a roll-NULL marker in
        # the output, so the contract filters them up front — the SQL
        # twins carry the same WHERE
        t = t.filter(pc.and_(pc.is_valid(t[k1]), pc.is_valid(t[k2])))
        g = pa.table({
            k1: t[k1], k2: t[k2],
            "v": pc.cast(t[value_col], pa.float64()),
        }).group_by([k1, k2]).aggregate([("v", "sum")])
        return g.rename_columns([k1, k2, "v"])

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by([k1, k2]).aggregate([("v", "sum")])
        return g.rename_columns([k1, k2, "v"])

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        fine = df.groupby([k1, k2], sort=False, as_index=False)["v"].sum()
        fine["gid"] = 0
        mid = df.groupby(k1, sort=False, as_index=False)["v"].sum()
        mid[k2] = None
        mid["gid"] = 1
        grand = pd.DataFrame({k1: [None], k2: [None],
                              "v": [df["v"].sum()], "gid": [-1]})
        return pa.Table.from_pandas(
            pd.concat([fine, mid[[k1, k2, "v", "gid"]], grand],
                      ignore_index=True),
            preserve_index=False)

    refs = ds.select_columns([k1, k2, value_col]).map_batches(
        partial, batch_format="pyarrow").to_arrow_refs()
    m = hash_exchange(refs, [k1], finish, combine_fn=combine)
    if m is None:
        return pa.table({k1: pa.array([], pa.string()),
                         k2: pa.array([], pa.string()),
                         out: pa.array([], pa.float64()),
                         "gid": pa.array([], pa.int64())})
    part = pc.equal(m["gid"], -1)  # per-shard grand partials
    shards = m.filter(part)
    done = m.filter(pc.invert(part)).select([k1, k2, "v", "gid"])
    grand = pa.table({
        k1: pa.nulls(1, m.schema.field(k1).type),
        k2: pa.nulls(1, m.schema.field(k2).type),
        "v": pa.array([pc.sum(shards["v"]).as_py() or 0.0], pa.float64()),
        "gid": pa.array([3], pa.int64()),
    })
    return pa.concat_tables(
        [done.cast(grand.schema), grand]).rename_columns(
        [k1, k2, out, "gid"])


# ------------------------------------------------------- count-min sketch


def _cms_hash(base: np.ndarray, row: int, width: int) -> np.ndarray:
    """Row `row`'s column index for each item: the shared 64-bit content
    hash xor'd with a per-row odd constant, splitmix-finalized, mod w —
    d independent-enough hash functions from ONE string-hash pass."""
    from .dedup import _U64, _splitmix64

    with np.errstate(over="ignore"):
        k = _U64((2 * row + 1) * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)
        return (_splitmix64(base ^ k) % _U64(width)).astype(np.int64)


def cms_sketch(ds, item_col: str, width: int = 8192, depth: int = 5,
               tokenize: bool = False):
    """Count-min sketch of item frequencies (Cormode & Muthukrishnan '05):
    a d×w counter matrix; each item increments one counter per row,
    point-estimate = min over rows. Estimates NEVER undercount, and
    overcount by at most e/w·N with probability 1-e^-d per query — the
    third mergeable sketch next to Misra-Gries (heavy hitters) and HLL
    (distinct counts), covering frequency POINT queries over keys too
    numerous to count exactly.

    Scale shape: per block, items collapse to value_counts first (each
    distinct string hashed once, one vectorized bincount scatter per
    row), so a block emits at most d×w fixed-width (slot, cnt) rows;
    ONE slot-keyed exchange sums partials — the sketch, not the corpus,
    crosses the wire. Returns ((d*w)-slot count table, total items).
    """
    from .dedup import _hash_string_array
    from .text import _doc_tokens
    from ..shuffle import _group_sum

    def partial(b: pa.Table) -> pa.Table:
        if tokenize:
            items, _, _ = _doc_tokens(b[item_col])
            items = items.filter(pc.not_equal(items, ""))
        else:
            items = b[item_col]
            if isinstance(items, pa.ChunkedArray):
                items = items.combine_chunks()
            items = items.drop_null()
        vc = items.value_counts()
        vals = vc.field("values")
        cnts = np.asarray(vc.field("counts")).astype(np.int64)
        if len(cnts) == 0:
            return pa.table({"slot": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        base = _hash_string_array(vals)
        mat = np.zeros(depth * width, dtype=np.int64)
        for j in range(depth):
            np.add.at(mat, j * width + _cms_hash(base, j, width), cnts)
        nz = np.flatnonzero(mat)
        return pa.table({"slot": pa.array(nz, pa.int64()),
                         "cnt": pa.array(mat[nz], pa.int64())})

    parts = ds.select_columns([item_col]).map_batches(
        partial, batch_format="pyarrow")
    merged = hash_exchange(
        parts.to_arrow_refs(), ["slot"],
        lambda t: _group_sum(t, ["slot"], ["cnt"]),
        combine_fn=lambda t: _group_sum(t, ["slot"], ["cnt"]),
    )
    mat = np.zeros(depth * width, dtype=np.int64)
    if merged is not None and merged.num_rows:
        mat[merged["slot"].to_numpy(zero_copy_only=False)] = (
            merged["cnt"].to_numpy(zero_copy_only=False))
    # every row of the matrix counts every item exactly once
    total = int(mat[:width].sum())
    return mat.reshape(depth, width), total


def cms_estimate(mat: np.ndarray, items: pa.Array) -> np.ndarray:
    """Point-estimate counts for `items` against a cms_sketch matrix:
    min over rows, vectorized for the whole probe array."""
    from .dedup import _hash_string_array

    depth, width = mat.shape
    base = _hash_string_array(items)
    est = np.full(len(base), np.iinfo(np.int64).max, dtype=np.int64)
    for j in range(depth):
        np.minimum(est, mat[j, _cms_hash(base, j, width)], out=est)
    return est


def cms_error_check(ds, item_col: str, probes: int = 100,
                    width: int = 8192, depth: int = 5,
                    tokenize: bool = False) -> pa.Table:
    """Invariant table for the driver oracle: the sketch's estimates for
    the `probes` highest-exact-count items (exact counts via the same
    token-keyed exchange the vocabulary uses) must satisfy, with zero
    violations on this deterministic corpus+seed:
    - est >= exact (count-min NEVER undercounts — a hard guarantee);
    - est <= exact + ceil(e/width * N) (the standard CMS error bound).
    One row: (n_probes, under_violations, over_violations, total_items)
    — total_items is the exact corpus token/item count, SQL-matched."""
    from ..shuffle import _group_sum
    from .text import _doc_tokens

    mat, n_total = cms_sketch(ds, item_col, width=width, depth=depth,
                              tokenize=tokenize)

    def exact_partial(b: pa.Table) -> pa.Table:
        if tokenize:
            from .text import token_count_partial
            return token_count_partial(b[item_col]).rename_columns(
                ["key", "cnt"])
        items = b[item_col]
        if isinstance(items, pa.ChunkedArray):
            items = items.combine_chunks()
        items = items.drop_null()
        vc = items.value_counts()
        return pa.table({"key": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    exact = hash_exchange(
        ds.select_columns([item_col]).map_batches(
            exact_partial, batch_format="pyarrow").to_arrow_refs(),
        ["key"],
        lambda t: _group_sum(t, ["key"], ["cnt"]),
        combine_fn=lambda t: _group_sum(t, ["key"], ["cnt"]),
    )
    if exact is None or exact.num_rows == 0:
        return pa.table({"n_probes": pa.array([0], pa.int64()),
                         "under_violations": pa.array([0], pa.int64()),
                         "over_violations": pa.array([0], pa.int64()),
                         "total_items": pa.array([0], pa.int64())})
    order = pc.sort_indices(
        exact, sort_keys=[("cnt", "descending"), ("key", "ascending")])
    top = exact.take(order[:probes])
    keys = top["key"]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    est = cms_estimate(mat, keys)
    true = top["cnt"].to_numpy(zero_copy_only=False)
    bound = int(np.ceil(np.e / width * n_total))
    return pa.table({
        "n_probes": pa.array([len(true)], pa.int64()),
        "under_violations": pa.array([int((est < true).sum())], pa.int64()),
        "over_violations": pa.array(
            [int((est > true + bound).sum())], pa.int64()),
        "total_items": pa.array([n_total], pa.int64()),
    })


def histogram_fixed_bins(ds, val_col: str, bins: int = 32):
    """Two-pass global equi-width histogram — the profiling primitive the
    single-pass sketches above can't give exactly: bin bounds depend on
    the GLOBAL min/max, so pass 1 tree-reduces per-block (min, max)
    partials to two scalars, and pass 2 bins every block against the
    broadcast bounds with one np.bincount (fixed `bins`-long state per
    block) and sums the tiny per-block count vectors on the driver. No
    row-level shuffle at any point; the only data movement is bins×blocks
    count rows.

    Bucket math mirrors the SQL twin operation-for-operation so float64
    results are bit-identical: w = (mx - mn) / bins;
    b = min(floor((v - mn) / w), bins - 1); the mx == mn corpus collapses
    to bucket 0. Nulls are excluded; an empty/all-null input returns an
    empty table. Returns (bucket, cnt)."""
    import ray

    def mm_partial(t: pa.Table) -> pa.Table:
        col = t[val_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        v = col.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]  # NaN excluded like global_quantiles (else it
        # poisons the bin width and floor(NaN)->int64 min blows bincount)
        if len(v) == 0:
            return pa.table({"mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        return pa.table({"mn": pa.array([float(v.min())]),
                         "mx": pa.array([float(v.max())])})

    view = ds.select_columns([val_col])
    mm = [t for t in ray.get(view.map_batches(
        mm_partial, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows and "mn" in t.column_names]
    empty = pa.table({"bucket": pa.array([], pa.int64()),
                      "cnt": pa.array([], pa.int64())})
    if not mm:
        return empty
    allmm = pa.concat_tables(mm)
    mn = pc.min(allmm["mn"]).as_py()
    mx = pc.max(allmm["mx"]).as_py()
    w = (mx - mn) / float(bins)

    def bin_partial(t: pa.Table) -> pa.Table:
        col = t[val_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        v = col.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        if w == 0:
            b = np.zeros(len(v), dtype=np.int64)
        else:
            b = np.minimum(np.floor((v - mn) / w).astype(np.int64), bins - 1)
        cnt = np.bincount(b, minlength=bins)
        nz = np.nonzero(cnt)[0]
        return pa.table({"bucket": pa.array(nz.astype(np.int64)),
                         "cnt": pa.array(cnt[nz].astype(np.int64))})

    parts = [t for t in ray.get(view.map_batches(
        bin_partial, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows and "bucket" in t.column_names]
    if not parts:
        return empty
    out = pa.concat_tables(parts).group_by(["bucket"]).aggregate(
        [("cnt", "sum")])
    return out.rename_columns(["bucket", "cnt"])


def global_quantiles(ds, val_col: str, qs=(0.25, 0.5, 0.75, 0.95),
                     names=("p25", "p50", "p75", "p95"), bins: int = 512,
                     band_limit: int = 65536, max_passes: int = 12,
                     materialize: bool = True):
    """EXACT global (unkeyed) quantiles by distributed iterative selection
    — the scale path to order statistics that neither `keyed_quantiles`
    (co-locates whole keys) nor `global_sort` (ships every row) should be
    used for: NO row ever leaves its block. Each refinement pass sends
    only per-edge counts (one sorted-block searchsorted per block, a few
    KB of int64s), the driver narrows each wanted rank's half-open value
    interval to the bin its order statistic falls in, and once an
    interval holds <= band_limit rows a final filter pass pulls just that
    band for an exact driver-side finish. With 512 bins a pass shrinks a
    rank's candidate set ~512x, so a 10^12-row corpus resolves in ~4
    counting passes; the `linspace`-collapse guard resolves intervals one
    float ULP wide (<= one representable value) without a pull.

    Interpolation matches SQL `quantile_cont`: h = (n-1)q between order
    statistics floor(h)/ceil(h). Nulls and NaNs are excluded (DuckDB
    sorts NaN above every number — documented divergence on NaN-bearing
    columns). Returns ONE row with a float64 column per quantile name;
    empty/all-null input returns an empty table. `materialize=True` pins
    the pruned single-column view for the multi-pass re-read (the kmeans
    iterative-input pattern)."""
    empty = pa.table({nm: pa.array([], pa.float64()) for nm in names})
    view = ds.select_columns([val_col])
    if materialize:
        view = view.materialize()

    def _clean(t: pa.Table) -> np.ndarray:
        col = t[val_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        v = col.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
        return v[~np.isnan(v)]

    def nm_partial(t: pa.Table) -> pa.Table:
        v = _clean(t)
        if not len(v):
            return pa.table({"n": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        return pa.table({"n": pa.array([len(v)], pa.int64()),
                         "mn": pa.array([float(v.min())]),
                         "mx": pa.array([float(v.max())])})

    parts = [t for t in view.map_batches(
        nm_partial, batch_format="pyarrow").take_all()]
    n = sum(r["n"] for r in parts)
    if n == 0:
        return empty
    gmin = min(r["mn"] for r in parts)
    gmax = max(r["mx"] for r in parts)

    # 0-based order-statistic ranks required by quantile_cont
    hs = [(float(q) * (n - 1)) for q in qs]
    ranks = sorted({int(np.floor(h)) for h in hs}
                   | {int(np.ceil(h)) for h in hs})
    # per rank: half-open [lo, hi) known to contain it, and #{v < lo}
    top = np.nextafter(gmax, np.inf)
    state = {k: {"lo": gmin, "hi": top, "cb": 0, "inside": n, "val": None}
             for k in ranks}

    def count_pass(edges: np.ndarray) -> np.ndarray:
        e = edges  # closure-captured; a few KB

        def cp(t: pa.Table) -> pa.Table:
            v = np.sort(_clean(t))
            c = np.searchsorted(v, e, side="left").astype(np.int64)
            return pa.table({"i": pa.array(np.arange(len(e), dtype=np.int64)),
                             "cnt": pa.array(c)})

        tot = np.zeros(len(e), dtype=np.int64)
        for r in view.map_batches(cp, batch_format="pyarrow").take_all():
            tot[r["i"]] += r["cnt"]
        return tot

    for _ in range(max_passes):
        active = [k for k, s in state.items()
                  if s["val"] is None and s["inside"] > band_limit]
        if not active:
            break
        seqs = {}
        all_edges = []
        for k in active:
            s = state[k]
            grid = np.linspace(s["lo"], s["hi"], bins + 1)
            grid = np.unique(np.clip(grid, s["lo"], s["hi"]))
            if len(grid) <= 2:
                # interval one ULP wide: lo is the only representable
                # value in [lo, hi) -> resolved exactly
                s["val"] = s["lo"]
                continue
            seqs[k] = grid
            all_edges.append(grid)
        if not seqs:
            break
        edges = np.unique(np.concatenate(all_edges))
        counts = dict(zip(edges.tolist(), count_pass(edges).tolist()))
        for k, grid in seqs.items():
            s = state[k]
            c = np.array([counts[e] for e in grid.tolist()], dtype=np.int64)
            j = int(np.searchsorted(c, k, side="right")) - 1  # max c[j]<=k
            s["lo"], s["hi"] = float(grid[j]), float(grid[j + 1])
            s["cb"], s["inside"] = int(c[j]), int(c[j + 1] - c[j])

    pending = [k for k, s in state.items() if s["val"] is None]
    if pending:
        bands = [(k, state[k]["lo"], state[k]["hi"]) for k in pending]

        def pull(t: pa.Table) -> pa.Table:
            v = _clean(t)
            ids, vals = [], []
            for bi, (_, lo, hi) in enumerate(bands):
                sel = v[(v >= lo) & (v < hi)]
                ids.append(np.full(len(sel), bi, dtype=np.int64))
                vals.append(sel)
            return pa.table({"b": pa.array(np.concatenate(ids)
                                           if ids else []),
                             "v": pa.array(np.concatenate(vals)
                                           if vals else [])})

        rows = view.map_batches(pull, batch_format="pyarrow").take_all()
        byband = {bi: [] for bi in range(len(bands))}
        for r in rows:
            byband[r["b"]].append(r["v"])
        for bi, (k, _, _) in enumerate(bands):
            band = np.sort(np.array(byband[bi], dtype=np.float64))
            state[k]["val"] = float(band[k - state[k]["cb"]])

    vals = {k: state[k]["val"] for k in ranks}
    out = {}
    for nm, h in zip(names, hs):
        k0, k1 = int(np.floor(h)), int(np.ceil(h))
        out[nm] = pa.array(
            [vals[k0] + (h - k0) * (vals[k1] - vals[k0])], pa.float64())
    return pa.table(out)


def mad_outliers(ds, key_col: str, value_col: str, thresh: float = 3.0):
    """Robust per-key anomaly gate: flag rows where
    |value - median(key)| > thresh * MAD(key) — the median-absolute-
    deviation twin of `keyed_outliers`' mean/stddev z-score, immune to the
    outliers it is hunting (a single spike inflates stddev but not MAD).
    Multiplication (not division) keeps the MAD == 0 constant-key case
    exact and SQL-identical: any deviation flags.

    Scale shape: TWO keyed-quantile exchanges of pruned fixed-width pairs
    (medians, then medians of absolute deviations) with the tiny per-key
    stat tables ray.put-broadcast between passes, then a pure vectorized
    flag map — nothing corpus-sized moves. Null values are dropped
    (documented; the SQL twin filters them) and so are null-KEY rows
    (the twin's equality join never matches a null key).
    Returns every surviving row + (med, mad, is_outlier)."""
    import ray

    def _bcast(t: pa.Table, stat: str):
        keys = t[key_col].combine_chunks() if isinstance(
            t[key_col], pa.ChunkedArray) else t[key_col]
        return ray.put((keys, t[stat].to_numpy(zero_copy_only=False)))

    def _empty_result() -> pa.Table:
        # Schema.types are Arrow types for Arrow blocks but numpy dtypes
        # for pandas-backed datasets — normalize both
        sch = ds.schema()
        fields = []
        for n, t in zip(sch.names, sch.types):
            if not isinstance(t, pa.DataType):
                try:
                    t = pa.from_numpy_dtype(t)
                except (pa.ArrowNotImplementedError, TypeError):
                    t = pa.string()
            fields.append(pa.field(n, t))
        base = pa.schema(fields).empty_table()
        return base.append_column(
            "med", pa.array([], pa.float64())).append_column(
            "mad", pa.array([], pa.float64())).append_column(
            "is_outlier", pa.array([], pa.bool_()))

    med_t = keyed_quantiles(ds, key_col, value_col, qs=(0.5,),
                            names=("med",))
    if med_t is None:  # zero-row input: the exchange saw no rows
        return _empty_result()
    med_ref = _bcast(med_t, "med")

    def attach_ad(t: pa.Table) -> pa.Table:
        keys, med = ray.get(med_ref)
        idx = np.asarray(
            pc.fill_null(pc.index_in(t[key_col], value_set=keys), -1)
        ).astype(np.int64)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        m = np.where(idx >= 0, med[np.maximum(idx, 0)], np.nan)
        return pa.table({key_col: t[key_col],
                         "ad": pa.array(np.abs(v - m))})

    mad_t = keyed_quantiles(
        ds.select_columns([key_col, value_col]).map_batches(
            attach_ad, batch_format="pyarrow"),
        key_col, "ad", qs=(0.5,), names=("mad",))
    if mad_t is None:
        return _empty_result()
    mad_ref = _bcast(mad_t, "mad")

    def flag(t: pa.Table) -> pa.Table:
        keys, med = ray.get(med_ref)
        mkeys, mad = ray.get(mad_ref)  # own key order: separate exchange
        # null-KEY rows are excluded too: the SQL twin's JOIN ... USING
        # (key) never matches a null key, so such rows have no baseline
        live = pc.and_(pc.is_valid(t[value_col]), pc.is_valid(t[key_col]))
        t = t.filter(live)
        if t.num_rows == 0:
            return t.append_column(
                "med", pa.array([], pa.float64())).append_column(
                "mad", pa.array([], pa.float64())).append_column(
                "is_outlier", pa.array([], pa.bool_()))
        idx = np.asarray(
            pc.fill_null(pc.index_in(t[key_col], value_set=keys), -1)
        ).astype(np.int64)
        midx = np.asarray(
            pc.fill_null(pc.index_in(t[key_col], value_set=mkeys), -1)
        ).astype(np.int64)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        # keys without stats (null keys under index_in, all-null-value
        # keys) get NaN stats and never flag
        m = np.where(idx >= 0, med[np.maximum(idx, 0)], np.nan)
        s = np.where(midx >= 0, mad[np.maximum(midx, 0)], np.nan)
        out = np.abs(v - m) > thresh * s
        return t.append_column(
            "med", pa.array(m)).append_column(
            "mad", pa.array(s)).append_column(
            "is_outlier", pa.array(out))

    return ds.map_batches(flag, batch_format="pyarrow")


def basket_lift(ds, key_col: str, item_col: str, min_support: int = 1):
    """Market-basket association mining: for every unordered item pair
    (a < b), the number of baskets (distinct `key_col` values) containing
    BOTH, and the lift = P(a,b) / (P(a)·P(b)) against basket-level
    independence — the classic co-occurrence signal (Apriori's first
    level). Null keys/items are excluded (SQL DISTINCT-join parity).

    Scale shape: per-block DISTINCT (key, item) pairs cross ONE key-hash
    exchange so each basket is whole in one shard; within a shard the
    pair generation is a C-level pandas self-join bounded by basket
    width² (item vocabularies are small — event types, tags), and only
    (a, b, cnt) / (item, cnt) / basket-count partials reach the driver.
    Returns (a, b, n_ab, lift) with n_ab >= min_support."""
    from ..shuffle import hash_exchange

    def partial(t: pa.Table) -> pa.Table:
        d = pa.table({"k": t[key_col], "i": t[item_col]}).group_by(
            ["k", "i"]).aggregate([])
        mask = pc.and_(pc.is_valid(d["k"]), pc.is_valid(d["i"]))
        return d.filter(mask)

    def finish(t: pa.Table) -> pa.Table:
        df = t.group_by(["k", "i"]).aggregate([]).to_pandas()
        pairs = df.merge(df, on="k")
        pairs = pairs[pairs["i_x"] < pairs["i_y"]]
        pc_ = pairs.groupby(["i_x", "i_y"], sort=False).size()
        ic = df.groupby("i", sort=False)["k"].size()
        # an explicit kind column, not in-band sentinels: item values stay
        # untouched, and nothing collides with real data
        rows = {
            "kind": ["pair"] * len(pc_) + ["item"] * len(ic) + ["n"],
            "a": pc_.index.get_level_values(0).tolist()
            + ic.index.tolist() + [""],
            "b": pc_.index.get_level_values(1).tolist()
            + [""] * len(ic) + [""],
            "cnt": pc_.tolist() + ic.tolist() + [df["k"].nunique()],
        }
        return pa.table({"kind": pa.array(rows["kind"], pa.string()),
                         "a": pa.array(rows["a"], pa.string()),
                         "b": pa.array(rows["b"], pa.string()),
                         "cnt": pa.array(rows["cnt"], pa.int64())})

    res = hash_exchange(
        ds.select_columns([key_col, item_col]).map_batches(
            partial, batch_format="pyarrow").to_arrow_refs(),
        ["k"], finish)
    empty = pa.table({"a": pa.array([], pa.string()),
                      "b": pa.array([], pa.string()),
                      "n_ab": pa.array([], pa.int64()),
                      "lift": pa.array([], pa.float64())})
    if res is None or res.num_rows == 0:
        return empty
    df = res.to_pandas().groupby(["kind", "a", "b"],
                                 sort=False)["cnt"].sum()
    n = float(df.get(("n", "", ""), 0))
    if n == 0:
        return empty
    items = {a: c for (kind, a, _b), c in df.items() if kind == "item"}
    out = {"a": [], "b": [], "n_ab": [], "lift": []}
    for (kind, a, b), c in df.items():
        if kind != "pair" or c < min_support:
            continue
        out["a"].append(a)
        out["b"].append(b)
        out["n_ab"].append(int(c))
        out["lift"].append(
            (c / n) / ((items[a] / n) * (items[b] / n)))
    t = pa.table({"a": pa.array(out["a"], pa.string()),
                  "b": pa.array(out["b"], pa.string()),
                  "n_ab": pa.array(out["n_ab"], pa.int64()),
                  "lift": pa.array(out["lift"], pa.float64())})
    return t.sort_by([("a", "ascending"), ("b", "ascending")])


def winsorize(ds, val_col: str, lo_q: float = 0.01, hi_q: float = 0.99,
              out_col: str = "clipped", bins: int = 64,
              band_limit: int = 65536):
    """Winsorize a column at global quantiles — the standard heavy-tail
    normalization before featurization: values below the lo_q quantile
    clamp up to it, above hi_q clamp down. Composes `global_quantiles`
    (distributed exact selection — no row leaves its block) with a pure
    broadcast clamp map; nulls pass through as nulls."""
    q = global_quantiles(ds, val_col, qs=(lo_q, hi_q), names=("lo", "hi"),
                         bins=bins, band_limit=band_limit)
    if q.num_rows == 0:
        def passthrough(t: pa.Table) -> pa.Table:
            return t.append_column(out_col, pc.cast(t[val_col],
                                                    pa.float64()))
        return ds.map_batches(passthrough, batch_format="pyarrow")
    lo = q["lo"][0].as_py()
    hi = q["hi"][0].as_py()

    def clamp(t: pa.Table) -> pa.Table:
        v = pc.cast(t[val_col], pa.float64())
        # skip_nulls=False so a null value stays null instead of clamping
        # to the bound (element-wise min/max treats null as absent by
        # default and would return the bound)
        opt = pc.ElementWiseAggregateOptions(skip_nulls=False)
        c = pc.min_element_wise(
            pc.max_element_wise(v, lo, options=opt), hi, options=opt)
        return t.append_column(out_col, c)

    return ds.map_batches(clamp, batch_format="pyarrow")


def covisit(ds, key_col: str, item_col: str, ts_col: str,
            window_us: int, min_count: int = 1):
    """Time-windowed co-visitation: for every unordered pair of DISTINCT
    item values (a < b), the number of event-instance pairs observed for
    the SAME key within `window_us` microseconds of each other — the
    classic recommender co-occurrence matrix (each unordered instance
    pair counts once; same-item pairs are excluded). Rows with a null
    key, item or timestamp never pair (SQL inner-join parity).

    Scale shape: prune to (key, item, ts) fixed-width triples at the
    read, ONE key-hash exchange co-locates each key's events, and the
    shard-local pair generation is a C-level pandas self-join bounded by
    per-key event count² (sessions/users, not the corpus — same bound as
    `basket_lift`; a key so hot its window pairs blow a shard needs
    time-bucketed salting, which this operator does not attempt). Only
    (a, b, cnt) count partials — item-vocabulary², not data-sized —
    leave the shards, so the driver merge is trivial at any corpus size.
    """
    from ..shuffle import hash_exchange

    def prep(t: pa.Table) -> pa.Table:
        out = pa.table({
            "k": t[key_col],
            "i": t[item_col],
            "ts": pc.cast(t[ts_col], pa.int64()),
        })
        return out.filter(pc.and_(
            pc.and_(pc.is_valid(out["k"]), pc.is_valid(out["i"])),
            pc.is_valid(out["ts"])))

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        pairs = df.merge(df, on="k")
        pairs = pairs[
            (pairs["i_x"] < pairs["i_y"])
            & ((pairs["ts_x"] - pairs["ts_y"]).abs() <= window_us)
        ]
        cnt = pairs.groupby(["i_x", "i_y"], sort=False).size()
        return pa.table({
            "a": pa.array(cnt.index.get_level_values(0), pa.string()),
            "b": pa.array(cnt.index.get_level_values(1), pa.string()),
            "cnt": pa.array(cnt.to_numpy(), pa.int64()),
        })

    res = hash_exchange(
        ds.select_columns([key_col, item_col, ts_col]).map_batches(
            prep, batch_format="pyarrow").to_arrow_refs(),
        ["k"], finish)
    empty = pa.table({"a": pa.array([], pa.string()),
                      "b": pa.array([], pa.string()),
                      "n_co": pa.array([], pa.int64())})
    if res is None or res.num_rows == 0:
        return empty
    agg = res.group_by(["a", "b"]).aggregate([("cnt", "sum")])
    agg = agg.filter(pc.greater_equal(agg["cnt_sum"], min_count))
    return pa.table({"a": agg["a"], "b": agg["b"],
                     "n_co": pc.cast(agg["cnt_sum"], pa.int64())}
                    ).sort_by([("a", "ascending"), ("b", "ascending")])


def ab_ztest(ds, key_col: str, variant_col: str, val_col: str,
             treat: str, control: str):
    """Per-key two-sample Welch z-test — the experimentation-analytics
    pass: for every key (day, cohort, experiment id) with BOTH variants
    observed, z = (mean_t - mean_c) / sqrt(s2_t/n_t + s2_c/n_c) with
    var_samp variances. Mergeable sufficient statistics per
    (key, variant) — n, Σv, Σv² — are in-batch combined and cross ONE
    key-hash exchange; the closed form finishes per shard, so traffic is
    keys×2 fixed-width rows regardless of event volume. Null values are
    excluded (SQL count(value)/avg/var_samp parity); a variant with
    n < 2 has NULL variance and yields a NULL z like the SQL expression.

    Precision note (same as keyed_corr): raw co-moments in float64 need
    moderate value magnitudes (|v| ≲ 1e6); shift heavy-tailed metrics
    first."""
    from ..shuffle import hash_exchange

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_valid(t[val_col]),
            pc.is_in(t[variant_col],
                     value_set=pa.array([treat, control])))
        f = t.filter(keep)
        v = pc.cast(f[val_col], pa.float64())
        g = pa.table({
            "k": f[key_col], "variant": f[variant_col],
            "n": pa.array(np.ones(f.num_rows, np.float64)),
            "s": v, "ss": pc.multiply(v, v),
        }).group_by(["k", "variant"]).aggregate(
            [("n", "sum"), ("s", "sum"), ("ss", "sum")])
        return g.rename_columns(["k", "variant", "n", "s", "ss"])

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["k", "variant"]).aggregate(
            [("n", "sum"), ("s", "sum"), ("ss", "sum")])
        return g.rename_columns(["k", "variant", "n", "s", "ss"])

    def finish(t: pa.Table) -> pa.Table:
        df = combine(t).to_pandas()
        tr = df[df["variant"] == treat].set_index("k")
        co = df[df["variant"] == control].set_index("k")
        keys = tr.index.intersection(co.index).sort_values()
        out = {"key": [], "n_t": [], "n_c": [], "mean_t": [],
               "mean_c": [], "z": []}
        for k in keys:
            nt, st, sst = (float(tr.at[k, c]) for c in ("n", "s", "ss"))
            nc, sc, ssc = (float(co.at[k, c]) for c in ("n", "s", "ss"))
            mt, mc = st / nt, sc / nc
            vt = (sst - nt * mt * mt) / (nt - 1) if nt > 1 else None
            vc = (ssc - nc * mc * mc) / (nc - 1) if nc > 1 else None
            z = None
            if vt is not None and vc is not None:
                den = np.sqrt(vt / nt + vc / nc)
                z = float((mt - mc) / den) if den > 0 else None
            out["key"].append(k)
            out["n_t"].append(int(nt))
            out["n_c"].append(int(nc))
            out["mean_t"].append(mt)
            out["mean_c"].append(mc)
            out["z"].append(z)
        return pa.table({
            "key": pa.array(out["key"]),
            "n_t": pa.array(out["n_t"], pa.int64()),
            "n_c": pa.array(out["n_c"], pa.int64()),
            "mean_t": pa.array(out["mean_t"], pa.float64()),
            "mean_c": pa.array(out["mean_c"], pa.float64()),
            "z": pa.array(out["z"], pa.float64()),
        })

    res = hash_exchange(
        ds.select_columns([key_col, variant_col, val_col]).map_batches(
            partial, batch_format="pyarrow").to_arrow_refs(),
        ["k"], finish, combine_fn=combine)
    if res is None:
        return pa.table({"key": pa.array([], pa.string()),
                         "n_t": pa.array([], pa.int64()),
                         "n_c": pa.array([], pa.int64()),
                         "mean_t": pa.array([], pa.float64()),
                         "mean_c": pa.array([], pa.float64()),
                         "z": pa.array([], pa.float64())})
    return res.sort_by([("key", "ascending")])


def equidepth_histogram(ds, val_col: str, k: int = 4, bins: int = 64,
                        band_limit: int = 65536):
    """Global equi-depth histogram: bin edges at the EXACT i/k quantiles
    (distributed iterative selection — no row leaves its block), then a
    broadcast searchsorted bucket count. Bin b holds values v with
    edge_b <= v < edge_{b+1} (half-open, SQL `CASE WHEN v < e1 ...`
    parity); nulls are excluded. Composes `global_quantiles` with a
    counting map whose partials are k int64s per block.

    Cross-engine boundary safety (why counts hash-match an independent
    quantile_cont oracle): i/k fractions with dyadic k make the
    interpolation fraction exact, so an edge is either exactly a data
    value in both engines or strictly between two adjacent data values —
    either way the strict comparison buckets every real value
    identically. Non-dyadic k still gives exact quantiles but the
    boundary tie-safety argument needs equality-free gaps."""
    qs = tuple(i / k for i in range(1, k))
    names = tuple(f"e{i}" for i in range(1, k))
    q = global_quantiles(ds, val_col, qs=qs, names=names, bins=bins,
                         band_limit=band_limit)
    if q.num_rows == 0:  # empty/all-null input
        return pa.table({"bin": pa.array([], pa.int64()),
                         "cnt": pa.array([], pa.int64())})
    edges = np.array([q[n][0].as_py() for n in names], np.float64)

    def count(t: pa.Table) -> pa.Table:
        v = np.asarray(pc.drop_null(pc.cast(t[val_col], pa.float64())))
        b = np.searchsorted(edges, v, side="right")
        c = np.bincount(b, minlength=k)
        return pa.table({"bin": pa.array(np.arange(k, dtype=np.int64)),
                         "cnt": pa.array(c.astype(np.int64))})

    parts = ds.select_columns([val_col]).map_batches(
        count, batch_format="pyarrow").to_arrow_refs()
    import ray

    tabs = [t for t in ray.get(parts) if t is not None and t.num_rows]
    merged = pa.concat_tables(tabs).group_by(["bin"]).aggregate(
        [("cnt", "sum")]).rename_columns(["bin", "cnt"])
    merged = merged.filter(pc.greater(merged["cnt"], 0))
    return merged.sort_by([("bin", "ascending")])


def trending_topk(
    ds,
    ts_col: str = "ts",
    type_col: str = "event_type",
    bucket_sec: int = 3600,
    k: int = 3,
) -> pa.Table:
    """Top-k event types per time bucket by count — the "trending now"
    / noisiest-alert-per-hour ranking every log dashboard runs. Ties
    break on the type string ascending so the result is deterministic
    and SQL-mirrorable (row_number ORDER BY count DESC, type).

    Engine shape: per-block (bucket, type) partial counts (one Arrow
    group_by per batch — pre-aggregation caps exchange volume at
    #buckets x #types rows per block), ONE bucket-keyed hash exchange
    whose combiner re-sums partials, and a shard-local vectorized
    rank-and-prune. Null timestamps are excluded (no bucket), like the
    SQL twin's WHERE ts IS NOT NULL; null TYPES group like SQL GROUP BY.
    Thin wrapper: bucket the timestamp, then delegate to the generic
    topk_count_per_key exchange."""
    step = bucket_sec * 1_000_000

    def bucketize(t: pa.Table) -> pa.Table:
        tt = t.filter(pc.is_valid(t[ts_col]))
        f = tt.schema.field(ts_col)
        # normalize to µs first: from_pandas blocks carry ns timestamps
        ts_us = pc.cast(tt[ts_col],
                        pa.timestamp("us", tz=getattr(f.type, "tz", None)))
        us = np.asarray(pc.cast(ts_us, pa.int64()))
        # floor (not trunc) division matches date_trunc for pre-epoch
        # timestamps too; numpy // on int64 is floor division
        bucket = pa.array((us // step) * step, pa.int64())
        return pa.table({"bucket_us": bucket, type_col: tt[type_col]})

    return topk_count_per_key(
        ds.select_columns([ts_col, type_col]).map_batches(
            bucketize, batch_format="pyarrow"),
        "bucket_us", type_col, k=k, keep_null_items=True)


def gini_concentration(ds, key_col: str) -> pa.Table:
    """Gini coefficient of per-key record counts — the skew audit run
    BEFORE choosing salting/partitioning for a hot-key column (0 =
    uniform keys, ->1 = one key dominates). Output: one row
    (gini, n_keys, total_records).

    Engine shape: per-block (key, n) value-count partials cross ONE
    key-hash exchange; the per-key count table (cardinality = #distinct
    keys, the usual dimension-bounded case — documented assumption) is
    sorted once and Gini = 2*Σ(i*x_i)/(n*Σx) - (n+1)/n over the sorted
    counts. Every product is an exact integer in float64 (< 2^53), so
    the value is bit-identical to the SQL twin regardless of summation
    order; tie order is mathematically irrelevant (equal x swap equal
    coefficients block-wise)."""
    from ..shuffle import hash_exchange

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by([key_col]).aggregate([([], "count_all")])
        return g.rename_columns([key_col, "records"])

    def regroup(t: pa.Table) -> pa.Table:
        g = t.group_by([key_col]).aggregate([("records", "sum")])
        return g.rename_columns([key_col, "records"])

    counts = hash_exchange(
        ds.select_columns([key_col]).map_batches(
            partial, batch_format="pyarrow").to_arrow_refs(),
        [key_col], regroup, combine_fn=regroup,
    )
    if counts is None or not counts.num_rows:
        return pa.table({"gini": pa.array([], pa.float64()),
                         "n_keys": pa.array([], pa.int64()),
                         "total_records": pa.array([], pa.int64())})
    x = np.sort(np.asarray(counts["records"], dtype=np.float64))
    n = float(len(x))
    s = float(x.sum())
    i = np.arange(1, len(x) + 1, dtype=np.float64)
    gini = 2.0 * float((i * x).sum()) / (n * s) - (n + 1.0) / n
    return pa.table({
        "gini": pa.array([gini], pa.float64()),
        "n_keys": pa.array([int(n)], pa.int64()),
        "total_records": pa.array([int(s)], pa.int64()),
    })


def topk_count_per_key(
    ds,
    key_col: str,
    item_col: str,
    k: int = 3,
    keep_null_items: bool = False,
) -> pa.Table:
    """Top-k items per key by occurrence count, ties broken on the item
    ascending (deterministic, QUALIFY-mirrorable) — the generic form
    behind trending_topk and top-paths-per-host: top errors per service,
    top referrers per page. Map-side (key,item) count partials, ONE
    key-hash exchange with a re-summing combiner, shard-local vectorized
    rank-and-prune. Null keys are excluded; null items are excluded by
    default (the top-paths twin's WHERE) or kept as their own group
    (`keep_null_items=True` — SQL GROUP BY semantics, sorting last like
    NULLS LAST)."""
    from ..shuffle import hash_exchange

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.is_valid(t[key_col]) if keep_null_items else pc.and_(
            pc.is_valid(t[key_col]), pc.is_valid(t[item_col]))
        tt = t.filter(keep)
        g = tt.select([key_col, item_col]).group_by(
            [key_col, item_col]).aggregate([([], "count_all")])
        return g.rename_columns([key_col, item_col, "n"])

    def regroup(t: pa.Table) -> pa.Table:
        g = t.group_by([key_col, item_col]).aggregate([("n", "sum")])
        return g.rename_columns([key_col, item_col, "n"])

    def finish(t: pa.Table) -> pa.Table:
        # explicit output schema pinned to the INPUT's key/item types: a
        # shard whose kept items are all null would otherwise infer a
        # null-typed item column from pandas and break the cross-shard
        # concat / destabilize the result schema
        schema = pa.schema([
            pa.field(key_col, t.schema.field(key_col).type),
            pa.field(item_col, t.schema.field(item_col).type),
            pa.field("n", pa.int64()),
            pa.field("rnk", pa.int64()),
        ])
        df = regroup(t).to_pandas()
        df = df.sort_values([key_col, "n", item_col],
                            ascending=[True, False, True], kind="mergesort")
        rnk = df.groupby(key_col, sort=False).cumcount() + 1
        df = df.assign(rnk=rnk.astype(np.int64))
        df = df[df["rnk"] <= k]
        return pa.Table.from_pandas(
            df[[key_col, item_col, "n", "rnk"]], schema=schema,
            preserve_index=False)

    out = hash_exchange(
        ds.select_columns([key_col, item_col]).map_batches(
            partial, batch_format="pyarrow").to_arrow_refs(),
        [key_col], finish, combine_fn=regroup,
    )
    if out is None:
        return pa.table({key_col: pa.array([], pa.string()),
                         item_col: pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "rnk": pa.array([], pa.int64())})
    return out


def _ntile_positions(n: int, tiles: int) -> np.ndarray:
    """SQL ntile() bucket for positions 1..n — delegates to the shared
    formula in ops/sample.ntile_for_ranks."""
    from .sample import ntile_for_ranks

    return ntile_for_ranks(np.arange(1, n + 1, dtype=np.int64), n, tiles)


def rfm_features(
    ds,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiles: int = 5,
) -> pa.Table:
    """Per-key RFM features (recency / frequency / monetary — the classic
    customer-analytics triple) + their ntile quintile scores. Rows with a
    null key, timestamp or value are excluded up front (both sides of the
    oracle agree on the filtered population). Null-key contract: a null
    key has no stable representation in the driver-side lexsort (None in
    an object array for string keys, NaN round-trip for ints), so it is
    excluded like the quantile sketch does — the SQL twin carries the
    matching `key IS NOT NULL` predicate.

    Engine shape: the distributed work is ONE key-hash exchange of
    mergeable (max ts, count, sum) partials — fixed width per key per
    block; the per-key aggregate table is key-cardinality (the
    dimension-bounded case, same documented assumption as the Gini
    audit), so the three rank passes are driver-side lexsorts over it.
    Ordering ties break on the key so every ntile is deterministic."""
    from ..shuffle import hash_exchange

    def partial(t: pa.Table) -> pa.Table:
        tt = t.filter(pc.and_(
            pc.is_valid(t[key_col]),
            pc.and_(pc.is_valid(t[ts_col]), pc.is_valid(t[value_col]))))
        ts_us = pc.cast(pc.cast(
            tt[ts_col], pa.timestamp("us")), pa.int64())
        g = pa.table({
            key_col: tt[key_col],
            "last_us": ts_us,
            "freq": pa.nulls(tt.num_rows, pa.int64()).fill_null(1),
            "monetary": pc.cast(tt[value_col], pa.float64()),
        }).group_by([key_col]).aggregate(
            [("last_us", "max"), ("freq", "sum"), ("monetary", "sum")])
        return g.rename_columns([key_col, "last_us", "freq", "monetary"])

    def regroup(t: pa.Table) -> pa.Table:
        g = t.group_by([key_col]).aggregate(
            [("last_us", "max"), ("freq", "sum"), ("monetary", "sum")])
        return g.rename_columns([key_col, "last_us", "freq", "monetary"])

    agg = hash_exchange(
        ds.select_columns([key_col, ts_col, value_col]).map_batches(
            partial, batch_format="pyarrow").to_arrow_refs(),
        [key_col], regroup, combine_fn=regroup,
    )
    if agg is None or not agg.num_rows:
        return pa.table({key_col: pa.array([], pa.int64()),
                         "last_us": pa.array([], pa.int64()),
                         "freq": pa.array([], pa.int64()),
                         "monetary": pa.array([], pa.float64()),
                         "r_q": pa.array([], pa.int64()),
                         "f_q": pa.array([], pa.int64()),
                         "m_q": pa.array([], pa.int64())})
    keys = np.asarray(agg[key_col])
    n = len(keys)
    out = {key_col: agg[key_col], "last_us": agg["last_us"],
           "freq": agg["freq"], "monetary": agg["monetary"]}
    for name, col in (("r_q", "last_us"), ("f_q", "freq"),
                      ("m_q", "monetary")):
        v = np.asarray(agg[col], dtype=np.float64)
        order = np.lexsort((keys, v))
        score = np.empty(n, dtype=np.int64)
        score[order] = _ntile_positions(n, tiles)
        out[name] = pa.array(score)
    return pa.table(out)


def burstiness(
    ds,
    ts_col: str = "ts",
    type_col: str = "event_type",
    bucket_sec: int = 60,
) -> pa.Table:
    """Per-type burstiness (Fano factor: var_samp/mean of per-bucket
    event counts over the type's OBSERVED buckets) — >1 flags bursty
    alert storms, ~1 is Poisson-like telemetry. Variance comes from the
    (n, Σx, Σx²) sufficient-stat identity so every intermediate is an
    exact integer in float64 and the doubles match the SQL twin exactly;
    single-bucket types emit NULL fano (var_samp undefined). Map-side
    (type,bucket) count partials, ONE type-keyed exchange (a type's
    buckets co-locate; bucket count is bounded by the time range)."""
    from ..shuffle import hash_exchange

    step = bucket_sec * 1_000_000

    def partial(t: pa.Table) -> pa.Table:
        tt = t.filter(pc.is_valid(t[ts_col]))
        f = tt.schema.field(ts_col)
        ts_us = pc.cast(tt[ts_col],
                        pa.timestamp("us", tz=getattr(f.type, "tz", None)))
        us = np.asarray(pc.cast(ts_us, pa.int64()))
        bucket = pa.array((us // step) * step, pa.int64())
        g = pa.table({type_col: tt[type_col], "bucket": bucket}).group_by(
            [type_col, "bucket"]).aggregate([([], "count_all")])
        return g.rename_columns([type_col, "bucket", "n"])

    def regroup(t: pa.Table) -> pa.Table:
        g = t.group_by([type_col, "bucket"]).aggregate([("n", "sum")])
        return g.rename_columns([type_col, "bucket", "n"])

    def finish(t: pa.Table) -> pa.Table:
        df = regroup(t).to_pandas()
        rows = []
        # dropna=False: the null event type is a real group in the SQL twin
        for ty, g in df.groupby(type_col, sort=False, dropna=False):
            x = g["n"].to_numpy(dtype=np.float64)  # exact ints
            n = float(len(x))
            sx = float(x.sum())
            sxx = float((x * x).sum())
            mean = sx / n
            if n > 1:
                var = (sxx - sx * sx / n) / (n - 1.0)
                fano = var / mean
            else:
                var = None
                fano = None
            rows.append((ty, int(n), mean, var, fano))
        # the null group's pandas key is NaN: pin the type column to
        # string so all-null shards don't infer double
        keys = [None if (r[0] is None or (isinstance(r[0], float)
                                          and np.isnan(r[0]))) else r[0]
                for r in rows]
        return pa.table({
            type_col: pa.array(keys, pa.string()),
            "n_buckets": pa.array([r[1] for r in rows], pa.int64()),
            "mean_rate": pa.array([r[2] for r in rows], pa.float64()),
            "var_rate": pa.array([r[3] for r in rows], pa.float64()),
            "fano": pa.array([r[4] for r in rows], pa.float64()),
        })

    out = hash_exchange(
        ds.select_columns([ts_col, type_col]).map_batches(
            partial, batch_format="pyarrow").to_arrow_refs(),
        [type_col], finish, combine_fn=regroup,
    )
    if out is None:
        return pa.table({type_col: pa.array([], pa.string()),
                         "n_buckets": pa.array([], pa.int64()),
                         "mean_rate": pa.array([], pa.float64()),
                         "var_rate": pa.array([], pa.float64()),
                         "fano": pa.array([], pa.float64())})
    return out


def psi_drift(
    ds,
    val_col: str,
    split_col: str,
    split_a,
    bins: int = 10,
    add_k: float = 0.5,
) -> pa.Table:
    """Population Stability Index between two slices of a value column
    (the standard ML-monitoring drift metric: <0.1 stable, >0.25 major
    shift): equal-width bins over the GLOBAL [min, max] of both
    populations, add-k smoothed shares, per-bin contribution
    (p_a - p_b) * ln(p_a / p_b). Smoothing denominators use the
    OBSERVED bucket count so the SQL twin mirrors the expression
    verbatim.

    Scale shape: pass 1 tree-reduces (min, max) partials; pass 2 bins
    each block into two fixed `bins`-long count vectors (same
    bit-identical bucket float math as histogram_fixed_bins); only
    bins×blocks count rows ever move. Null split values fall in side b
    (SQL CASE ELSE); null values are excluded."""
    import ray

    def mm_partial(t: pa.Table) -> pa.Table:
        col = t[val_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        v = col.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return pa.table({"mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        return pa.table({"mn": pa.array([float(v.min())]),
                         "mx": pa.array([float(v.max())])})

    view = ds.select_columns([val_col, split_col])
    mm = [t for t in ray.get(view.map_batches(
        mm_partial, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    empty = pa.table({"bucket": pa.array([], pa.int64()),
                      "c_a": pa.array([], pa.int64()),
                      "c_b": pa.array([], pa.int64()),
                      "contrib": pa.array([], pa.float64())})
    if not mm:
        return empty
    allmm = pa.concat_tables(mm)
    mn = pc.min(allmm["mn"]).as_py()
    mx = pc.max(allmm["mx"]).as_py()
    w = (mx - mn) / float(bins)

    def bin_partial(t: pa.Table) -> pa.Table:
        valid = pc.is_valid(t[val_col])
        tt = t.filter(valid)
        col = tt[val_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        v = col.to_numpy(zero_copy_only=False).astype(np.float64)
        keep = ~np.isnan(v)
        v = v[keep]
        side_a = np.asarray(
            pc.fill_null(pc.equal(tt[split_col], split_a), False))[keep]
        if len(v) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "c_a": pa.array([], pa.int64()),
                             "c_b": pa.array([], pa.int64())})
        if w == 0:
            b = np.zeros(len(v), dtype=np.int64)
        else:
            b = np.minimum(np.floor((v - mn) / w).astype(np.int64),
                           bins - 1)
        ca = np.bincount(b[side_a], minlength=bins)
        cb = np.bincount(b[~side_a], minlength=bins)
        return pa.table({
            "bucket": pa.array(np.arange(bins, dtype=np.int64)),
            "c_a": pa.array(ca.astype(np.int64)),
            "c_b": pa.array(cb.astype(np.int64)),
        })

    parts = [t for t in ray.get(view.map_batches(
        bin_partial, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    if not parts:
        return empty
    merged = pa.concat_tables(parts).group_by(["bucket"]).aggregate(
        [("c_a", "sum"), ("c_b", "sum")])
    df = merged.to_pandas()
    df = df.rename(columns={"c_a_sum": "c_a", "c_b_sum": "c_b"})
    df = df[(df["c_a"] + df["c_b"]) > 0].sort_values("bucket")
    nbin = float(len(df))
    na = float(df["c_a"].sum())
    nb = float(df["c_b"].sum())
    p_a = (df["c_a"].to_numpy(np.float64) + add_k) / (na + add_k * nbin)
    p_b = (df["c_b"].to_numpy(np.float64) + add_k) / (nb + add_k * nbin)
    contrib = (p_a - p_b) * np.log(p_a / p_b)
    return pa.table({
        "bucket": pa.array(df["bucket"].to_numpy(np.int64)),
        "c_a": pa.array(df["c_a"].to_numpy(np.int64)),
        "c_b": pa.array(df["c_b"].to_numpy(np.int64)),
        "contrib": pa.array(contrib, pa.float64()),
    })


def _side_value_counts(ds, val_col: str, split_col: str, split_a):
    """Shared rank-test front end: per-side DISTINCT-value counts
    through ONE value-keyed exchange — (value, c_a, c_b) rows, null
    values excluded, null split values on side b."""
    from ..shuffle import hash_exchange

    def partial(t: pa.Table) -> pa.Table:
        tt = t.filter(pc.is_valid(t[val_col]))
        side_a = pc.fill_null(pc.equal(tt[split_col], split_a), False)
        g = pa.table({
            "value": pc.cast(tt[val_col], pa.float64()),
            "c_a": pc.cast(side_a, pa.int64()),
            "c_b": pc.cast(pc.invert(side_a), pa.int64()),
        }).group_by(["value"]).aggregate([("c_a", "sum"), ("c_b", "sum")])
        return g.select(["value", "c_a_sum", "c_b_sum"]).rename_columns(
            ["value", "c_a", "c_b"])

    def regroup(t: pa.Table) -> pa.Table:
        g = t.group_by(["value"]).aggregate([("c_a", "sum"), ("c_b", "sum")])
        return g.select(["value", "c_a_sum", "c_b_sum"]).rename_columns(
            ["value", "c_a", "c_b"])

    return hash_exchange(
        ds.select_columns([val_col, split_col]).map_batches(
            partial, batch_format="pyarrow").to_arrow_refs(),
        ["value"], regroup, combine_fn=regroup,
    )


def ks_test(
    ds,
    val_col: str,
    split_col: str,
    split_a,
) -> pa.Table:
    """Exact two-sample Kolmogorov-Smirnov statistic between two slices
    of a value column — the nonparametric drift/shift test completing
    the Welch-z / PSI family: D = max over values of |F_a - F_b| with
    tie groups counted inclusively (SQL RANGE cumulative semantics).

    Engine shape: per-block per-side DISTINCT-value counts cross ONE
    value-keyed exchange (fixed-width rows); the driver sorts the
    distinct-value count table and takes one cumulative pass.
    Partitioning assumption (documented, same class as keyed_quantiles):
    the DISTINCT values of the tested metric fit a driver heap — true
    for quantized telemetry; for corpus-cardinality continuous values,
    range-partition via ops/sample.global_sort instead. The cumulative
    sums run over the same sorted sequence as the SQL window, so the
    doubles are bit-identical."""
    counts = _side_value_counts(ds, val_col, split_col, split_a)
    if counts is None or not counts.num_rows:
        return pa.table({"ks": pa.array([], pa.float64()),
                         "n_a": pa.array([], pa.int64()),
                         "n_b": pa.array([], pa.int64())})
    df = counts.to_pandas().sort_values("value")
    na = float(df["c_a"].sum())
    nb = float(df["c_b"].sum())
    if na == 0 or nb == 0:
        ks = float("nan")
    else:
        gap = np.abs(np.cumsum(df["c_a"].to_numpy(np.float64)) / na
                     - np.cumsum(df["c_b"].to_numpy(np.float64)) / nb)
        ks = float(gap.max())
    return pa.table({"ks": pa.array([ks], pa.float64()),
                     "n_a": pa.array([int(na)], pa.int64()),
                     "n_b": pa.array([int(nb)], pa.int64())})


def mannwhitney_u(
    ds,
    val_col: str,
    split_col: str,
    split_a,
) -> pa.Table:
    """Exact Mann-Whitney U (rank-sum) statistic between two slices —
    the rank-based location test completing the drift family (robust
    where Welch-z assumes normality). U_a = R_a - n_a(n_a+1)/2 with R_a
    the tie-AVERAGED rank sum of side a; the common-language effect
    size U_a / (n_a n_b) is emitted alongside.

    Same scale shape as ks_test: per-side DISTINCT-value counts through
    ONE value-keyed exchange, then a single driver pass over the sorted
    count table computes every tie group's average rank exactly
    (distinct-value-cardinality assumption documented there)."""
    counts = _side_value_counts(ds, val_col, split_col, split_a)
    if counts is None or not counts.num_rows:
        return pa.table({"u_a": pa.array([], pa.float64()),
                         "effect": pa.array([], pa.float64()),
                         "n_a": pa.array([], pa.int64()),
                         "n_b": pa.array([], pa.int64())})
    df = counts.to_pandas().sort_values("value")
    ca = df["c_a"].to_numpy(np.float64)
    cb = df["c_b"].to_numpy(np.float64)
    sz = ca + cb
    na = float(ca.sum())
    nb = float(cb.sum())
    # average rank of each tie group: rows before it + (size + 1) / 2
    before = np.concatenate(([0.0], np.cumsum(sz)))[:-1]
    avg_rank = before + (sz + 1.0) / 2.0
    r_a = float((ca * avg_rank).sum())
    if na == 0 or nb == 0:
        u_a = float("nan")
        effect = float("nan")
    else:
        u_a = r_a - na * (na + 1.0) / 2.0
        effect = u_a / (na * nb)
    return pa.table({"u_a": pa.array([u_a], pa.float64()),
                     "effect": pa.array([effect], pa.float64()),
                     "n_a": pa.array([int(na)], pa.int64()),
                     "n_b": pa.array([int(nb)], pa.int64())})


def rate_autocorr(
    ds,
    ts_col: str = "ts",
    type_col: str = "event_type",
    bucket_sec: int = 3600,
) -> pa.Table:
    """Lag-1 autocorrelation of per-bucket event counts per type — the
    trend/seasonality tell (r1 near 0: memoryless arrivals; high r1:
    trending load). Pairs are OBSERVED consecutive buckets (bucket+1
    present), and r1 uses the explicit moment formula
    (nΣxy - ΣxΣy) / sqrt((nΣxx - (Σx)²)(nΣyy - (Σy)²)) so every
    intermediate is an exact integer in float64 and the double matches
    the SQL twin exactly. Same ONE type-keyed exchange as burstiness
    (a type's buckets co-locate); types with <2 pairs or zero variance
    emit NULL r1. Null types are excluded (the twin's self-join drops
    them — NULL = NULL never matches)."""
    from ..shuffle import hash_exchange

    step = bucket_sec * 1_000_000

    def partial(t: pa.Table) -> pa.Table:
        tt = t.filter(pc.and_(pc.is_valid(t[ts_col]),
                              pc.is_valid(t[type_col])))
        f = tt.schema.field(ts_col)
        ts_us = pc.cast(tt[ts_col],
                        pa.timestamp("us", tz=getattr(f.type, "tz", None)))
        us = np.asarray(pc.cast(ts_us, pa.int64()))
        bucket = pa.array(us // step, pa.int64())
        g = pa.table({type_col: tt[type_col], "bucket": bucket}).group_by(
            [type_col, "bucket"]).aggregate([([], "count_all")])
        return g.rename_columns([type_col, "bucket", "n"])

    def regroup(t: pa.Table) -> pa.Table:
        g = t.group_by([type_col, "bucket"]).aggregate([("n", "sum")])
        return g.rename_columns([type_col, "bucket", "n"])

    def finish(t: pa.Table) -> pa.Table:
        df = regroup(t).to_pandas()
        rows = []
        for ty, g in df.groupby(type_col, sort=False, dropna=False):
            g = g.sort_values("bucket")
            b = g["bucket"].to_numpy(np.int64)
            cnt = g["n"].to_numpy(np.float64)  # exact ints
            has_next = np.isin(b + 1, b)
            idx_next = np.searchsorted(b, b + 1)
            x = cnt[has_next]
            y = cnt[np.clip(idx_next[has_next], 0, len(b) - 1)]
            n = float(len(x))
            if n == 0:
                continue  # the SQL twin's pair join drops pairless types
            if n >= 2:
                sx, sy = float(x.sum()), float(y.sum())
                sxx = float((x * x).sum())
                syy = float((y * y).sum())
                sxy = float((x * y).sum())
                den2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
                r1 = ((n * sxy - sx * sy) / float(np.sqrt(den2))
                      if den2 > 0 else None)
            else:
                r1 = None
            rows.append((None if (ty is None or (isinstance(ty, float)
                                                 and np.isnan(ty))) else ty,
                         int(n), r1))
        return pa.table({
            type_col: pa.array([r[0] for r in rows], pa.string()),
            "n_pairs": pa.array([r[1] for r in rows], pa.int64()),
            "r1": pa.array([r[2] for r in rows], pa.float64()),
        })

    out = hash_exchange(
        ds.select_columns([ts_col, type_col]).map_batches(
            partial, batch_format="pyarrow").to_arrow_refs(),
        [type_col], finish, combine_fn=regroup,
    )
    if out is None:
        return pa.table({type_col: pa.array([], pa.string()),
                         "n_pairs": pa.array([], pa.int64()),
                         "r1": pa.array([], pa.float64())})
    return out


def seasonal_anomaly(
    ds,
    ts_col: str = "ts",
    type_col: str = "event_type",
    ratio_threshold: float = 3.0007,
) -> pa.Table:
    """Seasonally-adjusted volume anomalies: each (type, hour) bucket is
    compared against its type's HOUR-OF-DAY profile (the mean count for
    that clock hour across all observed days) — the alert that knows
    3am is always quiet. Flag when count > threshold x the profile mean
    (off-lattice threshold: count*days/total is a small-denominator
    rational that cannot equal it). ONE type-keyed exchange of hourly
    combiners; profile build and join are shard-local (a type's hours
    co-locate). Null types are excluded (the twin's profile JOIN drops
    them — NULL = NULL never matches)."""
    from ..shuffle import hash_exchange

    step = 3_600_000_000

    def partial(t: pa.Table) -> pa.Table:
        tt = t.filter(pc.and_(pc.is_valid(t[ts_col]),
                              pc.is_valid(t[type_col])))
        f = tt.schema.field(ts_col)
        ts_us = pc.cast(tt[ts_col],
                        pa.timestamp("us", tz=getattr(f.type, "tz", None)))
        us = np.asarray(pc.cast(ts_us, pa.int64()))
        hour = us // step
        g = pa.table({
            type_col: tt[type_col],
            "hour_bucket": pa.array(hour, pa.int64()),
            "hod": pa.array(hour % 24, pa.int64()),
            "n": pa.nulls(tt.num_rows, pa.int64()).fill_null(1),
        }).group_by([type_col, "hour_bucket", "hod"]).aggregate(
            [("n", "sum")])
        return g.select([type_col, "hour_bucket", "hod",
                         "n_sum"]).rename_columns(
            [type_col, "hour_bucket", "hod", "n"])

    def regroup(t: pa.Table) -> pa.Table:
        g = t.group_by([type_col, "hour_bucket", "hod"]).aggregate(
            [("n", "sum")])
        return g.select([type_col, "hour_bucket", "hod",
                         "n_sum"]).rename_columns(
            [type_col, "hour_bucket", "hod", "n"])

    def finish(t: pa.Table) -> pa.Table:
        df = regroup(t).to_pandas()
        grp = df.groupby([type_col, "hod"], sort=False, dropna=False)
        df["cell_total"] = grp["n"].transform("sum")
        df["cell_hours"] = grp["n"].transform("size")
        expected = (df["cell_total"].astype("float64")
                    / df["cell_hours"].astype("float64")).to_numpy()
        n = df["n"].to_numpy(np.float64)
        ratio = n / expected
        return pa.table({
            type_col: pa.array(df[type_col], pa.string()),
            "hour_bucket": pa.array(df["hour_bucket"].to_numpy(np.int64)),
            "n": pa.array(df["n"].to_numpy(np.int64)),
            "expected": pa.array(expected, pa.float64()),
            "ratio": pa.array(ratio, pa.float64()),
            "flagged": pa.array(ratio > ratio_threshold),
        })

    out = hash_exchange(
        ds.select_columns([ts_col, type_col]).map_batches(
            partial, batch_format="pyarrow").to_arrow_refs(),
        [type_col], finish, combine_fn=regroup,
    )
    if out is None:
        return pa.table({type_col: pa.array([], pa.string()),
                         "hour_bucket": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64()),
                         "expected": pa.array([], pa.float64()),
                         "ratio": pa.array([], pa.float64()),
                         "flagged": pa.array([], pa.bool_())})
    return out
