"""Deterministic sampling / splitting operators for training-data pipelines.

A 100 TB corpus needs reproducible train/val/test assignment and per-domain
subsampling that (a) never depends on row order, partitioning, or a process
seed, and (b) can be re-derived by any engine. Both operators key off the
same SQL-expressible multiplicative hash (Knuth's 2654435761 over the id's
low 32 bits) so every assignment is checkable against a DuckDB oracle —
documented engine contract: swap in a stronger keyed hash for adversarial
settings, keeping the same plumbing.

- hash_split: per-row split label from fractional thresholds. Pure
  map_batches — no shuffle, no state; a row's label is a function of its id
  alone, so resuming / repartitioning can never reassign rows.
- stratified_sample: the N lowest-hash rows per stratum (a deterministic
  uniform sample per domain). Map-side partial top-N per stratum, then one
  hash exchange keyed on the stratum co-locates survivors; the map-side
  prune means at most N rows per stratum per block ever enter the exchange.
- global_shuffle: seeded, fully reproducible global permutation for
  training-data export. The shuffle key is a 3-round 32-bit multiply/xor
  mix of (id, seed) — every round expressible in DuckDB SQL, so the WHOLE
  permutation (not just membership) is oracle-checkable. Order comes from
  Ray Data's range-partitioned distributed sort on (key, id); global ranks
  are then assigned per sorted block from a driver-side prefix sum over
  block ROW COUNTS only (metadata, never rows), so nothing materializes.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_KNUTH = np.int64(2654435761)
_M32 = np.int64(1 << 32)


def split_hash(ids: np.ndarray) -> np.ndarray:
    """((id % 2^32) * 2654435761) % 2^32 — SQL-mirrorable, order-free."""
    ids = ids.astype(np.int64)
    return ((ids % _M32) * _KNUTH) % _M32


def split_cuts(splits: dict[str, float]) -> np.ndarray:
    """Cumulative integer hash thresholds over [0, 2^32): one cut per
    label except the last (which takes the remainder)."""
    acc, cuts = 0.0, []
    for name in list(splits)[:-1]:
        acc += splits[name]
        cuts.append(int(acc * float(_M32)))
    return np.asarray(cuts, dtype=np.int64)


def hash_split_batch(
    batch: pa.Table,
    id_col: str = "doc_id",
    splits: Optional[dict[str, float]] = None,
) -> pa.Table:
    """Assign each row a split label by hash fraction. `splits` maps label
    -> fraction (must sum to <= 1; remainder falls into the LAST label).
    Thresholds are evaluated in insertion order, so the mapping is stable
    as long as the dict literal is."""
    if splits is None:
        splits = {"train": 0.98, "val": 0.01, "test": 0.01}
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    h = split_hash(ids)
    labels = list(splits)
    # integer hash cuts (not float fractions) so the comparison is exact
    # and literally reproducible in SQL: label i gets h in [cut_{i-1}, cut_i)
    cuts = split_cuts(splits)
    out = np.searchsorted(cuts, h, side="right")
    label_arr = pa.DictionaryArray.from_arrays(
        pa.array(out.astype(np.int32)), pa.array(labels, pa.string())
    )
    return pa.table(
        {id_col: batch[id_col], "split": label_arr.cast(pa.string())}
    )


def hash_split(ds, id_col: str = "doc_id", splits=None):
    """Dataset wrapper: pure per-batch map, streaming end-to-end."""
    return ds.map_batches(
        lambda b: hash_split_batch(b, id_col, splits),
        batch_format="pyarrow",
    )


_MIX2 = np.uint64(2246822519)   # xxhash32 prime 2
_MIX3 = np.uint64(3266489917)   # xxhash32 prime 3
_MASK32 = np.uint64(0xFFFFFFFF)


def shuffle_hash(ids: np.ndarray, seed: int) -> np.ndarray:
    """Seeded 32-bit mix of the id: Knuth multiply + seed, then two
    xxhash-style xor-shift/multiply finalizer rounds. All intermediates
    stay < 2^64 (max product 2^32 * MIX3 ≈ 2^63.6), so plain uint64
    arithmetic is exact — and each round is literally reproducible in
    DuckDB SQL via HUGEINT products (see shuffle_hash_sql)."""
    x = ids.astype(np.uint64) & _MASK32
    x = (x * np.uint64(2654435761) + np.uint64(seed)) & _MASK32
    x ^= x >> np.uint64(16)
    x = (x * _MIX2) & _MASK32
    x ^= x >> np.uint64(13)
    x = (x * _MIX3) & _MASK32
    x ^= x >> np.uint64(16)
    return x.astype(np.int64)


def knuth_hash(ids: np.ndarray) -> np.ndarray:
    """Plain Knuth multiplicative 32-bit hash (no seed/finalizer) — the
    deterministic id->pseudo-random-uint32 map the geoip/late_events
    driver queries synthesize IPs and arrival orders from. Kept next to
    shuffle_hash so the engine expression and its SQL twin live in ONE
    place (see knuth_hash_sql)."""
    return (ids.astype(np.int64) * 2654435761) % 4294967296


def knuth_hash_sql(id_expr: str) -> str:
    """knuth_hash as a DuckDB scalar expression. The product runs in
    HUGEINT: a BIGINT product overflows for ids above ~3.47e9 (inside the
    uint32 range), where numpy's int64 silently wraps mod 2^64 — which
    stays correct mod 2^32 — but DuckDB would raise out-of-range.
    Domain contract (same as knuth_hash's callers): id >= 0."""
    return (f"CAST(CAST({id_expr} AS HUGEINT) * 2654435761 "
            f"% 4294967296 AS BIGINT)")


def shuffle_hash_sql(id_expr: str, seed: int) -> str:
    """The exact shuffle_hash computation as a DuckDB scalar expression
    pipeline (for oracle SQL). Products run in HUGEINT because
    2^32 * 3266489917 overflows BIGINT."""
    s1 = (f"CAST((CAST({id_expr} AS HUGEINT) % 4294967296) * 2654435761 "
          f"+ {seed} AS HUGEINT) % 4294967296")
    s2 = f"xor(CAST(({s1}) AS BIGINT), CAST(({s1}) AS BIGINT) >> 16)"
    s3 = f"CAST(CAST(({s2}) AS HUGEINT) * 2246822519 % 4294967296 AS BIGINT)"
    s4 = f"xor(({s3}), ({s3}) >> 13)"
    s5 = f"CAST(CAST(({s4}) AS HUGEINT) * 3266489917 % 4294967296 AS BIGINT)"
    return f"xor(({s5}), ({s5}) >> 16)"


def global_shuffle(ds, id_col: str = "doc_id", seed: int = 0,
                   keep_cols: Optional[list] = None):
    """Seeded deterministic global shuffle; returns a Dataset ordered by
    the shuffle key with a materialized global `pos` rank column.

    Scale shape: one map to attach the key, ONE distributed sort (Ray
    Data's range-partitioned sort — the unavoidable exchange), then rank
    assignment touches only per-block row counts: tiny remote count
    tasks -> driver prefix sum over ints -> per-block offset+arange tasks
    chained through the object store. The permutation is a pure function
    of (id, seed) — independent of partitioning, cluster size, or resume
    point — which is what makes a 100 TB training-order reproducible."""
    import ray
    import ray.data

    cols = [id_col] + [c for c in (keep_cols or []) if c != id_col]

    def add_key(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        h = shuffle_hash(ids, seed)
        return pa.table(
            {c: b[c] for c in cols} | {"_shuffle_h": pa.array(h)}
        )

    hashed = ds.map_batches(add_key, batch_format="pyarrow")
    s = hashed.sort(["_shuffle_h", id_col])
    refs = s.to_arrow_refs()

    @ray.remote
    def nrows(t: pa.Table) -> int:
        return t.num_rows

    @ray.remote
    def add_pos(t: pa.Table, offset: int) -> pa.Table:
        pos = pa.array(offset + np.arange(t.num_rows, dtype=np.int64))
        return t.drop_columns(["_shuffle_h"]).append_column("pos", pos)

    counts = ray.get([nrows.remote(r) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(counts)))
    out = [add_pos.remote(r, int(o)) for r, o in zip(refs, offsets[:-1])]
    return ray.data.from_arrow_refs(out)


def global_sort(ds, keys: list, descending=None, rank_col: str = "rn",
                block_fn=None):
    """Distributed ORDER BY with a materialized 1-based global rank (SQL
    `row_number() OVER (ORDER BY ...)` — pass a total order, i.e. include
    a unique tiebreaker key, or ranks within ties are partition-dependent).

    Same scale shape as `global_shuffle`: Ray Data's range-partitioned
    sample sort is the one unavoidable exchange; the rank pass then
    touches only per-block row COUNTS (remote int tasks -> driver prefix
    sum -> per-block offset+arange), never re-shipping the data, and the
    result chains object-store-to-object-store as a Dataset.

    `block_fn(t, offset, total)` — optional per-block hook run after the
    rank column lands, for rank-derived features that need only the
    block's global offset and the total row count (percent_rank, ntile);
    `global_rank_features` is its one wrapper."""
    import ray
    import ray.data

    s = ds.sort(keys, descending=descending if descending is not None
                else [False] * len(keys))
    refs = s.to_arrow_refs()

    @ray.remote
    def nrows(t: pa.Table) -> int:
        return t.num_rows

    @ray.remote
    def add_rank(t: pa.Table, offset: int, total: int) -> pa.Table:
        rn = pa.array(offset + 1 + np.arange(t.num_rows, dtype=np.int64))
        t = t.append_column(rank_col, rn)
        return t if block_fn is None else block_fn(t, offset, total)

    counts = ray.get([nrows.remote(r) for r in refs])
    total = int(sum(counts))
    offsets = np.concatenate(([0], np.cumsum(counts)))
    out = [add_rank.remote(r, int(o), total)
           for r, o in zip(refs, offsets[:-1])]
    return ray.data.from_arrow_refs(out)


def _ws_topk(t: Optional[pa.Table], id_col: str, k: int):
    """Top-k rows by (skey desc, id asc) — the A-ES selection rule; a
    true combiner (per-block winners can only lose to other winners)."""
    if t is None or not t.num_rows:
        return None
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    skey = t["skey"].to_numpy(zero_copy_only=False)
    # -inf marks ineligible rows (weight <= 0 / null); they must never
    # surface even when k exceeds the eligible count (SQL WHERE w > 0)
    order = np.lexsort((ids, -skey))
    order = order[np.isfinite(skey[order])][:k]
    if not len(order):
        return None
    return t.take(pa.array(np.sort(order)))


def weighted_sample(ds, weight_col: str, id_col: str = "doc_id",
                    k: int = 50, seed: int = 1, fanin: int = 8):
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis A-ES): each row draws u = (shuffle_hash(id, seed) + 0.5) /
    2^32 in (0,1) and the k largest u^(1/w) win — selection probability
    proportional to weight, in log space as skey = ln(u) / w (monotone).
    Rows with weight <= 0 or null never win (skey -inf), matching the
    oracle's WHERE w > 0. The draw is a pure function of (id, seed) —
    partition- and cluster-size-independent, SQL-reproducible via
    shuffle_hash_sql — which is what makes a 100 TB sample auditable.

    Scale shape: per-block scoring + per-block top-k (a true combiner:
    O(k) rows leave each block), then a fan-in merge tree of the same
    selection rule — no global sort, no all-to-all; the driver sees one
    k-row table."""
    import ray

    def score(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = b[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        u = (shuffle_hash(ids, seed).astype(np.float64) + 0.5) / float(_M32)
        ok = np.isfinite(w) & (w > 0)
        skey = np.where(ok, np.log(u) / np.where(ok, w, 1.0), -np.inf)
        t = pa.table({id_col: b[id_col],
                      "skey": pa.array(skey, pa.float64())})
        out = _ws_topk(t, id_col, k)
        # a block with NO eligible rows still must emit the op's schema,
        # but zero rows — returning the scored block whole would break
        # the O(k)-rows-leave-each-block combiner contract
        return out if out is not None else t.slice(0, 0)

    merge = ray.remote(
        lambda *ts: _ws_topk(
            pa.concat_tables([p for p in ts if p is not None and p.num_rows],
                             promote_options="default")
            if any(p is not None and p.num_rows for p in ts) else None,
            id_col, k))
    refs = (ds.select_columns([id_col, weight_col])
            .map_batches(score, batch_format="pyarrow").to_arrow_refs())
    while len(refs) > 1:
        refs = [merge.remote(*refs[i:i + fanin])
                for i in range(0, len(refs), fanin)]
    # final local top-k: a single-block dataset never enters the merge
    # loop, and one block may concatenate several per-batch score outputs
    out = _ws_topk(ray.get(refs[0]), id_col, k) if refs else None
    if out is None:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "skey": pa.array([], pa.float64())})
    # canonical output order (skey desc, id) — the selection rule itself —
    # so the result is identical bytes under ANY block/merge arrival order,
    # not just the same set of rows
    ids = out[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    skey = out["skey"].to_numpy(zero_copy_only=False)
    return out.take(pa.array(np.lexsort((ids, -skey))))


def _key_codes(col) -> np.ndarray:
    """Group codes for a key column of ANY dtype; null is its OWN group
    (pd.factorize use_na_sentinel=False — dictionary_encode+fill_null
    would merge null with the fill value and drops non-string keys)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    import pandas as pd

    return pd.factorize(col.to_pandas(), use_na_sentinel=False)[0].astype(
        np.int64
    )


def _keep_group_topn(
    t: pa.Table, codes: np.ndarray, order: np.ndarray, n: int
) -> pa.Table:
    """Shared within-group-rank kernel: `order` sorts rows grouped by
    `codes` with the per-group preference as secondary keys; keep each
    group's first n rows (original row order preserved)."""
    kc = codes[order]
    new = np.ones(len(kc), dtype=bool)
    new[1:] = kc[1:] != kc[:-1]
    starts = np.flatnonzero(new)
    rank = np.arange(len(kc)) - np.repeat(
        starts, np.diff(np.concatenate((starts, [len(kc)])))
    )
    return t.take(pa.array(np.sort(order[rank < n])))


def _topn_per_stratum(
    t: pa.Table, strata_col: str, id_col: str, n: int
) -> pa.Table:
    """Keep the n (hash, id)-smallest rows per stratum — vectorized
    lexsort + within-group rank, no Python loop."""
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    h = split_hash(ids)
    codes = _key_codes(t[strata_col])
    return _keep_group_topn(t, codes, np.lexsort((ids, h, codes)), n)


def _topn_by_score(
    t: pa.Table, key_col: str, id_col: str, score_col: str, n: int
) -> pa.Table:
    """Keep the n (score desc, id asc)-best rows per key — the scored
    generalization of _topn_per_stratum (same within-group-rank kernel).
    Null scores sort last; null keys form their own group."""
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    sc = t[score_col].to_numpy(zero_copy_only=False).astype(np.float64)
    sc = np.where(np.isnan(sc), -np.inf, sc)
    codes = _key_codes(t[key_col])
    return _keep_group_topn(t, codes, np.lexsort((ids, -sc, codes)), n)


def topn_per_key(
    ds,
    key_col: str,
    score_col: str,
    id_col: str = "doc_id",
    n: int = 5,
) -> Optional[pa.Table]:
    """Top-n rows per key by (score desc, id asc) — keep_best_per_key's
    n>1 generalization (best n captures per url/host, best n docs per
    domain by quality). Same shape as stratified_sample: the map-side
    prune caps each block's contribution at n rows per key, the exchange
    moves only survivors, and the associative top-n combiner/finisher
    makes the result independent of block boundaries."""
    from ..shuffle import hash_exchange

    cols = [key_col, score_col, id_col]
    pruned = ds.select_columns(cols).map_batches(
        lambda b: _topn_by_score(b, key_col, id_col, score_col, n),
        batch_format="pyarrow",
    )
    topn = lambda t: _topn_by_score(t, key_col, id_col, score_col, n)
    return hash_exchange(
        pruned.to_arrow_refs(), [key_col], topn, combine_fn=topn
    )


def stratified_sample(
    ds,
    strata_col: str = "source",
    id_col: str = "doc_id",
    n_per_stratum: int = 25,
) -> pa.Table:
    """Deterministic uniform sample: the n lowest-(hash, id) rows of every
    stratum. Map-side prune caps each block's contribution at n rows per
    stratum; the exchange keyed on the stratum then runs the same top-n
    as combiner and finisher — associative, so the result is exact and
    independent of block boundaries."""
    from ..shuffle import hash_exchange

    def prune(b: pa.Table) -> pa.Table:
        return _topn_per_stratum(b, strata_col, id_col, n_per_stratum)

    pruned = ds.map_batches(prune, batch_format="pyarrow")
    topn = lambda t: _topn_per_stratum(t, strata_col, id_col, n_per_stratum)
    out = hash_exchange(
        pruned.to_arrow_refs(), [strata_col], topn, combine_fn=topn
    )
    if out is None:
        return pa.table(
            {id_col: pa.array([], pa.int64()),
             strata_col: pa.array([], pa.string())}
        )
    return out.select([id_col, strata_col])


def ntile_for_ranks(rn: np.ndarray, total: int, tiles: int) -> np.ndarray:
    """SQL ntile(tiles) bucket for 1-based global ranks `rn` out of
    `total` rows: the first total%tiles buckets take one extra row —
    the ONE implementation shared by global_rank_features and
    stats.rfm_features."""
    q, r = divmod(int(total), int(tiles))
    split = r * (q + 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(
            rn <= split,
            (rn - 1) // (q + 1) + 1,
            r + (0 if q == 0 else (rn - 1 - split) // q) + 1,
        ).astype(np.int64)


def global_rank_features(
    ds,
    keys: list,
    descending=None,
    tiles: int = 8,
    rank_col: str = "rn",
):
    """`global_sort` plus the rank-derived window features computed in
    the SAME metadata-only pass: `pct_rank` = SQL percent_rank() (pass a
    total order — with a unique tiebreaker rank() == row_number()) and
    `tile` = SQL ntile(tiles) (first N%tiles buckets take the extra
    row). Only per-block row counts reach the driver; each block derives
    its rows' features from (offset, N) locally — data never re-ships
    after the one sort exchange. Thin wrapper over `global_sort`'s
    block_fn hook (one rank-pass implementation, two ops)."""

    def feats(t: pa.Table, offset: int, total: int) -> pa.Table:
        rn = offset + 1 + np.arange(t.num_rows, dtype=np.int64)
        pct = ((rn - 1) / (total - 1) if total > 1
               else np.zeros(t.num_rows, dtype=np.float64))
        tile = ntile_for_ranks(rn, total, tiles)
        return (t.append_column("pct_rank", pa.array(pct))
                 .append_column("tile", pa.array(tile)))

    return global_sort(ds, keys, descending=descending,
                       rank_col=rank_col, block_fn=feats)


def reservoir_per_key(
    ds,
    key_col: str = "user_id",
    id_col: str = "event_id",
    n: int = 5,
) -> Optional[pa.Table]:
    """Deterministic n-per-key uniform sample: each key keeps the n rows
    minimizing (knuth_hash(id), id) — hash-order selection is uniform
    over ids, reproducible across runs and block layouts (unlike a true
    reservoir, whose result depends on arrival order), and exactly
    SQL-twinable (row_number() over the same hash order). Reuses the
    scored top-n machinery with score = -hash: the map-side prune caps
    each block's traffic at n rows per key, only survivors shuffle."""
    from ..shuffle import hash_exchange

    def add_h(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            key_col: b[key_col],
            id_col: b[id_col],
            "_negh": pa.array(-knuth_hash(ids), pa.int64()),
        })

    pruned = ds.select_columns([key_col, id_col]).map_batches(
        lambda b: _topn_by_score(add_h(b), key_col, id_col, "_negh", n),
        batch_format="pyarrow",
    )
    keep = lambda t: _topn_by_score(t, key_col, id_col, "_negh", n)
    out = hash_exchange(
        pruned.to_arrow_refs(), [key_col], lambda t: keep(t).drop(["_negh"]),
        combine_fn=keep,
    )
    if out is None:
        return None
    return out


def mixture_sample_batch(
    batch: pa.Table,
    source_col: str,
    rates: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 77,
    default_rate: float = 1.0,
) -> pa.Table:
    """Training-data mixture weighting (the Pile/DoReMi-style source
    rates, public method): each row is emitted floor(rate(source)) times,
    plus one more iff shuffle_hash(id, seed) falls under the fractional
    part's integer cut — so rate 0.25 deterministically subsamples,
    rate 2.5 duplicates into epochs, rate 0 drops. Adds an int64 `epoch`
    column (0..n-1) so duplicated rows stay distinct. Pure per-batch map,
    zero shuffle; reproducible across runs AND block layouts because the
    decision hashes the ID, never the position. Unknown/null sources use
    `default_rate`; null ids hash as 0 (documented). The integer cut
    (frac * 2^32) makes the comparison exactly reproducible in SQL via
    shuffle_hash_sql."""
    srcs = list(rates)
    base = np.array([int(np.floor(rates[s])) for s in srcs], dtype=np.int64)
    cut = np.array(
        [int((rates[s] - np.floor(rates[s])) * 4294967296) for s in srcs],
        dtype=np.int64,
    )
    dbase = int(np.floor(default_rate))
    dcut = int((default_rate - np.floor(default_rate)) * 4294967296)

    idx = np.asarray(
        pc.fill_null(
            pc.index_in(batch[source_col], value_set=pa.array(srcs)), -1
        )
    ).astype(np.int64)
    known = idx >= 0
    row_base = np.where(known, base[np.maximum(idx, 0)], dbase)
    row_cut = np.where(known, cut[np.maximum(idx, 0)], dcut)
    ids = np.asarray(
        pc.fill_null(pc.cast(batch[id_col], pa.int64()), 0)
    ).astype(np.int64)
    h = shuffle_hash(ids, seed)
    n = row_base + (h < row_cut)
    take = np.repeat(np.arange(len(n), dtype=np.int64), n)
    starts = np.repeat(np.cumsum(n) - n, n)
    epoch = np.arange(int(n.sum()), dtype=np.int64) - starts
    out = batch.take(pa.array(take))
    return out.append_column("epoch", pa.array(epoch, pa.int64()))


def mixture_sample(ds, source_col: str, rates: dict[str, float],
                   id_col: str = "doc_id", seed: int = 77,
                   default_rate: float = 1.0):
    """Dataset wrapper: pure per-batch map, streaming end-to-end."""
    return ds.map_batches(
        lambda b: mixture_sample_batch(b, source_col, rates, id_col, seed,
                                       default_rate),
        batch_format="pyarrow",
    )
