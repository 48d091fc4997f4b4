"""Lookup enrichment — the kubernetes-filter analog as an actor-pool stage.

Reference parity (studied, not copied): plugins/filter_kubernetes —
(1) a join key is extracted from routing metadata (tag regex,
kube_meta.c:218-238) — here the `host` column (or a regex over the tag);
(2) an in-memory hash cache maps key -> metadata (kube_meta.c:558-568,
flb_hash_get/add :760-781) — here a plain dict BROADCAST once via `ray.put`
and materialized once per actor in ``__init__`` (never re-shipped per batch);
(3) the metadata map is merged into each record under a nested key
(`kubernetes` there, ``meta`` here, kubernetes.c:183-387);
(4) ``Merge_Log`` — unescape+parse a log field splicing fields into the
record — is the ParserFilter stage composed before this one.

Scale note: this is THE one join shape the reference has (small-dim lookup);
a broadcast dict in actor state beats a distributed join for dims that fit
in a worker heap (SURVEY §2.6). For dims beyond heap size use
``sharded_dim_enrich`` below: both sides are hash-partitioned on the key
and each join shard probes only its dim slice, so no task ever holds the
whole dim.

Usage:
    ref = ray.put(lookup_dict)
    ds.map_batches(HostEnricher, fn_constructor_args=(ref,),
                   concurrency=N, batch_format="pyarrow")
"""

from __future__ import annotations

from typing import Any, Optional

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _maybe_get(obj: Any) -> Any:
    """Accept a plain dict or a ray.ObjectRef holding one."""
    try:
        import ray

        if isinstance(obj, ray.ObjectRef):
            return ray.get(obj)
    except ImportError:
        pass
    return obj


_WORKER_CACHE: dict = {}


def make_enrich_fn(lookup_ref: Any, key_col: str = "host", under: str = "meta"):
    """Task-based enrichment: broadcast ref + per-worker-process cache.

    For a read-only dim dict, plain tasks beat an actor pool: `ray.put` the
    dict once, `ray.get` it zero-copy in each worker, and cache the built
    enricher per worker process. No pool to size, no actor startup latency.
    Reserve the HostEnricher-as-actor-pool form for stages with genuinely
    expensive init (model loads) where pinning state to live actors pays.
    """

    cache_key = (str(lookup_ref), key_col, under)

    def enrich_fn(batch: pa.Table) -> pa.Table:
        enr = _WORKER_CACHE.get(cache_key)
        if enr is None:
            enr = HostEnricher(lookup_ref, key_col=key_col, under=under)
            _WORKER_CACHE[cache_key] = enr
        return enr.process_batch(batch)

    return enrich_fn


class DictEnricher:
    """Generic lookup enrichment: {key: {field: str_value}} -> nested struct.

    The config-surface analog of filter_kubernetes (`[FILTER] Name enrich`):
    fields are the union of the lookup's sub-keys (string-typed); misses get
    a NULL struct. Key extraction from the tag (KUBE_TAG_TO_REGEX style) is
    composed as a regex ParserFilter over `_tag` upstream of this stage.
    """

    def __init__(self, lookup: Any, key_col: str, under: str = "meta"):
        lookup = _maybe_get(lookup)
        self.key_col = key_col
        self.under = under
        fields: list[str] = []
        for v in lookup.values():
            for f in v:
                if f not in fields:
                    fields.append(f)
        self.fields = fields
        self._maps = {
            f: {k: str(v[f]) for k, v in lookup.items() if f in v} for f in fields
        }
        self._keys = set(lookup)

    def process_batch(self, table: pa.Table, mask: Optional[pa.Array] = None) -> pa.Table:
        n = table.num_rows
        if n == 0 or self.key_col not in table.column_names or not self.fields:
            return table
        keys = pd.Series(table[self.key_col].to_pandas())
        children = [
            pa.array(keys.map(self._maps[f]), pa.string()) for f in self.fields
        ]
        miss = pa.array([k not in self._keys for k in keys])
        if mask is not None:
            miss = pc.or_(miss, pc.invert(mask))
        struct = pa.StructArray.from_arrays(children, names=self.fields, mask=miss)
        return table.append_column(self.under, struct)

    def process_row(self, record: dict) -> Optional[dict]:
        out = dict(record)
        key = record.get(self.key_col)
        if key in self._keys:
            out[self.under] = {
                f: self._maps[f][key] for f in self.fields if key in self._maps[f]
            }
        else:
            out[self.under] = None
        return out


def _join_shard(
    key_col: str,
    dim_key: str,
    fields: list[str],
    n_dim: int,
    *parts: Optional[pa.Table],
) -> Optional[pa.Table]:
    """One co-located join shard: build the dim slice, probe the stream
    slice with a vectorized hash lookup (pc.index_in — the shard-local
    'dict probe'), left-join semantics (miss -> null fields). Duplicate dim
    keys resolve to the FIRST occurrence, matching flb_hash_get returning
    the single cache entry (kube_meta.c:760-781)."""
    dim_parts = [t for t in parts[:n_dim] if t is not None and t.num_rows]
    stream_parts = [t for t in parts[n_dim:] if t is not None and t.num_rows]
    if not stream_parts:
        return None
    stream = pa.concat_tables(stream_parts, promote_options="default")
    if not dim_parts:
        out = stream
        for f in fields:
            out = out.append_column(f, pa.nulls(out.num_rows, pa.string()))
        return out
    dim = pa.concat_tables(dim_parts, promote_options="default")
    idx = pc.index_in(
        stream[key_col].combine_chunks()
        if isinstance(stream[key_col], pa.ChunkedArray)
        else stream[key_col],
        value_set=dim[dim_key].combine_chunks()
        if isinstance(dim[dim_key], pa.ChunkedArray)
        else dim[dim_key],
    )
    out = stream
    for f in fields:
        out = out.append_column(f, dim[f].take(idx))
    return out


def sharded_dim_enrich(
    stream_ds,
    dim_ds,
    key_col: str,
    dim_key: str,
    fields: list[str],
    num_shards: Optional[int] = None,
):
    """Hash-exchange lookup join for dim tables beyond a worker heap.

    The broadcast enrichers above ship the WHOLE dim to every worker —
    right for small dims, impossible when the dim itself is corpus-scale.
    Here both sides move through the same two-stage exchange as
    shuffle.hash_reduce: every stream block and every dim block is split
    by hash(key) % K (one task per chunk of blocks), then K join tasks
    each probe only their own dim slice (pc.index_in hash probe). Returns
    a Ray Dataset over the enriched shard refs — nothing materializes on
    the driver, and shards chain object-store-to-object-store.

    Partitioning assumption: key hashing balances shards (documented for
    all exchanges in shuffle.py); a single pathologically hot JOIN key
    skews its shard — pre-split such streams with ops.skew salting.
    """
    import ray
    import ray.data

    from ..shuffle import _split_chunk

    stream_refs = stream_ds.to_arrow_refs()
    dim_refs = (
        dim_ds.to_arrow_refs() if hasattr(dim_ds, "to_arrow_refs") else None
    )
    if dim_refs is None:  # plain Table accepted for tests/small dims
        dim_refs = [ray.put(dim_ds)]
    if not stream_refs:
        return ray.data.from_arrow(pa.table({}))
    cpus = int(ray.cluster_resources().get("CPU", 8))
    if num_shards is None:
        num_shards = max(2, min(cpus, max(len(stream_refs), len(dim_refs)), 32))
    split = ray.remote(num_returns=num_shards)(_split_chunk)

    def _scatter(refs: list, keys: list[str]) -> list[list]:
        shards: list[list] = [[] for _ in range(num_shards)]
        n_split = max(1, min(len(refs), 2 * cpus))
        chunk = (len(refs) + n_split - 1) // n_split
        for i in range(0, len(refs), chunk):
            outs = split.remote(keys, None, num_shards, *refs[i : i + chunk])
            if num_shards == 1:
                outs = [outs]
            for s, r in enumerate(outs):
                shards[s].append(r)
        return shards

    dim_shards = _scatter(dim_refs, [dim_key])
    stream_shards = _scatter(stream_refs, [key_col])
    join = ray.remote(_join_shard)
    out_refs = [
        join.remote(key_col, dim_key, fields, len(dim_shards[s]),
                    *dim_shards[s], *stream_shards[s])
        for s in range(num_shards)
    ]
    # drop empty shards WITHOUT pulling tables to the driver: a worker-side
    # row count dereferences each shard where it lives
    count = ray.remote(lambda t: 0 if t is None else t.num_rows)
    nrows = ray.get([count.remote(r) for r in out_refs])
    live = [r for r, n in zip(out_refs, nrows) if n]
    if not live:
        return ray.data.from_arrow(pa.table({}))
    return ray.data.from_arrow_refs(live)


class HostEnricher:
    """Callable-class stage: dict lookup -> nested `meta` struct column.

    lookup: {host: {"geo":…, "org":…, "labels": {…}}}. Misses produce a NULL
    struct (the enrichment-miss path, FIXTURES.md F3).
    """

    def __init__(self, lookup: Any, key_col: str = "host", under: str = "meta"):
        lookup = _maybe_get(lookup)
        self.key_col = key_col
        self.under = under
        # split into per-field dicts so the batch path is three vectorized maps
        self._geo = {k: v["geo"] for k, v in lookup.items()}
        self._org = {k: v["org"] for k, v in lookup.items()}
        self._labels = {k: v.get("labels") or {} for k, v in lookup.items()}

    def __call__(self, table: pa.Table) -> pa.Table:
        return self.process_batch(table)

    def process_batch(self, table: pa.Table, mask: Optional[pa.Array] = None) -> pa.Table:
        n = table.num_rows
        if n == 0 or self.key_col not in table.column_names:
            return table
        keys = pd.Series(table[self.key_col].to_pandas())
        geo = pa.array(keys.map(self._geo), pa.string())
        org = pa.array(keys.map(self._org), pa.string())
        labels = pa.array(
            [self._labels.get(k) for k in keys], pa.map_(pa.string(), pa.string())
        )
        miss = pc.is_null(geo)
        if mask is not None:
            miss = pc.or_(miss, pc.invert(mask))
        struct = pa.StructArray.from_arrays(
            [geo, org, labels], names=["geo", "org", "labels"],
            mask=miss.combine_chunks() if isinstance(miss, pa.ChunkedArray) else miss,
        )
        return table.append_column(self.under, struct)

    def process_row(self, record: dict) -> Optional[dict]:
        out = dict(record)
        key = record.get(self.key_col)
        if key in self._geo:
            out[self.under] = {
                "geo": self._geo[key],
                "org": self._org[key],
                "labels": dict(self._labels[key]),
            }
        else:
            out[self.under] = None
        return out


def range_lookup_enrich(ds, value_col: str, ranges: "pa.Table",
                        lo_col: str, hi_col: str,
                        payload_cols: Optional[list] = None):
    """GeoIP-style range-table enrichment: map an integer value (an IPv4
    address as uint32, a port, a numeric id) to the payload of the
    NON-OVERLAPPING closed range [lo, hi] that contains it — the classic
    GeoIP/ASN longest-match lookup, batch form. LEFT semantics: a value
    in no range (or null) gets null payload columns, mirroring
    `LEFT JOIN dims ON v BETWEEN lo AND hi`.

    Scale shape: the range table is sorted once by `lo` and broadcast
    with ray.put (GeoIP dims are a few hundred MB at most — the same
    fits-a-heap contract as the kube-cache dict above); each batch does
    ONE searchsorted against the lo array plus a hi bound check — no
    shuffle, no per-row Python. Ranges MUST be non-overlapping (a GeoIP
    table is); overlaps would need an interval tree — use
    ops/joins.interval_join for that regime.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    if payload_cols is None:
        payload_cols = [c for c in ranges.column_names
                        if c not in (lo_col, hi_col)]
    order = pc.sort_indices(ranges, sort_keys=[(lo_col, "ascending")])
    ranges = ranges.take(order)
    ref = ray.put((
        ranges[lo_col].to_numpy(zero_copy_only=False).astype(np.int64),
        ranges[hi_col].to_numpy(zero_copy_only=False).astype(np.int64),
        ranges.select(payload_cols).combine_chunks(),
    ))

    def lookup(b: pa.Table) -> pa.Table:
        lo, hi, payload = ray.get(ref)
        col = b[value_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        valid = np.asarray(pc.is_valid(col))
        # fill_null BEFORE to_numpy: a nullable int column would otherwise
        # detour through float64 (NaN) and round values above 2^53.
        v = pc.fill_null(col, 0).cast(pa.int64()).to_numpy()
        if len(lo) == 0:
            hit = np.zeros(len(b), dtype=bool)
            safe = np.zeros(len(b), dtype=np.int64)
        else:
            idx = np.searchsorted(lo, v, side="right") - 1
            safe = np.maximum(idx, 0)
            hit = valid & (idx >= 0) & (v <= hi[safe])
        take = pa.array(np.where(hit, safe, -1), pa.int64())
        take = pc.if_else(pc.greater_equal(take, 0), take,
                          pa.scalar(None, pa.int64()))
        out = b
        for name in payload_cols:
            out = out.append_column(name, payload[name].take(take))
        return out

    return ds.map_batches(lookup, batch_format="pyarrow")
