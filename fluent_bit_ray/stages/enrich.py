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
in a worker heap (SURVEY §2.6). For dims beyond heap size, shard the dict
and hash-partition the stream on the key instead.

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
