"""Schema-evolution union — the log-pipeline reality the reference meets
as heterogeneous msgpack maps (a tail source's records gain/lose keys
across app deploys; `flb_pack.c` just packs whatever keys arrive —
studied, not copied): UNION ALL of datasets whose schemas differ, with
missing columns null-filled and conflicting primitive types promoted.

Ray-Data-first shape: compute the unified Arrow schema from the inputs'
metadata (no data read), then ONE map_batches per input aligns its blocks
to that schema (append typed null columns + cast + column-order fix) and
`Dataset.union` chains the streams — no shuffle, no materialization; the
streaming executor interleaves the sources.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _schema_of(ds) -> pa.Schema:
    from .joins import _arrow_schema

    return _arrow_schema(ds)


def unified_schema(schemas: list[pa.Schema]) -> pa.Schema:
    """First-seen column order; types promoted permissively (int32+int64
    -> int64, int+float -> float, disjoint -> error, mirroring Arrow's
    own UNION ALL promotion rules)."""
    return pa.unify_schemas(schemas, promote_options="permissive")


def union_evolved(ds_list: list):
    """UNION ALL over schema-drifted datasets. Returns one Dataset with
    the unified schema; each input pays one zero-shuffle alignment map.

    Caveat (Ray empty-block passthrough): an input's EMPTY blocks skip
    the alignment fn and keep their original schema — harmless for row
    semantics (0 rows) but visible in Dataset.schema() warnings."""
    if not ds_list:
        raise ValueError("union_evolved needs at least one dataset")
    target = unified_schema([_schema_of(d) for d in ds_list])

    def aligner(t: pa.Table) -> pa.Table:
        cols = {}
        for f in target:
            if f.name in t.column_names:
                c = t[f.name]
                if isinstance(c, pa.ChunkedArray):
                    c = c.combine_chunks()
                cols[f.name] = c if c.type == f.type else pc.cast(c, f.type)
            else:
                cols[f.name] = pa.nulls(t.num_rows, f.type)
        return pa.table(cols, schema=target)

    aligned = [d.map_batches(aligner, batch_format="pyarrow")
               for d in ds_list]
    out = aligned[0]
    for d in aligned[1:]:
        out = out.union(d)
    return out
