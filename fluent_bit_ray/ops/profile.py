"""Distributed dataset profiling and data-quality audits.

The reference engine's only self-description is per-chunk record/byte
counts (`plugins/out_flowcounter/out_flowcounter.c`, `flb_mp_count` —
studied, not copied); an engine feeding a 100 TB training-data build also
needs the two classic ingest gates: a per-column PROFILE (row/null/distinct
counts, min/max) and a CONSTRAINT AUDIT (Deequ-style null / range / enum /
uniqueness / referential checks).  Both are expressed here as the same two
scale shapes used everywhere else in this repo:

* decomposable stats (counts, min, max, per-check violation tallies) are
  per-block Arrow-kernel partials — a handful of FIXED-WIDTH rows per
  block, folded on the driver;
* exact distinct counts are the one non-decomposable piece: each block
  emits its per-block-DISTINCT (column, value) string pairs and ONE
  hash exchange co-locates equal pairs, so every distinct value is
  counted in exactly one reduce shard.  The exchange traffic is bounded
  by the per-block distinct volume, not the row count; for columns whose
  distinct set itself is corpus-sized, `ops/stats.hll_distinct` is the
  documented sketch-path twin.

Null semantics (shared with the SQL oracles): distinct/unique counts
ignore NULLs (SQL `count(DISTINCT c)`); range / enum / referential checks
count a NULL as a violation (a value that cannot be validated fails the
constraint, the Deequ `satisfies` convention); the null check counts NULLs
by definition.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

from ..shuffle import hash_exchange

_PROFILE_SCHEMA = pa.schema(
    [
        ("col", pa.string()),
        ("n_rows", pa.int64()),
        ("null_cnt", pa.int64()),
        ("min_num", pa.float64()),
        ("max_num", pa.float64()),
        ("min_str", pa.string()),
        ("max_str", pa.string()),
    ]
)

_PAIR_SCHEMA = pa.schema([("col", pa.string()), ("v", pa.string())])


def _as_comparable(arr: pa.ChunkedArray):
    """(numeric_view_or_None, kind): timestamps become exact epoch int64
    (the SQL twin uses epoch_us), numerics stay numeric, everything else
    profiles as a string."""
    t = arr.type
    if pa.types.is_timestamp(t):
        # normalize to exact epoch MICROSECONDS whatever the storage unit
        # (the SQL twin is epoch_us); integer math, floor division for ns
        ints = pc.cast(arr, pa.int64())
        mult = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": 1}[t.unit]
        if t.unit == "ns":
            return pc.divide(ints, 1_000), "num"
        return pc.multiply(ints, mult) if mult != 1 else ints, "num"
    if (
        pa.types.is_integer(t)
        or pa.types.is_floating(t)
        or pa.types.is_decimal(t)
    ):
        return arr, "num"
    return pc.cast(arr, pa.string()), "str"


def _stats_partial_fn(cols: Sequence[str]):
    def fn(t: pa.Table) -> pa.Table:
        out = {name: [] for name in _PROFILE_SCHEMA.names}
        for col in cols:
            arr, kind = _as_comparable(t[col])
            n = t.num_rows
            nulls = t[col].null_count
            mn = mx = None
            if n - nulls:
                mm = pc.min_max(arr)
                mn, mx = mm["min"].as_py(), mm["max"].as_py()
            out["col"].append(col)
            out["n_rows"].append(n)
            out["null_cnt"].append(nulls)
            is_num = kind == "num"
            out["min_num"].append(float(mn) if is_num and mn is not None else None)
            out["max_num"].append(float(mx) if is_num and mx is not None else None)
            out["min_str"].append(mn if not is_num else None)
            out["max_str"].append(mx if not is_num else None)
        return pa.Table.from_pydict(out, schema=_PROFILE_SCHEMA)

    return fn


def _unique_pairs_fn(cols: Sequence[str]):
    """Per block: the block-distinct (column, value-as-string) pairs.
    The string cast is only an injective transport encoding for the
    exchange key — the distinct COUNT is what's compared, never the
    string form itself."""

    def fn(t: pa.Table) -> pa.Table:
        names, vals = [], []
        for col in cols:
            arr, _ = _as_comparable(t[col])
            u = pc.unique(pc.drop_null(pc.cast(arr, pa.string())))
            if len(u):
                names.append(pa.array([col] * len(u), type=pa.string()))
                vals.append(u)
        if not names:
            return pa.table(
                {"col": pa.array([], pa.string()), "v": pa.array([], pa.string())}
            )
        return pa.table(
            {
                "col": pa.concat_arrays(names),
                "v": pa.concat_arrays([v.cast(pa.string()) for v in vals]),
            }
        )

    return fn


def _distinct_counts(mapped_ds, cols: Sequence[str]) -> dict:
    """Exact per-column distinct counts: ONE (col, v)-keyed exchange, each
    shard counts its (deduplicated) pairs per column, driver sums the at
    most len(cols) rows per shard."""

    def finish(t: pa.Table) -> pa.Table:
        d = t.group_by(["col", "v"]).aggregate([])
        g = d.group_by(["col"]).aggregate([("v", "count")])
        return g.rename_columns(["col", "dcnt"])

    res = hash_exchange(mapped_ds.to_arrow_refs(), ["col", "v"], finish)
    counts = {c: 0 for c in cols}
    if res is not None:
        for col, cnt in zip(res["col"].to_pylist(), res["dcnt"].to_pylist()):
            counts[col] += cnt
    return counts


def profile_columns(ds, cols: Sequence[str]) -> pa.Table:
    """One row per profiled column: row count, null count, exact distinct
    count, min/max (numeric columns — timestamps as exact epoch — in
    min_num/max_num; string columns in min_str/max_str under binary
    collation, both engines' default for ASCII corpora).

    NaN caveat (documented divergence): Arrow's min_max skips NaN while
    SQL engines sort NaN above every number, so min/max differ from a SQL
    twin on NaN-bearing float columns; distinct counts agree (both treat
    NaN as one value)."""
    cols = list(cols)
    pruned = ds.select_columns(cols)
    partials = pruned.map_batches(
        _stats_partial_fn(cols), batch_format="pyarrow"
    ).take_all()

    # driver fold over (blocks x cols) tiny partial rows
    acc = {
        c: {
            "n_rows": 0,
            "null_cnt": 0,
            "min_num": None,
            "max_num": None,
            "min_str": None,
            "max_str": None,
        }
        for c in cols
    }
    for r in partials:
        a = acc[r["col"]]
        a["n_rows"] += r["n_rows"]
        a["null_cnt"] += r["null_cnt"]
        for k, better in (
            ("min_num", min),
            ("max_num", max),
            ("min_str", min),
            ("max_str", max),
        ):
            if r[k] is not None:
                a[k] = r[k] if a[k] is None else better(a[k], r[k])

    dcnt = _distinct_counts(
        pruned.map_batches(_unique_pairs_fn(cols), batch_format="pyarrow"),
        cols,
    )
    out = {
        "col": cols,
        "n_rows": [acc[c]["n_rows"] for c in cols],
        "null_cnt": [acc[c]["null_cnt"] for c in cols],
        "distinct_cnt": [dcnt[c] for c in cols],
        "min_num": [acc[c]["min_num"] for c in cols],
        "max_num": [acc[c]["max_num"] for c in cols],
        "min_str": [acc[c]["min_str"] for c in cols],
        "max_str": [acc[c]["max_str"] for c in cols],
    }
    t = pa.Table.from_pydict(
        out,
        schema=pa.schema(
            [
                ("col", pa.string()),
                ("n_rows", pa.int64()),
                ("null_cnt", pa.int64()),
                ("distinct_cnt", pa.int64()),
                ("min_num", pa.float64()),
                ("max_num", pa.float64()),
                ("min_str", pa.string()),
                ("max_str", pa.string()),
            ]
        ),
    )
    return t.sort_by("col")


def dq_audit(
    ds,
    *,
    null_cols: Sequence[str] = (),
    range_checks: Optional[Mapping[str, tuple]] = None,
    enum_checks: Optional[Mapping[str, Sequence]] = None,
    unique_cols: Sequence[str] = (),
    ref_checks: Optional[Mapping[str, pa.Array]] = None,
) -> pa.Table:
    """Constraint audit -> one (check_name, violations) row per check.

    * ``null:{col}``   — rows where col IS NULL
    * ``range:{col}``  — rows outside the closed [lo, hi] (NULL violates)
    * ``enum:{col}``   — rows outside the allowed value list (NULL violates)
    * ``unique:{col}`` — non-null rows minus exact distinct (dup surplus)
    * ``ref:{col}``    — rows whose value is absent from the valid-key
      array (NULL violates); keys are ``ray.put`` ONCE and probed with a
      vectorized ``is_in`` per block — the broadcast-dim join shape, zero
      shuffle.
    """
    import ray

    range_checks = dict(range_checks or {})
    enum_checks = dict(enum_checks or {})
    ref_checks = dict(ref_checks or {})
    null_cols = list(null_cols)
    unique_cols = list(unique_cols)

    need = sorted(
        set(null_cols)
        | set(range_checks)
        | set(enum_checks)
        | set(unique_cols)
        | set(ref_checks)
    )
    pruned = ds.select_columns(need)

    ref_refs = {c: ray.put(v) for c, v in ref_checks.items()}
    count_names = (
        [f"null:{c}" for c in null_cols]
        + [f"range:{c}" for c in range_checks]
        + [f"enum:{c}" for c in enum_checks]
        + [f"ref:{c}" for c in ref_checks]
        + [f"_nonnull:{c}" for c in unique_cols]
    )

    def partial(t: pa.Table) -> pa.Table:
        names, counts = [], []

        def emit(name, mask_or_n):
            names.append(name)
            counts.append(
                int(mask_or_n)
                if isinstance(mask_or_n, int)
                else pc.sum(mask_or_n).as_py() or 0
            )

        for c in null_cols:
            emit(f"null:{c}", t[c].null_count)
        for c, (lo, hi) in range_checks.items():
            arr = t[c]
            ok = pc.and_(pc.greater_equal(arr, lo), pc.less_equal(arr, hi))
            # NULL comparisons are null -> fill false -> counted violating
            emit(f"range:{c}", pc.invert(pc.fill_null(ok, False)))
        for c, allowed in enum_checks.items():
            ok = pc.is_in(t[c], value_set=pa.array(list(allowed)))
            emit(f"enum:{c}", pc.invert(pc.fill_null(ok, False)))
        for c, ref in ref_refs.items():
            valid = ray.get(ref)
            ok = pc.is_in(t[c], value_set=valid)
            bad = pc.invert(pc.fill_null(ok, False))
            # is_in(null) is FALSE (not null) in Arrow; force NULL-violates
            bad = pc.or_(bad, pc.is_null(t[c]))
            emit(f"ref:{c}", bad)
        for c in unique_cols:
            emit(f"_nonnull:{c}", t.num_rows - t[c].null_count)
        return pa.table(
            {
                "check_name": pa.array(names, pa.string()),
                "violations": pa.array(counts, pa.int64()),
            }
        )

    totals = {n: 0 for n in count_names}
    for r in pruned.map_batches(partial, batch_format="pyarrow").take_all():
        totals[r["check_name"]] += r["violations"]

    if unique_cols:
        dcnt = _distinct_counts(
            pruned.select_columns(unique_cols).map_batches(
                _unique_pairs_fn(unique_cols), batch_format="pyarrow"
            ),
            unique_cols,
        )
    names_out, viol_out = [], []
    for n in count_names:
        if n.startswith("_nonnull:"):
            c = n.split(":", 1)[1]
            names_out.append(f"unique:{c}")
            viol_out.append(totals[n] - dcnt[c])
        else:
            names_out.append(n)
            viol_out.append(totals[n])
    t = pa.table(
        {
            "check_name": pa.array(names_out, pa.string()),
            "violations": pa.array(viol_out, pa.int64()),
        }
    )
    return t.sort_by("check_name")
