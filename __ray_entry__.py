"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in fluent_bit_ray) calls ray.init()/ray.shutdown().

- entry(): flagship weblog pipeline (parse → enrich → route → aggregate)
  over the sf0.001-scale synthesized pages table; returns the per-sink
  flowcounter aggregate (stable schema: sink, lang, host, bucket, records,
  bytes, parse_failures).
- queries(): one entry per implemented operator from SURVEY.md §2 plus the
  training-data ops (dedup/ANN/text); see fluent_bit_ray/pipelines/queries.py.
- oracle_sql(): DuckDB equivalents with matching column names, including
  dynamically-built oracles for the flagship weblog pipeline (the pages
  parquet is synthesized on call so the SQL is runnable in any order).
  Rows-only (no SQL equivalent): minhash_dedup / simhash cluster tables and
  fingerprint — their exact-dup co-cluster invariants ARE oracle-checked
  via minhash_invariant / simhash_invariant, and exact equality vs the
  pure-Python oracle is asserted in pytest.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from fluent_bit_ray.pipelines.weblog import aggregate_only

    return aggregate_only("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from fluent_bit_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from fluent_bit_ray.pipelines.queries import oracle_sql_full

    return oracle_sql_full()
