"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in fluent_bit_ray) calls ray.init()/ray.shutdown().

- entry(): flagship weblog pipeline (parse → enrich → route → aggregate)
  over the sf0.001-scale synthesized pages table; returns the per-sink
  flowcounter aggregate (stable schema: sink, lang, host, bucket, records,
  bytes, parse_failures).
- queries(): one entry per implemented operator from SURVEY.md §2 plus the
  training-data ops (dedup/ANN/text); see fluent_bit_ray/pipelines/queries.py.
- oracle_sql(): DuckDB equivalents with matching column names; ops without
  an entry get the driver's rows-only check (their exact equality is
  asserted in pytest against the pure-Python oracle instead).
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
