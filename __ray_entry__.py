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
  EVERY queries() entry has an oracle (r5): the minhash/simhash/
  fingerprint/semdedup primaries are canonical exact-dup co-cluster
  projections (group_size / distinct_reps / cocluster_pairs per
  exact-duplicate group) whose expected values the SQL derives from the
  data; their raw cluster tables stay pinned by pytest.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from fluent_bit_ray.pipelines.weblog import aggregate_only

    return aggregate_only("/root/testdata/sf0.001")


def _gc_guard(fn: Callable[[str], Any]) -> Callable[[str], Any]:
    """Collect dead Dataset/ObjectRef state BEFORE the next query submits tasks.

    Long many-query sessions (100+ queries, ~600 Dataset executions) can hit a
    nondeterministic Ray 2.49 core race (reference_count.cc:581 "Check failed:
    submitted_task_ref_count > 0", raised from OnTaskDependenciesInlined) when
    Python GC frees a prior query's ObjectRefs concurrently with a new task
    submission that inlines small dependencies. Forcing collection at query
    entry — while no submission is in flight — removes the concurrent-free
    window. Observed twice at sf0.01 around query ~110 of 144; harmless
    otherwise (a few ms per query).
    """

    def run(sf_dir: str) -> Any:
        import gc

        gc.collect()
        return fn(sf_dir)

    run.__name__ = getattr(fn, "__name__", "query")
    run.__doc__ = fn.__doc__
    return run


def queries() -> dict[str, Callable[[str], Any]]:
    from fluent_bit_ray.pipelines.queries import QUERIES

    return {name: _gc_guard(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from fluent_bit_ray.pipelines.queries import oracle_sql_full

    return oracle_sql_full()
