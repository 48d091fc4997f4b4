"""fluent_bit_ray — a Ray-Data-native log/telemetry processing engine.

A from-scratch reimplementation of the data-processing capabilities of the
fluent-bit reference (parse → filter/enrich → route → aggregate) expressed as
`ray.data.Dataset` pipelines: `map_batches` over zero-copy Arrow batches for
per-record transforms, actor pools for stateful enrichment, and
groupby/aggregate for the wide steps.

Layout:
- functions/  pure scalar kernels (JSON escape/unescape, time parsing, typecast)
- parsers/    regex / json / ltsv parsers + field decoders + registry
- stages/     the filter chain (grep, record_modifier, modify, nest, parser,
              throttle, enrich) as vectorized Batch→Batch callables
- router.py   tag Match routing (fluent-bit `flb_router_match` semantics)
- sinks/      partitioned parquet/json/csv/ltsv writers + counter/flowcounter
- pipelines/  end-to-end pipeline builders (weblog flagship)
- state/      per-partition lineage/checkpoint + resume
- oracle/     pure-Python row-at-a-time reference semantics (test oracle)
- ops/        large-scale training-data ops (dedup, ANN, text analysis)
- synth.py    deterministic Common-Crawl-style pages table generator
"""

__version__ = "0.1.0"

# Ray 2.49 workaround: Dataset.to_arrow_refs() re-executes the whole plan
# for a schema fetch; the shim reads schemas off the consumed bundles
# instead (see _ray_compat docstring). Importing the module arms a LAZY
# post-import hook — the patch lands the moment ray.data.dataset finishes
# importing (immediately if it already has), and `import fluent_bit_ray`
# itself never pulls in ray.
from . import _ray_compat as _ray_compat  # noqa: E402,F401
