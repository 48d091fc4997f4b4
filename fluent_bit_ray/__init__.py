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
