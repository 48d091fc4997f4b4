"""Targeted compatibility patches for the pinned Ray version (2.49.x).

One patch: ``Dataset.to_arrow_refs()`` re-executes the ENTIRE pipeline a
second time.  Upstream (``ray/data/dataset.py:5834-5848``) first streams
the plan to completion via ``iter_internal_ref_bundles()`` and then calls
``self.schema(fetch_if_missing=True)`` to decide between the zero-copy
Arrow path and a per-block conversion — but on a consumed *streaming*
plan no schema is cached, so ``schema()`` launches a fresh ``limit=1``
execution of the whole DAG.  The limit prunes output rows, not work: the
read task still decompresses a full input block and runs it through every
fused stage (including our idempotent sink writes).

This engine funnels Dataset blocks into raw-task exchanges
(``shuffle.hash_exchange`` / ``hash_reduce``) at ~130 call sites, so every
exchange-based query paid the double execution: measured at sf0.1/32cpu,
0.8 s of the ~5 s flagship run and 1.8 s of the WARC ingest were the
redundant second pass.

The patched method collects the block refs AND the per-bundle schemas in
the SAME streaming pass (``RefBundle.schema`` carries exactly what the
re-executed ``schema()`` would fetch), preserving upstream semantics:

- every bundle's schema is Arrow (this engine's only shape, since every
  producer runs ``batch_format="pyarrow"``): zero-copy block refs;
- any bundle non-Arrow or unknown: the same
  ``cached_remote_fn(_block_to_arrow)`` conversion upstream applies, to
  every block (upstream converts all blocks on one non-Arrow dataset
  schema);
- empty dataset: empty list.

Idempotent; applied on package import.  If upstream stops re-fetching the
schema (the fix is to read it off the consumed bundles, as here), this
module can simply be deleted.
"""
from __future__ import annotations

import functools

_APPLIED = False


def apply() -> None:
    """Install the ``to_arrow_refs`` patch once per process."""
    global _APPLIED
    if _APPLIED:
        return
    import ray

    if not ray.__version__.startswith("2."):
        # Unknown future Ray: keep upstream behavior.
        _APPLIED = True
        return

    from ray.data import Dataset

    original = Dataset.to_arrow_refs

    @functools.wraps(original)
    def to_arrow_refs(self):
        import pyarrow as pa
        from ray.data._internal.remote_fn import cached_remote_fn
        from ray.data.dataset import Schema, _block_to_arrow

        block_refs = []
        all_arrow = True
        for bundle in self.iter_internal_ref_bundles():
            refs = bundle.block_refs
            if not refs:
                continue
            block_refs.extend(refs)
            schema = bundle.schema
            if isinstance(schema, Schema):
                schema = schema.base_schema
            if not isinstance(schema, pa.Schema):
                all_arrow = False
        if all_arrow:
            # Zero-copy path: blocks are already Arrow tables.
            return block_refs
        block_to_arrow = cached_remote_fn(_block_to_arrow)
        return [block_to_arrow.remote(block) for block in block_refs]

    Dataset.to_arrow_refs = to_arrow_refs
    _APPLIED = True


apply()
