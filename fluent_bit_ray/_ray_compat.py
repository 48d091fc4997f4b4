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

Installation is LAZY: importing this module (via the package
``__init__``) does NOT import ray.  If ``ray.data.dataset`` is already
loaded the patch applies immediately; otherwise a meta-path hook fires
``apply()`` the moment that module finishes executing.  ``import
fluent_bit_ray`` therefore stays cheap for pure-helper consumers (parser
kernels, WARC byte readers, tests of either) and works with no ray
installed at all.

Before patching, ``apply()`` probes every internal the replacement body
relies on (``RefBundle.schema``, ``ray.data.dataset._block_to_arrow``,
``cached_remote_fn``, ``iter_internal_ref_bundles``); on any mismatch —
an older or newer Ray that moved them — it leaves upstream behavior
untouched rather than installing a method that would raise at call time.
If upstream stops re-fetching the schema (the fix is to read it off the
consumed bundles, as here), this module can simply be deleted.
"""
from __future__ import annotations

import functools
import importlib.abc
import sys

_APPLIED = False
_TARGET_MODULE = "ray.data.dataset"


def apply() -> None:
    """Install the ``to_arrow_refs`` patch once per process.

    No-op (leaving upstream behavior) when ray is absent or its internals
    don't match the pinned 2.49 layout.
    """
    global _APPLIED
    if _APPLIED:
        return
    try:
        import pyarrow  # noqa: F401  (needed by the patched body)
        # import from ray.data.dataset DIRECTLY: when the post-import hook
        # fires, that module is fully executed but the parent ray.data
        # package may still be mid-__init__ (its Dataset attribute unset)
        from ray.data._internal.execution.interfaces.ref_bundle import (
            RefBundle,
        )
        from ray.data._internal.remote_fn import cached_remote_fn  # noqa: F401
        from ray.data.dataset import (  # noqa: F401
            Dataset,
            Schema,
            _block_to_arrow,
        )
        if (
            "schema" not in getattr(RefBundle, "__dataclass_fields__", {})
            or not callable(getattr(Dataset, "iter_internal_ref_bundles", None))
            or not callable(getattr(Dataset, "to_arrow_refs", None))
        ):
            raise ImportError("ray internals moved")
    except (ImportError, AttributeError):
        # ray missing or its internals don't match the pin: keep upstream.
        _APPLIED = True
        return

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


class _LoaderShim(importlib.abc.Loader):
    """Wraps the real loader of ``ray.data.dataset`` to fire ``apply()``
    right after the module body finishes executing."""

    def __init__(self, inner):
        self._inner = inner

    def create_module(self, spec):
        return self._inner.create_module(spec)

    def exec_module(self, module):
        self._inner.exec_module(module)
        _unhook()
        apply()

    def __getattr__(self, name):  # delegate everything else (repr, etc.)
        return getattr(self._inner, name)


class _PostImportHook(importlib.abc.MetaPathFinder):
    """Meta-path finder that delegates spec resolution for
    ``ray.data.dataset`` to the remaining finders and shims its loader."""

    def find_spec(self, fullname, path=None, target=None):
        if fullname != _TARGET_MODULE or _APPLIED:
            return None
        for finder in sys.meta_path:
            if finder is self or not hasattr(finder, "find_spec"):
                continue
            spec = finder.find_spec(fullname, path, target)
            if spec is not None and spec.loader is not None:
                spec.loader = _LoaderShim(spec.loader)
                return spec
        return None


_HOOK = _PostImportHook()


def _unhook() -> None:
    try:
        sys.meta_path.remove(_HOOK)
    except ValueError:
        pass


if _TARGET_MODULE in sys.modules:
    apply()
else:
    sys.meta_path.insert(0, _HOOK)
