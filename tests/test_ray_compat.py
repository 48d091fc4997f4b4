"""_ray_compat: to_arrow_refs must not re-execute the pipeline.

Upstream Ray 2.49's Dataset.to_arrow_refs() ends with a
schema(fetch_if_missing=True) that launches a second, limit-1 execution
of the whole plan (see fluent_bit_ray/_ray_compat.py).  These tests pin
the patched behavior: exactly one execution, identical results, and the
non-Arrow conversion fallback preserved.
"""
import pyarrow as pa
import pytest

import fluent_bit_ray  # noqa: F401  — applies the _ray_compat patch


def _task_counter(ray):
    @ray.remote
    class Counter:
        def __init__(self):
            self.n = 0

        def incr(self):
            self.n += 1

        def get(self):
            return self.n

    return Counter.remote()


def test_to_arrow_refs_single_execution(ray_session):
    import ray

    counter = _task_counter(ray)
    n_blocks = 4

    def bump(batch: pa.Table) -> pa.Table:
        ray.get(counter.incr.remote())
        return batch

    ds = ray.data.range(4000, override_num_blocks=n_blocks).map_batches(
        bump, batch_format="pyarrow", batch_size=None
    )
    refs = ds.to_arrow_refs()
    tables = ray.get(refs)
    total = sum(t.num_rows for t in tables)
    assert total == 4000
    assert all(isinstance(t, pa.Table) for t in tables)
    # one invocation per block and NOT ONE MORE: the unpatched method's
    # trailing schema fetch re-runs the plan with limit=1, which would
    # add at least one extra bump() call here
    assert ray.get(counter.get.remote()) == n_blocks


def test_to_arrow_refs_non_arrow_blocks_convert(ray_session):
    import pandas as pd

    import ray

    def to_pandas(batch):
        return pd.DataFrame({"x": batch["id"]})

    ds = ray.data.range(100, override_num_blocks=2).map_batches(
        to_pandas, batch_format="pandas"
    )
    refs = ds.to_arrow_refs()
    tables = ray.get(refs)
    assert all(isinstance(t, pa.Table) for t in tables)
    assert sum(t.num_rows for t in tables) == 100


def test_to_arrow_refs_empty_dataset(ray_session):
    import ray

    ds = ray.data.range(100).filter(lambda r: False)
    refs = ds.to_arrow_refs()
    tables = ray.get(refs)
    assert sum(t.num_rows for t in tables) == 0


def test_patch_is_applied_and_idempotent():
    import ray.data

    from fluent_bit_ray import _ray_compat

    assert _ray_compat._APPLIED
    fn_before = ray.data.Dataset.to_arrow_refs
    _ray_compat.apply()
    assert ray.data.Dataset.to_arrow_refs is fn_before


def test_package_import_is_lazy():
    # `import fluent_bit_ray` must not pull in ray: pure-helper consumers
    # (parser kernels, WARC byte readers) shouldn't pay the ray.data
    # import, and the package must import with no ray installed at all
    import subprocess
    import sys

    code = (
        "import sys\n"
        "import fluent_bit_ray\n"
        "assert 'ray' not in sys.modules, 'package import pulled in ray'\n"
        "import ray.data\n"
        "from fluent_bit_ray import _ray_compat\n"
        "assert _ray_compat._APPLIED\n"
        "f = ray.data.Dataset.to_arrow_refs\n"
        "assert '_ray_compat' in f.__code__.co_filename\n"
        "assert _ray_compat._HOOK not in sys.meta_path\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True)


def test_patch_applies_when_ray_data_imported_first():
    import subprocess
    import sys

    code = (
        "import ray.data\n"
        "import fluent_bit_ray\n"
        "f = ray.data.Dataset.to_arrow_refs\n"
        "assert '_ray_compat' in f.__code__.co_filename\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True)
