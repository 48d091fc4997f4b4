"""sinks/compact.py: bin planning goldens + end-to-end merge/resume."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fluent_bit_ray.sinks.compact import (
    DEFAULT_TARGET_BYTES,
    compact_parquet_dir,
    plan_bins,
)


class TestPlanBins:
    def test_next_fit_in_sorted_order(self):
        files = [("c", 40), ("a", 40), ("b", 40), ("d", 30)]
        bins, through = plan_bins(files, target_bytes=100)
        assert bins == [["a", "b"], ["c", "d"]]
        assert through == []

    def test_oversize_files_pass_through(self):
        bins, through = plan_bins(
            [("big", 500), ("s1", 10), ("s2", 10)], target_bytes=100
        )
        assert bins == [["s1", "s2"]]
        assert through == ["big"]

    def test_single_tiny_file_still_binned(self):
        bins, through = plan_bins([("only", 5)], target_bytes=100)
        assert bins == [["only"]] and through == []

    def test_empty(self):
        assert plan_bins([], DEFAULT_TARGET_BYTES) == ([], [])


@pytest.mark.usefixtures("ray_session")
class TestCompactEndToEnd:
    def _fragment(self, d, n_files=10, rows_per=50):
        os.makedirs(d, exist_ok=True)
        for i in range(n_files):
            t = pa.table(
                {
                    "k": pa.array(
                        range(i * rows_per, (i + 1) * rows_per), pa.int64()
                    )
                }
            )
            pq.write_table(t, os.path.join(d, f"p_{i:03d}.parquet"))

    def test_rows_preserved_and_files_reduced(self, tmp_path):
        src = str(tmp_path / "src")
        out = str(tmp_path / "out")
        self._fragment(src)
        stats = compact_parquet_dir(src, out, target_bytes=8 << 10)
        assert stats["rows"] == 500
        n_out = len(os.listdir(out))
        assert 0 < n_out < 10
        assert stats["files_out"] == n_out
        merged = pq.read_table(out)
        assert sorted(merged["k"].to_pylist()) == list(range(500))

    def test_rerun_skips_finished_bins(self, tmp_path):
        src = str(tmp_path / "src")
        out = str(tmp_path / "out")
        self._fragment(src, n_files=4)
        first = compact_parquet_dir(src, out, target_bytes=8 << 10)
        second = compact_parquet_dir(src, out, target_bytes=8 << 10)
        assert first["bins_written"] > 0
        assert second["bins_written"] == 0
        assert second["bins_skipped"] == first["bins_written"]

    def test_source_untouched(self, tmp_path):
        src = str(tmp_path / "src")
        self._fragment(src, n_files=3)
        before = sorted(os.listdir(src))
        compact_parquet_dir(src, str(tmp_path / "out"), target_bytes=8 << 10)
        assert sorted(os.listdir(src)) == before

    def test_same_basename_across_subdirs_no_collision(self, tmp_path):
        # partition subdirs repeat file names; the bin token must key on
        # the src-relative path or one bin's output overwrites another's
        src = str(tmp_path / "src")
        for part in ("p1", "p2"):
            d = os.path.join(src, part)
            os.makedirs(d)
            t = pa.table({"part": pa.array([part] * 10, pa.string())})
            pq.write_table(t, os.path.join(d, "data.parquet"))
        out = str(tmp_path / "out")
        # target sized so each file is its own WRITTEN bin (one fits,
        # two don't) — identical basename+size across both bins
        sz = os.path.getsize(os.path.join(src, "p1", "data.parquet"))
        stats = compact_parquet_dir(src, out, target_bytes=sz + 1)
        assert stats["rows"] == 20
        merged = pq.read_table(out)
        assert sorted(merged["part"].to_pylist()) == ["p1"] * 10 + ["p2"] * 10


class TestPlanBinsProperties:
    """Hypothesis invariants: planning never loses, duplicates, or
    over-fills (multi-file bins stay under target; singletons exempt)."""

    def test_conservation_and_bounds(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=200, deadline=None)
        @given(
            sizes=st.lists(st.integers(min_value=0, max_value=10**9),
                           max_size=40),
            target=st.integers(min_value=1, max_value=10**9),
        )
        def prop(sizes, target):
            files = [(f"f{i:03d}", s) for i, s in enumerate(sizes)]
            bins, through = plan_bins(files, target)
            flat = [m for b in bins for m in b] + through
            assert sorted(flat) == sorted(p for p, _ in files)  # exact cover
            assert all(b for b in bins)  # no empty bins
            by = dict(files)
            for b in bins:
                if len(b) > 1:
                    assert sum(by[m] for m in b) <= target
                assert all(by[m] < target for m in b)  # big files pass thru
            assert all(by[p] >= target for p in through)

        prop()
