"""End-to-end flagship pipeline tests vs the pure-Python oracle.

Covers the north-rule gates at tiny scale: per-sink aggregate equality,
routed-row equality, byte-identical extracted text per url, and
kill-and-resume from per-partition lineage (FIXTURES.md F4-F6).
"""

import glob
import json
import os
import shutil

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from fluent_bit_ray.oracle.weblog import run_oracle
from fluent_bit_ray.pipelines.weblog import (
    AGG_KEYS,
    AGG_VALS,
    DEFAULT_SINKS,
    aggregate_only,
    final_aggregate,
    run_weblog,
)
from fluent_bit_ray.state import checkpoint as ckpt
from fluent_bit_ray.synth import pages_path

N_ROWS = 1200
PARTS = 8


@pytest.fixture(scope="module")
def pages_dir():
    return pages_path(N_ROWS, partitions=PARTS)


@pytest.fixture(scope="module")
def oracle(pages_dir):
    return run_oracle(pages_dir, DEFAULT_SINKS)


def agg_to_dict(tbl):
    out = {}
    for r in tbl.to_pylist():
        out[(r["sink"], r["lang"], r["host"], r["bucket"])] = [
            r["records"], r["bytes"], r["parse_failures"]
        ]
    return out


@pytest.mark.usefixtures("ray_session")
class TestFlagship:
    def test_aggregate_only_matches_oracle(self, pages_dir, oracle):
        got = agg_to_dict(aggregate_only(pages_dir))
        assert got == oracle["agg"]

    def test_full_run_with_sinks(self, pages_dir, oracle, tmp_path_factory):
        out_dir = str(tmp_path_factory.mktemp("weblog_out"))
        res = run_weblog(pages_dir, out_dir, wave_size=3, resume=False)
        assert res["partitions_processed"] == PARTS

        # (1) final aggregate equality
        assert agg_to_dict(res["aggregate"]) == oracle["agg"]

        # (2) routed-row + byte-identical extracted text, parquet sink
        files = glob.glob(os.path.join(out_dir, "sink_all", "*.parquet"))
        got = {}
        total_rows = 0
        for f in files:
            t = pq.read_table(f, columns=["url", "extracted_text"])
            total_rows += t.num_rows
            for r in t.to_pylist():
                got[r["url"]] = r["extracted_text"]
        expect = dict(oracle["routed"]["sink_all"])
        assert got == expect  # same urls AND byte-identical text
        # row COUNT equality too: re-executed tasks must not duplicate writes
        assert total_rows == len(oracle["routed"]["sink_all"])

        # (3) csv error sink routed-row equality
        import csv

        err_urls = set()
        for f in glob.glob(os.path.join(out_dir, "sink_errors", "*.csv")):
            with open(f, newline="") as fh:
                for row in csv.reader(fh):  # handles quoted embedded newlines
                    err_urls.add(row[1])
        assert err_urls == {u for u, _ in oracle["routed"]["sink_errors"]}

        # (4) json sink line shape: 'tag: [time, {...}]'
        jf = glob.glob(os.path.join(out_dir, "sink_intl", "*.jsonl"))
        assert jf
        with open(jf[0]) as fh:
            line = fh.readline()
        assert line.startswith("web.") and ": [" in line

        # (5) lineage records committed per partition
        lineage = ckpt.read_lineage(out_dir)
        assert len(lineage) == PARTS
        assert all(l["status"] == "done" for l in lineage)
        total = sum(l["metrics"]["sink_all"]["records"] for l in lineage)
        assert total == len(oracle["routed"]["sink_all"])

    def test_kill_and_resume(self, pages_dir, oracle, tmp_path_factory):
        out_dir = str(tmp_path_factory.mktemp("weblog_resume"))
        # "kill" after 1 wave of 3 partitions
        res1 = run_weblog(pages_dir, out_dir, wave_size=3, resume=False, max_waves=1)
        assert res1["partitions_processed"] == 3
        done_before = {l["partition"] for l in ckpt.read_lineage(out_dir)}
        assert len(done_before) == 3

        # resume: completed partitions skipped, rest processed
        res2 = run_weblog(pages_dir, out_dir, wave_size=3, resume=True)
        assert res2["partitions_skipped"] == 3
        assert res2["partitions_processed"] == PARTS - 3

        # final state identical to an uninterrupted run
        assert agg_to_dict(res2["aggregate"]) == oracle["agg"]
        got_urls = set()
        for f in glob.glob(os.path.join(out_dir, "sink_all", "*.parquet")):
            got_urls.update(pq.read_table(f, columns=["url"])["url"].to_pylist())
        assert got_urls == {u for u, _ in oracle["routed"]["sink_all"]}

    def test_resume_cleans_uncommitted_wave(self, pages_dir, tmp_path_factory):
        out_dir = str(tmp_path_factory.mktemp("weblog_dirty"))
        run_weblog(pages_dir, out_dir, wave_size=4, resume=False, max_waves=1)
        # simulate a crash mid-wave-2: stale sink partial + uncommitted agg dir
        stale = os.path.join(out_dir, "sink_all", "pages_00007__deadbeef.parquet")
        shutil.copy(glob.glob(os.path.join(out_dir, "sink_all", "*.parquet"))[0], stale)
        dirty_wave = os.path.join(ckpt.agg_dir(out_dir), "wave_deadbeef")
        os.makedirs(dirty_wave)
        with open(os.path.join(dirty_wave, "junk.parquet"), "w") as f:
            f.write("not parquet")
        res = run_weblog(pages_dir, out_dir, wave_size=4, resume=True)
        assert not os.path.exists(stale)
        assert not os.path.exists(dirty_wave)
        assert res["partitions_processed"] == 4


@pytest.mark.usefixtures("ray_session")
class TestFromHtml:
    def test_html_path_matches_text_path_byte_identically(self, pages_dir):
        """North-star invariant: parsing from the raw html binary column
        yields the same aggregates (and therefore the same extracted text /
        routed rows) as the pre-extracted text column."""
        import glob as g
        import ray

        from fluent_bit_ray.pipelines.weblog import (
            build_wave_dataset,
            combine_partial_rows,
            default_lookup,
        )

        files = sorted(g.glob(os.path.join(pages_dir, "*.parquet")))
        ref = ray.put(default_lookup())
        a = combine_partial_rows(
            build_wave_dataset(files, ref, DEFAULT_SINKS, None),
            AGG_KEYS, AGG_VALS,
        )
        b = combine_partial_rows(
            build_wave_dataset(files, ref, DEFAULT_SINKS, None, from_html=True),
            AGG_KEYS, AGG_VALS,
        )
        assert agg_to_dict(a) == agg_to_dict(b)
