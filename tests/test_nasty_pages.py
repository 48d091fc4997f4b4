"""Adversarial PAGES corpus gate (tools/nasty_corpus.build_pages).

The documents/events nasty gate (round-4 session 3) caught null-key
mis-sharding and span-offset desyncs; this is the same discipline applied
to the FLAGSHIP input — the north rule's Common-Crawl-style pages table.
The corpus injects NULL url/warc_ts/html/text/lang, empty and
whitespace-only text, invalid-UTF-8 html, html without <body>, json
arrays, truncated lines, embedded newlines, duplicate urls and timestamp
extremes into clean synthetic rows, then requires:

  1. per-sink aggregate equality vs the pure-Python reference oracle
  2. routed-row MULTISET equality + byte-identical extracted text per
     row (duplicate urls and a NULL url make a url-keyed dict unsound —
     the comparison here is Counter-based, unlike test_pipeline_e2e)
  3. DuckDB SQL-twin parity for the flagship aggregate
  4. the FBR_PAGES_OVERRIDE hook both gates rely on

The full-scale sweep version of this gate is documented in
.claude/skills/verify/SKILL.md (FBR_PAGES_OVERRIDE=/tmp/nasty_pages).
"""

import glob
import os
from collections import Counter

import pyarrow.parquet as pq
import pytest

from fluent_bit_ray.oracle.weblog import run_oracle
from fluent_bit_ray.pipelines.weblog import (
    AGG_KEYS,
    AGG_VALS,
    DEFAULT_SINKS,
    aggregate_only,
    run_weblog,
)

N_CLEAN = 200  # + 28 adversarial rows interleaved


@pytest.fixture(scope="module")
def nasty_dir(tmp_path_factory):
    from tools.nasty_corpus import build_pages

    return build_pages(str(tmp_path_factory.mktemp("nasty_pages")),
                       n_clean=N_CLEAN)


@pytest.fixture(scope="module")
def oracle(nasty_dir):
    return run_oracle(nasty_dir, DEFAULT_SINKS)


def agg_to_dict(tbl):
    return {
        (r["sink"], r["lang"], r["host"], r["bucket"]):
            [r["records"], r["bytes"], r["parse_failures"]]
        for r in tbl.to_pylist()
    }


def test_pages_override_hook(monkeypatch, tmp_path):
    from fluent_bit_ray.synth import pages_path

    monkeypatch.setenv("FBR_PAGES_OVERRIDE", str(tmp_path))
    assert pages_path(999_999_999) == str(tmp_path)
    monkeypatch.delenv("FBR_PAGES_OVERRIDE")
    assert pages_path(1200, partitions=8) != str(tmp_path)


@pytest.mark.usefixtures("ray_session")
class TestNastyPages:
    def test_aggregate_matches_pure_oracle(self, nasty_dir, oracle):
        got = agg_to_dict(aggregate_only(nasty_dir))
        assert got == oracle["agg"]

    def test_routed_rows_and_byte_identity(self, nasty_dir, oracle,
                                           tmp_path_factory):
        out_dir = str(tmp_path_factory.mktemp("nasty_out"))
        res = run_weblog(nasty_dir, out_dir, wave_size=4, resume=False)
        assert agg_to_dict(res["aggregate"]) == oracle["agg"]
        got = Counter()
        for f in glob.glob(os.path.join(out_dir, "sink_all", "*.parquet")):
            t = pq.read_table(f, columns=["url", "extracted_text"])
            got.update(
                (r["url"], r["extracted_text"]) for r in t.to_pylist())
        assert got == Counter(oracle["routed"]["sink_all"])

    def test_duckdb_twin_parity(self, nasty_dir):
        import duckdb

        from fluent_bit_ray.oracle.weblog_sql import weblog_aggregate_sql

        sql = weblog_aggregate_sql(nasty_dir + "/*.parquet")
        want = duckdb.sql(sql).fetchdf()
        got = aggregate_only(nasty_dir).to_pandas()
        key = AGG_KEYS
        want = want.sort_values(key).reset_index(drop=True)[key + AGG_VALS]
        got = got.sort_values(key).reset_index(drop=True)[key + AGG_VALS]
        assert len(got) == len(want)
        # null-safe frame equality (NaN==NaN) across keys and counters
        assert got.equals(want.astype(got.dtypes.to_dict()))
