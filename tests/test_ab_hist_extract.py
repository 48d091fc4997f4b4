"""Tests: ab_ztest, equidepth_histogram, extract_all."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


class TestAbZtest:
    def test_hand_model(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.stats import ab_ztest

        t = pa.table({
            "k": pa.array(["d1"] * 6 + ["d2"] * 2),
            "variant": pa.array(["t", "t", "t", "c", "c", "c", "t", "c"]),
            "v": pa.array([10.0, 12.0, 14.0, 1.0, 2.0, 3.0, 5.0, 5.0]),
        })
        out = ab_ztest(ray.data.from_arrow(t).repartition(3),
                       "k", "variant", "v", treat="t",
                       control="c").to_pylist()
        rows = {r["key"]: r for r in out}
        # d1: mt=12, mc=2, vt=4, vc=1 -> z = 10/sqrt(4/3+1/3) = 10/sqrt(5/3)
        assert rows["d1"]["n_t"] == 3 and rows["d1"]["n_c"] == 3
        assert rows["d1"]["z"] == pytest.approx(10 / np.sqrt(5 / 3))
        # d2: n=1 each -> var_samp NULL -> z NULL
        assert rows["d2"]["z"] is None
        assert rows["d2"]["mean_t"] == 5.0

    def test_key_needs_both_variants(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.stats import ab_ztest

        t = pa.table({
            "k": pa.array(["only_t", "only_t"]),
            "variant": pa.array(["t", "t"]),
            "v": pa.array([1.0, 2.0]),
        })
        out = ab_ztest(ray.data.from_arrow(t), "k", "variant", "v",
                       "t", "c").to_pylist()
        assert out == []

    def test_nulls_and_other_variants_excluded(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.stats import ab_ztest

        t = pa.table({
            "k": pa.array(["d"] * 6),
            "variant": pa.array(["t", "t", "c", "c", "x", "t"]),
            "v": pa.array([1.0, 3.0, 2.0, 4.0, 100.0, None]),
        })
        out = ab_ztest(ray.data.from_arrow(t), "k", "variant", "v",
                       "t", "c").to_pylist()
        assert out[0]["n_t"] == 2 and out[0]["n_c"] == 2
        assert out[0]["mean_t"] == 2.0 and out[0]["mean_c"] == 3.0

    def test_matches_duckdb_randomized(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.stats import ab_ztest

        rng = np.random.RandomState(11)
        n = 3000
        df = pd.DataFrame({
            "k": rng.choice([f"d{i}" for i in range(8)], n),
            "variant": rng.choice(["t", "c", "other"], n),
            "v": rng.normal(50, 10, n).round(3),
        })
        out = ab_ztest(ray.data.from_pandas(df).repartition(6),
                       "k", "variant", "v", "t", "c").to_pandas()
        duckdb.register("t", df)
        exp = duckdb.sql(
            "WITH s AS (SELECT k, variant, count(v) n, avg(v) m, "
            "var_samp(v) vv FROM t WHERE variant IN ('t','c') "
            "GROUP BY 1,2) "
            "SELECT a.k AS key, a.n n_t, b.n n_c, a.m mean_t, b.m mean_c, "
            "(a.m - b.m)/sqrt(a.vv/a.n + b.vv/b.n) AS z "
            "FROM s a JOIN s b ON a.k=b.k AND a.variant='t' "
            "AND b.variant='c' ORDER BY key").fetchdf()
        assert out["key"].tolist() == exp["key"].tolist()
        np.testing.assert_allclose(out["z"].to_numpy(),
                                   exp["z"].to_numpy(), rtol=1e-9)
        np.testing.assert_allclose(out["mean_t"].to_numpy(),
                                   exp["mean_t"].to_numpy())


class TestEquidepthHistogram:
    def test_uniform_quarters(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.stats import equidepth_histogram

        df = pd.DataFrame({"v": np.arange(1000, dtype=np.float64)})
        out = equidepth_histogram(
            ray.data.from_pandas(df).repartition(5), "v", k=4,
            bins=16, band_limit=100).to_pylist()
        assert [r["cnt"] for r in out] == [250, 250, 250, 250]

    def test_matches_duckdb(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.stats import equidepth_histogram

        rng = np.random.RandomState(3)
        df = pd.DataFrame(
            {"v": np.r_[rng.exponential(100, 4000).round(2),
                        [np.nan] * 50]})
        out = equidepth_histogram(
            ray.data.from_pandas(df).repartition(7), "v", k=4,
            bins=16, band_limit=200).to_pandas()
        duckdb.register("t", df)
        exp = duckdb.sql(
            "WITH q AS (SELECT quantile_cont(v,0.25) e1, "
            "quantile_cont(v,0.5) e2, quantile_cont(v,0.75) e3 FROM t) "
            "SELECT CASE WHEN v < q.e1 THEN 0 WHEN v < q.e2 THEN 1 "
            "WHEN v < q.e3 THEN 2 ELSE 3 END AS bin, count(*) cnt "
            "FROM t, q WHERE v IS NOT NULL GROUP BY 1 "
            "ORDER BY 1").fetchdf()
        assert out["bin"].tolist() == exp["bin"].tolist()
        assert out["cnt"].tolist() == exp["cnt"].tolist()

    def test_all_null(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.stats import equidepth_histogram

        t = pa.table({"v": pa.array([None, None], pa.float64())})
        out = equidepth_histogram(ray.data.from_arrow(t), "v", k=4)
        assert out.num_rows == 0


class TestExtractAll:
    def test_hand_golden(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.text import extract_all

        t = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["alpha beta12beta gamma",
                              "nomatch",
                              None,
                              "xx abcdef xx abcdef"]),
        })
        out = extract_all(ray.data.from_arrow(t).repartition(2),
                          "doc_id", "text", r"[a-z]{5,}").take_all()
        got = sorted((r["doc_id"], r["m"]) for r in out)
        assert got == [(1, "alpha"), (1, "gamma"),
                       (2, "nomatch"),
                       (4, "abcdef"), (4, "abcdef")]

    def test_capture_group_rejected(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.text import extract_all

        with pytest.raises(ValueError):
            extract_all(ray.data.from_items([{"doc_id": 1, "text": "x"}]),
                        "doc_id", "text", r"(a)b")

    def test_matches_duckdb(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.text import extract_all

        df = pd.DataFrame({
            "doc_id": np.arange(6, dtype=np.int64),
            "text": ["The Quick brown foxes JUMPED over",
                     "lazy dogs and cats", "", "aaaaa bbbbbb",
                     "middle middle middle", "short a b c"],
        })
        out = extract_all(ray.data.from_pandas(df).repartition(3),
                          "doc_id", "text", r"[A-Za-z]{5,}").take_all()
        got = sorted((r["doc_id"], r["m"]) for r in out)
        duckdb.register("docs", df)
        exp = duckdb.sql(
            "SELECT doc_id, unnest(regexp_extract_all(text, "
            "'[A-Za-z]{5,}')) AS m FROM docs").fetchall()
        assert got == sorted(exp)
