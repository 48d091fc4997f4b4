"""Dataset profiling + data-quality audit (ops/profile.py).

DuckDB is the semantics oracle: the profile row for each column must
match the per-column UNION ALL aggregate, and each audit check must
match its SQL predicate count — including the shared null conventions
(distinct/unique ignore NULLs; range/enum/ref count NULL as violating).
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

ray = pytest.importorskip("ray")


def _df(n=400, seed=3):
    rng = np.random.RandomState(seed)
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "k": rng.randint(0, 9, n).astype(np.int64),
        "name": rng.choice(["ada", "bob", "cy", None], n),
        "score": rng.rand(n) * 100.0,
        "ts": pd.to_datetime(rng.randint(0, 10**6, n), unit="s"),
    })
    df.loc[df.index % 11 == 0, "k"] = pd.NA
    df["k"] = df["k"].astype("Int64")
    df.loc[df.index % 17 == 0, "score"] = np.nan
    return df


class TestProfileColumns:
    def test_matches_duckdb(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.profile import profile_columns

        df = _df()
        out = profile_columns(
            ray.data.from_pandas(df).repartition(5),
            ["id", "k", "name", "score", "ts"],
        ).to_pandas().set_index("col")
        duckdb.register("t", df)
        for col, kind in [("id", "num"), ("k", "num"), ("name", "str"),
                          ("score", "num"), ("ts", "ts")]:
            mn = f"epoch_us(min({col}))" if kind == "ts" else f"min({col})"
            mx = f"epoch_us(max({col}))" if kind == "ts" else f"max({col})"
            row = duckdb.sql(
                f"SELECT count(*) n, count(*) - count({col}) nl, "
                f"count(DISTINCT {col}) d, {mn} mn, {mx} mx FROM t"
            ).fetchone()
            got = out.loc[col]
            assert got["n_rows"] == row[0]
            assert got["null_cnt"] == row[1]
            assert got["distinct_cnt"] == row[2], col
            if kind == "str":
                assert got["min_str"] == row[3] and got["max_str"] == row[4]
                assert pd.isna(got["min_num"])
            else:
                assert got["min_num"] == pytest.approx(float(row[3]), abs=0)
                assert got["max_num"] == pytest.approx(float(row[4]), abs=0)
                assert got["min_str"] is None or pd.isna(got["min_str"])

    def test_all_null_and_block_invariance(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.profile import profile_columns

        t = pa.table({
            "a": pa.array([None, None, None], pa.string()),
            "b": pa.array([1, 1, 2], pa.int64()),
        })
        one = profile_columns(ray.data.from_arrow(t), ["a", "b"]).to_pandas()
        many = profile_columns(
            ray.data.from_arrow(t).repartition(4), ["a", "b"]
        ).to_pandas()
        pd.testing.assert_frame_equal(one, many)
        a = one.set_index("col").loc["a"]
        assert a["null_cnt"] == 3 and a["distinct_cnt"] == 0
        assert pd.isna(a["min_num"]) and a["min_str"] is None
        b = one.set_index("col").loc["b"]
        assert b["distinct_cnt"] == 2 and b["min_num"] == 1.0


class TestDqAudit:
    def test_matches_duckdb(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.profile import dq_audit

        df = _df()
        valid = pa.array(np.arange(0, 5, dtype=np.int64))
        out = dq_audit(
            ray.data.from_pandas(df).repartition(6),
            null_cols=["k"],
            range_checks={"score": (10.0, 90.0)},
            enum_checks={"name": ["ada", "bob"]},
            unique_cols=["k", "id"],
            ref_checks={"k": valid},
        ).to_pandas().set_index("check_name")["violations"]
        duckdb.register("t", df)

        def one(sql):
            return duckdb.sql(sql).fetchone()[0]

        assert out["null:k"] == one("SELECT count(*) FROM t WHERE k IS NULL")
        assert out["range:score"] == one(
            "SELECT count(*) FROM t WHERE score IS NULL "
            "OR score < 10.0 OR score > 90.0")
        assert out["enum:name"] == one(
            "SELECT count(*) FROM t WHERE name IS NULL "
            "OR name NOT IN ('ada','bob')")
        assert out["ref:k"] == one(
            "SELECT count(*) FROM t WHERE k IS NULL OR k NOT IN "
            "(0,1,2,3,4)")
        assert out["unique:k"] == one(
            "SELECT count(k) - count(DISTINCT k) FROM t")
        assert out["unique:id"] == 0

    def test_clean_table_all_zero(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.profile import dq_audit

        t = pa.table({"v": [1, 2, 3], "s": ["a", "b", "c"]})
        out = dq_audit(
            ray.data.from_arrow(t),
            null_cols=["v"],
            range_checks={"v": (0, 10)},
            enum_checks={"s": ["a", "b", "c"]},
            unique_cols=["v"],
            ref_checks={"v": pa.array([1, 2, 3], pa.int64())},
        ).to_pandas()
        assert (out["violations"] == 0).all()
        assert list(out["check_name"]) == sorted(out["check_name"])
