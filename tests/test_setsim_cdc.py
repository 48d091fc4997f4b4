"""Tests: covisit (windowed co-occurrence), cdc_upsert, jaccard_join."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


class TestCovisit:
    def test_hand_model(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.stats import covisit

        # user 1: a@0s, a@10s, b@20s, c@5000s -> (a,b) twice, (a,c)/(b,c)
        # out of window; user 2: b@0s, c@30s -> (b,c) once
        us = 1_000_000
        t = pa.table({
            "k": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
            "i": pa.array(["a", "a", "b", "c", "b", "c"]),
            "ts": pa.array([0, 10 * us, 20 * us, 5000 * us, 0, 30 * us],
                           pa.timestamp("us")),
        })
        out = covisit(ray.data.from_arrow(t).repartition(3),
                      "k", "i", "ts", window_us=60 * us).to_pylist()
        rows = {(r["a"], r["b"]): r["n_co"] for r in out}
        assert rows == {("a", "b"): 2, ("b", "c"): 1}

    def test_nulls_never_pair(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.stats import covisit

        t = pa.table({
            "k": pa.array([1, 1, None, 1], pa.int64()),
            "i": pa.array(["a", "b", "a", None]),
            "ts": pa.array([0, 1, 2, 3], pa.timestamp("us")),
        })
        out = covisit(ray.data.from_arrow(t), "k", "i", "ts",
                      window_us=100).to_pylist()
        assert [(r["a"], r["b"], r["n_co"]) for r in out] == [("a", "b", 1)]

    def test_matches_duckdb_randomized(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.stats import covisit

        rng = np.random.RandomState(7)
        n = 2000
        df = pd.DataFrame({
            "k": rng.randint(0, 40, n).astype(np.int64),
            "i": rng.choice(list("abcdef"), n),
            "ts": pd.to_datetime(
                rng.randint(0, 3_600_000, n), unit="ms"),
        })
        df["ts"] = df["ts"].astype("datetime64[us]")
        out = covisit(ray.data.from_pandas(df).repartition(7),
                      "k", "i", "ts", window_us=300_000_000).to_pandas()
        duckdb.register("t", df)
        exp = duckdb.sql(
            "SELECT a.i AS a, b.i AS b, count(*) AS n_co FROM t a JOIN t b "
            "ON a.k = b.k AND a.i < b.i "
            "AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 300000000 "
            "GROUP BY 1, 2 ORDER BY 1, 2").fetchdf()
        assert out[["a", "b"]].values.tolist() == exp[["a", "b"]].values.tolist()
        assert out["n_co"].tolist() == exp["n_co"].tolist()

    def test_min_count(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.stats import covisit

        t = pa.table({
            "k": pa.array([1, 1, 1], pa.int64()),
            "i": pa.array(["a", "b", "c"]),
            "ts": pa.array([0, 1, 2], pa.timestamp("us")),
        })
        out = covisit(ray.data.from_arrow(t), "k", "i", "ts",
                      window_us=100, min_count=2).to_pylist()
        assert out == []  # every pair occurs once


class TestCdcUpsert:
    def _run(self, base_rows, change_rows, ray_session, parts=3):
        import ray.data

        from fluent_bit_ray.ops.joins import cdc_upsert

        base = pa.table({
            "k": pa.array([r[0] for r in base_rows], pa.int64()),
            "v": pa.array([r[1] for r in base_rows], pa.float64()),
        })
        ch = pa.table({
            "k": pa.array([r[0] for r in change_rows], pa.int64()),
            "seq": pa.array([r[1] for r in change_rows], pa.int64()),
            "v": pa.array([r[2] for r in change_rows], pa.float64()),
            "is_del": pa.array([r[3] for r in change_rows], pa.bool_()),
        })
        out = cdc_upsert(
            ray.data.from_arrow(base).repartition(parts),
            ray.data.from_arrow(ch).repartition(parts),
            key_col="k", seq_col="seq", val_col="v", del_col="is_del",
        ).to_pylist()
        return {r["key"]: (r["value"], r["src"]) for r in out}

    def test_merge_semantics(self, ray_session):
        base = [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)]
        changes = [
            (1, 100, 11.0, False),   # update key 1
            (1, 101, 12.0, False),   # later update wins
            (2, 200, 0.0, True),     # delete key 2
            (3, 300, 31.0, False),
            (3, 301, 0.0, True),     # latest is delete -> gone
            (5, 500, 55.0, False),   # insert new key 5
        ]
        got = self._run(base, changes, None)
        assert got == {
            1: (12.0, "changed"),
            4: (40.0, "base"),
            5: (55.0, "changed"),
        }

    def test_delete_then_reinsert(self, ray_session):
        base = [(1, 10.0)]
        changes = [(1, 5, 0.0, True), (1, 6, 99.0, False)]
        got = self._run(base, changes, None)
        assert got == {1: (99.0, "changed")}

    def test_null_keys_and_tombstones_ignored(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.joins import cdc_upsert

        ch = pa.table({
            "k": pa.array([None, 1], pa.int64()),
            "seq": pa.array([1, 2], pa.int64()),
            "v": pa.array([1.0, 2.0], pa.float64()),
            "is_del": pa.array([True, None], pa.bool_()),
        })
        base = pa.table({"k": pa.array([9], pa.int64()),
                         "v": pa.array([9.0], pa.float64())})
        out = cdc_upsert(ray.data.from_arrow(base),
                         ray.data.from_arrow(ch),
                         key_col="k", seq_col="seq", val_col="v",
                         del_col="is_del").to_pylist()
        got = {r["key"]: (r["value"], r["src"]) for r in out}
        # null key dropped; null tombstone means upsert, not delete
        assert got == {1: (2.0, "changed"), 9: (9.0, "base")}

    def test_empty_changes(self, ray_session):
        got = self._run([(1, 1.0)], [], None, parts=1)
        assert got == {1: (1.0, "base")}


class TestOwnerRankChunking:
    def test_chunked_equals_dense(self, monkeypatch):
        # the bounded-chunk owner check must equal the one-shot broadcast
        # for every chunk size, including steps that split the pair list
        # mid-stride and the degenerate step=1
        from fluent_bit_ray.ops import setsim

        rng = np.random.RandomState(7)
        n, pmax = 23, 6
        padded = rng.randint(0, 50, size=(n, pmax)).astype(np.int64)
        # PAD-fill random suffixes like _padded_ranks does
        for i in range(n):
            k = rng.randint(1, pmax + 1)
            padded[i, k:] = setsim._PAD
        ii, jj = np.triu_indices(n, k=1)
        a, b = padded[ii], padded[jj]
        m = a[:, :, None] == b[:, None, :]
        dense = np.where(m, a[:, :, None], setsim._PAD).min(axis=(1, 2))
        for elems in (1, 37, pmax * pmax, 10**9):
            monkeypatch.setattr(setsim, "_OWNER_CHUNK_ELEMS", elems)
            np.testing.assert_array_equal(
                setsim._owner_rank(padded, ii, jj), dense)

    def test_dense_group_end_to_end(self, ray_session):
        # a near-duplicate-dense corpus (every doc similar to every other)
        # under a tiny chunk budget: the owner check runs many chunks and
        # the exactly-once pair emission must survive. The budget goes in
        # as a jaccard_join argument (closure-captured, ships by VALUE to
        # the Ray reduce workers); a monkeypatched module global would be
        # invisible there — workers re-import the module at its default.
        import ray.data

        from fluent_bit_ray.ops import setsim

        base = [f"w{i}" for i in range(20)]
        docs = [" ".join(base[:19] + [f"u{i}"]) for i in range(25)]
        t = pa.table({"doc_id": pa.array(range(25), pa.int64()),
                      "text": pa.array(docs)})
        out = setsim.jaccard_join(
            ray.data.from_arrow(t).repartition(4),
            "doc_id", "text", tau=0.9, _owner_chunk_elems=8).to_pylist()
        # J = 19/21 ~ 0.905 for every pair: all 300 pairs, each once
        pairs = [(r["da"], r["db"]) for r in out]
        assert len(pairs) == len(set(pairs)) == 25 * 24 // 2
        assert all(abs(r["jac"] - 19 / 21) < 1e-12 for r in out)


class TestJaccardJoin:
    def test_hand_model(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.setsim import jaccard_join

        t = pa.table({
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array([
                "a b c d",
                "a b c d",          # exact dup of 0: J=1
                "a b c e",          # J(0,2)=3/5
                "x y z w",          # disjoint
                "",                 # empty: never pairs
            ]),
        })
        out = jaccard_join(ray.data.from_arrow(t).repartition(3),
                           "doc_id", "text", tau=0.6).to_pylist()
        got = {(r["da"], r["db"]): r["jac"] for r in out}
        assert got == {(0, 1): 1.0, (0, 2): pytest.approx(0.6),
                       (1, 2): pytest.approx(0.6)}

    def test_tau_excludes(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.setsim import jaccard_join

        t = pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a b c d", "a b c e"]),
        })
        out = jaccard_join(ray.data.from_arrow(t), "doc_id", "text",
                           tau=0.61).to_pylist()
        assert out == []

    def test_distinct_token_semantics(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.setsim import jaccard_join

        # repeated tokens collapse to the distinct set
        t = pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a a a b", "b a"]),
        })
        out = jaccard_join(ray.data.from_arrow(t), "doc_id", "text",
                           tau=0.99).to_pylist()
        assert [(r["da"], r["db"], r["jac"]) for r in out] == [(0, 1, 1.0)]

    def test_matches_duckdb_randomized(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.setsim import jaccard_join

        rng = np.random.RandomState(13)
        vocab = [f"t{i}" for i in range(12)]
        docs = []
        for i in range(120):
            sz = rng.randint(3, 10)
            docs.append(" ".join(
                rng.choice(vocab, sz, replace=True)))
        df = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64),
                           "text": docs})
        for tau in (0.5, 0.8):
            out = jaccard_join(
                ray.data.from_pandas(df).repartition(9),
                "doc_id", "text", tau=tau).to_pandas()
            duckdb.register("docs", df)
            exp = duckdb.sql(
                "WITH flat AS (SELECT DISTINCT doc_id, "
                "unnest(string_split(text, ' ')) AS w FROM docs), "
                "sizes AS (SELECT doc_id, count(*) AS sz FROM flat "
                "GROUP BY 1), "
                "inter AS (SELECT a.doc_id da, b.doc_id db, count(*) i "
                "FROM flat a JOIN flat b ON a.w = b.w "
                "AND a.doc_id < b.doc_id GROUP BY 1, 2) "
                "SELECT da, db, i*1.0/(sa.sz+sb.sz-i) AS jac FROM inter "
                "JOIN sizes sa ON sa.doc_id=da "
                "JOIN sizes sb ON sb.doc_id=db "
                f"WHERE i*1.0/(sa.sz+sb.sz-i) >= {tau} "
                "ORDER BY da, db").fetchdf()
            assert out[["da", "db"]].values.tolist() == \
                exp[["da", "db"]].values.tolist()
            np.testing.assert_allclose(out["jac"].to_numpy(),
                                       exp["jac"].to_numpy())

    def test_bad_tau(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.setsim import jaccard_join

        with pytest.raises(ValueError):
            jaccard_join(ray.data.from_items([{"doc_id": 1, "text": "a"}]),
                         "doc_id", "text", tau=0.0)
