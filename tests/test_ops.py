"""Training-data ops tests: dedup family, ANN, text analysis."""

import numpy as np
import pyarrow as pa
import pytest

from fluent_bit_ray.ops import ann, dedup
from fluent_bit_ray.ops.text import (
    bpe_ish_token_count,
    fingerprint_batch,
    lang_id_batch,
    quality_score_batch,
    repetition_stats_batch,
    token_count_batch,
)


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again and again"),
    (1, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat again and again"),  # near dup
    (3, "completely different content about ray data pipelines at scale"),
    (4, "der schnelle braune fuchs springt und ist nicht mude heute"),
]


def docs_ds():
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
                "text": pa.array([t for _, t in DOCS], pa.string()),
            }
        )
    )


def rows(result):
    """Dataset or pyarrow Table -> list of row dicts."""
    import pyarrow as _pa

    if isinstance(result, _pa.Table):
        return result.to_pylist()
    return result.take_all()


@pytest.mark.usefixtures("ray_session")
class TestDedup:
    def test_exact(self):
        out = {r["doc_id"]: r["text"] for r in rows(dedup.exact_dedup(docs_ds()))}
        assert set(out) == {0, 2, 3, 4}  # doc 1 deduped into 0 (min id kept)

    def test_minhash_clusters_near_dups(self):
        # near-dup pair 0/2 has 3-gram jaccard ~0.54: use 32 bands x 2 rows
        # (threshold ~ (1/32)^(1/2) ~ 0.18) so the pair reliably buckets
        reps = {r["doc_id"]: r["rep_id"] for r in rows(dedup.minhash_lsh_dedup(
            docs_ds(), shingle_k=3, bands=32))}
        assert reps[1] == 0  # exact dup shares every band
        assert reps[0] == 0 and reps[3] == 3
        assert reps[2] == 0  # near dup clustered

    def test_simhash_exact_match(self):
        rows_list = rows(dedup.simhash_dedup(docs_ds()))
        sims = {r["doc_id"]: r["simhash"] for r in rows_list}
        reps = {r["doc_id"]: r["rep_id"] for r in rows_list}
        assert sims[0] == sims[1] and reps[1] == 0
        assert sims[0] != sims[3]

    def test_ngram_jaccard(self):
        assert dedup.ngram_jaccard(DOCS[0][1], DOCS[1][1]) == 1.0
        j = dedup.ngram_jaccard(DOCS[0][1], DOCS[2][1], n=3)
        assert 0.3 < j < 1.0
        assert dedup.ngram_jaccard(DOCS[0][1], DOCS[3][1], n=3) == 0.0


@pytest.mark.usefixtures("ray_session")
class TestAnn:
    def test_brute_force_matches_numpy(self):
        import ray.data

        rng = np.random.RandomState(7)
        mat = rng.randn(50, 16).astype(np.float32)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(50), pa.int64()),
                    "embedding": pa.array(mat.tolist(), pa.list_(pa.float32())),
                }
            )
        )
        q = ann.make_query_ref(np.array([0, 1]), mat[:2])
        got = dedup_rows = ann.brute_force_topk(ds, q, k=3).take_all()
        # numpy reference
        m = mat.astype(np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        for qid in (0, 1):
            sims = m @ m[qid]
            order = [i for i in np.lexsort((np.arange(50), -sims)) if i != qid][:3]
            mine = [r["vec_id"] for r in got if r["query_id"] == qid]
            assert mine == order

    def test_ivf_recall(self):
        import ray.data

        rng = np.random.RandomState(11)
        mat = rng.randn(200, 8).astype(np.float32)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(200), pa.int64()),
                    "embedding": pa.array(mat.tolist(), pa.list_(pa.float32())),
                }
            )
        )
        cents = ann.ivf_build_centroids(ds, 8)
        q = ann.make_query_ref(np.array([5]), mat[5:6])
        exact = [r["vec_id"] for r in ann.brute_force_topk(ds, q, k=5).take_all()]
        approx = [r["vec_id"] for r in ann.ivf_topk(ds, q, cents, k=5, n_probe=4).take_all()]
        # probing half the buckets should recover most true neighbors
        assert len(set(exact) & set(approx)) >= 3


class TestText:
    BATCH = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["the quick brown fox", "  a  b  "], pa.string()),
        }
    )

    def test_token_count(self):
        out = token_count_batch(self.BATCH)
        assert out["n_tokens"].to_pylist() == [4, 2]
        assert out["n_bytes"].to_pylist() == [19, 8]

    def test_quality(self):
        out = quality_score_batch(self.BATCH)
        r = out.to_pylist()[0]
        assert r["n_chars"] == 19
        assert r["stopword_ratio"] == 0.25  # "the"
        assert r["mean_token_len"] == 4.0

    def test_lang_id(self):
        t = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(
                    ["the cat and the dog in a house", "der hund und die katze ist nicht da"],
                    pa.string(),
                ),
            }
        )
        out = lang_id_batch(t)
        assert out["lang_pred"].to_pylist() == ["en", "de"]

    def test_fingerprint_deterministic_and_shift_invariant(self):
        t1 = pa.table({"doc_id": pa.array([0], pa.int64()),
                       "text": pa.array(["a b c d e f g h i j"], pa.string())})
        f1 = fingerprint_batch(t1)["fingerprint"].to_pylist()[0]
        f2 = fingerprint_batch(t1)["fingerprint"].to_pylist()[0]
        assert f1 == f2 != 0

    def test_bpe_ish(self):
        assert bpe_ish_token_count(["hello world"])[0] == 2
        assert bpe_ish_token_count(["it's 42 tokens!"])[0] == 5

    def test_pii_redact(self):
        from fluent_bit_ray.ops.text import pii_redact_batch

        t = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(
                    [
                        "mail a.b+c@x-y.co or 10.0.0.1 then 555-123-4567 x",
                        "version 1.2 is clean",
                    ],
                    pa.string(),
                ),
            }
        )
        out = pii_redact_batch(t).to_pylist()
        assert out[0]["text"] == "mail <EMAIL> or <IP> then <PHONE> x"
        assert (out[0]["n_emails"], out[0]["n_ips"], out[0]["n_phones"]) == (1, 1, 1)
        assert out[1]["text"] == "version 1.2 is clean"
        assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (0, 0, 0)

    def test_repetition_stats(self):
        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "aa\naa\nbb",      # 1 of 3 lines is a repeat (2 of 6 chars)
                        "x y x y x y",     # "x y" 3 of 5 2-grams
                        "",                # degenerate: everything 0
                        "one line\nother",  # no repeats; top 2-gram 1 of 2
                    ],
                    pa.string(),
                ),
            }
        )
        out = repetition_stats_batch(t).to_pylist()
        assert out[0]["dup_line_frac"] == pytest.approx(1 / 3)
        assert out[0]["dup_line_char_frac"] == pytest.approx(2 / 6)
        assert out[1]["top_2gram_frac"] == pytest.approx(3 / 5)
        assert out[2] == {
            "doc_id": 2,
            "dup_line_frac": 0.0,
            "dup_line_char_frac": 0.0,
            "top_2gram_frac": 0.0,
        }
        assert out[3]["dup_line_frac"] == 0.0
        assert out[3]["top_2gram_frac"] == pytest.approx(1 / 2)


@pytest.mark.usefixtures("ray_session")
class TestShardOutput:
    def test_exact_dedup_shard_parquet(self, tmp_path):
        import glob
        import pyarrow.parquet as pq

        out = dedup.exact_dedup(docs_ds(), shard_output_dir=str(tmp_path / "sh"))
        assert out is None  # nothing materialized on the driver
        files = glob.glob(str(tmp_path / "sh" / "shard_*.parquet"))
        assert files
        ids = set()
        for f in files:
            ids.update(pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist())
        assert ids == {0, 2, 3, 4}


@pytest.mark.usefixtures("ray_session")
class TestKeepBestPerKey:
    def test_argmax_ties_nulls_and_blocks(self):
        import ray.data

        from fluent_bit_ray.ops.dedup import keep_best_per_key

        def blk(rows):
            return pa.Table.from_pylist(rows)

        # key a: scores 5,9,9 -> id 1 wins (max score, tie -> min id);
        # key b: null score loses to 0; key c: single null-score row kept
        b1 = blk([
            {"doc_id": 0, "source": "a", "n_chars": 5},
            {"doc_id": 3, "source": "b", "n_chars": None},
            {"doc_id": 4, "source": "c", "n_chars": None},
        ])
        b2 = blk([
            {"doc_id": 2, "source": "a", "n_chars": 9},
            {"doc_id": 1, "source": "a", "n_chars": 9},
            {"doc_id": 5, "source": "b", "n_chars": 0},
        ])
        ds = ray.data.from_arrow(b1).union(ray.data.from_arrow(b2))
        out = {r["source"]: r["doc_id"]
               for r in keep_best_per_key(ds).to_pylist()}
        assert out == {"a": 1, "b": 5, "c": 4}


@pytest.mark.usefixtures("ray_session")
class TestTemporalJoins:
    def sides(self):
        import datetime

        import ray.data

        t0 = datetime.datetime(2024, 1, 1)

        def at(s):
            return t0 + datetime.timedelta(seconds=s)

        left = ray.data.from_items([
            {"event_id": 0, "user_id": 1, "ts": at(100)},
            {"event_id": 1, "user_id": 1, "ts": at(500)},
            {"event_id": 2, "user_id": 2, "ts": at(100)},  # no right rows
            {"event_id": 3, "user_id": 3, "ts": at(50)},   # right only later
        ])
        right = ray.data.from_items([
            {"user_id": 1, "ts": at(100), "value": 1.5},  # equal-ts: matches
            {"user_id": 1, "ts": at(400), "value": 2.5},
            {"user_id": 3, "ts": at(60), "value": 9.0},
        ])
        return left, right

    def test_asof_semantics(self):
        from fluent_bit_ray.ops.joins import asof_join

        left, right = self.sides()
        out = {r["event_id"]: (r["asof_ts_us"], r["asof_value"])
               for r in asof_join(left, right, "user_id", "ts",
                                  left_cols=["event_id"],
                                  right_val_col="value").to_pylist()}
        base = 1704067200 * 10**6
        assert out[0] == (base + 100 * 10**6, 1.5)   # equal ts inclusive
        assert out[1] == (base + 400 * 10**6, 2.5)   # latest prior wins
        assert out[2] == (None, None)                # key with no right side
        assert out[3] == (None, None)                # right row is later
        # left ids stay integral after the null-promotion round trip
        assert all(isinstance(k, int) for k in out)

    def test_range_agg_boundaries(self):
        from fluent_bit_ray.ops.joins import range_join_agg

        left, right = self.sides()
        # window [-300s, +300s]: ev0 sees both u1 rows (100 and 400);
        # ev1 sees only 400 (100 is 400s before); ev3 sees 60 (10s later)
        out = {r["event_id"]: (r["n_in_range"], r["sum_in_range"])
               for r in range_join_agg(left, right, "user_id", "ts",
                                       left_cols=["event_id"],
                                       right_val_col="value",
                                       lo_sec=300, hi_sec=300).to_pylist()}
        assert out[0] == (2, 4.0)
        assert out[1] == (1, 2.5)
        assert out[2] == (0, 0.0)
        assert out[3] == (1, 9.0)

    def test_semi_anti_join_null_semantics(self):
        import ray.data

        from fluent_bit_ray.ops.joins import semi_join

        stream = ray.data.from_items([
            {"id": 0, "k": "a"},
            {"id": 1, "k": "b"},
            {"id": 2, "k": None},   # null key: anti keeps, semi drops
            {"id": 3, "k": "c"},
        ])
        filt = ray.data.from_items([{"k": "a"}, {"k": "c"}, {"k": None}])
        semi = sorted(r["id"] for r in semi_join(stream, filt, "k").take_all())
        anti = sorted(r["id"] for r in
                      semi_join(stream, filt, "k", anti=True).take_all())
        assert semi == [0, 3]
        assert anti == [1, 2]

    def test_semi_join_exchange_matches_broadcast(self):
        import ray.data

        from fluent_bit_ray.ops.joins import semi_join, semi_join_exchange

        stream = ray.data.from_items(
            [{"id": i, "k": f"k{i % 7}", "v": i * 2} for i in range(100)]
            + [{"id": 900, "k": None, "v": 0}]
        )
        filt = ray.data.from_items(
            [{"k": "k1"}, {"k": "k4"}, {"k": None}]
        )
        for anti in (False, True):
            bc = sorted(r["id"] for r in semi_join(
                stream, filt, "k", anti=anti).take_all())
            ex = semi_join_exchange(
                stream.repartition(5), filt.repartition(2), "k", anti=anti
            )
            assert sorted(ex["id"].to_pylist()) == bc
            assert ex.column_names == ["id", "k", "v"]  # schema preserved

    def test_hash_join_inner_left_nulls(self):
        import ray.data

        from fluent_bit_ray.ops.joins import hash_join

        left = ray.data.from_items([
            {"k": 1, "a": "x"},
            {"k": 1, "a": "y"},     # duplicate left key: cross product
            {"k": 2, "a": "z"},
            {"k": None, "a": "n"},  # null key never matches
            {"k": 5, "a": "m"},     # no right match
        ])
        right = ray.data.from_items([
            {"rk": 1, "b": 10},
            {"rk": 1, "b": 11},    # duplicate right key too: 2x2 = 4 rows
            {"rk": 2, "b": 20},
            {"rk": None, "b": 99},  # dropped (null right key)
        ])
        # repartition-variant: exchange must co-locate across many blocks
        left, right = left.repartition(4), right.repartition(3)

        inner = hash_join(left, right, "k", "rk",
                          {"a": "a"}, {"b": "b"}, how="inner")
        rows = sorted((r["k"], r["a"], r["b"]) for r in inner.to_pylist())
        assert rows == [(1, "x", 10), (1, "x", 11), (1, "y", 10),
                        (1, "y", 11), (2, "z", 20)]
        assert inner.column_names == ["k", "a", "b"]
        assert inner.schema.field("k").type == pa.int64()  # Int64 restored
        assert inner.schema.field("b").type == pa.int64()

        outer = hash_join(left, right, "k", "rk",
                          {"a": "a"}, {"b": "b"}, how="left")
        by_key = {}
        for r in outer.to_pylist():
            by_key.setdefault((r["k"], r["a"]), []).append(r["b"])
        assert sorted(by_key[(5, "m")]) == [None]       # unmatched left
        assert sorted(by_key[(None, "n")]) == [None]    # null left key kept
        assert sorted(by_key[(1, "x")]) == [10, 11]
        assert sum(len(v) for v in by_key.values()) == 7

    def test_hash_join_string_key_and_rename(self):
        import ray.data

        from fluent_bit_ray.ops.joins import hash_join

        left = ray.data.from_items([{"u": "a", "v": 1.5}, {"u": "b", "v": 2.5}])
        right = ray.data.from_items([{"w": "a", "s": "hit"}])
        out = hash_join(left, right, "u", "w",
                        {"v": "lv"}, {"s": "rs"}, how="left", out_key="key")
        got = {r["key"]: (r["lv"], r["rs"]) for r in out.to_pylist()}
        assert got == {"a": (1.5, "hit"), "b": (2.5, None)}
        assert out.column_names == ["key", "lv", "rs"]

    def test_semi_join_empty_filter_side(self):
        import ray.data

        from fluent_bit_ray.ops.joins import semi_join

        stream = ray.data.from_items([{"id": 0, "k": "a"}])
        filt = ray.data.from_items([{"k": None}])  # only-null filter keys
        assert semi_join(stream, filt, "k").count() == 0
        assert semi_join(stream, filt, "k", anti=True).count() == 1

    def test_keyed_quantiles(self):
        import ray.data

        from fluent_bit_ray.ops.stats import keyed_quantiles

        rows = [{"k": "a", "v": float(i)} for i in range(1, 101)]
        rows += [{"k": "b", "v": 10.0}, {"k": "b", "v": None}]
        out = keyed_quantiles(ray.data.from_items(rows), "k", "v",
                              qs=(0.5, 0.95), names=("p50", "p95"))
        got = {r["k"]: (r["p50"], r["p95"]) for r in out.to_pylist()}
        assert got["a"] == (50.5, 95.05)  # numpy 'linear' == quantile_cont
        assert got["b"] == (10.0, 10.0)   # nulls ignored

    def test_quantile_sketch_within_bound_and_block_free(self):
        import ray.data

        from fluent_bit_ray.ops.stats import (
            keyed_quantiles,
            keyed_quantiles_approx,
        )

        # skewed + uniform keys, nulls, a degenerate single-value key
        rows = [{"k": "u", "v": float(i)} for i in range(1000)]
        rows += [{"k": "s", "v": float(2 ** (i % 16))} for i in range(500)]
        rows += [{"k": "one", "v": 42.0}, {"k": "u", "v": None}]
        ds = ray.data.from_items(rows)
        exact = {r["k"]: (r["p50"], r["p95"], r["p99"])
                 for r in keyed_quantiles(ds, "k", "v").to_pylist()}
        bins = 512
        for parts in (1, 9):
            d = ray.data.from_items(rows).repartition(parts)
            approx = {r["k"]: (r["p50"], r["p95"], r["p99"])
                      for r in keyed_quantiles_approx(
                          d, "k", "v", bins=bins).to_pylist()}
            assert set(approx) == set(exact)
            widths = {"u": 999.0 / bins, "s": (2**15 - 1) / bins, "one": 0.0}
            for k in exact:
                for e, a in zip(exact[k], approx[k]):
                    assert abs(e - a) <= widths[k] + 1e-9

    def test_quantile_error_check_zero_violations(self):
        import ray.data

        from fluent_bit_ray.ops.stats import keyed_quantiles_error_check

        rows = [{"k": f"k{i % 4}", "v": float(i * i % 997)} for i in range(800)]
        out = keyed_quantiles_error_check(
            ray.data.from_items(rows), "k", "v").to_pylist()[0]
        assert out == {"n_keys": 4, "n_violations": 0}


@pytest.mark.usefixtures("ray_session")
class TestHeavyHitters:
    def zipf_rows(self):
        # deterministic Zipf-ish stream: item i appears ~N/i times
        rows = []
        for i in range(1, 40):
            rows += [{"item": f"w{i:02d}"}] * (2000 // i)
        return rows

    def test_guarantees_hold(self):
        import ray.data

        from fluent_bit_ray.ops.stats import heavy_hitters

        rows = self.zipf_rows()
        truth: dict = {}
        for r in rows:
            truth[r["item"]] = truth.get(r["item"], 0) + 1
        n = len(rows)
        m = 16
        sketch, n_items = heavy_hitters(
            ray.data.from_items(rows).repartition(7), "item", m=m, fanin=3
        )
        assert n_items == n
        est = dict(zip(sketch["key"].to_pylist(), sketch["cnt"].to_pylist()))
        assert len(est) <= m
        bound = n / (m + 1)
        for k, c in truth.items():
            if c > bound:
                assert k in est  # frequent items always survive
            if k in est:
                assert est[k] <= c          # lower bound
                assert est[k] >= c - bound  # within guarantee
        assert all(k in truth for k in est)  # no phantom keys

    def test_error_check_zero_violations_tokenized(self):
        import ray.data

        from fluent_bit_ray.ops.stats import heavy_hitters_error_check

        docs = [{"text": " ".join(f"t{j % (i + 1)}" for j in range(20))}
                for i in range(30)]
        out = heavy_hitters_error_check(
            ray.data.from_items(docs), "text", m=8, tokenize=True
        ).to_pylist()[0]
        assert out["n_items"] == 600
        assert out["n_violations"] == 0

    def test_exact_when_under_capacity(self):
        import ray.data

        from fluent_bit_ray.ops.stats import heavy_hitters

        rows = [{"item": x} for x in ["a", "a", "b", "c", "c", "c"]]
        sketch, n = heavy_hitters(ray.data.from_items(rows), "item", m=64)
        est = dict(zip(sketch["key"].to_pylist(), sketch["cnt"].to_pylist()))
        assert n == 6
        assert est == {"a": 2, "b": 1, "c": 3}  # no compression -> exact


@pytest.mark.usefixtures("ray_session")
class TestQuantizedAnn:
    def corpus(self, n=120, d=16):
        import ray.data

        rows = []
        for i in range(n):
            v = [((i * 13 + j * 7) % 19 - 9) / 9.0 for j in range(d)]
            rows.append({"vec_id": i, "embedding": v})
        return ray.data.from_items(rows)

    def test_quantize_storage_form(self):
        from fluent_bit_ray.ops.ann import quantize_embeddings

        out = {r["vec_id"]: r
               for r in quantize_embeddings(self.corpus(n=10)).take_all()}
        assert len(out) == 10
        for r in out.values():
            assert len(r["qvec"]) == 16           # 1 byte per dim
            assert r["scale"] > 0
        # roundtrip error bounded by scale/2 per component
        for i in (0, 3, 7):
            q = np.frombuffer(out[i]["qvec"], dtype=np.int8).astype(np.float64)
            v = np.array([((i * 13 + j * 7) % 19 - 9) / 9.0
                          for j in range(16)])
            assert (np.abs(q * out[i]["scale"] - v).max()
                    <= out[i]["scale"] / 2 + 1e-7)

    def test_topk_equals_brute_force(self):
        from fluent_bit_ray.ops.ann import (
            brute_force_topk,
            make_query_ref,
            quantized_topk,
        )

        ds = self.corpus()
        qmat = np.array(
            [[((i * 13 + j * 7) % 19 - 9) / 9.0 for j in range(16)]
             for i in (0, 5)]
        )
        ref = make_query_ref(np.array([0, 5]), qmat)
        exact = brute_force_topk(self.corpus(), ref, k=5).to_pandas() \
            .sort_values(["query_id", "rank"]).reset_index(drop=True)
        quant = quantized_topk(ds, ref, k=5).to_pandas() \
            .sort_values(["query_id", "rank"]).reset_index(drop=True)
        assert exact.equals(quant)


@pytest.mark.usefixtures("ray_session")
class TestKMeans:
    def corpus(self):
        import ray.data

        # three well-separated clusters around fixed anchors, spread by a
        # deterministic per-index offset (no RNG — reproducible layout)
        anchors = np.array([[0.0, 0.0], [10.0, 10.0], [-10.0, 8.0]])
        rows = []
        for i in range(90):
            a = anchors[i % 3]
            off = np.array([((i * 7) % 10) / 20.0, ((i * 13) % 10) / 20.0])
            v = a + off
            rows.append({"vec_id": i, "embedding": [float(v[0]), float(v[1])]})
        return ray.data.from_items(rows)

    def test_recovers_separated_clusters(self):
        from fluent_bit_ray.ops.cluster import kmeans_assign, kmeans_fit

        ds = self.corpus()
        cent, info = kmeans_fit(ds, k=3, iters=8)
        got = kmeans_assign(ds, cent).to_pandas()
        # all members of a true cluster land in ONE fitted cluster
        got["truth"] = got["vec_id"] % 3
        groups = got.groupby("truth")["cluster"].nunique()
        assert (groups == 1).all()
        assert got.groupby("truth")["cluster"].first().nunique() == 3

    def test_inertia_monotone_and_partition_free_assignment(self):
        from fluent_bit_ray.ops.cluster import kmeans_assign, kmeans_fit

        ds = self.corpus()
        cent, info = kmeans_fit(ds, k=3, iters=6)
        hist = info["inertia"]
        assert all(b <= a * (1 + 1e-9) for a, b in zip(hist, hist[1:]))
        # block layout must not change the assignment on separated data
        a = kmeans_assign(self.corpus(), cent).to_pandas().sort_values("vec_id")
        b = kmeans_assign(self.corpus().repartition(7), cent).to_pandas().sort_values("vec_id")
        assert a["cluster"].tolist() == b["cluster"].tolist()

    def test_invariants_table(self):
        from fluent_bit_ray.ops.cluster import kmeans_invariants

        out = kmeans_invariants(self.corpus(), k=3, iters=4).to_pylist()[0]
        assert out == {
            "n_points": 90,
            "n_bad_argmin": 0,
            "n_inertia_increases": 0,
            "clusters_ok": 1,
        }

    def test_k_exceeds_corpus_raises(self):
        import ray.data

        from fluent_bit_ray.ops.cluster import kmeans_fit

        ds = ray.data.from_items(
            [{"vec_id": 0, "embedding": [1.0, 2.0]}]
        )
        with pytest.raises(ValueError, match="exceeds corpus"):
            kmeans_fit(ds, k=5, iters=1)


@pytest.mark.usefixtures("ray_session")
class TestRunningTotals:
    def test_resets_ties_and_null_prefix(self):
        import datetime

        import ray.data

        from fluent_bit_ray.ops.windows import running_totals

        t0 = datetime.datetime(2024, 1, 1)

        def at(s):
            return t0 + datetime.timedelta(seconds=s)

        rows = [
            {"event_id": 0, "user_id": 1, "ts": at(10), "value": None},
            {"event_id": 1, "user_id": 1, "ts": at(20), "value": 2.0},
            {"event_id": 2, "user_id": 1, "ts": at(20), "value": 3.0},  # tie
            {"event_id": 3, "user_id": 2, "ts": at(5), "value": 7.0},
        ]
        out = {r["event_id"]: (r["cum_n"], r["cum_sum"])
               for r in running_totals(
                   ray.data.from_items(rows), num_shards=3
               ).to_pandas().to_dict("records")}
        import math

        # null-value prefix: SQL SUM gives NULL, not 0
        assert out[0][0] == 1 and math.isnan(out[0][1])
        assert out[1] == (2, 2.0)   # ties order by event_id
        assert out[2] == (3, 5.0)
        assert out[3] == (1, 7.0)   # key reset


@pytest.mark.usefixtures("ray_session")
class TestPivotSum:
    def test_wide_sums_and_null_absences(self):
        import math

        import ray.data

        from fluent_bit_ray.ops.stats import pivot_sum

        rows = [
            {"k": "u1", "c": "a", "v": 1.0},
            {"k": "u1", "c": "a", "v": 2.0},
            {"k": "u1", "c": "b", "v": 5.0},
            {"k": "u2", "c": "b", "v": 7.0},   # u2 has no 'a' -> NULL
            {"k": "u2", "c": "zz", "v": 9.0},  # category not requested
            {"k": "u3", "c": "a", "v": None},  # null value ignored
        ]
        for parts in (1, 4):
            out = {r["k"]: (r["a_sum"], r["b_sum"])
                   for r in pivot_sum(
                       ray.data.from_items(rows).repartition(parts),
                       "k", "c", "v", categories=["a", "b"]
                   ).to_pylist()}
            assert out["u1"] == (3.0, 5.0)
            # absent category -> SQL NULL (NaN becomes an Arrow null)
            assert out["u2"] == (None, 7.0)
            # u3's only row had a null value: key absent entirely
            assert "u3" not in out


@pytest.mark.usefixtures("ray_session")
class TestCorpusDiff:
    def test_all_statuses(self):
        import ray.data

        from fluent_bit_ray.ops.dedup import corpus_diff

        old = ray.data.from_items([
            {"doc_id": 1, "text": "same"},
            {"doc_id": 2, "text": "before"},
            {"doc_id": 3, "text": "gone"},
            {"doc_id": 5, "text": None},     # null == null -> unchanged
        ])
        new = ray.data.from_items([
            {"doc_id": 1, "text": "same"},
            {"doc_id": 2, "text": "after"},
            {"doc_id": 4, "text": "fresh"},
            {"doc_id": 5, "text": None},
        ])
        for parts in (1, 5):
            got = {r["doc_id"]: r["status"]
                   for r in corpus_diff(
                       old.repartition(parts), new.repartition(parts)
                   ).to_pylist()}
            assert got == {1: "unchanged", 2: "changed", 3: "removed",
                           4: "added", 5: "unchanged"}


@pytest.mark.usefixtures("ray_session")
class TestKeyedOutliers:
    def test_flags_only_the_spike(self):
        import ray.data

        from fluent_bit_ray.ops.stats import keyed_outliers

        rows = [{"id": i, "k": "a", "v": 10.0} for i in range(50)]
        rows += [{"id": 100, "k": "a", "v": 1000.0}]   # the spike
        rows += [{"id": 200, "k": "b", "v": 5.0},
                 {"id": 201, "k": "b", "v": 5.0}]      # zero-variance key
        rows += [{"id": 300, "k": "a", "v": None}]     # null value ignored
        out = keyed_outliers(
            ray.data.from_items(rows), "k", "v", "id", z_threshold=3.0
        ).to_pandas()
        assert out["id"].tolist() == [100]
        assert out["z"].iloc[0] > 3

    def test_block_layout_invariant(self):
        import ray.data

        from fluent_bit_ray.ops.stats import keyed_outliers

        rows = [{"id": i, "k": f"k{i % 3}", "v": float((i * 37) % 101)}
                for i in range(600)]
        a = keyed_outliers(ray.data.from_items(rows), "k", "v", "id",
                           z_threshold=1.5).to_pandas().sort_values("id")
        b = keyed_outliers(ray.data.from_items(rows).repartition(11),
                           "k", "v", "id",
                           z_threshold=1.5).to_pandas().sort_values("id")
        assert a["id"].tolist() == b["id"].tolist()
        assert np.allclose(a["z"], b["z"])


@pytest.mark.usefixtures("ray_session")
class TestHyperLogLog:
    def test_registers_merge_and_estimate_accuracy(self):
        import ray.data

        from fluent_bit_ray.ops.stats import (
            hll_distinct,
            hll_estimate,
            hll_registers,
        )

        # register MERGE property: regs(A ∪ B) == max(regs(A), regs(B))
        ha = (np.arange(1, 2001, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        hb = (np.arange(1500, 3501, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        ra, rb = hll_registers(ha, p=10), hll_registers(hb, p=10)
        runion = hll_registers(np.union1d(ha, hb), p=10)
        assert np.array_equal(np.maximum(ra, rb), runion)
        # accuracy on a 20k-distinct stream across block layouts
        rows = [{"item": f"x{i % 20000}"} for i in range(50000)]
        for parts in (2, 13):
            est = hll_distinct(
                ray.data.from_items(rows).repartition(parts), "item", p=12
            )
            assert abs(est - 20000) / 20000 < 0.1  # ~6 sigma at p=12
        # duplicates don't move the estimate (set semantics)
        est2 = hll_distinct(
            ray.data.from_items(rows + rows), "item", p=12
        )
        assert abs(est2 - est) < 1e-9

    def test_per_key_estimates(self):
        import ray.data

        from fluent_bit_ray.ops.stats import hll_distinct_per_key

        rows = []
        for i in range(6000):
            rows.append({"k": "big", "item": f"u{i % 3000}"})
        for i in range(40):
            rows.append({"k": "small", "item": f"v{i % 20}"})
        for parts in (1, 9):
            out = {r["k"]: r["approx_distinct"]
                   for r in hll_distinct_per_key(
                       ray.data.from_items(rows).repartition(parts),
                       "k", "item", p=11
                   ).to_pylist()}
            assert abs(out["big"] - 3000) / 3000 < 0.15
            assert abs(out["small"] - 20) < 2  # linear-counting regime

    def test_small_range_linear_counting(self):
        import ray.data

        from fluent_bit_ray.ops.stats import hll_distinct

        rows = [{"item": f"only{i}"} for i in range(30)]
        est = hll_distinct(ray.data.from_items(rows), "item", p=10)
        assert abs(est - 30) < 2  # linear-counting regime is near-exact

    def test_error_check_table(self):
        import ray.data

        from fluent_bit_ray.ops.stats import hll_error_check

        docs = [{"text": " ".join(f"w{j}" for j in range(i, i + 10))}
                for i in range(0, 500, 10)]
        out = hll_error_check(
            ray.data.from_items(docs), "text", tokenize=True
        ).to_pylist()[0]
        assert out == {"exact_distinct": 500, "within_bound": 1}


@pytest.mark.usefixtures("ray_session")
class TestLagDeltas:
    def test_lag_and_gap(self):
        import datetime
        import math

        import ray.data

        from fluent_bit_ray.ops.windows import lag_deltas

        t0 = datetime.datetime(2024, 1, 1)

        def at(s):
            return t0 + datetime.timedelta(seconds=s)

        rows = [
            {"event_id": 0, "user_id": 1, "ts": at(10), "value": 1.0},
            {"event_id": 1, "user_id": 1, "ts": at(25), "value": None},
            {"event_id": 2, "user_id": 1, "ts": at(26), "value": 4.0},
            {"event_id": 3, "user_id": 2, "ts": at(99), "value": 9.0},
        ]
        out = {r["event_id"]: (r["prev_value"], r["gap_sec"])
               for r in lag_deltas(ray.data.from_items(rows), num_shards=2)
               .to_pandas().to_dict("records")}
        assert math.isnan(out[0][0]) and math.isnan(out[0][1])  # first row
        assert out[1] == (1.0, 15.0)
        assert math.isnan(out[2][0]) and out[2][1] == 1.0  # lag of NULL value
        assert math.isnan(out[3][0]) and math.isnan(out[3][1])  # new key


@pytest.mark.usefixtures("ray_session")
class TestWindows:
    def events_ds(self):
        import datetime

        import ray.data

        base = datetime.datetime(2024, 1, 1)
        rows = [
            # user 1: 0s, 100s, 200s, 700s (gap>600 starts a new session)
            {"user_id": 1, "ts": base},
            {"user_id": 1, "ts": base + datetime.timedelta(seconds=100)},
            {"user_id": 1, "ts": base + datetime.timedelta(seconds=200)},
            {"user_id": 1, "ts": base + datetime.timedelta(seconds=900)},
            {"user_id": 2, "ts": base + datetime.timedelta(seconds=50)},
        ]
        for i, r in enumerate(rows):
            r["event_id"] = i
        return ray.data.from_items(rows)

    def test_sliding_count(self):
        from fluent_bit_ray.ops.windows import sliding_count

        out = {
            r["event_id"]: r["window_count"]
            for r in sliding_count(self.events_ds(), "user_id", "ts", 150).take_all()
        }
        # window [t-150, t]: ev0->1, ev1->2 (0s,100s), ev2->2 (100s,200s),
        # ev3->1, user2 ev4->1
        assert out == {0: 1, 1: 2, 2: 2, 3: 1, 4: 1}

    def test_session_windows(self):
        from fluent_bit_ray.ops.windows import session_windows

        rows = session_windows(self.events_ds(), "user_id", "ts", 600).take_all()
        per_user = {}
        for r in rows:
            per_user.setdefault(r["user_id"], []).append(r["events"])
        assert sorted(per_user[1]) == [1, 3]  # 3-event session + the 900s one
        assert per_user[2] == [1]

    def test_tumbling_agg(self):
        from fluent_bit_ray.ops.windows import tumbling_agg

        import ray.data

        rows = tumbling_agg(
            self.events_ds(), "user_id", "ts", 300, "event_id"
        ).take_all()
        u1 = sorted(
            (r["bucket"], r["records"]) for r in rows if r["user_id"] == 1
        )
        # buckets of 300s: events at 0,100,200 -> one bucket of 3; 900 -> 1
        assert [c for _, c in u1] == [3, 1]


@pytest.mark.usefixtures("ray_session")
class TestEmbeddingNearDup:
    def _ds(self, n=60, dim=8, clones=5):
        import ray.data

        rng = np.random.RandomState(3)
        mat = rng.randn(n, dim).astype(np.float32)
        mat[:clones] += 10  # make clone base vectors distinctive
        ids = list(range(n)) + [i + 1000 for i in range(clones)]
        vecs = mat.tolist() + mat[:clones].tolist()
        return ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(vecs, pa.list_(pa.float32())),
                }
            )
        ), mat, clones

    def test_blocked_matches_numpy_exact(self):
        ds, mat, clones = self._ds()
        got = dedup.embedding_neardup_pairs_blocked(ds, threshold=0.9)
        pairs = {(a, b) for a, b in zip(got["id_a"].to_pylist(), got["id_b"].to_pylist())}
        m = np.vstack([mat, mat[:clones]]).astype(np.float64)
        ids = np.array(list(range(len(mat))) + [i + 1000 for i in range(clones)])
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ m.T
        want = set()
        for i, j in np.argwhere(np.triu(sims >= 0.9, 1)):
            want.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
        assert pairs == want

    def test_ivf_finds_exact_clones(self):
        ds, mat, clones = self._ds()
        got = dedup.embedding_neardup_pairs_ivf(
            ds, threshold=0.9999, n_centroids=4, n_probe=2
        )
        pairs = {(a, b) for a, b in zip(got["id_a"].to_pylist(), got["id_b"].to_pylist())}
        assert {(i, i + 1000) for i in range(clones)} <= pairs


@pytest.mark.usefixtures("ray_session")
class TestDedupShardOutput:
    def test_exact_dedup_streams_to_disk(self, tmp_path):
        import glob

        import pyarrow.parquet as pq

        out = dedup.exact_dedup(docs_ds(), shard_output_dir=str(tmp_path / "s"))
        assert out is None  # nothing materialized on the driver
        files = glob.glob(str(tmp_path / "s" / "*.parquet"))
        assert files
        got = {r["doc_id"] for f in files for r in pq.read_table(f).to_pylist()}
        assert got == {0, 2, 3, 4}

    def test_dup_spans_streams_to_disk(self, tmp_path):
        import glob

        import pyarrow.parquet as pq
        import ray.data

        docs = [
            {"doc_id": 0, "text": "a b c d e"},
            {"doc_id": 1, "text": "a b c d e"},
            {"doc_id": 2, "text": "q r s t"},
        ]
        ds = lambda: ray.data.from_arrow(pa.Table.from_pylist(docs))
        mem = {r["doc_id"]: r["dup_windows"]
               for r in dedup.dup_spans(ds(), span_k=4).to_pylist()}
        out = dedup.dup_spans(
            ds(), span_k=4, shard_output_dir=str(tmp_path / "d")
        )
        assert out is None
        disk = {
            r["doc_id"]: r["dup_windows"]
            for f in glob.glob(str(tmp_path / "d" / "*.parquet"))
            for r in pq.read_table(f).to_pylist()
        }
        assert disk == mem == {0: 2, 1: 2}


@pytest.mark.usefixtures("ray_session")
class TestMinhashScalePath:
    def test_chained_exchange_same_result(self):
        reps = {r["doc_id"]: r["rep_id"] for r in rows(dedup.minhash_lsh_dedup(
            docs_ds(), shingle_k=3, bands=32))}
        assert reps[1] == 0 and reps[2] == 0 and reps[3] == 3

    def test_shard_output_dir_streams(self, tmp_path):
        import glob

        import pyarrow.parquet as pq

        out = dedup.minhash_lsh_dedup(
            docs_ds(), shingle_k=3, bands=32,
            shard_output_dir=str(tmp_path / "mh"),
        )
        assert out is None
        rows_disk = [
            r for f in glob.glob(str(tmp_path / "mh" / "*.parquet"))
            for r in pq.read_table(f).to_pylist()
        ]
        reps = {r["doc_id"]: r["rep_id"] for r in rows_disk}
        assert reps[1] == 0 and len(reps) == 5


@pytest.mark.usefixtures("ray_session")
class TestShardedDimEnrich:
    """sharded_dim_enrich: hash-exchange lookup join (stages/enrich.py) —
    left-join semantics, first-match on duplicate dim keys, empty dim."""

    def _run(self, stream_rows, dim_rows, **kw):
        import pyarrow as _pa
        import ray.data

        from fluent_bit_ray.stages.enrich import sharded_dim_enrich

        stream = ray.data.from_arrow(_pa.Table.from_pylist(stream_rows))
        dim = _pa.Table.from_pylist(dim_rows) if dim_rows else _pa.table(
            {"k": _pa.array([], _pa.int64()), "v": _pa.array([], _pa.string())}
        )
        out = sharded_dim_enrich(stream, dim, key_col="key", dim_key="k",
                                 fields=["v"], **kw)
        return sorted(out.take_all(), key=lambda r: r["id"])

    def test_left_join_with_misses(self):
        got = self._run(
            [{"id": i, "key": i % 5} for i in range(10)],
            [{"k": 0, "v": "zero"}, {"k": 2, "v": "two"}],
            num_shards=3,
        )
        for r in got:
            expect = {0: "zero", 2: "two"}.get(r["key"])
            assert r["v"] == expect

    def test_duplicate_dim_key_first_wins(self):
        got = self._run(
            [{"id": 0, "key": 7}],
            [{"k": 7, "v": "first"}, {"k": 7, "v": "second"}],
        )
        assert got[0]["v"] == "first"

    def test_empty_dim_all_null(self):
        got = self._run([{"id": i, "key": i} for i in range(4)], [])
        assert [r["v"] for r in got] == [None] * 4

    def test_matches_broadcast_enrich(self, sf_dir):
        import os

        import duckdb
        import ray.data

        from fluent_bit_ray.stages.enrich import sharded_dim_enrich

        stream = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_custkey"]
        )
        dim = ray.data.read_parquet(
            os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_name"]
        )
        out = sharded_dim_enrich(stream, dim, key_col="o_custkey",
                                 dim_key="c_custkey", fields=["c_name"])
        got = sorted(out.take_all(), key=lambda r: r["o_orderkey"])
        want = duckdb.sql(
            f"SELECT o.o_orderkey, o.o_custkey, c.c_name "
            f"FROM read_parquet('{sf_dir}/orders.parquet') o "
            f"LEFT JOIN read_parquet('{sf_dir}/customer.parquet') c "
            f"ON o.o_custkey = c.c_custkey ORDER BY o.o_orderkey"
        ).fetchall()
        assert [(r["o_orderkey"], r["o_custkey"], r["c_name"]) for r in got] == want


@pytest.mark.usefixtures("ray_session")
class TestDupSpans:
    """ExactSubstr-style duplicated k-token window counts: corpus-wide
    occurrence >= 2, short docs excluded, whitespace-normalized match."""

    def _run(self, docs, **kw):
        import pyarrow as _pa
        import ray.data

        from fluent_bit_ray.ops.dedup import dup_spans

        out = dup_spans(ray.data.from_arrow(_pa.Table.from_pylist(docs)), **kw)
        return {r["doc_id"]: r["dup_windows"] for r in out.to_pylist()}

    def test_clones_shared_run_and_short_docs(self):
        got = self._run(
            [
                {"doc_id": 0, "text": "a b c d e"},
                {"doc_id": 1, "text": "a b c d e"},
                {"doc_id": 2, "text": "x y z w a b c d q"},
                {"doc_id": 3, "text": "p q"},
                {"doc_id": 4, "text": "r s t u"},
            ],
            span_k=4,
        )
        # clones share both windows; doc 2 shares exactly one ("a b c d");
        # doc 3 is shorter than k; doc 4's single window is unique
        assert got == {0: 2, 1: 2, 2: 1}

    def test_within_doc_repetition_counts_positions(self):
        got = self._run(
            [{"doc_id": 10, "text": "m n o p m n o p"}],
            span_k=4,
        )
        assert got == {10: 2}  # "m n o p" at offsets 0 and 4

    def test_whitespace_normalized(self):
        got = self._run(
            [
                {"doc_id": 0, "text": "a  b \t c d"},
                {"doc_id": 1, "text": "a b c d"},
            ],
            span_k=4,
        )
        assert got == {0: 1, 1: 1}

    def test_no_duplicates_empty_result(self):
        got = self._run(
            [
                {"doc_id": 0, "text": "a b c d"},
                {"doc_id": 1, "text": "e f g h"},
            ],
            span_k=4,
        )
        assert got == {}

    def test_empty_docs_do_not_shift_offsets(self):
        # regression: Arrow's split of an empty/whitespace-only doc
        # yields one '' element; leaving it in the flat token array while
        # zeroing the doc's count shifted every LATER doc's window
        # offsets by one — the shared end-of-doc span went undetected
        got = self._run(
            [
                {"doc_id": 0, "text": ""},
                {"doc_id": 1, "text": "aa a b c d"},
                {"doc_id": 2, "text": "  \t "},
                {"doc_id": 3, "text": "bb a b c d"},
            ],
            span_k=4,
        )
        assert got == {1: 1, 3: 1}

    def test_empty_docs_decontaminate_offsets(self):
        import pyarrow as _pa
        import ray.data

        from fluent_bit_ray.ops.dedup import decontaminate

        train = ray.data.from_arrow(_pa.Table.from_pylist(
            [{"doc_id": 0, "text": ""},
             {"doc_id": 1, "text": "zz a b c d"}]))
        bench = ray.data.from_arrow(_pa.Table.from_pylist(
            [{"doc_id": 100, "text": " "},
             {"doc_id": 101, "text": "qq a b c d"}]))
        out = decontaminate(train, bench, span_k=4).to_pylist()
        assert {r["doc_id"]: r["contaminated_windows"] for r in out} == {1: 1}


@pytest.mark.usefixtures("ray_session")
class TestSampling:
    """Deterministic hash split + stratified sampling: order- and
    block-boundary-independent assignments."""

    def test_hash_split_deterministic_and_partitioned(self):
        import numpy as np

        from fluent_bit_ray.ops.sample import hash_split_batch, split_hash

        t = pa.table({"doc_id": pa.array(list(range(1000)), pa.int64())})
        a = hash_split_batch(t)
        b = hash_split_batch(t)
        assert a.equals(b)
        labels = a["split"].to_pylist()
        h = split_hash(np.arange(1000))
        for lbl, hh in zip(labels, h):
            if hh < 4209067950:
                assert lbl == "train"
            elif hh < 4252017623:
                assert lbl == "val"
            else:
                assert lbl == "test"
        # 98/1/1 split lands near its fractions on 1000 uniform ids
        assert labels.count("train") > 900

    def test_stratified_sample_block_independent(self):
        import ray.data

        from fluent_bit_ray.ops.sample import stratified_sample

        t = pa.table(
            {
                "doc_id": pa.array(list(range(300)), pa.int64()),
                "source": pa.array(
                    [f"s{i % 3}" for i in range(300)], pa.string()
                ),
            }
        )
        one = stratified_sample(
            ray.data.from_arrow(t), n_per_stratum=7
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        many = stratified_sample(
            ray.data.from_arrow(t).repartition(13), n_per_stratum=7
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert one.equals(many)
        assert (one.groupby("source").size() == 7).all()

    def test_stratified_sample_small_stratum_kept_whole(self):
        import ray.data

        from fluent_bit_ray.ops.sample import stratified_sample

        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "source": pa.array(["a", "a", "b"], pa.string()),
            }
        )
        out = stratified_sample(ray.data.from_arrow(t), n_per_stratum=5)
        assert out.num_rows == 3

    def test_topn_per_key_ordering_ties_and_blocks(self):
        import ray.data

        from fluent_bit_ray.ops.sample import topn_per_key

        rows = [
            {"doc_id": 0, "k": "a", "s": 5.0},
            {"doc_id": 1, "k": "a", "s": 9.0},
            {"doc_id": 2, "k": "a", "s": 9.0},   # tie: lower id wins rank
            {"doc_id": 3, "k": "a", "s": 1.0},
            {"doc_id": 4, "k": "b", "s": 2.0},
            {"doc_id": 5, "k": "b", "s": None},  # null score sorts last
            {"doc_id": 6, "k": None, "s": 7.0},  # null key groups as ""
        ]
        for parts in (1, 5):
            out = topn_per_key(
                ray.data.from_items(rows).repartition(parts),
                "k", "s", id_col="doc_id", n=2,
            )
            got = sorted(
                [(r["k"], r["doc_id"]) for r in out.to_pylist()],
                key=lambda x: (x[0] or "", x[1]),
            )
            assert got == [(None, 6), ("a", 1), ("a", 2), ("b", 4), ("b", 5)]

    def test_global_shuffle_rank_complete_and_partition_free(self):
        import ray.data

        from fluent_bit_ray.ops.sample import global_shuffle

        t = pa.table({"doc_id": pa.array(list(range(500)), pa.int64())})
        one = global_shuffle(
            ray.data.from_arrow(t), seed=7
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        many = global_shuffle(
            ray.data.from_arrow(t).repartition(11), seed=7
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        # permutation is a pure function of (id, seed): block layout
        # cannot change any rank
        assert one.equals(many)
        # ranks are exactly 0..n-1 (a true permutation, no gaps/dups)
        assert sorted(one["pos"].tolist()) == list(range(500))

    def test_global_shuffle_seed_changes_order_keep_cols(self):
        import ray.data

        from fluent_bit_ray.ops.sample import global_shuffle

        t = pa.table(
            {
                "doc_id": pa.array(list(range(200)), pa.int64()),
                "text": pa.array([f"d{i}" for i in range(200)], pa.string()),
            }
        )
        a = global_shuffle(ray.data.from_arrow(t), seed=1,
                           keep_cols=["text"]).to_pandas()
        b = global_shuffle(ray.data.from_arrow(t), seed=2,
                           keep_cols=["text"]).to_pandas()
        assert set(a.columns) == {"doc_id", "text", "pos"}
        # payload rides along with its row
        row = a[a["doc_id"] == 42].iloc[0]
        assert row["text"] == "d42"
        pa_ = a.sort_values("doc_id")["pos"].tolist()
        pb_ = b.sort_values("doc_id")["pos"].tolist()
        assert pa_ != pb_  # different seed -> different permutation


@pytest.mark.usefixtures("ray_session")
class TestVocabAndPacking:
    def test_vocab_bigrams_within_doc_only(self):
        import ray.data

        from fluent_bit_ray.ops.text import vocab_topk

        ds = ray.data.from_items([
            {"text": "a b c"},      # bigrams: "a b", "b c"
            {"text": "c a"},        # "c a" — NOT "c c" across docs
            {"text": "a b"},        # "a b" again
            {"text": "solo"},       # no bigram
            {"text": "  "},         # empty
        ])
        out = vocab_topk(ds, k=10, ngram=2)
        got = dict(zip(out["token"].to_pylist(), out["cnt"].to_pylist()))
        assert got == {"a b": 2, "b c": 1, "c a": 1}

    def test_vocab_topk_counts_and_tie_order(self):
        import ray.data

        from fluent_bit_ray.ops.text import vocab_topk

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], pa.int64()),
                    "text": pa.array(
                        ["b a b c", "a b  \n zz"], pa.string()
                    ),
                }
            )
        )
        out = vocab_topk(ds, k=3).to_pylist()
        # b:3, a:2, then the count-1 tie broken ascending: c before zz
        assert out == [
            {"token": "b", "cnt": 3},
            {"token": "a", "cnt": 2},
            {"token": "c", "cnt": 1},
        ]

    def test_pack_chunks_spans(self):
        import ray.data

        from fluent_bit_ray.ops.pack import pack_chunks

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(
                    ["a b c", "d e f g", "", "h i"], pa.string()
                ),
            }
        )
        got = {
            r["doc_id"]: (r["n_tokens"], r["start_chunk"], r["end_chunk"])
            for r in pack_chunks(
                ray.data.from_arrow(t), chunk_tokens=4
            ).to_pylist()
        }
        # stream offsets: doc0 [0,3) -> chunk 0; doc1 [3,7) -> chunks 0-1;
        # doc2 empty at 7 -> chunk 1; doc3 [7,9) -> chunks 1-2
        assert got == {0: (3, 0, 0), 1: (4, 0, 1), 2: (0, 1, 1), 3: (2, 1, 2)}

    def test_pack_chunks_block_boundary_invariant(self):
        import ray.data

        from fluent_bit_ray.ops.pack import pack_chunks

        t = pa.table(
            {
                "doc_id": pa.array(list(range(40)), pa.int64()),
                "text": pa.array(
                    [" ".join(["w"] * (i % 7)) for i in range(40)],
                    pa.string(),
                ),
            }
        )
        one = pack_chunks(ray.data.from_arrow(t), chunk_tokens=5)
        many = pack_chunks(
            ray.data.from_arrow(t).repartition(6), chunk_tokens=5
        )
        a = one.to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = many.to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert a.equals(b)

    def test_pack_chunks_rejects_overlapping_blocks(self):
        import ray.data

        from fluent_bit_ray.ops.pack import pack_chunks

        odd = pa.table(
            {"doc_id": pa.array([1, 3], pa.int64()),
             "text": pa.array(["a", "b"], pa.string())}
        )
        even = pa.table(
            {"doc_id": pa.array([0, 2], pa.int64()),
             "text": pa.array(["c", "d"], pa.string())}
        )
        ds = ray.data.from_arrow(odd).union(ray.data.from_arrow(even))
        with pytest.raises(ValueError, match="non-overlapping"):
            pack_chunks(ds, chunk_tokens=4)


class TestNormalizeText:
    def test_kernels(self):
        import pyarrow as _pa

        from fluent_bit_ray.ops.text import normalize_text_batch

        t = _pa.table({
            "doc_id": _pa.array([0, 1, 2], _pa.int64()),
            "text": _pa.array(["  Hello,   WORLD!  ", "a\tb\nc", None]),
        })
        out = normalize_text_batch(t, strip_punct=True)["norm_text"].to_pylist()
        assert out == ["hello world", "a b c", ""]
        keep = normalize_text_batch(t, strip_punct=False)["norm_text"].to_pylist()
        assert keep == ["hello, world!", "a b c", ""]


class TestUrlParts:
    def test_decomposition_matrix(self):
        import pyarrow as _pa

        from fluent_bit_ray.ops.text import url_parts_batch

        t = _pa.table({"url": [
            "https://h3.example.net/0/9c9.html",
            "http://a.b:8080/p/q?x=1&y=2#frag",
            "ftp://files.example.com",
            "no-scheme.example/path",
            "",
            None,
        ]})
        got = url_parts_batch(t).to_pylist()
        assert got[0]["scheme"] == "https"
        assert got[0]["host"] == "h3.example.net"
        assert got[0]["path"] == "/0/9c9.html"
        assert got[1] == {"url": "http://a.b:8080/p/q?x=1&y=2#frag",
                          "scheme": "http", "host": "a.b", "port": "8080",
                          "path": "/p/q", "query": "x=1&y=2",
                          "fragment": "frag"}
        assert got[2]["host"] == "files.example.com"
        assert got[3]["scheme"] == "" and got[3]["host"] == "no-scheme.example"
        # empty url -> all-empty parts; NULL url -> NULL url and NULL
        # parts (DuckDB regexp_extract parity: '' on no-match, NULL in ->
        # NULL out; pinned by the url_parts oracle on the nasty corpus)
        assert all(v == "" for v in got[4].values())
        assert all(v is None for v in got[5].values())


@pytest.mark.usefixtures("ray_session")
class TestChunkDocuments:
    def test_hand_chunks(self):
        import ray.data

        from fluent_bit_ray.ops.pack import chunk_documents

        toks = " ".join(str(i) for i in range(10))  # 10 tokens
        ds = ray.data.from_items([
            {"doc_id": 0, "text": toks},        # chunks of 4, stride 2
            {"doc_id": 1, "text": "a b"},       # single short chunk
            {"doc_id": 2, "text": "   "},       # empty: no chunks
        ])
        out = chunk_documents(ds, chunk_tokens=4, overlap=2).to_pandas()
        d0 = out[out["doc_id"] == 0].sort_values("chunk_idx")
        # starts 0,2,4,6 then last window [8,10) is short (len 2):
        # n=10, extra=6, stride=2 -> 1+3=4 chunks
        assert d0["start_tok"].tolist() == [0, 2, 4, 6]
        assert d0["n_tok"].tolist() == [4, 4, 4, 4]
        assert d0["chunk_text"].tolist() == [
            "0 1 2 3", "2 3 4 5", "4 5 6 7", "6 7 8 9"
        ]
        d1 = out[out["doc_id"] == 1]
        assert d1["chunk_text"].tolist() == ["a b"]
        assert d1["n_tok"].tolist() == [2]
        assert (out["doc_id"] == 2).sum() == 0

    def test_short_tail_chunk(self):
        import ray.data

        from fluent_bit_ray.ops.pack import chunk_documents

        ds = ray.data.from_items(
            [{"doc_id": 0, "text": " ".join("t%d" % i for i in range(9))}]
        )
        out = chunk_documents(ds, chunk_tokens=4, overlap=1).to_pandas() \
            .sort_values("chunk_idx")
        # n=9 stride=3: starts 0,3,6 -> lengths 4,4,3
        assert out["start_tok"].tolist() == [0, 3, 6]
        assert out["n_tok"].tolist() == [4, 4, 3]
        assert out["chunk_text"].iloc[-1] == "t6 t7 t8"

    def test_overlap_validation(self):
        import ray.data

        from fluent_bit_ray.ops.pack import chunk_documents

        with pytest.raises(ValueError, match="overlap"):
            chunk_documents(ray.data.from_items([{"doc_id": 0, "text": "x"}]),
                            chunk_tokens=4, overlap=4)


@pytest.mark.usefixtures("ray_session")
class TestTfidf:
    def docs(self):
        import ray.data

        return ray.data.from_items([
            {"doc_id": 0, "text": "apple apple banana"},   # tf counts twice
            {"doc_id": 1, "text": "apple cherry"},
            {"doc_id": 2, "text": "banana cherry cherry"},
            {"doc_id": 3, "text": "   "},                  # empty -> 0.0
            {"doc_id": 4, "text": "unique"},               # df=1 token
        ])

    def test_hand_computed_scores_min_df(self):
        import math

        from fluent_bit_ray.ops.text import tfidf_scores

        out = {r["doc_id"]: r["tfidf"]
               for r in tfidf_scores(self.docs(), min_df=2).to_pandas()
               .to_dict("records")}
        n = 5.0
        idf = {t: math.log(n / 2) for t in ("apple", "banana", "cherry")}
        # df counts DISTINCT docs (apple df=2 though doc 0 has it twice);
        # tf multiplies per occurrence; 'unique' (df=1) truncated by min_df
        assert abs(out[0] - (2 * idf["apple"] + idf["banana"])) < 1e-12
        assert abs(out[1] - (idf["apple"] + idf["cherry"])) < 1e-12
        assert abs(out[2] - (idf["banana"] + 2 * idf["cherry"])) < 1e-12
        assert out[3] == 0.0
        assert out[4] == 0.0
        assert len(out) == 5  # every doc ranked, including zeros

    def test_block_layout_invariant(self):
        import ray.data

        from fluent_bit_ray.ops.text import tfidf_scores

        rows = [{"doc_id": i, "text": f"w{i % 7} w{i % 3} common"}
                for i in range(60)]
        a = tfidf_scores(ray.data.from_items(rows)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        b = tfidf_scores(ray.data.from_items(rows).repartition(9)) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert np.allclose(a["tfidf"], b["tfidf"], atol=1e-12)


@pytest.mark.usefixtures("ray_session")
class TestUnigramLogprob:
    def test_matches_hand_model(self):
        import math

        import ray.data

        from fluent_bit_ray.ops.text import unigram_logprob

        # corpus: a a b | b c | "" -> counts a:2 b:2 c:1, total 5
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1, 2], pa.int64()),
                    "text": pa.array(["a a b", "b  c", "   "], pa.string()),
                }
            )
        )
        out = {r["doc_id"]: r["nll"]
               for r in unigram_logprob(ds).take_all()}
        nll = lambda c: -math.log(c / 5.0)
        assert set(out) == {0, 1}  # whitespace-only doc omitted
        assert out[0] == pytest.approx((2 * nll(2) + nll(2)) / 3)
        assert out[1] == pytest.approx((nll(2) + nll(1)) / 2)

    def test_per_doc_sum_keeps_float_precision(self):
        # regression: the shared prefix-sum helper used a hardcoded int64
        # accumulator, truncating float inputs (silently flooring NLLs)
        import numpy as np

        from fluent_bit_ray.ops.text import _per_doc_sum

        vals = np.array([0.25, 0.5, 1.75, 2.5])
        bounds = np.array([0, 2, 4])
        assert _per_doc_sum(vals, bounds).tolist() == [0.75, 4.25]
        ints = np.array([1, 2, 3, 4], dtype=np.int64)
        assert _per_doc_sum(ints, bounds).dtype == np.int64
        assert _per_doc_sum(ints, bounds).tolist() == [3, 7]


class TestWinsorize:
    def test_clamps_and_null_passthrough(self, ray_session):
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.stats import winsorize

        v = np.arange(1, 101, dtype=np.float64)
        t = pa.table({"id": pa.array(np.arange(101, dtype=np.int64)),
                      "v": pa.array(list(v) + [None], pa.float64())})
        out = winsorize(ray.data.from_arrow(t).repartition(4), "v",
                        lo_q=0.10, hi_q=0.90, bins=8,
                        band_limit=20).to_pandas().sort_values("id")
        lo = np.quantile(v, 0.10)
        hi = np.quantile(v, 0.90)
        exp = np.clip(v, lo, hi)
        assert np.allclose(out["clipped"].to_numpy()[:100], exp)
        assert pd.isna(out["clipped"].iloc[100])
        # originals untouched
        assert np.allclose(out["v"].to_numpy()[:100], v)


class TestBasketLift:
    def test_hand_model(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.stats import basket_lift

        # baskets: u1={x,y}, u2={x,y}, u3={x}, u4={y,z} -> N=4
        t = pa.table({
            "k": pa.array([1, 1, 2, 2, 3, 4, 4, 1], pa.int64()),
            "i": pa.array(["x", "y", "x", "y", "x", "y", "z", "x"]),
        })
        out = basket_lift(ray.data.from_arrow(t).repartition(3),
                          "k", "i").to_pylist()
        rows = {(r["a"], r["b"]): r for r in out}
        # n_x=3, n_y=3, n_xy=2: lift = (2/4)/((3/4)*(3/4)) = 8/9
        assert rows[("x", "y")]["n_ab"] == 2
        assert rows[("x", "y")]["lift"] == pytest.approx(8 / 9)
        # y,z co-occur once: lift = (1/4)/((3/4)*(1/4)) = 4/3
        assert rows[("y", "z")]["n_ab"] == 1
        assert rows[("y", "z")]["lift"] == pytest.approx(4 / 3)
        assert ("x", "z") not in rows  # never co-occur

    def test_matches_duckdb_and_min_support(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.stats import basket_lift

        rng = np.random.RandomState(31)
        n = 1200
        df = pd.DataFrame({
            "k": rng.randint(0, 60, n).astype(np.int64),
            "i": rng.choice(["a", "b", "c", "d", "e", "f"], n,
                            p=[0.4, 0.25, 0.15, 0.1, 0.07, 0.03]),
        })
        out = basket_lift(ray.data.from_pandas(df).repartition(7),
                          "k", "i", min_support=3).to_pandas()
        duckdb.register("t", df)
        exp = duckdb.sql(
            "WITH bk AS (SELECT DISTINCT k, i FROM t), "
            "nb AS (SELECT count(DISTINCT k)::DOUBLE AS n FROM bk), "
            "tc AS (SELECT i, count(*)::BIGINT AS c FROM bk GROUP BY i), "
            "p AS (SELECT x.i AS a, y.i AS b, count(*)::BIGINT AS n_ab "
            "FROM bk x JOIN bk y ON x.k = y.k AND x.i < y.i "
            "GROUP BY 1, 2) "
            "SELECT p.a, p.b, p.n_ab, "
            "(p.n_ab / nb.n) / ((ta.c / nb.n) * (tb.c / nb.n)) AS lift "
            "FROM p, nb, tc ta, tc tb "
            "WHERE ta.i = p.a AND tb.i = p.b AND p.n_ab >= 3 "
            "ORDER BY a, b").df()
        out = out.sort_values(["a", "b"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(out, exp, check_dtype=False,
                                      rtol=1e-12)


class TestBfsLayers:
    def test_long_chain_many_rounds(self, ray_session):
        from fluent_bit_ray.ops.graph import bfs_layers

        # 0-1-2-...-59 chain: distance == node id; needs 59 frontier
        # rounds, so the frontier-only message path really iterates
        e = pa.table({"src": pa.array(np.arange(59, dtype=np.int64)),
                      "dst": pa.array(np.arange(1, 60, dtype=np.int64))})
        out = bfs_layers(e, seeds=[0]).to_pandas().sort_values("node")
        assert list(out["node"]) == list(range(60))
        assert list(out["dist"]) == list(range(60))

    def test_multi_source_and_unreachable(self, ray_session):
        from fluent_bit_ray.ops.graph import bfs_layers

        # two components: 0-1-2-3 and 10-11; seeds 3 and 10
        e = pa.table({"src": pa.array([0, 1, 2, 10], pa.int64()),
                      "dst": pa.array([1, 2, 3, 11], pa.int64())})
        out = {r["node"]: r["dist"]
               for r in bfs_layers(e, seeds=[3, 10]).to_pylist()}
        assert out == {3: 0, 2: 1, 1: 2, 0: 3, 10: 0, 11: 1}

    def test_matches_brute_force_random_graph(self, ray_session):
        import collections

        import ray.data

        from fluent_bit_ray.ops.graph import bfs_layers

        rng = np.random.RandomState(17)
        n, m = 200, 400
        src = rng.randint(0, n, m).astype(np.int64)
        dst = rng.randint(0, n, m).astype(np.int64)
        seeds = [0, 7, 13]
        out = {r["node"]: r["dist"] for r in bfs_layers(
            ray.data.from_arrow(pa.table({"src": src, "dst": dst})
                                ).repartition(5),
            seeds=seeds).to_pylist()}
        # driver-side reference BFS
        adj = collections.defaultdict(set)
        for a, b in zip(src, dst):
            adj[a].add(b)
            adj[b].add(a)
        ref, q = {s: 0 for s in seeds if s in adj}, [
            s for s in seeds if s in adj]
        while q:
            nxt = []
            for u in q:
                for v in adj[u]:
                    if v not in ref:
                        ref[v] = ref[u] + 1
                        nxt.append(v)
            q = nxt
        assert out == ref


class TestMadOutliers:
    def test_spike_flags_and_constant_key(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.stats import mad_outliers

        t = pa.table({
            "event_id": pa.array(np.arange(12, dtype=np.int64)),
            "k": pa.array(["a"] * 7 + ["b"] * 5),
            "v": pa.array([1.0, 2.0, 3.0, 2.0, 1.0, 2.0, 100.0,
                           5.0, 5.0, 5.0, 5.0, 5.1]),
        })
        out = mad_outliers(ray.data.from_arrow(t).repartition(3),
                           "k", "v").to_pandas().set_index("event_id")
        # key a: med 2, MAD of |v-2| = {1,0,1,0,1,0,98} -> 1; only the
        # 100.0 spike exceeds 3*1 (robust: the spike doesn't mask itself)
        a = out[out["k"] == "a"]
        assert a["is_outlier"].sum() == 1 and out.loc[6, "is_outlier"]
        assert a["med"].eq(2.0).all() and a["mad"].eq(1.0).all()
        # key b: MAD == 0 (constant); ANY deviation flags via the
        # multiplication form
        b = out[out["k"] == "b"]
        assert b["mad"].eq(0.0).all()
        assert b["is_outlier"].sum() == 1 and out.loc[11, "is_outlier"]

    def test_matches_duckdb_null_safe(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.stats import mad_outliers

        rng = np.random.RandomState(21)
        n = 600
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            "k": rng.randint(0, 12, n).astype(np.int64),
            "v": rng.randn(n) * 10,
        })
        df.loc[df.index % 13 == 0, "v"] = np.nan
        out = mad_outliers(ray.data.from_pandas(df).repartition(5),
                           "k", "v").to_pandas()
        duckdb.register("t", df)
        exp = duckdb.sql(
            "WITH m AS (SELECT k, quantile_cont(v, 0.5) AS med FROM t "
            "WHERE v IS NOT NULL GROUP BY k), "
            "d AS (SELECT t.event_id, t.k, t.v, m.med FROM t "
            "JOIN m USING (k) WHERE t.v IS NOT NULL), "
            "md AS (SELECT k, quantile_cont(abs(v - med), 0.5) AS mad "
            "FROM d GROUP BY k) "
            "SELECT d.event_id, d.k, d.v, d.med, md.mad, "
            "abs(d.v - d.med) > 3.0 * md.mad AS is_outlier "
            "FROM d JOIN md USING (k) ORDER BY event_id").df()
        out = out.sort_values("event_id").reset_index(drop=True)
        assert len(out) == len(exp)
        assert (out["is_outlier"] == exp["is_outlier"]).all()
        assert np.allclose(out["med"], exp["med"])
        assert np.allclose(out["mad"], exp["mad"])


class TestPCA:
    def _ds(self, X):
        import ray.data

        return ray.data.from_arrow(pa.table({
            "vec_id": pa.array(np.arange(len(X), dtype=np.int64)),
            "embedding": pa.array([r.tolist() for r in X.astype(np.float32)]),
        }))

    def test_recovers_dominant_axes(self, ray_session):
        from fluent_bit_ray.ops.cluster import pca_fit

        rng = np.random.RandomState(4)
        # variance 25 along axis 0, 4 along axis 1, noise elsewhere
        n, d = 600, 12
        X = rng.randn(n, d) * 0.01
        X[:, 0] += rng.randn(n) * 5.0
        X[:, 1] += rng.randn(n) * 2.0
        X += 3.0  # non-zero mean must be removed
        mean, comps, eig, info = pca_fit(self._ds(X).repartition(5),
                                         n_components=2)
        assert np.allclose(mean, X.astype(np.float32).mean(axis=0),
                           atol=1e-5)
        assert abs(comps[0, 0]) > 0.999 and abs(comps[1, 1]) > 0.999
        assert eig[0] == pytest.approx(X[:, 0].var(), rel=1e-3)
        exp = np.linalg.eigvalsh(np.cov(X.astype(np.float32).T, bias=True))
        assert np.allclose(np.sort(eig), exp, atol=1e-6)

    def test_projection_variance_and_block_invariance(self, ray_session):
        from fluent_bit_ray.ops.cluster import (pca_fit, pca_invariants,
                                                pca_transform)

        rng = np.random.RandomState(8)
        X = rng.randn(400, 6) @ rng.randn(6, 6)
        inv = pca_invariants(self._ds(X).repartition(4),
                             n_components=4).to_pylist()[0]
        assert inv["n_vectors"] == 400
        assert inv["n_orth_violations"] == 0
        assert inv["n_pvar_violations"] == 0
        assert inv["n_eig_order_violations"] == 0
        m1, c1, e1, _ = pca_fit(self._ds(X), n_components=3)
        m2, c2, e2, _ = pca_fit(self._ds(X).repartition(9), n_components=3)
        assert np.allclose(c1, c2, atol=1e-9)
        assert np.allclose(e1, e2, atol=1e-9)
        p = pca_transform(self._ds(X), m1, c1).to_pandas()
        assert len(p) == 400 and len(p["pc"].iloc[0]) == 3


class TestTemplateNovelty:
    def test_first_seen_flags_and_null_ts(self, ray_session):
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.text import template_novelty

        us = 1_000_000
        df = pd.DataFrame({
            "text": ["GET /a id=1", "GET /a id=2", "POST /b 0xdead",
                     "GET /a id=9", "POST /b 0xbeef", "GET /a id=3"],
            "ts": pd.to_datetime(
                [0, 5, 5, 12, 12, None], unit="s"),
        })
        out = template_novelty(
            ray.data.from_pandas(df).repartition(3),
            bucket_us=10 * us).to_pandas()
        out = out.sort_values(["template", "bucket"]).reset_index(drop=True)
        a = out[out["template"] == "GET /a id=<NUM>"]
        # buckets: 0 (ts 0,5), 1 (ts 12), null (ts None)
        assert a[a["bucket"] == 0]["cnt"].item() == 2
        assert a[a["bucket"] == 0]["is_new"].item()
        assert not a[a["bucket"] == 1]["is_new"].item()
        nullrow = a[a["bucket"].isna()]
        assert len(nullrow) == 1 and not nullrow["is_new"].item()
        b = out[out["template"] == "POST /b <HEX>"]
        assert b[b["bucket"] == 0]["is_new"].item()
        assert not b[b["bucket"] == 1]["is_new"].item()

    def test_matches_duckdb(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.text import template_novelty

        rng = np.random.RandomState(13)
        n = 800
        df = pd.DataFrame({
            "text": [f"{w} code={rng.randint(100)}"
                     for w in rng.choice(["alpha", "beta", "gamma"], n)],
            "ts": pd.to_datetime(rng.randint(0, 50, n), unit="s"),
        })
        out = template_novelty(
            ray.data.from_pandas(df).repartition(6),
            bucket_us=10_000_000).to_pandas()
        duckdb.register("t", df)
        exp = duckdb.sql(
            "WITH lines AS (SELECT epoch_us(ts) // 10000000 AS bucket, "
            "regexp_replace(text, '[0-9]+', '<NUM>', 'g') AS template "
            "FROM t), "
            "g AS (SELECT bucket, template, count(*)::BIGINT AS cnt "
            "FROM lines GROUP BY 1, 2), "
            "f AS (SELECT template, min(bucket) AS fb FROM g GROUP BY 1) "
            "SELECT g.bucket, g.template, g.cnt, g.bucket = f.fb AS is_new "
            "FROM g JOIN f USING (template)").df()
        key = ["template", "bucket"]
        pd.testing.assert_frame_equal(
            out.sort_values(key).reset_index(drop=True),
            exp.sort_values(key).reset_index(drop=True),
            check_dtype=False)


class TestMixtureSample:
    def test_rates_semantics(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.sample import mixture_sample, shuffle_hash

        n = 2000
        t = pa.table({
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "source": pa.array((["a", "b", "c", "d"] * (n // 4))),
        })
        rates = {"a": 2.0, "b": 0.5, "c": 0.0}
        out = mixture_sample(
            ray.data.from_arrow(t).repartition(5), "source", rates,
            seed=9).to_pandas()
        # a: every row exactly twice, epochs {0,1}
        a = out[out["source"] == "a"]
        assert len(a) == 2 * (n // 4)
        assert set(a["epoch"]) == {0, 1}
        assert a.groupby("doc_id").size().eq(2).all()
        # c dropped entirely; d (unlisted) passes through once
        assert (out["source"] == "c").sum() == 0
        d = out[out["source"] == "d"]
        assert len(d) == n // 4 and (d["epoch"] == 0).all()
        # b: exactly the ids whose hash falls under the 0.5 cut
        b_ids = np.arange(n)[np.arange(n) % 4 == 1]
        keep = b_ids[shuffle_hash(b_ids, 9) < 2147483648]
        assert sorted(out[out["source"] == "b"]["doc_id"]) == sorted(keep)

    def test_layout_independence_and_null_source(self, ray_session):
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.sample import mixture_sample

        t = pa.table({
            "doc_id": pa.array(np.arange(300, dtype=np.int64)),
            "source": pa.array(["x" if i % 3 else None for i in range(300)]),
        })
        one = mixture_sample(ray.data.from_arrow(t), "source",
                             {"x": 0.25}, default_rate=1.0).to_pandas()
        many = mixture_sample(ray.data.from_arrow(t).repartition(7),
                              "source", {"x": 0.25},
                              default_rate=1.0).to_pandas()
        key = ["doc_id", "epoch"]
        pd.testing.assert_frame_equal(
            one.sort_values(key).reset_index(drop=True),
            many.sort_values(key).reset_index(drop=True))
        # null sources took the default rate 1.0 (kept once)
        assert (one["source"].isna().sum() == 100)


class TestGlobalQuantiles:
    def test_matches_numpy_with_refinement_passes(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.stats import global_quantiles

        rng = np.random.RandomState(5)
        v = np.concatenate([rng.lognormal(3, 2, 4000),
                            rng.rand(2000) * 1e-3, [7.5] * 500])
        t = pa.table({"x": pa.array(v)})
        # band_limit 50 forces several counting passes before the pull
        out = global_quantiles(
            ray.data.from_arrow(t).repartition(6), "x",
            qs=(0.1, 0.5, 0.9), names=("p10", "p50", "p90"),
            bins=16, band_limit=50).to_pylist()[0]
        exp = np.quantile(v, [0.1, 0.5, 0.9], method="linear")
        assert out["p10"] == pytest.approx(exp[0], rel=1e-12)
        assert out["p50"] == pytest.approx(exp[1], rel=1e-12)
        assert out["p90"] == pytest.approx(exp[2], rel=1e-12)

    def test_heavy_duplicates_ulp_guard(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.stats import global_quantiles

        # one value dominates: intervals collapse to a single ULP and must
        # resolve WITHOUT a band pull larger than band_limit
        v = np.concatenate([np.full(5000, 42.0), [1.0, 99.0]])
        t = pa.table({"x": pa.array(v)})
        out = global_quantiles(
            ray.data.from_arrow(t).repartition(4), "x",
            qs=(0.5,), names=("p50",), bins=8, band_limit=10,
            max_passes=80).to_pylist()[0]
        assert out["p50"] == 42.0

    def test_nulls_and_empty(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.stats import global_quantiles

        t = pa.table({"x": pa.array([None, 3.0, None, 1.0, 2.0])})
        out = global_quantiles(ray.data.from_arrow(t), "x",
                               qs=(0.5,), names=("p50",)).to_pylist()[0]
        assert out["p50"] == 2.0
        allnull = pa.table({"x": pa.array([None, None], pa.float64())})
        assert global_quantiles(ray.data.from_arrow(allnull), "x",
                                qs=(0.5,), names=("p50",)).num_rows == 0

    def test_block_layout_invariance(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.stats import global_quantiles

        rng = np.random.RandomState(9)
        t = pa.table({"x": pa.array(rng.randn(3000))})
        kw = dict(qs=(0.25, 0.75), names=("a", "b"), bins=8, band_limit=40)
        one = global_quantiles(ray.data.from_arrow(t), "x", **kw).to_pylist()
        many = global_quantiles(ray.data.from_arrow(t).repartition(11),
                                "x", **kw).to_pylist()
        assert one == many


class TestBigramLogprob:
    def test_matches_hand_model(self, ray_session):
        import math

        import ray.data

        from fluent_bit_ray.ops.text import bigram_logprob

        # corpus: "a b a" | "a b" | "c" | "" ->
        # bigrams: (a,b):2 (b,a):1; prefixes: a:2 b:1; V = 3 (a,b,c)
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["a b a", "a  b", "c", "  "], pa.string()),
        }))
        out = {r["doc_id"]: r["nll"]
               for r in bigram_logprob(ds, k_smooth=0.5).take_all()}
        # docs 2 (one token) and 3 (empty) omitted
        assert set(out) == {0, 1}
        p_ab = (2 + 0.5) / (2 + 0.5 * 3)
        p_ba = (1 + 0.5) / (1 + 0.5 * 3)
        assert out[0] == pytest.approx(
            (-math.log(p_ab) - math.log(p_ba)) / 2)
        assert out[1] == pytest.approx(-math.log(p_ab))

    def test_matches_duckdb_and_block_invariance(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.text import bigram_logprob

        rng = np.random.RandomState(11)
        words = ["the", "cat", "sat", "on", "mat", "dog", "ran", "x9"]
        docs = [" ".join(rng.choice(words, rng.randint(0, 9)))
                for _ in range(120)]
        docs[5], docs[17] = "", "solo"
        df = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64),
                           "text": docs})
        one = bigram_logprob(
            ray.data.from_pandas(df)).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)
        many = bigram_logprob(
            ray.data.from_pandas(df).repartition(7)).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(one, many, rtol=1e-12, atol=1e-12)
        duckdb.register("documents", df)
        exp = duckdb.sql(
            "WITH toks AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN []"
            " ELSE string_split_regex(trim(text), '\\s+') END AS t "
            "FROM documents), "
            "flat AS (SELECT unnest(t) AS w FROM toks), "
            "v AS (SELECT count(DISTINCT w)::DOUBLE AS v FROM flat), "
            "big AS (SELECT doc_id, t[i] AS u, t[i + 1] AS w FROM "
            "(SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks "
            "WHERE len(t) >= 2)), "
            "bc AS (SELECT u, w, count(*)::BIGINT AS c FROM big "
            "GROUP BY u, w), "
            "pf AS (SELECT u, sum(c)::BIGINT AS cu FROM bc GROUP BY u) "
            "SELECT b.doc_id, avg(-ln((bc.c + 0.5) / (pf.cu + 0.5 * v.v)))"
            " AS nll FROM big b JOIN bc ON b.u = bc.u AND b.w = bc.w "
            "JOIN pf ON b.u = pf.u, v GROUP BY b.doc_id ORDER BY doc_id"
        ).df()
        assert len(one) == len(exp)
        assert np.allclose(one["nll"], exp["nll"], rtol=1e-10, atol=1e-10)


@pytest.mark.usefixtures("ray_session")
class TestDecontaminate:
    """Benchmark decontamination: train windows matched against the bench
    corpus by exact k-token sequence."""

    def _run(self, train, bench, **kw):
        import pyarrow as _pa
        import ray.data

        from fluent_bit_ray.ops.dedup import decontaminate

        out = decontaminate(
            ray.data.from_arrow(_pa.Table.from_pylist(train)),
            ray.data.from_arrow(_pa.Table.from_pylist(bench)),
            **kw,
        )
        return {r["doc_id"]: r["contaminated_windows"] for r in out.to_pylist()}

    def test_clone_partial_and_clean(self):
        bench = [{"doc_id": 100, "text": "q a b c d z"}]
        got = self._run(
            [
                {"doc_id": 0, "text": "q a b c d z"},     # full clone: 4 windows
                {"doc_id": 1, "text": "x a b c y"},        # shares "a b c" only
                {"doc_id": 2, "text": "totally clean doc"},
                {"doc_id": 3, "text": "a b"},              # shorter than k
            ],
            bench,
            span_k=3,
        )
        assert got == {0: 4, 1: 1}

    def test_repeated_window_counts_each_occurrence(self):
        got = self._run(
            [{"doc_id": 0, "text": "a b c x a b c"}],
            [{"doc_id": 9, "text": "a b c"}],
            span_k=3,
        )
        assert got == {0: 2}

    def test_no_overlap_empty(self):
        got = self._run(
            [{"doc_id": 0, "text": "p q r s"}],
            [{"doc_id": 9, "text": "x y z w"}],
            span_k=3,
        )
        assert got == {}

    def test_bloom_gate_identical_to_exact(self):
        # a tiny bitset (2^10 bits) forces real Bloom collisions; the
        # string-exact join must still yield the exact path's counts
        train = [
            {"doc_id": i, "text": " ".join(f"w{(i * 31 + j) % 97}"
                                           for j in range(12))}
            for i in range(40)
        ] + [{"doc_id": 100, "text": "a b c d e f g h"}]
        bench = [{"doc_id": 900, "text": "a b c d e f g h"},
                 {"doc_id": 901, "text": " ".join(f"w{j}" for j in range(20))}]
        exact = self._run(train, bench, span_k=4)
        bloom = self._run(train, bench, span_k=4, bloom_bits=10)
        assert bloom == exact
        assert exact[100] == 5  # sanity: the clone's 5 windows

    def test_bloom_empty_bench(self):
        got = self._run(
            [{"doc_id": 0, "text": "p q r s"}],
            [{"doc_id": 9, "text": "xy"}],  # shorter than k: no windows
            span_k=3,
            bloom_bits=12,
        )
        assert got == {}


@pytest.mark.usefixtures("ray_session")
class TestLineDedup:
    """C4-style exact line dedup: global first-occurrence, short-line
    bypass, order-preserving reassembly, empty-husk removal."""

    def _run(self, docs, **kw):
        import pyarrow as _pa
        import ray.data

        from fluent_bit_ray.ops.dedup import line_dedup

        out = line_dedup(ray.data.from_arrow(_pa.Table.from_pylist(docs)), **kw)
        return {r["doc_id"]: r["text"] for r in out.to_pylist()}

    def test_first_occurrence_wins_and_husks_drop(self):
        got = self._run([
            {"doc_id": 0, "text": "the same long line here\nunique to zero\n\nshort"},
            {"doc_id": 1, "text": "the same long line here\nunique to one"},
            {"doc_id": 2, "text": "the same long line here"},
            {"doc_id": 3, "text": ""},
        ])
        assert got == {
            0: "the same long line here\nunique to zero\n\nshort",
            1: "unique to one",
            3: "",
        }  # doc 2 fully deduped away

    def test_within_doc_duplicates(self):
        got = self._run([
            {"doc_id": 5, "text": "repeated paragraph text\nmiddle line stays\nrepeated paragraph text"},
        ])
        assert got == {5: "repeated paragraph text\nmiddle line stays"}

    def test_min_len_bypass(self):
        got = self._run(
            [{"doc_id": 0, "text": "aa\naa"}, {"doc_id": 1, "text": "aa"}],
            min_len=2,
        )
        assert got == {0: "aa"}  # with min_len=2 both 'aa' dedupe
        got = self._run(
            [{"doc_id": 0, "text": "aa\naa"}, {"doc_id": 1, "text": "aa"}],
            min_len=10,
        )
        assert got == {0: "aa\naa", 1: "aa"}  # short lines always kept


@pytest.mark.usefixtures("ray_session")
class TestLshLabelPropagation:
    """minhash_lsh_dedup propagates labels to a fixpoint: transitive
    bucket-overlap chains (A~B, B~C, A!~C) collapse into one component,
    so every rep maps to itself by construction."""

    def _docs(self):
        import pyarrow as _pa
        import ray.data

        a = " ".join(f"alpha{i}" for i in range(60))
        c = " ".join(f"omega{i}" for i in range(60))
        b = a + " " + c  # bridges a and c; a and c share no shingles
        return ray.data.from_arrow(_pa.Table.from_pylist([
            {"doc_id": 0, "text": a},
            {"doc_id": 1, "text": b},
            {"doc_id": 2, "text": c},
            {"doc_id": 3, "text": "totally unrelated content standing alone"},
        ]))

    def test_chain_collapses_to_component_min(self):
        reps = {r["doc_id"]: r["rep_id"] for r in dedup.minhash_lsh_dedup(
            self._docs(), bands=32, shingle_k=3).to_pylist()}
        assert reps == {0: 0, 1: 0, 2: 0, 3: 3}

    def test_one_round_exhibits_the_chain(self):
        # documents WHY propagation exists: without it, C points at B
        # while B points at A
        reps = {r["doc_id"]: r["rep_id"] for r in dedup.minhash_lsh_dedup(
            self._docs(), bands=32, shingle_k=3, propagate=False).to_pylist()}
        assert reps[1] == 0 and reps[2] == 1

    def test_reps_self_map(self):
        reps = {r["doc_id"]: r["rep_id"] for r in dedup.minhash_lsh_dedup(
            self._docs(), bands=32, shingle_k=3).to_pylist()}
        for d, r in reps.items():
            assert reps[r] == r


class TestConnectedComponents:
    def test_chain_and_isolate_across_shards(self):
        import ray.data

        from fluent_bit_ray.ops.graph import connected_components

        edges = ray.data.from_items([
            {"src": 11, "dst": 10}, {"src": 11, "dst": 12},
            {"src": 12, "dst": 13},              # chain 10-11-12-13
            {"src": 20, "dst": 21},              # pair
            {"src": 30, "dst": 30},              # isolated self-loop
        ]).repartition(4)
        out = connected_components(edges, num_shards=3)
        got = dict(zip(out["node"].to_pylist(), out["component"].to_pylist()))
        assert got == {10: 10, 11: 10, 12: 10, 13: 10,
                       20: 20, 21: 20, 30: 30}
        assert out.schema.field("node").type == pa.int64()

    def test_matches_union_find_on_random_graph(self):
        import random

        import ray.data

        from fluent_bit_ray.ops.graph import connected_components

        rng = random.Random(7)
        n = 400
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(300)]

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        seen = set()
        for a, b in edges:
            seen.update((a, b))
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {v: min(u for u in seen if find(u) == find(v))
                for v in seen}

        ds = ray.data.from_items(
            [{"src": a, "dst": b} for a, b in edges]).repartition(5)
        out = connected_components(ds, num_shards=4)
        got = dict(zip(out["node"].to_pylist(), out["component"].to_pylist()))
        assert got == want

    def test_empty_and_table_input(self):
        from fluent_bit_ray.ops.graph import connected_components

        empty = connected_components(pa.table({
            "src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}))
        assert empty.num_rows == 0
        one = connected_components(
            pa.table({"src": [5], "dst": [3]}),
            node_out="doc_id", comp_out="component")
        assert one.column_names == ["doc_id", "component"]
        got = dict(zip(one["doc_id"].to_pylist(),
                       one["component"].to_pylist()))
        assert got == {3: 3, 5: 3}


class TestUnpivot:
    def test_melt_keeps_nulls_and_order_free(self):
        import ray.data

        from fluent_bit_ray.ops.stats import unpivot

        ds = ray.data.from_arrow(pa.table({
            "id": [1, 2],
            "a": [10.0, None],   # NULL cell -> NULL row, kept
            "b": pa.array([3, 4], pa.int64()),  # int casts to float64
            "extra": ["x", "y"],  # not selected: pruned away
        })).repartition(2)
        out = unpivot(ds, ["id"], ["a", "b"]).take_all()
        got = sorted((r["id"], r["variable"], r["value"]) for r in out)
        assert got == [(1, "a", 10.0), (1, "b", 3.0),
                       (2, "a", None), (2, "b", 4.0)]
        assert all(set(r) == {"id", "variable", "value"} for r in out)


class TestRollup:
    def test_levels_and_repartition(self):
        import ray.data

        from fluent_bit_ray.ops.stats import rollup_sum

        rows = [
            {"a": "x", "b": "p", "v": 1},
            {"a": "x", "b": "p", "v": 2},
            {"a": "x", "b": "q", "v": 4},
            {"a": "y", "b": "p", "v": 8},
        ]
        out = rollup_sum(ray.data.from_items(rows).repartition(3),
                         "a", "b", "v", out="s")
        got = {(r["a"], r["b"]): r["s"] for r in out.to_pylist()}
        assert got == {
            ("x", "p"): 3.0, ("x", "q"): 4.0, ("y", "p"): 8.0,
            ("x", None): 7.0, ("y", None): 8.0, (None, None): 15.0,
        }
        assert out.schema.field("s").type == pa.float64()


class TestGlobalSort:
    def test_rank_matches_sorted_order(self):
        import ray.data

        from fluent_bit_ray.ops.sample import global_sort

        rows = [{"id": i, "v": float(i % 5)} for i in range(40)]
        out = global_sort(
            ray.data.from_items(rows).repartition(6),
            ["v", "id"], descending=[True, False],
        ).take_all()
        want = sorted(rows, key=lambda r: (-r["v"], r["id"]))
        by_rank = {r["rn"]: (r["v"], r["id"]) for r in out}
        assert len(by_rank) == 40 and min(by_rank) == 1  # dense 1-based
        for rn, w in enumerate(want, start=1):
            assert by_rank[rn] == (w["v"], w["id"])


class TestInvertedIndex:
    def test_postings_distinct_sorted(self):
        import ray.data

        from fluent_bit_ray.ops.text import inverted_index

        ds = ray.data.from_items([
            {"doc_id": 3, "text": "b a b b"},   # b posts once for doc 3
            {"doc_id": 1, "text": "a c"},
            {"doc_id": 2, "text": "  "},         # empty: no postings
        ]).repartition(3)
        out = inverted_index(ds)
        got = {r["token"]: (r["df"], r["postings"])
               for r in out.to_pylist()}
        assert got == {"a": (2, "1,3"), "b": (1, "3"), "c": (1, "1")}

    def test_min_df(self):
        import ray.data

        from fluent_bit_ray.ops.text import inverted_index

        ds = ray.data.from_items([
            {"doc_id": 1, "text": "x y"}, {"doc_id": 2, "text": "x"}])
        out = inverted_index(ds, min_df=2)
        assert out["token"].to_pylist() == ["x"]


class TestFunnel:
    def test_steps_misses_and_inclusive_boundary(self):
        import datetime as dt

        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.windows import funnel

        t = lambda m: dt.datetime(2024, 1, 1, 0, m)
        rows = [
            # u1 converts: click@1 -> buy@3 (buy@0 is BEFORE click: ignored)
            {"u": 1, "e": "click", "ts": t(1)},
            {"u": 1, "e": "buy", "ts": t(0)},
            {"u": 1, "e": "buy", "ts": t(3)},
            # u2: same-timestamp buy converts (inclusive >=)
            {"u": 2, "e": "click", "ts": t(5)},
            {"u": 2, "e": "buy", "ts": t(5)},
            # u3: click only
            {"u": 3, "e": "click", "ts": t(2)},
            # u4: buy but never clicked -> excluded entirely
            {"u": 4, "e": "buy", "ts": t(9)},
        ]
        out = funnel(ray.data.from_items(rows).repartition(3),
                     "u", "e", "ts", steps=["click", "buy"],
                     num_shards=4).take_all()
        got = {r["u"]: (r["click_ts"], r["buy_ts"]) for r in out}
        assert set(got) == {1, 2, 3}
        assert got[1] == (t(1), t(3))
        assert got[2] == (t(5), t(5))
        assert got[3][0] == t(2) and pd.isna(got[3][1])


class TestCharEntropy:
    def test_known_values_and_empty(self):
        import math

        from fluent_bit_ray.ops.text import char_entropy_batch

        t = pa.table({"doc_id": [1, 2, 3, 4],
                      "text": ["aaaa",          # 0 bits
                               "ab",            # 1 bit
                               "abcd",          # 2 bits
                               ""]})            # empty -> NULL/NaN
        out = char_entropy_batch(t)
        got = dict(zip(out["doc_id"].to_pylist(),
                       out["entropy"].to_pylist()))
        assert got[1] == 0.0
        assert math.isclose(got[2], 1.0)
        assert math.isclose(got[3], 2.0)
        assert got[4] is None or got[4] != got[4]  # null or NaN


class TestPagerank:
    def test_matches_dense_reference(self):
        import ray.data

        from fluent_bit_ray.ops.graph import pagerank

        edges = [(0, 1), (1, 0), (1, 2), (2, 0), (3, 0)]  # 3 dangles? no:
        # every node has an out-edge except none (3 has one); 0,1,2 cycle
        out = pagerank(
            ray.data.from_items([{"src": a, "dst": b} for a, b in edges])
            .repartition(3),
            damping=0.85, iters=10, num_shards=3)
        got = dict(zip(out["node"].to_pylist(), out["rank"].to_pylist()))

        # dense reference with identical semantics
        nodes = sorted({n for e in edges for n in e})
        idx = {n: i for i, n in enumerate(nodes)}
        deg = {n: sum(1 for a, _ in edges if a == n) for n in nodes}
        r = {n: 1.0 for n in nodes}
        for _ in range(10):
            inc = {n: 0.0 for n in nodes}
            for a, b in edges:
                inc[b] += r[a] / deg[a]
            r = {n: 0.15 + 0.85 * inc[n] for n in nodes}
        assert set(got) == set(nodes)
        for n in nodes:
            assert abs(got[n] - r[n]) < 1e-12, (n, got[n], r[n])
        # sanity: the hub (0) outranks the leaf (3)
        assert got[0] > got[3]

    def test_dangling_leaks_and_empty(self):
        from fluent_bit_ray.ops.graph import pagerank

        # 5 -> 6, 6 dangles: 6 receives, never sends
        out = pagerank(pa.table({"src": [5], "dst": [6]}), iters=3)
        got = dict(zip(out["node"].to_pylist(), out["rank"].to_pylist()))
        base = 1.0 - 0.85
        assert abs(got[5] - base) < 1e-12  # no in-edges: base only
        assert abs(got[6] - (base + 0.85 * base)) < 1e-12
        empty = pagerank(pa.table({"src": pa.array([], pa.int64()),
                                   "dst": pa.array([], pa.int64())}))
        assert empty.num_rows == 0


class TestKeyedCorr:
    def test_matches_numpy(self):
        import ray.data

        from fluent_bit_ray.ops.stats import keyed_corr

        rng = np.random.RandomState(7)
        k = rng.randint(0, 5, 400)
        x = rng.rand(400) * 100
        y = 3.0 * x + rng.rand(400) * 40
        ds = ray.data.from_arrow(pa.table(
            {"k": k, "x": x, "y": y})).repartition(5)
        out = keyed_corr(ds, "k", "x", "y").to_pandas().set_index("k")
        for kk in range(5):
            sel = k == kk
            assert out.loc[kk, "n_pairs"] == sel.sum()
            assert abs(out.loc[kk, "corr"]
                       - np.corrcoef(x[sel], y[sel])[0, 1]) < 1e-9
            sl, ic = np.polyfit(x[sel], y[sel], 1)
            assert abs(out.loc[kk, "slope"] - sl) < 1e-9
            assert abs(out.loc[kk, "intercept"] - ic) < 1e-6

    def test_null_pairs_and_degenerate(self):
        from fluent_bit_ray.ops.stats import keyed_corr

        t = pa.table({
            "k": ["a", "a", "a", "b", "c", "c"],
            "x": [1.0, 2.0, None, 5.0, 1.0, 1.0],   # b: single pair
            "y": [2.0, 4.0, 9.0, None, 3.0, 4.0],   # c: zero x-variance
        })
        import ray.data

        out = keyed_corr(ray.data.from_arrow(t), "k", "x", "y")
        d = {r["k"]: r for r in out.to_pylist()}
        assert d["a"]["n_pairs"] == 2 and abs(d["a"]["corr"] - 1.0) < 1e-12
        assert d["a"]["slope"] == 2.0 and d["a"]["intercept"] == 0.0
        assert d["b"]["n_pairs"] == 0 and d["b"]["corr"] is None
        assert d["c"]["corr"] is None and d["c"]["slope"] is None


class TestModePerKey:
    def test_mode_and_tiebreak(self):
        import ray.data

        from fluent_bit_ray.ops.stats import mode_per_key

        t = pa.table({
            "k": ["u1"] * 5 + ["u2"] * 4 + ["u3"],
            "v": ["b", "b", "a", "c", "b",      # u1: b wins on count
                  "z", "a", "z", "a",           # u2: tie -> smallest (a)
                  None],                        # u3: only null -> no row
        })
        out = mode_per_key(ray.data.from_arrow(t).repartition(3), "k", "v")
        d = {r["k"]: (r["mode"], r["n_mode"]) for r in out.to_pylist()}
        assert d["u1"] == ("b", 3)
        assert d["u2"] == ("a", 2)
        assert "u3" not in d


class TestSetOp:
    def _mk(self, rows):
        import ray.data
        return ray.data.from_arrow(pa.table({"k": rows})).repartition(2)

    def test_intersect_and_except_distinct(self):
        from fluent_bit_ray.ops.joins import set_op

        a = self._mk(["x", "x", "y", "z", None])
        b = self._mk(["y", "y", "w", None])
        inter = set_op(a, b, ["k"], "intersect")
        got = sorted(inter["k"].to_pylist(), key=lambda v: (v is None, v))
        assert got == ["y", None]  # NULLs compare equal in SQL set ops
        a2 = self._mk(["x", "x", "y", "z", None])
        b2 = self._mk(["y", "y", "w", None])
        exc = set_op(a2, b2, ["k"], "except")
        assert sorted(exc["k"].to_pylist()) == ["x", "z"]

    def test_multicol_and_empty(self):
        import ray.data

        from fluent_bit_ray.ops.joins import set_op

        a = ray.data.from_arrow(pa.table(
            {"k": ["a", "a", "b"], "v": [1, 2, 1]}))
        b = ray.data.from_arrow(pa.table(
            {"k": ["a", "b"], "v": [2, 9]}))
        inter = set_op(a, b, ["k", "v"], "intersect")
        assert inter.to_pylist() == [{"k": "a", "v": 2}]
        empty = set_op(
            ray.data.from_arrow(pa.table({"k": pa.array([], pa.string()),
                                          "v": pa.array([], pa.int64())})),
            b, ["k", "v"], "intersect")
        assert empty is None or empty.num_rows == 0

    def test_both_sides_empty_returns_typed_table(self):
        # regression: hash_exchange yields None when no tuple survives;
        # set_op must return an empty TYPED table (like hash_join), not
        # None, or the driver's to_pandas(None) crashes
        import ray.data

        from fluent_bit_ray.ops.joins import set_op

        e1 = ray.data.from_arrow(pa.table(
            {"k": pa.array([], pa.string()), "v": pa.array([], pa.int64())}))
        e2 = ray.data.from_arrow(pa.table(
            {"k": pa.array([], pa.string()), "v": pa.array([], pa.int64())}))
        out = set_op(e1, e2, ["k", "v"], "intersect")
        assert out is not None and out.num_rows == 0
        assert out.schema.names == ["k", "v"]
        assert out.schema.types == [pa.string(), pa.int64()]


class TestGlobalRankFeatures:
    def test_matches_sql_semantics(self):
        import ray.data

        from fluent_bit_ray.ops.sample import global_rank_features

        n, k = 103, 8  # 103 = 8*12+7: first 7 tiles get 13 rows
        vals = (np.arange(n) * 37) % n  # a permutation
        ds = ray.data.from_arrow(pa.table(
            {"id": np.arange(n), "v": vals})).repartition(5)
        out = (global_rank_features(ds, ["v"], descending=[True], tiles=k)
               .to_pandas().sort_values("rn").reset_index(drop=True))
        assert list(out["v"]) == sorted(vals, reverse=True)
        assert list(out["rn"]) == list(range(1, n + 1))
        assert np.allclose(out["pct_rank"],
                           (np.arange(n)) / (n - 1))
        # ntile: first n%k buckets take ceil(n/k), the rest floor(n/k)
        sizes = out.groupby("tile").size()
        assert list(sizes.index) == list(range(1, k + 1))
        assert list(sizes) == [13] * 7 + [12]

    def test_more_tiles_than_rows_and_single(self):
        import ray.data

        from fluent_bit_ray.ops.sample import global_rank_features

        out = global_rank_features(
            ray.data.from_arrow(pa.table({"v": [5, 1, 9]})),
            ["v"], tiles=10).to_pandas().sort_values("rn")
        assert list(out["tile"]) == [1, 2, 3]
        one = global_rank_features(
            ray.data.from_arrow(pa.table({"v": [4]})), ["v"]).to_pandas()
        assert one["pct_rank"][0] == 0.0 and one["tile"][0] == 1


class TestTriangleCounts:
    def test_matches_bruteforce_random(self):
        import itertools

        import ray.data

        from fluent_bit_ray.ops.graph import triangle_counts

        rng = np.random.RandomState(11)
        n = 60
        # dense-ish random graph, shipped with dups and both orientations
        pairs = {(a, b) for a, b in zip(rng.randint(0, n, 700),
                                        rng.randint(0, n, 700)) if a != b}
        und = {(min(a, b), max(a, b)) for a, b in pairs}
        rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
        ds = ray.data.from_items(
            [{"src": a, "dst": b} for a, b in rows]).repartition(4)
        out = triangle_counts(ds)
        got = dict(zip(out["node"].to_pylist(),
                       out["triangles"].to_pylist()))

        adj = {v: set() for v in range(n)}
        for a, b in und:
            adj[a].add(b)
            adj[b].add(a)
        want = {}
        ntri = 0
        for a, b, c in itertools.combinations(range(n), 3):
            if b in adj[a] and c in adj[a] and c in adj[b]:
                ntri += 1
                for v in (a, b, c):
                    want[v] = want.get(v, 0) + 1
        assert got == want
        assert sum(got.values()) == 3 * ntri

    def test_no_triangles_and_empty(self):
        from fluent_bit_ray.ops.graph import triangle_counts

        # a path graph has no triangles
        out = triangle_counts(pa.table({"src": [1, 2, 3],
                                        "dst": [2, 3, 4]}))
        assert out.num_rows == 0
        empty = triangle_counts(pa.table({"src": pa.array([], pa.int64()),
                                          "dst": pa.array([], pa.int64())}))
        assert empty.num_rows == 0


class TestFuzzySelfJoin:
    def test_levenshtein_kernel(self):
        from fluent_bit_ray.ops.fuzzy import levenshtein_pairs

        a = ["kitten", "", "abc", "中文", "flaw", "same"]
        b = ["sitting", "abc", "", "中x", "lawn", "same"]
        # byte-level distances (中=3 bytes, 文=3, x=1)
        assert list(levenshtein_pairs(a, b)) == [3, 3, 3, 3, 2, 0]

    def test_matches_bruteforce(self):
        import itertools

        import ray.data

        from fluent_bit_ray.ops.fuzzy import fuzzy_self_join

        rng = np.random.RandomState(3)
        words = ["".join(rng.choice(list("abcd"), rng.randint(2, 12)))
                 for _ in range(80)]
        ds = ray.data.from_items(
            [{"id": i, "s": w} for i, w in enumerate(words)]
        ).repartition(4)
        out = fuzzy_self_join(ds, "id", "s", max_dist=2)
        got = {(r["id_a"], r["id_b"]): r["dist"]
               for r in (out.to_pylist() if out is not None else [])}

        def lev(x, y):
            import functools

            @functools.lru_cache(maxsize=None)
            def d(i, j):
                if i == 0:
                    return j
                if j == 0:
                    return i
                return min(d(i - 1, j) + 1, d(i, j - 1) + 1,
                           d(i - 1, j - 1) + (x[i - 1] != y[j - 1]))
            return d(len(x), len(y))

        want = {}
        for i, j in itertools.combinations(range(80), 2):
            dd = lev(words[i], words[j])
            if dd <= 2:
                want[(i, j)] = dd
        assert got == want


class TestSkyline2D:
    def test_matches_bruteforce(self):
        import ray.data

        from fluent_bit_ray.ops.stats import skyline_2d

        rng = np.random.RandomState(5)
        x = rng.randint(0, 40, 300).astype(float)
        y = rng.randint(0, 40, 300).astype(float)
        x[10], y[10] = x[20], y[20]  # duplicate point: both must survive
        ds = ray.data.from_arrow(pa.table(
            {"id": np.arange(300), "x": x, "y": y})).repartition(6)
        out = skyline_2d(ds, "x", "y")
        got = sorted(out["id"].to_pylist())

        want = []
        for i in range(300):
            dom = ((x >= x[i]) & (y >= y[i])
                   & ((x > x[i]) | (y > y[i])))
            if not dom.any():
                want.append(i)
        assert got == sorted(want)
        if 10 in want:
            assert 20 in want

    def test_nan_and_null_excluded(self):
        import ray.data

        from fluent_bit_ray.ops.stats import skyline_2d

        t = pa.table({"id": [1, 2, 3], "x": [1.0, None, 9.0],
                      "y": [1.0, 99.0, 9.0]})
        out = skyline_2d(ray.data.from_arrow(t), "x", "y")
        assert out["id"].to_pylist() == [3]

    def test_neg_inf_point_stays_on_frontier(self):
        # regression: the old -inf "no previous group" sentinel dropped
        # a real y == -inf point in the best-x group even though no
        # other row dominates it (e.g. log(0)-derived scores)
        import ray.data

        from fluent_bit_ray.ops.stats import skyline_2d

        t = pa.table({"id": [1, 2], "x": [5.0, 1.0],
                      "y": [-np.inf, 0.0]})
        out = skyline_2d(ray.data.from_arrow(t), "x", "y")
        assert sorted(out["id"].to_pylist()) == [1, 2]


class TestCountDistinctPerKey:
    def test_exact(self):
        import ray.data

        from fluent_bit_ray.ops.stats import count_distinct_per_key

        t = pa.table({
            "k": ["a", "a", "a", "b", "b", "c"],
            "v": ["x", "x", "y", "z", None, None],
        })
        out = count_distinct_per_key(
            ray.data.from_arrow(t).repartition(3), "k", "v")
        d = dict(zip(out["k"].to_pylist(), out["n_distinct"].to_pylist()))
        assert d == {"a": 2, "b": 1, "c": 0}


class TestCubeSum:
    def test_matches_pandas_cube(self):
        import ray.data

        from fluent_bit_ray.ops.stats import cube_sum

        rng = np.random.RandomState(2)
        k1 = rng.choice(["p", "q", "r"], 200)
        k2 = rng.choice(["x", "y"], 200)
        v = rng.rand(200)
        out = cube_sum(ray.data.from_arrow(pa.table(
            {"k1": k1, "k2": k2, "v": v})).repartition(4), "k1", "k2", "v")
        got = {(r["k1"], r["k2"]): r["sum_value"] for r in out.to_pylist()}

        import itertools
        want = {}
        for a, b in itertools.product(["p", "q", "r"], ["x", "y"]):
            want[(a, b)] = v[(k1 == a) & (k2 == b)].sum()
        for a in ["p", "q", "r"]:
            want[(a, None)] = v[k1 == a].sum()
        for b in ["x", "y"]:
            want[(None, b)] = v[k2 == b].sum()
        want[(None, None)] = v.sum()
        assert set(got) == set(want)
        for key in want:
            assert abs(got[key] - want[key]) < 1e-9, key


class TestMovingAvg:
    def _run(self, df, window=4, parts=3):
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.windows import moving_avg

        ds = ray.data.from_pandas(pd.DataFrame(df)).repartition(parts)
        out = moving_avg(ds, "user_id", "ts", "value", "event_id",
                         window=window)
        return (out.to_pandas()
                .sort_values(["user_id", "event_id"])
                .reset_index(drop=True))

    def test_matches_pandas_rolling(self):
        import pandas as pd

        rng = np.random.RandomState(7)
        n = 400
        df = {
            "user_id": rng.randint(0, 20, n),
            "event_id": np.arange(n),
            "ts": pd.to_datetime(rng.randint(0, 10**6, n), unit="s"),
            "value": np.where(rng.rand(n) < 0.15, np.nan, rng.rand(n) * 100),
        }
        got = self._run(df)
        ref = (pd.DataFrame(df).sort_values(["user_id", "ts", "event_id"])
               .reset_index(drop=True))
        ref["mov_avg"] = (ref.groupby("user_id")["value"]
                          .rolling(4, min_periods=1).mean()
                          .reset_index(level=0, drop=True))
        ref = ref.sort_values(["user_id", "event_id"]).reset_index(drop=True)
        assert np.allclose(got["mov_avg"], ref["mov_avg"], equal_nan=True)

    def test_all_null_frame_is_null(self):
        import pandas as pd

        df = {
            "user_id": [1, 1, 1],
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime([1, 2, 3], unit="s"),
            "value": [np.nan, np.nan, 5.0],
        }
        got = self._run(df, window=2, parts=1)
        assert np.isnan(got["mov_avg"][0]) and np.isnan(got["mov_avg"][1])
        assert got["mov_avg"][2] == 5.0  # nulls excluded from denominator


class TestWeightedSample:
    def test_partition_independent_and_deterministic(self):
        import ray.data

        from fluent_bit_ray.ops.sample import weighted_sample

        t = pa.table({"doc_id": np.arange(200, dtype=np.int64),
                      "w": np.ones(200)})
        a = weighted_sample(ray.data.from_arrow(t), "w", "doc_id",
                            k=10, seed=3)
        b = weighted_sample(ray.data.from_arrow(t).repartition(7), "w",
                            "doc_id", k=10, seed=3)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
        assert a["skey"].to_pylist() == b["skey"].to_pylist()

    def test_nonpositive_weights_never_win_and_k_truncates(self):
        import ray.data

        from fluent_bit_ray.ops.sample import weighted_sample

        t = pa.table({"doc_id": np.arange(8, dtype=np.int64),
                      "w": [1.0, 0.0, -2.0, np.nan, 1.0, 1.0, 1.0, 1.0]})
        out = weighted_sample(ray.data.from_arrow(t), "w", "doc_id",
                              k=50, seed=1)
        assert sorted(out["doc_id"].to_pylist()) == [0, 4, 5, 6, 7]

    def test_weight_bias(self):
        # one row with overwhelming weight wins essentially always:
        # P(miss) = (1 - u)^(1/w) with w = 10^6 -> negligible
        import ray.data

        from fluent_bit_ray.ops.sample import weighted_sample

        n = 500
        w = np.ones(n)
        w[123] = 1e6
        t = pa.table({"doc_id": np.arange(n, dtype=np.int64), "w": w})
        wins = 0
        for seed in range(5):
            out = weighted_sample(ray.data.from_arrow(t).repartition(4),
                                  "w", "doc_id", k=1, seed=seed)
            wins += out["doc_id"].to_pylist() == [123]
        assert wins >= 4


class TestBM25:
    def _ref(self, docs, terms, k1=1.2, b=0.75):
        import math

        toks = [d.split() for d in docs]
        n = len(docs)
        avgdl = sum(len(t) for t in toks) / n
        dfs = [sum(1 for t in toks if term in t) for term in terms]
        out = []
        for t in toks:
            s = 0.0
            for term, df in zip(terms, dfs):
                tf = t.count(term)
                idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
                denom = tf + k1 * (1 - b + b * len(t) / avgdl)
                s += idf * tf * (k1 + 1) / denom
            out.append(s)
        return out

    def test_matches_reference(self):
        import ray.data

        from fluent_bit_ray.ops.text import bm25_scores

        docs = ["the cat sat", "the the the dog", "cat cat cat cat",
                "", "  ", "dog and cat and mouse", "unrelated words here"]
        t = pa.table({"doc_id": np.arange(len(docs), dtype=np.int64),
                      "text": docs})
        out = (bm25_scores(ray.data.from_arrow(t).repartition(3),
                           terms=["cat", "dog"])
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        ref = self._ref(docs, ["cat", "dog"])
        assert np.allclose(out["bm25"], ref)
        assert out["bm25"][3] == 0.0 and out["bm25"][6] == 0.0

    def test_absent_term_scores_zero_contribution(self):
        import ray.data

        from fluent_bit_ray.ops.text import bm25_scores

        t = pa.table({"doc_id": [1, 2], "text": ["a b", "b c"]})
        out = (bm25_scores(ray.data.from_arrow(t), terms=["zzz"])
               .to_pandas())
        assert (out["bm25"] == 0.0).all()


class TestFullOuterJoin:
    def _mk(self, rows, key_type=pa.int64()):
        import ray.data
        return ray.data.from_arrow(pa.table(
            {"k": pa.array([r[0] for r in rows], key_type),
             "v": pa.array([r[1] for r in rows], pa.int64())})).repartition(2)

    def test_outer_matches_duckdb(self):
        import duckdb

        from fluent_bit_ray.ops.joins import hash_join

        left = [(1, 10), (1, 11), (2, 20), (None, 99), (5, 50)]
        right = [(1, 100), (3, 300), (None, 999), (5, 500), (5, 501)]
        out = hash_join(self._mk(left), self._mk(right), "k", "k",
                        {"v": "lv"}, {"v": "rv"}, how="outer")
        got = (out.to_pandas().sort_values(["k", "lv", "rv"])
               .reset_index(drop=True))
        exp = duckdb.sql("""
            WITH l AS (SELECT * FROM (VALUES (1,10),(1,11),(2,20),
                       (NULL,99),(5,50)) t(k, v)),
                 r AS (SELECT * FROM (VALUES (1,100),(3,300),(NULL,999),
                       (5,500),(5,501)) t(k, v))
            SELECT coalesce(l.k, r.k) AS k, l.v AS lv, r.v AS rv
            FROM l FULL OUTER JOIN r ON l.k = r.k
        """).df().sort_values(["k", "lv", "rv"]).reset_index(drop=True)
        assert len(got) == len(exp)
        for c in ("k", "lv", "rv"):
            a = got[c].astype("float64")
            b = exp[c].astype("float64")
            assert ((a == b) | (a.isna() & b.isna())).all(), c

    def test_outer_string_key_coalesce(self):
        from fluent_bit_ray.ops.joins import hash_join

        out = hash_join(self._mk([("a", 1)], pa.string()),
                        self._mk([("b", 2)], pa.string()),
                        "k", "k", {"v": "lv"}, {"v": "rv"}, how="outer")
        d = {r["k"]: (r["lv"], r["rv"]) for r in out.to_pylist()}
        assert d == {"a": (1, None), "b": (None, 2)}


class TestBoilerplateLines:
    def test_strips_per_group_frequent_lines(self):
        import ray.data

        from fluent_bit_ray.ops.dedup import boilerplate_lines

        hdr = "SHARED HEADER LINE"
        docs, srcs, ids = [], [], []
        for s in ("sa", "sb"):
            for i in range(3):
                ids.append(len(ids))
                srcs.append(s)
                docs.append(f"{hdr}\nunique body {s} {i} xxxx\nok")
        # sb only has the header in 2 docs -> below min_docs=3, kept
        docs[5] = f"unique body sb 2 xxxx\nok"
        t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "source": srcs, "text": docs})
        out = boilerplate_lines(
            ray.data.from_arrow(t).repartition(3), "source",
            min_len=10, min_docs=3)
        d = dict(zip(out["doc_id"].to_pylist(), out["text"].to_pylist()))
        # sa: header in 3 docs -> stripped everywhere ("ok" is short, kept)
        for i in (0, 1, 2):
            assert d[i] == f"unique body sa {i} xxxx\nok"
        # sb: header only in 2 docs -> kept
        assert d[3].startswith(hdr) and d[4].startswith(hdr)
        assert d[5] == "unique body sb 2 xxxx\nok"

    def test_fully_boilerplate_doc_disappears(self):
        import ray.data

        from fluent_bit_ray.ops.dedup import boilerplate_lines

        line = "THE ONLY LINE EVERY DOC HAS"
        t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                      "source": ["s", "s", "s"],
                      "text": [line, line, line]})
        out = boilerplate_lines(ray.data.from_arrow(t), "source",
                                min_len=10, min_docs=3)
        assert out.num_rows == 0


class TestIntervalJoin:
    def test_matches_bruteforce_with_multi_tile_spans(self):
        import ray.data

        from fluent_bit_ray.ops.joins import interval_join

        rng = np.random.RandomState(11)
        n = 120
        tile = 100  # tiny tiles so intervals span MANY tiles
        ks = rng.randint(0, 5, n)
        s = rng.randint(0, 2000, n).astype(np.int64)
        e = s + rng.randint(0, 900, n)  # up to 10 tiles per interval

        def mk(lo, hi):
            return ray.data.from_arrow(pa.table({
                "k": ks[lo:hi].astype(np.int64), "id":
                np.arange(lo, hi, dtype=np.int64),
                "s": s[lo:hi], "e": e[lo:hi]})).repartition(3)

        out = interval_join(mk(0, 60), mk(60, n), "k", "s", "e", "id",
                            tile_us=tile)
        got = sorted(zip(out["l_id"].to_pylist(), out["r_id"].to_pylist(),
                         out["overlap_us"].to_pylist()))
        want = []
        for i in range(60):
            for j in range(60, n):
                if ks[i] == ks[j] and s[i] <= e[j] and s[j] <= e[i]:
                    want.append((i, j, min(e[i], e[j]) - max(s[i], s[j])))
        assert got == sorted(want)  # each pair exactly ONCE (owner tile)

    def test_inverted_and_empty(self):
        import ray.data

        from fluent_bit_ray.ops.joins import interval_join

        l = ray.data.from_arrow(pa.table(
            {"k": [1, 1], "id": [1, 2], "s": [10, 50], "e": [5, 60]}))
        r = ray.data.from_arrow(pa.table(
            {"k": [1], "id": [9], "s": [0], "e": [100]}))
        out = interval_join(l, r, "k", "s", "e", "id", tile_us=16)
        # id=1 is INVERTED (e < s) yet still matches the SQL predicate
        # (l.s=10 <= r.e=100 AND r.s=0 <= l.e=5); id=2 overlaps normally
        got = sorted(zip(out["l_id"].to_pylist(),
                         out["overlap_us"].to_pylist()))
        assert got == [(1, -5), (2, 10)]
        empty = interval_join(
            ray.data.from_arrow(pa.table(
                {"k": pa.array([], pa.int64()), "id": pa.array([], pa.int64()),
                 "s": pa.array([], pa.int64()), "e": pa.array([], pa.int64())})),
            r, "k", "s", "e", "id")
        assert empty.num_rows == 0
        assert empty.schema.names == ["k", "l_id", "r_id", "overlap_us"]
        # a NON-empty block that filters to zero rows map-side (all bounds
        # null) must not crash the repeat/offset arithmetic
        allnull = interval_join(
            ray.data.from_arrow(pa.table(
                {"k": [1, 2], "id": [1, 2],
                 "s": pa.array([None, None], pa.int64()),
                 "e": pa.array([None, None], pa.int64())})),
            r, "k", "s", "e", "id", tile_us=16)
        assert allnull.num_rows == 0


class TestRankPerKey:
    def test_matches_duckdb_rank_semantics(self):
        import duckdb
        import ray.data

        from fluent_bit_ray.ops.windows import rank_per_key

        rng = np.random.RandomState(3)
        n = 300
        t = pa.table({
            "key": rng.choice(["a", "b", "c"], n),
            "event_id": np.arange(n, dtype=np.int64),
            "value": rng.randint(0, 20, n).astype(np.float64),  # many ties
        })
        out = (rank_per_key(ray.data.from_arrow(t).repartition(4),
                            "key", "value", "event_id")
               .to_pandas().sort_values("event_id").reset_index(drop=True))
        duckdb.register("t", t.to_pandas())
        exp = duckdb.sql(
            "SELECT key, event_id, value, rank() OVER w AS rnk, "
            "dense_rank() OVER w AS drnk FROM t "
            "WINDOW w AS (PARTITION BY key ORDER BY value DESC)"
        ).df().sort_values("event_id").reset_index(drop=True)
        assert (out["rnk"].to_numpy() == exp["rnk"].to_numpy()).all()
        assert (out["drnk"].to_numpy() == exp["drnk"].to_numpy()).all()

    def test_nulls_rank_last_as_one_group(self):
        import ray.data

        from fluent_bit_ray.ops.windows import rank_per_key

        t = pa.table({"key": ["a"] * 4, "event_id": [1, 2, 3, 4],
                      "value": [5.0, None, None, 7.0]})
        out = (rank_per_key(ray.data.from_arrow(t), "key", "value")
               .to_pandas().sort_values("event_id").reset_index(drop=True))
        assert list(out["rnk"]) == [2, 3, 3, 1]
        assert list(out["drnk"]) == [2, 3, 3, 1]


class TestTransitionCounts:
    def test_matches_duckdb(self):
        import duckdb
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.windows import transition_counts

        rng = np.random.RandomState(9)
        n = 400
        df = pd.DataFrame({
            "user_id": rng.randint(0, 15, n),
            "event_type": rng.choice(["a", "b", "c", "d"], n),
            "ts": pd.to_datetime(rng.randint(0, 10**5, n), unit="s"),
            "event_id": np.arange(n),
        })
        out = transition_counts(
            ray.data.from_pandas(df).repartition(4))
        got = {(r["from_type"], r["to_type"]): r["n"]
               for r in out.to_pylist()}
        duckdb.register("ev", df)
        exp = duckdb.sql(
            "WITH o AS (SELECT event_type, lag(event_type) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM ev) "
            "SELECT prev, event_type, count(*) n FROM o "
            "WHERE prev IS NOT NULL GROUP BY prev, event_type").df()
        want = {(r.prev, r.event_type): r.n for r in exp.itertuples()}
        assert got == want

    def test_single_event_keys_contribute_nothing(self):
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.windows import transition_counts

        df = pd.DataFrame({
            "user_id": [1, 2, 3],
            "event_type": ["a", "b", "c"],
            "ts": pd.to_datetime([1, 2, 3], unit="s"),
            "event_id": [1, 2, 3],
        })
        out = transition_counts(ray.data.from_pandas(df))
        assert out.num_rows == 0

    def test_null_event_types_match_sql_lag(self):
        import duckdb
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.windows import transition_counts

        # [None, 'a', None]: SQL's WHERE prev IS NOT NULL drops the
        # (NULL->'a') pair (lag can't tell it from a first row) but
        # KEEPS ('a'->NULL) — GROUP BY retains NULL groups
        df = pd.DataFrame({
            "user_id": [1, 1, 1, 2, 2],
            "event_type": [None, "a", None, "b", "b"],
            "ts": pd.to_datetime([1, 2, 3, 1, 2], unit="s"),
            "event_id": [1, 2, 3, 4, 5],
        })
        out = transition_counts(ray.data.from_pandas(df).repartition(2))
        got = {(r["from_type"], r["to_type"]): r["n"]
               for r in out.to_pylist()}
        duckdb.register("evn", df)
        exp = duckdb.sql(
            "WITH o AS (SELECT event_type, lag(event_type) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM evn) "
            "SELECT prev, event_type, count(*) n FROM o "
            "WHERE prev IS NOT NULL GROUP BY prev, event_type").df()
        want = {(r.prev, r.event_type): r.n for r in exp.itertuples()}
        assert got == want == {("a", None): 1, ("b", "b"): 1}


class TestCollectPerKey:
    def test_order_and_ties(self):
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.windows import collect_per_key

        df = pd.DataFrame({
            "user_id": [1, 1, 1, 2],
            "event_type": ["z", "a", "m", "q"],
            # equal ts for the first two -> event_id breaks the tie
            "ts": pd.to_datetime([5, 5, 9, 1], unit="s"),
            "event_id": [2, 1, 3, 1],
        })
        out = collect_per_key(ray.data.from_pandas(df).repartition(2))
        d = dict(zip(out.to_pandas()["user_id"],
                     out.to_pandas()["seq"]))
        assert d == {1: "a>z>m", 2: "q"}

    def test_all_null_values_key_kept_with_null_seq(self):
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.windows import collect_per_key

        # string_agg skips nulls but GROUP BY still emits the group:
        # user 2 (all-null values) must appear with seq NULL, user 1's
        # null value is skipped mid-sequence
        df = pd.DataFrame({
            "user_id": [1, 1, 1, 2, 2],
            "event_type": ["a", None, "b", None, None],
            "ts": pd.to_datetime([1, 2, 3, 1, 2], unit="s"),
            "event_id": [1, 2, 3, 4, 5],
        })
        out = collect_per_key(ray.data.from_pandas(df).repartition(2))
        p = out.to_pandas()
        d = dict(zip(p["user_id"], p["seq"]))
        assert d[1] == "a>b"
        assert 2 in d and pd.isna(d[2])


class TestPmiCollocations:
    def test_matches_hand_model(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.text import pmi_collocations

        ds = ray.data.from_arrow(pa.table({
            "text": ["a b a b c", "a b x", "", None, "a b", "   "],
        })).repartition(3)
        out = pmi_collocations(ds, min_count=2)
        assert out.num_rows == 1
        r = out.to_pylist()[0]
        # Nu=10 (a=4,b=4,c=1,x=1), Nb=7, c(a,b)=4:
        # pmi = ln((4/7)/((4/10)*(4/10)))
        assert (r["w1"], r["w2"], r["cnt"]) == ("a", "b", 4)
        assert abs(r["pmi"] - np.log((4 / 7) / (0.4 * 0.4))) < 1e-12

    def test_min_count_and_empty(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.text import pmi_collocations

        ds = ray.data.from_arrow(pa.table({"text": ["a b", "c d"]}))
        out = pmi_collocations(ds, min_count=2)
        assert out.num_rows == 0
        assert out.schema.names == ["w1", "w2", "cnt", "pmi"]
        empty = pmi_collocations(
            ray.data.from_arrow(pa.table({"text": pa.array([], pa.string())})),
            min_count=1)
        assert empty.num_rows == 0

    def test_block_invariance(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.text import pmi_collocations

        rng = np.random.RandomState(5)
        words = np.array(["red", "blue", "fish", "one", "two"])
        docs = [" ".join(rng.choice(words, rng.randint(0, 12)))
                for _ in range(80)]
        t = pa.table({"text": docs})
        a = pmi_collocations(ray.data.from_arrow(t), min_count=3)
        b = pmi_collocations(
            ray.data.from_arrow(t).repartition(7), min_count=3)
        key = lambda tt: sorted(map(tuple, tt.to_pandas().values.tolist()))
        assert key(a) == key(b)
        assert a.num_rows > 0


class TestCountMinSketch:
    def test_never_undercounts_and_bound(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.stats import (cms_estimate, cms_sketch)

        rng = np.random.RandomState(0)
        toks = rng.zipf(1.5, 30000)
        toks = toks[toks < 10**6].astype(str)
        ds = ray.data.from_arrow(pa.table({"w": toks})).repartition(6)
        mat, n = cms_sketch(ds, "w", width=2048, depth=5)
        assert n == len(toks)
        import collections
        exact = collections.Counter(toks.tolist())
        probe = pa.array(list(exact.keys())[:500])
        est = cms_estimate(mat, probe)
        true = np.array([exact[p] for p in probe.to_pylist()])
        assert (est >= true).all()  # hard CMS guarantee

    def test_error_check_pins_zero(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.stats import cms_error_check

        rng = np.random.RandomState(3)
        docs = [" ".join(rng.choice(["a", "b", "c", "dog", "cat"],
                                    rng.randint(1, 40)))
                for _ in range(200)]
        ds = ray.data.from_arrow(pa.table({"text": docs})).repartition(4)
        out = cms_error_check(ds, "text", probes=100, tokenize=True)
        r = out.to_pylist()[0]
        assert r["under_violations"] == 0
        assert r["over_violations"] == 0
        assert r["n_probes"] == 5  # only 5 distinct tokens exist
        assert r["total_items"] == sum(len(d.split()) for d in docs)

    def test_merge_is_block_invariant(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.stats import cms_sketch

        t = pa.table({"w": [str(i % 37) for i in range(4000)]})
        m1, n1 = cms_sketch(ray.data.from_arrow(t), "w", width=512, depth=4)
        m2, n2 = cms_sketch(ray.data.from_arrow(t).repartition(9), "w",
                            width=512, depth=4)
        assert n1 == n2 == 4000
        assert (m1 == m2).all()


class TestWindowDedup:
    def test_matches_duckdb_qualify(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.windows import window_dedup

        rng = np.random.RandomState(7)
        n = 500
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, 8, n),
            "event_type": rng.choice(["a", "b", None], n),
            "ts": pd.to_datetime(rng.randint(0, 10**4, n), unit="s"),
            "value": rng.rand(n),
        })
        out = window_dedup(ray.data.from_pandas(df).repartition(4),
                           window_us=600_000_000).to_pandas()
        duckdb.register("ev", df)
        exp = duckdb.sql(
            "SELECT event_id FROM ev QUALIFY row_number() OVER ("
            "PARTITION BY user_id, event_type, epoch_us(ts) // 600000000 "
            "ORDER BY ts, event_id) = 1").df()
        assert sorted(out["event_id"]) == sorted(exp["event_id"])

    def test_null_ts_group_together(self, ray_session):
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.windows import window_dedup

        df = pd.DataFrame({
            "event_id": [1, 2, 3, 4],
            "user_id": [1, 1, 1, 1],
            "event_type": ["x", "x", "x", "y"],
            "ts": pd.to_datetime([None, None, 5_000_000_000, None]),
            "value": [0.0, 0.0, 0.0, 0.0],
        })
        out = window_dedup(ray.data.from_pandas(df), window_us=1_000_000)
        # (1,x,NULL-bucket) keeps id 1 (lowest id); (1,x,real bucket)
        # keeps id 3; (1,y,NULL) keeps id 4
        assert sorted(out.to_pandas()["event_id"]) == [1, 3, 4]


class TestLateEvents:
    def test_matches_duckdb_watermark(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.windows import late_events

        rng = np.random.RandomState(11)
        n = 600
        df = pd.DataFrame({
            "user_id": rng.randint(0, 10, n),
            "arr": rng.permutation(n).astype(np.int64),
            "ts": pd.to_datetime(rng.randint(0, 10**6, n), unit="s"),
        })
        out = late_events(ray.data.from_pandas(df).repartition(5),
                          id_col="arr", allowed_us=100_000_000_000
                          ).to_pandas()
        duckdb.register("eva", df)
        exp = duckdb.sql(
            "WITH o AS (SELECT user_id, arr, epoch_us(ts) t, "
            "max(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY arr "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) pm FROM eva) "
            "SELECT user_id, arr, pm - t AS lateness_us FROM o "
            "WHERE t < pm - 100000000000").df()
        k = lambda d: sorted(map(tuple, d[["user_id", "arr", "lateness_us"]]
                                 .values.tolist()))
        assert k(out) == k(exp)
        assert len(exp) > 0

    def test_null_ts_never_late_never_advances(self, ray_session):
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.windows import late_events

        df = pd.DataFrame({
            "user_id": [1, 1, 1, 1],
            "arr": [1, 2, 3, 4],
            "ts": pd.to_datetime([10**9, None, 10, 10**9 + 5], unit="s"),
        })
        out = late_events(ray.data.from_pandas(df), id_col="arr",
                          allowed_us=1_000_000).to_pandas()
        # arr=2 (null ts): not late; arr=3: late vs arr=1's watermark
        # (the null row between them must not reset it); arr=4: on time
        assert sorted(out["arr"]) == [3]


class TestRangeLookupEnrich:
    def test_hits_misses_and_nulls(self, ray_session):
        import ray.data

        from fluent_bit_ray.stages.enrich import range_lookup_enrich

        ranges = pa.table({
            "lo": [100, 300, 50],        # deliberately unsorted
            "hi": [199, 399, 80],
            "country": ["mid", "high", "low"],
        })
        ds = ray.data.from_arrow(pa.table({
            "v": pa.array([150, 100, 199, 200, 99, 300, 399, 1, 80,
                           None], pa.int64()),
        })).repartition(3)
        out = range_lookup_enrich(ds, "v", ranges, "lo", "hi"
                                  ).to_pandas().set_index("v")["country"]
        assert out[150] == "mid" and out[100] == "mid" and out[199] == "mid"
        assert out[300] == "high" and out[399] == "high"
        assert out[80] == "low"
        import pandas as pd
        assert pd.isna(out[200]) and pd.isna(out[99]) and pd.isna(out[1])
        assert pd.isna(out[pd.NA] if pd.NA in out.index else
                       out[out.index.isna()].iloc[0])

    def test_matches_sql_between_join(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data

        from fluent_bit_ray.stages.enrich import range_lookup_enrich

        rng = np.random.RandomState(2)
        lo = np.sort(rng.choice(10**6, 40, replace=False)) * 100
        hi = lo + rng.randint(1, 95, 40) * 100  # gaps, non-overlapping
        dims = pd.DataFrame({"lo": lo, "hi": hi,
                             "name": [f"r{i}" for i in range(40)]})
        vals = pd.DataFrame({"v": rng.randint(0, 10**8, 2000)})
        out = range_lookup_enrich(
            ray.data.from_pandas(vals).repartition(4), "v",
            pa.Table.from_pandas(dims), "lo", "hi").to_pandas()
        duckdb.register("dims", dims)
        duckdb.register("vals", vals)
        exp = duckdb.sql("SELECT v, d.name FROM vals LEFT JOIN dims d "
                         "ON v >= d.lo AND v <= d.hi").df()
        k = lambda d: sorted(map(tuple, d[["v", "name"]].astype(object)
                                 .where(d[["v", "name"]].notna(), None)
                                 .values.tolist()))
        assert k(out) == k(exp)

    def test_empty_ranges_all_null(self, ray_session):
        # LEFT semantics with an EMPTY dims table: every payload is null
        # (previously IndexError'd on hi[0] of a zero-length array)
        import ray.data

        from fluent_bit_ray.stages.enrich import range_lookup_enrich

        ranges = pa.table({
            "lo": pa.array([], pa.int64()), "hi": pa.array([], pa.int64()),
            "country": pa.array([], pa.string()),
        })
        ds = ray.data.from_arrow(pa.table({
            "v": pa.array([1, None, 5], pa.int64())}))
        out = range_lookup_enrich(ds, "v", ranges, "lo", "hi").to_pandas()
        assert len(out) == 3 and out["country"].isna().all()

    def test_nullable_values_above_2pow53_stay_exact(self, ray_session):
        # one null in the column must NOT force an int64->float64 detour:
        # 2^53+1 would round to 2^53 and match the WRONG range
        import ray.data

        from fluent_bit_ray.stages.enrich import range_lookup_enrich

        big = 2 ** 53
        ranges = pa.table({
            "lo": pa.array([big, big + 1], pa.int64()),
            "hi": pa.array([big, big + 1], pa.int64()),
            "name": ["exact", "plus_one"],
        })
        ds = ray.data.from_arrow(pa.table({
            "v": pa.array([big + 1, None], pa.int64())}))
        out = range_lookup_enrich(ds, "v", ranges, "lo", "hi"
                                  ).to_pandas()
        hit = out[out["v"].notna()]["name"].iloc[0]
        assert hit == "plus_one"


class TestCounterRate:
    def test_matches_duckdb_case(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.windows import counter_rate

        rng = np.random.RandomState(6)
        n = 400
        df = pd.DataFrame({
            "user_id": rng.randint(0, 9, n),
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(rng.randint(0, 10**5, n), unit="s"),
            # mostly increasing counter with occasional resets and nulls
            "value": np.where(rng.rand(n) < 0.08, np.nan,
                              np.abs(rng.randn(n)).cumsum()
                              * np.where(rng.rand(n) < 0.05, 0.01, 1.0)),
        })
        out = counter_rate(ray.data.from_pandas(df).repartition(4)
                           ).to_pandas()
        duckdb.register("evr", df)
        exp = duckdb.sql(
            "WITH o AS (SELECT user_id, event_id, value v, "
            "lag(value) OVER w pv, epoch_us(ts) t, "
            "lag(epoch_us(ts)) OVER w pt FROM evr "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
            "SELECT user_id, event_id, CASE WHEN pt IS NULL OR t = pt "
            "OR v IS NULL OR pv IS NULL THEN NULL "
            "WHEN v < pv THEN v / ((t - pt) / 1000000.0) "
            "ELSE (v - pv) / ((t - pt) / 1000000.0) END rate FROM o").df()
        m = out.sort_values(["user_id", "event_id"]).reset_index(drop=True)
        e = exp.sort_values(["user_id", "event_id"]).reset_index(drop=True)
        assert len(m) == len(e) == n
        mr, er = m["rate"].to_numpy(), e["rate"].to_numpy()
        both_nan = np.isnan(mr) & np.isnan(er)
        assert (both_nan | (mr == er)).all()

    def test_reset_and_dt_zero(self, ray_session):
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.windows import counter_rate

        df = pd.DataFrame({
            "user_id": [1, 1, 1, 1, 1],
            "event_id": [1, 2, 3, 4, 5],
            "ts": pd.to_datetime([0, 10, 20, 20, 30], unit="s"),
            "value": [100.0, 150.0, 3.0, 3.0, 9.0],
        })
        out = (counter_rate(ray.data.from_pandas(df)).to_pandas()
               .set_index("event_id")["rate"])
        assert np.isnan(out[1])          # first sample
        assert out[2] == 5.0             # (150-100)/10
        assert out[3] == 0.3             # RESET: 3/10
        assert np.isnan(out[4])          # dt == 0
        assert out[5] == 0.6             # (9-3)/10

    def test_null_ts_sorts_last_and_yields_null(self, ray_session):
        # SQL parity: ASC NULLS LAST — a null-ts row must not become the
        # key's "first" sample via NaT's int64-min epoch and fabricate a
        # rate for the real rows (the previous behavior)
        import duckdb
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.windows import counter_rate

        df = pd.DataFrame({
            "user_id": [1, 1, 1, 2, 2],
            "event_id": [1, 2, 3, 4, 5],
            "ts": pd.to_datetime([10, None, 20, None, None], unit="s"),
            "value": [100.0, 150.0, 200.0, 1.0, 2.0],
        })
        out = (counter_rate(ray.data.from_pandas(df)).to_pandas()
               .set_index("event_id")["rate"])
        duckdb.register("evnull", df)
        exp = duckdb.sql(
            "WITH o AS (SELECT user_id, event_id, value v, "
            "lag(value) OVER w pv, epoch_us(ts) t, "
            "lag(epoch_us(ts)) OVER w pt FROM evnull "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
            "SELECT event_id, CASE WHEN pt IS NULL OR t = pt "
            "OR v IS NULL OR pv IS NULL THEN NULL "
            "WHEN v < pv THEN v / ((t - pt) / 1000000.0) "
            "ELSE (v - pv) / ((t - pt) / 1000000.0) END rate FROM o"
        ).df().set_index("event_id")["rate"]
        for eid in df["event_id"]:
            m, e = out[eid], exp[eid]
            assert (np.isnan(m) and np.isnan(e)) or m == e
        assert out[3] == 10.0  # the one real rate: (200-100)/10s


class TestLogTemplates:
    def test_masks_and_counts(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.text import log_templates

        ds = ray.data.from_arrow(pa.table({"text": [
            "GET /item/42 took 13 ms", "GET /item/7 took 1500 ms",
            "err at 0xDEADbeef code 500", "err at 0x1f code 404",
            None, None,
        ]})).repartition(3)
        out = {r["template"]: r["cnt"]
               for r in log_templates(ds).to_pylist()}
        assert out == {
            "GET /item/<NUM> took <NUM> ms": 2,
            "err at <HEX> code <NUM>": 2,
            None: 2,  # SQL GROUP BY null group
        }

    def test_min_count_and_hex_order(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.text import log_templates

        # hex masking must run BEFORE digit masking or 0x1f would
        # become 0x<NUM>f; a lone "0x" with no digits stays literal
        ds = ray.data.from_arrow(pa.table({"text": [
            "a 0x1f", "a 0xff", "b 9", "plain 0x stays",
        ]}))
        out = {r["template"]: r["cnt"]
               for r in log_templates(ds, min_count=2).to_pylist()}
        assert out == {"a <HEX>": 2}


class TestTailSamplingQuery:
    def test_trigger_users_complete_and_sample_deterministic(
            self, ray_session, sf_dir):
        import duckdb

        from fluent_bit_ray.pipelines.queries import QUERIES, ORACLE_SQL

        t = QUERIES["tail_sampling"](sf_dir)
        df = t.to_pandas() if hasattr(t, "to_pandas") else t
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_dir}/events.parquet'")
        exp = con.sql(ORACLE_SQL["tail_sampling"]).df()
        assert len(df) == len(exp)
        # every event of every triggered user is present
        trig = set(con.sql(
            "SELECT DISTINCT user_id FROM events WHERE "
            "event_type = 'error' AND value > 250").df()["user_id"])
        n_trig_events = con.sql(
            "SELECT count(*) FROM events WHERE user_id IN (SELECT "
            "DISTINCT user_id FROM events WHERE event_type = 'error' "
            "AND value > 250)").fetchone()[0]
        assert (df["user_id"].isin(trig).sum()) == n_trig_events
        # and the sample is a strict subset, i.e. output < input
        total = con.sql("SELECT count(*) FROM events").fetchone()[0]
        assert len(df) < total


class TestResampleFfill:
    def test_hand_model(self, ray_session):
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.windows import resample_ffill

        df = pd.DataFrame({
            "user_id": [1, 1, 1, 2, 1],
            "event_id": [1, 2, 3, 4, 5],
            "ts": pd.to_datetime([0, 5 * 86400, 5 * 86400 + 10,
                                  2 * 86400, None], unit="s"),
            "value": [10.0, None, 20.0, 7.0, 99.0],
        })
        out = (resample_ffill(ray.data.from_pandas(df).repartition(3))
               .to_pandas().sort_values(["user_id", "bucket"]))
        got = list(map(tuple, out.values.tolist()))
        # user 1: days 0..5, gap days carry 10.0 forward; day 5's LAST
        # obs (id 3) wins over the null-valued id 2; null-ts row ignored
        assert got == [(1, 0, 10.0), (1, 1, 10.0), (1, 2, 10.0),
                       (1, 3, 10.0), (1, 4, 10.0), (1, 5, 20.0),
                       (2, 2, 7.0)]

    def test_matches_duckdb_series_fill(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.windows import resample_ffill

        rng = np.random.RandomState(4)
        n = 400
        df = pd.DataFrame({
            "user_id": rng.randint(0, 12, n),
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(rng.randint(0, 40 * 86400, n), unit="s"),
            "value": np.where(rng.rand(n) < 0.15, np.nan, rng.rand(n)),
        })
        out = resample_ffill(ray.data.from_pandas(df).repartition(4),
                             step_us=86_400_000_000).to_pandas()
        duckdb.register("evz", df)
        exp = duckdb.sql("""
            WITH ev AS (SELECT user_id, event_id, value,
              epoch_us(ts) // 86400000000 AS b, epoch_us(ts) AS t
              FROM evz WHERE ts IS NOT NULL),
            obs AS (SELECT user_id, b, value FROM (
              SELECT user_id, b, value, row_number() OVER (
                PARTITION BY user_id, b ORDER BY t DESC, event_id DESC)
                AS rn FROM ev) WHERE rn = 1),
            rng AS (SELECT user_id,
              unnest(generate_series(min(b), max(b))) AS bucket
              FROM ev GROUP BY user_id),
            j AS (SELECT rng.user_id, rng.bucket, obs.value AS v FROM rng
              LEFT JOIN obs ON rng.user_id IS NOT DISTINCT FROM obs.user_id
              AND rng.bucket = obs.b)
            SELECT user_id, bucket, last_value(v IGNORE NULLS) OVER (
              PARTITION BY user_id ORDER BY bucket
              ROWS UNBOUNDED PRECEDING) AS value FROM j""").df()
        k = lambda d: sorted(
            (int(a), int(b), None if pd.isna(v) else round(v, 12))
            for a, b, v in d[["user_id", "bucket", "value"]].values)
        assert k(out) == k(exp)
        assert len(exp) > n  # densified


class TestSkewJoin:
    def _duck(self, lf, rf):
        import duckdb
        duckdb.register("skl", lf)
        duckdb.register("skr", rf)
        return duckdb.sql(
            "SELECT l.k, l.lv, r.rv FROM skl l JOIN skr r ON l.k = r.k"
        ).df()

    @staticmethod
    def _key(d):
        return sorted(map(tuple, d[["k", "lv", "rv"]].astype(object)
                          .values.tolist()))

    def test_matches_plain_inner_join_with_hot_key(self, ray_session):
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.joins import skew_join

        rng = np.random.RandomState(3)
        n = 4000
        # 70% of fact rows on key 0 (the hot key), the rest over 1..199
        k = np.where(rng.rand(n) < 0.7, 0, rng.randint(1, 200, n))
        lf = pd.DataFrame({"k": k, "lv": np.arange(n, dtype=np.int64)})
        # dim with a MANY-row hot key: replication must not dup or drop
        rf = pd.DataFrame({"k": np.r_[0, 0, np.arange(1, 200)],
                           "rv": np.arange(201, dtype=np.int64)})
        out = skew_join(
            ray.data.from_pandas(lf).repartition(5),
            ray.data.from_pandas(rf).repartition(3),
            "k", "k", {"lv": "lv"}, {"rv": "rv"},
            min_hot_count=500, salts=4).to_pandas()
        exp = self._duck(lf, rf)
        assert self._key(out) == self._key(exp)
        # the hot key really was detected (sanity that the salted path ran)
        from fluent_bit_ray.ops.joins import hot_keys
        hot = hot_keys(ray.data.from_pandas(lf), "k", 500)
        assert 0 in hot.to_pylist()

    def test_no_hot_keys_and_nulls(self, ray_session):
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.joins import skew_join

        lf = pd.DataFrame({"k": pd.array([1, 2, None, 3, 2], dtype="Int64"),
                           "lv": np.arange(5, dtype=np.int64)})
        rf = pd.DataFrame({"k": pd.array([2, 3, None, 9], dtype="Int64"),
                           "rv": np.arange(4, dtype=np.int64)})
        out = skew_join(
            ray.data.from_pandas(lf).repartition(2),
            ray.data.from_pandas(rf),
            "k", "k", {"lv": "lv"}, {"rv": "rv"},
            min_hot_count=10**9, salts=8).to_pandas()
        exp = self._duck(lf, rf)  # null keys never match
        assert self._key(out) == self._key(exp) and len(out) == 3


class TestHistogramFixedBins:
    def test_matches_duckdb_width_math(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.stats import histogram_fixed_bins

        rng = np.random.RandomState(7)
        df = pd.DataFrame({"v": np.where(rng.rand(3000) < 0.05, np.nan,
                                         rng.randn(3000) * 37.0 + 11.0)})
        out = histogram_fixed_bins(
            ray.data.from_pandas(df).repartition(6), "v", bins=16
        ).to_pandas().sort_values("bucket").reset_index(drop=True)
        duckdb.register("hv", df)
        exp = duckdb.sql(
            "WITH b AS (SELECT min(v) mn, max(v) mx FROM hv "
            "WHERE v IS NOT NULL) SELECT CASE WHEN mx = mn THEN 0 ELSE "
            "LEAST(CAST(floor((v - mn) / ((mx - mn) / 16.0)) AS BIGINT), "
            "15) END AS bucket, count(*) AS cnt FROM hv, b "
            "WHERE v IS NOT NULL GROUP BY 1 ORDER BY 1").df()
        assert out["bucket"].tolist() == exp["bucket"].tolist()
        assert out["cnt"].tolist() == exp["cnt"].tolist()
        assert out["cnt"].sum() == df["v"].notna().sum()

    def test_constant_and_all_null(self, ray_session):
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.stats import histogram_fixed_bins

        const = histogram_fixed_bins(
            ray.data.from_pandas(pd.DataFrame({"v": [5.0] * 40})), "v",
            bins=8).to_pandas()
        assert const["bucket"].tolist() == [0]
        assert const["cnt"].tolist() == [40]
        nul = histogram_fixed_bins(
            ray.data.from_pandas(pd.DataFrame({"v": [np.nan] * 7})), "v",
            bins=8).to_pandas()
        assert len(nul) == 0


class TestCohortRetention:
    def test_matches_duckdb(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.windows import cohort_retention

        rng = np.random.RandomState(11)
        n = 3000
        df = pd.DataFrame({
            "user_id": rng.randint(0, 120, n).astype(np.float64),
            "ts": pd.to_datetime(rng.randint(0, 40 * 86400, n), unit="s"),
        })
        df.loc[rng.rand(n) < 0.03, "user_id"] = np.nan   # null users drop
        df.loc[rng.rand(n) < 0.03, "ts"] = pd.NaT        # null ts drop
        out = cohort_retention(
            ray.data.from_pandas(df).repartition(7),
            bucket_us=86_400_000_000 * 7).to_pandas()
        duckdb.register("coh", df)
        exp = duckdb.sql(
            "WITH e AS (SELECT user_id, epoch_us(ts) // 604800000000 AS w "
            "FROM coh WHERE ts IS NOT NULL AND user_id IS NOT NULL), "
            "f AS (SELECT user_id, min(w) AS cw FROM e GROUP BY user_id) "
            "SELECT f.cw AS cohort_bucket, e.w - f.cw AS bucket_offset, "
            "count(DISTINCT e.user_id) AS users FROM e JOIN f "
            "USING (user_id) GROUP BY 1, 2").df()
        k = lambda d: sorted(map(tuple, d[
            ["cohort_bucket", "bucket_offset", "users"]
        ].astype(np.int64).values.tolist()))
        assert k(out) == k(exp)
        # every user's offset-0 cell exists: sum of cohort sizes = users
        z = out[out["bucket_offset"] == 0]["users"].sum()
        assert z == df.dropna(subset=["user_id", "ts"])["user_id"].nunique()


class TestUrlCanonicalize:
    def test_rules_match_duckdb_regexp_chain(self, ray_session):
        import duckdb
        import pandas as pd

        from fluent_bit_ray.ops.text import url_canonicalize_batch

        urls = [
            "https://EX.com/A?utm_source=s&b=2#frag",  # utm-first tail
            "https://ex.com/a?b=2&utm_medium=m",
            "https://ex.com/a#only-frag",
            "https://ex.com/a?utm_only=1",
            "https://ex.com/a",
            "HTTPS://UPPER.ORG/P?UTM_X=1",             # rules run on lower()
            None,
            "",
        ]
        out = url_canonicalize_batch(
            pa.table({"url": pa.array(urls, pa.string())}))
        duckdb.register("uc", pd.DataFrame({"url": urls}))
        exp = duckdb.sql(
            "SELECT regexp_replace(regexp_replace(regexp_replace("
            "lower(coalesce(url, '')), '#.*$', '', 'g'), "
            "'[?&]utm_[^&#]*', '', 'g'), '\\?$', '', 'g') AS canon FROM uc"
        ).df()["canon"].tolist()
        assert out["canon"].to_pylist() == exp
        # spot semantics: fragment and dangling '?' gone, case folded
        got = dict(zip(urls, out["canon"].to_pylist()))
        assert got["https://ex.com/a#only-frag"] == "https://ex.com/a"
        assert got["https://ex.com/a?utm_only=1"] == "https://ex.com/a"
        assert got["HTTPS://UPPER.ORG/P?UTM_X=1"] == "https://upper.org/p"
        assert got[None] == ""


class TestUnionEvolved:
    def test_null_fill_and_int_promotion(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.schema import union_evolved

        a = ray.data.from_arrow(pa.table({
            "id": pa.array([1, 2], pa.int32()),      # promotes to int64
            "v": pa.array([1.5, 2.5], pa.float64()),
        })).repartition(2)
        b = ray.data.from_arrow(pa.table({
            "id": pa.array([3, 4], pa.int64()),
            "tag": pa.array(["x", "y"], pa.string()),
        }))
        out = union_evolved([a, b]).to_pandas()
        assert sorted(out.columns) == ["id", "tag", "v"]
        assert sorted(out["id"].tolist()) == [1, 2, 3, 4]
        byid = out.set_index("id")
        import pandas as pd
        assert pd.isna(byid.loc[1, "tag"]) and pd.isna(byid.loc[3, "v"])
        assert byid.loc[3, "tag"] == "x" and byid.loc[1, "v"] == 1.5

    def test_three_way_and_single(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.schema import union_evolved

        parts = [ray.data.from_arrow(pa.table({c: pa.array([i], pa.int64())}))
                 for i, c in enumerate("abc")]
        out = union_evolved(parts).to_pandas()
        assert len(out) == 3 and sorted(out.columns) == ["a", "b", "c"]
        assert out["a"].notna().sum() == 1
        one = union_evolved([parts[0]]).to_pandas()
        assert one["a"].tolist() == [0]


class TestIntervalMerge:
    def test_matches_duckdb_islands(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.windows import interval_merge

        rng = np.random.RandomState(17)
        n = 4000
        df = pd.DataFrame({
            "user_id": rng.randint(0, 80, n),
            "s": rng.randint(0, 100_000, n).astype(np.int64),
        })
        df["e"] = df["s"] + rng.randint(0, 3000, n)
        out = interval_merge(
            ray.data.from_pandas(df).repartition(9)).to_pandas()
        duckdb.register("iv", df)
        exp = duckdb.sql(
            "WITH o AS (SELECT user_id, s, e, max(e) OVER ("
            "PARTITION BY user_id ORDER BY s, e ROWS BETWEEN UNBOUNDED "
            "PRECEDING AND 1 PRECEDING) AS pm FROM iv), "
            "g AS (SELECT user_id, s, e, sum(CASE WHEN pm IS NULL OR "
            "s > pm THEN 1 ELSE 0 END) OVER (PARTITION BY user_id "
            "ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS isl FROM o) "
            "SELECT user_id, min(s) AS span_start, max(e) AS span_end, "
            "count(*) AS n_intervals FROM g GROUP BY user_id, isl").df()
        k = lambda d: sorted(map(tuple, d[
            ["user_id", "span_start", "span_end", "n_intervals"]
        ].astype(np.int64).values.tolist()))
        assert k(out) == k(exp)
        # spans per key never overlap and cover every interval
        assert out["n_intervals"].sum() == n

    def test_touching_and_contained(self, ray_session):
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.windows import interval_merge

        df = pd.DataFrame({
            "user_id": [1, 1, 1, 1, 2],
            "s": [0, 10, 3, 40, 5],
            "e": [10, 20, 7, 50, 6],   # [3,7] contained; [10,20] touches
        })
        out = interval_merge(ray.data.from_pandas(df)).to_pandas()
        got = sorted(map(tuple, out[
            ["user_id", "span_start", "span_end", "n_intervals"]
        ].values.tolist()))
        assert got == [(1, 0, 20, 3), (1, 40, 50, 1), (2, 5, 6, 1)]


class TestLastTouchAttribution:
    def test_matches_duckdb_locf(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.windows import last_touch_attribution

        rng = np.random.RandomState(23)
        n = 5000
        df = pd.DataFrame({
            "user_id": rng.randint(0, 60, n),
            "ts": pd.to_datetime(rng.randint(0, 10 * 86400, n), unit="s"),
            "event_type": rng.choice(["click", "view", "buy"], n,
                                     p=[0.1, 0.7, 0.2]),
            "event_id": np.arange(n, dtype=np.int64),
        })
        df.loc[rng.rand(n) < 0.02, "ts"] = pd.NaT  # null ts sorts last
        out = last_touch_attribution(
            ray.data.from_pandas(df).repartition(8)).to_pandas()
        duckdb.register("att", df)
        exp = duckdb.sql(
            "SELECT user_id, event_id, last_value(CASE WHEN event_type = "
            "'click' THEN event_id END IGNORE NULLS) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS touch_id FROM att").df()
        m = out.set_index("event_id")["touch_id"]
        x = exp.set_index("event_id")["touch_id"]
        assert len(out) == n
        assert ((m.isna() == x.reindex(m.index).isna()) & (
            (m.fillna(-1) == x.reindex(m.index).fillna(-1)))).all()

    def test_self_touch_and_pre_first(self, ray_session):
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.windows import last_touch_attribution

        df = pd.DataFrame({
            "user_id": [1, 1, 1, 2],
            "ts": pd.to_datetime([1, 2, 3, 1], unit="s"),
            "event_type": ["view", "click", "view", "view"],
            "event_id": [10, 11, 12, 20],
        })
        out = last_touch_attribution(
            ray.data.from_pandas(df)).to_pandas().set_index("event_id")
        assert pd.isna(out.loc[10, "touch_id"])     # before first click
        assert out.loc[11, "touch_id"] == 11        # click attributes self
        assert out.loc[12, "touch_id"] == 11
        assert pd.isna(out.loc[20, "touch_id"])     # user with no click


class TestTokenizeIds:
    def test_rank_order_oov_and_empty(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.text import tokenize_ids

        docs = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": ["b b b a a c", "a rare b", "   ", "c a"],
        })
        # counts: a=4 b=4 c=2 rare=1 -> k=2 vocab [(a,0),(b,1)], OOV=2
        out = (tokenize_ids(ray.data.from_arrow(docs).repartition(3), k=2)
               .to_pandas().set_index("doc_id").sort_index())
        assert out.loc[1, "ids"] == "1 1 1 0 0 2"
        assert out.loc[2, "ids"] == "0 2 1"
        assert 3 not in out.index                   # empty doc dropped
        assert out.loc[4, "ids"] == "2 0"
        assert out.loc[1, "n_tokens"] == 6 and out.loc[1, "n_oov"] == 1
        assert out.loc[2, "n_oov"] == 1 and out.loc[4, "n_oov"] == 1

    def test_matches_duckdb(self, ray_session):
        import duckdb
        import ray.data

        from fluent_bit_ray.ops.text import tokenize_ids

        rng = np.random.RandomState(5)
        words = np.array(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"])
        texts = [" ".join(rng.choice(words, rng.randint(0, 12)))
                 for _ in range(400)]
        docs = pa.table({"doc_id": pa.array(range(400), pa.int64()),
                         "text": texts})
        out = (tokenize_ids(ray.data.from_arrow(docs).repartition(5), k=3)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        duckdb.register("tdocs", docs)
        exp = duckdb.sql("""
            WITH toks AS (SELECT doc_id, CASE WHEN
              regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' THEN []
              ELSE string_split_regex(
              regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') END
              AS t FROM tdocs),
            flat AS (SELECT unnest(t) AS token FROM toks),
            v AS (SELECT token, row_number() OVER
              (ORDER BY cnt DESC, token) - 1 AS id FROM
              (SELECT token, count(*)::BIGINT AS cnt FROM flat
               GROUP BY token ORDER BY cnt DESC, token LIMIT 3)),
            tc AS (SELECT doc_id, t FROM toks WHERE len(t) > 0),
            g AS (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i
              FROM tc),
            j AS (SELECT g.doc_id, g.i, coalesce(v.id, 3) AS id FROM g
              LEFT JOIN v ON g.t[g.i] = v.token)
            SELECT doc_id, count(*)::BIGINT AS n_tokens,
              sum(CASE WHEN id = 3 THEN 1 ELSE 0 END)::BIGINT AS n_oov,
              string_agg(id::VARCHAR, ' ' ORDER BY i) AS ids
            FROM j GROUP BY doc_id ORDER BY doc_id""").df()
        assert out["ids"].tolist() == exp["ids"].tolist()
        assert out["n_oov"].tolist() == exp["n_oov"].tolist()


class TestTokenCoverage:
    def test_cumulative_shares(self, ray_session):
        import ray.data

        from fluent_bit_ray.ops.text import token_coverage

        docs = pa.table({
            "text": ["a a a a b b c", "a b c d", ""],
        })
        out = token_coverage(
            ray.data.from_arrow(docs).repartition(2), k=3).to_pandas()
        # counts: a=5 b=3 c=2 d=1, total 11
        assert out["token"].tolist() == ["a", "b", "c"]
        assert out["rank"].tolist() == [1, 2, 3]
        assert out["cnt"].tolist() == [5, 3, 2]
        assert np.allclose(out["coverage"], [5 / 11, 8 / 11, 10 / 11])


class TestReservoirPerKey:
    def test_deterministic_and_uniform_contract(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.sample import reservoir_per_key

        rng = np.random.RandomState(3)
        n = 3000
        df = pd.DataFrame({
            "user_id": rng.randint(0, 40, n),
            "event_id": np.arange(n, dtype=np.int64),
        })
        a = reservoir_per_key(
            ray.data.from_pandas(df).repartition(4),
            "user_id", "event_id", n=5).to_pandas()
        b = reservoir_per_key(
            ray.data.from_pandas(df).repartition(11),
            "user_id", "event_id", n=5).to_pandas()
        k = lambda d: sorted(map(tuple, d[
            ["user_id", "event_id"]].values.tolist()))
        assert k(a) == k(b)                 # block-layout independent
        duckdb.register("rsv", df)
        exp = duckdb.sql(
            "SELECT user_id, event_id FROM (SELECT user_id, event_id, "
            "row_number() OVER (PARTITION BY user_id ORDER BY "
            "(event_id * 2654435761) % 4294967296, event_id) AS rn "
            "FROM rsv) WHERE rn <= 5").df()
        assert k(a) == k(exp)
        assert a.groupby("user_id").size().max() <= 5

    def test_small_groups_kept_whole(self, ray_session):
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.sample import reservoir_per_key

        df = pd.DataFrame({"user_id": [1, 1, 2],
                           "event_id": [10, 11, 20]})
        out = reservoir_per_key(
            ray.data.from_pandas(df), "user_id", "event_id", n=5
        ).to_pandas()
        assert len(out) == 3


class TestTimeWeightedAvg:
    def test_hand_case_and_tiebreak(self, ray_session):
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.windows import time_weighted_avg

        df = pd.DataFrame({
            "user_id": [1, 1, 1, 2, 3, 3],
            "ts": pd.to_datetime([0, 10, 30, 5, 7, 7], unit="s"),
            "value": [2.0, 4.0, 9.0, 1.0, 5.0, 8.0],
            "event_id": [1, 2, 3, 4, 6, 5],
        })
        out = time_weighted_avg(
            ray.data.from_pandas(df).repartition(3)
        ).to_pandas().set_index("user_id")
        # user1: 2*10 + 4*20 over span 30 -> 100/30
        assert np.isclose(out.loc[1, "twap"], 100 / 30)
        assert 2 not in out.index           # single event: no span
        assert 3 not in out.index           # equal-ts only: zero span
        assert len(out) == 1

    def test_matches_duckdb(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.windows import time_weighted_avg

        rng = np.random.RandomState(9)
        n = 4000
        df = pd.DataFrame({
            "user_id": rng.randint(0, 50, n),
            "ts": pd.to_datetime(rng.randint(0, 86400, n), unit="s"),
            "value": rng.rand(n) * 100,
            "event_id": np.arange(n, dtype=np.int64),
        })
        df.loc[rng.rand(n) < 0.02, "ts"] = pd.NaT
        df.loc[rng.rand(n) < 0.02, "value"] = np.nan
        out = time_weighted_avg(
            ray.data.from_pandas(df).repartition(7)
        ).to_pandas().sort_values("user_id").reset_index(drop=True)
        duckdb.register("twv", df)
        exp = duckdb.sql(
            "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t, "
            "value AS v FROM twv WHERE ts IS NOT NULL AND value IS NOT "
            "NULL), l AS (SELECT user_id, v, t, lead(t) OVER (PARTITION "
            "BY user_id ORDER BY t, event_id) AS nt FROM e) "
            "SELECT user_id, sum(CASE WHEN nt IS NULL THEN 0 ELSE "
            "v * (nt - t) END) / (max(t) - min(t)) AS twap FROM l "
            "GROUP BY user_id HAVING max(t) > min(t) ORDER BY user_id"
        ).df()
        assert out["user_id"].tolist() == exp["user_id"].tolist()
        assert np.allclose(out["twap"], exp["twap"])


class TestSplitLeakage:
    def test_matches_duckdb(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.dedup import split_leakage

        rng = np.random.RandomState(7)
        # many duplicate texts across scattered ids so splits really mix
        texts = [f"doc {i % 37}" for i in range(2000)]
        df = pd.DataFrame({"doc_id": np.arange(2000, dtype=np.int64),
                           "text": texts})
        out = split_leakage(
            ray.data.from_pandas(df).repartition(8),
            splits={"train": 0.5, "val": 0.25, "test": 0.25}).to_pandas()
        duckdb.register("lk", df)
        exp = duckdb.sql(
            "WITH s AS (SELECT doc_id, text, CASE "
            "WHEN h < 2147483648 THEN 'train' "
            "WHEN h < 3221225472 THEN 'val' ELSE 'test' END AS split "
            "FROM (SELECT doc_id, text, "
            "((doc_id % 4294967296) * 2654435761) % 4294967296 AS h "
            "FROM lk)) "
            "SELECT min(doc_id) AS group_id, count(*) AS n_docs, "
            "count(DISTINCT split) AS n_splits FROM s GROUP BY text "
            "HAVING count(DISTINCT split) > 1").df()
        k = lambda d: sorted(map(tuple, d[
            ["group_id", "n_docs", "n_splits"]
        ].astype(np.int64).values.tolist()))
        assert k(out) == k(exp)
        assert len(out) > 0          # dups this dense must leak

    def test_single_split_groups_excluded(self, ray_session):
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.dedup import split_leakage

        # unique texts can never span >1 split
        df = pd.DataFrame({"doc_id": np.arange(50, dtype=np.int64),
                           "text": [f"unique {i}" for i in range(50)]})
        out = split_leakage(ray.data.from_pandas(df)).to_pandas()
        assert len(out) == 0


class TestAsofTolerance:
    def test_stale_matches_null_like_misses(self, ray_session):
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.joins import asof_join

        left = pd.DataFrame({
            "user_id": [1, 1, 2],
            "event_id": [10, 11, 12],
            "ts": pd.to_datetime(
                ["2024-01-10", "2024-01-20", "2024-01-10"]),
        })
        right = pd.DataFrame({
            "user_id": [1, 2],
            "ts": pd.to_datetime(["2024-01-09", "2024-01-01"]),
            "value": [5.0, 7.0],
        })
        out = asof_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            "user_id", "ts", left_cols=["event_id"],
            right_val_col="value",
            tolerance_us=3 * 86_400_000_000).to_pandas().sort_values(
            "event_id").reset_index(drop=True)
        # event 10: 1 day stale -> match; 11: 11 days -> nulled;
        # 12: 9 days -> nulled
        assert out["asof_value"].fillna(-1).tolist() == [5.0, -1, -1]
        assert out["asof_ts_us"].isna().tolist() == [False, True, True]

    def test_no_tolerance_unchanged(self, ray_session):
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.joins import asof_join

        left = pd.DataFrame({
            "user_id": [1], "event_id": [10],
            "ts": pd.to_datetime(["2024-06-01"])})
        right = pd.DataFrame({
            "user_id": [1], "ts": pd.to_datetime(["2020-01-01"]),
            "value": [5.0]})
        out = asof_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            "user_id", "ts", left_cols=["event_id"],
            right_val_col="value").to_pandas()
        assert out["asof_value"].tolist() == [5.0]  # years stale, still hit


class TestGroupingSets:
    def test_matches_duckdb(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.stats import grouping_sets_sum

        docs = pd.DataFrame({
            "lang": ["en", "en", "de", "de", "fr"],
            "source": ["a", "b", "a", "a", "b"],
            "n_chars": [10, 20, 30, 40, 50],
        })
        got = grouping_sets_sum(
            ray.data.from_pandas(docs).repartition(3),
            "lang", "source", "n_chars", out="sum_chars").to_pandas()
        # fresh connection: the suite registers a global "docs" relation
        # elsewhere, which would shadow this frame's DataFrame
        con = duckdb.connect()
        con.register("docs", docs)
        want = con.sql(
            "SELECT lang, source, CAST(sum(n_chars) AS DOUBLE) AS "
            "sum_chars, CAST(GROUPING(lang, source) AS BIGINT) AS gid "
            "FROM docs GROUP BY GROUPING SETS ((lang, source), (lang), ())"
        ).df()
        key = ["gid", "lang", "source", "sum_chars"]
        g = got[key].fillna("~").sort_values(key).reset_index(drop=True)
        w = want[key].fillna("~").sort_values(key).reset_index(drop=True)
        assert g.values.tolist() == w.values.tolist()

    def test_empty_input(self, ray_session):
        import pandas as pd
        import ray.data

        from fluent_bit_ray.ops.stats import grouping_sets_sum

        docs = pd.DataFrame({"lang": pd.Series([], dtype="object"),
                             "source": pd.Series([], dtype="object"),
                             "n_chars": pd.Series([], dtype="int64")})
        out = grouping_sets_sum(ray.data.from_pandas(docs),
                                "lang", "source", "n_chars")
        assert out.num_rows == 0
