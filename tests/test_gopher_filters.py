"""Hand-computed goldens for the Gopher quality gates (Rae et al. 2021
§A1.1 public rules) — ops/text.gopher_filter_batch. Literal expectations,
independent of the SQL oracle (FIXTURES.md F5 convention)."""

import pyarrow as pa
import pytest

from fluent_bit_ray.ops.text import gopher_filter_batch


def _run(texts):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    return gopher_filter_batch(t).to_pylist()


class TestGopherFilters:
    def test_passing_doc(self):
        text = "the with " + " ".join(["word"] * 58)
        (r,) = _run([text])
        assert r["n_words"] == 60
        assert r["mean_word_len"] == pytest.approx((3 + 4 + 4 * 58) / 60)
        assert r["stop_hits"] == 2
        assert r["alpha_frac"] == 1.0
        assert r["kept"] is True

    def test_word_count_bounds(self):
        (short,) = _run(["the with word"])
        assert short["n_words"] == 3 and short["kept"] is False

    def test_stop_hits_distinct_not_total(self):
        # 'the' five times is ONE distinct hit — below the 2-hit gate
        text = " ".join(["the"] * 5 + ["word"] * 55)
        (r,) = _run([text])
        assert r["stop_hits"] == 1 and r["kept"] is False

    def test_bullet_and_ellipsis_line_fractions(self):
        (r,) = _run(["- a\n- b\n• c\nplain"])
        assert r["bullet_frac"] == pytest.approx(3 / 4)
        (r,) = _run(["done...\nmore…\nplain"])
        assert r["ellipsis_frac"] == pytest.approx(2 / 3)

    def test_symbol_ratio_counts(self):
        # '#' twice + '....' = one non-overlapping '...' -> 3 symbols
        (r,) = _run(["# tag # again ...."])
        assert r["n_words"] == 5
        assert r["symbol_ratio"] == pytest.approx(3 / 5)

    def test_alpha_frac(self):
        (r,) = _run(["abc 123 4x 99"])
        assert r["alpha_frac"] == pytest.approx(2 / 4)

    def test_empty_and_null(self):
        a, b = _run(["", None])
        for r in (a, b):
            assert r["n_words"] == 0
            assert r["mean_word_len"] == 0.0
            assert r["bullet_frac"] == 0.0  # '' is one non-bullet line
            assert r["stop_hits"] == 0
            assert r["kept"] is False

    def test_mean_word_length_upper_bound(self):
        # 60 twelve-char words: mean 12 > 10 -> rejected
        text = "the with " + " ".join(["w" * 12] * 58)
        (r,) = _run([text])
        assert r["mean_word_len"] > 10 and r["kept"] is False
