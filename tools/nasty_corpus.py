"""Build an ADVERSARIAL sf dir for the oracle sweep: clone a testdata
sf dir (symlinks) and replace `documents` with a corpus seeded with the
edge cases the clean synthetic tables never contain — empty text, NULL
text, whitespace-only text, NULL lang/source/n_chars, unicode, embedded
newlines/tabs, a 10k-token doc, exact duplicates, and a shared span at
document END positions (the case the round-4 `_span_tokens` offset bug
silently corrupted).

Usage:
    python tools/nasty_corpus.py [BASE_SF_DIR] [OUT_DIR]
    python tools/check_queries.py OUT_DIR        # the robustness gate

Defaults: BASE=/root/testdata/sf0.001, OUT=/tmp/nasty_sf. doc_ids are
renumbered sequentially (pack_chunks' documented id-sorted input
contract). Every query that reads `documents` must still hash-match its
DuckDB oracle on this corpus; entropy is byte-exact even on the unicode
doc (the oracle expands codepoints to UTF-8 bytes arithmetically).
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def build(base_sf: str, out_dir: str, nasty_events: bool = True) -> str:
    os.makedirs(out_dir, exist_ok=True)
    skip = {"documents.parquet"} | (
        {"events.parquet"} if nasty_events else set())
    for f in os.listdir(base_sf):
        if not f.endswith(".parquet") or f in skip:
            continue
        dst = os.path.join(out_dir, f)
        if not os.path.exists(dst):
            os.symlink(os.path.join(base_sf, f), dst)
    if nasty_events:
        _build_events(base_sf, out_dir)

    base = pq.read_table(os.path.join(base_sf, "documents.parquet"))
    rows = base.to_pylist()
    span = " ".join(f"t{i}" for i in range(20))
    long_doc = "x " * 5000
    nasty = [
        {"text": "", "lang": "en", "source": "web", "n_chars": 0},
        {"text": None, "lang": None, "source": "web", "n_chars": None},
        {"text": "   \t  \n ", "lang": "en", "source": "cc", "n_chars": 8},
        {"text": "solo", "lang": "en", "source": "cc", "n_chars": 4},
        # shared 16+-token span at doc END: catches window-offset shifts
        {"text": "aa " + span, "lang": "en", "source": "web",
         "n_chars": len("aa " + span)},
        {"text": "bb " + span, "lang": "de", "source": "web",
         "n_chars": len("bb " + span)},
        {"text": "dup dup dup dup dup", "lang": "en", "source": "cc",
         "n_chars": 19},
        {"text": "dup dup dup dup dup", "lang": "en", "source": "cc",
         "n_chars": 19},
        {"text": "Ünïcodé tõkens çafé naïve 日本語 テスト мир",
         "lang": "xx", "source": "web", "n_chars": 40},
        {"text": "a\nb\nc\n" + "line one is long enough here\n" * 3,
         "lang": "en", "source": "web", "n_chars": 95},
        {"text": long_doc, "lang": "en", "source": "cc", "n_chars": 10000},
        {"text": "trailing space ", "lang": "en", "source": "web",
         "n_chars": 15},
        {"text": " leading", "lang": "en", "source": "web", "n_chars": 8},
        {"text": "tab\tsep\ttokens", "lang": "en", "source": "cc",
         "n_chars": 14},
        {"text": "", "lang": None, "source": None, "n_chars": 0},
        {"text": "punct!!! ??? ...", "lang": "en", "source": "web",
         "n_chars": 16},
    ]
    for r in nasty:
        r["doc_id"] = None
    # interleave mid-corpus so edge docs land INSIDE blocks, not at ends
    allr = rows[:100] + nasty[:8] + rows[100:300] + nasty[8:] + rows[300:]
    for i, r in enumerate(allr):
        r["doc_id"] = i
    t = pa.Table.from_pylist(allr, schema=base.schema)
    pq.write_table(t, os.path.join(out_dir, "documents.parquet"))
    return out_dir


def _build_events(base_sf: str, out_dir: str) -> None:
    """Adversarial events rows appended with fresh sequential event_ids
    (keeps the file id-sorted): timestamp TIES within one user (window/
    rank tiebreak stress), exact bucket-boundary timestamps (hour/day
    edges), NULL ts/user_id/value/event_type/props, zero and negative
    values, and one NaN value (float aggregate propagation)."""
    import datetime as dt

    base = pq.read_table(os.path.join(base_sf, "events.parquet"))
    next_id = base.num_rows
    T = dt.datetime
    tie = T(2024, 1, 10, 12, 0, 0)
    nasty = [
        # three-way ts tie, one user, distinct types/values
        {"ts": tie, "user_id": 7001, "event_type": "click", "value": 1.0,
         "props": '{"k": 1}'},
        {"ts": tie, "user_id": 7001, "event_type": "view", "value": 2.0,
         "props": '{"k": 2}'},
        {"ts": tie, "user_id": 7001, "event_type": "purchase", "value": 3.0,
         "props": '{"k": 3}'},
        # exact hour and day bucket boundaries
        {"ts": T(2024, 1, 15, 0, 0, 0), "user_id": 7002,
         "event_type": "click", "value": 5.0, "props": '{"k": 4}'},
        {"ts": T(2024, 1, 15, 13, 0, 0), "user_id": 7002,
         "event_type": "purchase", "value": 7.5, "props": '{"k": 5}'},
        # nulls in every nullable column
        {"ts": None, "user_id": 7003, "event_type": "click", "value": 1.0,
         "props": '{"k": 6}'},
        {"ts": T(2024, 1, 16, 1, 2, 3), "user_id": None,
         "event_type": "view", "value": 2.0, "props": '{"k": 7}'},
        {"ts": T(2024, 1, 16, 2, 3, 4), "user_id": 7004,
         "event_type": None, "value": 4.0, "props": '{"k": 8}'},
        {"ts": T(2024, 1, 16, 3, 4, 5), "user_id": 7004,
         "event_type": "purchase", "value": None, "props": '{"k": 9}'},
        {"ts": T(2024, 1, 16, 4, 5, 6), "user_id": 7004,
         "event_type": "click", "value": 6.0, "props": None},
        # zero, negative, NaN values
        {"ts": T(2024, 1, 17, 5, 0, 1), "user_id": 7005,
         "event_type": "purchase", "value": 0.0, "props": '{"k": 10}'},
        {"ts": T(2024, 1, 17, 5, 0, 2), "user_id": 7005,
         "event_type": "purchase", "value": -12.5, "props": '{"k": 11}'},
        # (no NaN value row: DuckDB's STDDEV family ERRORS on NaN input,
        # so NaN parity is oracle-untestable; null value covers the
        # missing-measurement case)
        # a single-event user (degenerate sessions/retention)
        {"ts": T(2024, 1, 18, 6, 7, 8), "user_id": 7006,
         "event_type": "signup", "value": 50.0, "props": '{"k": 13}'},
    ]
    for i, r in enumerate(nasty):
        r["event_id"] = next_id + i
    t = pa.Table.from_pylist(nasty, schema=base.schema)
    pq.write_table(pa.concat_tables([base, t]),
                   os.path.join(out_dir, "events.parquet"))


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/nasty_sf"
    print(build(base, out))
