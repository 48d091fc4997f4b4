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


def build(base_sf: str, out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(base_sf):
        if not f.endswith(".parquet") or f == "documents.parquet":
            continue
        dst = os.path.join(out_dir, f)
        if not os.path.exists(dst):
            os.symlink(os.path.join(base_sf, f), dst)

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


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/nasty_sf"
    print(build(base, out))
