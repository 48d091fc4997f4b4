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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _safe_write(table, path) -> None:
    """Never write THROUGH a stale symlink into the base corpus (the
    r5 incident class): unlink a link first, then write a real file."""
    if os.path.islink(path):
        os.unlink(path)
    pq.write_table(table, path)


def build(base_sf: str, out_dir: str, nasty_events: bool = True) -> str:
    os.makedirs(out_dir, exist_ok=True)
    skip = {"documents.parquet", "embeddings.parquet"} | (
        {"events.parquet"} if nasty_events else set())
    for f in os.listdir(base_sf):
        if not f.endswith(".parquet") or f in skip:
            continue
        dst = os.path.join(out_dir, f)
        if not os.path.exists(dst):
            os.symlink(os.path.join(base_sf, f), dst)
    if nasty_events:
        _build_events(base_sf, out_dir)
    _build_embeddings(base_sf, out_dir)

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
    _safe_write(t, os.path.join(out_dir, "documents.parquet"))
    return out_dir


def _build_embeddings(base_sf: str, out_dir: str) -> None:
    """Adversarial embeddings rows appended with fresh high vec_ids:
    NULL embedding (must DROP in every vector op — the r5 `_batch_matrix`
    silent-scramble regression class), NULL label (hard-negative mining
    must skip it), and an exact duplicate of vector 0 at a high id (a
    cross-id duplicate group the clone augmentations never create).
    Deliberately excluded, with reasons:
      - empty lists: DuckDB list_cosine_similarity ERRORS on dim-0 input,
        so oracle parity is untestable (engine drop is pinned by
        tests/test_vector_nulls.py);
      - ragged dims: a schema violation the engine REJECTS loudly
        (pytest-pinned), not a value-semantics case;
      - NaN components / zero-norm vectors: NaN poisons float compare and
        the zero-norm guard is an engine-side convention DuckDB's NaN
        division cannot mirror."""
    out_path = os.path.join(out_dir, "embeddings.parquet")
    base = pq.read_table(os.path.join(base_sf, "embeddings.parquet"))
    # base-integrity guard: ids must be the pristine 0..n-1 range; a base
    # that already contains appended adversarial rows (id >= n) means a
    # previous run corrupted it — refuse to compound the damage
    ids = base["vec_id"].to_pylist()
    if ids != list(range(len(ids))):
        raise RuntimeError(
            f"base embeddings at {base_sf} are not pristine "
            f"(ids 0..{len(ids) - 1} expected); refusing to build on top"
        )
    next_id = base.num_rows
    dup_vec = base["embedding"][0].as_py()
    nasty = [
        {"vec_id": next_id + 0, "embedding": None, "label": 0},
        {"vec_id": next_id + 1, "embedding": None, "label": None},
        {"vec_id": next_id + 2, "embedding": dup_vec,
         "label": base["label"][0].as_py()},
        {"vec_id": next_id + 3, "embedding": base["embedding"][1].as_py(),
         "label": None},
    ]
    t = pa.Table.from_pylist(nasty, schema=base.schema)
    _safe_write(pa.concat_tables([base, t]), out_path)


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
    _safe_write(pa.concat_tables([base, t]),
                os.path.join(out_dir, "events.parquet"))


def build_pages(out_dir: str = "/tmp/nasty_pages", n_clean: int = 6000) -> str:
    """Adversarial PAGES table (the flagship's north-rule input).

    Clean synthetic rows (fluent_bit_ray.synth.pages_batch — the same
    generator every weblog query/oracle reads) interleaved with rows the
    generator never emits: NULL url/warc_ts/html/text/lang, empty and
    whitespace-only text, invalid-UTF-8 html, html without <body>, json
    arrays (the object-only parser must fail them), syslog year-inject
    boundaries, embedded newlines, duplicate urls, timestamp extremes.

    INVARIANT (asserted here): html_body_text(html) == text byte-exactly
    for every row — the north rule's per-url byte-identity — so
    weblog_from_html stays oracle-comparable on this corpus too.

    Run the gate with the override BOTH sides resolve through
    synth.pages_path:

        python tools/nasty_corpus.py --pages
        FBR_PAGES_OVERRIDE=/tmp/nasty_pages python tools/check_queries.py \\
            /root/testdata/sf0.001 weblog_aggregate weblog_from_html ...
    """
    sys.path.insert(0, REPO)
    from fluent_bit_ray.ops.multimodal import html_body_text
    from fluent_bit_ray.synth import PAGES_SCHEMA, pages_batch

    US = 1_000_000
    T0 = 1519234013 * US  # the clean corpus' BASE_EPOCH, 2018-02-21
    A = ('187.3.2.1 - - [21/Feb/2018:17:26:53 +0000] '
         '"GET /nasty/a.html HTTP/1.0" 503 -')
    A6 = ('::1 - admin [21/Feb/2018:18:00:00 +0100] '
          '"POST /login HTTP/1.1" 500 123')
    AHR = ('9.8.7.6 - - [21/Feb/2018:18:00:00 +0000] '
           '"GET /hour/boundary HTTP/1.0" 200 1024')
    NL = "garbage first line\n" + (
        '5.6.7.8 - - [21/Feb/2018:17:30:00 +0000] '
        '"GET /second/line HTTP/1.0" 200 77')

    def pg(url, ts_us, text, lang):
        html = (None if text is None
                else b"<html><body>" + text.encode() + b"</body></html>")
        return {"url": url, "warc_ts": ts_us, "html": html,
                "text": text, "lang": lang}

    u = "https://nasty.example.dev/p/{}.html".format
    rows = [
        pg(u(0), T0, None, "en"),                       # NULL text+html
        pg(u(1), T0 + US, "", "en"),                    # empty text
        pg(u(2), T0 + 2 * US, "   \t  ", "de"),         # whitespace text
        pg(u(3), T0 + 3 * US, A, "en"),                 # 503 with '-' size
        pg(u(4), T0 + 4 * US, A6, "fr"),                # ::1 host, +0100 tz
        pg(u(5), T0 + 5 * US, A[:38] + "~TRUNC~", "en"),  # truncated apache
        pg(u(6), T0 + 6 * US,
           '{"log":"hello\\n","stream":"stderr",'
           '"time":"2018-02-21T17:26:53.000000000Z"}', "en"),
        pg(u(7), T0 + 7 * US, '["a", 1]', "en"),        # json ARRAY -> fail
        pg(u(8), T0 + 8 * US, "{}", "en"),              # empty json object
        pg(u(9), T0 + 9 * US,
           '{"log":"caf\\u00e9","nested":{"a":[1,2]}}', "ja"),
        pg(u(10), T0 + 10 * US,
           "<13>Feb 21 17:26:53 h1.example.com app: no pid here", "en"),
        pg(u(11), T0 + 11 * US,
           "<13>Dec 31 23:59:59 h2.example.org cron[1]: year boundary",
           "en"),
        pg(u(12), T0 + 12 * US, "~~~###~~~", "xx"),     # pure garbage
        pg(u(13), T0 + 13 * US, NL, "en"),              # embedded newline
        pg(u(14), T0 + 14 * US, "Ünïcodé 日本語 naïve мир", "ja"),
        pg("https://dup.example.com/same.html", T0 + 15 * US, A, "en"),
        pg("https://dup.example.com/same.html", T0 + 16 * US, AHR, "en"),
        pg(None, T0 + 17 * US, AHR, "en"),              # NULL url
        pg("not a url at all", T0 + 18 * US, A, "en"),  # scheme-less url
        pg(u(19), T0 + 19 * US, A, None),               # NULL lang
        pg(u(20), T0 + 20 * US, A, "zz"),               # unknown lang
        pg(u(21), None, A, "en"),                       # NULL warc_ts
        pg(u(22), 0, A, "en"),                          # 1970 epoch
        pg(u(23), 4102444800 * US, A, "en"),            # year 2100
        pg(u(24), T0 + 24 * US, "x " * 5000, "en"),     # 10k-char line
        pg(u(25), T0 + 25 * US, AHR, "es"),             # exact hour bucket
        # invalid UTF-8 in the html BYTES; text is the decode-with-replace
        # of the body span, so the byte-identity invariant still holds
        {"url": u(26), "warc_ts": T0 + 26 * US,
         "html": b"<html><body>\xff\xfebad utf8</body></html>",
         "text": "��bad utf8", "lang": "en"},
        # html WITHOUT <body>: extraction takes the strip-tags fallback
        {"url": u(27), "warc_ts": T0 + 27 * US,
         "html": b"<p>no body here</p>", "text": "no body here",
         "lang": "en"},
        # pre-1970 parsed event time: negative event_ns must clamp to
        # bucket 0 on BOTH sides (engine np.maximum, oracle greatest) —
        # -1 stays reserved for NULL event time (ADVICE r4)
        pg(u(28), T0 + 28 * US,
           '1.2.3.4 - - [21/Feb/1960:17:26:53 +0000] '
           '"GET /pre/epoch HTTP/1.0" 200 10', "en"),
    ]

    clean = pages_batch(0, n_clean).to_pylist()
    for r in clean:
        # to_pylist yields tz-aware datetimes; normalize to epoch us ints
        # so one from_pylist schema application serves both row sources
        r["warc_ts"] = int(r["warc_ts"].timestamp() * US)
    mid = n_clean // 2
    allr = (clean[:100] + rows[:14] + clean[100:mid] + rows[14:]
            + clean[mid:])
    t = pa.Table.from_pylist(allr, schema=PAGES_SCHEMA)

    # assert the north-rule invariant on the corpus we just built
    got = html_body_text(t.select(["html"]), out_col="t")["t"].to_pylist()
    want = t["text"].to_pylist()
    bad = [i for i, (g, w) in enumerate(zip(got, want)) if g != w]
    assert not bad, f"html/text byte-identity broken at rows {bad[:5]}"

    os.makedirs(out_dir, exist_ok=True)
    per = (t.num_rows + 7) // 8
    for p in range(8):
        part = t.slice(p * per, per)
        if part.num_rows:
            pq.write_table(part, os.path.join(out_dir,
                                              f"pages_{p:05d}.parquet"),
                           row_group_size=2048)
    return out_dir


if __name__ == "__main__":
    if "--pages" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--pages"]
        print(build_pages(args[0] if args else "/tmp/nasty_pages"))
    else:
        base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
        out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/nasty_sf"
        print(build(base, out))
