"""Pure-Python single-process oracle for the flagship weblog pipeline.

Row-at-a-time reference semantics composed from the row-oracle twins of every
stage (Parser.parse_row, *.process_row, Router.route_row) — the equality
oracle for routed-row sets, per-sink aggregates, and the byte-identical
extracted-text invariant (mirrors the reference's runtime black-box test
strategy, SURVEY §5).
"""

from __future__ import annotations

import glob
import os
import re
from collections import defaultdict

import pyarrow.parquet as pq

from ..parsers import DEFAULT_REGISTRY
from ..router import Router
from ..stages.grep import GrepFilter
from ..stages.modify import ModifyFilter
from ..stages.parser_filter import ParserFilter
from ..synth import NOW_YEAR


def run_oracle(pages_dir: str, sinks, bucket_sec: int = 60) -> dict:
    """Returns {"routed": {sink: [(url, extracted_text)]}, "agg": {...}}.

    agg keys: (sink, lang, host, bucket) -> [records, bytes, parse_failures].
    """
    reg = DEFAULT_REGISTRY
    pf_text = ParserFilter(
        "text",
        [reg.get("apache"), reg.get("docker"), reg.get("syslog-rfc3164")],
        reserve_data=True,
        preserve_key=True,
        now_year=NOW_YEAR,
    )
    pf_log = ParserFilter(
        "log", [reg.get("apache")], reserve_data=True, preserve_key=True,
        now_year=NOW_YEAR, set_time=False,
    )
    rename = ModifyFilter(rules=[("hard_rename", "host", "client_host")])
    router = Router([s.route() for s in sinks])
    greps = {s.name: GrepFilter(list(s.grep)) if s.grep else None for s in sinks}
    host_re = re.compile(r"^[a-z]+://([^/]+)")

    routed: dict[str, list] = defaultdict(list)
    agg: dict[tuple, list] = defaultdict(lambda: [0, 0, 0])

    for f in sorted(glob.glob(os.path.join(pages_dir, "*.parquet"))):
        tbl = pq.read_table(f, columns=["url", "warc_ts", "text", "lang"])
        for row in tbl.to_pylist():
            rec = {
                "url": row["url"],
                "warc_ts": row["warc_ts"],
                "text": row["text"],
                "lang": row["lang"],
            }
            # null conventions shared with the engine's partial-agg
            # sentinels (sinks/writers.py) and the DuckDB twin: NULL text
            # is an unparsed 0-byte record, NULL lang/host group as '',
            # a row with neither parsed time nor warc_ts lands in
            # bucket -1, and the tag renders null segments empty so
            # sink_all's '*' still takes the row
            if row["text"] is None:
                ok = False
            else:
                rec = pf_text.process_row(rec)
                ok = rec.pop("_parse_ok", False)
                if rec.get("stream") is not None:
                    rec = pf_log.process_row(rec)
                    rec.pop("_parse_ok", None)
            rec = rename.process_row(rec)
            m = host_re.match(row["url"]) if row["url"] is not None else None
            host = (None if row["url"] is None
                    else (m.group(1) if m else ""))
            rec["host"] = host
            tag = f"web.{row['lang'] or ''}.{host or ''}"
            extracted = rec["log"] if rec.get("log") is not None else row["text"]
            ts = rec.get("_time")
            if ts is None:
                ts = (None if row["warc_ts"] is None
                      else int(row["warc_ts"].timestamp() * 1_000_000) * 1000)
            # pre-epoch event times clamp to bucket 0 (-1 = NULL only;
            # matches writers.py np.maximum and the SQL greatest(...,0))
            bucket = (-1 if ts is None
                      else (max(ts, 0) // 1_000_000_000) // bucket_sec)
            nbytes = (0 if row["text"] is None
                      else len(row["text"].encode()))
            rec["client_host"] = rec.get("client_host")

            for sink in router.route_row(tag):
                g = greps[sink]
                if g is not None and g.process_row(rec) is None:
                    continue
                routed[sink].append((row["url"], extracted))
                k = (sink, row["lang"] or "", host or "", bucket)
                a = agg[k]
                a[0] += 1
                a[1] += nbytes
                a[2] += 0 if ok else 1

    return {"routed": dict(routed), "agg": dict(agg)}
