"""DuckDB SQL oracle for the flagship weblog pipeline.

Reproduces parse -> route -> flowcounter (pipelines/weblog.py aggregate_only)
as one ANSI-ish SQL statement over the synthesized pages parquet, so the
driver's side-by-side harness can hash-compare the headline pipeline:

- the 3-parser fallback chain becomes a CASE over (apache regex | JSON
  object | syslog regex) in the engine's order (stages/parser_filter.py);
- event time per kind mirrors functions/timeparse.py: apache `%d/%b/%Y:
  %H:%M:%S %z`, docker ISO-8601 (sub-minute precision is irrelevant to the
  minute bucket, so DuckDB's us truncation of 9-digit fractions is safe),
  syslog with the injected deterministic year 2018; parse failures fall
  back to warc_ts (weblog.py event-time fallback);
- routing fan-out is a UNION ALL of the four DEFAULT_SINKS with their
  Match conditions (tag = web.{lang}.{host}, router.py), sink_errors with
  its grep on code ~ ^5\\d\\d$ (missing code drops, stages/grep.py);
- `(?m)` on every pattern: the engine compiles Onigmo-style line anchors
  (re.MULTILINE), RE2 needs the explicit flag (the docker inner log line
  ends with a real newline).

Regex/format sources: parsers/core.py _STOCK_CONF (apache, syslog-rfc3164),
reference conf/parsers.conf.
"""

from __future__ import annotations

# stock apache pattern with numbered groups (group 6 = code)
_APACHE_RE = (
    r'(?m)^([^ ]*) [^ ]* ([^ ]*) \[([^\]]*)\] '
    r'"(\S+)(?: +([^"]*?)(?: +\S*)?)?" ([^ ]*) ([^ ]*)'
    r'(?: "([^"]*)" "([^"]*)")?$'
)
_SYSLOG_RE = (
    r"(?m)^\<([0-9]+)\>([^ ]* {1,2}[^ ]* [^ ]*) ([^ ]*) "
    r"([a-zA-Z0-9_\/\.\-]*)(?:\[([0-9]+)\])?(?:[^\:]*\:)? *(.*)$"
)
# single source of truth for the 5xx predicate: every weblog oracle builder
# (flagship route, lineage twin, error-rate, burn-rate) must match the
# engine's sink_errors grep exactly. stages/grep.py compiles '^5\d\d$' with
# Onigmo-style multiline anchors; the code capture cannot contain a newline,
# so the (?m) flag is inert in RE2 — kept uniformly so the builders can
# never drift apart on the flag.
_CODE_5XX_PRED = "code IS NOT NULL AND regexp_matches(code, '(?m)^5\\d\\d$')"


def weblog_aggregate_sql(pages_glob: str, now_year: int = 2018,
                         where: str = "") -> str:
    """The flagship oracle over `pages_glob` (a parquet glob path).

    `where` restricts the pages CTE (SQL predicate, no 'WHERE') — used by
    the WARC twin, whose corpus excludes rows a WARC response record
    cannot represent (NULL url/warc_ts/html, sources/warc.write_warc)."""
    where_sql = f"WHERE {where}" if where else ""
    return f"""
WITH pages AS (
  SELECT url, warc_ts, text, lang
  FROM read_parquet('{pages_glob}')
  {where_sql}
),
parsed AS (
  -- null conventions match the engine's partial-agg sentinels
  -- (sinks/writers.py _partial_agg): lang/host group as '', a NULL text
  -- contributes 0 bytes and a parse failure, an unparsable row with a
  -- NULL warc_ts lands in bucket -1
  SELECT
    COALESCE(lang, '') AS lang,
    COALESCE(regexp_extract(url, '^[a-z]+://([^/]+)', 1), '') AS host,
    CAST(COALESCE(strlen(text), 0) AS BIGINT) AS nbytes,
    CASE
      WHEN text IS NULL THEN 'fail'
      WHEN regexp_matches(text, '{_APACHE_RE}') THEN 'apache'
      WHEN json_type(TRY_CAST(text AS JSON)) = 'OBJECT' THEN 'docker'
      WHEN regexp_matches(text, '{_SYSLOG_RE}') THEN 'syslog'
      ELSE 'fail'
    END AS kind,
    text, warc_ts
  FROM pages
),
timed AS (
  SELECT
    lang, host, nbytes, kind,
    CASE kind
      WHEN 'apache' THEN regexp_extract(text, '{_APACHE_RE}', 6)
      WHEN 'docker' THEN regexp_extract(
        json_extract_string(text, '$.log'), '{_APACHE_RE}', 6)
      ELSE NULL
    END AS code,
    COALESCE(
      CASE kind
        WHEN 'apache' THEN epoch_ns(try_strptime(
          regexp_extract(text, '\\[([^\\]]*)\\]', 1),
          '%d/%b/%Y:%H:%M:%S %z'))
        WHEN 'docker' THEN epoch_ns(TRY_CAST(
          json_extract_string(text, '$.time') AS TIMESTAMP_NS))
        WHEN 'syslog' THEN epoch_ns(try_strptime(
          '{now_year} ' || regexp_replace(
            regexp_extract(text, '^\\<[0-9]+\\>([^ ]* {{1,2}}[^ ]* [^ ]*) ', 1),
            ' +', ' ', 'g'),
          '%Y %b %d %H:%M:%S'))
        ELSE NULL
      END,
      epoch_ns(warc_ts)
    ) AS event_ns
  FROM parsed
),
routed AS (
  SELECT 'sink_en' AS sink, * FROM timed WHERE lang = 'en'
  UNION ALL
  SELECT 'sink_intl', * FROM timed WHERE lang IN ('de', 'fr', 'es', 'ja')
  UNION ALL
  SELECT 'sink_all', * FROM timed
  UNION ALL
  SELECT 'sink_errors', * FROM timed
  WHERE {_CODE_5XX_PRED}
)
SELECT
  sink, lang, host,
  -- greatest(...,0): pre-epoch event times clamp to bucket 0 on both
  -- sides (-1 is the NULL sentinel; DuckDB // truncates, numpy floors)
  COALESCE(greatest(event_ns, 0) // 60000000000, -1) AS bucket,
  CAST(count(*) AS BIGINT) AS records,
  CAST(sum(nbytes) AS BIGINT) AS bytes,
  CAST(sum(CASE WHEN kind = 'fail' THEN 1 ELSE 0 END) AS BIGINT)
    AS parse_failures
FROM routed
GROUP BY sink, lang, host, bucket
"""


def _timed_cte(pages_glob: str, now_year: int = 2018) -> str:
    """The shared parse CTE (pages -> parsed -> timed) with method/size
    captures added — the prefix for the weblog analytics oracles."""
    return f"""
WITH pages AS (
  SELECT url, warc_ts, text, lang
  FROM read_parquet('{pages_glob}')
),
parsed AS (
  SELECT
    lang,
    regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
    CASE
      WHEN regexp_matches(text, '{_APACHE_RE}') THEN 'apache'
      WHEN json_type(TRY_CAST(text AS JSON)) = 'OBJECT' THEN 'docker'
      WHEN regexp_matches(text, '{_SYSLOG_RE}') THEN 'syslog'
      ELSE 'fail'
    END AS kind,
    text, warc_ts
  FROM pages
),
timed AS (
  SELECT
    lang, host, kind,
    CASE kind
      WHEN 'apache' THEN regexp_extract(text, '{_APACHE_RE}', 6)
      WHEN 'docker' THEN regexp_extract(
        json_extract_string(text, '$.log'), '{_APACHE_RE}', 6)
      ELSE NULL
    END AS code,
    CASE kind
      WHEN 'apache' THEN regexp_extract(text, '{_APACHE_RE}', 4)
      WHEN 'docker' THEN regexp_extract(
        json_extract_string(text, '$.log'), '{_APACHE_RE}', 4)
      ELSE NULL
    END AS method,
    CASE kind
      WHEN 'apache' THEN regexp_extract(text, '{_APACHE_RE}', 7)
      WHEN 'docker' THEN regexp_extract(
        json_extract_string(text, '$.log'), '{_APACHE_RE}', 7)
      ELSE NULL
    END AS size,
    COALESCE(
      CASE kind
        WHEN 'apache' THEN epoch_ns(try_strptime(
          regexp_extract(text, '\\[([^\\]]*)\\]', 1),
          '%d/%b/%Y:%H:%M:%S %z'))
        WHEN 'docker' THEN epoch_ns(TRY_CAST(
          json_extract_string(text, '$.time') AS TIMESTAMP_NS))
        WHEN 'syslog' THEN epoch_ns(try_strptime(
          '{now_year} ' || regexp_replace(
            regexp_extract(text, '^\\<[0-9]+\\>([^ ]* {{1,2}}[^ ]* [^ ]*) ', 1),
            ' +', ' ', 'g'),
          '%Y %b %d %H:%M:%S'))
        ELSE NULL
      END,
      epoch_ns(warc_ts)
    ) AS event_ns
  FROM parsed
)"""


def weblog_error_rate_sql(pages_glob: str, now_year: int = 2018) -> str:
    """Per (host, hour): request count + 4xx/5xx counts — the SRE error
    dashboard over the same parse semantics as the flagship."""
    return _timed_cte(pages_glob, now_year) + f"""
SELECT
  host,
  -- engine sentinel parity: a row with neither parsed time nor warc_ts
  -- lands in bucket -1 (sinks/writers.py _partial_agg convention)
  COALESCE(greatest(event_ns, 0) // 3600000000000, -1) AS bucket,
  count(*)::BIGINT AS records,
  sum(CASE WHEN code IS NOT NULL AND regexp_matches(code, '(?m)^4\\d\\d$')
      THEN 1 ELSE 0 END)::BIGINT AS n_4xx,
  sum(CASE WHEN {_CODE_5XX_PRED}
      THEN 1 ELSE 0 END)::BIGINT AS n_5xx
FROM timed GROUP BY host, bucket
"""


def weblog_method_bytes_sql(pages_glob: str, now_year: int = 2018) -> str:
    """Per HTTP method: request count + summed response bytes (numeric
    size captures only — '-' and junk are NULL on both sides)."""
    return _timed_cte(pages_glob, now_year) + """
SELECT
  method,
  count(*)::BIGINT AS requests,
  sum(CASE WHEN regexp_matches(size, '^\\d+$')
      THEN CAST(size AS BIGINT) END)::BIGINT AS bytes_out
FROM timed WHERE method IS NOT NULL AND method <> '' GROUP BY method
"""


def weblog_size_quantiles_sql(pages_glob: str, now_year: int = 2018) -> str:
    """Per host: exact p50/p95/p99 of the numeric response-size capture
    (quantile_cont == numpy 'linear', the keyed_quantiles contract)."""
    return _timed_cte(pages_glob, now_year) + """
SELECT
  host,
  quantile_cont(CAST(size AS BIGINT), 0.5)  AS p50,
  quantile_cont(CAST(size AS BIGINT), 0.95) AS p95,
  quantile_cont(CAST(size AS BIGINT), 0.99) AS p99
FROM timed WHERE size IS NOT NULL AND regexp_matches(size, '^\\d+$')
GROUP BY host
"""


def weblog_visitors_sql(pages_glob: str, now_year: int = 2018) -> str:
    """Per host: exact distinct client addresses (the unique-visitors
    dashboard number) over parsed apache/docker rows."""
    return _timed_cte(pages_glob, now_year) + """
, clients AS (
  SELECT host,
    CASE kind
      WHEN 'apache' THEN regexp_extract(text, '%(APACHE)s', 1)
      WHEN 'docker' THEN regexp_extract(
        json_extract_string(text, '$.log'), '%(APACHE)s', 1)
      ELSE NULL
    END AS client
  FROM parsed
)
SELECT host, count(DISTINCT client)::BIGINT AS visitors
FROM clients WHERE client IS NOT NULL AND client <> ''
GROUP BY host
""" % {"APACHE": _APACHE_RE}


def weblog_top_paths_sql(pages_glob: str, now_year: int = 2018,
                         k: int = 3) -> str:
    """Per host: the top-k most-requested paths by count (ties on the
    path ascending) over parsed apache/docker rows."""
    return _timed_cte(pages_glob, now_year) + """
, reqs AS (
  SELECT host,
    CASE kind
      WHEN 'apache' THEN regexp_extract(text, '%(APACHE)s', 5)
      WHEN 'docker' THEN regexp_extract(
        json_extract_string(text, '$.log'), '%(APACHE)s', 5)
      ELSE NULL
    END AS path
  FROM parsed
),
c AS (
  -- host IS NOT NULL: topk_count_per_key's documented null-key contract
  -- (ops/stats.py) — a NULL-url page has no host to attribute paths to
  SELECT host, path, count(*)::BIGINT AS n FROM reqs
  WHERE path IS NOT NULL AND path <> '' AND host IS NOT NULL
  GROUP BY host, path
)
SELECT * FROM (
  SELECT host, path, n,
    row_number() OVER (PARTITION BY host ORDER BY n DESC, path) AS rnk
  FROM c) WHERE rnk <= %(K)d
""" % {"APACHE": _APACHE_RE, "K": k}


def weblog_lineage_sql(pages_glob: str) -> str:
    """Per (partition, sink) expected metrics — the independent SQL twin
    of the checkpoint machinery's committed lineage records: routed-row
    counts, byte totals, and parse failures per input file per sink.
    The parse/route CASE blocks intentionally mirror weblog_aggregate_sql
    (not _timed_cte — no event time here): a change to the flagship's
    kind/route logic must be applied to BOTH builders."""
    return f"""
WITH pages AS (
  SELECT parse_filename(filename, true) AS src, text, lang
  FROM read_parquet('{pages_glob}', filename=true)
),
parsed AS (
  SELECT
    src, lang,
    CAST(strlen(text) AS BIGINT) AS nbytes,
    CASE
      WHEN regexp_matches(text, '{_APACHE_RE}') THEN 'apache'
      WHEN json_type(TRY_CAST(text AS JSON)) = 'OBJECT' THEN 'docker'
      WHEN regexp_matches(text, '{_SYSLOG_RE}') THEN 'syslog'
      ELSE 'fail'
    END AS kind,
    text
  FROM pages
),
coded AS (
  SELECT src, lang, nbytes, kind,
    CASE kind
      WHEN 'apache' THEN regexp_extract(text, '{_APACHE_RE}', 6)
      WHEN 'docker' THEN regexp_extract(
        json_extract_string(text, '$.log'), '{_APACHE_RE}', 6)
      ELSE NULL
    END AS code
  FROM parsed
),
routed AS (
  SELECT 'sink_en' AS sink, * FROM coded WHERE lang = 'en'
  UNION ALL
  SELECT 'sink_intl', * FROM coded WHERE lang IN ('de', 'fr', 'es', 'ja')
  UNION ALL
  SELECT 'sink_all', * FROM coded
  UNION ALL
  SELECT 'sink_errors', * FROM coded
  WHERE {_CODE_5XX_PRED}
)
SELECT src AS partition, sink,
  count(*)::BIGINT AS records,
  sum(nbytes)::BIGINT AS bytes,
  sum(CASE WHEN kind = 'fail' THEN 1 ELSE 0 END)::BIGINT AS parse_failures
FROM routed GROUP BY src, sink
"""


def weblog_burn_rate_sql(pages_glob: str, now_year: int = 2018) -> str:
    """Per (host, hour): short-window (1h) and long-window (6h) 5xx
    ratios and the multi-window burn-rate alert (Google SRE fast-burn
    shape: both windows above 14.41x a 1% error budget)."""
    return _timed_cte(pages_glob, now_year) + f"""
, hourly AS (
  SELECT host,
    COALESCE(greatest(event_ns, 0) // 3600000000000, -1) AS hour_bucket,
    COALESCE((greatest(event_ns, 0) // 3600000000000) // 6, -1) AS long_bucket,
    count(*)::BIGINT AS n,
    sum(CASE WHEN {_CODE_5XX_PRED}
        THEN 1 ELSE 0 END)::BIGINT AS n_5xx
  FROM timed GROUP BY 1, 2, 3
),
agg AS (
  SELECT host, hour_bucket, n, n_5xx,
    sum(n) OVER w AS long_n, sum(n_5xx) OVER w AS long_5xx
  FROM hourly
  WINDOW w AS (PARTITION BY host, long_bucket)
)
SELECT host, hour_bucket, n, n_5xx,
  n_5xx::DOUBLE / n AS short_ratio,
  long_5xx::DOUBLE / long_n AS long_ratio,
  (n_5xx::DOUBLE / n > 0.1441 AND long_5xx::DOUBLE / long_n > 0.1441)
    AS alert
FROM agg
"""
