"""Deterministic Common-Crawl-style pages table synthesis (FIXTURES.md F1-F3).

Everything is a pure function of (seed, row index) — `splitmix64` hashing, no
sequential RNG — so generation parallelizes per partition and the oracle and
the Ray pipeline see identical bytes at any scale.

Schema (BASELINE.json input_hint):
    url:string, warc_ts:timestamp[us, UTC], html:binary, text:string, lang:string

The `text` column embeds one log line per row, cycling L1 apache / L2 docker
JSON / L3 syslog rfc3164 / L4 malformed (i % 4), mirroring the reference's
parser corpus (conf/parsers.conf, tests/runtime/data/kubernetes logs).
Malformed rows must take the parse-failure fallback path
(reference plugins/in_tail/tail_file.c:240-245).
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
BASE_EPOCH = 1519234013  # 2018-02-21T17:26:53Z (reference k8s golden corpus)
NOW_YEAR = 2018  # injected deterministic "now" for year-less syslog times
LANGS = ["en", "de", "fr", "es", "ja", "xx"]
_LANG_CDF = [0.50, 0.65, 0.77, 0.87, 0.95, 1.01]
TLDS = ["com", "org", "net", "io"]
N_HOSTS = 500
_METHODS = ["GET", "GET", "GET", "POST", "PUT"]
_CODES = ["200", "200", "200", "301", "404", "500", "503"]
_TZS = ["+0000", "+0530", "-0600", "+0100", "+0000"]
_TZ_SECS = [0, 19800, -21600, 3600, 0]
_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — the per-row deterministic hash (wraps mod 2^64)."""
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        return x ^ (x >> np.uint64(31))


def _u01(i: np.ndarray, salt: int, seed: int = SEED) -> np.ndarray:
    h = _splitmix64(i.astype(np.uint64) ^ np.uint64(seed * 0x9E37 + salt * 0xABCD1234))
    return h.astype(np.float64) / float(2**64)


def _civil_from_days(days: int) -> tuple[int, int, int]:
    """Inverse of days_from_civil (Hinnant)."""
    z = days + 719468
    era = (z if z >= 0 else z - 146096) // 146097
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = mp + (3 if mp < 10 else -9)
    return y + (m <= 2), m, d


def _fmt_epoch(epoch: int, tz_off: int) -> tuple[str, str]:
    """epoch -> (apache local-time string body, syslog body) at tz offset."""
    local = epoch + tz_off
    days, rem = divmod(local, 86400)
    y, mo, d = _civil_from_days(days)
    hh, rem = divmod(rem, 3600)
    mm, ss = divmod(rem, 60)
    apache = f"{d:02d}/{_MONTHS[mo-1]}/{y}:{hh:02d}:{mm:02d}:{ss:02d}"
    syslog = f"{_MONTHS[mo-1]} {d:2d} {hh:02d}:{mm:02d}:{ss:02d}"
    return apache, syslog


def _iso_utc(epoch: int, nanos: int) -> str:
    days, rem = divmod(epoch, 86400)
    y, mo, d = _civil_from_days(days)
    hh, rem = divmod(rem, 3600)
    mm, ss = divmod(rem, 60)
    return f"{y}-{mo:02d}-{d:02d}T{hh:02d}:{mm:02d}:{ss:02d}.{nanos:09d}Z"


def pages_batch(start: int, end: int, seed: int = SEED) -> pa.Table:
    """Generate rows [start, end) of the pages table. Pure and parallel-safe."""
    i = np.arange(start, end, dtype=np.int64)
    n = len(i)

    # zipf-ish host skew: u^3 concentrates mass on low host ids (hot hosts)
    hu = _u01(i, 1, seed)
    host_id = np.minimum((hu * hu * hu * N_HOSTS).astype(np.int64), N_HOSTS - 1)
    tld_id = _splitmix64(host_id.astype(np.uint64) ^ np.uint64(seed)) % np.uint64(len(TLDS))

    lu = _u01(i, 2, seed)
    lang_id = np.searchsorted(_LANG_CDF, lu, side="right")
    lang_id = np.minimum(lang_id, len(LANGS) - 1)

    ip_a = (_splitmix64(i.astype(np.uint64) ^ np.uint64(3)) % np.uint64(223) + np.uint64(1)).astype(np.int64)
    ip_b = (_splitmix64(i.astype(np.uint64) ^ np.uint64(4)) % np.uint64(256)).astype(np.int64)
    meth_id = (_splitmix64(i.astype(np.uint64) ^ np.uint64(5)) % np.uint64(len(_METHODS))).astype(np.int64)
    code_id = (_splitmix64(i.astype(np.uint64) ^ np.uint64(6)) % np.uint64(len(_CODES))).astype(np.int64)
    size = (_splitmix64(i.astype(np.uint64) ^ np.uint64(7)) % np.uint64(50000)).astype(np.int64)
    tz_id = (i % 5).astype(np.int64)
    nanos = (_splitmix64(i.astype(np.uint64) ^ np.uint64(8)) % np.uint64(10**9)).astype(np.int64)
    pid = (_splitmix64(i.astype(np.uint64) ^ np.uint64(9)) % np.uint64(30000) + np.uint64(2)).astype(np.int64)

    # ~32 rows share each second (realistic log density; makes time-bucket
    # aggregation actually combine — 1 row/s would defeat the combiner)
    epoch = BASE_EPOCH + i // 32

    urls: list[str] = []
    texts: list[str] = []
    htmls: list[bytes] = []
    for k in range(n):
        idx = int(i[k])
        host = f"h{int(host_id[k])}.example.{TLDS[int(tld_id[k])]}"
        path = f"/{idx:x}/{int(_splitmix64(np.uint64(idx ^ 0xF00D)) % np.uint64(4096)):03x}.html"
        urls.append(f"https://{host}{path}")

        ep = int(epoch[k])
        kind = idx % 4
        ip = f"{int(ip_a[k])}.{int(ip_b[k])}.{(idx >> 3) % 250}.{idx % 250}"
        apache_t, syslog_t = _fmt_epoch(ep, _TZ_SECS[int(tz_id[k])])
        apache_line = (
            f'{ip} - - [{apache_t} {_TZS[int(tz_id[k])]}] '
            f'"{_METHODS[int(meth_id[k])]} {path} HTTP/1.0" '
            f"{_CODES[int(code_id[k])]} {int(size[k])}"
        )
        if kind == 0:  # L1 apache
            line = apache_line
        elif kind == 1:  # L2 docker json wrapping an apache line
            esc = apache_line.replace("\\", "\\\\").replace('"', '\\"')
            line = (
                f'{{"log":"{esc}\\n","stream":"stdout",'
                f'"time":"{_iso_utc(ep, int(nanos[k]))}"}}'
            )
        elif kind == 2:  # L3 syslog rfc3164 (year-less time -> year injection)
            pri = 8 + idx % 8
            _, syslog_utc = _fmt_epoch(ep, 0)  # syslog times carry no tz: emit UTC
            line = f"<{pri}>{syslog_utc} {host} app{idx % 7}[{int(pid[k])}]: request {path} from {ip}"
        else:  # L4 malformed: deterministic corruption -> parse-failure path
            base = [apache_line, f'{{"log":"x","stream":', f"<999 {syslog_t} bad"][idx % 3]
            line = base[: max(5, len(base) // 2)] + "~TRUNC~"
        texts.append(line)
        htmls.append(b"<html><body>" + line.encode() + b"</body></html><!--" +
                     (b"pad" * (idx % 7)) + b"-->")

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(epoch * 1_000_000, pa.timestamp("us", tz="UTC")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([LANGS[j] for j in lang_id], pa.string()),
        }
    )


def hostmeta_table(seed: int = SEED) -> pa.Table:
    """F3 enrichment dim: ~90% of hosts present (misses exercise the miss path)."""
    hid = np.arange(N_HOSTS, dtype=np.int64)
    present = _u01(hid, 77, seed) < 0.9
    hid = hid[present]
    geos = ["us", "eu", "apac", "latam", "mea"]
    orgs = ["acme", "globex", "initech", "umbrella", "stark", "wayne"]
    hosts, geo, org, labels = [], [], [], []
    for h in hid:
        h = int(h)
        tld = TLDS[int(_splitmix64(np.uint64(h) ^ np.uint64(seed)) % np.uint64(len(TLDS)))]
        hosts.append(f"h{h}.example.{tld}")
        geo.append(geos[int(_splitmix64(np.uint64(h ^ 0x9999)) % np.uint64(len(geos)))])
        org.append(orgs[int(_splitmix64(np.uint64(h ^ 0x7777)) % np.uint64(len(orgs)))])
        nlab = int(_splitmix64(np.uint64(h ^ 0x5555)) % np.uint64(4))
        labels.append({f"l{j}": f"v{(h + j) % 10}" for j in range(nlab)})
    return pa.table(
        {
            "host": pa.array(hosts),
            "geo": pa.array(geo),
            "org": pa.array(org),
            "labels": pa.array(labels, pa.map_(pa.string(), pa.string())),
        }
    )


CACHE_ROOT = os.environ.get("FBR_PAGES_CACHE", "/tmp/fbr_pages_cache")
_GEN_VERSION = "v3"


def pages_path(n_rows: int, seed: int = SEED, partitions: int = 16) -> str:
    """Materialize (once) and return the directory of a pages table.

    Written as `partitions` parquet files so reads parallelize and the resume
    fixture has natural per-file partitions. Pure function of
    (n_rows, seed, partitions) -> cached under /tmp.

    `FBR_PAGES_OVERRIDE=<dir>` substitutes an external pages directory
    (PAGES_SCHEMA parquet files) for EVERY caller — both the Ray queries
    and the DuckDB oracle builders resolve the corpus through this
    function, so the adversarial-pages gate (`tools/nasty_corpus.py
    --pages`) swaps one corpus under both sides consistently.
    """
    override = os.environ.get("FBR_PAGES_OVERRIDE")
    if override:
        return override
    d = os.path.join(CACHE_ROOT, f"{_GEN_VERSION}_n{n_rows}_s{seed}_p{partitions}")
    done = os.path.join(d, "_DONE")
    if os.path.exists(done):
        return d
    os.makedirs(d, exist_ok=True)
    per = (n_rows + partitions - 1) // partitions
    for p in range(partitions):
        start, end = p * per, min((p + 1) * per, n_rows)
        if start >= end:
            break
        tbl = pages_batch(start, end, seed)
        # small row groups so reads can split to sub-file granularity
        # without re-reading whole groups (task balance at high cpu counts)
        pq.write_table(tbl, os.path.join(d, f"pages_{p:05d}.parquet"),
                       row_group_size=8192)
    with open(done, "w") as f:
        f.write(f"{n_rows} {seed} {partitions}\n")
    return d


def pages_rows_for_sf(sf_dir: str) -> int:
    """Map a testdata sf dir to a pages row count (lineitem rows x1 scale)."""
    name = os.path.basename(os.path.normpath(sf_dir))
    table = {"sf0.001": 6_000, "sf0.01": 60_000, "sf0.1": 600_000}
    return table.get(name, 60_000)


def hostmeta_path(seed: int = SEED) -> str:
    """Materialize (once) the F3 hostmeta dim as parquet — lets the
    DuckDB oracles JOIN the same dimension the enrichment stage
    broadcasts (labels map dropped: parquet/SQL oracles only need the
    scalar attrs)."""
    d = os.path.join(CACHE_ROOT, f"{_GEN_VERSION}_hostmeta_s{seed}")
    path = os.path.join(d, "hostmeta.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(d, exist_ok=True)
    t = hostmeta_table(seed).select(["host", "geo", "org"])
    tmp = f"{path}.{os.getpid()}.tmp"  # per-process tmp: concurrent
    pq.write_table(t, tmp)             # callers each rename atomically
    os.replace(tmp, path)
    return path
