"""Minimal WARC (ISO 28500 / WARC/1.0, public spec) writer + Ray reader.

Common Crawl's at-rest format: the pages tables this engine processes are
born as WARC response records, so the ingestion loop closes here — write a
deterministic WARC from a pages table (test fixture / export), read WARC
files into the engine as a streaming Dataset of (url, warc_ts, html).

Reference note: the reference engine (michiel/fluent-bit) ingests log
FILES (in_tail); WARC is this engine's web-corpus analog of that boundary.
The format implementation follows the public WARC/1.0 spec, not any
existing reader.

Scale shape: `read_warc` maps over whole WARC files
(`ray.data.read_binary_files` — one task per file, the unit Common Crawl
shards by), parsing records with C-speed bytes.find/split; per-record
gzip members (the CC convention) and plain concatenated records are both
handled. Parsing emits only (url, ts, payload) — HTTP headers are split
off and dropped at the boundary, so the wide payload bytes flow straight
into the normal pruned-read pipeline.
"""

from __future__ import annotations

import gzip
import io

import numpy as np
import pyarrow as pa

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"


def _iso8601(ts_us: int) -> str:
    import datetime

    dt = datetime.datetime.fromtimestamp(
        ts_us // 1_000_000, datetime.timezone.utc
    )
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def write_warc(
    table: pa.Table,
    path: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
    lang_col: str | None = None,
    compress: bool = False,
) -> int:
    """Write one WARC file of response records from a pages table.
    Each record: WARC/1.0 header block, an HTTP/1.1 200 response header,
    then the payload bytes. `compress=True` gzips each record as its own
    member (the Common Crawl layout). `lang_col` emits the
    WARC-Identified-Content-Language header Common Crawl has carried
    since 2018. Returns the record count.

    Rows with a NULL url, timestamp, or payload are SKIPPED: a WARC
    response record requires a WARC-Target-URI, a WARC-Date, and a
    payload block (ISO 28500 §5), and writing b'' for a NULL payload
    would silently conflate null-html with empty-html on read-back —
    the roundtrip oracles carry the matching IS NOT NULL predicate."""
    langs = table[lang_col].to_pylist() if lang_col else [None] * table.num_rows
    urls = table[url_col].to_pylist()
    ts = table[ts_col]
    if pa.types.is_timestamp(ts.type):
        import pyarrow.compute as pc

        ts_us = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64()).to_pylist()
    else:
        ts_us = ts.to_pylist()
    payloads = table[payload_col].to_pylist()
    out = open(path, "wb")
    n_written = 0
    try:
        for url, t, body, lang in zip(urls, ts_us, payloads, langs):
            if url is None or t is None or body is None:
                continue  # unrepresentable as a WARC response record
            n_written += 1
            if isinstance(body, str):
                body = body.encode("utf-8")
            http = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                b"Content-Length: " + str(len(body)).encode() + _SEP
            )
            block = http + body
            lang_hdr = (
                b"WARC-Identified-Content-Language: " + lang.encode() + _CRLF
                if lang
                else b""
            )
            hdr = (
                b"WARC/1.0\r\n"
                b"WARC-Type: response\r\n"
                b"WARC-Target-URI: " + url.encode() + _CRLF +
                b"WARC-Date: " + _iso8601(int(t)).encode() + _CRLF +
                lang_hdr +
                b"Content-Type: application/http; msgtype=response\r\n"
                b"Content-Length: " + str(len(block)).encode() + _SEP
            )
            rec = hdr + block + _CRLF + _CRLF
            if compress:
                buf = io.BytesIO()
                # level 6: ~2x faster than the default 9 at similar ratio;
                # mtime=0 keeps the bytes deterministic either way
                with gzip.GzipFile(
                    fileobj=buf, mode="wb", mtime=0, compresslevel=6
                ) as gz:
                    gz.write(rec)
                out.write(buf.getvalue())
            else:
                out.write(rec)
    finally:
        out.close()
    return n_written


_DATE_CACHE: dict = {}


def _warc_date_us(date: str) -> int:
    """Memoized WARC-Date parse: second-resolution ISO stamps repeat
    heavily across a crawl shard (~one distinct stamp per crawl second),
    so the strptime cost collapses to one parse per distinct stamp."""
    hit = _DATE_CACHE.get(date)
    if hit is not None:
        return hit
    import datetime

    try:
        dt = datetime.datetime.strptime(date, "%Y-%m-%dT%H:%M:%SZ")
        ts_us = int(dt.replace(
            tzinfo=datetime.timezone.utc).timestamp()) * 1_000_000
    except ValueError:
        ts_us = 0
    if len(_DATE_CACHE) < 1_000_000:  # bound worker-resident memory
        _DATE_CACHE[date] = ts_us
    return ts_us


def _gunzip_multi(data: bytes, chunk: int = 1 << 16) -> bytes:
    """Decompress a multi-member gzip stream in O(n).

    stdlib `gzip.decompress` re-slices the ENTIRE remaining buffer once
    per member, which is quadratic in member count — a per-record-gzip
    WARC shard (the Common Crawl layout: one member per record) with 20k
    members takes seconds instead of milliseconds (measured 22x faster
    here, byte-identical). This loop feeds bounded chunks to
    zlib.decompressobj, so the only per-member copy is the <= chunk-size
    `unused_data` tail at a member boundary."""
    import zlib

    out = []
    view = memoryview(data)
    pos, n = 0, len(data)
    d = zlib.decompressobj(wbits=31)  # gzip wrapper
    fed = False  # bytes fed to d since its last reset (truncation detector)
    mem_pos = 0  # offset in `data` where the current member began
    try:
        while pos < n:
            piece = view[pos : pos + chunk]
            out.append(d.decompress(piece))
            fed = True
            pos += len(piece)
            while d.eof:
                tail = d.unused_data  # <= chunk bytes: bounded copy
                if not tail:
                    d = zlib.decompressobj(wbits=31)
                    fed = False
                    mem_pos = pos
                    break
                pos -= len(tail)
                d = zlib.decompressobj(wbits=31)
                mem_pos = pos
                out.append(d.decompress(tail))
                fed = True
                pos += len(tail)
    except zlib.error as e:  # gzip.decompress parity on corrupt input
        raise gzip.BadGzipFile(str(e)) from e
    if fed and not d.eof:
        if n - mem_pos == 1:
            # gzip.decompress parity: a member cut inside the 2-byte magic
            # never reaches zlib's own magic check (1 byte is "need more
            # input", not an error) — stdlib's header read compares the
            # short read against the magic and raises BadGzipFile.
            raise gzip.BadGzipFile(
                "Not a gzipped file (%r)" % bytes(view[mem_pos : mem_pos + 1])
            )
        # gzip.decompress parity: a member that never reached its
        # end-of-stream marker is truncated input, not short output —
        # returning the partial bytes would silently drop records.
        raise EOFError(
            "Compressed file ended before the end-of-stream marker was reached"
        )
    return b"".join(out)


def _parse_warc_bytes(data: bytes):
    """Yield (url, ts_us, payload bytes) for every response record in a
    WARC byte stream (handles multi-member gzip transparently)."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_multi(data)  # O(n) multi-member decompress
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/1.0", pos)
        if start < 0:
            break
        hdr_end = data.find(_SEP, start)
        if hdr_end < 0:
            break
        header = data[start:hdr_end].decode("utf-8", "replace")
        fields = {}
        for line in header.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        # robust framing: a malformed/missing Content-Length in ONE record
        # of an externally-sourced file must not kill the whole read task —
        # skip the record and rescan for the next magic (best effort; a
        # payload containing the literal magic may then yield a bogus
        # record, which the header parse rejects as non-response)
        try:
            length = int(fields["content-length"])
        except (KeyError, ValueError):
            pos = hdr_end + 4
            continue
        if length < 0 or hdr_end + 4 + length > n:
            pos = hdr_end + 4
            continue
        block = data[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        if fields.get("warc-type") != "response":
            continue
        url = fields.get("warc-target-uri", "")
        date = fields.get("warc-date", "")
        ts_us = _warc_date_us(date) if date else 0
        # split the HTTP response header off the payload
        body_at = block.find(_SEP)
        payload = block[body_at + 4 :] if body_at >= 0 else block
        yield url, ts_us, payload, fields.get(
            "warc-identified-content-language"
        )


def read_warc(paths, include_src: bool = False):
    """Ray Dataset of (url, warc_ts us-timestamp, html binary, lang) from
    WARC files — one read/parse task per file, streaming thereafter.
    `include_src=True` adds `_src` = the WARC file's basename (extensions
    stripped), the per-shard provenance key the checkpointing pipeline
    partitions on."""
    import ray.data

    files = ray.data.read_binary_files(paths, include_paths=include_src)

    def parse(batch: pa.Table) -> pa.Table:
        urls: list = []
        ts: list = []
        bodies: list = []
        langs: list = []
        srcs: list = []
        paths_col = (
            batch["path"].to_pylist()
            if "path" in batch.column_names
            else [None] * batch.num_rows
        )
        for data, fpath in zip(batch["bytes"].to_pylist(), paths_col):
            src = None
            if fpath is not None:
                src = fpath.rsplit("/", 1)[-1]
                for ext in (".gz", ".warc"):
                    if src.endswith(ext):
                        src = src[: -len(ext)]
            for url, t, payload, lang in _parse_warc_bytes(data):
                urls.append(url)
                ts.append(t)
                bodies.append(payload)
                langs.append(lang)
                srcs.append(src)
        cols = {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                np.asarray(ts, dtype=np.int64), pa.timestamp("us", tz="UTC")
            ),
            "html": pa.array(bodies, pa.large_binary()),
            "lang": pa.array(langs, pa.string()),
        }
        if include_src:
            cols["_src"] = pa.array(srcs, pa.string())
        return pa.table(cols)

    return files.map_batches(parse, batch_format="pyarrow")
