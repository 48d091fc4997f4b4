"""WARC writer/reader roundtrip (sources/warc.py): payload BYTES must
survive exactly — including payloads containing WARC magic, CRLF-CRLF
sequences, and arbitrary binary — in both plain and per-member-gzip form.
"""

import os

import numpy as np
import pyarrow as pa
import pytest

from fluent_bit_ray.sources.warc import _parse_warc_bytes, write_warc


def table():
    return pa.table(
        {
            "url": pa.array(
                ["https://a.example/x", "https://b.example/y?z=1", "https://c.example/"]
            ),
            "warc_ts": pa.array(
                np.array([1700000000, 1700000060, 0], dtype=np.int64) * 10**6,
                pa.timestamp("us", tz="UTC"),
            ),
            "html": pa.array(
                [
                    b"<html>plain</html>",
                    # adversarial: contains record magic and header separator
                    b"WARC/1.0\r\n\r\nfake <b>\x00\xff</b>\r\n\r\nWARC-Date: x",
                    b"",
                ],
                pa.binary(),
            ),
        }
    )


@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip_bytes_exact(tmp_path, compress):
    t = table()
    path = os.path.join(tmp_path, "t.warc" + (".gz" if compress else ""))
    assert write_warc(t, path, compress=compress) == 3
    got = list(_parse_warc_bytes(open(path, "rb").read()))
    assert [u for u, _, _, _ in got] == t["url"].to_pylist()
    assert [ts for _, ts, _, _ in got] == [1700000000 * 10**6, 1700000060 * 10**6, 0]
    assert [p for _, _, p, _ in got] == t["html"].to_pylist()
    assert [lg for _, _, _, lg in got] == [None, None, None]


def test_malformed_content_length_skipped(tmp_path):
    t = table()
    path = os.path.join(tmp_path, "bad.warc")
    write_warc(t, path)
    data = open(path, "rb").read()
    # corrupt the SECOND record's Content-Length (the WARC one, not HTTP)
    second = data.index(b"WARC/1.0", 1)
    bad = data[second:].replace(b"Content-Length: ", b"Content-Length: x", 1)
    data = data[:second] + bad
    got = list(_parse_warc_bytes(data))
    # record 1 parses; record 2 is skipped (bad framing) but the scanner
    # recovers and still finds record 3
    urls = [u for u, _, _, _ in got]
    assert t["url"][0].as_py() in urls
    assert t["url"][2].as_py() in urls
    assert t["url"][1].as_py() not in urls


def test_truncated_record_skipped(tmp_path):
    t = table()
    path = os.path.join(tmp_path, "trunc.warc")
    write_warc(t.slice(0, 1), path)
    data = open(path, "rb").read()[:-10]  # chop the payload tail
    assert list(_parse_warc_bytes(data)) == []


def test_lang_header_roundtrip(tmp_path):
    t = table().append_column("lang", pa.array(["en", "fr", None]))
    path = os.path.join(tmp_path, "lang.warc")
    write_warc(t, path, lang_col="lang")
    got = list(_parse_warc_bytes(open(path, "rb").read()))
    assert [lg for _, _, _, lg in got] == ["en", "fr", None]


@pytest.mark.usefixtures("ray_session")
def test_read_warc_dataset(tmp_path):
    import ray.data  # noqa: F401

    from fluent_bit_ray.sources.warc import read_warc

    t = table()
    write_warc(t, os.path.join(tmp_path, "a.warc.gz"), compress=True)
    write_warc(t.slice(0, 1), os.path.join(tmp_path, "b.warc"))
    out = read_warc(str(tmp_path)).to_pandas().sort_values("url")
    assert len(out) == 4
    assert set(out["url"]) == set(t["url"].to_pylist())
    # payload bytes exact through the Dataset path too
    row = out[out["url"] == "https://b.example/y?z=1"].iloc[0]
    assert bytes(row["html"]) == t["html"][1].as_py()


class TestGunzipMulti:
    """_gunzip_multi must match gzip.decompress byte-for-byte AND
    error-for-error: silent partial output on a truncated shard would
    drop records without a trace."""

    def members(self):
        import gzip

        return [gzip.compress(b"hello world" * 100), gzip.compress(b"x" * 70000),
                gzip.compress(b""), gzip.compress(b"tail member")]

    def test_equal_to_stdlib(self):
        import gzip

        from fluent_bit_ray.sources.warc import _gunzip_multi

        blob = b"".join(self.members())
        assert _gunzip_multi(blob) == gzip.decompress(blob)
        # tiny chunks force many member boundaries inside one chunk
        assert _gunzip_multi(blob, chunk=7) == gzip.decompress(blob)

    @pytest.mark.parametrize("cut", [20, 1])  # mid-data and mid-trailer
    def test_data_truncation_raises(self, cut):
        from fluent_bit_ray.sources.warc import _gunzip_multi

        blob = b"".join(self.members())
        with pytest.raises(EOFError):
            _gunzip_multi(blob[:-cut])

    def test_header_truncation_raises(self):
        # input ends 5 bytes into the NEXT member's header
        from fluent_bit_ray.sources.warc import _gunzip_multi

        first = self.members()[0]
        with pytest.raises(EOFError):
            _gunzip_multi(b"".join(self.members())[: len(first) + 5])

    def test_clean_boundary_ok(self):
        import gzip

        from fluent_bit_ray.sources.warc import _gunzip_multi

        first = self.members()[0]
        assert _gunzip_multi(first) == gzip.decompress(first)

    def test_garbage_raises_badgzip(self):
        import gzip

        from fluent_bit_ray.sources.warc import _gunzip_multi

        with pytest.raises(gzip.BadGzipFile):
            _gunzip_multi(self.members()[0] + b"not gzip at all----")

    def test_every_cut_matches_stdlib_exception_class(self):
        # exhaustive parity pin: for EVERY prefix of a two-member blob,
        # _gunzip_multi returns the same bytes or raises the same exception
        # CLASS as gzip.decompress (incl. the 1-byte-into-next-magic cut,
        # where stdlib's header read gives BadGzipFile, not EOFError)
        import gzip

        from fluent_bit_ray.sources.warc import _gunzip_multi

        blob = gzip.compress(b"alpha") + gzip.compress(b"beta")
        for cut in range(len(blob) + 1):
            prefix = blob[:cut]
            try:
                expect = ("ok", gzip.decompress(prefix))
            except Exception as e:  # noqa: BLE001
                expect = ("err", type(e))
            try:
                got = ("ok", _gunzip_multi(prefix, chunk=5))
            except Exception as e:  # noqa: BLE001
                got = ("err", type(e))
            assert got == expect, f"cut={cut}: {got} != {expect}"
