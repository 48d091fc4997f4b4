"""Multimodal decode stages: REAL numpy decoders for uncompressed public
formats (netpbm, BI_RGB BMP, RIFF/WAVE PCM), resize, stage plumbing, and
the clearly-marked deterministic fake for compressed formats."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from fluent_bit_ray.ops.multimodal import (
    AudioFrameSampleStage,
    ImageDecodeStage,
    decode_bmp,
    decode_netpbm,
    decode_wav_meta,
    resize_nearest,
)


def make_ppm(w, h, rgb):
    px = np.full((h, w, 3), rgb, np.uint8)
    return f"P6\n# comment\n{w} {h}\n255\n".encode() + px.tobytes(), px


def make_pgm(w, h, val):
    px = np.full((h, w, 1), val, np.uint8)
    return f"P5 {w} {h} 255\n".encode() + px.tobytes(), px


def make_bmp(w, h, bgr_rows):
    """bgr_rows: HxWx3 uint8 in IMAGE order (top-down); stored bottom-up."""
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bgr_rows[y].tobytes()
        body += row + b"\x00" * (stride - len(row))
    data_off = 54
    header = (
        b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    )
    return bytes(header) + bytes(body)


def make_wav(rate=8000, channels=2, bits=16, n_frames=4000):
    frame_sz = channels * bits // 8
    data = b"\x00" * (n_frames * frame_sz)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * frame_sz, frame_sz, bits)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


class TestRealDecoders:
    def test_ppm_roundtrip(self):
        payload, px = make_ppm(4, 3, (255, 0, 0))
        got, mode = decode_netpbm(payload)
        assert mode == "RGB" and np.array_equal(got, px)

    def test_pgm_roundtrip(self):
        payload, px = make_pgm(5, 2, 128)
        got, mode = decode_netpbm(payload)
        assert mode == "L" and np.array_equal(got, px)

    def test_netpbm_rejects_truncated(self):
        payload, _ = make_ppm(4, 3, (1, 2, 3))
        assert decode_netpbm(payload[:-5]) is None
        assert decode_netpbm(b"P6 4") is None

    def test_bmp_roundtrip_bottom_up(self):
        rgb = np.zeros((2, 3, 3), np.uint8)
        rgb[0, 0] = (10, 20, 30)   # top-left in image order
        rgb[1, 2] = (200, 100, 50)
        bgr = rgb[:, :, ::-1].copy()
        got, mode = decode_bmp(make_bmp(3, 2, bgr))
        assert mode == "RGB" and np.array_equal(got, rgb)

    def test_bmp_rejects_compressed(self):
        b = bytearray(make_bmp(2, 2, np.zeros((2, 2, 3), np.uint8)))
        struct.pack_into("<I", b, 30, 1)  # BI_RLE8
        assert decode_bmp(bytes(b)) is None

    def test_wav_meta(self):
        meta = decode_wav_meta(make_wav(rate=8000, channels=2, bits=16,
                                        n_frames=4000))
        assert meta["sample_rate"] == 8000
        assert meta["channels"] == 2
        assert meta["n_frames"] == 4000
        assert meta["duration_sec"] == pytest.approx(0.5)

    def test_resize_nearest(self):
        px = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
        out = resize_nearest(px, 2, 2)
        assert out.shape == (2, 2, 1)
        assert out[0, 0, 0] == 0 and out[1, 1, 0] == 10


class TestImageDecodeStage:
    def _batch(self, payloads):
        return pa.table({"doc_id": pa.array(range(len(payloads))),
                         "image": pa.array(payloads, pa.binary())})

    def test_real_decode_and_resize(self):
        payload, _ = make_ppm(8, 4, (0, 255, 0))
        stage = ImageDecodeStage(target_size=(4, 2))
        out = stage(self._batch([payload, None]))
        meta = out["image_meta"].to_pylist()
        assert meta[0]["width"] == 8 and meta[0]["height"] == 4
        assert meta[0]["mode"] == "RGB"
        assert meta[0]["mean_luma"] == pytest.approx(0.587, abs=1e-3)
        assert meta[1] is None
        rz = out["image_resized"].to_pylist()
        assert len(rz[0]) == 4 * 2 * 3 and rz[1] is None

    def test_fake_is_deterministic_for_compressed(self):
        stage = ImageDecodeStage()
        if stage._pil:
            pytest.skip("PIL present: compressed payloads decode for real")
        out1 = stage(self._batch([b"\xff\xd8\xe0 not-really-jpeg"]))
        out2 = stage(self._batch([b"\xff\xd8\xe0 not-really-jpeg"]))
        assert out1["image_meta"].to_pylist() == out2["image_meta"].to_pylist()

    def test_strict_raises_only_for_undecodable(self):
        payload, _ = make_pgm(2, 2, 7)
        stage = ImageDecodeStage(strict=True)
        assert stage(self._batch([payload]))["image_meta"][0].as_py()["mode"] == "L"
        if not stage._pil:
            with pytest.raises(NotImplementedError):
                stage(self._batch([b"GIF89a compressed"]))


class TestAudioFrameSampleStage:
    def test_wav_real_path(self):
        payload = make_wav(rate=16000, channels=1, bits=16, n_frames=16000)
        out = AudioFrameSampleStage()(pa.table(
            {"audio": pa.array([payload], pa.binary())}
        ))
        meta = out["audio_meta"][0].as_py()
        assert meta == {"sample_rate": 16000, "channels": 1,
                        "duration_sec": 1.0}
        offs = out["frame_offsets"][0].as_py()
        frame_sz = 2
        data_off = decode_wav_meta(payload)["data_offset"]
        assert all((o - data_off) % frame_sz == 0 for o in offs)
        assert offs[0] == data_off and len(offs) <= 16

    def test_non_wav_fallback(self):
        out = AudioFrameSampleStage(frame_bytes=10, max_frames=4)(pa.table(
            {"audio": pa.array([b"x" * 100], pa.binary())}
        ))
        assert out["audio_meta"][0].as_py() is None
        assert out["frame_offsets"][0].as_py() == [0, 20, 40, 60]
