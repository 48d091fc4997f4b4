"""Multimodal column handling: opaque binary payloads + typed metadata.

Pattern (the real deliverable at 100 TB): media lives in `binary` columns;
decode / feature-extract stages are ACTOR-POOL `map_batches` classes with
small batch sizes (payload × batch_size × concurrency must fit worker heap).

Decode coverage (round 3): uncompressed public formats decode for REAL with
struct+numpy — netpbm P5/P6 images, BI_RGB 24/32-bit BMP, RIFF/WAVE PCM
headers — including a real nearest-neighbor resize. Compressed formats
(jpeg/png/mp3/...) need codec libraries absent from this container: PIL is
used when importable, otherwise those payloads fall back to a deterministic
fake that is CLEARLY marked (strict=True raises instead).

html_extract_text is fully real: the html:binary -> visible-text kernel used
against the pages table.
"""

from __future__ import annotations

import hashlib
import re
import struct

import numpy as np
import pyarrow as pa

_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(rb"\s+")


def html_extract_text(batch: pa.Table, html_col: str = "html") -> pa.Table:
    """Strip tags/comments from html binary -> visible text (real kernel)."""
    out = []
    for payload in batch[html_col].to_pylist():
        if payload is None:
            out.append(None)
            continue
        no_comments = re.sub(rb"<!--.*?-->", b" ", payload, flags=re.S)
        stripped = _TAG_RE.sub(b" ", no_comments)
        out.append(_WS_RE.sub(b" ", stripped).strip().decode("utf-8", "replace"))
    return batch.append_column("html_text", pa.array(out, pa.string()))


_BODY_RE = re.compile(rb"<body[^>]*>(.*?)</body>", re.S | re.I)


def html_body_text(batch: pa.Table, html_col: str = "html",
                   out_col: str = "text") -> pa.Table:
    """Extract the BODY payload span byte-exactly (WARC-extraction analog).

    Unlike tag-stripping (`html_extract_text`), the span between
    `<body>`/`</body>` is returned verbatim — embedded content that merely
    LOOKS like markup (`<13>` syslog priorities) survives byte-identically.
    Pages without a body element yield the stripped fallback.
    """
    out = []
    for payload in batch[html_col].to_pylist():
        if payload is None:
            out.append(None)
            continue
        m = _BODY_RE.search(payload)
        if m:
            out.append(m.group(1).decode("utf-8", "replace"))
        else:
            stripped = _TAG_RE.sub(b" ", payload)
            out.append(_WS_RE.sub(b" ", stripped).strip().decode("utf-8", "replace"))
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, pa.array(out, pa.string()))


# ------------------------------------------------- real decoders (numpy)

def decode_netpbm(payload: bytes):
    """Binary netpbm decode (P5 gray / P6 RGB, maxval <= 255): returns
    (pixels HxWx{1,3} uint8 ndarray, mode) or None if not netpbm. Public
    format spec (netpbm.sourceforge.net); whitespace + '#' comments in the
    header are honored."""
    if len(payload) < 2 or payload[:1] != b"P" or payload[1:2] not in b"56":
        return None
    mode = "L" if payload[1:2] == b"5" else "RGB"
    toks, i, n = [], 2, len(payload)
    while len(toks) < 3 and i < n:
        c = payload[i : i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":
            i = payload.find(b"\n", i)
            if i < 0:
                return None
            i += 1
        else:
            j = i
            while j < n and not payload[j : j + 1].isspace():
                j += 1
            toks.append(payload[i:j])
            i = j
    if len(toks) < 3:
        return None
    try:
        w, h, maxval = (int(t) for t in toks)
    except ValueError:
        return None
    if not (0 < w and 0 < h and 0 < maxval <= 255):
        return None
    i += 1  # single whitespace byte after maxval per spec
    ch = 1 if mode == "L" else 3
    need = w * h * ch
    if n - i < need:
        return None
    px = np.frombuffer(payload, np.uint8, count=need, offset=i).reshape(h, w, ch)
    return px, mode


def decode_bmp(payload: bytes):
    """Uncompressed BI_RGB 24/32-bit BMP decode: returns (pixels HxWx3
    uint8, "RGB") or None. Handles bottom-up (positive height) and top-down
    rows and 4-byte row padding. Public format (Windows BITMAPINFOHEADER)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32) or w <= 0 or h_raw == 0:
        return None
    h = abs(h_raw)
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3
    if len(payload) < data_off + stride * h:
        return None
    rows = np.frombuffer(
        payload, np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    if h_raw > 0:
        rows = rows[::-1]  # bottom-up storage
    return rows[:, :, 2::-1], "RGB"  # BGR(A) -> RGB


def _mean_luma(px: np.ndarray, mode: str) -> float:
    if mode == "L":
        return float(px.mean()) / 255.0
    r, g, b = (px[:, :, k].astype(np.float64) for k in range(3))
    return float((0.299 * r + 0.587 * g + 0.114 * b).mean()) / 255.0


def resize_nearest(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Real nearest-neighbor resize via index sampling (no codec needed)."""
    h, w = px.shape[:2]
    yi = (np.arange(height) * (h / height)).astype(np.int64).clip(0, h - 1)
    xi = (np.arange(width) * (w / width)).astype(np.int64).clip(0, w - 1)
    return px[yi][:, xi]


def decode_wav_meta(payload: bytes):
    """RIFF/WAVE PCM header parse: returns {sample_rate, channels,
    bits_per_sample, n_frames, duration_sec, data_offset} or None. Walks
    the chunk list (fmt may not be first). Public format (RIFF spec)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i, n = 12, len(payload)
    fmt = None
    while i + 8 <= n:
        cid, sz = payload[i : i + 4], struct.unpack_from("<I", payload, i + 4)[0]
        body = i + 8
        if cid == b"fmt " and body + 16 <= n:
            audio_fmt, channels, rate = struct.unpack_from("<HHI", payload, body)
            bits = struct.unpack_from("<H", payload, body + 14)[0]
            fmt = (audio_fmt, channels, rate, bits)
        elif cid == b"data" and fmt is not None:
            audio_fmt, channels, rate, bits = fmt
            if audio_fmt != 1 or not channels or not bits or not rate:
                return None
            frame_sz = channels * bits // 8
            n_frames = min(sz, n - body) // max(1, frame_sz)
            return {
                "sample_rate": rate,
                "channels": channels,
                "bits_per_sample": bits,
                "n_frames": n_frames,
                "duration_sec": n_frames / rate,
                "data_offset": body,
            }
        i = body + sz + (sz & 1)  # chunks are word-aligned
    return None


IMAGE_META_SCHEMA = pa.schema(
    [
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("mode", pa.string()),
        ("mean_luma", pa.float32()),
    ]
)


class ImageDecodeStage:
    """Actor-pool stage: image binary -> metadata + optional resize.

    Usage (sized for large payloads — SMALL batches, explicit heap budget):
        ds.map_batches(ImageDecodeStage, fn_constructor_kwargs={...},
                       concurrency=(2, 8), batch_size=32, num_cpus=1,
                       batch_format="pyarrow")

    Decode order: (1) REAL numpy decoders for uncompressed public formats
    (netpbm P5/P6, BI_RGB 24/32-bit BMP) — always available; (2) PIL for
    compressed formats when importable; (3) a DETERMINISTIC FAKE
    (hash-derived dims/luma) for undecodable payloads unless strict=True,
    which raises NotImplementedError. [STUB only for compressed formats
    without PIL.] With target_size set, decodable images also emit a real
    nearest-neighbor-resized pixel buffer column `image_resized`.
    """

    def __init__(self, img_col: str = "image", strict: bool = False,
                 target_size: tuple[int, int] | None = None):
        self.img_col = img_col
        self.strict = strict
        self.target_size = target_size
        try:
            import PIL.Image  # noqa: F401

            self._pil = True
        except ImportError:
            self._pil = False

    def _decode(self, payload: bytes) -> tuple[dict, "np.ndarray | None"]:
        decoded = decode_netpbm(payload) or decode_bmp(payload)
        if decoded is not None:
            px, mode = decoded
            return (
                {
                    "width": px.shape[1],
                    "height": px.shape[0],
                    "mode": mode,
                    "mean_luma": round(_mean_luma(px, mode), 6),
                },
                px,
            )
        if self._pil:
            try:
                import io

                import PIL.Image

                img = PIL.Image.open(io.BytesIO(payload))
                px = np.asarray(img.convert("RGB" if img.mode != "L" else "L"))
                if px.ndim == 2:
                    px = px[:, :, None]
                mode = "L" if px.shape[2] == 1 else "RGB"
                return (
                    {
                        "width": img.width,
                        "height": img.height,
                        "mode": img.mode,
                        "mean_luma": round(_mean_luma(px, mode), 6),
                    },
                    px,
                )
            except Exception:  # noqa: BLE001 — undecodable payload
                if self.strict:
                    raise
                # fall through to the deterministic fake
        if self.strict:
            raise NotImplementedError(
                "compressed-image decode requires a codec library absent "
                "from this container (netpbm/BMP decode for real); run with "
                "strict=False for the deterministic fake"
            )
        h = hashlib.blake2b(payload, digest_size=8).digest()
        a, b = struct.unpack("<II", h)
        return (
            {
                "width": 64 + a % 1920,
                "height": 64 + b % 1080,
                "mode": "RGB",
                "mean_luma": round((a % 1000) / 1000.0, 6),
            },
            None,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = []
        resized: list = []
        for payload in batch[self.img_col].to_pylist():
            if payload is None:
                metas.append(None)
                resized.append(None)
                continue
            meta, px = self._decode(payload)
            metas.append(meta)
            if self.target_size is not None and px is not None:
                w, h = self.target_size
                resized.append(resize_nearest(px, w, h).tobytes())
            else:
                resized.append(None)
        meta = pa.array(metas, pa.struct(
            [(f.name, f.type) for f in IMAGE_META_SCHEMA]
        ))
        out = batch.append_column("image_meta", meta)
        if self.target_size is not None:
            out = out.append_column(
                "image_resized", pa.array(resized, pa.binary())
            )
        return out


AUDIO_META_SCHEMA = pa.schema(
    [
        ("sample_rate", pa.int32()),
        ("channels", pa.int32()),
        ("duration_sec", pa.float64()),
    ]
)


class AudioFrameSampleStage:
    """Actor-pool stage: audio binary -> metadata + frame sample offsets.

    RIFF/WAVE PCM payloads decode for REAL (decode_wav_meta): sample rate,
    channel count, duration, and offsets aligned to actual PCM frame
    boundaries inside the data chunk. Non-WAV payloads keep the generic
    fixed-stride offset contract with null metadata. [STUB only for
    compressed codecs (mp3/ogg/...), which have no library here.]
    """

    def __init__(self, audio_col: str = "audio", frame_bytes: int = 4096,
                 max_frames: int = 16):
        self.audio_col = audio_col
        self.frame_bytes = frame_bytes
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        offs = []
        metas = []
        for payload in batch[self.audio_col].to_pylist():
            if payload is None:
                offs.append(None)
                metas.append(None)
                continue
            wav = decode_wav_meta(payload)
            if wav is not None:
                metas.append(
                    {
                        "sample_rate": wav["sample_rate"],
                        "channels": wav["channels"],
                        "duration_sec": wav["duration_sec"],
                    }
                )
                frame_sz = wav["channels"] * wav["bits_per_sample"] // 8
                per_chunk = max(1, self.frame_bytes // frame_sz)
                n = max(1, wav["n_frames"] // per_chunk)
                step = max(1, n // self.max_frames)
                offs.append(
                    [wav["data_offset"] + i * per_chunk * frame_sz
                     for i in range(0, n, step)][: self.max_frames]
                )
                continue
            metas.append(None)
            n = max(1, len(payload) // self.frame_bytes)
            step = max(1, n // self.max_frames)
            offs.append([i * self.frame_bytes for i in range(0, n, step)][: self.max_frames])
        out = batch.append_column(
            "frame_offsets", pa.array(offs, pa.list_(pa.int64()))
        )
        return out.append_column(
            "audio_meta",
            pa.array(metas, pa.struct(
                [(f.name, f.type) for f in AUDIO_META_SCHEMA]
            )),
        )
