"""Multimodal column handling: opaque binary payloads + typed metadata.

Pattern (the real deliverable at 100 TB): media lives in `binary` columns;
decode / feature-extract stages are ACTOR-POOL `map_batches` classes with
small batch sizes (payload × batch_size × concurrency must fit worker heap).
The image/audio codec libraries are not in this container, so the decode
kernels are STUBBED — clearly marked — behind deterministic fakes; the Ray
plumbing (schemas, batch sizing, actor signature, output layout) is real and
tested.

html_extract_text is fully real: the html:binary -> visible-text kernel used
against the pages table.
"""

from __future__ import annotations

import hashlib
import re
import struct

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

    Real decode requires PIL; this container has none, so decode falls back
    to a DETERMINISTIC FAKE (hash-derived dims/luma) unless strict=True,
    which raises NotImplementedError.  [STUB — swap _decode for PIL.Image]
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

    def _decode(self, payload: bytes) -> dict:
        if self._pil:
            try:
                import io

                import PIL.Image

                img = PIL.Image.open(io.BytesIO(payload))
                gray = img.convert("L")
                import numpy as _np

                luma = float(_np.asarray(gray).mean()) / 255.0
                return {
                    "width": img.width,
                    "height": img.height,
                    "mode": img.mode,
                    "mean_luma": round(luma, 6),
                }
            except Exception:  # noqa: BLE001 — undecodable payload
                if self.strict:
                    raise
                # fall through to the deterministic fake
        if self.strict:
            raise NotImplementedError(
                "image decode requires a codec library absent from this "
                "container; run with strict=False for the deterministic fake"
            )
        h = hashlib.blake2b(payload, digest_size=8).digest()
        a, b = struct.unpack("<II", h)
        return {
            "width": 64 + a % 1920,
            "height": 64 + b % 1080,
            "mode": "RGB",
            "mean_luma": round((a % 1000) / 1000.0, 6),
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = []
        for payload in batch[self.img_col].to_pylist():
            metas.append(None if payload is None else self._decode(payload))
        meta = pa.array(metas, pa.struct(
            [(f.name, f.type) for f in IMAGE_META_SCHEMA]
        ))
        return batch.append_column("image_meta", meta)


class AudioFrameSampleStage:
    """Actor-pool stage: audio binary -> fixed-rate frame sample offsets.

    [STUB — real decode needs an audio codec; the offset math and output
    layout (list<int64> frame byte offsets) are the tested contract.]
    """

    def __init__(self, audio_col: str = "audio", frame_bytes: int = 4096,
                 max_frames: int = 16):
        self.audio_col = audio_col
        self.frame_bytes = frame_bytes
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        offs = []
        for payload in batch[self.audio_col].to_pylist():
            if payload is None:
                offs.append(None)
                continue
            n = max(1, len(payload) // self.frame_bytes)
            step = max(1, n // self.max_frames)
            offs.append([i * self.frame_bytes for i in range(0, n, step)][: self.max_frames])
        return batch.append_column("frame_offsets", pa.array(offs, pa.list_(pa.int64())))
