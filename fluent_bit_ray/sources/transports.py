"""Batch analogs of the reference's device/server transport inputs.

The reference's in_mqtt (plugins/in_mqtt/mqtt_prot.c) and in_serial
(plugins/in_serial/in_serial.c) read live sockets / ttys; this engine is a
batch system, so the at-rest analog reads CAPTURE FILES containing exactly
the bytes those transports would have delivered (an MQTT client-session
byte stream; a serial line dump) and re-derives the same records. The
protocol decode — MQTT fixed header + varint remaining-length framing,
PUBLISH topic/QoS parsing, JSON-map payload validation, serial separator
framing / multi-doc JSON mode — mirrors the reference C semantics
(studied, not copied).

Scale notes: captures are parsed one whole file per read task
(`ray.data.read_binary_files`) — frames never straddle file boundaries, so
the decode is embarrassingly parallel across files; per-file work is a
single linear scan.
"""

from __future__ import annotations

import json
from typing import Any, Iterator, Optional

import pyarrow as pa

# MQTT 3.1 control packet types (mqtt_prot.h)
MQTT_CONNECT = 1
MQTT_CONNACK = 2
MQTT_PUBLISH = 3
MQTT_PUBACK = 4
MQTT_PUBREC = 5
MQTT_PINGREQ = 12
MQTT_PINGRESP = 13
MQTT_DISCONNECT = 14

MQTT_QOS_LEV0 = 0


class MqttProtocolError(ValueError):
    """Framing violation that drops the connection in the reference
    (mqtt_prot.c MQTT_ERROR): first packet not CONNECT, or a
    remaining-length varint longer than 4 bytes."""


def _remaining_length(buf: bytes, pos: int) -> tuple[int, int]:
    """Decode the MQTT remaining-length varint at ``pos``
    (mqtt_prot.c:305-353): 7 bits per byte, little-endian groups,
    continuation bit 0x80. The reference's overflow guard fires once mult
    exceeds 128^3 — i.e. a 4th length byte errors even if it terminates,
    capping frames at 2 MiB-1 — mirrored exactly."""
    mult = 1
    length = 0
    while True:
        if pos >= len(buf):
            raise MqttProtocolError("truncated remaining-length")
        b = buf[pos]
        pos += 1
        length += (b & 127) * mult
        mult *= 128
        if mult > 128 * 128 * 128:
            raise MqttProtocolError("remaining-length varint too long")
        if (b & 128) == 0:
            return length, pos


def iter_mqtt_publish(buf: bytes) -> Iterator[tuple[str, int, bytes]]:
    """Iterate (topic, qos, message bytes) per PUBLISH packet in a captured
    MQTT client byte stream.

    Framing per mqtt_prot.c:274-387: the first packet must be CONNECT
    (MQTT_NEW state — anything else is a protocol error and the reference
    drops the connection); afterwards CONNECT/PINGREQ/DISCONNECT and
    unknown types are consumed and skipped, PUBLISH yields. A DISCONNECT
    ends the session (MQTT_HANGUP); remaining bytes are a new session and
    must open with CONNECT again. Truncated trailing frames are dropped
    (the live reader would wait for more bytes that never come at rest).
    """
    pos = 0
    new_session = True
    n = len(buf)
    while pos < n:
        if n - pos < 2:
            return  # fixed header incomplete: live reader would wait
        ptype = buf[pos] >> 4
        flags = buf[pos]
        if new_session and ptype != MQTT_CONNECT:
            raise MqttProtocolError(
                f"expected CONNECT to open the session, got type {ptype}"
            )
        try:
            length, body = _remaining_length(buf, pos + 1)
        except MqttProtocolError as e:
            if "truncated" in str(e):
                return
            raise
        end = body + length
        if end > n:
            return  # truncated final frame
        if ptype == MQTT_CONNECT:
            new_session = False
        elif ptype == MQTT_DISCONNECT:
            new_session = True
        elif ptype == MQTT_PUBLISH:
            qos = (flags >> 1) & 0x03
            p = body
            if p + 2 > end:
                pos = end
                continue
            tlen = (buf[p] << 8) | buf[p + 1]
            p += 2
            topic = buf[p:p + tlen].decode("utf-8", "replace")
            p += tlen
            if qos > MQTT_QOS_LEV0:
                p += 2  # packet identifier (the PUBACK/PUBREC reply is
                # transport-side; nothing at rest)
            if p <= end:
                yield topic, qos, buf[p:end]
        # CONNACK/PINGREQ/unknown: consumed, no records
        pos = end


def mqtt_records(buf: bytes) -> list[dict]:
    """Decode a capture into records ``{"topic": t, ...payload}`` —
    mqtt_data_append semantics (mqtt_prot.c:112-172): the PUBLISH message
    must parse as a JSON MAP (anything else is warned + dropped); the topic
    is injected as the first key; the reference stamps arrival time
    (flb_pack_time_now), which does not exist at rest — callers assign
    event time downstream (e.g. from a payload field).

    Dict-analog caveat: the reference packs the topic AND the payload's
    keys into one msgpack map, so a payload field named "topic" yields a
    duplicate key with the real topic FIRST; Python dicts can't hold
    duplicates, so here the injected (real) topic wins and the payload's
    shadowing value is dropped."""
    out = []
    for topic, _qos, msg in iter_mqtt_publish(buf):
        try:
            payload = json.loads(msg.decode("utf-8", "strict"))
        except (ValueError, UnicodeDecodeError):
            continue  # "MQTT Packet incomplete or is not JSON"
        if not isinstance(payload, dict):
            continue  # non-map JSON dropped (mqtt_prot.c:139-142)
        rec = {"topic": topic}
        for k, v in payload.items():
            if k != "topic":
                rec[k] = v
        out.append(rec)
    return out


def write_mqtt_capture(
    path: str,
    messages: list[tuple[str, bytes]],
    qos_cycle: tuple[int, ...] = (0, 1, 2),
    ping_every: int = 50,
) -> None:
    """Compose a deterministic MQTT client-session capture for tests and
    fixtures: CONNECT, then one PUBLISH per (topic, payload) with QoS
    cycling through ``qos_cycle`` (exercising the packet-id skip), a
    PINGREQ every ``ping_every`` messages (skipped-packet path), and a
    final DISCONNECT."""
    out = bytearray()

    def frame(ptype: int, flags: int, body: bytes) -> bytes:
        head = bytearray([(ptype << 4) | flags])
        length = len(body)
        while True:
            b = length % 128
            length //= 128
            head.append(b | (0x80 if length else 0))
            if not length:
                break
        return bytes(head) + body

    out += frame(MQTT_CONNECT, 0, b"\x00\x04MQTT\x04\x02\x00\x3c\x00\x00")
    pid = 1
    for i, (topic, payload) in enumerate(messages):
        qos = qos_cycle[i % len(qos_cycle)]
        t = topic.encode("utf-8")
        body = bytearray(len(t).to_bytes(2, "big") + t)
        if qos > 0:
            body += pid.to_bytes(2, "big")
            pid = (pid % 65535) + 1
        body += payload
        out += frame(MQTT_PUBLISH, qos << 1, bytes(body))
        if ping_every and (i + 1) % ping_every == 0:
            out += frame(MQTT_PINGREQ, 0, b"")
    out += frame(MQTT_DISCONNECT, 0, b"")
    with open(path, "wb") as f:
        f.write(bytes(out))


def mqtt_capture_dataset(paths: list[str]):
    """Ray Dataset of records decoded from MQTT capture files. One decode
    task per file; payload keys beyond "topic" surface as a JSON string
    column ``payload`` so heterogeneous captures keep a stable schema
    (parse/typecast downstream like any other source)."""
    import ray.data

    def decode(batch: pa.Table) -> pa.Table:
        topics, payloads = [], []
        for blob in batch["bytes"].to_pylist():
            for rec in mqtt_records(blob):
                topics.append(rec.pop("topic"))
                payloads.append(json.dumps(rec, sort_keys=True))
        return pa.table(
            {
                "topic": pa.array(topics, pa.string()),
                "payload": pa.array(payloads, pa.string()),
            }
        )

    ds = ray.data.read_binary_files(paths)
    return ds.map_batches(decode, batch_format="pyarrow")


# ------------------------------------------------------------------ serial


def serial_records(
    data: bytes,
    separator: Optional[str] = None,
    fmt: Optional[str] = None,
) -> list[dict]:
    """in_serial batch analog (in_serial.c:100-230 — studied, not copied).

    - Separator mode: the byte stream splits on ``separator``; each
      non-empty chunk becomes ``{"msg": <chunk>}`` (process_line,
      in_serial.c:40-66). A leading NUL (FTDI handshake) and a leading
      lone CR/LF are stripped, as the reference does per read buffer.
      Trailing bytes after the last separator never flush at rest (the
      live reader would keep waiting) — documented deviation: they are
      emitted iff they are non-empty, so a capture that ends without a
      final separator still yields its last line.
    - JSON mode (``Format json``): the stream is multi-doc JSON; every
      complete top-level value becomes ``{"msg": <value>}`` (process_pack,
      in_serial.c:70-92 — note the reference wraps even maps under "msg").
    - Raw mode (neither): the whole capture is one ``{"msg": ...}`` record
      (per-read-chunk framing has no at-rest equivalent).
    """
    if data[:1] == b"\x00":
        data = data[1:]
    if data[:1] in (b"\r", b"\n"):
        data = data[1:]
    if separator:
        sep = separator.encode("utf-8")
        chunks = data.split(sep)
        return [
            {"msg": c.decode("utf-8", "replace")} for c in chunks if c
        ]
    if fmt == "json":
        from ..parsers.multidoc import consume_json_stream

        values, _consumed = consume_json_stream(
            data.decode("utf-8", "replace")
        )
        return [{"msg": v} for v in values]
    text = data.decode("utf-8", "replace")
    return [{"msg": text}] if text else []


def serial_capture_dataset(
    paths: list[str],
    separator: Optional[str] = None,
    fmt: Optional[str] = None,
):
    """Ray Dataset over serial capture files. JSON-mode values may be
    nested; they surface JSON-encoded in a string column ``msg`` only when
    non-scalar, keeping the column type stable across captures."""
    import ray.data

    def decode(batch: pa.Table) -> pa.Table:
        msgs: list[Any] = []
        for blob in batch["bytes"].to_pylist():
            for rec in serial_records(blob, separator, fmt):
                v = rec["msg"]
                if isinstance(v, (dict, list)):
                    v = json.dumps(v, sort_keys=True)
                elif not isinstance(v, str):
                    v = json.dumps(v)
                msgs.append(v)
        return pa.table({"msg": pa.array(msgs, pa.string())})

    ds = ray.data.read_binary_files(paths)
    return ds.map_batches(decode, batch_format="pyarrow")
