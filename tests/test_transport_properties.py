"""Hypothesis roundtrip properties for the transport capture analogs:
whatever write_mqtt_capture emits, mqtt_records must decode back exactly,
over arbitrary unicode topics / JSON-map payloads / QoS mixes; serial
separator framing must invert its join. Complements the hand goldens in
test_transport_analogs.py with generated coverage of the framing space."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from fluent_bit_ray.sources import transports

# valid-UTF-8 text (no surrogates); topics also need < 64 KiB encoded
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=1,
    max_size=40,
)
_json_scalar = st.one_of(
    st.integers(min_value=-(2**53), max_value=2**53),
    st.booleans(),
    st.none(),
    _text,
)
_payload = st.dictionaries(
    _text.filter(lambda k: k != "topic"), _json_scalar, max_size=5
)


class TestMqttRoundtripProperty:
    @settings(max_examples=60, deadline=None)
    @given(
        msgs=st.lists(st.tuples(_text, _payload), min_size=1, max_size=12),
        qos_cycle=st.sampled_from([(0,), (1,), (2,), (0, 1, 2), (2, 0)]),
        ping_every=st.sampled_from([0, 1, 3]),
    )
    def test_write_then_decode_is_identity(
        self, tmp_path_factory, msgs, qos_cycle, ping_every
    ):
        p = str(tmp_path_factory.mktemp("mq") / "cap.mqtt")
        transports.write_mqtt_capture(
            p,
            [(t, json.dumps(d).encode("utf-8")) for t, d in msgs],
            qos_cycle=qos_cycle,
            ping_every=ping_every,
        )
        with open(p, "rb") as f:
            recs = transports.mqtt_records(f.read())
        assert recs == [{"topic": t, **d} for t, d in msgs]

    @settings(max_examples=30, deadline=None)
    @given(data=st.binary(max_size=200))
    def test_arbitrary_bytes_never_crash(self, data):
        # framing errors surface as MqttProtocolError, never anything else
        try:
            transports.mqtt_records(b"\x10\x00" + data)
        except transports.MqttProtocolError:
            pass

    @settings(max_examples=30, deadline=None)
    @given(payload=_payload, shadow=_json_scalar)
    def test_injected_topic_wins_over_payload_topic(
        self, tmp_path_factory, payload, shadow
    ):
        p = str(tmp_path_factory.mktemp("mq") / "cap.mqtt")
        body = dict(payload)
        body["topic"] = shadow
        transports.write_mqtt_capture(
            p, [("real/topic", json.dumps(body).encode("utf-8"))]
        )
        with open(p, "rb") as f:
            (rec,) = transports.mqtt_records(f.read())
        assert rec["topic"] == "real/topic"


class TestSerialRoundtripProperty:
    @settings(max_examples=60, deadline=None)
    @given(
        lines=st.lists(
            _text.filter(lambda s: "|" not in s and "\x00" not in s),
            min_size=1,
            max_size=10,
        )
    )
    def test_separator_framing_inverts_join(self, lines):
        # first byte of the stream must not hit the NUL/CR/LF strip path
        lines = ["x" + lines[0]] + lines[1:]
        data = ("|".join(lines) + "|").encode("utf-8")
        recs = transports.serial_records(data, separator="|")
        assert recs == [{"msg": ln} for ln in lines]

    @settings(max_examples=40, deadline=None)
    @given(vals=st.lists(_json_scalar, min_size=1, max_size=8))
    def test_json_mode_decodes_every_value(self, vals):
        data = " ".join(json.dumps(v) for v in vals).encode("utf-8")
        recs = transports.serial_records(data, fmt="json")
        assert recs == [{"msg": v} for v in vals]
