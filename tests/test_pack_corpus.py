"""Reference pack-corpus parity: tests/internal/data/pack (read in place
from the read-only reference checkout, never copied).

The reference's test_utf8_to_json decodes each .mp msgpack file and
asserts flb_msgpack_raw_to_json_str reproduces the .json file
byte-for-byte. Our analog drives the same bytes through msgpack_unpack +
mp_json_value — covering the msgpack string decoder and the full
flb_utils_write_str escape path (control chars, BMP unicode, astral
codepoints) at wire level.
"""

import glob
import os

import pytest

from fluent_bit_ray.functions.mp_json import mp_json_value
from fluent_bit_ray.sources.msgpack_io import msgpack_unpack

PACK_DIR = "/root/reference/tests/internal/data/pack"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(PACK_DIR), reason="reference corpus not available"
)


def cases():
    return sorted(glob.glob(os.path.join(PACK_DIR, "*.mp")))


@pytest.mark.parametrize("mp_file", cases(), ids=lambda p: os.path.basename(p))
def test_mp_to_json_byte_equal(mp_file):
    raw = open(mp_file, "rb").read()
    obj, used = msgpack_unpack(raw)
    assert used == len(raw)
    expected = open(mp_file[:-3] + ".json", encoding="utf-8").read()
    assert mp_json_value(obj) == expected


@pytest.mark.parametrize("mp_file", cases(), ids=lambda p: os.path.basename(p))
def test_mp_decodes_to_txt_content(mp_file):
    """The .mp files wrap the raw .txt content as one msgpack string."""
    raw = open(mp_file, "rb").read()
    obj, _ = msgpack_unpack(raw)
    txt = open(mp_file[:-3] + ".txt", encoding="utf-8").read()
    assert obj == txt
