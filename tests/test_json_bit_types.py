"""MYSQL_TYPE_JSON binary-document decode, TYPE_BIT, and the legacy
(5.5-era) temporal types — the remaining scalar types a real server can
put in a rows event.

The binary-JSON vectors are HAND-ENCODED byte-for-byte from the public
json_binary.h layout (type byte; small/large objects and arrays with
offset-indexed entries; literals and small ints inlined in entries;
varint string lengths) — independent of any repo encoder, so they pin
the reader against the documented format, not against itself.
"""

from __future__ import annotations

import struct

import pytest

from mysql_cdc_spark.sources.binlog_codec import (
    TYPE_BIT,
    TYPE_DATETIME,
    TYPE_JSON,
    TYPE_LONG,
    TYPE_TIME,
    TYPE_TIMESTAMP,
    WRITE_ROWS_EVENT,
    BinlogWriter,
    TableDef,
    decode_binary_json,
    decode_binlog,
)

# ---------------------------------------------------------------------------
# hand-encoded binary JSON vectors
# ---------------------------------------------------------------------------


def test_bjson_scalar_string():
    assert decode_binary_json(bytes([0x0C, 0x02]) + b"hi") == '"hi"'


def test_bjson_top_level_literals():
    assert decode_binary_json(bytes([0x04, 0x00])) == "null"
    assert decode_binary_json(bytes([0x04, 0x01])) == "true"
    assert decode_binary_json(bytes([0x04, 0x02])) == "false"


def test_bjson_scalar_ints_and_double():
    assert decode_binary_json(bytes([0x05]) + struct.pack("<h", -42)) == "-42"
    assert decode_binary_json(bytes([0x07]) + struct.pack("<i", -100000)) == "-100000"
    assert (
        decode_binary_json(bytes([0x0A]) + struct.pack("<Q", 2**64 - 3))
        == str(2**64 - 3)
    )
    assert decode_binary_json(bytes([0x0B]) + struct.pack("<d", 3.5)) == "3.5"


def test_bjson_small_object():
    # {"a": 1, "b": "x", "c": null, "d": true}
    body = bytearray()
    body += struct.pack("<HH", 4, 38)                    # count, total size
    for off, ln in ((32, 1), (33, 1), (34, 1), (35, 1)):  # key entries
        body += struct.pack("<HH", off, ln)
    body += bytes([0x05]) + struct.pack("<h", 1)          # a: inline int16
    body += bytes([0x0C]) + struct.pack("<H", 36)         # b: string at 36
    body += bytes([0x04, 0x00, 0x00])                     # c: inline null
    body += bytes([0x04, 0x01, 0x00])                     # d: inline true
    body += b"abcd"                                       # keys
    body += bytes([0x01]) + b"x"                          # value of b
    doc = bytes([0x00]) + bytes(body)
    assert (
        decode_binary_json(doc) == '{"a": 1, "b": "x", "c": null, "d": true}'
    )


def test_bjson_small_array_with_offsets():
    # [1, "yo", false, 3.5]
    body = bytearray()
    body += struct.pack("<HH", 4, 27)
    body += bytes([0x05]) + struct.pack("<h", 1)          # inline int16
    body += bytes([0x0C]) + struct.pack("<H", 16)         # string at 16
    body += bytes([0x04, 0x02, 0x00])                     # inline false
    body += bytes([0x0B]) + struct.pack("<H", 19)         # double at 19
    body += bytes([0x02]) + b"yo"
    body += struct.pack("<d", 3.5)
    doc = bytes([0x02]) + bytes(body)
    assert decode_binary_json(doc) == '[1, "yo", false, 3.5]'


def test_bjson_nested_object_with_array():
    # {"arr": [10]}
    arr = struct.pack("<HH", 1, 7) + bytes([0x05]) + struct.pack("<h", 10)
    body = bytearray()
    body += struct.pack("<HH", 1, 21)
    body += struct.pack("<HH", 11, 3)                     # key entry
    body += bytes([0x02]) + struct.pack("<H", 14)         # value: array at 14
    body += b"arr"
    body += arr
    doc = bytes([0x00]) + bytes(body)
    assert decode_binary_json(doc) == '{"arr": [10]}'


def test_bjson_large_array_inlines_int32():
    # large format: u32 count/size/offsets, int32 inlined in the entry
    body = bytearray()
    body += struct.pack("<II", 1, 13)
    body += bytes([0x07]) + struct.pack("<i", 1_000_000)
    doc = bytes([0x03]) + bytes(body)
    assert decode_binary_json(doc) == "[1000000]"


def test_bjson_opaque_renders_base64():
    doc = bytes([0x0F, 0xF6, 0x02]) + b"\x80\x00"        # opaque decimal-ish
    assert decode_binary_json(doc) == '"base64:type246:gAA="'


def test_bjson_unknown_type_raises():
    with pytest.raises(ValueError, match="binary-JSON"):
        decode_binary_json(bytes([0x7F, 0x00]))


def test_bjson_corrupt_offsets_raise_not_silently_wrong():
    """ADVICE r8: corrupt offsets/lengths must raise, never decode to
    short ints / truncated strings via slice leniency (a bit-flipped
    doc inside an unchecksummed pre-5.6 log would otherwise surface
    wrong data with no error)."""
    # string whose declared length overruns the document
    doc = bytes([0x0C, 0x0A]) + b"ab"              # len 10, only 2 bytes
    with pytest.raises(ValueError, match="overruns"):
        decode_binary_json(doc)
    # truncated inline scalar: int64 with 3 payload bytes
    with pytest.raises(ValueError, match="overruns"):
        decode_binary_json(bytes([0x09, 0x01, 0x02, 0x03]))
    # object whose value-entry offset points past the document
    body = bytearray()
    body += struct.pack("<HH", 1, 0x20)            # count=1, declared size
    body += struct.pack("<HH", 0x0D, 1)            # key entry: off 13, len 1
    body += bytes([0x0C]) + struct.pack("<H", 0xFF00)  # value: string @ bad off
    body += b"k"
    with pytest.raises(ValueError, match="overruns"):
        decode_binary_json(bytes([0x00]) + bytes(body))
    # key whose offset/length overruns
    body2 = bytearray()
    body2 += struct.pack("<HH", 1, 0x20)
    body2 += struct.pack("<HH", 0xFFF0, 8)         # key off way past end
    body2 += bytes([0x05]) + struct.pack("<h", 3)  # inlined int16 value
    with pytest.raises(ValueError, match="overruns"):
        decode_binary_json(bytes([0x00]) + bytes(body2))
    # truncated varint (continuation bit set at EOF)
    with pytest.raises(ValueError, match="overruns"):
        decode_binary_json(bytes([0x0C, 0x80]))


def test_bjson_encoder_sorts_object_keys_like_server():
    """MySQL stores object keys sorted by length then bytes; the
    encoder must produce that canonical order so fixture documents
    match real server wire shapes."""
    doc = encode_binary_json({"bb": 1, "a": 2, "ab": 3, "c": 4})
    # decode preserves the stored order in the dict → dumps shows it
    assert decode_binary_json(doc) == '{"a": 2, "c": 4, "ab": 3, "bb": 1}'


# ---------------------------------------------------------------------------
# encoder round-trips (property-based): encode_binary_json is the writer
# counterpart; the decoder must reproduce any JSON value exactly
# ---------------------------------------------------------------------------

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from mysql_cdc_spark.sources.binlog_codec import encode_binary_json

_json_values = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(min_value=-(2**63), max_value=2**64 - 1)
    | st.floats(allow_nan=False, allow_infinity=False)
    | st.text(max_size=30),
    lambda children: st.lists(children, max_size=6)
    | st.dictionaries(st.text(max_size=10), children, max_size=6),
    max_leaves=25,
)


@settings(max_examples=200, deadline=None)
@given(_json_values)
def test_bjson_encode_decode_round_trip(value):
    decoded = json.loads(decode_binary_json(encode_binary_json(value)))
    assert decoded == value


def test_bjson_large_format_promotion():
    """>64 KiB of string payload overflows u16 offsets — the encoder
    must promote to the large (u32) container format and the decoder
    must read it back losslessly."""
    big = ["s" * 10 + str(i) for i in range(7000)]
    doc = encode_binary_json(big)
    assert doc[0] == 0x03                      # large array
    assert json.loads(decode_binary_json(doc)) == big
    nested = {"k": big, "n": 1}
    doc2 = encode_binary_json(nested)
    assert json.loads(decode_binary_json(doc2)) == nested


# ---------------------------------------------------------------------------
# full rows-event round trip: JSON + BIT + legacy temporals
# ---------------------------------------------------------------------------

_T = TableDef(
    "shop", "t3",
    [
        (TYPE_LONG, None),
        (TYPE_JSON, 4),
        (TYPE_BIT, (2, 1)),        # BIT(10): 2 leftover bits + 1 byte
        (TYPE_TIMESTAMP, None),
        (TYPE_DATETIME, None),
        (TYPE_TIME, None),
    ],
)
_CAT = {("shop", "t3"): ["id", "doc", "flags", "created", "updated", "took"]}


def test_rows_event_with_json_bit_and_legacy_temporals():
    # JSON value: {"k": 7} hand-encoded
    jdoc = bytes([0x00]) + struct.pack("<HH", 1, 14) + struct.pack("<HH", 11, 1) \
        + bytes([0x05]) + struct.pack("<h", 7) + b"k"
    w = BinlogWriter()
    w.write_table_map(_T, ts=5)
    w.write_rows(
        WRITE_ROWS_EVENT, _T,
        [[9, jdoc, 0b1011001010, 1_700_000_000, "2024-02-29 23:59:58", "-101:30:09"]],
        ts=5, v2=True,
    )
    evs = decode_binlog(w.getvalue(), _CAT)
    row = evs[-1]["after"][0]
    assert row == {
        "id": 9,
        "doc": '{"k": 7}',
        "flags": 0b1011001010,
        "created": 1_700_000_000,
        "updated": "2024-02-29 23:59:58",
        "took": "-101:30:09",
    }
