"""Charset-aware string decode (8.0.1+ DEFAULT_CHARSET /
COLUMN_CHARSET table-map optional-metadata TLVs).

Without charset metadata every string column decodes latin-1 — exact
parity with the reference's hardwired ISO-8859-1
(mysql_binlog.clj:537-544).  With it, values decode under the real
per-column collation: utf8mb4 text survives multi-byte characters,
VARBINARY (collation 63) stays bytes, TEXT becomes str, and malformed
sequences fall back to latin-1 instead of failing the row.
"""

from __future__ import annotations

import struct

from mysql_cdc_spark.sources.binlog_codec import (
    TYPE_BLOB,
    TYPE_LONG,
    TYPE_STRING,
    TYPE_VARCHAR,
    WRITE_ROWS_EVENT,
    BinlogWriter,
    TableDef,
    collation_to_codec,
    decode_binlog,
)

CAT = {("shop", "items"): ["id", "name", "note"]}


def _decode_rows(w: BinlogWriter, cat=CAT):
    return [e for e in decode_binlog(w.getvalue(), cat) if e["op"] == "write_rows"]


def test_utf8mb4_default_charset_roundtrip():
    """utf8mb4_0900_ai_ci (collation 255, the 8.0 default) on every
    string column: multi-byte text round-trips through the wire."""
    t = TableDef(
        "shop", "items",
        [(TYPE_LONG, None), (TYPE_VARCHAR, 200), (TYPE_VARCHAR, 50)],
        default_charset=255,
    )
    w = BinlogWriter()
    w.write_table_map(t)
    w.write_rows(WRITE_ROWS_EVENT, t, [[1, "héllo wörld — ünïcode", "日本語テキスト"]])
    rows = _decode_rows(w)
    assert rows[0]["after"] == [
        {"id": 1, "name": "héllo wörld — ünïcode", "note": "日本語テキスト"}
    ]


def test_no_charset_tlv_stays_latin1():
    """Pre-8.0 layout (no TLV): bytes 0x80-0xFF decode latin-1 — the
    reference-parity floor; existing fixtures are unaffected."""
    t = TableDef("shop", "items", [(TYPE_LONG, None), (TYPE_VARCHAR, 200),
                                   (TYPE_VARCHAR, 50)])
    w = BinlogWriter()
    w.write_table_map(t)
    w.write_rows(WRITE_ROWS_EVENT, t, [[1, "caf\xe9", "\xfc"]])
    rows = _decode_rows(w)
    assert rows[0]["after"][0]["name"] == "caf\xe9"
    assert rows[0]["after"][0]["note"] == "\xfc"


def test_mixed_charsets_default_plus_override():
    """DEFAULT_CHARSET with an override pair: column indexes in the
    pairs count CHARACTER columns only (the id column does not shift
    them).  name=utf8mb4, note=VARBINARY via collation-63 override."""
    t = TableDef(
        "shop", "items",
        [(TYPE_LONG, None), (TYPE_VARCHAR, 200), (TYPE_VARCHAR, 50)],
        default_charset=255,
        charset_overrides={1: 63},   # 2nd character column → binary
    )
    w = BinlogWriter()
    w.write_table_map(t)
    w.write_rows(WRITE_ROWS_EVENT, t, [[1, "próba", b"\xde\xad"]])
    rows = _decode_rows(w)
    img = rows[0]["after"][0]
    assert img["name"] == "próba"
    assert img["note"] == b"\xde\xad"


def test_text_decodes_binary_blob_stays_bytes():
    """BLOB wire type: TEXT (utf8mb4) becomes str, BLOB (collation 63)
    stays bytes — and with no TLV at all both stay bytes (legacy)."""
    t = TableDef(
        "shop", "items",
        [(TYPE_LONG, None), (TYPE_BLOB, 2), (TYPE_BLOB, 2)],
        default_charset=255,
        charset_overrides={1: 63},
    )
    w = BinlogWriter()
    w.write_table_map(t)
    w.write_rows(WRITE_ROWS_EVENT, t, [[1, "tèxt çolumn", b"\x00\xff\x10"]])
    img = _decode_rows(w)[0]["after"][0]
    assert img["name"] == "tèxt çolumn"
    assert img["note"] == b"\x00\xff\x10"

    legacy = TableDef("shop", "items",
                      [(TYPE_LONG, None), (TYPE_BLOB, 2), (TYPE_BLOB, 2)])
    w2 = BinlogWriter()
    w2.write_table_map(legacy)
    w2.write_rows(WRITE_ROWS_EVENT, legacy, [[1, b"abc", b"\x01"]])
    img2 = _decode_rows(w2)[0]["after"][0]
    assert img2["name"] == b"abc" and img2["note"] == b"\x01"


def test_char_column_packed_metadata_uses_charset():
    """CHAR (TYPE_STRING with pack-length metadata) is a character
    column too: utf8mb4 CHAR decodes multi-byte."""
    t = TableDef(
        "shop", "items",
        [(TYPE_LONG, None), (TYPE_STRING, (TYPE_STRING, 40)),
         (TYPE_VARCHAR, 50)],
        default_charset=255,
    )
    w = BinlogWriter()
    w.write_table_map(t)
    w.write_rows(WRITE_ROWS_EVENT, t, [[7, "grüß", "ok"]])
    img = _decode_rows(w)[0]["after"][0]
    assert img["name"] == "grüß"


def test_column_charset_tlv_shape():
    """COLUMN_CHARSET (TLV type 3: one collation per character column)
    — hand-appended to a writer-produced map, as servers emit when
    most character columns differ."""
    from mysql_cdc_spark.sources.binlog_codec import (
        TABLE_MAP_EVENT,
        enc_packed_int,
    )

    t = TableDef("shop", "items",
                 [(TYPE_LONG, None), (TYPE_VARCHAR, 200), (TYPE_VARCHAR, 50)])
    w = BinlogWriter()
    # rebuild the map body with a COLUMN_CHARSET TLV: utf8mb4 then binary
    body = t.table_id.to_bytes(6, "little") + struct.pack("<H", 0)
    body += bytes([4]) + b"shop" + b"\x00"
    body += bytes([5]) + b"items" + b"\x00"
    body += enc_packed_int(3) + bytes([TYPE_LONG, TYPE_VARCHAR, TYPE_VARCHAR])
    meta = (200).to_bytes(2, "little") + (50).to_bytes(2, "little")
    body += enc_packed_int(len(meta)) + meta
    body += bytes([0b00000111])  # nullability
    val = enc_packed_int(255) + enc_packed_int(63)
    body += bytes([3]) + enc_packed_int(len(val)) + val
    w._emit(TABLE_MAP_EVENT, body, 0)
    w.write_rows(WRITE_ROWS_EVENT, t, [[1, "ma\xc3\xb1ana", b"\xfe\x01"]])
    # the writer encodes latin-1 (no TableDef charset) so feed bytes
    # that ARE valid utf-8 for col 1; decode must interpret them so
    img = _decode_rows(w)[0]["after"][0]
    assert img["name"] == "mañana"
    assert img["note"] == b"\xfe\x01"


def test_malformed_utf8_falls_back_to_latin1():
    """A declared-utf8mb4 column whose bytes are NOT valid UTF-8 (seen
    in real logs after charset migrations) decodes latin-1 instead of
    raising — no data loss, no dead letter."""
    t = TableDef("shop", "items",
                 [(TYPE_LONG, None), (TYPE_VARCHAR, 200), (TYPE_VARCHAR, 50)],
                 default_charset=255)
    w = BinlogWriter()
    w.write_table_map(t)
    w.write_rows(WRITE_ROWS_EVENT, t, [[1, "ok", "x"]])
    raw = bytearray(w.getvalue())
    # surgically corrupt the 'ok' payload to a lone 0xC3 continuation
    i = raw.find(b"\x02ok")
    assert i > 0
    raw[i + 1:i + 3] = b"\xc3\x28"  # invalid utf-8 pair
    evs = decode_binlog(bytes(raw), CAT)
    img = [e for e in evs if e["op"] == "write_rows"][0]["after"][0]
    assert img["name"] == "\xc3("  # latin-1 fallback, bytes preserved


def test_collation_map_families():
    assert collation_to_codec(255) == "utf-8"      # utf8mb4_0900_ai_ci
    assert collation_to_codec(45) == "utf-8"       # utf8mb4_general_ci
    assert collation_to_codec(33) == "utf-8"       # utf8(mb3)_general_ci
    assert collation_to_codec(8) == "latin-1"      # latin1_swedish_ci
    assert collation_to_codec(63) == "binary"
    assert collation_to_codec(11) == "ascii"
    assert collation_to_codec(54) == "utf-16-be"   # utf16_general_ci
    assert collation_to_codec(60) == "utf-32-be"   # utf32_general_ci
    assert collation_to_codec(999) == "latin-1"    # unknown → floor


def test_national_single_byte_and_cjk_charsets_roundtrip():
    """cp1251 (Cyrillic), greek, and sjis columns decode exactly under
    their COLUMN_CHARSET overrides — families beyond the utf/latin
    cores, all shipped as Python codecs (public collation registry
    ids)."""
    t = TableDef(
        "shop", "items",
        [(TYPE_LONG, None), (TYPE_VARCHAR, 200), (TYPE_VARCHAR, 200)],
        default_charset=51,                 # cp1251_general_ci
        charset_overrides={1: 13},          # 2nd character column -> sjis
    )
    w = BinlogWriter()
    w.write_table_map(t)
    w.write_rows(WRITE_ROWS_EVENT, t, [[1, "привет мир", "日本語"]])
    rows = _decode_rows(w)
    assert rows[0]["after"] == [{"id": 1, "name": "привет мир", "note": "日本語"}]


def test_unknown_collation_falls_back_latin1():
    assert collation_to_codec(100) == "latin-1"
    assert collation_to_codec(51) == "cp1251"
    assert collation_to_codec(88) == "shift_jis"
