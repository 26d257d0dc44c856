"""Spec-derived GOLDEN BYTE VECTORS for the binlog decoder (r13 VERDICT
#2: break the BinlogWriter->decode_binlog co-evolution).

Every byte below is a HEX LITERAL assembled field-by-field from the
public binary-log layout (MySQL Internals Manual "Binary log file
format"; libbinlogevents class docs; strings/decimal.c packed-decimal
layout — the same public sources the reference decodes from,
mysql_binlog.clj:290-328, 500-523, 611-682; Decimal.java:127-262).  No
code in mysql_cdc_spark/ produced or can regenerate them, and the
expected decoded values are written out literally next to each vector —
these tests exercise ONLY the decoder.  A mismatch here is a decoder
bug, not a fixture bug.

Layout of every v4 event header (19 bytes, all little-endian):
    timestamp u32 | type u8 | server_id u32 | event_len u32
    | next_log_pos u32 | flags u16

FILE A — a 5.1-era log (binlog_checksum did not exist before 5.6.1:
no FDE algorithm byte, no CRC32 trailers), v1 rows events:

  offset   4 FORMAT_DESCRIPTION: binlog_version=4,
             server_version="5.1.73-log", create_ts, header_len=19,
             27-entry post-header-length array (types 1..27)
  offset 107 QUERY: thread_id=9, exec_time=0, db_len=4, error_code=0,
             status_vars_len=0, db="shop", sql="BEGIN"
  offset 149 TABLE_MAP: table_id=23, flags=1, shop.orders, 4 columns
             [LONG(3), VARCHAR(15) max_len=40 (meta 28 00),
              NEWDECIMAL(246) precision=10 scale=2 (meta 0a 02),
              STRING/CHAR(254) pack_length=6 (meta fe 06)],
             metadata block len 6, null bitmap 02 (VARCHAR nullable)
  offset 203 WRITE_ROWS v1 (23): cols-present 0f, two rows:
             (1001, "alice", 12345.67, "EUR") — decimal 12345.67 at
             (10,2) packs to 80 00 30 39 43 (int part 12345 in a
             4-byte big-endian group, frac 67 in 1 byte, MSB set =
             non-negative); (1002, NULL, -0.50, "USD") — null bitmap
             02 marks column 1 SQL NULL, -0.50 packs to
             7f ff ff ff cd (bitwise NOT of 80 00 00 00 32)
  offset 266 UPDATE_ROWS v1 (24): before (1001, "alice", 12345.67,
             "EUR") -> after (1001, "alicia", 99999999.99, "EUR");
             99999999.99 packs to 85 f5 e0 ff 63
  offset 337 DELETE_ROWS v1 (25): before (1002, NULL, -0.50, "USD")
  offset 380 XID: 77
  offset 407 ROTATE: position=4, next log "binlog.000002"
  end 447

FILE B — an 8.0-era log (binlog_checksum=CRC32: FDE carries the
algorithm byte at body[-5] and every event a CRC32-of-header+body
trailer), v2 rows events, GTID, optional table-map metadata:

  offset   4 FORMAT_DESCRIPTION: "8.0.36", 41-entry array, alg=1
  offset 126 GTID (33): flags=1,
             sid=3e11fa47-71ca-11e1-9e33-c80aa9429562 (the manual's
             example server UUID), gno=5, then the 5.7+ logical-
             timestamp tail (lt_type=2, last_committed=0, seq=1)
  offset 191 QUERY: thread_id=21, status_vars_len=5 carrying a
             Q_FLAGS2 block (type 00 + u32) the decoder must skip
  offset 242 TABLE_MAP: table_id=99, same shop.orders shape, plus the
             8.0.1+ optional-metadata TLV block: SIGNEDNESS (type 01,
             len 01, bits 80 = first numeric column UNSIGNED)
  offset 303 WRITE_ROWS v2 (30): extra-row-info length u16 = 2 (just
             itself), row (4294967295, "bob", 0.01, "JPY") — the
             UNSIGNED LONG ff ff ff ff must decode 4294967295, not -1
  offset 356 UPDATE_ROWS v2 (31): -> (4294967295, NULL, -99999999.99,
             "JPY"); -99999999.99 packs to 7a 0a 1f 00 9c (bitwise
             NOT of 85 f5 e0 ff 63)
  offset 424 DELETE_ROWS v2 (32): before = the updated row
  offset 473 XID: 1234567890123456789
  offset 504 ROTATE: "binlog.000009"
  end 548
"""

from __future__ import annotations

import pytest

from mysql_cdc_spark.sources.binlog_codec import (
    decode_binlog,
    decode_binlog_incremental,
)

CATALOG = {("shop", "orders"): ["id", "name", "amount", "cur"]}

FILE_A = bytes.fromhex(
    "fe62696e00105e5f0f01000000670000006b00000000000400352e312e37332d6c"
    "6f67000000000000000000000000000000000000000000000000000000000000000"
    "0000000000000000000105e5f13380d000800120004040404120000540004"
    "1a08000000080808020001105e5f02010000002a000000950000000000090000000"
    "0000000040000000073686f7000424547494e02105e5f130100000036000000cb00"
    "0000000017000000000001000473686f7000066f72646572730004030ff6fe06280"
    "00a02fe060203105e5f17010000003f0000000a0100000000170000000000010004"
    "0f00e903000005616c69636580003039430345555202ea0300007fffffffcd03555"
    "34404105e5f1801000000470000005101000000001700000000000100040f0f00e9"
    "03000005616c69636580003039430345555200e903000006616c6963696185f5e0f"
    "f630345555205105e5f19010000002b0000007c01000000001700000000000100040"
    "f02ea0300007fffffffcd0355534406105e5f10010000001b000000970100000000"
    "4d0000000000000007105e5f040100000028000000bf01000000000400000000000"
    "00062696e6c6f672e303030303032"
)

FILE_B = bytes.fromhex(
    "fe62696e00f153650f010000007a0000007e00000000000400382e302e333600000"
    "0000000000000000000000000000000000000000000000000000000000000000000"
    "000000000000000000f15365130102030405060708090a0b0c0d0e0f10111213141"
    "5161718191a1b1c1d1e1f202122232425262728290124a6144501f1536521010000"
    "0041000000bf0000000000013e11fa4771ca11e19e33c80aa942956205000000000"
    "0000002000000000000000001000000000000004dca1a3d01f15365020100000033"
    "000000f2000000000015000000000000000400000500000000000073686f7000424"
    "547494e31b5e19c02f1536513010000003d0000002f0100000000630000000000010"
    "00473686f7000066f72646572730004030ff6fe0628000a02fe06020101802d318f"
    "e603f153651e0100000035000000640100000000630000000000010002000"
    "40f00ffffffff03626f628000000001034a5059ea78d77c04f153651f0100000044"
    "000000a80100000000630000000000010002000"
    "40f0f00ffffffff03626f628000000001034a505902ffffffff7a0a1f009c034a50"
    "59f560556e05f15365200100000031000000d90100000000630000000000010002000"
    "40f02ffffffff7a0a1f009c034a5059de8492f106f1536510010000001f000000f8"
    "01000000001581e97df4102211fa6d1eaf07f1536504010000002c0000002402000"
    "00000040000000000000062696e6c6f672e303030303039bc533ef8"
)


def test_file_a_51_era_decodes_to_written_down_rows():
    evs = decode_binlog(FILE_A, CATALOG)
    assert [e["op"] for e in evs] == [
        "format_description", "query", "table_map", "write_rows",
        "update_rows", "delete_rows", "xid", "rotate",
    ]
    assert [e["offset"] for e in evs] == [4, 107, 149, 203, 266, 337, 380, 407]
    fde = evs[0]
    assert fde["binlog_version"] == 4
    assert fde["server_version"] == "5.1.73-log"
    assert fde["header_length"] == 19
    assert fde["checksum_alg"] is None          # pre-5.6.1: no checksums
    q = evs[1]
    assert (q["thread_id"], q["exec_time"], q["error_code"]) == (9, 0, 0)
    assert (q["db"], q["sql"]) == ("shop", "BEGIN")
    tm = evs[2]
    assert (tm["db"], tm["tbl"]) == ("shop", "orders")
    w = evs[3]
    assert w["before"] is None
    assert w["after"] == [
        {"id": 1001, "name": "alice", "amount": "12345.67", "cur": "EUR"},
        {"id": 1002, "name": None, "amount": "-0.50", "cur": "USD"},
    ]
    u = evs[4]
    assert u["before"] == [
        {"id": 1001, "name": "alice", "amount": "12345.67", "cur": "EUR"}
    ]
    assert u["after"] == [
        {"id": 1001, "name": "alicia", "amount": "99999999.99", "cur": "EUR"}
    ]
    d = evs[5]
    assert d["after"] is None
    assert d["before"] == [
        {"id": 1002, "name": None, "amount": "-0.50", "cur": "USD"}
    ]
    assert evs[6]["xid"] == 77
    assert evs[7]["sql"] == "binlog.000002"


def test_file_b_80_era_crc32_v2_gtid_unsigned():
    evs = decode_binlog(FILE_B, CATALOG)
    assert [e["op"] for e in evs] == [
        "format_description", "gtid", "query", "table_map", "write_rows",
        "update_rows", "delete_rows", "xid", "rotate",
    ]
    assert [e["offset"] for e in evs] == [4, 126, 191, 242, 303, 356, 424, 473, 504]
    fde = evs[0]
    assert fde["server_version"] == "8.0.36"
    assert fde["checksum_alg"] == "crc32"
    assert evs[1]["gtid"] == "3e11fa47-71ca-11e1-9e33-c80aa9429562:5"
    q = evs[2]
    assert q["thread_id"] == 21
    assert (q["db"], q["sql"]) == ("shop", "BEGIN")   # status vars skipped
    w = evs[4]
    assert w["after"] == [
        # ff ff ff ff under the SIGNEDNESS TLV: unsigned, not -1
        {"id": 4294967295, "name": "bob", "amount": "0.01", "cur": "JPY"},
    ]
    u = evs[5]
    assert u["before"] == [
        {"id": 4294967295, "name": "bob", "amount": "0.01", "cur": "JPY"}
    ]
    assert u["after"] == [
        {"id": 4294967295, "name": None, "amount": "-99999999.99", "cur": "JPY"}
    ]
    assert evs[6]["before"] == [
        {"id": 4294967295, "name": None, "amount": "-99999999.99", "cur": "JPY"}
    ]
    assert evs[7]["xid"] == 1234567890123456789
    assert evs[8]["sql"] == "binlog.000009"


def test_file_b_crc_flip_detected():
    """Any single flipped payload bit must fail the CRC32 check with a
    diagnosable error, never decode silently."""
    bad = bytearray(FILE_B)
    bad[310] ^= 0x40          # inside the WRITE_ROWS v2 body
    with pytest.raises(ValueError, match="CRC32 mismatch"):
        decode_binlog(bytes(bad), CATALOG)


def test_file_a_incremental_resume_mid_log():
    """Offset chaining on golden bytes: decoding from offset 203 with
    the table map carried forward must yield exactly the row events
    (the reference's cdc-turn resume, mysql_binlog.clj:907-919)."""
    head = decode_binlog_incremental(FILE_A[:203], 4)
    evs1, next_off, tmap, _ = head
    assert [e["op"] for e in evs1] == ["format_description", "query", "table_map"]
    assert next_off == 203
    evs2, end, _, _ = decode_binlog_incremental(
        FILE_A[203:], 203, tmap, CATALOG, base=203
    )
    assert [e["op"] for e in evs2] == [
        "write_rows", "update_rows", "delete_rows", "xid", "rotate",
    ]
    assert end == 447
    # without the carried map the row events are undecodable, as in the
    # reference (:727-729)
    with pytest.raises(ValueError):
        decode_binlog_incremental(FILE_A[203:], 203, None, CATALOG, base=203)


def test_file_a_torn_tail_held_back():
    """Truncating mid-event must hold the torn event back, not raise
    and not emit a partial decode (reference :316, :326-328)."""
    evs, next_off, _, _ = decode_binlog_incremental(FILE_A[:250], 4)
    assert [e["op"] for e in evs] == ["format_description", "query", "table_map"]
    assert next_off == 203


# ---------------------------------------------------------------------------
# FILE C — 8.0-era CRC32, the wide type matrix in one WRITE_ROWS v2 row.
# lab.wide, 14 columns (type, metadata → value bytes, all spec-derived):
#   DATETIME2(fsp 3)  '2024-03-05 12:34:56.789' → 5B offset-binary
#       ((2024*13+3)<<22 | 5<<17 | 12<<12 | 34<<6 | 56) + 2^39, BE,
#       + 2B fraction 789
#   TIMESTAMP2(0)     1700000000 → 4B BIG-endian epoch (unlike legacy LE)
#   TIME2(0)          '-01:02:03' → 3B offset-binary 2^23 − (1<<12|2<<6|3)
#   DATE              '2023-12-31' → 3B LE day | month<<5 | year<<9
#   YEAR              2021 → 1B value−1900
#   BIT(12)           meta (bits%8=4, bytes=1) → 2B big-endian 0x0ABC
#   ENUM via STRING   meta (247, 1) → 1B ordinal 2
#   SET via STRING    meta (248, 1) → 1B bitset 0x05 (kept as raw bytes)
#   JSON              meta 4 → 4B LE length + binary doc {"a": 1}
#       (small object: type 00, count u16 1, size u16 12, key entry
#        offset 11 len 1, value entry type 05 inlined s16 1, key 'a')
#   BLOB              meta 2 → 2B LE length + b'blobby' (stays bytes)
#   FLOAT             4B LE IEEE 0.5
#   DOUBLE            8B LE IEEE −2.25
#   LONGLONG          8B LE signed −5
#   INT24             3B LE signed 100000
# Events: FDE @4, TABLE_MAP @126, WRITE_ROWS v2 @199, XID @307; end 338.
FILE_C = bytes.fromhex(
    "fe62696e00f153650f010000007a0000007e00000000000400382e302e3336000000"
    "00000000000000000000000000000000000000000000000000000000000000000000"
    "0000000000000000f15365130102030405060708090a0b0c0d0e0f10111213141516"
    "1718191a1b1c1d1e1f202122232425262728290124a6144501f15365130100000049"
    "000000c700000000000700000000000100036c6162000477696465000e1211130a0d"
    "10fefef5fc040508090d0300000401f701f801040204080000ba8cfe3802f153651e"
    "010000006c000000330100000000070000000000010002000eff3f000099b2cac8b8"
    "03156553f1007fef7d9fcf0f790abc02050d0000000001000c000b00010005010061"
    "0600626c6f6262790000003f00000000000002c0fbffffffffffffffa0860126164f"
    "8703f1536510010000001f0000005201000000003279060000000000d586a1a6"
)

WIDE_CATALOG = {
    ("lab", "wide"): [
        "dt", "ts2", "tm", "d", "yr", "bits", "col_enum", "col_set",
        "js", "raw", "f4", "f8", "big", "mid",
    ]
}


def test_file_c_wide_type_matrix():
    """Every exotic column format decoded from golden bytes with the
    expected values written down independently of any encoder."""
    evs = decode_binlog(FILE_C, WIDE_CATALOG)
    assert [e["op"] for e in evs] == [
        "format_description", "table_map", "write_rows", "xid",
    ]
    assert [e["offset"] for e in evs] == [4, 126, 199, 307]
    w = evs[2]
    assert (w["db"], w["tbl"]) == ("lab", "wide")
    assert w["before"] is None
    assert w["after"] == [{
        "dt": "2024-03-05 12:34:56.789",
        "ts2": 1700000000,
        "tm": "-01:02:03",
        "d": "2023-12-31",
        "yr": 2021,
        "bits": 0x0ABC,
        "col_enum": 2,
        "col_set": b"\x05",
        "js": '{"a": 1}',
        "raw": b"blobby",
        "f4": 0.5,
        "f8": -2.25,
        "big": -5,
        "mid": 100000,
    }]
    assert evs[3]["xid"] == 424242


def test_transaction_payload_over_golden_inner_events():
    """TRANSACTION_PAYLOAD (8.0.20 binlog_transaction_compression),
    assembled from the PUBLIC layout (libbinlogevents
    Transaction_payload_event): body = TLV fields, each
    net_store_length (type, length, value) — 2 = compression type
    (0 ZSTD), 3 = uncompressed size, 1 = compressed payload size —
    terminated by the bare end mark 0, then the compressed payload to
    end of body.  The INNER bytes are golden: FILE A's TABLE_MAP and
    WRITE_ROWS event literals spliced out verbatim (inner events carry
    no checksums, exactly like a real payload); compression is
    pyarrow's zstd codec — an independent implementation, like
    zlib.crc32 for the trailers.  Expected: the envelope row plus the
    two spliced inner events with FILE A's written-down rows, inner
    offsets based at payload_offset + 19 + header_len."""
    import struct
    import zlib

    import pyarrow as pa

    inner = FILE_A[149:203] + FILE_A[203:266]       # TABLE_MAP + WRITE_ROWS
    comp = pa.Codec("zstd").compress(inner, asbytes=True)
    assert len(inner) < 251 and len(comp) < 251     # single-byte varints
    tlv = (
        bytes([2, 1, 0])                 # compression type: ZSTD
        + bytes([3, 1, len(inner)])      # uncompressed size
        + bytes([1, 1, len(comp)])       # payload (compressed) size
        + bytes([0])                     # header end mark
    )
    body = tlv + comp

    # File D: 8.0 FDE (CRC32) + the payload event, headers hand-packed
    fde = FILE_B[4:126]                  # golden FDE literal, CRC intact
    event_len = 19 + len(body) + 4
    offset = 4 + len(fde)
    hdr = struct.pack("<IBIIIH", 1700000009, 40, 1, event_len,
                      offset + event_len, 0)
    ev = hdr + body
    ev += struct.pack("<I", zlib.crc32(ev))
    data = FILE_B[:126] + ev

    evs = decode_binlog(data, CATALOG)
    assert [e["op"] for e in evs] == [
        "format_description", "transaction_payload", "table_map", "write_rows",
    ]
    env = evs[1]
    assert env["offset"] == offset
    assert env["sql"] == "payload: 2 events, zstd"
    inner_base = offset + 19 + len(tlv)
    assert evs[2]["offset"] == inner_base              # spliced TABLE_MAP
    assert (evs[2]["db"], evs[2]["tbl"]) == ("shop", "orders")
    w = evs[3]
    assert w["offset"] == inner_base + 54              # spliced WRITE_ROWS
    assert w["after"] == [
        {"id": 1001, "name": "alice", "amount": "12345.67", "cur": "EUR"},
        {"id": 1002, "name": None, "amount": "-0.50", "cur": "USD"},
    ]


# ---------------------------------------------------------------------------
# FILE E — 8.0-era CRC32, PARTIAL_UPDATE_ROWS (type 39, WL#2955 partial
# JSON).  lab.docs = (LONG pk, JSON).  The before image carries the
# full binary-JSON document {"a": 1, "b": "x"} (small object: count 2,
# size 22, key entries at offsets 18/19, int16 value inlined, string
# value at offset 20); the after image sets value_options bit 0
# (PARTIAL_JSON), flags the JSON column in partial_bits, and carries a
# length-prefixed DIFF VECTOR instead of a document:
#   op 00 REPLACE, path "$.a" (lenc 3), value = binary-JSON int16 7
#   op 02 REMOVE,  path "$.b"
# Expected after document: {"a": 7}.
# Events: FDE @4, TABLE_MAP @126, PARTIAL_UPDATE @174, XID @267; end 298.
FILE_E = bytes.fromhex(
    "fe62696e00f153650f010000007a0000007e00000000000400382e302e3336000000"
    "00000000000000000000000000000000000000000000000000000000000000000000"
    "0000000000000000f15365130102030405060708090a0b0c0d0e0f10111213141516"
    "1718191a1b1c1d1e1f202122232425262728290124a6144501f15365130100000030"
    "000000ae00000000000c00000000000100036c61620004646f6373000203f5010400"
    "6f937bcb02f1536527010000005d0000000b01000000000c00000000000100020002"
    "0303000b00000017000000000200160012000100130001000501000c140061620178"
    "0101000b0000000e0000000003242e61030507000203242e625243bcb203f1536510"
    "010000001f0000002a010000000063000000000000001baeb249"
)


def test_file_e_partial_json_update():
    """The partial-JSON after image must surface the FULL document with
    the diff vector applied against the before image."""
    evs = decode_binlog(FILE_E, {("lab", "docs"): ["id", "doc"]})
    assert [e["op"] for e in evs] == [
        "format_description", "table_map", "update_rows", "xid",
    ]
    assert [e["offset"] for e in evs] == [4, 126, 174, 267]
    u = evs[2]
    assert u["before"] == [{"id": 11, "doc": '{"a": 1, "b": "x"}'}]
    assert u["after"] == [{"id": 11, "doc": '{"a": 7}'}]
    assert evs[3]["xid"] == 99


# ---------------------------------------------------------------------------
# FILE F — 8.0-era CRC32, SCHEMA EVOLUTION mid-log (r14 VERDICT #6: the
# reference's planned-but-never-built DDL story, mysql_binlog.clj:
# 975-976, made real).  lab.acct starts as (id LONG, name VARCHAR(40)
# nullable); an ALTER TABLE adds score INT; the server then emits a
# SECOND TABLE_MAP for the same table with MORE columns and a bumped
# table_id — the public protocol's schema-change signal.  BOTH maps
# carry binlog_row_metadata=FULL optional TLVs: SIGNEDNESS (type 01)
# and COLUMN_NAME (type 04, length-prefixed names) — so the decode
# below runs with an EMPTY catalog and every column name comes off the
# wire.
#
#   offset   4 FORMAT_DESCRIPTION "8.0.36", alg=CRC32 (FILE B's golden
#              FDE literal, CRC intact)
#   offset 126 TABLE_MAP: table_id=7, lab.acct, 2 cols
#              [LONG(03), VARCHAR(15) meta 28 00], null bitmap 02,
#              TLVs: SIGNEDNESS 01 01 00, COLUMN_NAME 04 08
#              ("\x02id\x04name")
#   offset 188 WRITE_ROWS v2: (1, "ann")
#   offset 232 QUERY: thread_id=7, db="lab",
#              sql="ALTER TABLE acct ADD COLUMN score INT"
#   offset 309 TABLE_MAP: table_id=8, SAME lab.acct, NOW 3 cols
#              [LONG, VARCHAR, LONG], null bitmap 06 (name+score
#              nullable), SIGNEDNESS 01 01 00 (2 numeric cols),
#              COLUMN_NAME 04 0e ("\x02id\x04name\x05score")
#   offset 378 WRITE_ROWS v2: (2, "bo", 10) and (3, NULL, NULL) —
#              the second row's null bitmap 06 marks name AND the NEW
#              column SQL NULL
#   offset 430 XID: 777;  end 461
FILE_F = bytes.fromhex(
    "fe62696e00f153650f010000007a0000007e00000000000400382e302e33360000"
    "000000000000000000000000000000000000000000000000000000000000000000"
    "00000000000000000000f15365130102030405060708090a0b0c0d0e0f10111213"
    "1415161718191a1b1c1d1e1f202122232425262728290124a6144564f153651301"
    "0000003e000000bc00000000000700000000000100036c61620004616363740002"
    "030f022800020101000408026964046e616d6574512e3a64f153651e010000002c"
    "000000e80000000000070000000000010002000203000100000003616e6e1ca3b1"
    "9d65f1536502010000004d00000035010000000007000000000000000300000000"
    "6c616200414c544552205441424c4520616363742041444420434f4c554d4e2073"
    "636f726520494e5424ea119766f153651301000000450000007a01000000000800"
    "000000000100036c61620004616363740003030f0302280006010100040e026964"
    "046e616d650573636f72650d51d6f866f153651e0100000034000000ae01000000"
    "00080000000000010002000307000200000002626f0a000000060300000087e871"
    "4567f1536510010000001f000000cd010000000009030000000000000454192c"
)


def test_file_f_schema_evolution_mid_log():
    """The decoder must rebind to the wider TABLE_MAP after the ALTER:
    rows before the boundary decode 2 columns, rows after decode 3,
    names come from the on-wire COLUMN_NAME TLVs (empty catalog), and
    the new column is absent from old rows rather than invented."""
    evs = decode_binlog(FILE_F, {})
    assert [e["op"] for e in evs] == [
        "format_description", "table_map", "write_rows", "query",
        "table_map", "write_rows", "xid",
    ]
    assert [e["offset"] for e in evs] == [4, 126, 188, 232, 309, 378, 430]
    assert evs[3]["sql"] == "ALTER TABLE acct ADD COLUMN score INT"
    w_old = evs[2]
    assert w_old["after"] == [{"id": 1, "name": "ann"}]          # 2 columns
    w_new = evs[5]
    assert w_new["after"] == [
        {"id": 2, "name": "bo", "score": 10},                    # 3 columns
        {"id": 3, "name": None, "score": None},                  # null bitmap 06
    ]
    assert evs[6]["xid"] == 777
    for prev, cur in zip(evs, evs[1:]):
        assert cur["offset"] == prev["next"]


def test_file_f_pushdown_threads_both_maps():
    """Filter-before-decode across the ALTER boundary: skipping
    lab.acct's rows must still thread BOTH table maps (a stale narrow
    map after the boundary would mis-decode or mis-attribute), and the
    matching-set decode equals the full decode."""
    full = decode_binlog(FILE_F, {})
    keep = decode_binlog(FILE_F, {}, only_tables={("lab", "acct")})
    assert keep == full                       # every row event matches
    drop = decode_binlog(FILE_F, {}, only_tables={("no", "table")})
    assert [e["op"] for e in drop] == [
        "format_description", "table_map", "query", "table_map", "xid",
    ]
    assert [e["seq"] for e in drop] == [0, 1, 3, 4, 6]  # skipped frames numbered


def test_file_f_crc_intact_and_flip_detected():
    import zlib

    bad = bytearray(FILE_F)
    bad[410] ^= 0x01                # inside the second WRITE_ROWS body
    with pytest.raises(ValueError, match="CRC32 mismatch"):
        decode_binlog(bytes(bad), {})


# ---------------------------------------------------------------------------
# FILE G — 8.0-era CRC32, ENUM/SET wire format (the reference's own
# type territory: read-type mysql_binlog.clj:530-536 keeps SET as raw
# byte[]).  ENUM and SET travel as MYSQL_TYPE_STRING (254) on the wire
# with the REAL type in metadata byte 0 — the public "string hybrid"
# layout every third-party decoder special-cases.
#
#   offset   4 FORMAT_DESCRIPTION (FILE B's golden CRC32 FDE)
#   offset 126 TABLE_MAP: table_id=3, shop.items, 3 cols
#              [LONG(03), wire 254 meta f7 01 (ENUM, 5 values →
#              1-byte ordinal), wire 254 meta f8 02 (SET, 12 members
#              → 2-byte bitset)], null bitmap 06
#   offset 180 WRITE_ROWS v2, two rows:
#              (7, ordinal 3, bitset 0x0A05 little-endian = bytes
#              05 0a) and (8, NULL, NULL) — per-row null bitmap 06
#   offset 228 XID: 4242;  end 259
FILE_G = bytes.fromhex(
    "fe62696e00f153650f010000007a0000007e00000000000400382e302e33360000"
    "000000000000000000000000000000000000000000000000000000000000000000"
    "00000000000000000000f15365130102030405060708090a0b0c0d0e0f10111213"
    "1415161718191a1b1c1d1e1f202122232425262728290124a61445c8f153651301"
    "00000036000000b4000000000003000000000001000473686f7000056974656d73"
    "000303fefe04f701f802060d0f7790c8f153651e0100000030000000e400000000"
    "00030000000000010002000307000700000003050a0608000000103e1c4fc9f153"
    "6510010000001f0000000301000000009210000000000000efba905d"
)


def test_file_g_enum_set_wire_format():
    """ENUM decodes to its ordinal (1-byte width from metadata), SET
    to RAW bitset bytes (2-byte width; the reference keeps byte[] too),
    and the null bitmap covers both — from bytes no repo writer
    produced."""
    evs = decode_binlog(FILE_G, {("shop", "items"): ["id", "status", "flags"]})
    assert [e["op"] for e in evs] == [
        "format_description", "table_map", "write_rows", "xid",
    ]
    assert [e["offset"] for e in evs] == [4, 126, 180, 228]
    w = evs[2]
    assert w["after"] == [
        {"id": 7, "status": 3, "flags": (0x0A05).to_bytes(2, "little")},
        {"id": 8, "status": None, "flags": None},
    ]
    assert evs[3]["xid"] == 4242
    for prev, cur in zip(evs, evs[1:]):
        assert cur["offset"] == prev["next"]


# ---------------------------------------------------------------------------
# FILE H — CRC32, DROP COLUMN + type-WIDENING ALTER mid-log (r15
# VERDICT #5; FILE F covers ADD only).  lab.acct starts 3 columns
# (id LONG, name VARCHAR(40), score INT); ALTER DROP COLUMN name →
# the server emits a NARROWER map (table_id 7→8, 3→2 cols); ALTER
# MODIFY COLUMN score BIGINT → same width but a WIDER type (LONG 03 →
# LONGLONG 08, table_id 9) — the rows after it carry 8-byte values
# above 2^32, so a decoder still bound to the old 4-byte codec cannot
# produce them.  All three maps carry binlog_row_metadata=FULL
# COLUMN_NAME TLVs (empty catalog; names come off the wire).
#
#   offset   4 FORMAT_DESCRIPTION "5.6.51-spark-cdc", alg=CRC32
#   offset 112 TABLE_MAP: table_id=7, lab.acct, 3 cols
#              [LONG, VARCHAR(40) meta 28 00, LONG], COLUMN_NAME TLV
#              ("\x02id\x04name\x05score")
#   offset 178 WRITE_ROWS v2: (1, "ann", 5)
#   offset 226 QUERY: thread_id=7, "ALTER TABLE acct DROP COLUMN name"
#   offset 299 TABLE_MAP: table_id=8, SAME lab.acct, NOW 2 cols
#              [LONG, LONG], COLUMN_NAME TLV ("\x02id\x05score")
#   offset 357 WRITE_ROWS v2: (2, 7) and (3, NULL) — null bitmap 02
#              marks the surviving score column SQL NULL
#   offset 406 QUERY: "ALTER TABLE acct MODIFY COLUMN score BIGINT"
#   offset 489 TABLE_MAP: table_id=9, 2 cols [LONG, LONGLONG]
#   offset 547 WRITE_ROWS v2: (4, 5000000000)     — needs 8 bytes
#   offset 595 UPDATE_ROWS v2: (4, 5e9) → (4, 6e9)
#   offset 657 XID: 888;  end 688
FILE_H = bytes.fromhex(
    "fe62696e000000000f010000006c0000007000000000000400352e362e35312d73"
    "7061726b2d63646300000000000000000000000000000000000000000000000000"
    "000000000000000000000000001300000000000000000000000000000000000000"
    "0000000000000000015bf966b901105365130100000042000000b2000000000007"
    "00000000000000036c61620004616363740003030f0302280007040e026964046e"
    "616d650573636f72656c08044f021053651e0100000030000000e2000000000007"
    "0000000000000002000307000100000003616e6e05000000223451da0310536502"
    "01000000490000002b0100000000070000000000000003000000006c616200414c"
    "544552205441424c4520616363742044524f5020434f4c554d4e206e616d65380f"
    "8bc40410536513010000003a0000006501000000000800000000000000036c6162"
    "00046163637400020303000304090269640573636f7265e172ade9051053651e01"
    "000000310000009601000000000800000000000000020002030002000000070000"
    "0002030000002911507f06105365020100000053000000e9010000000007000000"
    "0000000003000000006c616200414c544552205441424c452061636374204d4f44"
    "49465920434f4c554d4e2073636f726520424947494e542b3ce3ac071053651301"
    "0000003a0000002302000000000900000000000000036c61620004616363740002"
    "0308000304090269640573636f7265b29b0eec081053651e010000003000000053"
    "0200000000090000000000000002000203000400000000f2052a01000000746e7c"
    "ea091053651f010000003e00000091020000000009000000000000000200020303"
    "000400000000f2052a01000000000400000000bca06501000000829c86ac0a1053"
    "6510010000001f000000b002000000007803000000000000e9886e81"
)

FILE_H_OFFSETS = [4, 112, 178, 226, 299, 357, 406, 489, 547, 595, 657]


def test_file_h_drop_and_widen_mid_log():
    """Narrowing rebind (DROP) and type-widening rebind (MODIFY) both
    take effect at their map boundary: rows decode 3 → 2 columns, and
    post-MODIFY score values exceed 2^32 (impossible under the old
    4-byte codec).  Empty catalog — names come from COLUMN_NAME TLVs."""
    evs = decode_binlog(FILE_H, {})
    assert [e["op"] for e in evs] == [
        "format_description", "table_map", "write_rows", "query",
        "table_map", "write_rows", "query", "table_map", "write_rows",
        "update_rows", "xid",
    ]
    assert [e["offset"] for e in evs] == FILE_H_OFFSETS
    assert evs[2]["after"] == [{"id": 1, "name": "ann", "score": 5}]
    assert evs[3]["sql"] == "ALTER TABLE acct DROP COLUMN name"
    # post-DROP: name is GONE (not None — the key is absent)
    assert evs[5]["after"] == [{"id": 2, "score": 7}, {"id": 3, "score": None}]
    assert evs[6]["sql"] == "ALTER TABLE acct MODIFY COLUMN score BIGINT"
    assert evs[8]["after"] == [{"id": 4, "score": 5_000_000_000}]
    assert evs[9]["before"] == [{"id": 4, "score": 5_000_000_000}]
    assert evs[9]["after"] == [{"id": 4, "score": 6_000_000_000}]
    assert evs[10]["xid"] == 888
    for prev, cur in zip(evs, evs[1:]):
        assert cur["offset"] == prev["next"]


def test_file_h_pushdown_threads_all_three_maps():
    """only_tables skip must thread ALL THREE maps across both ALTER
    boundaries (a stale map would mis-size the post-MODIFY 8-byte
    image); the matching-set decode equals the full decode, and the
    delta-type skip composes across the widened map too."""
    full = decode_binlog(FILE_H, {})
    keep = decode_binlog(FILE_H, {}, only_tables={("lab", "acct")})
    assert keep == full
    drop = decode_binlog(FILE_H, {}, only_tables={("no", "table")})
    assert [e["op"] for e in drop] == [
        "format_description", "table_map", "query", "table_map",
        "query", "table_map", "xid",
    ]
    assert [e["seq"] for e in drop] == [0, 1, 3, 4, 6, 7, 10]
    ins_only = decode_binlog(FILE_H, {}, only_ops={"write_rows"})
    assert ins_only == [
        e for e in full
        if e["op"] not in ("update_rows", "delete_rows")
    ]


def test_file_h_crc_flip_detected():
    bad = bytearray(FILE_H)
    bad[620] ^= 0x01                # inside the UPDATE_ROWS body
    with pytest.raises(ValueError, match="CRC32 mismatch"):
        decode_binlog(bytes(bad), {})


# ---------------------------------------------------------------------------
# FILE I — PREVIOUS_GTIDS wire layout (spec-derived, decoder-independent).
#
# Public format (MySQL internals, Gtid_set::encode / rpl_gtid_set.cc):
#   body = n_sids u64 LE, then per sid:
#     sid 16 bytes (server UUID, raw)
#     n_intervals u64 LE
#     per interval: start u64 LE, end u64 LE — END EXCLUSIVE on the
#     wire; the canonical text renders inclusive ("1-5" = wire (1, 6)).
# Event frame: v4 header (ts u32, type u8 = 35, server_id u32,
# event_len u32, next_pos u32, flags u16), no checksum in this vector.
# ---------------------------------------------------------------------------


def test_file_i_previous_gtids_wire_layout():
    import struct

    from mysql_cdc_spark.sources.binlog_codec import (
        MAGIC,
        BinlogWriter,
        parse_gtid_set,
    )

    sid1 = bytes.fromhex("3e11fa4771ca11e19e33c80aa9429562")
    sid2 = bytes.fromhex("aaaaaaaabbbbccccddddeeeeeeeeeeee")
    body = struct.pack("<Q", 2)
    body += sid1 + struct.pack("<Q", 2)
    body += struct.pack("<QQ", 1, 6)      # text "1-5" (end-exclusive 6)
    body += struct.pack("<QQ", 7, 8)      # text "7"   (single txn)
    body += sid2 + struct.pack("<Q", 1)
    body += struct.pack("<QQ", 3, 11)     # text "3-10"
    header = struct.pack(
        "<IBIIIH", 1700000000, 35, 1, 19 + len(body), 4 + 19 + len(body), 0
    )
    # a bare FDE-less fragment decodes with base past the magic
    data = MAGIC + header + body
    evs = decode_binlog(data, {})
    assert len(evs) == 1
    ev = evs[0]
    assert ev["op"] == "previous_gtids"
    assert ev["sql"] == (
        "3e11fa47-71ca-11e1-9e33-c80aa9429562:1-5:7,"
        "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee:3-10"
    )
    # the canonical text round-trips through the set parser
    parsed = parse_gtid_set(ev["sql"])
    assert parsed["3e11fa47-71ca-11e1-9e33-c80aa9429562"] == [(1, 5), (7, 7)]
    assert parsed["aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee"] == [(3, 10)]
    # and the writer emits this exact body (encode/decode symmetry)
    w = BinlogWriter()
    w.write_previous_gtids(
        {
            "3e11fa47-71ca-11e1-9e33-c80aa9429562": [(1, 5), (7, 7)],
            "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee": [(3, 10)],
        },
        ts=1700000000,
    )
    written = bytes(w.buf)
    # strip magic + FDE: the last frame is the PREVIOUS_GTIDS event
    assert written.endswith(body)
