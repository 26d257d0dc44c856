"""TRANSACTION_PAYLOAD_EVENT (MySQL 8.0.20+ binlog_transaction_compression):
a whole transaction's events TLV-wrapped in one envelope event.  The
decoder must parse the varint TLV header, splice the embedded events
into the stream with contiguous seq numbers and correct table-map
threading, ignore the embedded events' original-log positions, and fail
cleanly (or dead-letter) on ZSTD payloads when no zstd library exists.
"""

from __future__ import annotations

import pytest

from mysql_cdc_spark.sources.binlog_codec import (
    TYPE_LONG,
    TYPE_NEWDECIMAL,
    TYPE_VARCHAR,
    WRITE_ROWS_EVENT,
    BinlogWriter,
    TableDef,
    decode_binlog,
)

T3 = TableDef(
    "foo", "auto",
    [(TYPE_LONG, None), (TYPE_NEWDECIMAL, (12, 4)), (TYPE_VARCHAR, 50)],
)
CAT = {("foo", "auto"): ["id", "val", "word"]}


def _inner_txn_bytes(row_id: int, xid: int) -> bytes:
    """Event bytes for one transaction (no magic/FDE), as the server
    stores them inside a payload."""
    w = BinlogWriter()
    start = w.offset                    # skip magic + FDE
    w.write_query("foo", "BEGIN", ts=9)
    w.write_table_map(T3, ts=9)
    w.write_rows(WRITE_ROWS_EVENT, T3, [[row_id, "1.5000", "in"]], ts=9, v2=True)
    w.write_xid(xid, ts=9)
    return bytes(w.getvalue()[start:])


def test_payload_events_spliced_with_table_map_threading():
    w = BinlogWriter()
    w.write_transaction_payload(_inner_txn_bytes(1, 71), ts=9)
    w.write_transaction_payload(_inner_txn_bytes(2, 72), ts=10)
    evs = decode_binlog(w.getvalue(), CAT)
    ops = [e["op"] for e in evs]
    assert ops == [
        "format_description",
        "transaction_payload", "query", "table_map", "write_rows", "xid",
        "transaction_payload", "query", "table_map", "write_rows", "xid",
    ]
    assert [e["seq"] for e in evs] == list(range(len(evs)))  # contiguous splice
    rows = [e for e in evs if e["op"] == "write_rows"]
    assert [r["after"][0]["id"] for r in rows] == [1, 2]
    assert rows[0]["after"] == [{"id": 1, "val": "1.5000", "word": "in"}]
    assert [e["xid"] for e in evs if e["op"] == "xid"] == [71, 72]
    assert "2 events" not in evs[1]["sql"]  # envelope row describes itself
    assert evs[1]["sql"].startswith("payload: 4 events")


def test_payload_inner_offsets_ignore_original_log_positions():
    """Embedded headers carry log_pos from the ORIGINAL log; the walk
    must advance by event length, never by those positions."""
    inner = _inner_txn_bytes(5, 99)
    w = BinlogWriter()
    w.write_transaction_payload(inner, ts=1)
    evs = decode_binlog(w.getvalue(), CAT)
    # all four embedded events decoded despite their foreign log_pos
    assert [e["op"] for e in evs[2:]] == ["query", "table_map", "write_rows", "xid"]
    # inner offsets are absolute positions of the embedded bytes
    payload_rows = [e["offset"] for e in evs[2:]]
    assert payload_rows == sorted(payload_rows)
    assert payload_rows[0] > evs[1]["offset"]


def test_payload_table_map_escapes_to_outer_stream():
    """A TABLE_MAP inside a payload threads OUT: a bare rows event
    after the payload still decodes under the embedded map."""
    w = BinlogWriter()
    w.write_transaction_payload(_inner_txn_bytes(1, 71), ts=9)
    w.write_rows(WRITE_ROWS_EVENT, T3, [[8, "2.0000", "out"]], ts=11)
    evs = decode_binlog(w.getvalue(), CAT)
    assert evs[-1]["op"] == "write_rows"
    assert evs[-1]["after"] == [{"id": 8, "val": "2.0000", "word": "out"}]


def test_zstd_payload_decodes_same_as_uncompressed_twin():
    """A ZSTD-compressed transaction must decode to the SAME spliced
    events as its uncompressed twin (8.0.20+
    binlog_transaction_compression=ON writes ZSTD)."""
    inner = _inner_txn_bytes(3, 81)
    wa, wb = BinlogWriter(), BinlogWriter()
    wa.write_transaction_payload(inner, ts=9, compression_type=255)
    wb.write_transaction_payload(inner, ts=9, compression_type=0)
    assert wb.getvalue() != wa.getvalue()  # really compressed on the wire
    eva = decode_binlog(wa.getvalue(), CAT)
    evb = decode_binlog(wb.getvalue(), CAT)
    assert [e["op"] for e in evb] == [e["op"] for e in eva] == [
        "format_description", "transaction_payload",
        "query", "table_map", "write_rows", "xid",
    ]
    assert evb[1]["sql"] == "payload: 4 events, zstd"
    # spliced row/xid content identical (offsets differ: compressed
    # envelope occupies different byte positions)
    strip = ("offset", "next_offset", "event_size", "sql")
    for a, b in zip(eva[2:], evb[2:]):
        assert {k: v for k, v in a.items() if k not in strip} == \
               {k: v for k, v in b.items() if k not in strip}


def test_corrupt_zstd_frame_raises_and_quarantines():
    w = BinlogWriter()
    w.write_transaction_payload(_inner_txn_bytes(1, 5), ts=1,
                                compression_type=0)
    w.write_xid(5, ts=1)
    raw = bytearray(w.getvalue())
    # flip a byte deep inside the compressed payload (the payload event
    # is followed only by the 27-byte xid event + CRC, so -40 lands in
    # the compressed bytes) so decompression fails
    raw[-40] ^= 0xFF
    with pytest.raises(ValueError):
        decode_binlog(bytes(raw), CAT)
    evs = decode_binlog(bytes(raw), CAT, on_error="quarantine")
    assert evs[1]["op"] == "quarantine"
    assert evs[-1]["op"] == "xid"  # walk continues past the dead letter


def test_zstd_payload_missing_uncompressed_size_tlv_rejected():
    from mysql_cdc_spark.sources.binlog_codec import (
        TRANSACTION_PAYLOAD_EVENT,
        _zstd_backend,
        enc_packed_int,
    )

    comp = _zstd_backend()[0](b"junk")
    ct = enc_packed_int(0)
    body = (
        enc_packed_int(2) + enc_packed_int(len(ct)) + ct
        + enc_packed_int(0) + comp
    )
    w = BinlogWriter()
    w._emit(TRANSACTION_PAYLOAD_EVENT, body, 1)
    with pytest.raises(ValueError, match="uncompressed-size"):
        decode_binlog(w.getvalue(), CAT)


def test_zstd_payload_without_any_codec_raises_and_quarantines(monkeypatch):
    import mysql_cdc_spark.sources.binlog_codec as codec

    w = BinlogWriter()
    w.write_transaction_payload(_inner_txn_bytes(1, 5), ts=1,
                                compression_type=0)
    w.write_xid(5, ts=1)
    monkeypatch.setattr(codec, "_zstd_backend", lambda: None)
    with pytest.raises(ValueError, match="no zstd codec"):
        decode_binlog(w.getvalue(), CAT)
    evs = decode_binlog(w.getvalue(), CAT, on_error="quarantine")
    assert [e["op"] for e in evs] == ["format_description", "quarantine", "xid"]


def test_unknown_compression_type_rejected():
    w = BinlogWriter()
    w.write_transaction_payload(b"x", ts=1, compression_type=7)
    with pytest.raises(ValueError, match="compression type 7"):
        decode_binlog(w.getvalue(), CAT)
