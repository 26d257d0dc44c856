"""Parity pin for the r19 compiled image decoder: `_compile_image_plan`
generates straight-line source per (table map, used bitmap) shape; this
test proves the generated decoder is value-identical to the interpreted
(name, decoder)-loop it replaced, over the full type matrix (fixed ints
/ floats / temporals, length-prefixed varchar/blob, packed decimal,
enum/set hybrids, BIT, JSON) including NULL bitmap patterns and update
before/after pairs."""

from __future__ import annotations

import pytest

import mysql_cdc_spark.sources.binlog_codec as bc
from mysql_cdc_spark.sources.binlog_codec import decode_binlog

from test_binlog_codec import _wide_matrix_log  # noqa: F401 — fixture builder


def _interpreted_plan(specs, null_bytes, stringify=False):
    """The pre-r19 interpreted image loop, rebuilt from the same specs
    `_compile_image_plan` receives — the reference semantics.
    ``stringify`` is honoured as typed-decode + `stringify_image`, the
    definitional form the fused string-mode plans must match."""
    fields = [
        (name, bc._make_field_decoder(tc, meta, unsigned, cs))
        for name, tc, meta, unsigned, cs in specs
    ]

    def _img(body, pos):
        nulls = int.from_bytes(body[pos:pos + null_bytes], "little")
        pos += null_bytes
        image = {}
        j = 0
        for name, dec in fields:
            if (nulls >> j) & 1:
                image[name] = None
            else:
                image[name], pos = dec(body, pos)
            j += 1
        if stringify:
            image = bc.stringify_image(image)
        return image, pos

    return _img


def _clear_plan_caches():
    # TableMapState instances (and their _img_plans) are memoized
    # globally — clear so each decode below builds fresh plans.
    bc._TMAP_CACHE.clear()
    bc._TMAP_FULL.clear()


def test_compiled_image_plan_matches_interpreted(monkeypatch):
    data, cat = _wide_matrix_log()
    _clear_plan_caches()
    compiled = decode_binlog(data, cat)
    monkeypatch.setattr(bc, "_compile_image_plan", _interpreted_plan)
    _clear_plan_caches()
    interpreted = decode_binlog(data, cat)
    _clear_plan_caches()
    assert compiled == interpreted
    # the fixture must actually exercise rows on both sides
    ops = {e["op"] for e in compiled}
    assert {"write_rows", "update_rows", "delete_rows"} <= ops


def test_stringify_decode_matches_stringified_typed(monkeypatch):
    """The fused string-mode decode (decode_binlog(..., stringify=True),
    r19 §4: one dict build per image, not decode + re-walk) is
    value-identical to typed decode + stringify_image over the full
    type matrix — both against the compiled plans and against the
    interpreted reference loop."""
    data, cat = _wide_matrix_log()
    _clear_plan_caches()
    fused = decode_binlog(data, cat, stringify=True)
    _clear_plan_caches()
    typed = decode_binlog(data, cat)
    for ev in typed:
        if ev["op"].endswith("_rows"):
            for side in ("before", "after"):
                if ev[side]:
                    ev[side] = [bc.stringify_image(r) for r in ev[side]]
    assert fused == typed
    monkeypatch.setattr(bc, "_compile_image_plan", _interpreted_plan)
    _clear_plan_caches()
    interpreted = decode_binlog(data, cat, stringify=True)
    _clear_plan_caches()
    assert fused == interpreted
    ops = {e["op"] for e in fused}
    assert {"write_rows", "update_rows", "delete_rows"} <= ops


def test_stringify_binary_charset_hexes_varbinary():
    """VARBINARY (collation 63) decodes to bytes typed; the fused
    string mode must hex it exactly like stringify_image — the one
    charset case where the inline varchar path changes shape."""
    from mysql_cdc_spark.sources.binlog_codec import (
        TYPE_LONG, TYPE_VARCHAR, WRITE_ROWS_EVENT, BinlogWriter,
        TableDef,
    )

    t = TableDef(
        "db", "vb",
        [(TYPE_LONG, None), (TYPE_VARCHAR, 40), (TYPE_VARCHAR, 40)],
        default_charset=255,
        charset_overrides={0: 63},  # 1st CHARACTER column → binary
    )
    w = BinlogWriter()
    w.write_table_map(t)
    w.write_rows(WRITE_ROWS_EVENT, t, [[7, b"\x00\xde\xad\xbe\xef", "tëxt"]])
    data, cat = w.getvalue(), {("db", "vb"): ["id", "blob_col", "txt"]}
    _clear_plan_caches()
    typed = [e for e in decode_binlog(data, cat) if e["op"] == "write_rows"]
    _clear_plan_caches()
    fused = [
        e for e in decode_binlog(data, cat, stringify=True)
        if e["op"] == "write_rows"
    ]
    _clear_plan_caches()
    assert typed[0]["after"][0]["blob_col"] == b"\x00\xde\xad\xbe\xef"
    assert fused[0]["after"][0] == bc.stringify_image(typed[0]["after"][0])
    assert fused[0]["after"][0]["blob_col"] == "00deadbeef"
    assert fused[0]["after"][0]["txt"] == "tëxt"


@pytest.mark.parametrize("ncols", [1, 8, 9, 64, 65])
def test_compiled_plan_null_bitmap_widths(monkeypatch, ncols):
    """Bitmap-width edges: 1 byte (<=8 cols, the direct-index fast
    path), exactly 8/9 (byte boundary), 64/65 (multi-byte shift).
    Every-other-column NULL so high bits are exercised."""
    from mysql_cdc_spark.sources.binlog_codec import (
        TYPE_LONG, WRITE_ROWS_EVENT, BinlogWriter, TableDef,
    )

    t = TableDef("db", f"w{ncols}", [(TYPE_LONG, None)] * ncols)
    row_full = list(range(ncols))
    row_nulls = [None if i % 2 else i for i in range(ncols)]
    w = BinlogWriter()
    w.write_table_map(t)
    w.write_rows(WRITE_ROWS_EVENT, t, [row_full, row_nulls])
    data = w.getvalue()
    cat = {("db", f"w{ncols}"): [f"c{i}" for i in range(ncols)]}

    _clear_plan_caches()
    compiled = decode_binlog(data, cat)
    monkeypatch.setattr(bc, "_compile_image_plan", _interpreted_plan)
    _clear_plan_caches()
    interpreted = decode_binlog(data, cat)
    _clear_plan_caches()
    assert compiled == interpreted
    after = [e for e in compiled if e["op"] == "write_rows"][0]["after"]
    assert after[0][f"c{ncols - 1}"] == ncols - 1
    if ncols > 1:
        assert after[1]["c1"] is None
