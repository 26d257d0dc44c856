"""Property-based codec tests (hypothesis): round-trip invariants for
the packed decimal, packed ints, and full row-event encode/decode over
arbitrary values — the fuzzing layer above the fixed vectors in
test_binlog_codec.py."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mysql_cdc_spark.sources.binlog_codec import (
    TYPE_LONG,
    TYPE_NEWDECIMAL,
    TYPE_VARCHAR,
    UPDATE_ROWS_EVENT,
    WRITE_ROWS_EVENT,
    BinlogWriter,
    TableDef,
    decimal_bin_size,
    decode_binlog,
    decode_decimal,
    enc_packed_int,
    encode_decimal,
    read_packed_int,
)


@st.composite
def decimals(draw):
    """(canonical_string, precision, scale) with digits fitting the type."""
    scale = draw(st.integers(0, 12))
    intg = draw(st.integers(1, 20))
    precision = intg + scale
    ip = draw(st.integers(0, 10**intg - 1))
    fp = draw(st.integers(0, 10**scale - 1)) if scale else 0
    neg = draw(st.booleans()) and (ip or fp)
    txt = f"{'-' if neg else ''}{ip}" + (f".{fp:0{scale}d}" if scale else "")
    return txt, precision, scale


@given(decimals())
@settings(max_examples=300, deadline=None)
def test_decimal_roundtrip_property(t):
    txt, p, s = t
    b = encode_decimal(txt, p, s)
    assert len(b) == decimal_bin_size(p, s)
    assert decode_decimal(b, p, s) == txt


@given(st.integers(0, 2**63 - 1))
@settings(max_examples=200, deadline=None)
def test_packed_int_roundtrip_property(n):
    v, pos = read_packed_int(enc_packed_int(n), 0)
    assert v == n and pos == len(enc_packed_int(n))


_VALS = st.tuples(
    st.integers(-(2**31), 2**31 - 1),                       # LONG
    st.one_of(st.none(), st.integers(0, 99999999)),         # DECIMAL(12,4) int part
    st.one_of(st.none(), st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=50)),
)


def _row(v):
    i, d, w = v
    dec = None if d is None else f"{d}.{i % 10000 if i >= 0 else (-i) % 10000:04d}"
    return [i, dec, w]


@given(st.lists(_VALS, min_size=1, max_size=5), st.booleans())
@settings(max_examples=60, deadline=None)
def test_rows_event_roundtrip_property(vals, as_update):
    """Arbitrary rows (NULLs anywhere, any printable VARCHAR payload)
    survive encode → decode bit-exactly, for both single-image and
    update-pair events."""
    t = TableDef("d", "t", [(TYPE_LONG, None), (TYPE_NEWDECIMAL, (12, 4)), (TYPE_VARCHAR, 50)])
    cat = {("d", "t"): ["i", "dec", "w"]}
    rows = [_row(v) for v in vals]
    w = BinlogWriter()
    w.write_table_map(t)
    if as_update:
        w.write_rows(UPDATE_ROWS_EVENT, t, [(r, _row(v)) for r, v in zip(rows, vals)])
    else:
        w.write_rows(WRITE_ROWS_EVENT, t, rows)
    evs = decode_binlog(w.getvalue(), cat)
    images = evs[-1]["after"] if not as_update else evs[-1]["before"]
    assert len(images) == len(rows)
    for img, row in zip(images, rows):
        assert img == {"i": row[0], "dec": row[1], "w": row[2]}


@given(st.lists(_VALS, min_size=1, max_size=3), st.integers(1, 40))
@settings(max_examples=60, deadline=None)
def test_torn_tail_never_yields_partial_event(vals, cut):
    """ANY truncation either drops whole trailing events or none —
    a decoded event is always complete (reference :316, :326-328)."""
    t = TableDef("d", "t", [(TYPE_LONG, None), (TYPE_NEWDECIMAL, (12, 4)), (TYPE_VARCHAR, 50)])
    w = BinlogWriter()
    w.write_table_map(t)
    w.write_rows(WRITE_ROWS_EVENT, t, [_row(v) for v in vals])
    w.write_xid(7)
    data = w.getvalue()
    full = decode_binlog(data)
    cut = min(cut, len(data) - 5)
    part = decode_binlog(data[:cut] if cut > 4 else data)
    assert len(part) <= len(full)
    for a, b in zip(part, full):
        assert a == b  # a prefix, never a mangled event


from mysql_cdc_spark.sources.binlog_codec import TYPE_ENUM, TYPE_SET  # noqa: E402


@given(
    n_values=st.integers(1, 1000),
    n_members=st.integers(1, 64),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_enum_set_roundtrip_property(n_values, n_members, data):
    """Any ENUM ordinal within range and any SET bitset round-trips at
    both metadata widths (1/2-byte ordinal, 1..8-byte bitset)."""
    t = TableDef("d", "t", [(TYPE_ENUM, n_values), (TYPE_SET, n_members)])
    ordinal = data.draw(st.integers(1, n_values))
    bitset = data.draw(st.integers(0, 2**n_members - 1))
    w = BinlogWriter()
    w.write_table_map(t)
    w.write_rows(WRITE_ROWS_EVENT, t, [[ordinal, bitset]])
    after = decode_binlog(w.getvalue(), {("d", "t"): ["e", "s"]})[-1]["after"][0]
    assert after["e"] == ordinal
    from mysql_cdc_spark.sources.binlog_codec import set_pack_len
    assert after["s"] == bitset.to_bytes(set_pack_len(n_members), "little")


# --- wide-type round-trip properties ----------------------------------------


@st.composite
def time_strings(draw):
    fsp = draw(st.integers(0, 6))
    h = draw(st.integers(0, 838))
    m, s = draw(st.integers(0, 59)), draw(st.integers(0, 59))
    neg = draw(st.booleans()) and (h or m or s)
    frac = draw(st.integers(0, 10**fsp - 1)) if fsp else 0
    txt = f"{'-' if neg else ''}{h:02d}:{m:02d}:{s:02d}"
    if fsp:
        txt += f".{frac:0{fsp}d}"
    return txt, fsp


@given(time_strings())
@settings(max_examples=300, deadline=None)
def test_time2_roundtrip_property(t):
    from mysql_cdc_spark.sources.binlog_codec import decode_time2, encode_time2

    txt, fsp = t
    assert decode_time2(encode_time2(txt, fsp), fsp) == txt


@st.composite
def datetime_strings(draw):
    fsp = draw(st.integers(0, 6))
    y = draw(st.integers(1, 9999))
    mo, d = draw(st.integers(1, 12)), draw(st.integers(1, 28))
    h, mi, s = draw(st.integers(0, 23)), draw(st.integers(0, 59)), draw(st.integers(0, 59))
    frac = draw(st.integers(0, 10**fsp - 1)) if fsp else 0
    txt = f"{y:04d}-{mo:02d}-{d:02d} {h:02d}:{mi:02d}:{s:02d}"
    if fsp:
        txt += f".{frac:0{fsp}d}"
    return txt, fsp


@given(datetime_strings())
@settings(max_examples=300, deadline=None)
def test_datetime2_roundtrip_property(t):
    from mysql_cdc_spark.sources.binlog_codec import decode_datetime2, encode_datetime2

    txt, fsp = t
    assert decode_datetime2(encode_datetime2(txt, fsp), fsp) == txt


@given(st.integers(0, 2**32 - 1), st.integers(0, 6))
@settings(max_examples=200, deadline=None)
def test_timestamp2_roundtrip_property(sec, fsp):
    from mysql_cdc_spark.sources.binlog_codec import decode_timestamp2, encode_timestamp2

    if fsp == 0:
        assert decode_timestamp2(encode_timestamp2(sec, 0), 0) == sec
    else:
        txt = f"{sec}.{0:0{fsp}d}"
        assert decode_timestamp2(encode_timestamp2(txt, fsp), fsp) == txt


@given(st.dates())
@settings(max_examples=200, deadline=None)
def test_date_roundtrip_property(d):
    from mysql_cdc_spark.sources.binlog_codec import decode_date, encode_date

    assert decode_date(encode_date(d.isoformat())) == d.isoformat()


@given(
    st.integers(-128, 127), st.integers(-(2**15), 2**15 - 1),
    st.integers(-(2**23), 2**23 - 1), st.integers(-(2**63), 2**63 - 1),
    st.binary(max_size=300),
)
@settings(max_examples=200, deadline=None)
def test_int_and_blob_row_roundtrip_property(t8, t16, t24, t64, blob):
    from mysql_cdc_spark.sources.binlog_codec import (
        TYPE_BLOB, TYPE_INT24, TYPE_LONGLONG, TYPE_SHORT, TYPE_TINY,
    )

    cols = [
        (TYPE_TINY, None), (TYPE_SHORT, None), (TYPE_INT24, None),
        (TYPE_LONGLONG, None), (TYPE_BLOB, 2),
    ]
    t = TableDef("d", "w", cols)
    w = BinlogWriter()
    w.write_table_map(t)
    w.write_rows(WRITE_ROWS_EVENT, t, [[t8, t16, t24, t64, blob]])
    img = decode_binlog(w.getvalue(), {})[-1]["after"][0]
    assert [img[str(i + 1)] for i in range(5)] == [t8, t16, t24, t64, blob]


_mask = st.lists(st.booleans(), min_size=3, max_size=3).filter(any)


@given(
    present=_mask,
    present_after=_mask,
    vals=st.lists(st.integers(-2**31, 2**31 - 1), min_size=3, max_size=3),
    nulls=st.lists(st.booleans(), min_size=3, max_size=3),
)
@settings(max_examples=60, deadline=None)
def test_arbitrary_used_column_masks_roundtrip(present, present_after, vals, nulls):
    """binlog_row_image generalization: for ANY non-empty used-column
    bitmap combination (full, minimal, noblob, or stranger), decoded
    image maps contain exactly the present columns, with NULLs
    preserved and absent columns missing — never misaligned values.
    (All-empty images don't occur on real servers and trip the
    zero-width corrupt-row guard by design.)"""
    t = TableDef("d", "t", [(TYPE_LONG, None)] * 3, table_id=3)
    cat = {("d", "t"): ["c0", "c1", "c2"]}
    row = [None if nulls[i] else vals[i] for i in range(3)]
    expect_before = {f"c{i}": row[i] for i in range(3) if present[i]}
    expect_after = {f"c{i}": row[i] for i in range(3) if present_after[i]}

    w = BinlogWriter()
    w.write_table_map(t)
    w.write_rows(
        UPDATE_ROWS_EVENT, t, [(row, row)],
        present=present, present_after=present_after,
    )
    evs = decode_binlog(w.getvalue(), cat)
    up = next(e for e in evs if e["op"] == "update_rows")
    assert up["before"] == [expect_before]
    assert up["after"] == [expect_after]


# --- r17: width-walk (images=) parity under arbitrary tables/rows -----------
#
# The skip plans re-derive every column's byte width independently of
# the decoders; a divergence silently corrupts the walk.  The decode
# loop's body-end check turns divergence into a raised 'misparse', so
# this property both fuzzes widths (random types, metadata, NULLs,
# value sizes) and asserts structural parity with the full decode.


@st.composite
def _tables_and_rows(draw):
    from mysql_cdc_spark.sources.binlog_codec import (
        TYPE_BIT, TYPE_BLOB, TYPE_DATETIME2, TYPE_DOUBLE, TYPE_ENUM,
        TYPE_FLOAT, TYPE_LONGLONG, TYPE_SET, TYPE_SHORT, TYPE_TIME2,
        TYPE_TIMESTAMP2, TYPE_TINY, TYPE_YEAR,
    )

    def col(kind):
        if kind == "tiny":
            return (TYPE_TINY, None), st.integers(-128, 127)
        if kind == "short":
            return (TYPE_SHORT, None), st.integers(-(2**15), 2**15 - 1)
        if kind == "long":
            return (TYPE_LONG, None), st.integers(-(2**31), 2**31 - 1)
        if kind == "longlong":
            return (TYPE_LONGLONG, None), st.integers(-(2**62), 2**62)
        if kind == "float":
            return (TYPE_FLOAT, None), st.just(0.5)
        if kind == "double":
            return (TYPE_DOUBLE, None), st.floats(
                allow_nan=False, allow_infinity=False, width=64
            )
        if kind == "year":
            return (TYPE_YEAR, None), st.integers(1901, 2155)
        if kind == "dt2":
            fsp = draw(st.sampled_from([0, 2, 4, 6]))
            return (TYPE_DATETIME2, fsp), st.just(
                "2024-02-29 23:59:59" + (f".{'9' * fsp}" if fsp else "")
            )
        if kind == "ts2":
            fsp = draw(st.sampled_from([0, 1, 3]))
            return (TYPE_TIMESTAMP2, fsp), st.just(
                "1700000000" + (f".{'1' * fsp}" if fsp else "")
            )
        if kind == "time2":
            fsp = draw(st.sampled_from([0, 2]))
            return (TYPE_TIME2, fsp), st.just(
                "-99:59:59" + (f".{'4' * fsp}" if fsp else "")
            )
        if kind == "blob":
            n = draw(st.sampled_from([1, 2, 3, 4]))
            return (TYPE_BLOB, n), st.binary(max_size=200)
        if kind == "varchar_short":
            return (TYPE_VARCHAR, draw(st.integers(1, 255))), st.text(
                alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                max_size=60,
            )
        if kind == "varchar_long":
            return (TYPE_VARCHAR, draw(st.integers(256, 2000))), st.text(
                alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                max_size=300,
            )
        if kind == "decimal":
            p = draw(st.integers(1, 20))
            s = draw(st.integers(0, min(p, 10)))
            intd = 10 ** (p - s) - 1
            v = draw(st.integers(0, intd))
            txt = str(v) + (f".{'7' * s}" if s else "")
            return (TYPE_NEWDECIMAL, (p, s)), st.just(txt)
        if kind == "enum":
            n = draw(st.integers(1, 400))
            return (TYPE_ENUM, n), st.integers(1, n)
        if kind == "set":
            n = draw(st.integers(1, 24))
            return (TYPE_SET, n), st.integers(0, 2**n - 1)
        if kind == "bit":
            bits = draw(st.integers(1, 24))
            meta = (bits % 8, bits // 8)
            return (TYPE_BIT, meta), st.integers(0, 2**bits - 1)
        raise AssertionError(kind)

    kinds = draw(
        st.lists(
            st.sampled_from([
                "tiny", "short", "long", "longlong", "float", "double",
                "year", "dt2", "ts2", "time2", "blob", "varchar_short",
                "varchar_long", "decimal", "enum", "set", "bit",
            ]),
            min_size=1,
            max_size=8,
        )
    )
    cols, val_strats = [], []
    for k in kinds:
        c, vs = col(k)
        cols.append(c)
        val_strats.append(vs)
    n_rows = draw(st.integers(1, 4))
    rows = []
    for _ in range(n_rows):
        row = []
        for vs in val_strats:
            v = draw(st.one_of(st.none(), vs))  # NULLs consume 0 bytes
            row.append(v)
        rows.append(row)
    return cols, rows


@given(_tables_and_rows(), st.booleans())
@settings(max_examples=120, deadline=None)
def test_image_prune_width_parity_property(tr, as_update):
    cols, rows = tr
    t = TableDef("db", "fz", cols, table_id=9)
    names = [f"c{i}" for i in range(len(cols))]
    cat = {("db", "fz"): names}
    w = BinlogWriter(checksum="crc32")
    w.write_table_map(t)
    if as_update:
        w.write_rows(UPDATE_ROWS_EVENT, t, [(r, r) for r in rows])
    else:
        w.write_rows(WRITE_ROWS_EVENT, t, rows)
    data = w.getvalue()
    full = decode_binlog(data, cat)
    for mode in ("none", "after", "before"):
        pruned = decode_binlog(data, cat, images=mode)  # misparse raises
        assert [(e["op"], e["offset"], e["seq"]) for e in pruned] == [
            (e["op"], e["offset"], e["seq"]) for e in full
        ]
        for f, p in zip(full, pruned):
            if not f["op"].endswith("_rows"):
                continue
            for side in ("before", "after"):
                fs, ps = f[side], p[side]
                if fs is None:
                    assert ps is None
                    continue
                assert len(ps) == len(fs)
                keep = (side == "after") == (mode == "after") and mode != "none"
                if keep:
                    assert ps == fs
                else:
                    assert ps == [None] * len(fs)


@given(
    st.lists(_VALS, min_size=2, max_size=8),
    st.data(),
)
@settings(max_examples=80, deadline=None)
def test_range_skip_parity_property(vals, data):
    """min_row_offset / row_ts_min / row_ts_max drop EXACTLY the row
    events a client-side filter would — never a non-row event, never a
    row inside the range — with seq slots preserved."""
    t = TableDef(
        "foo", "auto",
        [(TYPE_LONG, None), (TYPE_NEWDECIMAL, (12, 4)), (TYPE_VARCHAR, 50)],
    )
    cat = {("foo", "auto"): ["id", "val", "word"]}
    w = BinlogWriter(checksum="crc32")
    for i, v in enumerate(vals):
        w.write_table_map(t, ts=i * 10)
        w.write_rows(WRITE_ROWS_EVENT, t, [_row(v)], ts=i * 10)
        w.write_xid(100 + i, ts=i * 10)
    blob = w.getvalue()
    full = decode_binlog(blob, cat)
    size = len(blob)
    lo_off = data.draw(st.integers(0, size))
    ts_lo = data.draw(st.one_of(st.none(), st.integers(0, len(vals) * 10)))
    ts_hi = data.draw(st.one_of(st.none(), st.integers(0, len(vals) * 10)))
    got = decode_binlog(
        blob, cat, min_row_offset=lo_off, row_ts_min=ts_lo, row_ts_max=ts_hi
    )

    def keep(e):
        if not e["op"].endswith("_rows"):
            return True
        if e["offset"] < lo_off:
            return False
        if ts_lo is not None and e["ts"] < ts_lo:
            return False
        if ts_hi is not None and e["ts"] > ts_hi:
            return False
        return True

    want = [e for e in full if keep(e)]
    assert [(e["op"], e["offset"], e["seq"]) for e in got] == [
        (e["op"], e["offset"], e["seq"]) for e in want
    ]
    assert [e["after"] for e in got] == [e["after"] for e in want]
