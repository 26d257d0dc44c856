"""Unit tests for the pure-Python ISO-BMFF (MP4) codec
(functions/isobmff.py) — box framing, sample-table resolution across
chunk layouts, 64-bit forms, and torn-input rejection."""

from __future__ import annotations

import struct

import pytest

from mysql_cdc_spark.functions.isobmff import (
    Mp4Track,
    encode_mp4,
    extract_sample,
    parse_mp4,
    walk_boxes,
)

SAMPLES = [bytes([v]) * n for v, n in [(9, 5), (18, 7), (27, 4), (36, 6), (45, 8), (54, 3)]]


@pytest.mark.parametrize("spc", [0, 1, 2, 3, 4, 6])
def test_round_trip_all_chunk_layouts(spc):
    """The SAME samples must come back byte-identical whatever the
    stsc/stco chunk layout — offsets are resolved, never assumed."""
    blob = encode_mp4(48, 16, SAMPLES, keyframes=[0, 3], samples_per_chunk=spc)
    f = parse_mp4(blob)
    assert f.major_brand == "isom"
    assert f.timescale == 1000 and f.duration == len(SAMPLES) * 40
    t = f.tracks[0]
    assert (t.track_id, t.handler, t.codec) == (1, "vide", "rle ")
    assert (t.width, t.height) == (48, 16)
    st = t.sample_table()
    assert [s for _, s, _, _ in st] == [len(s) for s in SAMPLES]
    assert [d for _, _, d, _ in st] == [i * 40 for i in range(len(SAMPLES))]
    assert [k for _, _, _, k in st] == [i in (0, 3) for i in range(len(SAMPLES))]
    assert [extract_sample(blob, o, s) for o, s, _, _ in st] == SAMPLES


def test_empty_track():
    blob = encode_mp4(16, 16, [], keyframes=[])
    t = parse_mp4(blob).tracks[0]
    assert t.sample_table() == []


def test_walk_boxes_largesize_and_to_eof():
    payload = b"x" * 10
    large = struct.pack(">I", 1) + b"big " + struct.pack(">Q", 16 + len(payload)) + payload
    toeof = struct.pack(">I", 0) + b"tail" + b"yz"
    got = list(walk_boxes(large + toeof))
    assert [(t, b - a) for t, a, b in got] == [(b"big ", 10), (b"tail", 2)]


def test_torn_inputs_raise():
    blob = encode_mp4(16, 16, SAMPLES[:2], keyframes=[0])
    with pytest.raises(ValueError):
        parse_mp4(blob[: len(blob) // 2])       # truncated mid-box
    with pytest.raises(ValueError):
        parse_mp4(b"\x00\x00\x00\x08free")      # no ftyp
    bad = bytearray(blob)
    bad[0:4] = struct.pack(">I", len(blob) + 99)  # first box overruns file
    with pytest.raises(ValueError):
        parse_mp4(bytes(bad))
    with pytest.raises(ValueError):
        extract_sample(blob, len(blob) - 2, 10)


def test_uniform_stsz_and_co64_paths():
    """Parser must accept the compact uniform-size stsz form and
    64-bit co64 chunk offsets (hand-built stbl, no encoder help)."""
    trk = Mp4Track()
    stsz = b"\x00" * 4 + struct.pack(">II", 7, 3)          # uniform 7 bytes × 3
    co64 = b"\x00" * 4 + struct.pack(">IQ", 1, 1 << 33)
    stsc = b"\x00" * 4 + struct.pack(">IIII", 1, 1, 3, 1)
    stts = b"\x00" * 4 + struct.pack(">III", 1, 3, 20)
    stbl = b"".join(
        struct.pack(">I", 8 + len(p)) + t + p
        for t, p in [(b"stsz", stsz), (b"co64", co64), (b"stsc", stsc), (b"stts", stts)]
    )
    from mysql_cdc_spark.functions import isobmff

    isobmff._parse_stbl(stbl, 0, len(stbl), trk)
    st = trk.sample_table()
    assert [(o, s) for o, s, _, _ in st] == [(1 << 33, 7), ((1 << 33) + 7, 7), ((1 << 33) + 14, 7)]
    assert [d for _, _, d, _ in st] == [0, 20, 40]
    assert all(k for _, _, _, k in st)  # no stss → every sample is sync

def test_zero_keyframes_vs_no_stss():
    """r12 ADVICE: an explicit EMPTY stss means ZERO keyframes; a
    MISSING stss means ALL samples sync — the two must round-trip
    distinctly (the old [] sentinel inverted zero-keyframe files into
    all-keyframe ones)."""
    zero = parse_mp4(encode_mp4(16, 16, SAMPLES, keyframes=[])).tracks[0]
    assert zero.sync_samples == []
    assert [k for _, _, _, k in zero.sample_table()] == [False] * len(SAMPLES)

    allsync = parse_mp4(encode_mp4(16, 16, SAMPLES, keyframes=None)).tracks[0]
    assert allsync.sync_samples is None
    assert [k for _, _, _, k in allsync.sample_table()] == [True] * len(SAMPLES)


class TestFragmentedMp4:
    """fMP4/CMAF (r12 VERDICT #5): per-fragment sample tables via
    moof/traf/tfhd/tfdt/trun must resolve into the SAME per-sample
    rows the classic moov path produces."""

    def test_round_trip_matches_classic(self):
        from mysql_cdc_spark.functions.isobmff import encode_fmp4

        flat = SAMPLES
        classic = parse_mp4(
            encode_mp4(48, 16, flat, keyframes=[0, 3], samples_per_chunk=2)
        ).tracks[0].sample_table()
        frags = [flat[0:2], flat[2:5], flat[5:6]]
        blob = encode_fmp4(48, 16, frags, keyframes=[0, 3])
        f = parse_mp4(blob)
        assert f.major_brand == "iso5"
        assert f.timescale == 1000 and f.duration == len(flat) * 40  # via mehd
        st = f.tracks[0].sample_table()
        # offsets differ by construction; size/dts/keyframe identical
        assert [(s, d, k) for _, s, d, k in st] == [(s, d, k) for _, s, d, k in classic]
        assert [extract_sample(blob, o, s) for o, s, _, _ in st] == flat

    def test_trex_default_cascade(self):
        """trun omits per-sample duration — dts must advance by the
        trex default_sample_duration (the tfhd→trex cascade)."""
        from mysql_cdc_spark.functions.isobmff import encode_fmp4

        st = parse_mp4(
            encode_fmp4(16, 16, [SAMPLES[:3], SAMPLES[3:]], keyframes=None,
                        sample_delta=25)
        ).tracks[0].sample_table()
        assert [d for _, _, d, _ in st] == [i * 25 for i in range(len(SAMPLES))]

    def test_torn_fragment_rejected(self):
        from mysql_cdc_spark.functions.isobmff import encode_fmp4

        blob = encode_fmp4(16, 16, [SAMPLES[:3], SAMPLES[3:]], keyframes=[0, 3])
        with pytest.raises(ValueError):
            parse_mp4(blob[:-3])        # final mdat runs short
        with pytest.raises(ValueError):
            parse_mp4(blob[: len(blob) // 2])  # cut mid-structure
        # a moof naming a track the moov never declared is torn, not UB
        bad = bytearray(blob)
        idx = bad.find(b"tfhd")
        bad[idx + 8 : idx + 12] = (99).to_bytes(4, "big")  # track_id field
        with pytest.raises(ValueError):
            parse_mp4(bytes(bad))

    def test_fragment_dts_continuity_without_tfdt(self):
        """Fragments lacking tfdt continue from the previous
        fragment's end decode time (spec: contiguous)."""
        from mysql_cdc_spark.functions.isobmff import encode_fmp4

        blob = encode_fmp4(16, 16, [SAMPLES[:2], SAMPLES[2:4]], keyframes=None)
        # strip the tfdt boxes: rewrite them as free-space boxes
        raw = bytearray(blob)
        pos = 0
        while (pos := raw.find(b"tfdt", pos)) != -1:
            raw[pos : pos + 4] = b"free"
            pos += 4
        st = parse_mp4(bytes(raw)).tracks[0].sample_table()
        assert [d for _, _, d, _ in st] == [0, 40, 80, 120]


def test_audio_first_track_order():
    """Real files routinely lead with an audio/hint track; consumers
    must pick the video track by HANDLER, not position.  Splice a
    'soun' trak ahead of the video trak (layout is ftyp-mdat-moov, so
    sample offsets are unchanged) and assert video_track() still finds
    the right one while tracks[] preserves file order."""
    from mysql_cdc_spark.functions.isobmff import (
        _box,
        _full,
        _walk_boxes4,
    )
    import struct as _s

    blob = encode_mp4(48, 16, SAMPLES, keyframes=[0, 3], samples_per_chunk=2)
    # minimal audio trak: tkhd(track 2, no dims) + mdia(mdhd + 'soun'
    # hdlr + empty-ish minf/stbl)
    tkhd = _full(
        b"tkhd", 0, 7,
        _s.pack(">IIIII", 0, 0, 2, 0, 0) + b"\x00" * 8
        + _s.pack(">HHHH", 0, 0, 0, 0)
        + _s.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + _s.pack(">II", 0, 0),
    )
    mdhd = _full(b"mdhd", 0, 0, _s.pack(">IIII", 0, 0, 8000, 0) + _s.pack(">HH", 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + b"soun" + b"\x00" * 12 + b"a\x00")
    stbl = _box(
        b"stbl",
        _full(b"stsd", 0, 0, _s.pack(">I", 0))
        + _full(b"stts", 0, 0, _s.pack(">I", 0))
        + _full(b"stsc", 0, 0, _s.pack(">I", 0))
        + _full(b"stsz", 0, 0, _s.pack(">II", 0, 0))
        + _full(b"stco", 0, 0, _s.pack(">I", 0)),
    )
    audio_trak = _box(b"trak", tkhd + _box(b"mdia", mdhd + hdlr + _box(b"minf", stbl)))

    # rebuild moov with the audio trak FIRST (after mvhd)
    out = bytearray()
    for tag, box_start, a, b in _walk_boxes4(blob):
        if tag != b"moov":
            out += blob[box_start:b]
            continue
        inner = bytearray()
        injected = False
        for t2, bs2, _a2, b2 in _walk_boxes4(blob, a, b):
            if t2 == b"trak" and not injected:
                inner += audio_trak
                injected = True
            inner += blob[bs2:b2]
        out += _box(b"moov", bytes(inner))
    f = parse_mp4(bytes(out))
    assert [t.handler for t in f.tracks] == ["soun", "vide"]
    v = f.video_track()
    assert (v.width, v.height, v.track_id) == (48, 16, 1)
    st = v.sample_table()
    assert [extract_sample(bytes(out), o, s) for o, s, _, _ in st] == SAMPLES


def test_audio_only_file_raises_not_misreports():
    """An audio-only MP4 (every track 'soun') must raise from
    video_track() — not fall back to reporting the audio track as
    video metadata (r13 ADVICE).  Handler-LESS minimal files keep the
    tracks[0] fallback."""
    blob = encode_mp4(48, 16, SAMPLES[:2], keyframes=[0])
    audio_only = blob.replace(b"vide", b"soun")  # only in the hdlr box
    with pytest.raises(ValueError, match="no video track"):
        parse_mp4(audio_only).video_track()
    handlerless = blob.replace(b"vide", b"\x00\x00\x00\x00")
    v = parse_mp4(handlerless).video_track()
    assert (v.width, v.height) == (48, 16)
    with pytest.raises(ValueError, match="no tracks"):
        from mysql_cdc_spark.functions.isobmff import Mp4File
        Mp4File().video_track()


def test_multi_traf_implicit_base_offset():
    """ISO/IEC 14496-12 §8.8.7: a traf with neither base-data-offset
    nor default-base-is-moof defaults to the END of the preceding
    traf's data — only the moof's FIRST traf defaults to moof start
    (r13 ADVICE: the old code used moof_start for every traf).

    Layout: ftyp + moov(2 traks + trex x2) + moof(traf1 explicit via
    default-base-is-moof + trun data offset; traf2 fully implicit) +
    mdat(track1 samples ++ track2 samples)."""
    from mysql_cdc_spark.functions.isobmff import (
        _FLAGS_SYNC,
        _TFHD_DEFAULT_BASE_IS_MOOF,
        _TRUN_DATA_OFFSET,
        _TRUN_SAMPLE_FLAGS,
        _TRUN_SAMPLE_SIZE,
        _box,
        _full,
        _mvhd,
        _stsd,
    )
    import struct as _s

    s1 = [b"\x11" * 5, b"\x22" * 7]          # track 1 (video)
    s2 = [b"\x33" * 4, b"\x44" * 6, b"\x55" * 3]  # track 2 (audio)

    def trak(tid: int, handler: bytes) -> bytes:
        tkhd = _full(
            b"tkhd", 0, 7,
            _s.pack(">IIIII", 0, 0, tid, 0, 0) + b"\x00" * 8
            + _s.pack(">HHHH", 0, 0, 0, 0)
            + _s.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + _s.pack(">II", 48 << 16, 16 << 16),
        )
        mdhd = _full(b"mdhd", 0, 0, _s.pack(">IIII", 0, 0, 1000, 0) + _s.pack(">HH", 0x55C4, 0))
        hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + handler + b"\x00" * 12 + b"t\x00")
        stbl = _box(
            b"stbl",
            _stsd(48, 16)
            + _full(b"stts", 0, 0, _s.pack(">I", 0))
            + _full(b"stsc", 0, 0, _s.pack(">I", 0))
            + _full(b"stsz", 0, 0, _s.pack(">II", 0, 0))
            + _full(b"stco", 0, 0, _s.pack(">I", 0)),
        )
        return _box(b"trak", tkhd + _box(b"mdia", mdhd + hdlr + _box(b"minf", stbl)))

    def trex(tid: int) -> bytes:
        return _full(b"trex", 0, 0, _s.pack(">IIIII", tid, 1, 40, 0, _FLAGS_SYNC))

    ftyp = _box(b"ftyp", b"iso5" + _s.pack(">I", 512) + b"iso5mp41")
    moov = _box(b"moov", _mvhd(1000, 0) + trak(1, b"vide") + trak(2, b"soun")
                + _box(b"mvex", trex(1) + trex(2)))

    def trun(samples, flags):
        body = _s.pack(">I", len(samples))
        if flags & _TRUN_DATA_OFFSET:
            body += _s.pack(">i", 0)  # patched after moof size is known
        for smp in samples:
            body += _s.pack(">II", len(smp), _FLAGS_SYNC)
        return _full(b"trun", 0, flags, body)

    tfhd1 = _full(b"tfhd", 0, _TFHD_DEFAULT_BASE_IS_MOOF, _s.pack(">I", 1))
    tfdt = _full(b"tfdt", 0, 0, _s.pack(">I", 0))
    trun1 = trun(s1, _TRUN_DATA_OFFSET | _TRUN_SAMPLE_SIZE | _TRUN_SAMPLE_FLAGS)
    traf1 = _box(b"traf", tfhd1 + tfdt + trun1)
    # traf2: NO base-data-offset, NO default-base-is-moof, trun
    # WITHOUT a data offset — fully implicit addressing
    tfhd2 = _full(b"tfhd", 0, 0, _s.pack(">I", 2))
    traf2 = _box(b"traf", tfhd2 + tfdt + trun(s2, _TRUN_SAMPLE_SIZE | _TRUN_SAMPLE_FLAGS))
    mfhd = _full(b"mfhd", 0, 0, _s.pack(">I", 1))
    moof_len = len(_box(b"moof", mfhd + traf1 + traf2))
    # patch trun1's data offset to point just past moof into mdat
    traf1 = traf1.replace(_s.pack(">Ii", len(s1), 0),
                          _s.pack(">Ii", len(s1), moof_len + 8), 1)
    moof = _box(b"moof", mfhd + traf1 + traf2)
    blob = ftyp + moov + moof + _box(b"mdat", b"".join(s1) + b"".join(s2))

    f = parse_mp4(blob)
    t1 = f.video_track()
    assert t1.track_id == 1
    got1 = [extract_sample(blob, o, s) for o, s, _, _ in t1.sample_table()]
    assert got1 == s1
    t2 = next(t for t in f.tracks if t.track_id == 2)
    # the fix under test: traf2's implicit base = END of traf1's data
    got2 = [extract_sample(blob, o, s) for o, s, _, _ in t2.sample_table()]
    assert got2 == s2


def test_tfdt_version1_past_32_bits():
    """encode_fmp4 must not struct.error once cumulative dts crosses
    2^32 (r13 ADVICE) — it emits a version-1 64-bit tfdt, which the
    parser already understands."""
    from mysql_cdc_spark.functions.isobmff import encode_fmp4

    frags = [[b"\xaa" * 4], [b"\xbb" * 4], [b"\xcc" * 4]]
    blob = encode_fmp4(16, 16, frags, keyframes=None, sample_delta=2**31)
    st = parse_mp4(blob).tracks[0].sample_table()
    assert [d for _, _, d, _ in st] == [0, 2**31, 2**32]
    assert [extract_sample(blob, o, s) for o, s, _, _ in st] == [f[0] for f in frags]
