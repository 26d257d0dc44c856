"""Forward-only cursor (R9) and multimodal plumbing tests."""

from __future__ import annotations

import hashlib

import pytest

from mysql_cdc_spark.functions import multimodal as mm
from mysql_cdc_spark.operators.cursor import ForwardOnlyCursor


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(1, 10.5, "a"), (2, None, "b"), (3, 30.0, None)],
        "id long, value double, name string",
    )


def test_cursor_before_first_row(df):
    cur = ForwardOnlyCursor(df)
    with pytest.raises(RuntimeError, match="not positioned"):
        cur.get("id")
    assert cur.next()
    assert cur.get_long("id") == 1


def test_cursor_iterates_forward_only(df):
    cur = ForwardOnlyCursor(df.orderBy("id"))
    ids = []
    while cur.next():
        ids.append(cur.get_long("id"))
    assert ids == [1, 2, 3]
    assert not cur.next()  # drained stays drained — no rewind


def test_cursor_was_null_and_jdbc_null_boxing(df):
    cur = ForwardOnlyCursor(df.orderBy("id"))
    cur.next()
    assert cur.get_double("value") == 10.5 and not cur.was_null()
    cur.next()
    assert cur.get_double("value") == 0.0 and cur.was_null()  # JDBC: null → 0 + wasNull
    cur.next()
    assert cur.get_string("name") is None and cur.was_null()


def test_cursor_ordinal_access(df):
    """The reference names columns by printed ordinals (jdbc.clj:82,
    :223-226) — both ordinals and real names must resolve."""
    cur = ForwardOnlyCursor(df.orderBy("id"))
    cur.next()
    assert cur.find_column("value") == 2
    assert cur.find_column("2") == 2
    assert cur.get(2) == cur.get("value")
    with pytest.raises(KeyError):
        cur.find_column("nope")


def test_cursor_close(df):
    cur = ForwardOnlyCursor(df)
    cur.close()
    with pytest.raises(RuntimeError, match="closed"):
        cur.next()


def test_cursor_metadata(df):
    cur = ForwardOnlyCursor(df)
    assert cur.column_names == ["id", "value", "name"]
    assert cur.column_types == ["bigint", "double", "string"]


# --- multimodal --------------------------------------------------------------

def test_media_features_deterministic(spark, sf_dir):
    feats = {r["media_id"]: r for r in mm.extract_features(mm.synth_media(spark, sf_dir)).collect()}
    for mid in (0, 1, 2, 41):
        blob = hashlib.md5(str(mid).encode()).digest()
        r = feats[mid]
        assert r["n_bytes"] == 16
        assert r["head_hex"] == blob[:4].hex()
        assert r["byte_sum"] == sum(blob) % 256


def test_frame_sample_only_videos(spark, sf_dir):
    frames = mm.sample_frames(mm.synth_media(spark, sf_dir)).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    for mid, idxs in list(by_media.items())[:20]:
        assert mid % 3 == 2  # video kind
        n = mid % 7 + 1
        assert sorted(idxs) == list(range(0, n, 2))


def test_decode_media_rejects_bad_bytes_per_kind():
    """All three decoders are real (pure-Python PNG/WAV/AVI codecs)
    and each validates its container signature."""
    with pytest.raises(ValueError, match="RIFF"):
        mm.decode_media(b"\x00", "video")  # real demuxer rejects bad bytes
    with pytest.raises(ValueError, match="PNG"):
        mm.decode_media(b"\x00", "image")


@pytest.fixture()
def typed_df(spark):
    from decimal import Decimal

    return spark.createDataFrame(
        [
            (1, Decimal("12.3400"), "2024-03-01T10:30:00", True, b"\x01\x02"),
            (2, None, None, None, None),
        ],
        "id long, amount decimal(12,4), at string, ok boolean, blob binary",
    )


def test_typed_getters(typed_df):
    """get_decimal/get_timestamp/get_boolean/get_bytes with per-type
    wasNull semantics (reference jdbc.clj:228-291, wasNull :187-199)."""
    from datetime import datetime
    from decimal import Decimal

    cur = ForwardOnlyCursor(typed_df.orderBy("id"))
    assert cur.next()
    assert cur.get_decimal("amount") == Decimal("12.3400")
    assert not cur.was_null()
    assert cur.get_timestamp("at") == datetime(2024, 3, 1, 10, 30)
    assert cur.get_boolean("ok") is True
    assert cur.get_bytes("blob") == b"\x01\x02"

    assert cur.next()
    assert cur.get_decimal("amount") is None and cur.was_null()
    assert cur.get_timestamp("at") is None and cur.was_null()
    assert cur.get_boolean("ok") is False and cur.was_null()  # JDBC null->false
    assert cur.get_bytes("blob") is None and cur.was_null()


def test_result_set_metadata(typed_df):
    """ResultSetMetaData shape (reference jdbc.clj:78-91): count,
    1-based names, JDBC type names, nullability."""
    md = ForwardOnlyCursor(typed_df).get_metadata()
    assert md.column_count == 5
    assert [md.column_name(i) for i in range(1, 6)] == ["id", "amount", "at", "ok", "blob"]
    assert md.column_type_name(1) == "BIGINT"
    assert md.column_type_name(2) == "DECIMAL(12,4)"
    assert md.column_type_name(3) == "VARCHAR"
    assert md.column_type_name(4) == "BOOLEAN"
    assert md.column_type_name(5) == "VARBINARY"
    assert md.is_nullable(2)
    with pytest.raises(IndexError):
        md.column_name(6)


class TestImageDedup:
    """Exact + perceptual image dedup from decoded PNG bytes."""

    def test_groups_and_dhash_invariance(self, spark):
        import pandas as pd

        from mysql_cdc_spark.functions import multimodal as mm
        from mysql_cdc_spark.functions.media_codecs import decode_png

        # ids 0 and 50 share content key c=0 but 0 is noisy (0%7==0):
        # exact groups differ, perceptual group is shared. 1 and 51
        # share c=1, neither noisy: same exact group.
        ids = [0, 50, 1, 51, 2]
        df = spark.createDataFrame([(i,) for i in ids], "media_id long")

        def gen(batches):
            for pdf in batches:
                yield pd.DataFrame({
                    "media_id": pdf["media_id"],
                    "payload": [
                        __import__("mysql_cdc_spark.functions.media_codecs",
                                   fromlist=["encode_png"]).encode_png(
                            mm._DD_W, mm._DD_H, mm._dedup_pixels(int(m)))
                        for m in pdf["media_id"]
                    ],
                })

        from pyspark.sql import types as T
        imgs = df.mapInPandas(gen, T.StructType([
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]))
        got = {r["media_id"]: r for r in mm.image_dedup(imgs).collect()}
        assert got[1]["n_exact"] == 2 and got[1]["keep_exact"] == 1
        assert got[51]["keep_exact"] == 1 and not got[51]["is_canonical"]
        assert got[0]["n_exact"] == 1          # noise breaks exact match
        assert got[0]["n_perceptual"] == 2     # ...but not the dHash
        assert got[0]["keep_perceptual"] == 0 == got[50]["keep_perceptual"]
        assert got[2]["n_exact"] == got[2]["n_perceptual"] == 1

    def test_payloads_byte_distinct_but_pixel_equal(self, spark):
        from mysql_cdc_spark.functions import multimodal as mm
        from mysql_cdc_spark.functions.media_codecs import decode_png

        corpus = mm.synth_image_corpus(spark, "/root/testdata/sf0.001")
        rows = {r["media_id"]: bytes(r["payload"])
                for r in corpus.filter("media_id IN (1, 51)").collect()}
        assert rows[1] != rows[51]                      # tEXt chunk differs
        assert decode_png(rows[1])[3] == decode_png(rows[51])[3]  # pixels equal


class TestAudioDedup:
    """Exact + perceptual audio dedup from decoded WAV bytes."""

    def test_gain_splits_exact_but_not_perceptual(self, spark):
        import pandas as pd

        from mysql_cdc_spark.functions import multimodal as mm

        # ids 0 and 40 share content key c=0; 0 is gained (0%7==0), 40
        # is not: different exact groups, same perceptual group.  41
        # and 81 share c=1, neither gained: same exact group.
        ids = [0, 40, 41, 81, 2]
        df = spark.createDataFrame([(i,) for i in ids], "media_id long")

        def gen(batches):
            from mysql_cdc_spark.functions.media_codecs import encode_wav

            for pdf in batches:
                yield pd.DataFrame({
                    "media_id": pdf["media_id"],
                    "payload": [encode_wav(mm._dedup_samples(int(m)))
                                for m in pdf["media_id"]],
                })

        from pyspark.sql import types as T
        clips = df.mapInPandas(gen, T.StructType([
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]))
        got = {r["media_id"]: r for r in mm.audio_dedup(clips).collect()}
        assert got[0]["n_exact"] == 1            # gain breaks exact match
        assert got[0]["n_perceptual"] == 2       # ...but not the fingerprint
        assert got[0]["keep_perceptual"] == 0 == got[40]["keep_perceptual"]
        assert got[41]["n_exact"] == 2 and got[41]["keep_exact"] == 41
        assert not got[81]["is_canonical"]
        assert got[2]["n_exact"] == got[2]["n_perceptual"] == 1

    def test_payloads_byte_distinct_but_samples_equal(self, spark):
        from mysql_cdc_spark.functions import multimodal as mm
        from mysql_cdc_spark.functions.media_codecs import decode_wav

        corpus = mm.synth_audio_corpus(spark, "/root/testdata/sf0.001")
        rows = {r["media_id"]: bytes(r["payload"])
                for r in corpus.filter("media_id IN (41, 81)").collect()}
        assert rows[41] != rows[81]                       # spliced chunk differs
        assert decode_wav(rows[41])[2] == decode_wav(rows[81])[2]


class TestImageDedupQuarantine:
    """Dead-letter contract for undecodable media payloads."""

    def test_torn_payloads_quarantine_instead_of_failing(self, spark):
        from mysql_cdc_spark.functions import multimodal as mm

        sf = "/root/testdata/sf0.001"
        imgs = mm.synth_image_corpus(spark, sf, corrupt_every=97)
        out = mm.image_dedup(imgs, on_error="quarantine")
        rows = out.collect()
        corrupt = {r["media_id"] for r in rows if r["is_corrupt"]}
        assert corrupt == {i for i in range(1000) if i % 97 == 0}
        for r in rows:
            if r["is_corrupt"]:
                assert r["n_exact"] is None and r["keep_perceptual"] is None
            else:
                assert r["n_exact"] >= 1 and r["keep_exact"] is not None
        # default mode must raise on the same fixture
        import pytest
        from py4j.protocol import Py4JJavaError

        with pytest.raises(Exception):
            mm.image_dedup(imgs, on_error="raise").collect()

    def test_audio_torn_payloads_quarantine(self, spark):
        """ADVICE r9: audio_dedup had no dead-letter path — one
        undecodable WAV killed the pass.  Mirrors the image contract:
        quarantine routes torn clips to is_corrupt rows, raise dies."""
        from mysql_cdc_spark.functions import multimodal as mm

        sf = "/root/testdata/sf0.001"
        clips = mm.synth_audio_corpus(spark, sf, corrupt_every=97)
        rows = mm.audio_dedup(clips, on_error="quarantine").collect()
        corrupt = {r["media_id"] for r in rows if r["is_corrupt"]}
        assert corrupt == {i for i in range(1000) if i % 97 == 0}
        for r in rows:
            if r["is_corrupt"]:
                assert r["n_exact"] is None and r["keep_perceptual"] is None
            else:
                assert r["n_exact"] >= 1 and r["keep_exact"] is not None
        with pytest.raises(Exception):
            mm.audio_dedup(clips, on_error="raise").collect()

    def test_zlib_corrupt_idat_quarantines(self, spark):
        """ADVICE r9: a payload whose chunks are valid (lengths + CRCs
        recomputed) but whose DEFLATE stream is garbage raises
        zlib.error from decompress — a different exception class than
        the torn-IDAT fixture's struct.error, and it used to escape
        the quarantine except-tuple and kill the pass."""
        import struct
        import zlib

        from mysql_cdc_spark.functions import multimodal as mm
        from mysql_cdc_spark.functions.media_codecs import PNG_SIG

        def chunk(tag, body):
            return (
                struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", 27, 16, 8, 2, 0, 0, 0)
        bad = (
            PNG_SIG
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", b"\xde\xad\xbe\xef" * 8)   # CRC-valid, not deflate
            + chunk(b"IEND", b"")
        )
        df = spark.createDataFrame(
            [(1, bytearray(bad))], "media_id long, payload binary"
        )
        rows = mm.image_dedup(df, on_error="quarantine").collect()
        assert len(rows) == 1 and rows[0]["is_corrupt"]
        with pytest.raises(Exception):
            mm.image_dedup(df, on_error="raise").collect()

    def test_int64_hashes_survive_quarantine_batches(self, spark):
        """Regression: a pandas batch mixing None (quarantined) with
        int dhashes must not coerce to float64 and round the hashes —
        every valid member of one pixel group shares ONE dhash."""
        from mysql_cdc_spark.functions import multimodal as mm

        sf = "/root/testdata/sf0.001"
        out = mm.image_dedup(
            mm.synth_image_corpus(spark, sf, corrupt_every=97),
            on_error="quarantine",
        )
        v = [r for r in out.collect() if not r["is_corrupt"]]
        groups = {}
        for r in v:
            groups.setdefault(r["media_id"] % 50, set()).add(r["keep_perceptual"])
        assert all(len(k) == 1 for k in groups.values())


def test_decoded_features_quarantine_any_modality(spark):
    """extract_decoded_features completes the media dead-letter
    surface: one torn payload of any modality yields an all-NULL
    feature row under quarantine and an exception under raise."""
    from mysql_cdc_spark.functions.media_codecs import encode_png, encode_wav

    good_png = encode_png(3, 2, bytes(range(18)))
    good_wav = encode_wav([1, -2, 3, -4])
    rows = [
        (1, "image", bytearray(good_png)),
        (2, "audio", bytearray(good_wav)),
        (3, "image", bytearray(good_png[:20])),      # torn mid-IHDR
        (4, "audio", bytearray(good_wav[:24])),      # torn mid-fmt
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = {r["media_id"]: r
           for r in mm.extract_decoded_features(df, on_error="quarantine").collect()}
    assert got[1]["px_sum"] == sum(range(18))
    assert got[2]["n_samples"] == 4 and got[2]["sample_sum"] == -2
    for bad in (3, 4):
        assert got[bad]["px_sum"] is None and got[bad]["n_samples"] is None
        assert got[bad]["kind"] in ("image", "audio")   # input kind kept
    with pytest.raises(Exception):
        mm.extract_decoded_features(df).collect()


def test_mp4_keyframe_dts_ms_real_timescales(spark):
    """r12 ADVICE: dts_ms must be `dts * 1000 // timescale` — the old
    `dts * (1000 // timescale)` floored the factor to 0 for any
    timescale > 1000 (the common 90000) and was inexact for
    non-divisors like 600.  Pins both real-world timescales."""
    from mysql_cdc_spark.functions import multimodal as mm
    from mysql_cdc_spark.functions.isobmff import encode_mp4

    cases = [
        (1, 90000, 3003),   # 29.97 fps NTSC: dts_ms = i*3003*1000//90000
        (2, 600, 25),       # QuickTime legacy: 1000/600 is non-integral
    ]
    rows = [
        (mid, encode_mp4(16, 16, [bytes([mid]) * 4] * 7,
                         keyframes=[0, 3, 6], timescale=tsc, sample_delta=delta))
        for mid, tsc, delta in cases
    ]
    videos = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        (r["media_id"], r["sample_idx"]): r["dts_ms"]
        for r in mm.mp4_keyframe_sample(videos, step=1).collect()
    }
    for mid, tsc, delta in cases:
        for i in (0, 3, 6):
            assert got[(mid, i)] == i * delta * 1000 // tsc, (mid, i)
