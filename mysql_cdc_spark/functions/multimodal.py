"""Multimodal columns: image/audio/video as opaque BINARY payloads
with typed metadata, processed through Arrow-batched `mapInPandas`
pipelines.  A 100 TB multimodal corpus is exactly this shape — parquet
with a binary column — and the Spark-side plumbing (schema, partition
parallelism, batch iteration, UDF signatures) is what has to be right;
the pixel/sample decode itself is a library call.

All three decode paths are REAL: pure-Python PNG/WAV/AVI codecs
(functions/media_codecs.py, public formats, stdlib only) run inside
the Arrow-batched executors — `synth_real_media` +
`extract_decoded_features` exercise the full encode→bytes→decode
path with no fakes.  Video uses the uncompressed RIFF/AVI container
(raw 24-bit DIB frames) — compressed codecs (h264 etc.) would need
av/ffmpeg, which this environment doesn't have.  The byte-level fake
features (`extract_features`) are kept alongside as the cheap
no-decode-required path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

KINDS = ("image", "audio", "video")


def _spread(df: DataFrame) -> DataFrame:
    """Rebalance a small single-split scan before Python codec fan-out:
    a fixture-sized events file is ONE parquet split, which would run
    every encode/decode batch in a single task (measured 20s -> 3s on
    the 10k-image dedup corpus).  No-op when the scan already splits
    naturally (production scale)."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, parallelism // 2):
        return df.repartition(parallelism, "media_id")
    return df



MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("head_hex", T.StringType(), False),
        T.StructField("byte_sum", T.LongType(), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
    ]
)


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic media table derived from `events`:
    payload = md5 bytes of the event id (an opaque 16-byte blob), kind
    cycles through image/audio/video, metadata from event fields.
    Stands in for a real parquet-with-binary corpus."""
    from mysql_cdc_spark.sources.io import read_table

    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("media_id"),
        F.element_at(F.array(*[F.lit(k) for k in KINDS]), (F.col("event_id") % 3 + 1).cast("int")).alias("kind"),
        F.unhex(F.md5(F.col("event_id").cast("string"))).alias("payload"),
        F.struct(
            (F.col("event_id") % 640 + 1).cast("int").alias("width"),
            (F.col("event_id") % 480 + 1).cast("int").alias("height"),
            (F.col("event_id") % 7 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, kind: str):
    """Real media decode via the pure-Python PNG/WAV codecs
    (functions/media_codecs.py — public formats, stdlib only):

      image → (width, height, channels, raw pixel bytes)
      audio → (rate, channels, 16-bit samples)
      video → (width, height, n_frames, raw BGR frame list) via the
              uncompressed RIFF/AVI demuxer (compressed codecs would
              need av/ffmpeg, not present here)
    """
    from mysql_cdc_spark.functions.media_codecs import (
        decode_avi,
        decode_png,
        decode_wav,
    )

    if kind == "image":
        return decode_png(payload)
    if kind == "audio":
        return decode_wav(payload)
    if kind == "video":
        return decode_avi(payload)
    raise ValueError(f"unknown media kind {kind!r}")


def _fake_features(payload: bytes) -> tuple[int, str, int]:
    """_FAKE_DECODE: deterministic byte-level stand-in features."""
    return len(payload), payload[:4].hex(), sum(payload) % 256


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.  The
    shape is the real thing — one Python worker per partition, pandas
    batches in, pandas batches out — only the per-blob function is the
    deterministic fake."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_features(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [f[0] for f in feats],
                    "head_hex": [f[1] for f in feats],
                    "byte_sum": [f[2] for f in feats],
                }
            )

    # r20 (guide §4.1): mapInPandas is opaque to the column pruner —
    # without this select the unused `meta` struct is both COMPUTED
    # per row and shipped across the Arrow boundary.
    return media.select("media_id", "kind", "payload").mapInPandas(
        run, FEATURE_SCHEMA
    )


REAL_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("px_sum", T.LongType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("sample_sum", T.LongType(), True),
    ]
)

# Deterministic real-payload generation rules (shared with the DuckDB
# oracle's closed forms — keep in lockstep):
#   image: 8×8 RGB, even rows solid A = id % 256, odd rows solid
#          B = (id * 3) % 256 (all three channels equal)
#          → px_sum = 3 * 32 * (A + B)
#   audio: 32 PCM16 samples s_i = ((id*7 + i*13) % 65536) - 32768,
#          rate 8000 → sample_sum = Σ s_i
#   video: 5 solid 4×4 BGR frames, frame f value v_f =
#          (id*5 + f*17) % 256 → px_sum = 48 * Σ_f v_f, n_samples = 5
_IMG_W = _IMG_H = 8
_N_SAMPLES = 32
_VID_W = _VID_H = 4   # width*3 stays 4-byte aligned (DIB row rule)
_N_FRAMES = 5         # fixed so the oracle's range() is uncorrelated


def synth_real_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media table whose payloads are REAL encoded bytes (PNG/WAV/AVI
    via the pure-Python codecs) derived deterministically from
    `events` — all three kinds."""
    from mysql_cdc_spark.functions.media_codecs import (
        encode_avi,
        encode_png,
        encode_wav,
    )
    from mysql_cdc_spark.sources.io import read_table

    ev = read_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("media_id"),
        F.element_at(
            F.array(*[F.lit(k) for k in KINDS]), (F.col("event_id") % 3 + 1).cast("int")
        ).alias("kind"),
    )
    ev = _spread(ev)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid, kind in zip(pdf["media_id"], pdf["kind"]):
                mid = int(mid)
                if kind == "image":
                    a, b = mid % 256, (mid * 3) % 256
                    rows = [(a if y % 2 == 0 else b) for y in range(_IMG_H)]
                    pixels = bytes(
                        v for v in rows for _ in range(_IMG_W) for v in (v, v, v)
                    )
                    payloads.append(encode_png(_IMG_W, _IMG_H, pixels))
                elif kind == "audio":
                    samples = [
                        ((mid * 7 + i * 13) % 65536) - 32768 for i in range(_N_SAMPLES)
                    ]
                    payloads.append(encode_wav(samples))
                else:
                    frames = [
                        bytes([(mid * 5 + f * 17) % 256]) * (_VID_W * _VID_H * 3)
                        for f in range(_N_FRAMES)
                    ]
                    payloads.append(encode_avi(_VID_W, _VID_H, frames))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "payload": payloads}
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )
    return ev.mapInPandas(gen, schema)


def extract_decoded_features(media: DataFrame, on_error: str = "raise") -> DataFrame:
    """Feature extraction over REAL bytes: decode each payload with the
    PNG/WAV/AVI codecs and emit decoded-domain features — the full
    encode→bytes→decode→features path running Arrow-batched on
    executors (no fakes anywhere).  Video emits the all-frame pixel
    sum in px_sum and the frame count in n_samples.

    ``on_error='quarantine'`` completes the dead-letter contract
    across the media surface (image/audio dedup already have it): an
    undecodable payload of ANY modality becomes a row with all-NULL
    features instead of killing the pass; valid rows are unaffected.
    """
    if on_error not in ("raise", "quarantine"):
        raise ValueError(f"on_error must be raise|quarantine, got {on_error!r}")
    import struct as _struct
    import zlib as _zlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                try:
                    d = decode_media(bytes(payload), str(kind))
                except (ValueError, _struct.error, IndexError, EOFError,
                        _zlib.error):
                    if on_error == "raise":
                        raise
                    rows.append((mid, kind, None, None, None, None, None))
                    continue
                if kind == "image":
                    w, h, _ch, pixels = d
                    rows.append((mid, kind, w, h, sum(pixels), None, None))
                elif kind == "audio":
                    _rate, _ch, samples = d
                    rows.append((mid, kind, None, None, None, len(samples), sum(samples)))
                else:
                    w, h, n, frames = d
                    px = sum(sum(f) for f in frames)
                    rows.append((mid, kind, w, h, px, n, None))
            # Nullable Int64 built from the raw int/None lists,
            # matching the image_dedup/audio_dedup contract:
            # pd.DataFrame(list-of-tuples) would coerce the numeric
            # columns (which hold per-kind Nones) to float64 and
            # silently round values above 2^53.
            cols = ["media_id", "kind", "width", "height",
                    "px_sum", "n_samples", "sample_sum"]
            by_col = list(zip(*rows)) if rows else [[]] * len(cols)
            yield pd.DataFrame({
                c: (pd.array(vals, dtype="Int64") if i >= 2 else list(vals))
                for i, (c, vals) in enumerate(zip(cols, by_col))
            })

    # r20 (guide §4.1): explicit projection before the opaque boundary
    # (synth_real_media emits exactly these columns today, but the
    # select keeps the pruning guaranteed if a caller widens the input).
    return media.select("media_id", "kind", "payload").mapInPandas(
        run, REAL_FEATURE_SCHEMA
    )


def sample_frames(media: DataFrame, step: int = 2) -> DataFrame:
    """Frame sampling for video rows: emit every `step`-th frame index
    from the metadata — the explode side of a video pipeline (the
    frame DECODE itself would join this against `decode_media`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs = [], []
            for mid, n in zip(pdf["media_id"], pdf["n_frames"]):
                for i in range(0, int(n), step):
                    ids.append(mid)
                    idxs.append(i)
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs})

    # r20 (guide §4.1): the function reads only video rows' frame
    # counts — filter + project in Spark BEFORE the opaque boundary,
    # so the payload blob is neither computed nor shipped and 2/3 of
    # the rows never reach Python.  Row-identical: non-video rows were
    # skipped inside the loop.
    return media.filter(F.col("kind") == "video").select(
        "media_id", F.col("meta.n_frames").alias("n_frames")
    ).mapInPandas(run, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Image dedup over real PNG bytes: exact (decoded-pixel hash) and
# perceptual (dHash) — byte-hash would find NEITHER by construction.
# ---------------------------------------------------------------------------

_DD_W, _DD_H = 27, 16      # 9x8 dHash grid of exact 3x2 blocks
_DD_GROUPS = 50            # pixel content key = media_id % _DD_GROUPS


def _dedup_pixels(media_id: int) -> bytes:
    """Closed-form pixel content for the image-dedup corpus: a
    per-group pseudo-random grayscale pattern (values < 200 so the
    +1 noise never wraps), with every 7th image uniformly brightened
    by 1 — pixel-distinct from its group but dHash-identical (a
    uniform shift preserves every horizontal gradient sign)."""
    c = media_id % _DD_GROUPS
    noise = 1 if media_id % 7 == 0 else 0
    vals = bytearray()
    for y in range(_DD_H):
        for x in range(_DD_W):
            v = (13 + ((x * (c + 3) + y * (c + 5) + x * y * (c % 11)) % 17) * 11 + noise) % 200
            vals.extend((v, v, v))
    return bytes(vals)


def synth_image_corpus(
    spark: SparkSession, sf_dir: str, corrupt_every: int | None = None
) -> DataFrame:
    """PNG corpus with planted duplicate structure: pixel content is a
    pure function of media_id % 50, every payload additionally carries
    a media_id-specific tEXt chunk, so PAYLOAD BYTES are all distinct
    — exact dedup must run on decoded pixels, not on the blob.
    ``corrupt_every`` truncates every Nth payload mid-IDAT (the
    dead-letter fixture for the quarantine path)."""
    import struct as _struct
    import zlib as _zlib

    from mysql_cdc_spark.functions.media_codecs import PNG_SIG, encode_png
    from mysql_cdc_spark.sources.io import read_table

    ev = _spread(
        read_table(spark, sf_dir, "events").select(
            F.col("event_id").alias("media_id")
        )
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                png = encode_png(_DD_W, _DD_H, _dedup_pixels(mid))
                # splice a tEXt chunk after IHDR: ancillary, CRC-valid,
                # ignored by decoders — makes every payload byte-unique.
                body = b"id\x00" + str(mid).encode()
                text = (
                    _struct.pack(">I", len(body)) + b"tEXt" + body
                    + _struct.pack(">I", _zlib.crc32(b"tEXt" + body) & 0xFFFFFFFF)
                )
                ihdr_end = 8 + 12 + 13
                payload = png[:ihdr_end] + text + png[ihdr_end:]
                if corrupt_every is not None and mid % corrupt_every == 0:
                    payload = payload[: ihdr_end + len(text) + 14]  # torn IDAT
                payloads.append(payload)
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": payloads})

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )
    return ev.mapInPandas(gen, schema)


def image_dedup(images: DataFrame, on_error: str = "raise") -> DataFrame:
    """Exact + perceptual image dedup from REAL decoded bytes:

    - exact key: md5 of the decoded pixel buffer (not the payload —
      byte-distinct re-encodes of the same image must collide);
    - perceptual key: 64-bit dHash (Krawetz) — integer 3x2-block sums
      on the grayscale image, one bit per horizontal gradient sign in
      the 9x8 grid; brightness shifts and re-encodes preserve it.

    Scale shape: Arrow-batched decode+hash (one pass over payload
    bytes), then two map-side-combinable groupBys on the two hash keys
    and two equi-joins back — the exact_dedup topology, run twice.
    Output carries group sizes and canonical ids only (hash values are
    internal); every image appears exactly once.

    ``on_error='quarantine'`` routes undecodable payloads to rows with
    is_corrupt=True and NULL group fields instead of failing the job —
    the same dead-letter contract as the binlog decoder: at 100 TB one
    torn blob must never kill the pass, and the corrupt set stays
    auditable in the result.
    """
    if on_error not in ("raise", "quarantine"):
        raise ValueError(f"on_error must be raise|quarantine, got {on_error!r}")
    import hashlib

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("px_key", T.StringType(), True),
            T.StructField("dhash", T.LongType(), True),
        ]
    )

    def keys(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct
        import zlib as _zlib

        import numpy as np

        from mysql_cdc_spark.functions.media_codecs import decode_png

        for pdf in batches:
            ids, px, dh = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    # zlib.error: a chunk-valid payload whose deflate
                    # stream is corrupt (flipped IDAT bytes with a
                    # recomputed CRC, empty/partial idat buffer) —
                    # must dead-letter like any other torn blob.
                    w, h, ch, pixels = decode_png(bytes(payload))
                except (ValueError, _struct.error, IndexError, EOFError,
                        _zlib.error):
                    if on_error == "raise":
                        raise
                    ids.append(int(mid)); px.append(None); dh.append(None)
                    continue
                ids.append(int(mid))
                px.append(hashlib.md5(pixels).hexdigest())
                # integer block sums: gray = r+g+b per pixel, cells are
                # exact 3x2 blocks (w=27->9 cols, h=16->8 rows).
                # Vectorized: reshape to (8, bh, 9, bw) blocks and sum
                # — int64 accumulators, bit-identical to the scalar
                # triple loop it replaces, ~100x less Python per image.
                bw, bh = w // 9, h // 8
                g = (
                    np.frombuffer(pixels, dtype=np.uint8)
                    .astype(np.int64)
                    .reshape(h, w, ch)
                    .sum(axis=2)
                )
                cells = (
                    g[: 8 * bh, : 9 * bw]
                    .reshape(8, bh, 9, bw)
                    .sum(axis=(1, 3))
                )
                bits = 0
                for flag in (cells[:, :8] < cells[:, 1:]).ravel():
                    bits = (bits << 1) | int(flag)
                dh.append(bits - (1 << 63))  # signed 64-bit
            # nullable Int64, NOT bare lists: pandas would coerce an
            # int column containing a quarantine None to float64 and
            # silently round 64-bit hashes (off-by-ULP dhash split).
            yield pd.DataFrame({
                "media_id": ids,
                "px_key": pd.array(px, dtype="string"),
                "dhash": pd.array(dh, dtype="Int64"),
            })

    # cache: keyed feeds three DAG branches (self + two group joins);
    # without it the Python decode of the whole corpus runs 3x.
    keyed = images.mapInPandas(keys, out_schema).cache()
    valid = keyed.filter(F.col("px_key").isNotNull())
    ex = valid.groupBy("px_key").agg(
        F.min("media_id").alias("keep_exact"),
        F.count(F.lit(1)).cast("bigint").alias("n_exact"),
    )
    pc = valid.groupBy("dhash").agg(
        F.min("media_id").alias("keep_perceptual"),
        F.count(F.lit(1)).cast("bigint").alias("n_perceptual"),
    )
    out = (
        valid.join(ex, "px_key")
        .join(pc, "dhash")
        .select(
            "media_id",
            F.lit(False).alias("is_corrupt"),
            "n_exact",
            "keep_exact",
            (F.col("media_id") == F.col("keep_exact")).alias("is_canonical"),
            "n_perceptual",
            "keep_perceptual",
        )
    )
    if on_error == "quarantine":
        corrupt = keyed.filter(F.col("px_key").isNull()).select(
            "media_id",
            F.lit(True).alias("is_corrupt"),
            F.lit(None).cast("bigint").alias("n_exact"),
            F.lit(None).cast("bigint").alias("keep_exact"),
            F.lit(False).alias("is_canonical"),
            F.lit(None).cast("bigint").alias("n_perceptual"),
            F.lit(None).cast("bigint").alias("keep_perceptual"),
        )
        out = out.unionByName(corrupt)
    return out


# ---------------------------------------------------------------------------
# Audio dedup over real WAV bytes: exact (decoded-sample hash) and
# perceptual (gain-invariant gradient-sign fingerprint).
# ---------------------------------------------------------------------------

_AD_N = 130                # samples per clip -> 65 blocks of 2 -> 64 sign bits
_AD_GROUPS = 40            # sample content key = media_id % _AD_GROUPS


def _dedup_samples(media_id: int) -> list[int]:
    """Closed-form PCM content: per-group md5-derived samples bounded
    to ±2000 (so the ×2 gain of every 7th clip stays in int16 exactly —
    7 is coprime with the 40 groups, so gain splits every group);
    gain scaling changes every sample but no gradient SIGN, and the
    md5 derivation makes cross-group sign-pattern collisions
    negligible (a linear-congruential pattern measurably collides)."""
    import hashlib

    c = media_id % _AD_GROUPS
    gain = 2 if media_id % 7 == 0 else 1
    return [
        (int.from_bytes(hashlib.md5(f"{c}:{i}".encode()).digest()[:2], "big")
         % 4001 - 2000) * gain
        for i in range(_AD_N)
    ]


def synth_audio_corpus(
    spark: SparkSession, sf_dir: str, corrupt_every: int | None = None
) -> DataFrame:
    """WAV corpus with planted duplicate structure: sample content is a
    pure function of media_id % 40, every payload carries a spliced
    media-id chunk (decoders skip unknown RIFF chunks), so payload
    bytes are all distinct — dedup must decode.  ``corrupt_every``
    truncates every Nth payload mid-fmt (the dead-letter fixture for
    the quarantine path — decode_wav dies on the short fmt body)."""
    import struct as _struct

    from mysql_cdc_spark.functions.media_codecs import encode_wav
    from mysql_cdc_spark.sources.io import read_table

    ev = _spread(
        read_table(spark, sf_dir, "events").select(
            F.col("event_id").alias("media_id")
        )
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                wav = encode_wav(_dedup_samples(mid))
                # splice an id chunk between 'fmt ' and 'data' (RIFF
                # readers skip unknown tags; word-aligned)
                body = str(mid).encode()
                body += b"\x00" * (len(body) % 2)
                extra = b"xid " + _struct.pack("<I", len(body)) + body
                insert_at = 12 + 8 + 16          # RIFF hdr + fmt chunk
                patched = wav[:insert_at] + extra + wav[insert_at:]
                # fix the RIFF size field
                patched = (
                    patched[:4]
                    + _struct.pack("<I", len(patched) - 8)
                    + patched[8:]
                )
                if corrupt_every is not None and mid % corrupt_every == 0:
                    patched = patched[:24]       # torn mid-fmt
                payloads.append(patched)
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": payloads})

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )
    return ev.mapInPandas(gen, schema)


def audio_dedup(clips: DataFrame, on_error: str = "raise") -> DataFrame:
    """Exact + perceptual audio dedup from REAL decoded bytes:

    - exact key: md5 of the decoded PCM buffer;
    - perceptual key: 64-bit gradient-sign fingerprint — strict
      greater-than between consecutive 2-sample block sums.  Positive
      gain scaling preserves every comparison exactly (the audio
      analog of the image dHash), so a louder re-master lands in the
      same perceptual group while its exact hash differs.

    Same scale shape as image_dedup: Arrow-batched decode+hash, two
    map-side-combinable groupBys, two equi-joins back.

    ``on_error='quarantine'`` mirrors image_dedup's dead-letter
    contract: undecodable WAV payloads become is_corrupt rows with
    NULL group fields instead of failing the pass — without it one
    torn clip kills the whole job, which the binlog decoder and the
    image path both already refuse to allow.
    """
    if on_error not in ("raise", "quarantine"):
        raise ValueError(f"on_error must be raise|quarantine, got {on_error!r}")
    import hashlib
    import struct as _struct

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("pcm_key", T.StringType(), True),
            T.StructField("fp", T.LongType(), True),
        ]
    )

    def keys(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mysql_cdc_spark.functions.media_codecs import decode_wav

        for pdf in batches:
            ids, pcm, fps = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    rate, channels, samples = decode_wav(bytes(payload))
                except (ValueError, _struct.error, IndexError, EOFError):
                    if on_error == "raise":
                        raise
                    ids.append(int(mid)); pcm.append(None); fps.append(None)
                    continue
                ids.append(int(mid))
                pcm.append(
                    hashlib.md5(
                        _struct.pack(f"<{len(samples)}h", *samples)
                    ).hexdigest()
                )
                sums = [
                    samples[2 * j] + samples[2 * j + 1]
                    for j in range(len(samples) // 2)
                ]
                bits = 0
                for j in range(min(64, len(sums) - 1)):
                    bits = (bits << 1) | (1 if sums[j + 1] > sums[j] else 0)
                fps.append(bits - (1 << 63))
            # nullable dtypes for the same Int64-vs-float64 reason as
            # the image path: one quarantine None must not round the
            # 64-bit fingerprints of every valid row in the batch.
            yield pd.DataFrame({
                "media_id": ids,
                "pcm_key": pd.array(pcm, dtype="string"),
                "fp": pd.array(fps, dtype="Int64"),
            })

    keyed = clips.mapInPandas(keys, out_schema).cache()
    valid = keyed.filter(F.col("pcm_key").isNotNull())
    ex = valid.groupBy("pcm_key").agg(
        F.min("media_id").alias("keep_exact"),
        F.count(F.lit(1)).cast("bigint").alias("n_exact"),
    )
    pc = valid.groupBy("fp").agg(
        F.min("media_id").alias("keep_perceptual"),
        F.count(F.lit(1)).cast("bigint").alias("n_perceptual"),
    )
    out = (
        valid.join(ex, "pcm_key")
        .join(pc, "fp")
        .select(
            "media_id",
            F.lit(False).alias("is_corrupt"),
            "n_exact",
            "keep_exact",
            (F.col("media_id") == F.col("keep_exact")).alias("is_canonical"),
            "n_perceptual",
            "keep_perceptual",
        )
    )
    if on_error == "quarantine":
        corrupt = keyed.filter(F.col("pcm_key").isNull()).select(
            "media_id",
            F.lit(True).alias("is_corrupt"),
            F.lit(None).cast("bigint").alias("n_exact"),
            F.lit(None).cast("bigint").alias("keep_exact"),
            F.lit(False).alias("is_canonical"),
            F.lit(None).cast("bigint").alias("n_perceptual"),
            F.lit(None).cast("bigint").alias("keep_perceptual"),
        )
        out = out.unionByName(corrupt)
    return out


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF (functions/isobmff.py): metadata-level video demux —
# the container layer a 100 TB video corpus is actually planned and
# sampled on (shard planning and keyframe selection read the sample
# TABLE, never decoded frames).  Coded-picture decode stays out of
# scope (needs libav/ffmpeg; see isobmff module docstring).
#
# Deterministic generation rule (lockstep with the DuckDB closed
# forms):
#   n        = media_id % 7 + 2 samples
#   keyframe sample i  iff  i % 3 == 0
#   sample i bytes     = [(media_id*11 + i*7) % 256] * ((media_id+i) % 5 + 4)
#   width    = 16 * (media_id % 4 + 1), height 16
#   chunking = media_id % 3 + 1 samples per chunk (varies the real
#              stsc/stco layout across the corpus; features must be
#              invariant to it — which is exactly what makes the
#              sample-table resolution a testable claim)
#   timescale 1000, delta 40  →  dts_ms = i*40, duration_ms = n*40
# ---------------------------------------------------------------------------

MP4_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("brand", T.StringType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("n_keyframes", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("total_bytes", T.LongType(), True),
    ]
)

MP4_KEYFRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_idx", T.LongType(), False),
        T.StructField("dts_ms", T.LongType(), False),
        T.StructField("byte_sum", T.LongType(), False),
    ]
)


def _mp4_payload(mid: int) -> bytes:
    from mysql_cdc_spark.functions.isobmff import encode_mp4

    n = mid % 7 + 2
    samples = [
        bytes([(mid * 11 + i * 7) % 256]) * ((mid + i) % 5 + 4) for i in range(n)
    ]
    return encode_mp4(
        16 * (mid % 4 + 1),
        16,
        samples,
        keyframes=[i for i in range(n) if i % 3 == 0],
        samples_per_chunk=mid % 3 + 1,
    )


def _fmp4_payload(mid: int) -> bytes:
    """FRAGMENTED twin of `_mp4_payload` (fMP4/CMAF layout).
    Closed-form generation rule (lockstep with the DuckDB oracle):
      n_frags  = mid % 3 + 1 fragments
      spf      = mid % 4 + 2 samples per fragment, n = n_frags * spf
      keyframe = first sample of each fragment (i % spf == 0) — the
                 CMAF convention (fragments begin at a sync sample)
      sample i = [(mid*13 + i*5) % 256] * ((mid + 2*i) % 5 + 3)
      width    = 16 * (mid % 4 + 1), height 16
      timescale 1000, delta 40 → dts_ms = i*40, duration_ms = n*40
    """
    from mysql_cdc_spark.functions.isobmff import encode_fmp4

    n_frags = mid % 3 + 1
    spf = mid % 4 + 2
    n = n_frags * spf
    samples = [
        bytes([(mid * 13 + i * 5) % 256]) * ((mid + 2 * i) % 5 + 3) for i in range(n)
    ]
    return encode_fmp4(
        16 * (mid % 4 + 1),
        16,
        [samples[f * spf : (f + 1) * spf] for f in range(n_frags)],
        keyframes=[i for i in range(n) if i % spf == 0],
    )


def synth_mp4_corpus(
    spark: SparkSession,
    sf_dir: str,
    corrupt_every: int | None = None,
    fragmented: bool = False,
) -> DataFrame:
    """Video table whose payloads are REAL ISO-BMFF bytes (pure-Python
    encoder) derived deterministically from `events`.  With
    `fragmented`, payloads are fMP4/CMAF (moof/traf sample tables).
    With `corrupt_every`, every Nth payload is torn: classic files are
    cut in half mid-file (the moov never arrives — the truncated-upload
    shape); fragmented files lose their last 3 bytes (the final mdat
    is short — the interrupted-stream shape; always mid-box, so the
    tear is deterministic whatever the box layout)."""
    from mysql_cdc_spark.sources.io import read_table

    ev = read_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("media_id")
    )
    ev = _spread(ev)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for m in pdf["media_id"]:
                p = _fmp4_payload(int(m)) if fragmented else _mp4_payload(int(m))
                if corrupt_every and int(m) % corrupt_every == 0:
                    p = p[:-3] if fragmented else p[: len(p) // 2]
                payloads.append(p)
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": payloads})

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )
    return ev.mapInPandas(gen, schema)


def mp4_meta(videos: DataFrame, on_error: str = "raise") -> DataFrame:
    """Container-level metadata per video: parse the real box tree and
    resolve the sample table (brand, codec fourcc, track dims, sample
    and keyframe counts, duration, total sample bytes).

    ``on_error='quarantine'`` extends the media dead-letter contract
    to the container layer: a torn/overrunning box tree becomes a row
    with NULL metadata instead of killing the pass."""
    if on_error not in ("raise", "quarantine"):
        raise ValueError(f"on_error must be raise|quarantine, got {on_error!r}")
    import struct as _struct

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mysql_cdc_spark.functions.isobmff import parse_mp4

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    f = parse_mp4(bytes(payload))
                    t = f.video_track()
                    st = t.sample_table()
                except (ValueError, _struct.error, IndexError):
                    if on_error == "raise":
                        raise
                    rows.append((mid, None, None, None, None, None, None, None, None))
                    continue
                rows.append(
                    (
                        mid,
                        f.major_brand,
                        t.codec,
                        t.width,
                        t.height,
                        len(st),
                        sum(1 for _, _, _, k in st if k),
                        f.duration * 1000 // max(f.timescale, 1),
                        sum(s for _, s, _, _ in st),
                    )
                )
            cols = ["media_id", "brand", "codec", "width", "height",
                    "n_samples", "n_keyframes", "duration_ms", "total_bytes"]
            by_col = list(zip(*rows)) if rows else [[]] * len(cols)
            yield pd.DataFrame({
                c: (pd.array(vals, dtype="Int64") if i >= 3 else list(vals))
                for i, (c, vals) in enumerate(zip(cols, by_col))
            })

    return videos.mapInPandas(run, MP4_META_SCHEMA)


def mp4_keyframe_sample(videos: DataFrame, step: int = 2) -> DataFrame:
    """Every `step`-th KEYFRAME per video, with its decode timestamp
    and the byte sum of the REAL sample bytes sliced out of mdat via
    the resolved (offset, size) — byte-exact across whatever
    chunk layout the file uses, which is the whole point of stsc/stco
    resolution."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mysql_cdc_spark.functions.isobmff import extract_sample, parse_mp4

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                blob = bytes(payload)
                t = parse_mp4(blob).video_track()
                st = t.sample_table()
                # dts*1000 BEFORE the floor-div (matches mp4_meta's
                # duration math): 1000 // timescale floors to 0 for
                # any timescale > 1000 (e.g. the common 90000) and is
                # inexact for non-divisors like 600 (r12 ADVICE).
                ts_scale = max(t.timescale, 1)
                keys = [i for i, (_, _, _, k) in enumerate(st) if k]
                for i in keys[::step]:
                    off, size, dts, _ = st[i]
                    rows.append(
                        (mid, i, dts * 1000 // ts_scale, sum(extract_sample(blob, off, size)))
                    )
            cols = ["media_id", "sample_idx", "dts_ms", "byte_sum"]
            by_col = list(zip(*rows)) if rows else [[]] * len(cols)
            yield pd.DataFrame({
                c: pd.array(vals, dtype="Int64") for c, vals in zip(cols, by_col)
            })

    return videos.mapInPandas(run, MP4_KEYFRAME_SCHEMA)
