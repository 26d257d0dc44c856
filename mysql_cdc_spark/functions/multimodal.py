"""Multimodal columns: image/audio/video as opaque BINARY payloads
with typed metadata, processed through Arrow-batched `mapInPandas`
pipelines.  A 100 TB multimodal corpus is exactly this shape — parquet
with a binary column — and the Spark-side plumbing (schema, partition
parallelism, batch iteration, UDF signatures) is what has to be right;
the pixel/sample decode itself is a library call.

The actual media codecs (PIL/cv2/torchaudio/av) are NOT available in
this container, so `decode_media` is STUBBED: it raises
NotImplementedError when a real codec is requested, and the feature
extractors use a clearly-marked deterministic fake (byte-level stats)
so every piece of plumbing is testable end-to-end.  Swap `_FAKE_DECODE`
for a real decoder and nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

KINDS = ("image", "audio", "video")

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
    """Real media decode — STUB.  The container has no media codecs;
    a production deployment plugs PIL/torchaudio/av in here."""
    raise NotImplementedError(
        f"media decode for kind={kind!r} requires a codec library "
        "(PIL/torchaudio/av) not present in this environment; "
        "use the deterministic byte-level features instead"
    )


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

    return media.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, step: int = 2) -> DataFrame:
    """Frame sampling for video rows: emit every `step`-th frame index
    from the metadata — the explode side of a video pipeline (the
    frame DECODE itself would join this against `decode_media`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs = [], []
            for mid, kind, meta in zip(pdf["media_id"], pdf["kind"], pdf["meta"]):
                if kind != "video":
                    continue
                n = int(meta["n_frames"])
                for i in range(0, n, step):
                    ids.append(mid)
                    idxs.append(i)
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs})

    return media.mapInPandas(run, FRAME_SCHEMA)
