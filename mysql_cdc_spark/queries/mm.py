"""mm query registrations (split from queries.py; registration order is governed by _registry.REGISTRATION_ORDER)."""
from __future__ import annotations


from mysql_cdc_spark.queries._registry import register  # noqa: E402



# ---------------------------------------------------------------------------
# Multimodal columns (functions/multimodal.py): binary payloads through
# Arrow-batched mapInPandas.
# ---------------------------------------------------------------------------

_HEXVAL = "(instr('0123456789abcdef', substr(h, {pos}, 1)) - 1)"


@register(
    "mm_media_features",
    "WITH m AS (SELECT event_id, md5(CAST(event_id AS VARCHAR)) AS h FROM events) "
    "SELECT event_id AS media_id, "
    "CASE event_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind, "
    "CAST(16 AS BIGINT) AS n_bytes, substr(h, 1, 8) AS head_hex, "
    "CAST(list_sum([16 * " + _HEXVAL.format(pos="2*j + 1") + " + "
    + _HEXVAL.format(pos="2*j + 2") + " for j in range(0, 16)]) % 256 AS BIGINT) AS byte_sum "
    "FROM m",
)
def mm_media_features(spark, sf_dir):
    """Binary-payload feature extraction through mapInPandas (the
    multimodal plumbing, with deterministic fake decode)."""
    from mysql_cdc_spark.functions import multimodal as mm

    return mm.extract_features(mm.synth_media(spark, sf_dir))


@register(
    "mm_frame_sample",
    "SELECT CAST(event_id AS BIGINT) AS media_id, CAST(f AS BIGINT) AS frame_idx "
    "FROM events, unnest(range(0, event_id % 7 + 1, 2)) AS t(f) "
    "WHERE event_id % 3 = 2",
)
def mm_frame_sample(spark, sf_dir):
    """Video frame-index sampling (every 2nd frame from metadata) via
    mapInPandas — the explode half of a frame pipeline."""
    from mysql_cdc_spark.functions import multimodal as mm

    return mm.sample_frames(mm.synth_media(spark, sf_dir))


@register(
    "mm_image_dedup",
    "WITH img AS (SELECT event_id AS media_id, event_id % 50 AS c, "
    "(event_id % 7 = 0) AS noisy FROM events), "
    "ex AS (SELECT c, noisy, MIN(media_id) AS keep_exact, "
    "CAST(COUNT(*) AS BIGINT) AS n_exact FROM img GROUP BY 1, 2), "
    "pc AS (SELECT c, MIN(media_id) AS keep_perceptual, "
    "CAST(COUNT(*) AS BIGINT) AS n_perceptual FROM img GROUP BY 1) "
    "SELECT media_id, FALSE AS is_corrupt, n_exact, keep_exact, "
    "media_id = keep_exact AS is_canonical, "
    "n_perceptual, keep_perceptual "
    "FROM img JOIN ex USING (c, noisy) JOIN pc USING (c)",
)
def mm_image_dedup(spark, sf_dir):
    """Image dedup over REAL PNG bytes: payloads are all byte-distinct
    (media_id tEXt chunk), yet decode to 50 pixel-content groups with
    every 7th image uniformly brightened — exact dedup groups on the
    decoded-pixel hash, perceptual dedup groups on the 64-bit dHash
    (which the brightness shift preserves).  The oracle re-derives both
    groupings in closed form from the generation rule, so decode, pixel
    hashing, and the dHash gradient grid must all be right."""
    from mysql_cdc_spark.functions import multimodal as mm

    return mm.image_dedup(mm.synth_image_corpus(spark, sf_dir))


@register(
    "mm_image_dedup_quarantine",
    "WITH img AS (SELECT event_id AS media_id, event_id % 50 AS c, "
    "(event_id % 7 = 0) AS noisy, (event_id % 97 = 0) AS corrupt FROM events), "
    "ok AS (SELECT * FROM img WHERE NOT corrupt), "
    "ex AS (SELECT c, noisy, MIN(media_id) AS keep_exact, "
    "CAST(COUNT(*) AS BIGINT) AS n_exact FROM ok GROUP BY 1, 2), "
    "pc AS (SELECT c, MIN(media_id) AS keep_perceptual, "
    "CAST(COUNT(*) AS BIGINT) AS n_perceptual FROM ok GROUP BY 1) "
    "SELECT media_id, FALSE AS is_corrupt, n_exact, keep_exact, "
    "media_id = keep_exact AS is_canonical, n_perceptual, keep_perceptual "
    "FROM ok JOIN ex USING (c, noisy) JOIN pc USING (c) "
    "UNION ALL "
    "SELECT media_id, TRUE, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), FALSE, "
    "CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM img WHERE corrupt",
)
def mm_image_dedup_quarantine(spark, sf_dir):
    """Dead-letter contract for media at scale: every 97th payload is
    torn mid-IDAT; on_error='quarantine' routes them to is_corrupt
    rows with NULL group fields while the valid corpus dedups
    normally — one torn blob never kills the pass (the binlog
    decoder's quarantine philosophy applied to the media path)."""
    import pathlib

    from mysql_cdc_spark.functions import multimodal as mm

    return mm.image_dedup(
        mm.synth_image_corpus(spark, sf_dir, corrupt_every=97),
        on_error="quarantine",
    )


@register(
    "mm_audio_dedup",
    "WITH clip AS (SELECT event_id AS media_id, event_id % 40 AS c, "
    "(event_id % 7 = 0) AS gained FROM events), "
    "ex AS (SELECT c, gained, MIN(media_id) AS keep_exact, "
    "CAST(COUNT(*) AS BIGINT) AS n_exact FROM clip GROUP BY 1, 2), "
    "pc AS (SELECT c, MIN(media_id) AS keep_perceptual, "
    "CAST(COUNT(*) AS BIGINT) AS n_perceptual FROM clip GROUP BY 1) "
    "SELECT media_id, FALSE AS is_corrupt, n_exact, keep_exact, "
    "media_id = keep_exact AS is_canonical, "
    "n_perceptual, keep_perceptual "
    "FROM clip JOIN ex USING (c, gained) JOIN pc USING (c)",
)
def mm_audio_dedup(spark, sf_dir):
    """Audio dedup over REAL WAV bytes: payloads all byte-distinct
    (spliced id chunk), decoding to 40 PCM content groups with every
    7th clip gain-doubled — exact dedup groups on the decoded-sample
    hash, perceptual dedup on a gain-invariant gradient-sign
    fingerprint.  Oracle re-derives both groupings in closed form."""
    from mysql_cdc_spark.functions import multimodal as mm

    return mm.audio_dedup(mm.synth_audio_corpus(spark, sf_dir))


@register(
    "mm_audio_dedup_quarantine",
    "WITH clip AS (SELECT event_id AS media_id, event_id % 40 AS c, "
    "(event_id % 7 = 0) AS gained, (event_id % 97 = 0) AS corrupt FROM events), "
    "ok AS (SELECT * FROM clip WHERE NOT corrupt), "
    "ex AS (SELECT c, gained, MIN(media_id) AS keep_exact, "
    "CAST(COUNT(*) AS BIGINT) AS n_exact FROM ok GROUP BY 1, 2), "
    "pc AS (SELECT c, MIN(media_id) AS keep_perceptual, "
    "CAST(COUNT(*) AS BIGINT) AS n_perceptual FROM ok GROUP BY 1) "
    "SELECT media_id, FALSE AS is_corrupt, n_exact, keep_exact, "
    "media_id = keep_exact AS is_canonical, n_perceptual, keep_perceptual "
    "FROM ok JOIN ex USING (c, gained) JOIN pc USING (c) "
    "UNION ALL "
    "SELECT media_id, TRUE, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), FALSE, "
    "CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM clip WHERE corrupt",
)
def mm_audio_dedup_quarantine(spark, sf_dir):
    """Dead-letter contract for the AUDIO path (ADVICE r9: audio had
    no quarantine, so one undecodable WAV killed the pass): every 97th
    payload is torn mid-fmt; on_error='quarantine' routes them to
    is_corrupt rows with NULL group fields while the valid corpus
    dedups normally — mirroring mm_image_dedup_quarantine."""
    from mysql_cdc_spark.functions import multimodal as mm

    return mm.audio_dedup(
        mm.synth_audio_corpus(spark, sf_dir, corrupt_every=97),
        on_error="quarantine",
    )


@register(
    "mm_decoded_features",
    "SELECT CAST(event_id AS BIGINT) AS media_id, 'image' AS kind, "
    "8 AS width, 8 AS height, "
    "CAST(3*32*((event_id % 256) + ((event_id*3) % 256)) AS BIGINT) AS px_sum, "
    "CAST(NULL AS INTEGER) AS n_samples, CAST(NULL AS BIGINT) AS sample_sum "
    "FROM events WHERE event_id % 3 = 0 "
    "UNION ALL "
    "SELECT CAST(event_id AS BIGINT), 'audio', NULL, NULL, NULL, 32, "
    "(SELECT CAST(SUM(((event_id*7 + i*13) % 65536) - 32768) AS BIGINT) "
    " FROM range(32) t(i)) "
    "FROM events WHERE event_id % 3 = 1 "
    "UNION ALL "
    "SELECT CAST(event_id AS BIGINT), 'video', 4, 4, "
    "(SELECT CAST(48 * SUM((event_id*5 + f*17) % 256) AS BIGINT) FROM range(5) t(f)), "
    "5, CAST(NULL AS BIGINT) "
    "FROM events WHERE event_id % 3 = 2",
)
def mm_decoded_features(spark, sf_dir):
    """REAL media decode end-to-end: payloads are genuine PNG/WAV/AVI
    bytes (pure-Python codecs, functions/media_codecs.py) encoded on
    executors, decoded back on executors, and reduced to decoded-domain
    features (pixel sums, sample sums, per-frame sums).  The oracle
    computes the same features in closed form from the generation
    rules — so the whole encode→bytes→decode chain must be
    lossless for all three modalities."""
    from mysql_cdc_spark.functions import multimodal as mm

    return mm.extract_decoded_features(mm.synth_real_media(spark, sf_dir))


@register(
    "mm_mp4_meta",
    "SELECT CAST(event_id AS BIGINT) AS media_id, 'isom' AS brand, 'rle ' AS codec, "
    "CAST(16 * (event_id % 4 + 1) AS BIGINT) AS width, CAST(16 AS BIGINT) AS height, "
    "CAST(event_id % 7 + 2 AS BIGINT) AS n_samples, "
    "CAST((event_id % 7 + 4) // 3 AS BIGINT) AS n_keyframes, "
    "CAST((event_id % 7 + 2) * 40 AS BIGINT) AS duration_ms, "
    "CAST(list_sum([(event_id + i) % 5 + 4 for i in range(0, event_id % 7 + 2)]) AS BIGINT) "
    "AS total_bytes FROM events",
)
def mm_mp4_meta(spark, sf_dir):
    """ISO-BMFF container metadata over REAL MP4 bytes (pure-Python
    box parser, functions/isobmff.py): box-tree walk + full
    stts/stss/stsz/stsc/stco sample-table resolution per video, with
    the chunk layout VARYING across the corpus (media_id % 3 + 1
    samples per chunk) so the closed-form oracle catches any
    stsc/stco resolution error."""
    from mysql_cdc_spark.functions import multimodal as mm

    return mm.mp4_meta(mm.synth_mp4_corpus(spark, sf_dir))


@register(
    "mm_mp4_keyframe_sample",
    "SELECT CAST(event_id AS BIGINT) AS media_id, CAST(i AS BIGINT) AS sample_idx, "
    "CAST(i * 40 AS BIGINT) AS dts_ms, "
    "CAST(((event_id + i) % 5 + 4) * ((event_id * 11 + i * 7) % 256) AS BIGINT) AS byte_sum "
    "FROM events, unnest(range(0, event_id % 7 + 2, 6)) AS t(i)",
)
def mm_mp4_keyframe_sample(spark, sf_dir):
    """Metadata-level keyframe sampling: every 2nd sync sample (stss)
    per video, byte-exact sample extraction out of mdat via the
    resolved (offset, size) — keyframes are every 3rd sample, so the
    sampled stride is 6 and byte_sum has the closed form the oracle
    states."""
    from mysql_cdc_spark.functions import multimodal as mm

    return mm.mp4_keyframe_sample(mm.synth_mp4_corpus(spark, sf_dir))


@register(
    "mm_mp4_quarantine",
    "SELECT CAST(event_id AS BIGINT) AS media_id, "
    "CASE WHEN event_id % 97 = 0 THEN NULL ELSE 'isom' END AS brand, "
    "CASE WHEN event_id % 97 = 0 THEN NULL ELSE 'rle ' END AS codec, "
    "CASE WHEN event_id % 97 = 0 THEN NULL ELSE CAST(16 * (event_id % 4 + 1) AS BIGINT) END AS width, "
    "CASE WHEN event_id % 97 = 0 THEN NULL ELSE CAST(16 AS BIGINT) END AS height, "
    "CASE WHEN event_id % 97 = 0 THEN NULL ELSE CAST(event_id % 7 + 2 AS BIGINT) END AS n_samples, "
    "CASE WHEN event_id % 97 = 0 THEN NULL ELSE CAST((event_id % 7 + 4) // 3 AS BIGINT) END AS n_keyframes, "
    "CASE WHEN event_id % 97 = 0 THEN NULL ELSE CAST((event_id % 7 + 2) * 40 AS BIGINT) END AS duration_ms, "
    "CASE WHEN event_id % 97 = 0 THEN NULL ELSE "
    "CAST(list_sum([(event_id + i) % 5 + 4 for i in range(0, event_id % 7 + 2)]) AS BIGINT) END AS total_bytes "
    "FROM events",
)
def mm_mp4_quarantine(spark, sf_dir):
    """Dead-letter contract at the container layer: every 97th MP4 is
    torn in half mid-file (the moov never arrives); quarantine mode
    yields NULL-metadata rows for them while the valid corpus parses
    normally — one truncated upload never kills the demux pass."""
    from mysql_cdc_spark.functions import multimodal as mm

    return mm.mp4_meta(
        mm.synth_mp4_corpus(spark, sf_dir, corrupt_every=97),
        on_error="quarantine",
    )


@register(
    "mm_mp4_fragmented",
    "SELECT CAST(event_id AS BIGINT) AS media_id, "
    "CASE WHEN event_id % 97 = 0 THEN NULL ELSE 'iso5' END AS brand, "
    "CASE WHEN event_id % 97 = 0 THEN NULL ELSE 'rle ' END AS codec, "
    "CASE WHEN event_id % 97 = 0 THEN NULL ELSE CAST(16 * (event_id % 4 + 1) AS BIGINT) END AS width, "
    "CASE WHEN event_id % 97 = 0 THEN NULL ELSE CAST(16 AS BIGINT) END AS height, "
    "CASE WHEN event_id % 97 = 0 THEN NULL ELSE "
    "CAST((event_id % 3 + 1) * (event_id % 4 + 2) AS BIGINT) END AS n_samples, "
    "CASE WHEN event_id % 97 = 0 THEN NULL ELSE CAST(event_id % 3 + 1 AS BIGINT) END AS n_keyframes, "
    "CASE WHEN event_id % 97 = 0 THEN NULL ELSE "
    "CAST((event_id % 3 + 1) * (event_id % 4 + 2) * 40 AS BIGINT) END AS duration_ms, "
    "CASE WHEN event_id % 97 = 0 THEN NULL ELSE "
    "CAST(list_sum([(event_id + 2*i) % 5 + 3 "
    "for i in range(0, (event_id % 3 + 1) * (event_id % 4 + 2))]) AS BIGINT) END AS total_bytes "
    "FROM events",
)
def mm_mp4_fragmented(spark, sf_dir):
    """FRAGMENTED MP4 (fMP4/CMAF — r12 VERDICT #5): sample tables live
    per-fragment in moof/traf/trun (default-base-is-moof, tfdt decode
    times, trex/tfhd default cascade), the layout streaming uploads
    arrive in at crawl scale.  Same mp4_meta operator, same schema —
    the parser resolves classic and fragmented layouts into one
    per-sample table.  Quarantine parity folded in: every 97th file
    loses its last 3 bytes (interrupted stream — the final mdat runs
    short), which must dead-letter, not kill the pass.  Total duration
    comes from mvex/mehd (mvhd is 0 in fragmented files)."""
    from mysql_cdc_spark.functions import multimodal as mm

    return mm.mp4_meta(
        mm.synth_mp4_corpus(spark, sf_dir, corrupt_every=97, fragmented=True),
        on_error="quarantine",
    )


@register(
    "mm_mp4_fragmented_keyframes",
    "SELECT CAST(event_id AS BIGINT) AS media_id, CAST(i AS BIGINT) AS sample_idx, "
    "CAST(i * 40 AS BIGINT) AS dts_ms, "
    "CAST(((event_id + 2*i) % 5 + 3) * ((event_id * 13 + i * 5) % 256) AS BIGINT) AS byte_sum "
    "FROM events, unnest(range(0, (event_id % 3 + 1) * (event_id % 4 + 2), "
    "2 * (event_id % 4 + 2))) AS t(i)",
)
def mm_mp4_fragmented_keyframes(spark, sf_dir):
    """Keyframe sampling THROUGH the fragment path: keyframes are the
    first sample of each fragment (CMAF convention), so step=2 samples
    every 2nd fragment's opening sync sample; byte_sum is the real
    mdat bytes sliced via trun-resolved (offset, size) — byte-exact
    extraction must survive the moof-relative offset arithmetic."""
    from mysql_cdc_spark.functions import multimodal as mm

    return mm.mp4_keyframe_sample(
        mm.synth_mp4_corpus(spark, sf_dir, fragmented=True), step=2
    )
