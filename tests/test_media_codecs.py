"""Pure-Python PNG/WAV codec tests: round-trips, all five PNG scanline
filters, CRC verification, and the real-decode multimodal path."""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mysql_cdc_spark.functions.media_codecs import (
    PNG_SIG,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)


def test_png_roundtrip_rgb():
    pixels = bytes(range(8 * 4 * 3))  # 8x4 RGB gradient
    data = encode_png(8, 4, pixels)
    assert data[:8] == PNG_SIG
    assert decode_png(data) == (8, 4, 3, pixels)


def test_png_roundtrip_gray_and_rgba():
    g = bytes((x * 7) % 256 for x in range(5 * 3))
    assert decode_png(encode_png(5, 3, g, channels=1)) == (5, 3, 1, g)
    a = bytes((x * 11) % 256 for x in range(4 * 2 * 4))
    assert decode_png(encode_png(4, 2, a, channels=4)) == (4, 2, 4, a)


def test_png_crc_detected():
    data = bytearray(encode_png(2, 2, bytes(12)))
    data[-5] ^= 0xFF  # corrupt inside IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def _manual_png(width, height, channels, filtered_rows):
    """Build a PNG whose IDAT uses explicit per-row filter types."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, {1: 0, 3: 2, 4: 6}[channels], 0, 0, 0)

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
        )

    raw = b"".join(bytes([f]) + bytes(r) for f, r in filtered_rows)
    return PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def test_png_all_filter_types_decode():
    """Filters 1-4 (sub/up/average/paeth) reconstruct the reference
    scanlines exactly — checked against hand-computed expectations on a
    4x5 grayscale image."""
    # target image rows (grayscale, stride 4)
    rows = [
        [10, 20, 30, 40],
        [15, 25, 35, 45],
        [100, 110, 120, 130],
        [90, 95, 105, 115],
        [1, 2, 3, 4],
    ]
    # encode each row with a different filter type manually
    def sub(r):
        return [r[0]] + [(r[i] - r[i - 1]) & 0xFF for i in range(1, 4)]

    def up(r, p):
        return [(r[i] - p[i]) & 0xFF for i in range(4)]

    def avg(r, p):
        out = []
        for i in range(4):
            a = r[i - 1] if i else 0
            out.append((r[i] - (a + p[i]) // 2) & 0xFF)
        return out

    def paeth(r, p):
        def pred(a, b, c):
            q = a + b - c
            qa, qb, qc = abs(q - a), abs(q - b), abs(q - c)
            if qa <= qb and qa <= qc:
                return a
            return b if qb <= qc else c

        out = []
        for i in range(4):
            a = r[i - 1] if i else 0
            c = p[i - 1] if i else 0
            out.append((r[i] - pred(a, p[i], c)) & 0xFF)
        return out

    filtered = [
        (0, rows[0]),
        (1, sub(rows[1])),
        (2, up(rows[2], rows[1])),
        (3, avg(rows[3], rows[2])),
        (4, paeth(rows[4], rows[3])),
    ]
    data = _manual_png(4, 5, 1, filtered)
    w, h, ch, pixels = decode_png(data)
    assert (w, h, ch) == (4, 5, 1)
    assert list(pixels) == [v for r in rows for v in r]


def test_png_avg_paeth_random_rgb_round_trip():
    """Randomized RGB image with EVERY row filter 3 or 4, values chosen
    so a + up routinely exceeds 255 — pins the decode arithmetic as
    pure-Python-int (NEP-50-proof: under NumPy>=2, np.uint8 + int stays
    uint8 and would wrap here) and the reconstruction bit-identical."""
    import numpy as np

    rng = np.random.default_rng(1234)
    w, h, ch = 32, 24, 3
    stride = w * ch
    # bias high so left+up > 255 is common
    target = rng.integers(100, 256, (h, stride)).tolist()

    def pred4(a, b, c):
        q = a + b - c
        qa, qb, qc = abs(q - a), abs(q - b), abs(q - c)
        if qa <= qb and qa <= qc:
            return a
        return b if qb <= qc else c

    filtered = []
    prev = [0] * stride
    for y in range(h):
        f = 3 if y % 2 == 0 else 4
        cur = target[y]
        enc = []
        for i in range(stride):
            a = cur[i - ch] if i >= ch else 0
            c = prev[i - ch] if i >= ch else 0
            p = (a + prev[i]) // 2 if f == 3 else pred4(a, prev[i], c)
            enc.append((cur[i] - p) & 0xFF)
        filtered.append((f, enc))
        prev = cur
    data = _manual_png(w, h, ch, filtered)
    dw, dh, dch, pixels = decode_png(data)
    assert (dw, dh, dch) == (w, h, ch)
    assert list(pixels) == [v for r in target for v in r]


@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    ch=st.sampled_from([1, 3, 4]),
    data=st.data(),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(w, h, ch, data):
    pixels = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h * ch, max_size=w * h * ch))
    )
    assert decode_png(encode_png(w, h, pixels, channels=ch)) == (w, h, ch, pixels)


def test_wav_roundtrip():
    samples = [0, 1, -1, 32767, -32768, 1234, -4321]
    rate, ch, got = decode_wav(encode_wav(samples, rate=16000))
    assert (rate, ch, got) == (16000, 1, samples)


@given(st.lists(st.integers(-32768, 32767), min_size=0, max_size=200))
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_property(samples):
    rate, ch, got = decode_wav(encode_wav(samples))
    assert got == samples and rate == 8000 and ch == 1


def test_wav_rejects_non_pcm():
    data = bytearray(encode_wav([1, 2, 3]))
    # audio_format field lives at RIFF(12) + 'fmt '(4) + len(4) = offset 20
    struct.pack_into("<H", data, 20, 3)  # IEEE float
    with pytest.raises(ValueError, match="PCM"):
        decode_wav(bytes(data))


def test_decode_media_dispatch():
    from mysql_cdc_spark.functions.multimodal import decode_media

    from mysql_cdc_spark.functions.media_codecs import encode_avi

    png = encode_png(2, 2, bytes(12))
    assert decode_media(png, "image")[:2] == (2, 2)
    wav = encode_wav([5, -5])
    assert decode_media(wav, "audio") == (8000, 1, [5, -5])
    avi = encode_avi(4, 4, [bytes(48)])
    assert decode_media(avi, "video")[:3] == (4, 4, 1)
    with pytest.raises(ValueError):
        decode_media(b"whatever", "unknown-kind")


# ---------------------------------------------------------------------------
# AVI (RIFF) container
# ---------------------------------------------------------------------------


def test_avi_round_trip_multi_frame():
    from mysql_cdc_spark.functions.media_codecs import decode_avi, encode_avi

    frames = [bytes([(i * 7 + j) % 256 for j in range(4 * 4 * 3)]) for i in range(6)]
    data = encode_avi(4, 4, frames, fps=24)
    w, h, n, out = decode_avi(data)
    assert (w, h, n) == (4, 4, 6)
    assert out == frames


def test_avi_rejects_non_riff_and_truncation():
    import pytest

    from mysql_cdc_spark.functions.media_codecs import decode_avi, encode_avi

    with pytest.raises(ValueError):
        decode_avi(b"not an avi at all")
    good = encode_avi(4, 4, [b"\x00" * 48])
    with pytest.raises(ValueError):
        decode_avi(good[: len(good) - 10])  # declared RIFF size overruns


def test_avi_frame_size_enforced():
    import pytest

    from mysql_cdc_spark.functions.media_codecs import encode_avi

    with pytest.raises(ValueError):
        encode_avi(4, 4, [b"\x00" * 47])


def test_avi_odd_frame_padding():
    # odd-sized chunks get a RIFF pad byte; decode must skip it
    from mysql_cdc_spark.functions.media_codecs import decode_avi, encode_avi

    frames = [bytes([i] * 9) for i in range(3)]  # 1x3 RGB = 9 bytes (odd)
    w, h, n, out = decode_avi(encode_avi(3, 1, frames))
    assert (w, h, n) == (3, 1, 3) and out == frames
