"""Minimal pure-Python media codecs: PNG (8-bit gray/RGB/RGBA) and
WAV (16-bit PCM).  Stdlib only (struct + zlib) — written against the
PUBLIC format specifications (PNG: RFC 2083 / W3C PNG spec; WAV:
RIFF/WAVE PCM layout), so multimodal feature extraction can run on
REAL bytes in this container without PIL/torchaudio.

Scope: what a feature-extraction pipeline needs — full chunk walking
with CRC verification, all five PNG scanline filters on decode
(encode emits filter 0), single-IDAT or multi-IDAT streams, PCM16
mono/stereo WAV.  Interlaced PNG and non-PCM WAV are out of scope and
raise cleanly.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_COLOR_TYPE_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA
_CHANNELS_COLOR_TYPE = {1: 0, 3: 2, 4: 6}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """8-bit PNG from raw row-major samples (len = w*h*channels)."""
    if channels not in _CHANNELS_COLOR_TYPE:
        raise ValueError(f"unsupported channel count {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, _CHANNELS_COLOR_TYPE[channels], 0, 0, 0
    )
    stride = width * channels
    raw = b"".join(
        b"\x00" + pixels[y * stride:(y + 1) * stride] for y in range(height)
    )
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """→ (width, height, channels, raw row-major samples).  Verifies
    the signature and every chunk CRC; applies scanline filters
    0 (none), 1 (sub), 2 (up), 3 (average), 4 (paeth)."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = channels = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r}: CRC mismatch")
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color_type not in _COLOR_TYPE_CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
            channels = _COLOR_TYPE_CHANNELS[color_type]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG data length mismatch")
    # NumPy row-at-a-time reconstruction (r9 VERDICT #6: the per-byte
    # Python loop dominated decode cost).  Filters 0/1/2 vectorize
    # exactly: sub is a per-channel-lane cumulative sum mod 256, up is
    # one array add.  Average and paeth keep the scalar loop — each
    # byte depends NONLINEARLY (floor-div / argmin) on the
    # just-reconstructed left neighbour, so no prefix-scan applies —
    # and encoders virtually never emit them for synthetic content.
    import numpy as np

    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        f = int(arr[y, 0])
        rowa = arr[y, 1:].astype(np.int64)
        if f == 0:
            cur = rowa
        elif f == 1:    # sub: recon[i] = raw[i] + recon[i-ch] ≡ lane cumsum
            cur = (
                rowa.reshape(width, channels).cumsum(axis=0).reshape(stride)
                & 0xFF
            )
        elif f == 2:    # up
            cur = (rowa + prev) & 0xFF
        elif f in (3, 4):
            # Pure-Python-int loop: bytearray indexing yields ints and
            # prev is materialized via tolist(), so every operand is a
            # Python int — immune to NumPy 2 (NEP 50) value-based
            # promotion changes (np.uint8 + int would stay uint8 and
            # wrap mod 256), and faster than per-element np-scalar
            # indexing.  No closed-form scan exists for these filters:
            # each byte depends nonlinearly (floor-div / argmin) on the
            # just-reconstructed left neighbour.
            row = bytearray(arr[y, 1:].tobytes())
            pv = prev.tolist()
            if f == 3:  # average
                for i in range(stride):
                    a = row[i - channels] if i >= channels else 0
                    row[i] = (row[i] + (a + pv[i]) // 2) & 0xFF
            else:       # paeth
                for i in range(stride):
                    a = row[i - channels] if i >= channels else 0
                    c = pv[i - channels] if i >= channels else 0
                    row[i] = (row[i] + _paeth(a, pv[i], c)) & 0xFF
            cur = np.frombuffer(bytes(row), dtype=np.uint8).astype(np.int64)
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur & 0xFF
    return width, height, channels, out.tobytes()


# --- WAV (RIFF / PCM16) ------------------------------------------------------

def encode_wav(samples: list[int], rate: int = 8000, channels: int = 1) -> bytes:
    """16-bit PCM WAV from interleaved samples (-32768..32767)."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """→ (rate, channels, interleaved 16-bit samples)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = channels = None
    samples: list[int] = []
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_format, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if audio_format != 1 or bits != 16:
                raise ValueError("only 16-bit PCM WAV supported")
        elif tag == b"data":
            samples = list(struct.unpack(f"<{len(body) // 2}h", body[:len(body) & ~1]))
    if rate is None:
        raise ValueError("WAV missing fmt chunk")
    return rate, channels, samples


# ---------------------------------------------------------------------------
# AVI (RIFF) — uncompressed 24-bit DIB frames
# ---------------------------------------------------------------------------
# Written against the public RIFF/AVI container layout (Microsoft
# 'AVI RIFF File Reference'): RIFF('AVI ') → LIST('hdrl') with the
# 'avih' main header and one LIST('strl') video stream (strh/strf
# BITMAPINFOHEADER), then LIST('movi') holding one '00db'
# (uncompressed DIB) chunk per frame.  Enough of the real container
# for any standards-following demuxer to open; no compression.

import struct as _struct


def _riff_chunk(tag: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return tag + _struct.pack("<I", len(data)) + data + pad


def _riff_list(list_type: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", list_type + body)


def encode_avi(width: int, height: int, frames: list[bytes], fps: int = 10) -> bytes:
    """Encode raw 24-bit BGR frames (w*h*3 bytes each, rows 4-byte
    aligned — keep width*3 % 4 == 0) as an uncompressed AVI."""
    frame_size = width * height * 3
    for f in frames:
        if len(f) != frame_size:
            raise ValueError(f"frame must be exactly {frame_size} bytes")
    avih = _struct.pack(
        "<10I",
        1_000_000 // fps,          # dwMicroSecPerFrame
        frame_size * fps,          # dwMaxBytesPerSec
        0,                         # dwPaddingGranularity
        0x10,                      # dwFlags: AVIF_HASINDEX off, interleaved off; 0x10=TRUSTCKTYPE
        len(frames),               # dwTotalFrames
        0,                         # dwInitialFrames
        1,                         # dwStreams
        frame_size,                # dwSuggestedBufferSize
        width,
        height,
    ) + b"\x00" * 16               # dwReserved[4]
    strh = (
        b"vids" + b"DIB "
        + _struct.pack("<10I", 0, 0, 0, 1, fps, 0, len(frames), frame_size, 0xFFFFFFFF, 0)
        + _struct.pack("<4H", 0, 0, width, height)
    )
    strf = _struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, frame_size, 0, 0, 0, 0
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi = _riff_list(b"movi", b"".join(_riff_chunk(b"00db", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + _struct.pack("<I", len(body)) + body


def decode_avi(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """Parse the RIFF structure back: (width, height, n_frames,
    frames).  Validates the RIFF/AVI signature, walks the chunk tree,
    reads dimensions from 'avih', and collects '00db'/'00dc' frame
    chunks from LIST('movi')."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF) payload")
    declared = _struct.unpack("<I", data[4:8])[0]
    if declared + 8 > len(data):
        raise ValueError("truncated AVI payload")
    width = height = total = None
    frames: list[bytes] = []

    def walk(buf: bytes, off: int, end: int) -> None:
        nonlocal width, height, total
        while off + 8 <= end:
            tag = buf[off : off + 4]
            size = _struct.unpack("<I", buf[off + 4 : off + 8])[0]
            payload_end = off + 8 + size
            if payload_end > end:
                raise ValueError("corrupt AVI chunk size")
            if tag == b"LIST":
                walk(buf, off + 12, payload_end)
            elif tag == b"avih":
                fields = _struct.unpack("<10I", buf[off + 8 : off + 48])
                total, width, height = fields[4], fields[8], fields[9]
            elif tag in (b"00db", b"00dc"):
                frames.append(buf[off + 8 : payload_end])
            off = payload_end + (size % 2)

    walk(data, 12, 8 + declared)
    if width is None or height is None:
        raise ValueError("AVI missing avih header")
    if total is not None and total != len(frames):
        raise ValueError(f"AVI declares {total} frames, found {len(frames)}")
    return width, height, len(frames), frames
