"""Pure-stdlib mini-codecs: PNG (8-bit, non-interlaced) and WAV (PCM).

The multimodal plumbing (multimodal.py) was shipped with a documented
codec stub because this environment has no PIL/ffmpeg.  These parsers
replace the stub's swap point with REAL format decoding built only on
``struct`` + ``zlib`` (+ numpy for the vectorized scanline unfilter):

 * PNG: signature + chunk walk, IHDR metadata, and a full IDAT decode
   (zlib inflate + per-scanline unfilter, filters 0-4 incl. Paeth) for
   8-bit gray/gray+alpha/RGB/RGBA non-interlaced images — the subset a
   deterministic pipeline fixture needs.  Unsupported shapes raise
   ``UnsupportedMediaError`` (the NotImplementedError contract the stub
   documented).
 * WAV: RIFF chunk walk, fmt/data parsing for integer PCM — channels,
   sample rate, bit depth, sample count, duration.

Matching ENCODERS (filter-0 PNG, PCM WAV) exist so tests can build real
fixture bytes with zero external dependencies and prove byte-exact
round-trips.

Reference analog: the quicklook/raster decode path the reference gets
from JAI (AlgalBloomFeatureWriter.java:216-229) — re-expressed as a
library-free parser so the Spark-side mapInPandas plumbing exercises a
genuine decode, not a fake.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color_type -> samples/pixel


class UnsupportedMediaError(Exception):
    """Raised for media this mini-codec does not cover (the production
    codec's NotImplementedError contract)."""


# --------------------------------------------------------------- PNG --

def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> dict:
    """Parse + fully decode a PNG.  Returns ``{width, height, channels,
    bit_depth, pixels}`` with ``pixels`` the unfiltered raw bytes
    (row-major, ``width*channels`` per row)."""
    if data[:8] != PNG_SIG:
        raise UnsupportedMediaError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        if pos + 12 + length > len(data):
            raise UnsupportedMediaError("truncated PNG chunk")
        body = data[pos + 8:pos + 8 + length]
        expect_crc = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != expect_crc:
            raise UnsupportedMediaError(f"bad CRC in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise UnsupportedMediaError("missing IHDR/IDAT")
    width, height, bit_depth, color_type, comp, filt, interlace = ihdr
    if bit_depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise UnsupportedMediaError(
            f"unsupported PNG shape (depth={bit_depth}, interlace={interlace})"
        )
    if color_type not in _PNG_CHANNELS:
        raise UnsupportedMediaError(f"unsupported color type {color_type}")
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise UnsupportedMediaError("IDAT size mismatch")
    # Vectorized unfilter (numpy): rows stay sequential (filters 2-4 read
    # the PREVIOUS decoded row), but within a row:
    #  * Sub is out[i] = raw[i] + out[i-ch] mod 256 — a per-channel prefix
    #    sum, one cumsum per row;
    #  * Up is one full-row uint8 add (wraparound is the filter's mod-256);
    #  * Average/Paeth carry a true left-to-right dependency, so they loop
    #    over pixel COLUMNS with all channels as one int16 vector step
    #    (width iterations of vector math, not width*channels byte ops).
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    ftypes = arr[:, 0]
    if not np.all(ftypes <= 4):
        bad = int(ftypes[ftypes > 4][0])
        raise UnsupportedMediaError(f"unknown PNG filter {bad}")
    lines = arr[:, 1:]
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = int(ftypes[y])
        cur = lines[y]
        if f == 0:    # None
            row = cur.copy()
        elif f == 1:  # Sub: per-channel cumulative sum mod 256
            row = (
                cur.reshape(width, ch).cumsum(axis=0, dtype=np.int64) % 256
            ).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up: full-row add, uint8 wrap == mod 256
            row = cur + prev
        else:         # Average (3) / Paeth (4): columns loop, channel vector
            cv = cur.astype(np.int16).reshape(width, ch)
            pv = prev.astype(np.int16).reshape(width, ch)
            row = np.empty(stride, dtype=np.uint8)
            rw = row.reshape(width, ch)
            left = np.zeros(ch, dtype=np.int16)
            ul = np.zeros(ch, dtype=np.int16)
            for x in range(width):
                up = pv[x]
                if f == 3:
                    pred = (left + up) >> 1
                else:
                    p = left + up - ul
                    pa = np.abs(p - left)
                    pb = np.abs(p - up)
                    pc = np.abs(p - ul)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
                    )
                left = (cv[x] + pred) & 0xFF
                rw[x] = left.astype(np.uint8)
                ul = up
        out[y] = row
        prev = row
    return {
        "width": width,
        "height": height,
        "channels": ch,
        "bit_depth": bit_depth,
        "pixels": out.tobytes(),
    }


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """Minimal valid PNG writer (8-bit, filter 0 on every scanline)."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != height * stride:
        raise ValueError("pixels must be height*width*channels bytes")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * stride:(y + 1) * stride] for y in range(height)
    )
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


# --------------------------------------------------------------- WAV --

def decode_wav(data: bytes) -> dict:
    """Parse a RIFF/WAVE integer-PCM file.  Returns ``{channels,
    sample_rate, bits_per_sample, n_samples, duration_s}`` (n_samples is
    per channel)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise UnsupportedMediaError("not a RIFF/WAVE file")
    pos, fmt, data_len = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if pos + 8 + clen > len(data):
            # mirror decode_png's truncated-chunk rejection: a short body
            # would silently under-report n_samples/duration_s
            raise UnsupportedMediaError(
                f"truncated {cid!r} chunk ({clen} declared, "
                f"{len(data) - pos - 8} available)"
            )
        body = data[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            if clen < 16:
                raise UnsupportedMediaError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data_len = len(body)
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data_len is None:
        raise UnsupportedMediaError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _byte_rate, block_align, bits = fmt
    if audio_format != 1:
        raise UnsupportedMediaError(f"non-PCM WAV (format {audio_format})")
    if block_align != channels * bits // 8 or block_align == 0:
        raise UnsupportedMediaError("inconsistent block alignment")
    n_samples = data_len // block_align
    return {
        "channels": channels,
        "sample_rate": sample_rate,
        "bits_per_sample": bits,
        "n_samples": n_samples,
        "duration_s": n_samples / sample_rate,
    }


def encode_wav(
    samples: bytes, sample_rate: int = 16_000, channels: int = 1, bits: int = 16
) -> bytes:
    """Minimal PCM WAV writer (``samples`` = raw little-endian frames)."""
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(samples)) + samples
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ------------------------------------------------- dispatch for Spark --

def decode_media(payload: bytes, mime: str) -> dict:
    """Mime-dispatched decode returning the unified metadata row used by
    ``multimodal.decode_media_batch``: width/height for images,
    sample_rate/n_samples for audio, nulls for the other modality."""
    payload = bytes(payload)
    if mime == "image/png":
        m = decode_png(payload)
        return {
            "width": m["width"], "height": m["height"], "channels": m["channels"],
            "sample_rate": None, "n_samples": None,
        }
    if mime == "audio/wav":
        m = decode_wav(payload)
        return {
            "width": None, "height": None, "channels": m["channels"],
            "sample_rate": m["sample_rate"], "n_samples": m["n_samples"],
        }
    raise UnsupportedMediaError(f"no codec for mime {mime!r}")
