"""Multimodal binary-column plumbing: decode / resize / feature-extract /
frame-sample.  The codecs are deterministic stubs; what these tests pin is
the PRODUCTION part — schemas, 1:1 and 1:N mapInPandas batch shapes,
binary round-trips, and determinism."""

from __future__ import annotations

import numpy as np
import pytest

from esa_pfa_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def payloads(spark):
    rows = [(1, "a" * 10), (2, "b" * 100), (3, ""), (4, "xyz" * 50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return MM.as_binary_payload(df)


def test_decode_schema_and_values(spark, payloads):
    out = MM.decode_batch(payloads).orderBy("doc_id").collect()
    assert [f.name for f in MM.DECODED_SCHEMA.fields] == ["doc_id", "n_bytes", "width", "height"]
    r = {x.doc_id: x for x in out}
    assert r[2].n_bytes == 100 and r[2].width == 100 % 256 and r[2].height == 700 % 256
    assert r[3].n_bytes == 0


def test_resize_fixed_width_binary_roundtrip(spark, payloads):
    out = MM.resize_batch(payloads, target_bytes=16).orderBy("doc_id").collect()
    for r in out:
        assert isinstance(r.payload, (bytes, bytearray))
        assert len(r.payload) == 16, "resize must produce fixed-size payloads"
        assert r.meta.n_bytes == 16 and r.meta.mime == "fake/resized"
    by_id = {r.doc_id: bytes(r.payload) for r in out}
    assert by_id[1].startswith(b"a" * 10) and by_id[1].endswith(b"\0" * 6)


def test_extract_features_fixed_dim_and_range(spark, payloads):
    out = MM.extract_features_batch(payloads, dim=8).orderBy("doc_id").collect()
    for r in out:
        assert len(r.features) == 8
        assert all(0.0 <= v <= 1.0 for v in r.features)
    empty = [r for r in out if r.doc_id == 3][0]
    assert empty.features == [0.0] * 8


def test_frame_sample_one_to_n(spark, payloads):
    out = MM.frame_sample_batch(payloads, frame_bytes=32, max_frames=4).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r)
    # 10 bytes -> 1 frame; 100 bytes -> 3; empty -> 1; 150 bytes -> 4
    assert {k: len(v) for k, v in per_doc.items()} == {1: 1, 2: 3, 3: 1, 4: 4}
    f0 = sorted(per_doc[2], key=lambda r: r.frame_idx)[0]
    assert bytes(f0.frame) == b"b" * 32


def test_multimodal_determinism(spark, payloads):
    a = sorted(MM.extract_features_batch(payloads).collect(), key=lambda r: r.doc_id)
    b = sorted(MM.extract_features_batch(payloads.repartition(5)).collect(), key=lambda r: r.doc_id)
    for x, y in zip(a, b):
        assert x.doc_id == y.doc_id
        np.testing.assert_array_equal(np.array(x.features), np.array(y.features))


# ---------------------------------------------------------------------------
# Real mini-codec (operators/codecs.py): stdlib PNG/WAV — fixture goldens,
# byte-exact round-trips, and the Spark decode_media_batch swap point.
# ---------------------------------------------------------------------------


def _checker_png(w=6, h=4, ch=3):
    """Deterministic checkerboard fixture."""
    px = bytearray()
    for y in range(h):
        for x in range(w):
            v = 255 if (x + y) % 2 == 0 else 0
            px.extend([v, (x * 40) % 256, (y * 80) % 256, (x * y) % 256][:ch])
    from esa_pfa_spark.operators.codecs import encode_png

    return encode_png(w, h, bytes(px), channels=ch), bytes(px)


def test_png_roundtrip_byte_exact():
    from esa_pfa_spark.operators.codecs import decode_png

    for ch in (1, 2, 3, 4):
        data, px = _checker_png(5, 3, ch)
        m = decode_png(data)
        assert (m["width"], m["height"], m["channels"]) == (5, 3, ch)
        assert m["pixels"] == px


def test_png_all_filter_types_unfilter():
    """Hand-build a PNG whose scanlines use filters 1..4 (Sub/Up/Avg/
    Paeth) and check the decoder recovers the intended raster."""
    import struct
    import zlib

    from esa_pfa_spark.operators.codecs import PNG_SIG, _png_chunk, decode_png

    w, ch = 4, 1
    rows = [bytes([10, 20, 30, 40]), bytes([12, 22, 32, 42]),
            bytes([20, 30, 40, 50]), bytes([25, 35, 45, 55])]

    def filt(ftype, cur, prev):
        out = bytearray([ftype])
        for i, x in enumerate(cur):
            left = cur[i - ch] if i >= ch else 0
            up = prev[i] if prev else 0
            ul = prev[i - ch] if (prev and i >= ch) else 0
            if ftype == 1:
                out.append((x - left) & 0xFF)
            elif ftype == 2:
                out.append((x - up) & 0xFF)
            elif ftype == 3:
                out.append((x - ((left + up) >> 1)) & 0xFF)
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                out.append((x - pred) & 0xFF)
        return bytes(out)

    raw = b"".join(
        filt(f, rows[i], rows[i - 1] if i else None)
        for i, f in enumerate([1, 2, 3, 4])
    )
    ihdr = struct.pack(">IIBBBBB", w, len(rows), 8, 0, 0, 0, 0)
    data = (PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b""))
    assert decode_png(data)["pixels"] == b"".join(rows)


def test_wav_roundtrip_golden():
    from esa_pfa_spark.operators.codecs import decode_wav, encode_wav

    samples = bytes(range(200))  # 100 16-bit mono frames
    data = encode_wav(samples, sample_rate=8000, channels=1, bits=16)
    m = decode_wav(data)
    assert m == {
        "channels": 1, "sample_rate": 8000, "bits_per_sample": 16,
        "n_samples": 100, "duration_s": 100 / 8000,
    }
    stereo = encode_wav(bytes(range(160)), sample_rate=16000, channels=2, bits=16)
    m2 = decode_wav(stereo)
    assert m2["channels"] == 2 and m2["n_samples"] == 40


def test_codec_rejects_garbage_and_truncation():
    import pytest as _pytest

    from esa_pfa_spark.operators.codecs import (
        UnsupportedMediaError, decode_png, decode_wav,
    )

    with _pytest.raises(UnsupportedMediaError):
        decode_png(b"not a png at all")
    data, _ = _checker_png()
    with _pytest.raises(UnsupportedMediaError):
        decode_png(data[:-20])  # truncated mid-IDAT (body/CRC cut short)
    with _pytest.raises(UnsupportedMediaError):
        decode_wav(b"RIFFxxxxJUNK")


def test_wav_rejects_truncated_chunk():
    """A cut-short data chunk must raise (mirroring PNG), not silently
    under-report n_samples/duration_s from the shortened body slice."""
    import pytest as _pytest

    from esa_pfa_spark.operators.codecs import (
        UnsupportedMediaError, decode_wav, encode_wav,
    )

    samples = bytes(range(200)) * 2
    data = encode_wav(samples, sample_rate=8000, channels=1, bits=16)
    with _pytest.raises(UnsupportedMediaError, match="truncated"):
        decode_wav(data[:-37])  # data chunk body cut short
    # corrupt declared length (clen beyond the buffer) also raises
    import struct as _struct
    idx = data.index(b"data")
    bad = data[: idx + 4] + _struct.pack("<I", 1 << 30) + data[idx + 8:]
    with _pytest.raises(UnsupportedMediaError, match="truncated"):
        decode_wav(bad)


def test_decode_media_batch_spark_swap_point(spark):
    """The real codec through the SAME mapInPandas plumbing: mixed
    PNG/WAV/corrupt rows in one DataFrame; per-row ok/err, no task
    failure."""
    from esa_pfa_spark.operators.codecs import encode_wav
    from esa_pfa_spark.operators.multimodal import decode_media_batch

    png, _ = _checker_png(6, 4, 3)
    wav = encode_wav(bytes(range(200)), sample_rate=8000)
    rows = [
        (1, bytearray(png), "image/png"),
        (2, bytearray(wav), "audio/wav"),
        (3, bytearray(b"\x00corrupt"), "image/png"),
        (4, bytearray(png), "video/mp4"),  # no codec for mime
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary, mime string")
    got = {r["doc_id"]: r.asDict() for r in decode_media_batch(df).collect()}
    assert got[1]["ok"] and (got[1]["width"], got[1]["height"]) == (6, 4)
    assert got[2]["ok"] and got[2]["sample_rate"] == 8000 and got[2]["n_samples"] == 100
    assert not got[3]["ok"] and got[3]["err"]
    assert not got[4]["ok"] and "no codec" in got[4]["err"]


def test_png_unfilter_random_parity_vs_scalar():
    """Randomized parity: the vectorized unfilter must equal the scalar
    per-byte reference loop for every filter type, size, and channel
    count (incl. width 1, where left/upper-left predictors are zero)."""
    import struct
    import zlib

    import numpy as np

    from esa_pfa_spark.operators.codecs import (
        PNG_SIG, _paeth, _png_chunk, decode_png,
    )

    def scalar_unfilter(raw, width, height, ch):
        stride = width * ch
        out = bytearray(height * stride)
        prev = bytes(stride)
        for y in range(height):
            ftype = raw[y * (stride + 1)]
            line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
            if ftype == 1:
                for i in range(ch, stride):
                    line[i] = (line[i] + line[i - ch]) & 0xFF
            elif ftype == 2:
                for i in range(stride):
                    line[i] = (line[i] + prev[i]) & 0xFF
            elif ftype == 3:
                for i in range(stride):
                    left = line[i - ch] if i >= ch else 0
                    line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
            elif ftype == 4:
                for i in range(stride):
                    left = line[i - ch] if i >= ch else 0
                    ul = prev[i - ch] if i >= ch else 0
                    line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
            out[y * stride:(y + 1) * stride] = line
            prev = bytes(line)
        return bytes(out)

    rng = np.random.default_rng(7)
    color_of = {1: 0, 2: 4, 3: 2, 4: 6}
    for width, height, ch in [(1, 6, 1), (5, 5, 3), (9, 4, 4), (2, 7, 2), (17, 3, 1)]:
        stride = width * ch
        raw = bytearray()
        for y in range(height):
            raw.append(int(rng.integers(0, 5)))  # filter type 0..4
            raw.extend(rng.integers(0, 256, stride, dtype=np.uint8).tobytes())
        raw = bytes(raw)
        ihdr = struct.pack(">IIBBBBB", width, height, 8, color_of[ch], 0, 0, 0)
        data = (
            PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b"")
        )
        got = decode_png(data)["pixels"]
        want = scalar_unfilter(raw, width, height, ch)
        assert got == want, f"({width}x{height}x{ch})"
