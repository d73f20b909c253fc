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
