"""Streaming point-in-time lookup (foreachBatch + batch as-of): must
(a) match the batch operator exactly on the same probes, (b) keep the
leakage invariant per micro-batch, and (c) also serve token-payload
chunking statelessly on a stream (map-only ops run unchanged)."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from esa_pfa_spark.operators.asof import asof_join
from esa_pfa_spark.streaming.asof import stream_asof_features

T0 = dt.datetime(2024, 1, 1)


def _obs(spark):
    rows = [
        ("a", T0, 1.0),
        ("a", T0 + dt.timedelta(hours=2), 2.0),
        ("b", T0 + dt.timedelta(hours=1), 10.0),
    ]
    return spark.createDataFrame(rows, "entity_id string, ts timestamp, v double")


def _probes(n_files, base=T0):
    files = []
    for i in range(n_files):
        files.append(
            [
                ("a", base + dt.timedelta(hours=i, minutes=30)),
                ("b", base + dt.timedelta(hours=i, minutes=45)),
            ]
        )
    return files


def test_stream_asof_matches_batch(spark, tmp_path):
    src, sink, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    obs = _obs(spark)
    batches = _probes(3)
    for rows in batches:
        spark.createDataFrame(
            rows, "entity_id string, query_ts timestamp"
        ).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema("entity_id string, query_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = stream_asof_features(
        stream, obs, str(sink), str(ckpt), tolerance=dt.timedelta(hours=3)
    )
    q.awaitTermination(120)

    got = (
        spark.read.parquet(str(sink))
        .toPandas()
        .sort_values(["entity_id", "query_ts"])
        .reset_index(drop=True)
    )
    all_probes = spark.createDataFrame(
        [r for rows in batches for r in rows], "entity_id string, query_ts timestamp"
    )
    want = (
        asof_join(all_probes, _obs(spark), tolerance=dt.timedelta(hours=3))
        .toPandas()
        .sort_values(["entity_id", "query_ts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
    # zero temporal leakage on the streamed output
    m = got.dropna(subset=["matched_ts"])
    assert (m["matched_ts"] <= m["query_ts"]).all()


def test_stream_asof_resumes_from_checkpoint(spark, tmp_path):
    """Second start with the same checkpoint only processes NEW files —
    no duplicate rows in the sink."""
    src, sink, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    obs = _obs(spark)
    spark.createDataFrame(
        _probes(1)[0], "entity_id string, query_ts timestamp"
    ).write.mode("append").parquet(str(src))
    q = stream_asof_features(stream_src(spark, src), obs, str(sink), str(ckpt))
    q.awaitTermination(120)
    assert spark.read.parquet(str(sink)).count() == 2

    spark.createDataFrame(
        _probes(2)[1], "entity_id string, query_ts timestamp"
    ).write.mode("append").parquet(str(src))
    q2 = stream_asof_features(stream_src(spark, src), obs, str(sink), str(ckpt))
    q2.awaitTermination(120)
    out = spark.read.parquet(str(sink)).toPandas()
    assert len(out) == 4
    assert not out.duplicated(subset=["entity_id", "query_ts"]).any()


def test_stream_asof_replayed_batch_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running the SAME (batch_df,
    batch_id) — as Spark does after a failure mid-batch — must not
    duplicate sink rows (each batch overwrites its own batch_id=<id>
    directory)."""
    from esa_pfa_spark.streaming.asof import batch_enricher

    sink = tmp_path / "out"
    enrich = batch_enricher(
        _obs(spark), str(sink), tolerance=dt.timedelta(hours=3)
    )
    probes = spark.createDataFrame(
        _probes(1)[0], "entity_id string, query_ts timestamp"
    )
    enrich(probes, 0)
    once = (
        spark.read.parquet(str(sink))
        .toPandas()
        .sort_values(["entity_id", "query_ts"])
        .reset_index(drop=True)
    )
    enrich(probes, 0)  # replay of batch 0
    enrich(
        spark.createDataFrame(
            _probes(2)[1], "entity_id string, query_ts timestamp"
        ),
        1,
    )
    out = (
        spark.read.parquet(str(sink))
        .toPandas()
        .sort_values(["entity_id", "query_ts"])
        .reset_index(drop=True)
    )
    assert len(out) == 4
    assert not out.duplicated(subset=["entity_id", "query_ts"]).any()
    replayed = (
        out[out["batch_id"] == 0]
        .drop(columns=["batch_id"])
        .sort_values(["entity_id", "query_ts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(replayed, once.drop(columns=["batch_id"]))


def stream_src(spark, src):
    return (
        spark.readStream.schema("entity_id string, query_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )


def test_stream_chunk_tokens_stateless(spark, tmp_path):
    """Token chunking is map-only, so the SAME operator code runs on a
    stream unchanged — batch/stream parity on identical input."""
    from esa_pfa_spark.operators.tokens import chunk_tokens

    src = tmp_path / "docs"
    rows = [("d1", list(range(10))), ("d2", list(range(5)))]
    spark.createDataFrame(rows, "doc_id string, tokens array<int>").write.parquet(
        str(src)
    )
    stream = spark.readStream.schema("doc_id string, tokens array<int>").parquet(
        str(src)
    )
    out = chunk_tokens(stream, max_len=4, stride=3)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("chunks_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("select * from chunks_stream").collect())
    )
    want = sorted(
        map(
            tuple,
            chunk_tokens(
                spark.read.parquet(str(src)), max_len=4, stride=3
            ).collect(),
        )
    )
    assert got == want and len(got) > 0


def test_stream_bitemporal_matches_batch(spark, tmp_path):
    """Streamed bitemporal enrichment == the batch operator on the union of
    probes, and every served value respects BOTH temporal dimensions."""
    from esa_pfa_spark.operators.asof import asof_join_bitemporal
    from esa_pfa_spark.streaming.asof import stream_bitemporal_features

    src, sink, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    # versioned observations: the T0 event is restated at +6h (v 99)
    obs = spark.createDataFrame(
        [
            ("a", T0, T0 + dt.timedelta(hours=1), 1.0),
            ("a", T0, T0 + dt.timedelta(hours=6), 99.0),
            ("a", T0 + dt.timedelta(hours=4), T0 + dt.timedelta(hours=5), 2.0),
            ("b", T0 + dt.timedelta(hours=1), T0 + dt.timedelta(hours=1), 10.0),
        ],
        "entity_id string, ts timestamp, knowledge_ts timestamp, v double",
    )
    batches = _probes(3, base=T0 + dt.timedelta(hours=1))
    for rows in batches:
        spark.createDataFrame(
            rows, "entity_id string, query_ts timestamp"
        ).write.mode("append").parquet(str(src))
    stream = (
        spark.readStream.schema("entity_id string, query_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = stream_bitemporal_features(
        stream, obs, str(sink), str(ckpt), tolerance=dt.timedelta(hours=12)
    )
    q.awaitTermination(120)
    got = (
        spark.read.parquet(str(sink))
        .toPandas()
        .sort_values(["entity_id", "query_ts"])
        .reset_index(drop=True)
    )
    all_probes = spark.createDataFrame(
        [r for rows in batches for r in rows], "entity_id string, query_ts timestamp"
    )
    want = (
        asof_join_bitemporal(all_probes, obs, tolerance=dt.timedelta(hours=12))
        .toPandas()
        .sort_values(["entity_id", "query_ts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
    m = got.dropna(subset=["matched_ts"])
    assert (m["matched_ts"] <= m["query_ts"]).all()
    assert (m["matched_knowledge_ts"] <= m["query_ts"]).all()  # no restatement leak
    # the probe at +1:30 must see v=1.0 (original), not the later 99 restatement
    early = got[(got["entity_id"] == "a")].iloc[0]
    assert early["v"] == 1.0
