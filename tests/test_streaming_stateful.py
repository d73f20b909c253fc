"""Custom stateful streaming operator (applyInPandasWithState): streaming
forward-fill must (a) run end-to-end over a real stream with state carried
ACROSS micro-batches, and (b) agree with the batch ffill semantics."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from esa_pfa_spark.streaming.stateful import stream_ffill

T0 = dt.datetime(2024, 1, 1)


def _write(spark, path, rows):
    pdf = pd.DataFrame(rows, columns=["k", "ts", "v"])
    spark.createDataFrame(pdf, schema="k string, ts timestamp, v double").write.mode(
        "append"
    ).parquet(str(path))


def _run_stream(spark, src, name, tolerance=None):
    stream = spark.readStream.schema("k string, ts timestamp, v double").parquet(str(src))
    out = stream_ffill(stream, key="k", ts="ts", value="v", tolerance=tolerance)
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}").toPandas()


def test_stream_ffill_carries_last_value(spark, tmp_path):
    src = tmp_path / "in"
    _write(spark, src, [
        ("a", T0, 1.0),
        ("a", T0 + dt.timedelta(minutes=5), None),   # probe: carries 1.0
        ("a", T0 + dt.timedelta(minutes=10), 3.0),
        ("b", T0, None),                              # probe before any obs
    ])
    res = _run_stream(spark, src, "ffill_t1").sort_values(["key", "ts"]).reset_index(drop=True)
    a = res[res.key == "a"]
    assert list(a["last_value"]) == [1.0, 1.0, 3.0]
    b = res[res.key == "b"]
    assert pd.isna(b["last_value"].iloc[0])


def test_stream_ffill_state_survives_microbatches(spark, tmp_path):
    """Two files processed as separate micro-batches (maxFilesPerTrigger=1):
    batch 2's probe must see batch 1's observation from the state store."""
    src = tmp_path / "in2"
    _write(spark, src, [("a", T0, 7.0)])
    _write(spark, src, [("a", T0 + dt.timedelta(minutes=1), None)])
    stream = (
        spark.readStream.schema("k string, ts timestamp, v double")
        .option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    out = stream_ffill(stream, key="k", ts="ts", value="v")
    q = (
        out.writeStream.format("memory").queryName("ffill_t2")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    res = spark.sql("select * from ffill_t2").toPandas().sort_values("ts")
    assert len(res) == 2
    assert list(res["last_value"]) == [7.0, 7.0], (
        "state must carry the observation across micro-batch boundaries"
    )
    assert res["last_ts"].iloc[1] == T0


def test_stream_ffill_tolerance(spark, tmp_path):
    src = tmp_path / "in3"
    _write(spark, src, [
        ("a", T0, 5.0),
        ("a", T0 + dt.timedelta(minutes=30), None),  # within 1h tolerance
        ("a", T0 + dt.timedelta(hours=3), None),     # beyond tolerance -> null
    ])
    res = _run_stream(spark, src, "ffill_t3", tolerance=dt.timedelta(hours=1))
    res = res.sort_values("ts").reset_index(drop=True)
    assert res["last_value"].iloc[1] == 5.0
    assert pd.isna(res["last_value"].iloc[2])


def test_stream_ffill_matches_batch_ffill(spark, tmp_path):
    """Streaming (availableNow over one file) == batch windows.ffill."""
    from esa_pfa_spark.operators.windows import ffill

    rows = []
    for k in ("a", "b"):
        for m in range(8):
            rows.append((k, T0 + dt.timedelta(minutes=3 * m), float(m) if m % 3 == 0 else None))
    src = tmp_path / "in4"
    _write(spark, src, rows)
    got = _run_stream(spark, src, "ffill_t4")[["key", "ts", "last_value"]].rename(columns={"key": "k"})

    batch_df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "ts", "v"]), schema="k string, ts timestamp, v double"
    )
    want = ffill(batch_df, ["v"], key="k", ts="ts").toPandas().rename(columns={"v": "last_value"})
    g = got.sort_values(["k", "ts"]).reset_index(drop=True)
    w = want[["k", "ts", "last_value"]].sort_values(["k", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w)


def test_stream_ffill_late_row_not_filled_from_future(spark, tmp_path):
    """A late row (allowed by the watermark) whose ts PRECEDES the state's
    last observation must not be filled with that FUTURE value — backward
    as-of means 'last value at or before ts'.  State keeps only the newest
    observation, so the honest answer is null (state-limited approximation,
    documented in the module docstring)."""
    src = tmp_path / "in5"
    _write(spark, src, [("a", T0 + dt.timedelta(minutes=10), 9.0)])
    _write(spark, src, [("a", T0 + dt.timedelta(minutes=5), None)])  # late probe
    stream = (
        spark.readStream.schema("k string, ts timestamp, v double")
        .option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    out = stream_ffill(stream, key="k", ts="ts", value="v")
    q = (
        out.writeStream.format("memory").queryName("ffill_t5")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    res = spark.sql("select * from ffill_t5").toPandas().sort_values("ts").reset_index(drop=True)
    assert len(res) == 2
    assert pd.isna(res["last_value"].iloc[0]), (
        "late probe must NOT see the future observation as its 'last' value"
    )
    assert res["last_value"].iloc[1] == 9.0


def test_stream_ffill_tolerance_evicts_state(spark, tmp_path):
    """With a tolerance, EventTimeTimeout must still produce the same
    answers (eviction only ever removes state that can no longer satisfy
    the tolerance for non-late rows)."""
    src = tmp_path / "in6"
    _write(spark, src, [("a", T0, 5.0)])
    # watermark after batch1 = T0 - 1h; timeout target = T0 + 10min
    _write(spark, src, [("a", T0 + dt.timedelta(hours=3), None)])
    stream = (
        spark.readStream.schema("k string, ts timestamp, v double")
        .option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    out = stream_ffill(stream, key="k", ts="ts", value="v", tolerance=dt.timedelta(minutes=10))
    q = (
        out.writeStream.format("memory").queryName("ffill_t6")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    res = spark.sql("select * from ffill_t6").toPandas().sort_values("ts").reset_index(drop=True)
    assert res["last_value"].iloc[0] == 5.0
    assert pd.isna(res["last_value"].iloc[1]), "out-of-tolerance probe must be null"


def test_stream_exact_dedup_across_microbatches(spark, tmp_path):
    """Duplicate content arriving in a LATER micro-batch is dropped (digest
    state persists across batches within the watermark)."""
    from esa_pfa_spark.streaming.dedup import stream_exact_dedup

    src = tmp_path / "dd"
    pd.DataFrame(
        {"doc_id": ["a"], "text": ["same text"], "ts": [T0]}
    ).pipe(lambda p: spark.createDataFrame(p, schema="doc_id string, text string, ts timestamp")
           .write.mode("append").parquet(str(src)))
    pd.DataFrame(
        {"doc_id": ["b", "c"], "text": ["same text", "other text"],
         "ts": [T0 + dt.timedelta(minutes=1), T0 + dt.timedelta(minutes=2)]}
    ).pipe(lambda p: spark.createDataFrame(p, schema="doc_id string, text string, ts timestamp")
           .write.mode("append").parquet(str(src)))
    stream = (
        spark.readStream.schema("doc_id string, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    out = stream_exact_dedup(stream)
    q = (
        out.writeStream.format("memory").queryName("dd1")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    res = spark.sql("select * from dd1").toPandas().sort_values("doc_id")
    assert set(res["doc_id"]) == {"a", "c"}, (
        "duplicate 'b' must be dropped by digest state across micro-batches"
    )


def test_stream_decontaminate_filters_eval_overlap(spark, tmp_path):
    """Map-only streaming decontamination: a doc sharing a 4-gram with the
    static eval corpus is dropped from the stream; flagged mode inverts.
    Batch parity: the same filter on a static frame agrees with
    tokens.decontaminate's contaminated flags."""
    from esa_pfa_spark.operators.tokens import decontaminate
    from esa_pfa_spark.streaming.dedup import stream_decontaminate

    ev = spark.createDataFrame(
        [("e1", [1, 2, 3, 4, 5])], "doc_id string, tokens array<int>"
    )
    rows = [
        ("dirty", [9, 1, 2, 3, 4, 9]),   # contains eval 4-gram [1,2,3,4]
        ("clean", [6, 7, 8, 9, 6, 7]),
        ("short", [1, 2, 3]),            # < n -> passes
    ]
    src = tmp_path / "decon"
    spark.createDataFrame(rows, "doc_id string, tokens array<int>") \
        .write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema("doc_id string, tokens array<int>")
        .option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    out = stream_decontaminate(stream, ev, n=4)
    q = (
        out.writeStream.format("memory").queryName("decon1")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    res = spark.sql("select doc_id from decon1").toPandas()
    assert set(res["doc_id"]) == {"clean", "short"}

    # batch parity on the same (static) frame vs the batch operator
    static = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    stream_clean = set(
        r["doc_id"] for r in stream_decontaminate(static, ev, n=4).collect()
    )
    batch_flagged = {
        r["doc_id"]
        for r in decontaminate(static, ev, n=4).filter("contaminated").collect()
    }
    assert stream_clean == {r[0] for r in rows} - batch_flagged
    flagged = {
        r["doc_id"] for r in stream_decontaminate(static, ev, n=4, keep="flagged").collect()
    }
    assert flagged == batch_flagged == {"dirty"}
