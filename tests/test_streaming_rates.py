"""Tumbling-window rate monitor: the streaming form (watermark + append
mode) must emit exactly the batch form's rows once all windows close."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from esa_pfa_spark.streaming.rates import stream_tumbling_rate, tumbling_rate

T0 = dt.datetime(2024, 1, 1)


def _rows():
    out = []
    for i in range(40):
        out.append(("click", T0 + dt.timedelta(minutes=i), float(i)))
    for i in range(10):
        out.append(("buy", T0 + dt.timedelta(minutes=3 * i), 10.0 + i))
    return out


def _df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["event_type", "ts", "value"])
    return spark.createDataFrame(
        pdf, schema="event_type string, ts timestamp, value double"
    )


def _write_one_file(df, path):
    # ONE part-file per write: with maxFilesPerTrigger=1 each write is one
    # micro-batch — multiple part-files would replay in arbitrary order,
    # letting a later part advance the watermark past an earlier one's
    # windows (exactly the disorder the watermark is allowed to drop)
    df.coalesce(1).write.mode("append").parquet(str(path))


def _canon(pdf):
    return (
        pdf.sort_values(["event_type", "w_start"])
        .reset_index(drop=True)
        .sort_index(axis=1)
    )


def test_stream_matches_batch_once_windows_close(spark, tmp_path):
    rows = _rows()
    src = tmp_path / "in"
    _write_one_file(_df(spark, rows), src)
    # a sentinel far past the data pushes the watermark beyond every real
    # window, so append mode flushes them all
    sentinel = [("click", T0 + dt.timedelta(days=2), 0.0)]
    _write_one_file(_df(spark, sentinel), src)

    stream = spark.readStream.schema(
        "event_type string, ts timestamp, value double"
    ).option("maxFilesPerTrigger", 1).parquet(str(src))
    out = stream_tumbling_rate(
        stream, ts="ts", key="event_type",
        width=dt.timedelta(minutes=5), value="value", watermark="10 minutes",
    )
    q = (
        out.writeStream.format("memory").queryName("rates_parity")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from rates_parity").toPandas()

    batch = tumbling_rate(
        _df(spark, rows), ts="ts", key="event_type",
        width=dt.timedelta(minutes=5), value="value",
    ).toPandas()

    # the sentinel's own window never closes (nothing advances the
    # watermark past it) — streaming output is exactly the real windows
    assert _canon(got).equals(_canon(batch))


def test_batch_window_bounds_and_counts(spark):
    got = tumbling_rate(
        _df(spark, _rows()), ts="ts", key="event_type",
        width=dt.timedelta(minutes=5), value="value",
    ).toPandas()
    clicks = got[got.event_type == "click"]
    # 40 one-minute clicks -> 8 full 5-minute windows of 5 events
    assert len(clicks) == 8 and set(clicks.n_events) == {5}
    assert ((clicks.w_end - clicks.w_start) == pd.Timedelta(minutes=5)).all()
