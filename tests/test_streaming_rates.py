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


# --- streaming near-dup candidates ----------------------------------------


def _docs_rows():
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = "the quick brown fox jumps over the lazy dog near the river bank now"
    other = "completely unrelated text about spark partitions and shuffle behavior here"
    return [
        (1, base, T0),
        (2, other, T0 + dt.timedelta(minutes=1)),
        # second micro-batch: near-dup of doc 1 arrives later
        (3, near, T0 + dt.timedelta(minutes=5)),
        (4, base, T0 + dt.timedelta(minutes=6)),
    ]


def test_stream_minhash_signature_matches_batch(spark):
    import pandas as pd
    from esa_pfa_spark.operators import dedup as DD
    from esa_pfa_spark.streaming.dedup import minhash_signature_cols

    rows = _docs_rows()
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "ts"]),
        schema="doc_id long, text string, ts timestamp",
    )
    via_cols = {
        r.doc_id: tuple(r[f"mh{j}"] for j in range(6))
        for r in df.select("doc_id", *minhash_signature_cols()).collect()
    }
    via_batch = {
        r.doc_id: tuple(r[f"mh{j}"] for j in range(6))
        for r in DD.minhash_signatures(df).collect()
    }
    assert via_cols == via_batch


def test_stream_neardup_matches_batch_across_microbatches(spark, tmp_path):
    """Pairs found by the stateful LSH-bucket operator (distinct-ed) must
    equal the batch band candidates, INCLUDING pairs whose members arrive
    in different micro-batches."""
    import pandas as pd
    from esa_pfa_spark.operators import dedup as DD
    from esa_pfa_spark.streaming.dedup import stream_neardup_candidates

    rows = _docs_rows()
    src = tmp_path / "docs_in"

    def df_of(rs):
        return spark.createDataFrame(
            pd.DataFrame(rs, columns=["doc_id", "text", "ts"]),
            schema="doc_id long, text string, ts timestamp",
        )

    _write_one_file(df_of(rows[:2]), src)
    _write_one_file(df_of(rows[2:]), src)
    stream = spark.readStream.schema("doc_id long, text string, ts timestamp").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    out = stream_neardup_candidates(stream)
    q = (
        out.writeStream.format("memory").queryName("neardup_pairs")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id_a, r.doc_id_b)
        for r in spark.sql("select * from neardup_pairs").collect()
    }
    want = {
        (r.doc_id_a, r.doc_id_b)
        for r in DD.minhash_band_candidates(df_of(rows)).collect()
    }
    assert got == want
    assert (1, 3) in got  # members arrived in DIFFERENT micro-batches


def test_stream_neardup_bucket_cap_stops_emitting(spark, tmp_path):
    import pandas as pd
    from esa_pfa_spark.streaming.dedup import stream_neardup_candidates

    dup = "the same exact document text repeated in every single row here"
    rows = [(i, dup, T0 + dt.timedelta(seconds=i)) for i in range(5)]
    src = tmp_path / "cap_in"
    _write_one_file(
        spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text", "ts"]),
            schema="doc_id long, text string, ts timestamp",
        ),
        src,
    )
    stream = spark.readStream.schema("doc_id long, text string, ts timestamp").parquet(str(src))
    out = stream_neardup_candidates(stream, max_per_bucket=2)
    q = (
        out.writeStream.format("memory").queryName("neardup_cap")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id_a, r.doc_id_b)
        for r in spark.sql("select * from neardup_cap").collect()
    }
    # only the first 2 members per bucket pair up: exactly (0,1)
    assert got == {(0, 1)}
