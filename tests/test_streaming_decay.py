"""stream_decayed_state: per-event decayed aggregates at ingest.

Parity vs the closed form sum_j exp(-(t_i - t_j)/tau) * v_j (allclose —
the O(1) recurrence reassociates the float sum), cross-batch state carry,
and the late-row totals contract.
"""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd

from esa_pfa_spark.streaming.decay import stream_decayed_state

T0 = dt.datetime(2024, 1, 1)


def _write(spark, path, rows):
    pdf = pd.DataFrame(rows, columns=["k", "ts", "v"])
    spark.createDataFrame(
        pdf, schema="k string, ts timestamp, v double"
    ).repartition(1).write.mode("append").parquet(str(path))


def _run(spark, src, name, tau, per_file=False):
    reader = spark.readStream.schema("k string, ts timestamp, v double")
    if per_file:
        reader = reader.option("maxFilesPerTrigger", 1)
    stream = reader.parquet(str(src))
    out = stream_decayed_state(stream, key="k", ts="ts", value="v", tau=tau)
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}").toPandas()


def _closed_form(rows, key, t, tau_s):
    return (
        sum(v * math.exp(-((t - ts).total_seconds()) / tau_s)
            for k, ts, v in rows if k == key and ts <= t),
        sum(math.exp(-((t - ts).total_seconds()) / tau_s)
            for k, ts, v in rows if k == key and ts <= t),
    )


def test_stream_decay_matches_closed_form(spark, tmp_path):
    tau = dt.timedelta(hours=1)
    rows = [
        ("a", T0 + dt.timedelta(minutes=m), float(m + 1))
        for m in (0, 10, 45, 120, 121)
    ] + [("b", T0, 7.0), ("b", T0 + dt.timedelta(hours=5), 3.0)]
    src = tmp_path / "d1"
    _write(spark, src, rows)
    res = _run(spark, src, "decay_t1", tau)
    assert len(res) == len(rows)
    for r in res.itertuples():
        t = pd.Timestamp(r.ts).to_pydatetime()
        s, w = _closed_form(rows, r.key, t, 3600.0)
        assert abs(r.decay_sum - s) < 1e-9 * max(1.0, abs(s)), (r.key, t)
        assert abs(r.decay_wt - w) < 1e-12 * max(1.0, w)
        assert abs(r.decay_mean - s / w) < 1e-9


def test_stream_decay_cross_batch_state(spark, tmp_path):
    """Rows arriving in a later file continue the same per-key recurrence:
    the final emitted aggregate equals the closed form over BOTH files."""
    tau = dt.timedelta(hours=2)
    src = tmp_path / "d2"
    early = [("a", T0 + dt.timedelta(minutes=m), 10.0) for m in (0, 30)]
    late = [("a", T0 + dt.timedelta(minutes=90), 4.0)]
    _write(spark, src, early)
    _write(spark, src, late)
    res = _run(spark, src, "decay_t2", tau, per_file=True)
    assert res["n_seen"].max() == 3
    last = res.sort_values("ts").iloc[-1]
    s, w = _closed_form(early + late, "a", T0 + dt.timedelta(minutes=90), 7200.0)
    assert abs(last.decay_sum - s) < 1e-9
    assert abs(last.decay_wt - w) < 1e-12


def test_stream_decay_late_row_totals(spark, tmp_path):
    """A late (out-of-order within the batch sort? no — genuinely late
    across keys' newest ts) row folds in at its correctly decayed weight:
    the NEXT event's aggregate equals the closed form as if history had
    arrived in order."""
    tau = dt.timedelta(hours=1)
    src = tmp_path / "d3"
    f1 = [("a", T0 + dt.timedelta(minutes=60), 5.0)]
    f2 = [("a", T0 + dt.timedelta(minutes=10), 100.0)]   # late vs 60
    f3 = [("a", T0 + dt.timedelta(minutes=70), 1.0)]
    _write(spark, src, f1)
    _write(spark, src, f2)
    _write(spark, src, f3)
    res = _run(spark, src, "decay_t3", tau, per_file=True).sort_values("ts")
    final = res.iloc[-1]
    s, w = _closed_form(f1 + f2 + f3, "a", T0 + dt.timedelta(minutes=70), 3600.0)
    assert abs(final.decay_sum - s) < 1e-9
    assert abs(final.decay_wt - w) < 1e-12


def test_stream_decay_resumes_from_checkpoint(spark, tmp_path):
    """Restarting the query on the same checkpoint continues the per-key
    recurrence from persisted state: rows from a file added AFTER the
    first run still see the first run's history, and nothing is
    re-emitted."""
    src = tmp_path / "in"
    sink, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    tau = dt.timedelta(hours=2)
    first = [("a", T0, 10.0), ("a", T0 + dt.timedelta(minutes=30), 6.0)]
    _write(spark, src, first)

    def run_once():
        stream = spark.readStream.schema(
            "k string, ts timestamp, v double"
        ).parquet(str(src))
        out = stream_decayed_state(stream, key="k", ts="ts", value="v", tau=tau)
        q = (
            out.writeStream.format("parquet").option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    run_once()
    r1 = spark.read.parquet(sink).toPandas()
    assert len(r1) == 2

    late = [("a", T0 + dt.timedelta(minutes=90), 4.0)]
    _write(spark, src, late)
    run_once()
    r2 = spark.read.parquet(sink).toPandas().sort_values("ts")
    # no re-emission: 2 rows from run 1 + exactly 1 new row
    assert len(r2) == 3
    row = r2.iloc[-1]
    # ...and the new row's aggregate includes the checkpointed history
    s, w = _closed_form(first + late, "a", T0 + dt.timedelta(minutes=90), 7200.0)
    assert row.n_seen == 3
    assert abs(row.decay_sum - s) < 1e-9
    assert abs(row.decay_wt - w) < 1e-12
