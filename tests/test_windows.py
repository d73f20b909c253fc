"""Window operators: hand-computed goldens on tiny inputs."""

import datetime as dt

import pandas as pd

from esa_pfa_spark.operators import windows as W

T0 = dt.datetime(2024, 1, 1)


def _ts(*hours):
    return [T0 + dt.timedelta(hours=h) for h in hours]


def test_ffill_bfill(spark):
    pdf = pd.DataFrame(
        {
            "k": ["a"] * 4,
            "ts": _ts(0, 1, 2, 3),
            "v": [1.0, None, None, 4.0],
        }
    )
    df = spark.createDataFrame(pdf)
    f = W.ffill(df, ["v"], "k", "ts").orderBy("ts").toPandas()
    assert list(f["v"]) == [1.0, 1.0, 1.0, 4.0]
    b = W.bfill(df, ["v"], "k", "ts").orderBy("ts").toPandas()
    assert list(b["v"]) == [1.0, 4.0, 4.0, 4.0]


def test_lag_lead_and_gradient(spark):
    pdf = pd.DataFrame({"k": ["a"] * 4, "ts": _ts(0, 1, 2, 3), "v": [1.0, 3.0, 6.0, 10.0]})
    df = spark.createDataFrame(pdf)
    out = W.lag_lead(df, "v", "k", "ts").orderBy("ts").toPandas()
    assert list(out["lag_1_v"])[1:] == [1.0, 3.0, 6.0] and pd.isna(out["lag_1_v"][0])
    assert list(out["lead_1_v"])[:3] == [3.0, 6.0, 10.0] and pd.isna(out["lead_1_v"][3])
    g = W.gradient(df, "v", "k", "ts").orderBy("ts").toPandas()
    assert list(g["gradient_v"][1:3]) == [5.0, 7.0]  # lead - lag


def test_rolling_mean_centered(spark):
    pdf = pd.DataFrame({"k": ["a"] * 3, "ts": _ts(0, 1, 2), "v": [1.0, 2.0, 6.0]})
    out = W.rolling_mean(spark.createDataFrame(pdf), "v", "k", "ts").orderBy("ts").toPandas()
    assert list(out["rolling_mean_v"]) == [1.5, 3.0, 4.0]


def test_sessionize_golden(spark):
    """Gap > 2h starts a new session; runs are (0,1h) (5h,6h,7h) (20h)."""
    pdf = pd.DataFrame({"k": ["a"] * 6, "ts": _ts(0, 1, 5, 6, 7, 20), "v": range(6)})
    out = W.sessionize(spark.createDataFrame(pdf), "k", "ts", gap=dt.timedelta(hours=2)).orderBy("ts").toPandas()
    assert list(out["session_id"]) == [0, 0, 1, 1, 1, 2]
    assert list(out["session_len"]) == [2, 2, 3, 3, 3, 1]


def test_session_summary_max_cluster(spark):
    """1-D 'largest blob' (A7 analog): max session_len."""
    pdf = pd.DataFrame({"k": ["a"] * 6, "ts": _ts(0, 1, 5, 6, 7, 20), "v": [1.0] * 6})
    summ = W.session_summary(spark.createDataFrame(pdf), "k", "ts", gap=dt.timedelta(hours=2), value="v")
    assert summ.agg({"session_len": "max"}).collect()[0][0] == 3
    assert summ.count() == 3


def test_run_length_golden(spark):
    """flag runs: T T F T T T -> lengths [2,1,3] (W3 max-run = 3)."""
    pdf = pd.DataFrame(
        {"k": ["a"] * 6, "ts": _ts(0, 1, 2, 3, 4, 5), "flag": [1, 1, 0, 1, 1, 1]}
    )
    out = W.run_length(spark.createDataFrame(pdf), "k", "ts", "flag").orderBy("run_start").toPandas()
    assert list(out["run_len"]) == [2, 1, 3]
    assert list(out["flag"]) == [1, 0, 1]


def test_rolling_median_golden(spark):
    """Trailing 3-row median: odd frames pick the middle, even/short frames
    average the two middles."""
    pdf = pd.DataFrame(
        {"k": ["a"] * 5, "ts": _ts(0, 1, 2, 3, 4), "v": [5.0, 1.0, 4.0, 2.0, 3.0]}
    )
    out = (
        W.rolling_median(spark.createDataFrame(pdf), "v", key="k", ts="ts", before=2, after=0)
        .orderBy("ts")
        .toPandas()
    )
    # frames: [5] [5,1] [5,1,4] [1,4,2] [4,2,3]
    assert list(out["rolling_median_v"]) == [5.0, 3.0, 4.0, 2.0, 3.0]


def test_scd2_interval_lookup_equals_asof(spark):
    """The SCD2 interval predicate must select exactly the asof_join
    backward match for every probe (the feature-store equivalence that
    makes the compacted table a valid PIT serving layer)."""
    import datetime as dt
    import pandas as pd
    from pyspark.sql import functions as F
    from esa_pfa_spark.operators.asof import asof_join
    from esa_pfa_spark.operators.windows import scd2_intervals

    T0 = dt.datetime(2024, 1, 1)
    obs = spark.createDataFrame(
        pd.DataFrame({
            "k": ["a"] * 4 + ["b"] * 2,
            "ts": [T0 + dt.timedelta(hours=h) for h in (0, 1, 2, 5)] +
                  [T0 + dt.timedelta(hours=h) for h in (1, 3)],
            "v": [1.0, 1.0, 2.0, 2.0, 9.0, 8.0],  # repeats compact away
        }),
        schema="k string, ts timestamp, v double",
    )
    probes = spark.createDataFrame(
        pd.DataFrame({
            "k": ["a", "a", "a", "b", "b", "c"],
            "query_ts": [T0 + dt.timedelta(hours=h, minutes=30) for h in (0, 2, 9)] +
                        [T0 + dt.timedelta(hours=h, minutes=30) for h in (0, 3)] +
                        [T0],
        }),
        schema="k string, query_ts timestamp",
    )
    scd2 = scd2_intervals(obs, key="k", ts="ts", dedupe_unchanged=["v"])
    via_interval = (
        probes.join(
            scd2,
            (probes.k == scd2.k)
            & (scd2.valid_from <= probes.query_ts)
            & ((probes.query_ts < scd2.valid_to) | scd2.valid_to.isNull()),
            "left",
        )
        .select(probes.k, "query_ts", F.col("v").alias("got_v"))
    )
    via_asof = asof_join(
        probes, obs, on="k", probe_ts="query_ts", obs_ts="ts", payload=["v"]
    ).select("k", "query_ts", F.col("v").alias("got_v"))
    a = sorted(map(tuple, via_interval.collect()))
    b = sorted(map(tuple, via_asof.collect()))
    assert a == b and len(a) == 6


def test_scd2_compaction_and_null_payload_first_row(spark):
    import datetime as dt
    import pandas as pd
    from esa_pfa_spark.operators.windows import scd2_intervals

    T0 = dt.datetime(2024, 1, 1)
    obs = spark.createDataFrame(
        pd.DataFrame({
            "k": ["a"] * 4,
            "ts": [T0 + dt.timedelta(hours=h) for h in range(4)],
            "v": [None, None, 3.0, 3.0],
        }),
        schema="k string, ts timestamp, v double",
    )
    out = scd2_intervals(obs, key="k", ts="ts", dedupe_unchanged=["v"]).collect()
    # first row kept despite NULL payload; NULL->NULL and 3->3 compact
    assert [(r.v, r.valid_from.hour, None if r.valid_to is None else r.valid_to.hour)
            for r in sorted(out, key=lambda r: r.valid_from)] == [
        (None, 0, 2), (3.0, 2, None)
    ]
