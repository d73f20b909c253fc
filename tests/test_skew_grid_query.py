"""Skew handling, grid bucketing (PatchCSTest.java:31-80 analog corner
cases), query layer, and streaming session windows."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from esa_pfa_spark import grid, skew
from esa_pfa_spark.plans import query as Q
from esa_pfa_spark.streaming import session_window_agg

T0 = dt.datetime(2024, 1, 1)


# -- skew --------------------------------------------------------------

def test_salted_agg_matches_plain(spark):
    pdf = pd.DataFrame(
        {
            "k": ["hot"] * 500 + ["a"] * 20 + ["b"] * 5,
            "v": [float(i % 97) for i in range(525)],
        }
    )
    df = spark.createDataFrame(pdf)
    got = skew.salted_agg(
        df, "k",
        {"n": ("count", "*"), "total": ("sum", "v"), "mean": ("avg", "v"),
         "lo": ("min", "v"), "hi": ("max", "v")},
        n_salt=8,
    ).orderBy("k").toPandas()
    want = (
        df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"),
            F.avg("v").alias("mean"), F.min("v").alias("lo"), F.max("v").alias("hi"),
        )
        .orderBy("k").toPandas()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9)


def test_salt_deterministic(spark):
    pdf = pd.DataFrame({"k": ["x"] * 50, "v": range(50)})
    df = spark.createDataFrame(pdf)
    a = skew.with_salt(df, 8).toPandas().sort_values("v")["__salt"].tolist()
    b = skew.with_salt(df, 8).toPandas().sort_values("v")["__salt"].tolist()
    assert a == b
    assert len(set(a)) > 1  # actually spreads


def test_explain_skew(spark):
    pdf = pd.DataFrame({"k": ["hot"] * 90 + ["cold"] * 10, "v": range(100)})
    top = skew.explain_skew(spark.createDataFrame(pdf), "k", top=1).collect()[0]
    assert top["k"] == "hot" and top["share"] == pytest.approx(0.9)


# -- grid (PatchCSTest corner cases) ------------------------------------

def test_grid_bucket_corners(spark):
    pdf = pd.DataFrame(
        {"lon": [-180.0, 180.0, 0.0, -0.1], "lat": [90.0, -90.0, 0.0, -0.1]}
    )
    df = spark.createDataFrame(pdf)
    out = df.select(
        grid.bucket_x(F.col("lon"), 1.0).alias("bx"),
        grid.bucket_y(F.col("lat"), 1.0).alias("by"),
        grid.patch_name(
            grid.bucket_x(F.col("lon"), 1.0), grid.bucket_y(F.col("lat"), 1.0)
        ).alias("nm"),
    ).toPandas()
    # PatchCS.java:57-61 semantics: x = floor((lon+180)/w), y = floor((90-lat)/w)
    assert list(out["bx"]) == [0, 360, 180, 179]
    assert list(out["by"]) == [0, 180, 90, 90]
    assert out["nm"][0] == "x000y000"
    assert out["nm"][2] == "x180y090"


# -- query layer ---------------------------------------------------------

def _events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def test_predicate_query(spark):
    out = Q.query(_events(spark), "value > 100 AND event_type = 'click'", limit=5)
    rows = out.collect()
    assert 0 < len(rows) <= 5
    assert all(r["value"] > 100 and r["event_type"] == "click" for r in rows)


def test_top_k_and_ambiguous(spark):
    ev = _events(spark)
    top = Q.top_k(ev, "value", 3, tiebreak="event_id").collect()
    assert len(top) == 3 and top[0]["value"] >= top[1]["value"] >= top[2]["value"]
    amb = Q.most_ambiguous(ev.withColumn("dec", F.col("value") - 100), "dec", 3, tiebreak="event_id")
    vals = [abs(r["dec"]) for r in amb.collect()]
    assert vals == sorted(vals)


def test_deterministic_sample_stable(spark):
    ev = _events(spark)
    a = [r["event_id"] for r in Q.deterministic_sample(ev, 10, ["event_id"], seed=1).collect()]
    b = [r["event_id"] for r in Q.deterministic_sample(ev, 10, ["event_id"], seed=1).collect()]
    c = [r["event_id"] for r in Q.deterministic_sample(ev, 10, ["event_id"], seed=2).collect()]
    assert a == b
    assert set(a) != set(c)


# -- streaming session windows -------------------------------------------

def test_session_window_agg_matches_sessionize(spark):
    """Native session_window (batch) == explicit window-spec sessionize."""
    from esa_pfa_spark.operators.windows import session_summary

    pdf = pd.DataFrame(
        {
            "k": ["a"] * 6,
            "ts": [T0 + dt.timedelta(hours=h) for h in (0, 1, 5, 6, 7, 20)],
            "v": [1.0] * 6,
        }
    )
    df = spark.createDataFrame(pdf)
    native = session_window_agg(df, "k", "ts", gap=dt.timedelta(hours=2)).orderBy("session_start").toPandas()
    ours = session_summary(df, "k", "ts", gap=dt.timedelta(hours=2)).orderBy("session_start").toPandas()
    assert list(native["session_len"]) == list(ours["session_len"]) == [2, 3, 1]
    assert list(native["session_start"]) == list(ours["session_start"])


def test_stream_session_counts_runs(spark, tmp_path):
    """End-to-end streaming smoke: file stream -> session windows -> memory
    sink with availableNow trigger."""
    from esa_pfa_spark.streaming import stream_session_counts

    src = tmp_path / "stream_in"
    pdf = pd.DataFrame(
        {
            "k": ["a"] * 4 + ["b"] * 2,
            "ts": [T0 + dt.timedelta(minutes=m) for m in (0, 5, 90, 95, 0, 200)],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema("k string, ts timestamp").parquet(str(src))
    out = stream_session_counts(stream, "k", "ts", gap=dt.timedelta(minutes=30))
    q = (
        out.writeStream.format("memory").queryName("sess_test")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    res = spark.sql("select * from sess_test").toPandas()
    # sessions: a:(0,5),(90,95); b:(0),(200) -> 4 closed sessions
    assert len(res) == 4
    assert sorted(res["session_len"]) == [1, 1, 2, 2]


def test_salted_join_matches_plain_inner_and_left(spark):
    left = spark.createDataFrame(pd.DataFrame({
        "k": ["hot"] * 400 + ["a"] * 30 + ["orphan"] * 5,
        "lv": [float(i) for i in range(435)],
    }))
    right = spark.createDataFrame(pd.DataFrame({
        "k": ["hot", "hot", "a", "unused"],
        "rv": [1.0, 2.0, 3.0, 9.0],
    }))
    for how in ("inner", "left"):
        got = (
            skew.salted_join(left, right, on="k", n_salt=8, how=how)
            .orderBy("k", "lv", "rv").toPandas()
        )
        want = left.join(right, "k", how).orderBy("k", "lv", "rv").toPandas()
        pd.testing.assert_frame_equal(
            got[want.columns], want, check_dtype=False, atol=0
        )


def test_salted_join_rejects_right_outer(spark):
    df = spark.createDataFrame(pd.DataFrame({"k": ["x"], "v": [1.0]}))
    with pytest.raises(ValueError):
        skew.salted_join(df, df, on="k", how="full")
