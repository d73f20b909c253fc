"""interval_lookup (identity vs theta join, closed bounds, left join) and
funnel (greedy-earliest semantics, chain/tolerance edges)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from esa_pfa_spark.operators.ranges import funnel, interval_lookup

T0 = dt.datetime(2024, 1, 1)


def test_interval_lookup_matches_theta_join(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    pts = spark.createDataFrame(
        pd.DataFrame({"pid": range(500), "v": rng.uniform(-10, 110, 500)})
    )
    ivs = spark.createDataFrame(
        pd.DataFrame({
            "iid": range(30),
            "lo": rng.uniform(-5, 90, 30),
        })
    ).withColumn("hi", F.col("lo") + 12.5)
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_lookup(pts, ivs, point_col="v", bucket_width=10.0).collect()
    )
    want = sorted(
        (r["pid"], r["iid"])
        for r in pts.join(
            ivs, (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
        ).collect()
    )
    assert got == want


def test_interval_lookup_closed_bounds_and_left(spark):
    pts = spark.createDataFrame(
        [(1, 0.0), (2, 10.0), (3, 10.000001), (4, -50.0)], "pid long, v double"
    )
    ivs = spark.createDataFrame([(7, 0.0, 10.0)], "iid long, lo double, hi double")
    inner = {(r["pid"], r["iid"]) for r in interval_lookup(
        pts, ivs, point_col="v", bucket_width=5.0).collect()}
    assert inner == {(1, 7), (2, 7)}          # both endpoints inclusive
    left = {r["pid"]: r["iid"] for r in interval_lookup(
        pts, ivs, point_col="v", bucket_width=5.0, how="left").collect()}
    assert left[3] is None and left[4] is None


def _ev(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    )


def test_funnel_greedy_earliest_and_chain(spark):
    h = dt.timedelta(hours=1)
    rows = [
        # u1 completes: signup@0, view@2, purchase@3
        ("u1", T0, "signup"), ("u1", T0 + 2 * h, "view"), ("u1", T0 + 3 * h, "purchase"),
        # u2: purchase BEFORE view -> depth 2
        ("u2", T0, "signup"), ("u2", T0 + 2 * h, "purchase"), ("u2", T0 + 3 * h, "view"),
        # u3: no signup -> depth 0 even though later steps exist
        ("u3", T0, "view"), ("u3", T0 + h, "purchase"),
        # u4: greedy anchor at FIRST signup; view only before it -> depth 1
        ("u4", T0 + 2 * h, "view"), ("u4", T0 + 3 * h, "signup"),
    ]
    out = {r["user_id"]: r for r in funnel(
        _ev(spark, rows), steps=["signup", "view", "purchase"]).collect()}
    assert out["u1"]["funnel_depth"] == 3
    assert out["u1"]["step_3_ts"] == T0 + 3 * h
    assert out["u2"]["funnel_depth"] == 2
    assert out["u3"]["funnel_depth"] == 0
    assert out["u3"]["step_1_ts"] is None
    assert out["u4"]["funnel_depth"] == 1


def test_funnel_within_tolerance(spark):
    h = dt.timedelta(hours=1)
    rows = [
        ("u", T0, "signup"), ("u", T0 + 5 * h, "view"),
    ]
    tight = funnel(_ev(spark, rows), ["signup", "view"], within=2 * h).collect()[0]
    loose = funnel(_ev(spark, rows), ["signup", "view"], within=6 * h).collect()[0]
    assert tight["funnel_depth"] == 1 and tight["step_2_ts"] is None
    assert loose["funnel_depth"] == 2


def test_funnel_strictly_after(spark):
    rows = [("u", T0, "signup"), ("u", T0, "view")]  # same instant
    out = funnel(_ev(spark, rows), ["signup", "view"]).collect()[0]
    assert out["funnel_depth"] == 1  # view at the same ts does NOT count


def test_interval_overlap_join_matches_theta_join(spark):
    from esa_pfa_spark.operators.ranges import interval_overlap_join

    rng = __import__("random").Random(41)
    a_rows = [(k % 3, i, float(rng.randint(0, 400)), 0.0) for k, i in
              enumerate(range(80))]
    a_rows = [(g, i, lo, lo + rng.randint(0, 35)) for g, i, lo, _ in a_rows]
    b_rows = [(k % 3, i, float(rng.randint(0, 400)), 0.0) for k, i in
              enumerate(range(70))]
    b_rows = [(g, i, lo, lo + rng.randint(0, 20)) for g, i, lo, _ in b_rows]
    a = spark.createDataFrame(a_rows, "g int, aid int, alo double, ahi double")
    b = spark.createDataFrame(b_rows, "g int, bid int, blo double, bhi double")

    naive = {
        (r["g"], r["aid"], r["bid"])
        for r in a.join(
            b, (a["g"] == b["g"]) & (a["alo"] <= b["bhi"])
               & (b["blo"] <= a["ahi"])
        ).select(a["g"], "aid", "bid").collect()
    }
    assert naive, "fixture must produce overlaps"
    # exactly-once at several widths, including widths much smaller and
    # much larger than interval lengths (many shared buckets either way)
    for w in (3.0, 10.0, 50.0, 500.0):
        got = [
            (r["g"], r["aid"], r["bid"])
            for r in interval_overlap_join(
                a, b, key_cols=["g"], a_lo="alo", a_hi="ahi",
                b_lo="blo", b_hi="bhi", bucket_width=w,
            ).collect()
        ]
        assert len(got) == len(set(got)), f"duplicate pairs at width {w}"
        assert set(got) == naive, f"mismatch vs theta join at width {w}"


def test_interval_overlap_join_guards(spark):
    import pytest as _pt

    from esa_pfa_spark.operators.ranges import interval_overlap_join

    df = spark.createDataFrame([(1, 0.0, 1.0)], "g int, lo double, hi double")
    with _pt.raises(ValueError, match="bucket_width"):
        interval_overlap_join(df, df.withColumnRenamed("lo", "l2"))
    with _pt.raises(ValueError, match="alias them first"):
        interval_overlap_join(df, df, key_cols=["g"], bucket_width=1.0)
