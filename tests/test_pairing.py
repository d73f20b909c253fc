"""Tolerance-bounded non-reuse pairing: the FIXTURES.md F5 micro-cases
(reference-style hand goldens, FindPatchPairsTest.java:28-38) + n-sphere
feature goldens (SpectralFeaturesOpTest.java:61-119 style)."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from esa_pfa_spark.operators import pairing as P

T0 = dt.datetime(2024, 1, 1)
US = 1_000_000
DAY = 86400 * US
MIN_TOL, MAX_TOL = DAY, 7 * DAY


def _sweep(offsets_s):
    ts = np.array([o * US for o in offsets_s], dtype=np.int64)
    return P.two_pointer_pairs(ts, MIN_TOL, MAX_TOL)


def test_two_pointer_basic():
    # t, t+60s, t+1d -> exactly one pair (0, 2): 60s < min_tol is skipped,
    # then 1d matches and consumes both (F5 case 1)
    assert _sweep([0, 60, 86400]) == [(0, 2)]


def test_two_pointer_window_reset():
    # >7d gap -> no cross-gap pair (F5 case 2)
    assert _sweep([0, 10 * 86400]) == []


def test_two_pointer_non_reuse():
    # 4 obs spaced 1d: (0,1) consumes both; then (2,3) (F5 case 3)
    assert _sweep([0, 86400, 2 * 86400, 3 * 86400]) == [(0, 1), (2, 3)]


def test_two_pointer_advance_on_failure():
    # 0 and 8d can't pair; 8d and 9d can
    assert _sweep([0, 8 * 86400, 9 * 86400]) == [(1, 2)]


def test_nsphere_golden():
    """(3,4) in 2-D: magnitude 5, angle = acos(3/5)."""
    mag, angles = P.nsphere(np.array([3.0, 4.0]))
    assert mag == pytest.approx(5.0)
    assert angles[0] == pytest.approx(np.arccos(0.6))


def test_nsphere_negative_last_reflection():
    mag, angles = P.nsphere(np.array([3.0, -4.0]))
    assert mag == pytest.approx(5.0)
    assert angles[0] == pytest.approx(2 * np.pi - np.arccos(0.6))


def test_overlap_ratio():
    a = np.array([7, 1, 2, 14])  # nonzero mod 7: F T T F
    b = np.array([1, 2, 7, 3])  # nonzero mod 7: T T F T
    #             both:          F T F F -> 1/4
    assert P.overlap_ratio(a, b) == 0.25


def _obs_df(spark, ts_offsets_s, entity="a"):
    n = len(ts_offsets_s)
    pdf = pd.DataFrame(
        {
            "entity_id": [entity] * n,
            "ts": [T0 + dt.timedelta(seconds=o) for o in ts_offsets_s],
            "doc_id": [f"d{i}" for i in range(n)],
            "tokens": [[1 + i, 2, 3, 4, 5, 6] for i in range(n)],
            "n_tok": [6] * n,
        }
    )
    return spark.createDataFrame(pdf)


def test_find_pairs_end_to_end(spark):
    df = _obs_df(spark, [0, 60, 86400, 20 * 86400, 21 * 86400])
    out = P.find_pairs(df, min_overlap=0.0).orderBy("ts1").toPandas()
    got = [(r["doc_id1"], r["doc_id2"]) for _, r in out.iterrows()]
    assert got == [("d0", "d2"), ("d3", "d4")]
    assert (out["overlap_ratio"] >= 0).all()
    assert np.isfinite(out[["magnitude", "angle_1", "angle_2", "angle_3"]].to_numpy()).all()


def test_find_pairs_session_chunked_exact(spark):
    """Session-sliced parallel sweep is EXACTLY the global sweep (state
    resets at >max_tol gaps — FindPatchPairs.java:148-150)."""
    from esa_pfa_spark import synth

    obs = synth.observations_df(spark, seed=3, n_entities=6, mean_obs=30, mean_tok=12)
    a = (
        P.find_pairs(obs, min_overlap=0.0)
        .orderBy("entity_id", "ts1", "ts2")
        .toPandas()
    )
    b = (
        P.find_pairs(obs, min_overlap=0.0, chunk="session")
        .orderBy("entity_id", "ts1", "ts2")
        .toPandas()
    )
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_find_pairs_window_chunked_invariants(spark):
    """Fixed-window slicing (approximate): every pair satisfies the
    tolerance + per-slice non-reuse invariants; count stays close."""
    from esa_pfa_spark import synth

    obs = synth.observations_df(spark, seed=3, n_entities=6, mean_obs=30, mean_tok=12)
    a = P.find_pairs(obs, min_overlap=0.0).toPandas()
    b = P.find_pairs(obs, min_overlap=0.0, chunk=dt.timedelta(days=30)).toPandas()
    dtv = (b["ts2"] - b["ts1"]).dt.total_seconds()
    assert ((dtv >= 86400) & (dtv <= 7 * 86400)).all()
    assert abs(len(b) - len(a)) <= 0.25 * len(a) + 2


def test_interval_pairs_superset(spark):
    df = _obs_df(spark, [0, 60, 86400, 20 * 86400, 21 * 86400])
    tp = P.find_pairs(df, min_overlap=0.0).toPandas()
    iv = P.interval_pairs(df).toPandas()
    tp_keys = set(zip(tp["doc_id1"], tp["doc_id2"]))
    iv_keys = set(zip(iv["doc_id1"], iv["doc_id2"]))
    assert tp_keys <= iv_keys
    assert {("d0", "d2"), ("d3", "d4")} <= iv_keys


def test_interval_pairs_bucketed_identical(spark):
    """The time-bucketed band join must emit exactly the plain band join's
    pair set (no duplicates from the right-side explode, no boundary loss)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from esa_pfa_spark.operators.pairing import interval_pairs, interval_pairs_bucketed

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        F.col("user_id").alias("entity_id"), "ts", F.col("event_id").alias("doc_id")
    )
    kw = dict(key="entity_id", ts="ts", id_col="doc_id",
              min_tol=dt.timedelta(hours=1), max_tol=dt.timedelta(hours=24))
    plain = interval_pairs(ev, **kw).toPandas()
    bucketed = interval_pairs_bucketed(ev, **kw).toPandas()
    key = ["entity_id", "doc_id1", "doc_id2"]
    a = plain.sort_values(key, kind="mergesort").reset_index(drop=True)
    b = bucketed.sort_values(key, kind="mergesort").reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    pd.testing.assert_frame_equal(a, b)


def test_interval_pairs_bucketed_fractional_tolerance(spark):
    """Regression (truncated bucket width): with a fractional max_tol the
    bucket width must CEIL, or an in-band pair can span two boundaries and
    silently drop.  Equivalence contract vs the plain band join."""
    import datetime as dt

    import pandas as pd

    from esa_pfa_spark.operators.pairing import interval_pairs, interval_pairs_bucketed

    t0 = dt.datetime(2024, 1, 1)
    # gaps of 1.2s: pairs at dt=1.2 are in-band for [0, 1.5]; with w=int(1.5)=1
    # a pair like (t=0.9, t=2.1) spans buckets 0 and 2 and was dropped
    rows = [("e", t0 + dt.timedelta(seconds=0.3 * i), f"d{i}") for i in range(20)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["entity_id", "ts", "doc_id"])
    )
    kw = dict(key="entity_id", ts="ts", id_col="doc_id",
              min_tol=dt.timedelta(seconds=0), max_tol=dt.timedelta(seconds=1.5))
    plain = interval_pairs(df, **kw).toPandas()
    bucketed = interval_pairs_bucketed(df, **kw).toPandas()
    pk = set(zip(plain["doc_id1"], plain["doc_id2"]))
    bk = set(zip(bucketed["doc_id1"], bucketed["doc_id2"]))
    assert pk == bk and len(bucketed) == len(plain)


def test_interval_pairs_bucketed_rejects_negative_min(spark):
    import datetime as dt

    import pytest as _pt

    from esa_pfa_spark.operators.pairing import interval_pairs_bucketed

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", "ts", "event_id"
    )
    with _pt.raises(ValueError, match="min_tol >= 0"):
        interval_pairs_bucketed(
            ev, key="user_id", ts="ts", id_col="event_id",
            min_tol=dt.timedelta(seconds=-5), max_tol=dt.timedelta(hours=1),
        )
