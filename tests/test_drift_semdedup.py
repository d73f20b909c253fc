"""psi_drift (hand-computed golden + direction) and semantic_dedup
(crafted clusters with known duplicates)."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from esa_pfa_spark.operators.features import psi_drift
from esa_pfa_spark.operators.similarity import semantic_dedup


def _psi_hand(nb, nc, n_buckets):
    tb, tc = sum(nb), sum(nc)
    s = 0.0
    for b, c in zip(nb, nc):
        p = (b + 1) / (tb + n_buckets)
        q = (c + 1) / (tc + n_buckets)
        s += (p - q) * math.log(p / q)
    return round(s, 6)


def test_psi_matches_hand_computation(spark):
    # buckets (width 10, 3 buckets): base = [4, 2, 0], cur = [1, 3, 2]
    rows = (
        [("base", 5.0)] * 4 + [("base", 15.0)] * 2
        + [("cur", 5.0)] * 1 + [("cur", 15.0)] * 3 + [("cur", 25.0)] * 2
    )
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["period", "value"]))
    out = psi_drift(df, bucket_width=10.0, n_buckets=3).collect()[0]
    assert out["n_base"] == 6 and out["n_cur"] == 6
    assert out["psi"] == pytest.approx(_psi_hand([4, 2, 0], [1, 3, 2], 3), abs=2e-6)


def test_psi_zero_for_identical_distributions(spark):
    rows = [("base", float(v)) for v in range(50)] + [
        ("cur", float(v)) for v in range(50)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["period", "value"]))
    assert psi_drift(df, bucket_width=10.0, n_buckets=5).collect()[0]["psi"] == 0.0


def test_psi_orders_drift_severity(spark):
    base = [("base", float(v % 30)) for v in range(300)]
    mild = base + [("cur", float((v % 30) + 3)) for v in range(300)]
    severe = base + [("cur", float((v % 30) + 60)) for v in range(300)]
    mk = lambda rows: spark.createDataFrame(
        pd.DataFrame(rows, columns=["period", "value"])
    )
    p_mild = psi_drift(mk(mild), bucket_width=10.0).collect()[0]["psi"]
    p_sev = psi_drift(mk(severe), bucket_width=10.0).collect()[0]["psi"]
    assert 0 < p_mild < p_sev


def test_semantic_dedup_known_clusters(spark):
    # two tight duplicate families along different axes + one singleton;
    # within-family cosine = 1.0, cross-family = 0.0
    def vec(axis, scale):
        v = [0.0] * 8
        v[axis] = scale
        return v

    # kmeans_fit seeds from the k LOWEST ids, so ids 0/1/2 are placed one
    # per family — the deliberate-init analog of SemDeDup's assumption
    # that clustering separates the families (cross-cluster dups are the
    # method's documented blind spot, not a bug here)
    rows = [
        (0, vec(0, 1.0)), (3, vec(0, 2.0)), (4, vec(0, 0.5)),   # family A
        (1, vec(3, 1.0)), (5, vec(3, 3.0)),                      # family B
        (2, vec(6, 1.0)),                                        # singleton
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(df, threshold=0.9, k=3, n_iter=2).collect()
    }
    assert [out[i]["canonical_doc_id"] for i in (0, 3, 4)] == [0, 0, 0]
    assert [out[i]["canonical_doc_id"] for i in (1, 5)] == [1, 1]
    assert out[2]["canonical_doc_id"] == 2 and out[2]["survives"]
    assert sum(1 for r in out.values() if r["survives"]) == 3


def _families(spark):
    def vec(axis, scale):
        v = [0.0] * 8
        v[axis] = scale
        return v

    rows = [
        (0, vec(0, 1.0)), (3, vec(0, 2.0)), (4, vec(0, 0.5)),
        (1, vec(3, 1.0)), (5, vec(3, 3.0)),
        (2, vec(6, 1.0)),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_dedup_derived_k_matches_explicit(spark):
    """k=None derives max(k_min, ceil(n/target)): 6 rows / target 2 = 3
    — identical output to the explicit k=3 run; n_rows skips the count
    job (same answer either way)."""
    df = _families(spark)
    key = lambda r: r["vec_id"]
    explicit = sorted(
        semantic_dedup(df, threshold=0.9, k=3, n_iter=2).collect(), key=key
    )
    derived = sorted(
        semantic_dedup(
            df, threshold=0.9, n_iter=2, target_cluster_rows=2, k_min=3
        ).collect(),
        key=key,
    )
    supplied = sorted(
        semantic_dedup(
            df, threshold=0.9, n_iter=2, target_cluster_rows=2, k_min=3,
            n_rows=6,
        ).collect(),
        key=key,
    )
    assert derived == explicit == supplied


def test_semantic_dedup_pair_cap_logs_drops(spark, caplog):
    """max_cluster_rows below a cluster's size sub-shards it: the job
    stays bounded, every id still gets a row, and the dropped-pair count
    is LOGGED (never silent).  A cap that doesn't trigger must change
    nothing."""
    import logging as _logging

    df = _families(spark)
    baseline = sorted(
        semantic_dedup(df, threshold=0.9, k=3, n_iter=2).collect(),
        key=lambda r: r["vec_id"],
    )
    # generous cap: identical output, no warning
    with caplog.at_level(_logging.WARNING, logger="esa_pfa_spark.operators.similarity"):
        capped = sorted(
            semantic_dedup(
                df, threshold=0.9, k=3, n_iter=2, max_cluster_rows=1000
            ).collect(),
            key=lambda r: r["vec_id"],
        )
    assert capped == baseline
    assert not any("sub-sharded" in m for m in caplog.messages)
    # punitive cap: family A (3 rows) must shard; drops are logged
    with caplog.at_level(_logging.WARNING, logger="esa_pfa_spark.operators.similarity"):
        sharded = semantic_dedup(
            df, threshold=0.9, k=3, n_iter=2, max_cluster_rows=2
        ).collect()
    assert any("sub-sharded" in m and "candidate pairs" in m for m in caplog.messages)
    assert sorted(r["vec_id"] for r in sharded) == [0, 1, 2, 3, 4, 5]
    # canonical ids only move DOWN (min-id rule survives sharding)
    assert all(r["canonical_doc_id"] <= r["vec_id"] for r in sharded)
    # sharding can only LOSE pairs -> survivors never decrease
    assert sum(r["survives"] for r in sharded) >= 3


def _ks_hand(a, b):
    """Exact two-sample KS D via the same rational-cross-product max."""
    import numpy as np

    vals = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    aa, bb = np.asarray(a), np.asarray(b)
    d = max(
        abs(int((aa <= v).sum()) * nb - int((bb <= v).sum()) * na) for v in vals
    )
    return round(d / (na * nb), 6)


def test_ks_drift_matches_hand_computation(spark):
    import numpy as np

    from esa_pfa_spark.operators.features import ks_drift

    rng = np.random.default_rng(3)
    base = rng.normal(0, 1, 300).round(3).tolist()
    cur = rng.normal(0.6, 1.3, 240).round(3).tolist()  # shifted + widened
    rows = [("t", "base", v) for v in base] + [("t", "cur", v) for v in cur]
    # a second group with identical distributions -> D small
    same = rng.normal(5, 2, 250).round(3).tolist()
    rows += [("u", "base", v) for v in same] + [("u", "cur", v) for v in same]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_type", "period", "value"])
    )
    out = {r["event_type"]: r for r in ks_drift(df).collect()}
    assert out["t"]["ks_d"] == _ks_hand(base, cur)
    assert out["t"]["n_base"] == 300 and out["t"]["n_cur"] == 240
    assert out["u"]["ks_d"] == 0.0  # identical samples: CDFs coincide
    assert out["t"]["ks_d"] > 0.2  # the shift is visible


def test_rfm_scores_invariants(spark):
    """Scores land in 1..n_bins, the code composes digits, and each score is
    monotone in its metric (equal-frequency bins preserve order)."""
    import datetime as dtm

    from esa_pfa_spark.operators.features import rfm_scores

    t0 = dtm.datetime(2024, 1, 1)
    rows = []
    for u in range(40):
        n = 1 + (u % 7)
        for j in range(n):
            rows.append((u, t0 + dtm.timedelta(hours=u * 5 + j), float(u * 3 + j)))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["user_id", "ts", "value"]))
    out = rfm_scores(df).collect()
    assert len(out) == 40
    for r in out:
        for c in ("r_score", "f_score", "m_score"):
            assert 1 <= r[c] <= 5, r
        assert r["rfm_code"] == r["r_score"] * 100 + r["f_score"] * 10 + r["m_score"]
    by_recency = sorted(out, key=lambda r: r["recency_days"])
    assert all(
        a["r_score"] >= b["r_score"]
        for a, b in zip(by_recency, by_recency[1:])
    )
    by_money = sorted(out, key=lambda r: r["monetary"])
    assert all(
        a["m_score"] <= b["m_score"] for a, b in zip(by_money, by_money[1:])
    )
