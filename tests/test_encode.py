"""encode.py transforms: leakage and edge semantics on hand-built rows
(the oracle mirror covers sf0.01 parity)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from esa_pfa_spark.operators.encode import (
    cyclical_time_features,
    target_encode_expanding,
    winsorize_by_group,
    zscore_by_group,
)

T0 = dt.datetime(2024, 3, 10, 0, 0, 0)  # a Sunday


def test_target_encoding_never_sees_self_or_future(spark):
    rows = [
        ("u", T0, 10.0, 1),
        ("u", T0 + dt.timedelta(hours=1), 20.0, 2),
        ("u", T0 + dt.timedelta(hours=2), 99.0, 3),
        ("v", T0, 7.0, 4),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["cat", "ts", "y", "rid"])
    )
    out = {
        r["rid"]: r
        for r in target_encode_expanding(
            df, category="cat", target="y", ts="ts", tiebreak="rid"
        ).collect()
    }
    assert out[1]["te_mean"] is None and out[1]["te_n"] == 0   # no past
    assert out[2]["te_mean"] == pytest.approx(10.0)            # only row 1
    assert out[3]["te_mean"] == pytest.approx(15.0)            # rows 1+2
    assert out[4]["te_mean"] is None                           # other cat


def test_target_encoding_ts_collision_no_same_ts_leak(spark):
    """Same-timestamp rows must see NEITHER each other nor themselves
    (RANGE frame over epoch micros): a ROWS frame would leak the earlier-
    sorted same-ts label into the later one."""
    rows = [("u", T0, 1.0, 2), ("u", T0, 5.0, 1),
            ("u", T0 + dt.timedelta(hours=1), 9.0, 3)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["cat", "ts", "y", "rid"])
    )
    out = {
        r["rid"]: r
        for r in target_encode_expanding(
            df, category="cat", target="y", ts="ts", tiebreak="rid"
        ).collect()
    }
    assert out[1]["te_mean"] is None and out[1]["te_n"] == 0
    assert out[2]["te_mean"] is None and out[2]["te_n"] == 0
    assert out[3]["te_mean"] == pytest.approx(3.0) and out[3]["te_n"] == 2


def test_zscore_constant_group_is_null(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"entity_id": ["a"] * 3 + ["b"], "value": [5.0, 5.0, 5.0, 1.0]})
    )
    out = zscore_by_group(df).collect()
    assert all(r["z"] is None for r in out)


def test_winsorize_clamps_extremes_only(spark):
    vals = [float(v) for v in range(1, 101)]
    df = spark.createDataFrame(
        pd.DataFrame({"entity_id": ["g"] * 100, "value": vals})
    )
    out = {r["value"]: r["value_w"] for r in winsorize_by_group(
        df, lo=0.05, hi=0.95).collect()}
    # p05 of 1..100 (interpolated) = 5.95, p95 = 95.05
    assert out[1.0] == pytest.approx(5.95)
    assert out[100.0] == pytest.approx(95.05)
    assert out[50.0] == 50.0


def test_cyclical_wraps(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"ts": [T0, T0 + dt.timedelta(hours=23)]})
    )
    rows = sorted(cyclical_time_features(df).collect(), key=lambda r: r["hour"])
    assert rows[0]["dow"] == 0                       # Sunday
    assert rows[0]["hour_sin"] == 0.0 and rows[0]["hour_cos"] == 1.0
    # 23h is geometrically close to 0h: cos near 1, sin slightly negative
    assert rows[1]["hour_cos"] > 0.95 and rows[1]["hour_sin"] < 0


def test_robust_z_survives_outlier(spark):
    from esa_pfa_spark.operators.encode import robust_z_by_group

    # 99 values at ~10 and one wild outlier: classic z would dilute its
    # own score via the inflated stddev; robust z must flag it hard
    vals = [10.0 + (i % 5) * 0.1 for i in range(99)] + [1000.0]
    df = spark.createDataFrame(
        pd.DataFrame({"entity_id": ["g"] * 100, "value": vals})
    )
    out = {r["value"]: r["robust_z"] for r in robust_z_by_group(df).collect()}
    assert out[1000.0] > 3.5          # flagged
    assert abs(out[10.0]) < 3.5       # bulk unflagged


def test_robust_z_null_when_mad_zero(spark):
    from esa_pfa_spark.operators.encode import robust_z_by_group

    df = spark.createDataFrame(
        pd.DataFrame({"entity_id": ["g"] * 5, "value": [3.0, 3.0, 3.0, 3.0, 9.0]})
    )
    out = robust_z_by_group(df).collect()
    assert all(r["robust_z"] is None for r in out)  # MAD = 0


def test_quantile_bins_equal_frequency(spark):
    from esa_pfa_spark.operators.encode import quantile_bins

    df = spark.createDataFrame(
        pd.DataFrame({"value": [float(v) for v in range(1000)]})
    )
    out = quantile_bins(df, n_bins=10).groupBy("bin").count().collect()
    counts = {r["bin"]: r["count"] for r in out}
    assert set(counts) == set(range(10))
    assert all(abs(c - 100) <= 1 for c in counts.values())


def test_profile_approx_distinct_within_5pct(spark):
    from esa_pfa_spark.operators.profile import profile_table

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    exact = {r["column"]: r["n_distinct"] for r in profile_table(
        ev, columns=["user_id", "event_type"], exact_distinct=True).collect()}
    approx = {r["column"]: r["n_distinct"] for r in profile_table(
        ev, columns=["user_id", "event_type"], exact_distinct=False).collect()}
    for c in exact:
        assert abs(approx[c] - exact[c]) <= max(1, 0.05 * exact[c]), c


def test_hashed_cross_properties(spark):
    """Determinism, bucket range, separator safety ((\"ab\",\"c\") vs
    (\"a\",\"bc\")), and NULL-vs-empty-string distinction."""
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F811

    from esa_pfa_spark.operators.encode import hashed_cross

    df = spark.createDataFrame(
        pd.DataFrame(
            {"a": ["ab", "a", None, ""], "b": ["c", "bc", "x", "x"]}
        )
    )
    out = hashed_cross(df, ["a", "b"], n_buckets=1024).collect()
    vals = {(r["a"], r["b"]): r["cross_bucket"] for r in out}
    assert all(0 <= v < 1024 for v in vals.values())
    assert vals[("ab", "c")] != vals[("a", "bc")]   # separator keeps them apart
    assert vals[(None, "x")] != vals[("", "x")]     # null sentinel != empty
    again = hashed_cross(df.repartition(7), ["a", "b"], n_buckets=1024).collect()
    assert {(r["a"], r["b"]): r["cross_bucket"] for r in again} == vals
    # map-only: no exchange in the assignment plan
    plan_df = hashed_cross(df, ["a", "b"])
    import io, contextlib, re
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain(mode="simple")
    assert "Exchange" not in buf.getvalue()


def test_cohort_retention_hand_computed(spark):
    """Two weekly cohorts with known comeback patterns; week_offset-0
    retention is exactly 1.0 and later offsets match hand counts."""
    import datetime as dtm

    import pandas as pd

    from esa_pfa_spark.operators.profile import cohort_retention

    t0 = dtm.datetime(2024, 1, 1)
    rows = []
    # cohort 0: u1 u2 u3; u1 returns wk1+wk2, u2 returns wk2, u3 never
    for u, weeks in {"u1": [0, 1, 2], "u2": [0, 2], "u3": [0]}.items():
        for w in weeks:
            rows.append((u, t0 + dtm.timedelta(days=7 * w + 1)))
    # cohort 1: u4 u5; u5 returns wk2 (offset 1)
    for u, weeks in {"u4": [1], "u5": [1, 2]}.items():
        for w in weeks:
            rows.append((u, t0 + dtm.timedelta(days=7 * w + 2)))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["user_id", "ts"]))
    out = {
        (r["cohort"], r["week_offset"]): r for r in cohort_retention(df).collect()
    }
    assert out[(0, 0)]["n_cohort"] == 3 and out[(0, 0)]["retention"] == 1.0
    assert out[(0, 1)]["n_active"] == 1 and out[(0, 1)]["retention"] == pytest.approx(1 / 3, abs=1e-6)
    assert out[(0, 2)]["n_active"] == 2
    assert out[(1, 0)]["n_cohort"] == 2
    assert out[(1, 1)]["n_active"] == 1 and out[(1, 1)]["retention"] == 0.5
    assert (1, 2) not in out  # nobody from cohort 1 active at offset 2


def test_validate_expectations_counts(spark):
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F811

    from esa_pfa_spark.operators.profile import validate_expectations

    df = spark.createDataFrame(
        pd.DataFrame({"v": [1.0, -2.0, None, 5.0], "t": ["a", "b", "a", None]})
    )
    out = {
        r["expectation"]: r
        for r in validate_expectations(
            df,
            {
                "v_nonneg": F.col("v") >= 0,
                "t_known": F.col("t").isin(["a", "b"]),
                "always": F.lit(True),
            },
        ).collect()
    }
    # NULL predicate results are violations: v=None fails v_nonneg, t=None fails t_known
    assert out["v_nonneg"]["n_violations"] == 2 and not out["v_nonneg"]["passed"]
    assert out["t_known"]["n_violations"] == 1
    assert out["always"]["n_violations"] == 0 and out["always"]["passed"]
    assert all(r["n_rows"] == 4 for r in out.values())
    assert out["v_nonneg"]["violation_rate"] == 0.5


def test_woe_encode_matches_closed_form(spark):
    """WoE/IV vs hand-computed values on a fixture where one category is
    strongly predictive; smoothing keeps the empty-positive cell finite."""
    import math

    from pyspark.sql import functions as F

    from esa_pfa_spark.operators.encode import woe_encode

    rows = (
        [("a", 1)] * 30 + [("a", 0)] * 10
        + [("b", 1)] * 5 + [("b", 0)] * 35
        + [("c", 0)] * 20  # no positives: smoothing territory
    )
    df = spark.createDataFrame(rows, "cat string, y int")
    out = {r["category"]: r for r in woe_encode(df, "cat", F.col("y") == 1).collect()}
    tp, tn = 35, 65
    for cat, (p, n) in {"a": (30, 10), "b": (5, 35), "c": (0, 20)}.items():
        pp = (p + 0.5) / (tp + 0.5)
        pn = (n + 0.5) / (tn + 0.5)
        assert out[cat]["woe"] == pytest.approx(math.log(pp / pn), abs=1e-6)
        assert out[cat]["iv"] == pytest.approx((pp - pn) * math.log(pp / pn), abs=1e-6)
        assert out[cat]["n_pos"] == p and out[cat]["n_neg"] == n
    assert out["a"]["woe"] > 0 > out["b"]["woe"] > out["c"]["woe"]


def test_quantile_normalize_properties_and_numpy_parity(spark):
    """qnorm is monotone within each group, spans the global min/max at
    the group extremes, and matches the np.interp reference exactly."""
    import numpy as np

    from esa_pfa_spark.operators.encode import quantile_normalize

    rng = np.random.default_rng(5)
    rows = []
    rid = 0
    for g, (mu, sd) in {"a": (0, 1), "b": (10, 3), "c": (-5, 0.5)}.items():
        for v in rng.normal(mu, sd, size=40):
            rows.append((g, rid, float(v)))
            rid += 1
    df = spark.createDataFrame(rows, "grp string, rid long, value double")
    out = quantile_normalize(df, "value", "grp", "rid").collect()

    all_v = np.sort(np.array([r[2] for r in rows]))
    got = {(r["grp"], r["rid"]): r["qnorm"] for r in out}
    for g in "abc":
        gvals = sorted((r[2], r[1]) for r in rows if r[0] == g)
        n = len(gvals)
        qs = [got[(g, rid)] for _, rid in gvals]
        assert qs == sorted(qs)  # order preserved within group
        assert qs[0] == round(float(all_v[0]), 6)      # pr=0 -> global min
        assert qs[-1] == round(float(all_v[-1]), 6)    # pr=1 -> global max
        for i, (_, rid) in enumerate(gvals):
            pos = i / (n - 1) * (len(all_v) - 1)
            lo = int(np.floor(pos))
            hi = min(lo + 1, len(all_v) - 1)
            want = all_v[lo] + (pos - lo) * (all_v[hi] - all_v[lo])
            assert got[(g, rid)] == round(float(want), 6), (g, rid)
    # after normalization the groups share the distribution family:
    # group means pull together vs the raw spread
    raw_means = {g: np.mean([r[2] for r in rows if r[0] == g]) for g in "abc"}
    q_means = {g: np.mean([got[(g, r[1])] for r in rows if r[0] == g]) for g in "abc"}
    assert np.ptp(list(q_means.values())) < np.ptp(list(raw_means.values())) / 3


def test_mutual_information_known_values(spark):
    """MI fixtures: a feature fully determined by the label carries
    H(label) nats; an independent feature carries ~0; a half-informative
    feature sits strictly between.  Verified against sklearn-free
    closed forms."""
    import math

    import numpy as np

    from pyspark.sql import functions as F

    from esa_pfa_spark.operators.encode import mutual_information

    rng = np.random.default_rng(3)
    rows = []
    for i in range(400):
        y = int(rng.random() < 0.5)
        perfect = y                       # = label
        indep = int(rng.random() < 0.5)   # independent coin
        rows.append((i, y, perfect, indep))
    df = spark.createDataFrame(rows, "rid long, y int, perfect int, indep int")
    out = {
        r["feat"]: r["mi"]
        for r in mutual_information(
            df, {"perfect": F.col("perfect"), "indep": F.col("indep")},
            F.col("y") == 1,
        ).collect()
    }
    n1 = sum(r[1] for r in rows)
    p = n1 / len(rows)
    h = -(p * math.log(p) + (1 - p) * math.log(1 - p))
    assert out["perfect"] == pytest.approx(h, abs=1e-4)
    assert out["indep"] == pytest.approx(0.0, abs=0.01)
    assert out["perfect"] > 10 * max(out["indep"], 1e-9)


def test_cramers_v_fixtures(spark):
    """V = 1 for a feature identical to the label, ~0 for an independent
    coin; chi2 matches the scipy-free closed form on a hand 2x2 table;
    constant feature -> NULL V (min(r,c)=1)."""
    from pyspark.sql import functions as F

    from esa_pfa_spark.operators.encode import cramers_v

    # hand 2x2: a=30 b=10 / c=10 d=30 -> chi2 = n(ad-bc)^2/(r1 r2 c1 c2)
    rows = (
        [(i, 1, 1, 1, 0) for i in range(30)]
        + [(i + 30, 1, 0, 1, 0) for i in range(10)]
        + [(i + 40, 0, 1, 0, 0) for i in range(10)]
        + [(i + 50, 0, 0, 0, 0) for i in range(30)]
    )
    df = spark.createDataFrame(rows, "rid long, y int, f int, same int, const int")
    out = {
        r["feat"]: r
        for r in cramers_v(
            df,
            {"f": F.col("f"), "same": F.col("same"), "const": F.col("const")},
            F.col("y") == 1,
        ).collect()
    }
    n, a, b, c, d = 80, 30, 10, 10, 30
    chi2 = n * (a * d - b * c) ** 2 / ((a + b) * (c + d) * (a + c) * (b + d))
    assert out["f"]["chi2"] == pytest.approx(chi2, abs=1e-4)
    assert out["f"]["cramers_v"] == pytest.approx((chi2 / n) ** 0.5, abs=1e-4)
    assert out["same"]["cramers_v"] == pytest.approx(1.0, abs=1e-6)
    assert out["const"]["cramers_v"] is None and out["const"]["dof"] == 0
