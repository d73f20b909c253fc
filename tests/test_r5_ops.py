"""r5 operator wave: changepoint localization, correlation matrix,
prefix-cache economics."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from esa_pfa_spark.operators.profile import corr_matrix
from esa_pfa_spark.operators.signal import changepoint_topk
from esa_pfa_spark.operators.tokens import prefix_cache_stats

T0 = dt.datetime(2024, 1, 1)


def _events(spark, series: dict[str, list[float]]):
    rows = []
    for key, vals in series.items():
        for i, v in enumerate(vals):
            rows.append((key, T0 + dt.timedelta(hours=i), f"e{i:04d}", float(v)))
    return spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id string, value double"
    )


class TestChangepoint:
    def test_localizes_step(self, spark):
        # flat 10s then flat 50s: the max |mean_right - mean_left| split
        # with w=3 is exactly at the first 50
        df = _events(spark, {"u1": [10.0] * 8 + [50.0] * 8})
        out = changepoint_topk(
            df, key="user_id", tiebreak="event_id", w=3
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert r["event_id"] == "e0008"  # first post-step event
        assert r["shift_score"] == pytest.approx(40.0)

    def test_requires_full_windows(self, spark):
        df = _events(spark, {"short": [1.0] * 5})  # < 2w events for w=3
        assert changepoint_topk(df, key="user_id", tiebreak="event_id", w=3).count() == 0

    def test_tie_breaks_earliest(self, spark):
        # constant series: every split scores 0.0 -> earliest eligible wins
        df = _events(spark, {"u": [7.0] * 10})
        r = changepoint_topk(df, key="user_id", tiebreak="event_id", w=3).collect()[0]
        assert r["event_id"] == "e0003"  # first position with 3 rows before
        assert r["shift_score"] == 0.0

    def test_matches_numpy_argmax(self, spark):
        rng = np.random.RandomState(2)
        vals = list(rng.uniform(0, 100, 40).round(2))
        df = _events(spark, {"u": vals})
        w = 5
        r = changepoint_topk(df, key="user_id", tiebreak="event_id", w=w).collect()[0]
        scores = [
            abs(sum(vals[i:i + w]) / w - sum(vals[i - w:i]) / w)
            for i in range(w, len(vals) - w + 1)
        ]
        best = int(np.argmax(scores)) + w
        assert r["event_id"] == f"e{best:04d}"
        assert r["shift_score"] == pytest.approx(max(scores), abs=1e-6)


class TestCorrMatrix:
    def test_matches_numpy(self, spark):
        rng = np.random.RandomState(4)
        x = rng.uniform(1, 10, 300)
        y = 2.5 * x + rng.normal(0, 1, 300)   # strongly correlated
        z = rng.uniform(0, 5, 300)            # independent
        df = spark.createDataFrame(
            [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
            "x double, y double, z double",
        )
        out = {(r["col_i"], r["col_j"]): r for r in corr_matrix(df, ["x", "y", "z"]).collect()}
        assert len(out) == 3
        ref = np.corrcoef(np.vstack([x, y, z]))
        # decimal quantization of the moments is 1e-8-ish; 1e-5 is safe
        assert out[("x", "y")]["corr"] == pytest.approx(ref[0, 1], abs=1e-5)
        assert out[("x", "z")]["corr"] == pytest.approx(ref[0, 2], abs=1e-5)
        assert out[("y", "z")]["corr"] == pytest.approx(ref[1, 2], abs=1e-5)
        assert all(r["n"] == 300 for r in out.values())

    def test_pairwise_null_deletion(self, spark):
        df = spark.createDataFrame(
            [(1.0, 1.0, None), (2.0, 2.0, 5.0), (3.0, 3.0, 1.0), (4.0, None, 2.0)],
            "x double, y double, z double",
        )
        out = {(r["col_i"], r["col_j"]): r for r in corr_matrix(df, ["x", "y", "z"]).collect()}
        assert out[("x", "y")]["n"] == 3
        assert out[("x", "z")]["n"] == 3
        assert out[("y", "z")]["n"] == 2
        assert out[("x", "y")]["corr"] == pytest.approx(1.0)

    def test_zero_variance_yields_null(self, spark):
        df = spark.createDataFrame(
            [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "x double, c double"
        )
        r = corr_matrix(df, ["x", "c"]).collect()[0]
        assert r["corr"] is None


class TestPrefixCache:
    def _docs(self, spark):
        rows = [
            # two docs sharing an 8-token prefix within source a
            ("a", list(range(8)) + [100, 101]),
            ("a", list(range(8)) + [200]),
            # unique prefix
            ("a", list(range(50, 60))),
            # too short to participate
            ("a", [1, 2, 3]),
            # source b: three-way shared prefix
            ("b", list(range(8))),
            ("b", list(range(8)) + [1]),
            ("b", list(range(8)) + [2]),
        ]
        return spark.createDataFrame(rows, "source string, tokens array<int>")

    def test_counts(self, spark):
        out = {r["source"]: r for r in prefix_cache_stats(
            self._docs(spark), prefix_len=8, tokens_col="tokens"
        ).collect()}
        a, b = out["a"], out["b"]
        assert a["n_seq"] == 3 and a["n_prefix_groups"] == 2
        assert a["cached_tokens"] == 8          # one extra copy of the shared prefix
        assert a["total_tokens"] == 10 + 9 + 10 + 3
        assert a["hit_frac"] == pytest.approx(8 / 32)
        assert b["n_seq"] == 3 and b["n_prefix_groups"] == 1
        assert b["cached_tokens"] == 16         # two extra copies
        assert b["total_tokens"] == 8 + 9 + 9
        assert b["hit_frac"] == pytest.approx(16 / 26)

    def test_no_eligible_rows_and_null_tokens(self, spark):
        df = spark.createDataFrame(
            [("a", [1, 2]), ("a", None)], "source string, tokens array<int>"
        )
        r = prefix_cache_stats(df, prefix_len=8).collect()[0]
        assert r["n_seq"] == 0 and r["cached_tokens"] == 0
        # NULL token arrays contribute 0 tokens (not Spark's size()=-1)
        assert r["total_tokens"] == 2 and r["hit_frac"] == 0.0
