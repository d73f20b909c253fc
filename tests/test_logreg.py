"""Batch-gradient logistic regression (scoring.logreg_fit).

The trainer's engine-exactness contract: per-row gradient terms are
6dp-rounded then decimal-summed (partition-order-free) and the weight
step runs one fixed IEEE op chain — so a sequential numpy reference that
applies the SAME rounding must reproduce the weights bit-for-bit, and
the result must be invariant to input partitioning.  Learning itself is
sanity-checked on a linearly separable cloud.
"""

from __future__ import annotations

import numpy as np
import pytest

from esa_pfa_spark.operators.scoring import logreg_fit, logreg_summary


def _cloud(n=400, dims=4, seed=7):
    """Separable-ish two-class cloud: class 1 shifted +1 along dim 0."""
    rng = np.random.default_rng(seed)
    x = rng.normal(0.0, 1.0, size=(n, dims))
    y = (rng.random(n) < 0.5).astype(int)
    x[:, 0] += y * 1.0
    return x, y


def _numpy_gd(x, y, lr=0.5, iters=6):
    """Sequential reference of the identical decimal-rounded GD.

    np.round is half-even while the engines round half-up — on this
    continuous data no gradient term lands on a 5e-7 boundary, so the
    conventions agree (asserted by the exact-equality check below; a
    boundary hit would fail loudly, not silently pass)."""
    n, dims = x.shape
    w = np.zeros(dims)
    b = 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(x @ w + b)))
        g = np.round((p - y)[:, None] * x, 6)
        gb = np.round(p - y, 6)
        # decimal-exact sums: scale to integer micro-units
        s = np.rint(g * 10**6).astype(np.int64).sum(axis=0) / 10**6
        sb = np.rint(gb * 10**6).astype(np.int64).sum() / 10**6
        w = np.array([w[j] - lr * (s[j] / n) for j in range(dims)])
        b = b - lr * (sb / n)
    return w, b


@pytest.fixture(scope="module")
def cloud_df(spark):
    x, y = _cloud()
    rows = [(int(i), [float(v) for v in x[i]], int(y[i])) for i in range(len(y))]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    ).persist()


def test_logreg_matches_sequential_reference(spark, cloud_df):
    x, y = _cloud()
    # positive=1: class-1 rows are the positive class
    w, b, n = logreg_fit(cloud_df, positive=1, dims=4, lr=0.5, iters=6)
    w_ref, b_ref = _numpy_gd(x, y)
    assert n == len(y)
    # bit-for-bit: same decimal sums, same IEEE step order
    assert w == pytest.approx(list(w_ref), abs=0.0)
    assert b == pytest.approx(b_ref, abs=0.0)


def test_logreg_partitioning_invariant(spark, cloud_df):
    w1, b1, _ = logreg_fit(cloud_df.repartition(1), positive=1, iters=3)
    w13, b13, _ = logreg_fit(cloud_df.repartition(13, "label"), positive=1, iters=3)
    assert w1 == w13 and b1 == b13


def test_logreg_calibration_bins(spark, cloud_df):
    from esa_pfa_spark.operators.scoring import logreg_calibration

    out = logreg_calibration(
        spark, cloud_df, n_bins=10, positive=1, dims=4, lr=0.5, iters=6
    ).collect()
    assert sum(r["n"] for r in out) == 400
    bins = [r["bin"] for r in out]
    assert bins == sorted(bins) and all(0 <= b <= 9 for b in bins)
    for r in out:
        assert 0.0 <= r["conf"] <= 1.0 and 0.0 <= r["acc"] <= 1.0
        # mean confidence sits inside (or within rounding of) its bin
        assert r["bin"] / 10 - 1e-6 <= r["conf"] <= (r["bin"] + 1) / 10 + 1e-6
        assert r["gap"] == pytest.approx(abs(r["acc"] - r["conf"]), abs=2e-6)


def test_logreg_learns_separable_direction(spark, cloud_df):
    w, b, _ = logreg_fit(cloud_df, positive=1, dims=4, lr=0.5, iters=6)
    # the shifted dimension dominates the learned direction
    assert w[0] > 0
    assert abs(w[0]) > 3 * max(abs(v) for v in w[1:])
    summary = {
        r["name"]: r["value"]
        for r in logreg_summary(
            spark, cloud_df, positive=1, dims=4, lr=0.5, iters=6
        ).collect()
    }
    assert summary["accuracy"] >= 0.65  # 6 GD rounds on a 1-sigma shift
    assert summary["n_rows"] == 400.0
