"""Distributed k-means vs a sequential numpy oracle, plus semantic and
plan-shape checks."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from esa_pfa_spark.operators.clustering import (
    SCALE,
    assign_clusters,
    kmeans_fit,
)


def _np_kmeans(vecs: np.ndarray, k: int, n_iter: int) -> list[list[int]]:
    """Sequential oracle implementing the identical algorithm: scaled-int
    quantization, lowest-id init (rows assumed pre-sorted by id), int64
    distances, first-min ties, floor(sum/count + 0.5) update."""
    xs = np.floor(vecs.astype(np.float64) * SCALE + 0.5).astype(np.int64)
    cents = [xs[j].tolist() for j in range(k)]
    for _ in range(n_iter):
        c = np.asarray(cents, dtype=np.int64)
        d = ((xs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # argmin takes the FIRST minimum
        nxt = [list(cc) for cc in cents]
        for j in range(k):
            members = xs[assign == j]
            if len(members):
                s = members.sum(axis=0)
                nxt[j] = [
                    int(math.floor(int(si) / len(members) + 0.5)) for si in s
                ]
        cents = nxt
    return cents


vec_tables = st.lists(
    st.lists(
        st.floats(min_value=-2.0, max_value=2.0, allow_nan=False, width=32),
        min_size=4,
        max_size=4,
    ),
    min_size=3,
    max_size=24,
)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(vecs=vec_tables)
def test_kmeans_matches_numpy_oracle(spark, vecs):
    k = min(3, len(vecs))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = kmeans_fit(df, k=k, n_iter=2, vec_col="embedding", id_col="vec_id")
    # the oracle reads float32-quantized values, as parquet/createDataFrame do
    want = _np_kmeans(
        np.asarray(vecs, dtype=np.float32), k=k, n_iter=2
    )
    assert got == want


def test_kmeans_inertia_decreases(spark):
    """Lloyd monotonicity on real data: total squared distance to the
    assigned centroid never increases with more iterations."""
    df = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

    def inertia(n_iter):
        cents = kmeans_fit(df, k=4, n_iter=n_iter)
        scaled = df.select(
            F.col("vec_id").alias("__id"),
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") * SCALE + F.lit(0.5)).cast("long"),
            ).alias("__xs"),
        )
        assigned = assign_clusters(scaled, cents)
        darr = F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        "__xs",
                        F.array(*[F.lit(int(c)).cast("long") for c in cc]),
                        lambda x, c: (x - c) * (x - c),
                    ),
                    F.lit(0).cast("long"),
                    lambda a, d: a + d,
                )
                for cc in cents
            ]
        )
        return (
            assigned.select(F.array_min(darr).alias("d"))
            .agg(F.sum("d"))
            .collect()[0][0]
        )

    i1, i2, i3 = inertia(1), inertia(2), inertia(3)
    assert i2 <= i1 and i3 <= i2


def test_assignment_is_map_only(spark):
    """The per-iteration assignment must not shuffle: centroids are plan
    literals, so the physical plan has NO Exchange before the cluster
    column exists."""
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    scaled = df.select(
        F.col("vec_id").alias("__id"),
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * SCALE + F.lit(0.5)).cast("long"),
        ).alias("__xs"),
    )
    cents = [[0] * 64, [1000] * 64]
    plan = assign_clusters(scaled, cents)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_assignment_arrow_path_matches_literal_path(spark):
    """k*dim above the codegen cutover switches assignment to the numpy
    mapInArrow kernel — same exact int64 distances, same lowest-index tie
    rule, so assignments must be IDENTICAL to the literal-expression
    path on the same centroids (including deliberate ties)."""
    import numpy as np

    rng = np.random.default_rng(11)
    dim = 8
    rows = [
        (i, [float(x) for x in rng.normal(size=dim)]) for i in range(300)
    ]
    rows.append((300, [0.0] * dim))  # equidistant to duplicate centroids
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    scaled = df.select(
        F.col("vec_id").alias("__id"),
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * SCALE + F.lit(0.5)).cast("long"),
        ).alias("__xs"),
    )
    base = [list(rng.integers(-(10**6), 10**6, size=dim)) for _ in range(10)]
    base[7] = list(base[2])  # exact duplicate -> tie must pick index 3
    # same centroids, padded with copies to cross the k*dim<=512 cutover
    k_small = base  # 10*8=80 -> literal path
    k_big = base + [list(c) for c in base] * 7  # 80*8=640 -> arrow path
    lit = {
        r["__id"]: r["cluster"]
        for r in assign_clusters(scaled, k_small).collect()
    }
    arrow = {
        r["__id"]: r["cluster"]
        for r in assign_clusters(scaled, k_big).collect()
    }
    # padded copies never win a tie (higher index), so assignments agree
    assert arrow == lit
    plan = assign_clusters(scaled, k_big)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # still map-only


def test_empty_cluster_keeps_previous_centroid(spark):
    """Two far groups + k=3 where one init centroid captures nothing after
    the first update: its centroid must persist, not NaN/vanish."""
    rows = [(0, [0.0, 0.0]), (1, [0.001, 0.0]), (2, [0.002, 0.0]),
            (3, [10.0, 10.0]), (4, [10.001, 10.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = kmeans_fit(df, k=3, n_iter=3, vec_col="embedding")
    assert len(cents) == 3
    assert all(len(c) == 2 and all(isinstance(x, int) for x in c) for c in cents)
