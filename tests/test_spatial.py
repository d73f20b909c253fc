"""2-D grid metrics: hand-counted goldens in the reference's test style
(AggregationMetricsTest.java:27-120 / ConnectivityMetricsTest.java)."""

import pandas as pd
import pytest

from esa_pfa_spark.operators import spatial as SP


def _grid(spark, cells):
    pdf = pd.DataFrame(cells, columns=["x", "y", "flag"])
    return spark.createDataFrame(pdf)


def test_adjacency_counts_2x2_diagonal(spark):
    """Checkerboard 2x2: hand-counted ordered 8-neighbor pairs:
    n11=2 (the two set cells see each other), n00=2, n01=n10=4."""
    g = _grid(spark, [(0, 0, True), (1, 0, False), (0, 1, False), (1, 1, True)])
    row = SP.adjacency_counts(g).collect()[0]
    assert (row["n00"], row["n01"], row["n10"], row["n11"]) == (2, 4, 4, 2)
    # invariant: p01 == p10 (AggregationMetricsTest)
    assert row["n01"] == row["n10"]


def test_contagion_all_set_is_one(spark):
    g = _grid(spark, [(x, y, True) for x in range(3) for y in range(3)])
    m = SP.contagion_clumpiness(g)
    assert m["contagion"] == pytest.approx(1.0)
    assert m["n00"] == m["n01"] == m["n10"] == 0


def test_clumpiness_dispersed_negative(spark):
    g = _grid(spark, [(0, 0, True), (1, 0, False), (0, 1, False), (1, 1, True)])
    m = SP.contagion_clumpiness(g)
    # G = 2/6 = 1/3 < p = 1/2 -> clump = (1/3 - 1/2)/(1/2) = -1/3
    assert m["clumpiness"] == pytest.approx(-1 / 3)


def test_connectivity_3x3_full(spark):
    """3x3 all set: only the center has 4 set neighbors ->
    inside=1, border=8, fractal = 2 - 1/9 (ConnectivityMetrics golden)."""
    g = _grid(spark, [(x, y, True) for x in range(3) for y in range(3)])
    row = SP.connectivity_metrics(g).collect()[0]
    assert (row["occupied"], row["inside"], row["border"]) == (9, 1, 8)
    assert row["fractal_index"] == pytest.approx(2 - 1 / 9)


def test_connected_components_two_blobs(spark):
    g = _grid(
        spark,
        [(0, 0, True), (0, 1, True), (1, 1, True), (5, 5, True), (3, 3, False)],
    )
    cc = SP.connected_components(g).toPandas()
    assert len(cc) == 4
    assert cc.groupby("component").size().sort_values(ascending=False).tolist() == [3, 1]
    top = SP.largest_component(g).collect()[0]
    assert (top["max_cluster_size"], top["num_samples"]) == (3, 4)


def test_connected_components_snake(spark):
    """A long connected path must converge via label propagation."""
    cells = [(i, 0, True) for i in range(12)] + [(11, j, True) for j in range(1, 6)]
    cc = SP.connected_components(_grid(spark, cells)).toPandas()
    assert cc["component"].nunique() == 1
    assert len(cc) == 17
