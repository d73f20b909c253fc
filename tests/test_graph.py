"""graph.pagerank — analytic fixtures, mass conservation, dangling
redistribution, and partitioning invariance (the decimal-sum parity
contract implies the estimate can't depend on physical layout)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from esa_pfa_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_two_cycle_is_uniform(spark):
    r = {row["v"]: row["r"] for row in pagerank(_edges(spark, [(0, 1), (1, 0)]), iters=4).collect()}
    assert r[0] == pytest.approx(0.5, abs=1e-9)
    assert r[1] == pytest.approx(0.5, abs=1e-9)


def test_dangling_mass_redistributes(spark):
    # a -> b, b dangling: after one iteration
    # r(a) = 0.15/2 + 0.85 * (0 + 0.25)  = 0.2875
    # r(b) = 0.15/2 + 0.85 * (0.5 + 0.25) = 0.7125
    r = {row["v"]: row["r"] for row in pagerank(_edges(spark, [(0, 1)]), iters=1).collect()}
    assert r[0] == pytest.approx(0.2875, abs=1e-9)
    assert r[1] == pytest.approx(0.7125, abs=1e-9)
    assert r[0] + r[1] == pytest.approx(1.0, abs=1e-9)


def test_mass_conserved_and_hub_wins(spark):
    # every node points at node 0; node 0 points at node 1.  The 0<->1
    # pair oscillates with period 2 (damped by 0.85 per round), so run
    # enough rounds for the hub to dominate at the fixed point.
    n = 50
    pairs = [(i, 0) for i in range(1, n)] + [(0, 1)]
    out = pagerank(_edges(spark, pairs), iters=20).collect()
    r = {row["v"]: row["r"] for row in out}
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-6)
    assert r[0] == max(r.values())
    assert r[1] > r[2]  # the hub's sole target outranks the periphery


def test_partitioning_invariant(spark):
    pairs = [(i, (i * i + 1) % 40) for i in range(40)] + [(i, (i * 7 + 3) % 40) for i in range(40)]
    e = _edges(spark, [p for p in pairs if p[0] != p[1]])
    a = sorted(map(tuple, pagerank(e.repartition(1), iters=3).collect()))
    b = sorted(map(tuple, pagerank(e.repartition(11, "dst"), iters=3).collect()))
    assert a == b


def test_multigraph_multiplicity(spark):
    # duplicate edge doubles the contribution weight: 0 sends 2/3 to 1
    single = pagerank(_edges(spark, [(0, 1), (0, 2), (1, 0), (2, 0)]), iters=6)
    double = pagerank(
        _edges(spark, [(0, 1), (0, 1), (0, 2), (1, 0), (2, 0)]), iters=6
    )
    rs = {row["v"]: row["r"] for row in single.collect()}
    rd = {row["v"]: row["r"] for row in double.collect()}
    assert rs[1] == pytest.approx(rs[2], abs=1e-9)
    assert rd[1] > rd[2]
