"""Approximate (sketch) scale paths and their accuracy contracts.

At 100 TB the exact forms of some aggregations are the wrong default:
exact percentiles need a full sort/collect of each group, exact distinct
counts need a full shuffle of the key set.  Spark's built-in sketches
(HLL++ approx_count_distinct, GK percentile_approx) replace them at a
bounded, configurable error.  These tests pin the engine's accuracy
contract for both against the exact answers on the driver testdata —
the same swap-in points the reference tuned with Lucene precisionStep
(SURVEY.md §4: 'Parquet/Iceberg min-max + sketch skipping')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_hll_distinct_within_2pct(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    exact = ev.select(F.countDistinct("user_id")).collect()[0][0]
    approx = ev.select(F.approx_count_distinct("user_id", rsd=0.02)).collect()[0][0]
    assert abs(approx - exact) <= max(0.05 * exact, 2), (exact, approx)


def test_hll_distinct_mergeable_across_groups(spark):
    """The sketch must be algebraic: per-group counts at rsd=0.02 within
    5% of exact per group (map-side partials merge correctly)."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    approx = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("n"))
        .collect()
    }
    for k, ex in exact.items():
        assert abs(approx[k] - ex) <= max(0.05 * ex, 2), (k, ex, approx[k])


def test_percentile_approx_within_band(spark):
    """GK-sketch percentiles with accuracy=10000 vs exact F.percentile:
    within 1% of the value range on the events table."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    row = ev.select(
        F.percentile(F.col("value"), F.lit(0.5)).alias("exact_p50"),
        F.percentile_approx("value", 0.5, 10000).alias("approx_p50"),
        F.percentile(F.col("value"), F.lit(0.9)).alias("exact_p90"),
        F.percentile_approx("value", 0.9, 10000).alias("approx_p90"),
        (F.max("value") - F.min("value")).alias("rng"),
    ).collect()[0]
    assert abs(row.approx_p50 - row.exact_p50) <= 0.01 * row.rng
    assert abs(row.approx_p90 - row.exact_p90) <= 0.01 * row.rng


def test_stx_approx_variant_close_to_exact(spark):
    """The STX vector with approx percentiles (the 100 TB grouped form)
    stays within 1% of the exact-percentile STX on every group."""
    from esa_pfa_spark.operators.features import stx_aggregate

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    exact = {r["event_type"]: r for r in stx_aggregate(ev, ["event_type"], "value").collect()}
    approx = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.percentile_approx("value", 0.1, 10000).alias("p10"),
            F.percentile_approx("value", 0.5, 10000).alias("p50"),
            F.percentile_approx("value", 0.9, 10000).alias("p90"),
        )
        .collect()
    }
    for k, ex in exact.items():
        rng = ex["max"] - ex["min"]
        for p in ("p10", "p50", "p90"):
            assert abs(approx[k][p] - ex[p]) <= 0.01 * rng, (k, p)


def test_ddsketch_relative_error_guarantee(spark):
    """DDSketch's contract: every quantile estimate is within relative
    error alpha of the EXACT quantile of the sketched (positive) values —
    guaranteed by construction, not probabilistic."""
    from esa_pfa_spark.operators.profile import ddsketch_quantiles

    alpha = 0.02
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    qs = [0.5, 0.9, 0.99]
    est = {
        (r["event_type"], r["q"]): r["q_est"]
        for r in ddsketch_quantiles(
            ev, "value", qs, group_col="event_type", alpha=alpha
        ).collect()
    }
    import numpy as np

    pdf = ev.filter(F.col("value") > 0).select("event_type", "value").toPandas()
    for et, g in pdf.groupby("event_type"):
        v = np.sort(g["value"].to_numpy(dtype="float64"))
        for q in qs:
            # the bin holding the ceil(q*n)-th positive value
            exact = v[int(np.ceil(q * len(v))) - 1]
            rel = abs(est[(et, q)] - exact) / exact
            assert rel <= alpha + 1e-9, (et, q, est[(et, q)], exact, rel)


def test_ddsketch_merges_across_splits(spark):
    """Sketching two halves separately and summing bin counts answers the
    same as one pass — the mergeability property that lets the sketch
    compose with incremental maintenance.  Verified end-to-end: sketch
    of (half1 UNION half2) == sketch of the whole."""
    from esa_pfa_spark.operators.profile import ddsketch_quantiles

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    whole = ddsketch_quantiles(ev, "value", [0.9], group_col="event_type")
    h1 = ev.filter(F.col("event_id") % 2 == 0)
    h2 = ev.filter(F.col("event_id") % 2 == 1)
    merged = ddsketch_quantiles(
        h1.unionByName(h2), "value", [0.9], group_col="event_type"
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


def test_portable_hll_accuracy_and_regime_switch(spark):
    """profile.hll_distinct (the cross-engine-exact HLL, vs the builtin
    HLL++ above): at p=8 the standard error is 1.04/sqrt(256) ~ 6.5%, so
    10k distincts must land within 20% (3 sigma); 40 distincts must take
    the linear-counting branch and land within 10%."""
    from esa_pfa_spark.operators.profile import hll_distinct

    big = spark.range(20_000).select((F.col("id") % 10_000).alias("v"))
    est = hll_distinct(big, "v", p=8).collect()[0]
    assert est["n_rows"] == 20_000
    assert abs(est["hll_est"] - 10_000) / 10_000 < 0.20, est["hll_est"]

    small = spark.range(400).select((F.col("id") % 40).alias("v"))
    est2 = hll_distinct(small, "v", p=8).collect()[0]
    assert abs(est2["hll_est"] - 40) / 40 < 0.10, est2["hll_est"]


def test_portable_hll_partitioning_invariant(spark):
    """Register maxima are order/partitioning-free; the estimate must be
    bit-identical under any repartitioning (the mergeability property)."""
    from esa_pfa_spark.operators.profile import hll_distinct

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    a = hll_distinct(ev.repartition(1), "user_id", "event_type").collect()
    b = hll_distinct(ev.repartition(17, "user_id"), "user_id", "event_type").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_portable_hll_higher_p_tightens(spark):
    """Raising p (more registers) must tighten the estimate on the same
    data — the knob production turns instead of exact countDistinct."""
    from esa_pfa_spark.operators.profile import hll_distinct

    big = spark.range(30_000).select((F.col("id") % 15_000).alias("v"))
    e8 = hll_distinct(big, "v", p=8).collect()[0]["hll_est"]
    e12 = hll_distinct(big, "v", p=12).collect()[0]["hll_est"]
    assert abs(e12 - 15_000) <= abs(e8 - 15_000) + 0.02 * 15_000
    assert abs(e12 - 15_000) / 15_000 < 0.05

    with pytest.raises(ValueError):
        hll_distinct(big, "v", p=2)


def test_cms_never_underestimates(spark):
    """Count-min's one-sided guarantee: with width=32 (forced
    collisions on ~hundreds of distinct words) every estimate must be
    >= exact, and at least one collision must show overest > 0."""
    from esa_pfa_spark.operators.profile import cms_build, cms_estimate

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    words = docs.select(F.explode(F.split("text", " ")).alias("w"))
    sketch = cms_build(words, "w", width=32, depth=4)
    exact = words.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    est = cms_estimate(sketch, exact, "w", width=32, depth=4)
    joined = exact.join(est, "w").collect()
    assert len(joined) > 20  # the synthetic corpus has ~31 distinct words
    assert all(r["cms_est"] >= r["n"] for r in joined)
    assert any(r["cms_est"] > r["n"] for r in joined)


def test_cms_merges_by_addition(spark):
    """Sketches of two halves summed cell-wise equal the whole-corpus
    sketch — the mergeability that lets partitions/days combine."""
    from esa_pfa_spark.operators.profile import cms_build

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    whole = cms_build(words, "w", width=64, depth=3)
    h1 = cms_build(words.filter(F.col("doc_id") % 2 == 0), "w", width=64, depth=3)
    h2 = cms_build(words.filter(F.col("doc_id") % 2 == 1), "w", width=64, depth=3)
    merged = (
        h1.unionByName(h2)
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


def test_cms_absent_key_collision_bounded(spark):
    """An absent key's estimate is pure collision mass: bounded by
    e/width * N with overwhelming probability at depth 4."""
    from esa_pfa_spark.operators.profile import cms_build, cms_estimate

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    words = docs.select(F.explode(F.split("text", " ")).alias("w"))
    n_total = words.count()
    sketch = cms_build(words, "w", width=256, depth=4)
    probe = spark.createDataFrame(
        [("__never_in_corpus__",), ("__also_absent__",)], "w string"
    )
    est = {r["w"]: r["cms_est"] for r in cms_estimate(sketch, probe, "w", width=256, depth=4).collect()}
    for v in est.values():
        assert 0 <= v <= 3 * 2.72 / 256 * n_total


def test_bloom_prune_no_false_negatives_and_forced_fps(spark):
    """Bloom soundness: every true key survives pruning; at an undersized m
    (8192 bits for ~1500 keys) collisions must produce false positives, which the real
    join then removes — pruning never changes the join's result."""
    from esa_pfa_spark.operators.profile import bloom_build, bloom_prune

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select("l_orderkey")
    dim = orders.filter(F.col("o_totalprice") > 450000).select("o_orderkey")
    pos = bloom_build(dim, "o_orderkey", m=8192, k=3)
    pruned = bloom_prune(li, "l_orderkey", pos, m=8192, k=3)
    true_keys = li.join(dim, li["l_orderkey"] == dim["o_orderkey"], "left_semi")
    n_true, n_pruned = true_keys.count(), pruned.count()
    # soundness: the true matches are a subset of the pruned survivors
    assert true_keys.exceptAll(pruned).count() == 0
    assert n_pruned > n_true  # forced collisions at the undersized m
    # the survivors still shrink the big side substantially
    assert n_pruned < li.count()


def test_bloom_prune_is_map_side_only(spark):
    """The pruning joins must all be broadcast semi-joins: zero shuffle
    exchanges anywhere in the pruned plan's big-side path (the
    positions build may shuffle its <= m distinct rows; that subtree
    ends in the BroadcastExchange, which must be the only exchange
    feeding the joins)."""
    import re

    from tests.test_plans import n_exchanges, plan_of
    from esa_pfa_spark.operators.profile import bloom_build, bloom_prune

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select("l_orderkey")
    dim = orders.filter(F.col("o_totalprice") > 450000).select("o_orderkey")
    # materialize the <= m position rows once (the production shape: the
    # filter is built once and shipped; its build-side shuffle of <= m
    # rows is not part of the per-scan cost)
    pos_rows = bloom_build(dim, "o_orderkey", m=4096, k=4).collect()
    pos = spark.createDataFrame(pos_rows, "pos int")
    plan = plan_of(bloom_prune(li, "l_orderkey", pos, m=4096, k=4), "simple")
    assert len(re.findall(r"BroadcastHashJoin .*LeftSemi", plan)) == 4
    assert n_exchanges(plan) == 0, plan
