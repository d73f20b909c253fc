"""Property tests for the r4-final wave: Morton-key injectivity, the
count-min one-sided guarantee under random streams, table_diff algebra
(identity and insert/delete symmetry), and the bloom no-false-negative
guarantee — seeded-random batched examples, a single Spark run each
(per-example Spark jobs are too slow for hypothesis's default loop)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_morton_key_injective_random(spark, seed):
    """Bit interleave is a bijection on the 2^b x 2^b grid: distinct
    (x, y) pairs must produce distinct keys, and the key must stay
    within [0, 4^b)."""
    from esa_pfa_spark.operators.layout import morton_key

    rng = np.random.default_rng(seed)
    pts = {(int(x), int(y)) for x, y in rng.integers(0, 512, size=(300, 2))}
    df = spark.createDataFrame(sorted(pts), "x long, y long")
    rows = df.select("x", "y", morton_key(F.col("x"), F.col("y"), 9).alias("z")).collect()
    keys = [r["z"] for r in rows]
    assert len(set(keys)) == len(pts)
    assert all(0 <= k < 4**9 for k in keys)


@pytest.mark.parametrize("seed,width,depth", [(0, 16, 2), (1, 64, 4), (2, 8, 3)])
def test_cms_guarantee_random_streams(spark, seed, width, depth):
    """For any stream and any (width, depth): estimate >= exact for every
    key present, and the total per-hash-row mass equals the stream size."""
    from esa_pfa_spark.operators.profile import cms_build, cms_estimate

    rng = np.random.default_rng(seed)
    vals = rng.zipf(1.5, size=600) % 97  # skewed stream, many collisions
    df = spark.createDataFrame([(int(v),) for v in vals], "v long")
    sketch = cms_build(df, "v", width=width, depth=depth)
    row_mass = {r["row"]: r["m"] for r in sketch.groupBy("row").agg(F.sum("cnt").alias("m")).collect()}
    assert all(m == len(vals) for m in row_mass.values())
    exact = df.groupBy("v").agg(F.count(F.lit(1)).alias("n"))
    est = cms_estimate(sketch, exact, "v", width=width, depth=depth)
    for r in exact.join(est, "v").collect():
        assert r["cms_est"] >= r["n"], (r["v"], r["n"], r["cms_est"])


@pytest.mark.parametrize("seed", [0, 1])
def test_table_diff_algebra_random(spark, seed):
    """diff(x, x) is all-unchanged; swapping old/new swaps insert and
    delete counts and preserves update/unchanged — for random tables
    with NULLs."""
    from esa_pfa_spark.plans.diff import table_diff_summary

    rng = np.random.default_rng(seed)

    def tbl(keys):
        return spark.createDataFrame(
            [
                (int(k), float(rng.integers(0, 5)) if rng.random() > 0.2 else None)
                for k in keys
            ],
            "k long, v double",
        )

    old = tbl(range(0, 60))
    new = tbl(range(20, 80))
    fwd = {r["change_type"]: r["n_rows"] for r in table_diff_summary(old, new, ["k"]).collect()}
    rev = {r["change_type"]: r["n_rows"] for r in table_diff_summary(new, old, ["k"]).collect()}
    assert fwd.get("insert", 0) == rev.get("delete", 0) == 20
    assert fwd.get("delete", 0) == rev.get("insert", 0) == 20
    assert fwd.get("update", 0) == rev.get("update", 0)
    assert fwd.get("unchanged", 0) == rev.get("unchanged", 0)
    same = {r["change_type"]: r["n_rows"] for r in table_diff_summary(old, old, ["k"]).collect()}
    assert same == {"unchanged": 60}


@pytest.mark.parametrize("seed,m,k", [(0, 256, 2), (1, 1024, 4)])
def test_bloom_never_drops_members_random(spark, seed, m, k):
    """For random key sets at any (m, k): pruning keeps EVERY true
    member (no false negatives, the bloom contract)."""
    from esa_pfa_spark.operators.profile import bloom_build, bloom_prune

    rng = np.random.default_rng(seed)
    dim_keys = [int(x) for x in rng.integers(0, 10_000, size=150)]
    big_keys = [int(x) for x in rng.integers(0, 10_000, size=2_000)]
    dim = spark.createDataFrame([(x,) for x in set(dim_keys)], "key long")
    big = spark.createDataFrame([(x,) for x in big_keys], "key long")
    pos = bloom_build(dim, "key", m=m, k=k)
    pruned = bloom_prune(big, "key", pos, m=m, k=k)
    true_side = big.join(dim, "key", "left_semi")
    assert true_side.exceptAll(pruned).count() == 0
