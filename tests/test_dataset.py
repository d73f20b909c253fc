"""Dataset-assembly operators: deterministic membership/order invariants.
Oracle mirror (test_entry_oracle.py) covers engine parity; these pin the
semantics: assignment is a property of the row (stable across runs and
partitionings), proportions track weights, and the shuffle is a total
permutation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from esa_pfa_spark.operators import dataset as DS


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "web")
        .when(F.col("id") % 3 == 1, "books")
        .otherwise("misc")
        .alias("source"),
    )


def test_hash_split_proportions_and_determinism(docs):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = DS.hash_split(docs, w, seed=1).groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in a}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    # same seed -> identical assignment; different seed -> different
    one = set(
        r["doc_id"]
        for r in DS.hash_split(docs, w, seed=1).filter("split = 'val'").collect()
    )
    two = set(
        r["doc_id"]
        for r in DS.hash_split(docs, w, seed=1).filter("split = 'val'").collect()
    )
    other = set(
        r["doc_id"]
        for r in DS.hash_split(docs, w, seed=2).filter("split = 'val'").collect()
    )
    assert one == two
    assert one != other


def test_hash_split_rejects_bad_weights(docs):
    with pytest.raises(ValueError):
        DS.hash_split(docs, {"a": 0.5, "b": 0.2})


def test_mixture_sample_rates_and_membership(docs):
    out = DS.mixture_sample(
        docs, {"web": 0.5, "books": 1.0}, seed=4, default_rate=0.0
    )
    got = out.groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in got}
    assert "misc" not in counts            # default_rate=0 drops the rest
    assert counts["books"] == 667          # rate 1.0 keeps every books row
    assert abs(counts["web"] / 667 - 0.5) < 0.1
    # membership is per-row deterministic: a second run is identical
    again = {
        r["source"]: r["count"]
        for r in DS.mixture_sample(
            docs, {"web": 0.5, "books": 1.0}, seed=4, default_rate=0.0
        ).groupBy("source").count().collect()
    }
    assert again == counts


@pytest.mark.parametrize("n_parts", [1, 7])
def test_deterministic_shuffle_is_total_permutation(docs, n_parts):
    out = DS.deterministic_shuffle(docs, seed=9, n_partitions=n_parts).collect()
    pos = sorted(r["shuffle_pos"] for r in out)
    assert pos == list(range(2000))        # total order, no gaps/dupes
    # order is seed-determined, not input-order: doc 0..9 are scattered
    head = [r["doc_id"] for r in sorted(out, key=lambda r: r["shuffle_pos"])[:10]]
    assert head != list(range(10))


def test_deterministic_shuffle_partition_invariant(docs):
    a = {
        r["doc_id"]: r["shuffle_pos"]
        for r in DS.deterministic_shuffle(docs, seed=9, n_partitions=2).collect()
    }
    b = {
        r["doc_id"]: r["shuffle_pos"]
        for r in DS.deterministic_shuffle(
            docs.repartition(13), seed=9, n_partitions=8
        ).collect()
    }
    assert a == b


def test_stratified_fixed_k_exact_counts(docs):
    out = DS.stratified_fixed_k(docs, group_col="source", id_col="doc_id", k=7)
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(
        F.count("*").alias("n")).collect()}
    sizes = {r["source"]: r["n"] for r in docs.groupBy("source").agg(
        F.count("*").alias("n")).collect()}
    for src, n in counts.items():
        assert n == min(7, sizes[src])      # exactly k, or the whole group
    assert set(counts) == set(sizes)        # no group dropped


def test_stratified_fixed_k_deterministic_and_partition_invariant(docs):
    a = sorted(r["doc_id"] for r in DS.stratified_fixed_k(docs, k=11).collect())
    b = sorted(
        r["doc_id"]
        for r in DS.stratified_fixed_k(docs.repartition(13), k=11).collect()
    )
    assert a == b
    # different seed -> different panel
    c = sorted(r["doc_id"] for r in DS.stratified_fixed_k(docs, k=11, seed=5).collect())
    assert a != c


def test_token_budget_mix_never_over_and_deterministic(docs):
    tok = docs.withColumn("n_tok", (F.col("doc_id") % 7 + 1).cast("int"))
    budgets = {"src0": 50, "src1": 25}
    out = DS.mixture_by_token_budget(tok, budgets)
    rows = out.collect()
    per_src = {}
    for r in rows:
        per_src.setdefault(r["source"], []).append(r)
    assert set(per_src) <= set(budgets)
    for src, rs in per_src.items():
        total = sum(r["n_tok"] for r in rs)
        assert total <= budgets[src]
        assert max(r["cum_tok"] for r in rs) == total
    # partition-invariant membership
    a = sorted(r["doc_id"] for r in rows)
    b = sorted(
        r["doc_id"]
        for r in DS.mixture_by_token_budget(tok.repartition(13), budgets).collect()
    )
    assert a == b


# ---------------------------------------------------------------------------
# purged_time_folds
# ---------------------------------------------------------------------------

def test_purged_time_folds_semantics(spark):
    """Hand-built timeline, k=2, embargo=10s: every row appears exactly k
    times; the row's own fold is 'test'; rows within the embargo band of
    the OTHER fold are 'purged'; the rest are 'train'.  Brute-force mirror
    of the integer fold geometry."""
    import datetime as dt

    import pandas as pd

    from esa_pfa_spark.operators.dataset import purged_time_folds

    t0 = dt.datetime(2024, 3, 1)
    rows = [(i, t0 + dt.timedelta(seconds=s))
            for i, s in enumerate([0, 5, 30, 49, 50, 60, 95, 99])]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["rid", "ts"]))
    out = purged_time_folds(df, ts="ts", k=2, embargo=dt.timedelta(seconds=10))
    got = {(r["rid"], r["fold"]): r["role"] for r in out.collect()}
    assert len(got) == len(rows) * 2

    min_us = int(t0.timestamp() * 1e6)
    span1 = 99_000_000 + 1
    e_us = 10_000_000
    for rid, ts in rows:
        eus = int(ts.timestamp() * 1e6)
        rf = ((eus - min_us) * 2) // span1
        for fold in (0, 1):
            lo = min_us + (fold * span1 + 1) // 2
            hi = min_us + ((fold + 1) * span1 + 1) // 2 - 1
            if rf == fold:
                want = "test"
            elif lo - e_us <= eus <= hi + e_us:
                want = "purged"
            else:
                want = "train"
            assert got[(rid, fold)] == want, (rid, fold)

    # spot-check the shape: every fold has its own rows as test, and rows
    # just across the midpoint boundary are purged, not train
    assert got[(3, 1)] == "purged"   # s=49 is within 10s of fold 1's start
    assert got[(4, 0)] == "purged"   # s=50 is within 10s of fold 0's end
    assert got[(0, 1)] == "train"    # s=0 is far from fold 1


def test_temperature_mixture_flattens(spark):
    """alpha<1 boosts tail groups: the minority group's keep rate must
    exceed the majority's; alpha=1 reduces to uniform keep_frac; expected
    kept counts track rate*n within hash noise; determinism across runs."""
    import pandas as pd

    from esa_pfa_spark.operators.dataset import temperature_mixture_sample

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "source"]))

    out = temperature_mixture_sample(df, alpha=0.5, keep_frac=0.5)
    rates = {r["source"]: r["rate"] for r in out.select("source", "rate").distinct().collect()}
    assert rates["small"] > rates["big"]
    # p_small^0.5 share grows: q_small = sqrt(.1)/(sqrt(.9)+sqrt(.1)) ~ .25
    # rate_small = .5*1000*.25/100 > 1 -> capped at 1
    assert rates["small"] == 1.0
    assert 0.3 < rates["big"] < 0.5

    kept = {r["source"]: r["n"] for r in out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert kept["small"] == 100  # rate 1 keeps everything
    assert abs(kept["big"] - rates["big"] * 900) < 60

    # alpha=1: q_s == p_s -> every group keeps exactly keep_frac
    flat = temperature_mixture_sample(df, alpha=1.0, keep_frac=0.4)
    fr = {r["source"]: r["rate"] for r in flat.select("source", "rate").distinct().collect()}
    assert abs(fr["big"] - 0.4) < 1e-6 and abs(fr["small"] - 0.4) < 1e-6

    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in temperature_mixture_sample(
        df, alpha=0.5, keep_frac=0.5).collect())
    assert a == b


def test_curriculum_order(spark):
    """Stages are equal-frequency score quartiles (easy first; descending
    flips), stage boundaries respect score order, and the within-stage key
    is the deterministic md5 shuffle."""
    import hashlib

    import pandas as pd

    from esa_pfa_spark.operators.dataset import curriculum_order

    df = spark.createDataFrame(pd.DataFrame(
        [(i, float(i)) for i in range(40)], columns=["doc_id", "difficulty"]
    ))
    out = curriculum_order(df, score="difficulty", n_stages=4).collect()
    stages = {r["doc_id"]: r["stage"] for r in out}
    # equal-frequency quartiles over 0..39: max score of stage s < min of s+1
    for s in range(3):
        lo = [d for d, st in stages.items() if st == s]
        hi = [d for d, st in stages.items() if st == s + 1]
        assert lo and hi and max(lo) < min(hi)
    assert sorted({r["stage"] for r in out}) == [0, 1, 2, 3]
    for r in out:
        assert r["sort_key"] == hashlib.md5(f"cur0:{r['doc_id']}".encode()).hexdigest()

    desc = curriculum_order(df, score="difficulty", n_stages=4, ascending=False)
    dstages = {r["doc_id"]: r["stage"] for r in desc.collect()}
    assert all(dstages[d] == 3 - stages[d] for d in stages)


def test_cluster_safe_split_zero_leakage(spark):
    """Cluster members share a split; split_leakage over the same pair
    list is empty by construction (while raw hash_split does leak on the
    same graph)."""
    import pandas as pd

    from esa_pfa_spark.operators.dataset import (
        cluster_safe_split,
        hash_split,
        split_leakage,
    )

    docs = spark.createDataFrame(pd.DataFrame(
        [(i,) for i in range(200)], columns=["doc_id"]
    ))
    pairs = spark.createDataFrame(pd.DataFrame(
        [(i, i + 100) for i in range(100)], columns=["doc_id_a", "doc_id_b"]
    ))
    w = {"train": 0.8, "val": 0.1, "test": 0.1}

    safe = cluster_safe_split(docs, pairs, weights=w)
    got = {r["doc_id"]: (r["canonical_doc_id"], r["split"]) for r in safe.collect()}
    assert len(got) == 200
    for i in range(100):
        assert got[i][0] == got[i + 100][0] == i
        assert got[i][1] == got[i + 100][1]
    assert split_leakage(pairs, safe.select("doc_id", "split")).count() == 0

    # the raw-id split DOES leak on this graph (sanity that the test bites)
    raw = hash_split(docs, w)
    assert split_leakage(pairs, raw.select("doc_id", "split")).count() > 0


def test_epoch_allocation(spark):
    """Scarce high-priority source hits the repeat cap; abundant source
    stays under one epoch; alpha=1 with budget == corpus gives ~1 epoch
    everywhere; contributed tokens never exceed repeats * inventory."""
    import pandas as pd

    from esa_pfa_spark.operators.dataset import epoch_allocation

    rows = [("big", 1000)] * 90 + [("small", 1000)] * 10
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["source", "n_tok"]))

    out = {r["source"]: r.asDict()
           for r in epoch_allocation(df, budget_tokens=100_000, alpha=0.5,
                                     max_repeats=4.0).collect()}
    # q_small = sqrt(.1)/(sqrt(.9)+sqrt(.1)) ~ .25 -> target 25k over 10k
    # inventory -> repeats 2.5; big: target 75k / 90k -> ~0.83 epochs
    assert abs(out["small"]["repeats"] - 2.5) < 0.01
    assert out["small"]["tokens_contributed"] == int(round(out["small"]["repeats"] * 10_000))
    assert out["big"]["repeats"] < 1.0
    # cap binds under a huge budget
    capped = {r["source"]: r["repeats"]
              for r in epoch_allocation(df, budget_tokens=10_000_000, alpha=0.5,
                                        max_repeats=4.0).collect()}
    assert capped["small"] == 4.0
    # alpha=1, budget == corpus -> one epoch each
    flat = {r["source"]: r["repeats"]
            for r in epoch_allocation(df, budget_tokens=100_000, alpha=1.0,
                                      max_repeats=4.0).collect()}
    assert abs(flat["big"] - 1.0) < 1e-4 and abs(flat["small"] - 1.0) < 1e-4


def test_weighted_sample_topk_is_weight_monotone_and_deterministic(spark):
    """Same (seed, id) -> same priority on any partitioning; a row's
    priority strictly decreases as its weight grows (the A-ES race);
    zero/negative/NULL weights never win."""
    import pandas as pd

    from esa_pfa_spark.operators.dataset import weighted_sample_topk

    pdf = pd.DataFrame({
        "doc_id": list(range(10)),
        "w": [1.0, 2.0, 4.0, 8.0, 1.0, 2.0, 4.0, 8.0, 0.0, -1.0],
    })
    df = spark.createDataFrame(pdf)
    a = weighted_sample_topk(df, k=8, weight_col="w", seed=3).collect()
    b = weighted_sample_topk(
        df.repartition(7), k=8, weight_col="w", seed=3
    ).collect()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    assert {r["doc_id"] for r in a}.isdisjoint({8, 9})     # w <= 0 filtered
    # doubling every weight halves each row's -ln(u)/w priority
    one = {r["doc_id"]: r["priority"] for r in a}
    c = weighted_sample_topk(
        df.withColumn("w", df.w * 2), k=8, weight_col="w", seed=3
    ).collect()
    two = {r["doc_id"]: r["priority"] for r in c}
    for d in one:
        assert two[d] <= one[d]


def test_weighted_sample_topk_plans_take_ordered(spark):
    """The global top-k must plan as TakeOrderedAndProject (per-partition
    heaps + k-merge), never a global Sort + Exchange."""
    import pandas as pd

    from esa_pfa_spark.operators.dataset import weighted_sample_topk

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(100), "w": [1.0] * 100})
    )
    plan = weighted_sample_topk(df, k=5, weight_col="w")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()
