"""mg_heavy_hitters: Misra-Gries guarantee contracts on Zipfian data —
underestimates only, bounded error, no heavy hitter missed."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from esa_pfa_spark.operators.tokens import mg_heavy_hitters


def _zipf_corpus(spark, n_docs=400, mean_len=40, seed=3):
    rng = np.random.default_rng(seed)
    arrs = [
        np.minimum(rng.zipf(1.3, rng.poisson(mean_len) + 1), 5000)
        .astype("int32").tolist()
        for _ in range(n_docs)
    ]
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(n_docs), "tokens": arrs}),
        "doc_id long, tokens array<int>",
    )


def test_mg_guarantees_hold(spark):
    df = _zipf_corpus(spark)
    k, m = 16, 50
    out = mg_heavy_hitters(df, k=k, m=m, n_summaries=8).collect()
    assert out, "sketch returned nothing"
    err_bound = out[0]["err_bound"]
    exact = {
        r["token"]: r["cnt"]
        for r in df.select(F.explode("tokens").alias("token"))
        .groupBy("token").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    n_total = sum(exact.values())
    assert 0 < err_bound <= n_total // (k + 1) + 1

    got = {r["token"]: r["est_count"] for r in out}
    for tok, est in got.items():
        true = exact[tok]
        assert est <= true, "MG must underestimate"
        assert true - est <= err_bound, "error bound violated"

    # completeness: every token with true count > err_bound must be found
    # (m is large enough here that the top-m cut doesn't hide any)
    heavy = {t for t, c in exact.items() if c > err_bound}
    assert len(heavy) <= m
    assert heavy <= set(got), f"missed heavy hitters: {heavy - set(got)}"


def test_mg_partition_layout_invariant(spark):
    df = _zipf_corpus(spark, n_docs=200)
    a = mg_heavy_hitters(df, k=8, m=10, n_summaries=4).collect()
    b = mg_heavy_hitters(df.repartition(17), k=8, m=10, n_summaries=4).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
