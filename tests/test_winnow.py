"""Winnowing fingerprints + cross-source rank drift: correctness
properties (the Schleimer guarantee, density bound, rightmost-min tie
break) and plan shape (the selection is in-row: zero shuffles)."""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F

from esa_pfa_spark.operators.tokens import (
    token_rank_drift,
    winnow_dup_pairs,
    winnow_fingerprints,
    winnow_selected_fps,
)

from tests.test_plans import n_exchanges, plan_of


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [r[0] for r in rows], "tokens": [r[1] for r in rows]}
        )
    ).select("doc_id", F.col("tokens").cast("array<int>").alias("tokens"))


def _winnow_oracle(toks, k=4, w=4):
    """Sequential reference: per-window rightmost min of md5(k-gram)."""
    m = len(toks) - k + 1
    if m < 1:
        return set()
    keys = []
    for i in range(m):
        h = hashlib.md5(",".join(str(t) for t in toks[i:i + k]).encode()).hexdigest()
        keys.append(h + str(999999 - i).zfill(6))
    sel = set()
    for s in range(max(m - w, 0) + 1):
        sel.add(min(keys[s:s + w]))
    return sel


def test_winnow_matches_sequential_oracle(spark):
    rows = [
        ("a", [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]),
        ("b", [5, 5, 5, 5, 5, 5, 5, 5]),          # all grams identical: tie break
        ("c", [1, 2, 3, 4]),                       # exactly one gram
        ("d", [9, 8, 7, 6, 5, 4, 3]),
    ]
    got = {
        r["doc_id"]: (r["n_fp"], r["n_grams"])
        for r in winnow_fingerprints(_docs(spark, rows), k=4, w=4).collect()
    }
    for doc, toks in rows:
        sel = _winnow_oracle(toks, 4, 4)
        assert got[doc][0] == len(sel), doc
        assert got[doc][1] == len(toks) - 3


def test_winnow_tie_break_rightmost(spark):
    # identical grams everywhere -> every window min is its RIGHTMOST gram
    # (largest pos => smallest reversed-pos suffix): selection = one fp per
    # window end position from w-1 .. m-1 => m - w + 1 distinct positions.
    out = winnow_fingerprints(_docs(spark, [("b", [5] * 12)]), k=4, w=4).collect()[0]
    m = 12 - 3
    assert out["n_grams"] == m
    assert out["n_fp"] == m - 4 + 1


def test_winnow_short_doc_excluded(spark):
    out = winnow_fingerprints(_docs(spark, [("s", [1, 2, 3]), ("t", [1, 2, 3, 4])]), k=4, w=4)
    assert [r["doc_id"] for r in out.collect()] == ["t"]


def test_winnow_guarantee_shared_substring(spark):
    # Schleimer guarantee: a common substring of length >= k + w - 1 (= 7)
    # forces at least one shared selected hash -> the pair surfaces.
    common = [101, 102, 103, 104, 105, 106, 107, 108]  # 8 tokens > 7
    rows = [
        ("x", [1, 2, 3] + common + [4, 5, 6]),
        ("y", [7, 8] + common + [9]),
        ("z", [20, 21, 22, 23, 24, 25, 26, 27, 28]),   # unrelated
    ]
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in winnow_dup_pairs(
            _docs(spark, rows), k=4, w=4, min_shared=1, max_fp_freq=50
        ).collect()
    }
    assert ("x", "y") in pairs
    assert all(p == ("x", "y") for p in pairs)


def test_winnow_density_bound(spark):
    # winnowing keeps at most one fp per window start: n_fp <= m - w + 1,
    # and at least one fp overall.
    rows = [("r%d" % i, [(j * 7 + i) % 97 for j in range(30)]) for i in range(6)]
    for r in winnow_fingerprints(_docs(spark, rows), k=4, w=4).collect():
        assert 1 <= r["n_fp"] <= r["n_grams"] - 4 + 1


def test_winnow_fingerprints_plan_no_shuffle(spark):
    plan = plan_of(winnow_fingerprints(_docs(spark, [("a", [1, 2, 3, 4, 5])])))
    assert n_exchanges(plan) == 0, "in-row selection must not shuffle"


def test_winnow_selected_fps_unique_per_doc(spark):
    fps = winnow_selected_fps(_docs(spark, [("b", [5] * 12)]), k=4, w=4).collect()
    # all grams identical -> all selected HASHES equal -> exactly one row
    assert len(fps) == 1


def test_winnow_oversized_doc_fails_loudly(spark):
    # Past 10^6 k-grams the lpad(999999 - i) position suffix goes negative
    # and would silently corrupt the rightmost-min tie-break; the guard
    # must instead fail the job at execution time.
    import pytest
    from esa_pfa_spark.operators.tokens import _WINNOW_MAX_GRAMS

    big = _docs(spark, [("huge", list(range(_WINNOW_MAX_GRAMS + 4)))])
    with pytest.raises(Exception, match="exceeds 999999 k-grams"):
        winnow_fingerprints(big, k=4, w=4).collect()


def test_winnow_bound_edge_is_accepted(spark):
    # m == _WINNOW_MAX_GRAMS exactly (suffix 000000) must still work: pin
    # the boundary so a future off-by-one in the guard fails here.
    from esa_pfa_spark.operators.tokens import _WINNOW_MAX_GRAMS

    n_tok = _WINNOW_MAX_GRAMS + 3  # m = n_tok - k + 1 = bound
    edge = _docs(spark, [("edge", [1] * n_tok)])
    row = winnow_fingerprints(edge, k=4, w=4).collect()[0]
    assert row["n_grams"] == _WINNOW_MAX_GRAMS


def test_rank_drift_bounds_and_self_similarity(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "source": ["s1"] * 3 + ["s2"] * 3 + ["s3"] * 3,
                "tokens": [
                    [1, 1, 1, 2, 2, 3], [1, 2, 3], [1, 1, 2],
                    [1, 1, 1, 2, 2, 3], [1, 2, 3], [1, 1, 2],   # s2 == s1
                    [3, 3, 3, 3, 2, 2, 1], [3, 2], [3, 3],      # s3 reversed
                ],
            }
        )
    ).select("source", F.col("tokens").cast("array<int>").alias("tokens"))
    out = {
        (r["source_a"], r["source_b"]): r
        for r in token_rank_drift(df).collect()
    }
    assert out[("s1", "s2")]["spearman_rho"] == 1.0  # identical corpora
    assert out[("s1", "s3")]["spearman_rho"] == -1.0  # exactly reversed ranks
    for r in out.values():
        assert -1.0 <= r["spearman_rho"] <= 1.0
        assert r["n_common"] == 3
