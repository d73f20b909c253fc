"""DSIR importance resampling (operators/importance.py): hashed n-gram
feature map, Laplace-smoothed log-ratio table, decimal-exact per-doc
weights, deterministic Gumbel-top-k — semantics pinned against a pure
numpy/hashlib mirror, plan shape asserted broadcast."""

from __future__ import annotations

import hashlib
import math

import pandas as pd
import pytest

from esa_pfa_spark.operators.importance import (
    dsir_logratio_table,
    dsir_topk_sample,
    dsir_weights,
    hashed_ngram_features,
)
from tests.test_plans import plan_of


def _b(s: str, m: int = 4096) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:6], 16) % m


def _feats(text: str, m: int = 4096):
    ws = text.split(" ")
    grams = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    return [_b(g, m) for g in grams]


RAW = [
    (0, "the cat sat", "en"),
    (1, "the dog ran", "en"),
    (2, "le chat noir", "fr"),
    (3, "the cat ran far away", "en"),
    (4, "der hund lief", "de"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(RAW, columns=["doc_id", "text", "lang"])
    )


def test_hashed_ngram_features_mirror(spark, docs):
    got = {
        r["doc_id"]: list(r["__feat"])
        for r in hashed_ngram_features(docs).select("doc_id", "__feat").collect()
    }
    for i, text, _ in RAW:
        assert got[i] == _feats(text), i
    # single word => no bigrams; empty-ish text still yields one unigram
    one = spark.createDataFrame(pd.DataFrame([(9, "solo")], columns=["doc_id", "text"]))
    assert list(hashed_ngram_features(one).collect()[0]["__feat"]) == [_b("solo")]


def test_dsir_logratio_and_weights_mirror(spark, docs):
    """Log-ratio = ln p_t - ln p_r with +1 smoothing over m buckets; doc
    weight = decimal-exact sum of its buckets' 6dp-rounded ratios."""
    m = 4096
    target = docs.filter(docs.lang == "en")
    lr = dsir_logratio_table(docs, target, m=m)
    got_lr = {r["bucket"]: r["logratio"] for r in lr.collect()}
    assert len(got_lr) == m

    raw_counts: dict[int, int] = {}
    t_counts: dict[int, int] = {}
    for _, text, lang in RAW:
        for b in _feats(text, m):
            raw_counts[b] = raw_counts.get(b, 0) + 1
            if lang == "en":
                t_counts[b] = t_counts.get(b, 0) + 1
    nr = sum(raw_counts.values())
    nt = sum(t_counts.values())
    for b in range(0, m, 97):  # spot-check a stride plus all hot buckets
        want = round(
            math.log((t_counts.get(b, 0) + 1) / (nt + m))
            - math.log((raw_counts.get(b, 0) + 1) / (nr + m)),
            6,
        )
        assert abs(got_lr[b] - want) < 2e-6, b
    for b in raw_counts:
        want = round(
            math.log((t_counts.get(b, 0) + 1) / (nt + m))
            - math.log((raw_counts.get(b, 0) + 1) / (nr + m)),
            6,
        )
        assert abs(got_lr[b] - want) < 2e-6, b

    w = dsir_weights(docs, lr, m=m)
    got_w = {r["doc_id"]: (r["n_feat"], r["log_weight"]) for r in w.collect()}
    for i, text, _ in RAW:
        fs = _feats(text, m)
        want = round(sum(got_lr[b] for b in fs), 6)
        assert got_w[i][0] == len(fs)
        assert abs(got_w[i][1] - want) < 2e-6, i
    # the French/German docs must score below every English doc
    en = {0, 1, 3}
    worst_en = min(got_w[i][1] / got_w[i][0] for i in en)
    for i in (2, 4):
        assert got_w[i][1] / got_w[i][0] < worst_en


def test_dsir_topk_deterministic_and_broadcast(spark, docs):
    target = docs.filter(docs.lang == "en")
    a = dsir_topk_sample(docs, target, k=3, seed=7)
    b = dsir_topk_sample(docs, target, k=3, seed=7)
    assert a.collect() == b.collect()
    assert len(a.collect()) == 3
    c = dsir_topk_sample(docs, target, k=3, seed=8)
    assert [r["doc_id"] for r in c.collect()] != [] # runs; may or may not differ
    # the m-row log-ratio table must ride a broadcast, not a sort-merge join
    plan = plan_of(dsir_weights(docs, dsir_logratio_table(docs, target)))
    assert "BroadcastHashJoin" in plan


def test_dsir_predicate_fast_path_equals_two_corpus(spark, docs):
    """target_predicate (one corpus explode) produces the identical
    log-ratio table and top-k sample as the explicit-target form."""
    from esa_pfa_spark.operators.dedup import graph_components  # noqa: F401  (env warm)

    lr_two = dsir_logratio_table(docs, docs.filter(docs.lang == "en"))
    lr_one = dsir_logratio_table(docs, target_predicate=docs.lang == "en")
    assert lr_two.exceptAll(lr_one).count() == 0
    assert lr_one.exceptAll(lr_two).count() == 0

    s_two = dsir_topk_sample(docs, docs.filter(docs.lang == "en"), k=4)
    s_one = dsir_topk_sample(docs, k=4, target_predicate=docs.lang == "en")
    assert s_two.collect() == s_one.collect()

    import pytest as _pytest
    with _pytest.raises(ValueError):
        dsir_logratio_table(docs)
    with _pytest.raises(ValueError):
        dsir_logratio_table(docs, docs, target_predicate=docs.lang == "en")
