"""Generalized suffix array (prefix doubling) + longest duplicate span."""

from __future__ import annotations

import hashlib
import random

import pytest

from esa_pfa_spark.operators.suffix import longest_duplicate_span, suffix_order


def _df(spark, docs: dict[int, list[int]]):
    rows = [(d, toks) for d, toks in docs.items()]
    return spark.createDataFrame(rows, "doc_id long, tokens array<int>")


def _ref_order(docs: dict[int, list[int]]):
    """Naive reference: sort (suffix, doc, off) lexicographically."""
    sufs = [
        (toks[off:], d, off)
        for d, toks in docs.items()
        for off in range(len(toks))
    ]
    sufs.sort()
    return [(d, off) for _, d, off in sufs]


def _ref_longest_dup(docs: dict[int, list[int]]):
    order = _ref_order(docs)
    sufs = {(d, o): docs[d][o:] for d, o in order}
    best, fps = 0, set()
    for (a, b) in zip(order, order[1:]):
        sa, sb = sufs[a], sufs[b]
        l = 0
        while l < min(len(sa), len(sb)) and sa[l] == sb[l]:
            l += 1
        if l > best:
            best, fps = l, set()
        if l == best:
            fps.add(hashlib.md5(
                ",".join(str(t) for t in sufs[a][:best]).encode()
            ).hexdigest())
    return best, min(fps) if fps else None


class TestSuffixOrder:
    def test_matches_reference_small(self, spark):
        docs = {1: [3, 1, 2, 1], 2: [1, 2, 1], 3: [2, 2]}
        got = suffix_order(_df(spark, docs)).collect()
        by_idx = {r["sa_idx"]: (r["doc_id"], r["off"]) for r in got}
        assert [by_idx[i] for i in range(len(by_idx))] == _ref_order(docs)

    def test_permutation_and_sortedness_random(self, spark):
        rng = random.Random(7)
        docs = {
            d: [rng.randrange(4) for _ in range(rng.randrange(1, 30))]
            for d in range(12)
        }
        got = suffix_order(_df(spark, docs)).collect()
        n = sum(len(t) for t in docs.values())
        idxs = sorted(r["sa_idx"] for r in got)
        assert idxs == list(range(n))  # a permutation
        by_idx = {r["sa_idx"]: (r["doc_id"], r["off"]) for r in got}
        assert [by_idx[i] for i in range(n)] == _ref_order(docs)

    def test_identical_docs_tie_break(self, spark):
        # byte-identical suffixes across docs: order falls back to
        # (doc_id, off) and stays a total order
        docs = {5: [1, 2, 3], 9: [1, 2, 3]}
        got = suffix_order(_df(spark, docs)).collect()
        by_idx = {r["sa_idx"]: (r["doc_id"], r["off"]) for r in got}
        assert [by_idx[i] for i in range(6)] == _ref_order(docs)

    def test_negative_token_raises(self, spark):
        from pyspark.errors import PySparkException

        with pytest.raises(PySparkException, match="sentinel ordering"):
            suffix_order(_df(spark, {1: [1, -2, 3]})).collect()


class TestLongestDuplicateSpan:
    def test_hand_case_cross_doc(self, spark):
        # [7,8,9] occurs in both docs; no longer shared run exists
        docs = {1: [1, 7, 8, 9, 2], 2: [7, 8, 9, 3]}
        r = longest_duplicate_span(_df(spark, docs)).collect()
        assert len(r) == 1
        assert r[0]["dup_len"] == 3
        assert r[0]["span_fp"] == hashlib.md5(b"7,8,9").hexdigest()

    def test_within_doc_repeat(self, spark):
        docs = {1: [4, 5, 4, 5, 4]}  # overlapping repeat: [4,5,4] twice
        r = longest_duplicate_span(_df(spark, docs)).collect()[0]
        assert r["dup_len"] == 3
        assert r["span_fp"] == hashlib.md5(b"4,5,4").hexdigest()

    def test_no_repeats(self, spark):
        docs = {1: [1, 2], 2: [3, 4]}
        r = longest_duplicate_span(_df(spark, docs)).collect()[0]
        assert r["dup_len"] == 0
        assert r["span_fp"] == hashlib.md5(b"").hexdigest()

    def test_matches_reference_random(self, spark):
        rng = random.Random(13)
        docs = {
            d: [rng.randrange(3) for _ in range(rng.randrange(2, 25))]
            for d in range(10)
        }
        want_len, want_fp = _ref_longest_dup(docs)
        r = longest_duplicate_span(_df(spark, docs)).collect()[0]
        assert r["dup_len"] == want_len
        assert r["span_fp"] == want_fp


class TestDuplicateCoverage:
    def _ref_coverage(self, docs: dict[int, list[int]], L: int):
        # independent reference: a position is covered iff it lies inside
        # an exactly-L window that occurs >= 2 times in the corpus
        # (equivalent to ">= L duplicated substring" coverage)
        from collections import Counter

        grams = Counter()
        for toks in docs.values():
            for i in range(len(toks) - L + 1):
                grams[tuple(toks[i:i + L])] += 1
        out = {}
        for d, toks in docs.items():
            covered = set()
            for i in range(len(toks) - L + 1):
                if grams[tuple(toks[i:i + L])] >= 2:
                    covered.update(range(i, i + L))
            out[d] = len(covered)
        return out

    def test_cross_doc_shared_run(self, spark):
        from esa_pfa_spark.operators.suffix import duplicate_coverage

        shared = list(range(100, 118))  # 18 tokens
        docs = {1: [1, 2] + shared + [3], 2: shared + [4, 5, 6]}
        out = {r["doc_id"]: r for r in duplicate_coverage(
            _df(spark, docs), min_len=16).collect()}
        assert out[1]["dup_tokens"] == 18 and out[2]["dup_tokens"] == 18
        assert out[1]["n_tok"] == 21
        assert out[1]["dup_frac"] == round(18 / 21, 6)

    def test_below_threshold_reports_zero(self, spark):
        from esa_pfa_spark.operators.suffix import duplicate_coverage

        shared = list(range(100, 115))  # 15 < min_len
        docs = {1: shared + [1], 2: shared + [2]}
        out = {r["doc_id"]: r["dup_tokens"] for r in duplicate_coverage(
            _df(spark, docs), min_len=16).collect()}
        assert out == {1: 0, 2: 0}

    def test_matches_lgram_reference_random(self, spark):
        from esa_pfa_spark.operators.suffix import duplicate_coverage
        import random

        rng = random.Random(29)
        # planted duplicates over a small alphabet + random filler
        motif = [rng.randrange(50) for _ in range(9)]
        docs = {}
        for d in range(12):
            body = [rng.randrange(50) for _ in range(rng.randrange(5, 30))]
            if d % 3 == 0:
                at = rng.randrange(0, max(1, len(body) - 1))
                body = body[:at] + motif + body[at:]
            docs[d] = body
        L = 6
        want = self._ref_coverage(docs, L)
        got = {r["doc_id"]: r["dup_tokens"] for r in duplicate_coverage(
            _df(spark, docs), min_len=L).collect()}
        assert got == want


def test_empty_and_single_token_corpora(spark):
    # empty corpus: no suffixes, empty SA; single 1-token doc: one suffix
    empty = spark.createDataFrame([], "doc_id long, tokens array<int>")
    assert suffix_order(empty).count() == 0
    assert longest_duplicate_span(empty).count() == 0  # no adjacent pair
    one = _df(spark, {1: [7]})
    rows = suffix_order(one).collect()
    assert [(r["doc_id"], r["off"], r["sa_idx"]) for r in rows] == [(1, 0, 0)]
