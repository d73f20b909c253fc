"""Property-based tests (hypothesis) for the token-sequence operators:
chunking must reconstruct the input exactly, packing must tile the global
token stream exactly under ANY partitioning, and the dup-span summary
must match a brute-force sequential oracle on arbitrary corpora.

Spark round-trips are expensive, so each property uses few, large
examples (deadline disabled), mirroring test_property_asof.py."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from esa_pfa_spark.operators import tokens as TK

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

corpus = st.lists(
    st.lists(st.integers(min_value=0, max_value=7), min_size=0, max_size=30),
    min_size=1,
    max_size=12,
)


@given(docs=corpus, max_len=st.integers(2, 6), stride=st.integers(1, 6))
@SET
def test_chunk_windows_cover_and_reconstruct(spark, docs, max_len, stride):
    """Every chunk equals the corresponding slice of the source array
    (checked via the fingerprint), chunk starts are exactly the stride
    grid, and with stride >= max_len chunk lengths sum to n_tok."""
    import hashlib

    rows = [(f"d{i}", d) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = TK.chunk_tokens(df, max_len=max_len, stride=stride).collect()
    by_doc: dict[str, list] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, d in enumerate(docs):
        rs = sorted(by_doc.get(f"d{i}", []), key=lambda r: r["chunk_idx"])
        starts = [s for s in range(0, len(d), stride)]
        assert len(rs) == len(starts)
        for r, s in zip(rs, starts):
            want = d[s : s + max_len]
            assert r["n_chunk"] == len(want)
            fp = hashlib.md5(",".join(map(str, want)).encode()).hexdigest()
            assert r["chunk_fp"] == fp
        if stride >= max_len and rs:
            # non-last windows are full (s + max_len <= s + stride < n);
            # the last covers whatever remains of the doc past its start
            covered = sum(r["n_chunk"] for r in rs)
            last_start = (len(starts) - 1) * stride
            assert covered == (len(starts) - 1) * max_len + min(
                max_len, len(d) - last_start
            )


@given(
    ntoks=st.lists(st.integers(1, 50), min_size=1, max_size=40),
    capacity=st.integers(2, 64),
    n_parts=st.integers(1, 6),
)
@SET
def test_pack_tiles_globally_under_any_partitioning(spark, ntoks, capacity, n_parts):
    """Union of (chunk_id, in-chunk spans) tiles [0, total) exactly:
    per-chunk sums equal capacity except the last, per-doc sums equal
    n_tok, and results are identical for every n_partitions."""
    rows = [("s", f"d{i:03d}", n) for i, n in enumerate(ntoks)]
    df = spark.createDataFrame(rows, "source string, doc_id string, n_tok int")
    out = TK.pack_offsets(df, capacity=capacity, n_partitions=n_parts).collect()
    total = sum(ntoks)
    assert sum(r["n_in_chunk"] for r in out) == total
    per_chunk: dict[int, int] = {}
    per_doc: dict[str, int] = {}
    for r in out:
        per_chunk[r["chunk_id"]] = per_chunk.get(r["chunk_id"], 0) + r["n_in_chunk"]
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["n_in_chunk"]
    last = max(per_chunk)
    assert set(per_chunk) == set(range(last + 1))
    for cid, s in per_chunk.items():
        assert s == capacity or (cid == last and 0 < s <= capacity)
    for i, n in enumerate(ntoks):
        assert per_doc[f"d{i:03d}"] == n


def _dup_oracle(docs, n, min_count):
    from collections import Counter

    occ = Counter()
    for d in docs:
        for s in range(len(d) - n + 1):
            occ[tuple(d[s : s + n])] += 1
    out = {}
    for i, d in enumerate(docs):
        ss = [
            s
            for s in range(len(d) - n + 1)
            if occ[tuple(d[s : s + n])] >= min_count
        ]
        if not ss:
            continue
        spans, cur = [], [ss[0], ss[0]]
        for s in ss[1:]:
            if s - cur[1] <= n:
                cur[1] = s
            else:
                spans.append(cur)
                cur = [s, s]
        spans.append(cur)
        out[f"d{i}"] = (
            len(d),
            len(ss),
            len(spans),
            sum(e + n - b for b, e in spans),
        )
    return out


@given(docs=corpus, n=st.integers(2, 4))
@SET
def test_dup_ngram_matches_sequential_oracle(spark, docs, n):
    rows = [(f"d{i}", d) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = {
        r["doc_id"]: (r["n_tok"], r["n_dup_windows"], r["n_spans"], r["dup_tokens"])
        for r in TK.dup_ngram_summary(df, n=n).collect()
    }
    assert got == _dup_oracle(docs, n, 2)


@given(
    train=corpus,
    ev=st.lists(
        st.lists(st.integers(min_value=0, max_value=7), min_size=0, max_size=30),
        min_size=1, max_size=6,
    ),
    n=st.integers(2, 5),
)
@SET
def test_decontaminate_matches_set_oracle(spark, train, ev, n):
    """Per-doc eval-hit counts equal a brute-force python n-gram-set oracle
    on arbitrary corpora (small alphabet forces heavy overlap)."""
    tr_rows = [(f"t{i}", d) for i, d in enumerate(train)]
    ev_rows = [(f"e{i}", d) for i, d in enumerate(ev)]
    tdf = spark.createDataFrame(tr_rows, "doc_id string, tokens array<int>")
    edf = spark.createDataFrame(ev_rows, "doc_id string, tokens array<int>")
    got = {r["doc_id"]: r for r in TK.decontaminate(tdf, edf, n=n).collect()}

    eval_grams = {
        tuple(d[s : s + n]) for d in ev for s in range(len(d) - n + 1)
    }
    for i, d in enumerate(train):
        wins = [tuple(d[s : s + n]) for s in range(len(d) - n + 1)]
        if not wins:
            assert f"t{i}" not in got
            continue
        r = got[f"t{i}"]
        hits = sum(1 for w in wins if w in eval_grams)
        assert r["n_windows"] == len(wins)
        assert r["n_eval_hits"] == hits
        assert r["contaminated"] == (hits > 0)
        assert r["contamination_frac"] == round(hits / len(wins), 6)
