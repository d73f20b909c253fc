"""bpe_train vs a sequential single-process oracle (exact merge-table and
corpus equality), plus merge-kernel edge cases."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pytest

from esa_pfa_spark.operators.tokens import _merge_pair_batch, bpe_train


def _seq_bpe(arrs, n_merges, nid0=1_000_000):
    """Reference implementation: same semantics, one process."""
    merges = []
    arrs = [list(a) for a in arrs]
    for r in range(n_merges):
        c = Counter()
        for a in arrs:
            for i in range(len(a) - 1):
                c[(a[i], a[i + 1])] += 1
        if not c:
            break
        (x, y), cnt = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        nid = nid0 + r
        merges.append((r + 1, x, y, nid, cnt))

        def mrg(a):
            out, i = [], 0
            while i < len(a):
                if i + 1 < len(a) and a[i] == x and a[i + 1] == y:
                    out.append(nid)
                    i += 2
                else:
                    out.append(a[i])
                    i += 1
            return out

        arrs = [mrg(a) for a in arrs]
    return merges, arrs


def test_merge_kernel_edges():
    out = _merge_pair_batch([[1, 2, 1, 2], [2, 1], [], [1], [1, 2]], 1, 2, 99)
    assert [list(x) for x in out] == [[99, 99], [2, 1], [], [1], [99]]
    # overlapping same-token run: greedy left-to-right
    out = _merge_pair_batch([[7, 7, 7], [7, 7, 7, 7]], 7, 7, 50)
    assert [list(x) for x in out] == [[50, 7], [50, 50]]
    # match must not straddle row boundaries: ...1] [2... stays unmerged
    out = _merge_pair_batch([[3, 1], [2, 3]], 1, 2, 60)
    assert [list(x) for x in out] == [[3, 1], [2, 3]]


def test_bpe_matches_sequential_oracle(spark):
    rng = np.random.default_rng(11)
    arrs = [
        rng.integers(0, 6, rng.integers(0, 12)).astype("int32").tolist()
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(arrs)), "tokens": arrs}),
        "doc_id long, tokens array<int>",
    )
    merges, merged_df, table = bpe_train(df, n_merges=6)
    want_merges, want_arrs = _seq_bpe(arrs, 6)
    got = [(m["rank"], m["t1"], m["t2"], m["new_id"], m["pair_count"]) for m in merges]
    assert got == want_merges
    got_arrs = {
        r["doc_id"]: list(r["tokens"]) for r in merged_df.collect()
    }
    for i, want in enumerate(want_arrs):
        assert got_arrs[i] == want, f"doc {i}"
    assert table.count() == len(want_merges)


def test_bpe_train_local_matches_sequential():
    from esa_pfa_spark.operators.tokens import bpe_train_local

    rng = np.random.default_rng(5)
    arrs = [
        rng.integers(0, 6, rng.integers(0, 12)).astype("int64").tolist()
        for _ in range(200)
    ]
    got = bpe_train_local(arrs, 8)
    want, _ = _seq_bpe(arrs, 8)
    assert [
        (m["rank"], m["t1"], m["t2"], m["new_id"], m["pair_count"]) for m in got
    ] == want


def test_bpe_apply_one_pass_matches_train_corpus(spark):
    """bpe_apply (all rules, ONE mapInPandas scan) must reproduce
    bpe_train's per-round corpus rewrites exactly."""
    from esa_pfa_spark.operators.tokens import bpe_apply

    rng = np.random.default_rng(23)
    arrs = [
        rng.integers(0, 5, rng.integers(0, 15)).astype("int32").tolist()
        for _ in range(250)
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(arrs)), "tokens": arrs}),
        "doc_id long, tokens array<int>",
    )
    merges, merged_df, table = bpe_train(df, n_merges=7)
    assert merges, "test needs at least one merge to be meaningful"
    want = {r["doc_id"]: list(r["tokens"]) for r in merged_df.collect()}
    # both input forms: the table DataFrame and the dict list
    for rules in (table, merges):
        got = {r["doc_id"]: list(r["tokens"]) for r in bpe_apply(df, rules).collect()}
        assert got == want


def test_bpe_sampled_with_full_sample_equals_exact(spark):
    """sample_docs >= corpus => the sampled trainer sees everything and
    must reproduce the exact path's merge table AND applied corpus."""
    from esa_pfa_spark.operators.tokens import bpe_train_sampled

    rng = np.random.default_rng(31)
    arrs = [
        rng.integers(0, 6, rng.integers(1, 14)).astype("int32").tolist()
        for _ in range(150)
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [str(i) for i in range(len(arrs))], "tokens": arrs}),
        "doc_id string, tokens array<int>",
    )
    ex_merges, ex_df, _ = bpe_train(df, n_merges=6)
    s_merges, s_df, s_table = bpe_train_sampled(
        df, n_merges=6, sample_docs=10_000
    )
    assert s_merges == ex_merges
    assert s_table.count() == len(ex_merges)
    got = {r["doc_id"]: list(r["tokens"]) for r in s_df.collect()}
    want = {r["doc_id"]: list(r["tokens"]) for r in ex_df.collect()}
    assert got == want


def test_bpe_apply_empty_rules_is_identity(spark):
    from esa_pfa_spark.operators.tokens import bpe_apply

    df = spark.createDataFrame(
        [(0, [1, 2]), (1, [])], "doc_id long, tokens array<int>"
    )
    got = sorted(
        (r["doc_id"], list(r["tokens"])) for r in bpe_apply(df, []).collect()
    )
    assert got == [(0, [1, 2]), (1, [])]


def test_bpe_stops_when_no_repeating_pair(spark):
    df = spark.createDataFrame(
        [(0, [1, 2]), (1, [3, 4])], "doc_id long, tokens array<int>"
    )
    merges, merged_df, table = bpe_train(df, n_merges=5)
    assert merges == [] and table.count() == 0
    assert sorted(tuple(r["tokens"]) for r in merged_df.collect()) == [
        (1, 2), (3, 4),
    ]

def _encode_batch_local(arrs, merges):
    rank_of = {(m["t1"], m["t2"]): (m["rank"], m["new_id"]) for m in merges}
    by_rank = {m["rank"]: (m["t1"], m["t2"], m["new_id"]) for m in merges}
    from esa_pfa_spark.operators.tokens import _bpe_encode_batch

    return [list(a) for a in _bpe_encode_batch(arrs, rank_of, by_rank)]


def test_encode_kernel_edges():
    mk = lambda r, a, b, n: {"rank": r, "t1": a, "t2": b, "new_id": n}
    # single rule == merge kernel semantics, incl. greedy L-to-R overlap
    assert _encode_batch_local(
        [[1, 2, 1, 2], [2, 1], [], [1], [1, 2]], [mk(1, 1, 2, 99)]
    ) == [[99, 99], [2, 1], [], [1], [99]]
    assert _encode_batch_local(
        [[7, 7, 7], [7, 7, 7, 7]], [mk(1, 7, 7, 50)]
    ) == [[50, 7], [50, 50]]
    # no straddling row boundaries
    assert _encode_batch_local([[3, 1], [2, 3]], [mk(1, 1, 2, 60)]) == [
        [3, 1],
        [2, 3],
    ]
    # cascade: rule 2 consumes rule 1's output within one pass
    rules = [mk(1, 1, 2, 100), mk(2, 100, 3, 101)]
    assert _encode_batch_local([[1, 2, 3, 1, 2]], rules) == [[101, 100]]
    # lower rank wins even when listed later in the table
    rules = [mk(2, 2, 3, 200), mk(1, 1, 2, 100)]
    assert _encode_batch_local([[1, 2, 3]], rules) == [[100, 3]]
    # empty table / empty batch
    assert _encode_batch_local([[1, 2]], []) == [[1, 2]]
    assert _encode_batch_local([], [mk(1, 1, 2, 9)]) == []
    # negative ids fall back to the dict-loop candidate scan
    assert _encode_batch_local([[-1, -2, -1, -2]], [mk(1, -1, -2, 77)]) == [
        [77, 77]
    ]


def test_bpe_encode_matches_apply_random_corpora(spark):
    """bpe_encode (min-rank heap, table-size-independent) must equal
    bpe_apply (rank-order rule loop, the parity oracle) on random
    corpora with genuinely trained (cascading) merge tables."""
    from esa_pfa_spark.operators.tokens import bpe_apply, bpe_encode, bpe_train_local

    for seed, vocab, n_merges in [(3, 5, 12), (17, 8, 25), (41, 3, 40)]:
        rng = np.random.default_rng(seed)
        arrs = [
            rng.integers(0, vocab, rng.integers(0, 30)).astype("int32").tolist()
            for _ in range(300)
        ]
        merges = bpe_train_local(arrs, n_merges)
        assert merges, "seed must yield at least one merge"
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": range(len(arrs)), "tokens": arrs}),
            "doc_id long, tokens array<int>",
        ).repartition(4)
        want = {r["doc_id"]: list(r["tokens"]) for r in bpe_apply(df, merges).collect()}
        got = {r["doc_id"]: list(r["tokens"]) for r in bpe_encode(df, merges).collect()}
        assert got == want, f"seed={seed}"


def test_bpe_encode_accepts_table_dataframe(spark):
    from esa_pfa_spark.operators.tokens import bpe_encode, bpe_train

    df = spark.createDataFrame(
        [(0, [1, 2, 1, 2, 1, 2]), (1, [2, 1, 2])],
        "doc_id long, tokens array<int>",
    )
    merges, merged_df, table = bpe_train(df, n_merges=3)
    want = {r["doc_id"]: list(r["tokens"]) for r in merged_df.collect()}
    got = {r["doc_id"]: list(r["tokens"]) for r in bpe_encode(df, table).collect()}
    assert got == want


def test_bpe_train_local_deep_cascade_no_overflow():
    """Regression: _merge_pair_batch returns int32 rows, and the rescan
    trainer's scalar pair key (p1*kmax+p2) silently overflowed int32 once
    merged ids (~1e6) entered kmax — corrupting the argmax decode for any
    round whose best pair involved a new id (observed: rule t1=-708).
    Train deep enough that new-id pairs become the argmax and check both
    trainers against the pure-python sequential oracle."""
    from esa_pfa_spark.operators.tokens import bpe_train_local, bpe_train_local_fast

    rng = np.random.default_rng(1)
    arrs = [rng.integers(0, 5, rng.integers(0, 40)).astype("int64").tolist()
            for _ in range(150)]
    want, _ = _seq_bpe(arrs, 40)
    for trainer in (bpe_train_local, bpe_train_local_fast):
        got = [
            (m["rank"], m["t1"], m["t2"], m["new_id"], m["pair_count"])
            for m in trainer(arrs, 40)
        ]
        assert got == want, trainer.__name__
    # every trained rule must reference ids that exist at its rank
    assert all(t1 >= 0 and t2 >= 0 for _, t1, t2, _, _ in want)


def test_bpe_train_local_fast_matches_rescan_random():
    """Incremental (delta-count heap) trainer == per-round rescan trainer,
    across vocab sizes and depths incl. saturation (train until no pair
    repeats)."""
    from esa_pfa_spark.operators.tokens import bpe_train_local, bpe_train_local_fast

    for seed, vocab, nm in [(2, 8, 100), (9, 50, 300), (13, 6, 1000), (21, 2, 64)]:
        rng = np.random.default_rng(seed)
        arrs = [
            rng.integers(0, vocab, rng.integers(0, 40)).astype("int64")
            for _ in range(300)
        ]
        a = bpe_train_local(arrs, nm)
        b = bpe_train_local_fast(arrs, nm)
        assert a == b, f"seed {seed}"


def test_bpe_train_local_fast_edges():
    from esa_pfa_spark.operators.tokens import bpe_train_local_fast

    assert bpe_train_local_fast([], 5) == []
    assert bpe_train_local_fast([[1]], 5) == []
    assert bpe_train_local_fast([[1, 2], [3, 4]], 5) == []  # no pair repeats
    got = bpe_train_local_fast([[1, 2], [1, 2]], 5)
    assert [(m["t1"], m["t2"], m["pair_count"]) for m in got] == [(1, 2, 2)]


def test_bpe_decode_roundtrip_random(spark):
    """decode(encode(x)) == x on random corpora, including empty rows
    and rows with no firing merges; nested merges (a rule whose t1/t2
    are earlier new ids) must expand transitively."""
    import numpy as np

    from esa_pfa_spark.operators.tokens import (
        bpe_decode, bpe_encode, bpe_train_local,
    )

    rng = np.random.default_rng(11)
    rows = [rng.integers(0, 3, size=rng.integers(0, 60)).tolist() for _ in range(60)]
    rows[3] = []  # explicit empty
    merges = bpe_train_local([r for r in rows if r], n_merges=24)
    assert any(
        m["t1"] >= 1_000_000 or m["t2"] >= 1_000_000 for m in merges
    ), "fixture must exercise nested merges"
    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(rows)], "doc_id long, tokens array<long>"
    )
    enc = bpe_encode(df, merges)
    dec = {r["doc_id"]: r["tokens"] for r in bpe_decode(enc, merges).collect()}
    changed = sum(
        1 for r in enc.collect() if list(r["tokens"]) != rows[r["doc_id"]]
    )
    assert changed > 10  # merges actually fired before the round trip
    for i, r in enumerate(rows):
        assert dec[i] == r, i
