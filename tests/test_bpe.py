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


def test_bpe_stops_when_no_repeating_pair(spark):
    df = spark.createDataFrame(
        [(0, [1, 2]), (1, [3, 4])], "doc_id long, tokens array<int>"
    )
    merges, merged_df, table = bpe_train(df, n_merges=5)
    assert merges == [] and table.count() == 0
    assert sorted(tuple(r["tokens"]) for r in merged_df.collect()) == [
        (1, 2), (3, 4),
    ]
