"""Streaming Misra-Gries heavy hitters: one-batch parity with the batch
summary algebra, cross-micro-batch MG merge, and the bounded-state cap."""

from __future__ import annotations

from collections import Counter

import pandas as pd

from esa_pfa_spark.streaming.heavyhitters import _mg_merge, stream_heavy_hitters

BUCKET_SQL = (
    "CAST(conv(substring(md5(concat('hh:', CAST(doc_id AS STRING))), 1, 6), 16, 10)"
    " AS INT) % {n}"
)


def _write(spark, path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "tokens"])
    # one FILE per write: maxFilesPerTrigger=1 then maps writes 1:1 to
    # micro-batches (multi-file writes would fragment batches and add
    # extra MG truncations — still within the error bound, but no longer
    # equal to the test's 2-batch sequential model)
    spark.createDataFrame(
        pdf, schema="doc_id long, tokens array<long>"
    ).repartition(1).write.mode("append").parquet(str(path))


def _run(spark, src, name, k=4, n_summaries=2, per_file=False):
    reader = spark.readStream.schema("doc_id long, tokens array<long>")
    if per_file:
        reader = reader.option("maxFilesPerTrigger", 1)
    stream = reader.parquet(str(src))
    out = stream_heavy_hitters(stream, k=k, n_summaries=n_summaries)
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}").toPandas()


def _expected_buckets(spark, rows, k, n_summaries, batches=None):
    """Recompute the per-bucket summaries with plain Counters, merging
    batch-by-batch when ``batches`` is given."""
    pdf = pd.DataFrame(rows, columns=["doc_id", "tokens"])
    sdf = spark.createDataFrame(pdf, schema="doc_id long, tokens array<long>")
    buckets = {
        r["doc_id"]: r["b"]
        for r in sdf.selectExpr(
            "doc_id", BUCKET_SQL.format(n=n_summaries) + " AS b"
        ).collect()
    }
    state: dict[int, Counter] = {}
    for batch in (batches or [rows]):
        for doc_id, toks in batch:
            b = buckets[doc_id]
            s = state.setdefault(b, Counter())
            s.update(toks)
        state = {b: _mg_merge(s, k) for b, s in state.items()}
    return state


def test_one_batch_parity_with_summary_algebra(spark, tmp_path):
    rows = [(i, [i % 3, i % 5, 1, 1]) for i in range(40)]
    src = tmp_path / "hh1"
    _write(spark, src, rows)
    res = _run(spark, src, "hh_t1", k=3, n_summaries=2)
    got = {
        (r.bucket, r.token): r.est for r in res.itertuples()
    }
    want = _expected_buckets(spark, rows, k=3, n_summaries=2)
    want_flat = {
        (b, t): c for b, s in want.items() for t, c in s.items()
    }
    assert got == want_flat


def test_state_merges_across_microbatches(spark, tmp_path):
    b1 = [(i, [7, 7, i]) for i in range(10)]
    b2 = [(100 + i, [7, 9]) for i in range(10)]
    src = tmp_path / "hh2"
    _write(spark, src, b1)
    _write(spark, src, b2)
    res = _run(spark, src, "hh_t2", k=3, n_summaries=1, per_file=True)
    # memory sink in update mode appends each trigger's emission; the
    # LAST emission per (bucket, token) is the current estimate
    last = {}
    for r in res.itertuples():
        last[(r.bucket, r.token)] = r.est
    want = _expected_buckets(
        spark, b1 + b2, k=3, n_summaries=1, batches=[b1, b2]
    )
    want_flat = {(b, t): c for b, s in want.items() for t, c in s.items()}
    # tokens dropped by a later merge keep their stale last emission in
    # the memory sink; compare on the surviving keys
    for key, est in want_flat.items():
        assert last[key] == est
    assert sum(1 for k_ in want_flat if k_[1] == 7)  # the hot token survived


def test_state_never_exceeds_k(spark, tmp_path):
    # doc i holds tokens 0..i -> count(t) = 30 - t, all distinct: the MG
    # truncation keeps exactly the k heaviest.  (A uniform count profile
    # would legitimately truncate to EMPTY — subtracting the (k+1)-th
    # largest kills equal counts; that degenerate case is the guarantee
    # working, not a bug.)
    rows = [(i, list(range(0, i + 1))) for i in range(30)]
    src = tmp_path / "hh3"
    _write(spark, src, rows)
    res = _run(spark, src, "hh_t3", k=5, n_summaries=1)
    assert 0 < res.groupby("bucket")["token"].count().max() <= 5
    assert set(res["token"]) == {0, 1, 2, 3, 4}  # the heaviest survive
