"""Checkpoint manifest: kill-and-resume test (FIXTURES.md F6) — interrupted
run resumes at partition granularity; final output identical to an
uninterrupted run; completed partitions are not recomputed."""

import json

import pandas as pd
import pytest
from pyspark.sql import functions as F

from esa_pfa_spark.manifest import ManifestedRun


def _source(spark):
    pdf = pd.DataFrame(
        {
            "entity_id": [f"e{i % 17:03d}" for i in range(400)],
            "v": [float(i) for i in range(400)],
        }
    )
    return spark.createDataFrame(pdf)


def _transform(df):
    return df.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("total")
    )


def test_kill_and_resume_identical(spark, tmp_path):
    src = _source(spark)

    # uninterrupted reference run
    full = ManifestedRun(str(tmp_path / "full"), key="entity_id", n_partitions=8, run_id="full")
    assert full.run(src, _transform) == 8
    want = full.read_output(spark).orderBy("entity_id").toPandas()

    # interrupted run: dies after 3 partitions
    r = ManifestedRun(str(tmp_path / "resume"), key="entity_id", n_partitions=8, run_id="r1")
    with pytest.raises(RuntimeError, match="simulated failure"):
        r.run(src, _transform, fail_after=3)
    assert len(r.completed_partitions()) == 3

    # resume: only the remaining 5 are processed
    r2 = ManifestedRun(str(tmp_path / "resume"), key="entity_id", n_partitions=8, run_id="r2")
    assert r2.run(src, _transform) == 5

    got = r2.read_output(spark).orderBy("entity_id").toPandas()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))


def test_manifest_records_complete(spark, tmp_path):
    src = _source(spark)
    r = ManifestedRun(str(tmp_path / "m"), key="entity_id", n_partitions=4, run_id="x")
    r.run(src, _transform)
    recs = [json.loads(l) for l in (tmp_path / "m" / "manifest.jsonl").read_text().splitlines()]
    assert len(recs) == 4
    assert {rec["partition_id"] for rec in recs} == {0, 1, 2, 3}
    assert all(rec["status"] == "done" for rec in recs)
    assert sum(rec["rows_in"] for rec in recs) == 400
    assert all(rec["wall_ms"] >= 0 and rec["checksum"] for rec in recs)
    assert all(rec["key_range_lo"] <= rec["key_range_hi"] for rec in recs)


def test_rerun_after_completion_is_noop(spark, tmp_path):
    src = _source(spark)
    r = ManifestedRun(str(tmp_path / "n"), key="entity_id", n_partitions=4, run_id="a")
    assert r.run(src, _transform) == 4
    r2 = ManifestedRun(str(tmp_path / "n"), key="entity_id", n_partitions=4, run_id="b")
    assert r2.run(src, _transform) == 0


def test_run_bucketed_prunes_and_matches_plain(spark, tmp_path):
    """The bucketed layout path must (a) produce output identical to the
    rescan path and (b) actually prune: the per-partition slice's scan
    carries a PartitionFilters entry on part_id."""
    import contextlib, io

    from esa_pfa_spark.manifest import BUCKET_COL
    from esa_pfa_spark.sources.sinks import write_bucketed

    src = _source(spark)
    layout = str(tmp_path / "layout")
    write_bucketed(src, layout, key="entity_id", n_partitions=8)

    plain = ManifestedRun(str(tmp_path / "p"), key="entity_id", n_partitions=8, run_id="p")
    plain.run(src, _transform)
    want = plain.read_output(spark).orderBy("entity_id").toPandas()

    fast = ManifestedRun(str(tmp_path / "b"), key="entity_id", n_partitions=8, run_id="b")
    assert fast.run_bucketed(spark, layout, _transform) == 8
    got = fast.read_output(spark).orderBy("entity_id").toPandas()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))

    # plan audit: the slice filter is a partition filter, not a data filter
    sliced = spark.read.parquet(layout).filter(F.col(BUCKET_COL) == 3)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sliced.explain(mode="formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters", 1)[1][:120]
    assert "part_id" in seg, f"part_id must appear in PartitionFilters: {seg}"


def test_transform_with_defaulted_second_param_not_pid(spark, tmp_path):
    """Arity-dispatch regression: a transform with a defaulted second
    parameter NOT named 'pid' must be called with one argument."""
    def transform(df, mode="full"):
        assert mode == "full"  # would receive an int under arity dispatch
        return _transform(df)

    r = ManifestedRun(str(tmp_path / "d"), key="entity_id", n_partitions=2, run_id="d")
    assert r.run(_source(spark), transform) == 2


def test_transform_pid_by_name_receives_pid(spark, tmp_path):
    seen = []

    def transform(df, pid):
        seen.append(pid)
        return _transform(df)

    r = ManifestedRun(str(tmp_path / "e"), key="entity_id", n_partitions=3, run_id="e")
    assert r.run(_source(spark), transform) == 3
    assert seen == [0, 1, 2]


def test_transform_wants_pid_attribute(spark, tmp_path):
    """Callables where signature() is unavailable can opt in explicitly."""
    seen = []

    def inner(df, pid):
        seen.append(pid)
        return _transform(df)

    import functools

    wrapped = functools.partial(inner)
    wrapped.wants_pid = True
    r = ManifestedRun(str(tmp_path / "f"), key="entity_id", n_partitions=2, run_id="f")
    assert r.run(_source(spark), wrapped) == 2
    assert seen == [0, 1]
