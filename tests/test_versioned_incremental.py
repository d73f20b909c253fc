"""Lakehouse loop e2e: snapshot-versioned tables (sources/versioned.py)
driving incremental feature maintenance (plans/incremental.py).

This is the production cycle the north rule implies, run end-to-end in
the sandbox: commit history as snapshot v1, bootstrap the per-entity
state from a TIME-TRAVEL read of v1, commit the day's delta as v2
(optimistic append predicated on v1), read the delta back through
MANIFEST ENVELOPE PRUNING (the history data dir is skipped without
opening a file), and prove the incremental run is row-identical to a
full recompute over the latest snapshot.  At 100 TB the same code reads
real Iceberg through tables.load_table; every semantic exercised here
(snapshot isolation, VERSION AS OF, base-snapshot commit predicate,
manifest min/max skipping) is the Iceberg feature it stands in for.
"""

from __future__ import annotations

import datetime as dt
import re

import pytest
from pyspark.sql import functions as F

from esa_pfa_spark import synth
from esa_pfa_spark.plans.incremental import (
    feature_table_incremental,
    flagship_entity_state,
)
from esa_pfa_spark.plans.pipeline import feature_table_fused
from esa_pfa_spark.sources.versioned import (
    CommitConflict,
    read_versioned,
    write_versioned,
)

TOL = dt.timedelta(days=7)


def _canon(df):
    out = []
    for r in df.collect():
        d = r.asDict()
        row = []
        for k in sorted(d):
            v = d[k]
            if isinstance(v, list):
                v = tuple(v)
            elif isinstance(v, float):
                v = round(v, 9)
            row.append((k, v))
        out.append(tuple(row))
    return sorted(out, key=repr)


def test_versioned_snapshots_drive_incremental_run(spark, tmp_path):
    root = tmp_path / "obs_table"
    obs = synth.observations_df(
        spark, seed=23, n_entities=150, mean_obs=12, mean_tok=8
    )
    probes = synth.queries_df(spark, seed=23, n_entities=150, mean_obs=12)
    cut_us = obs.agg(
        F.expr("percentile(unix_micros(ts), 0.5)").cast("long")
    ).collect()[0][0]
    cut = dt.datetime.fromtimestamp(cut_us / 1e6, dt.timezone.utc).replace(
        tzinfo=None
    )

    # day 0: commit history as v1; day 1: append the delta as v2, the
    # commit predicated on the v1 base snapshot this writer read
    hist = obs.filter(F.col("ts") < F.lit(cut))
    delta = obs.filter(F.col("ts") >= F.lit(cut))
    assert write_versioned(
        hist.coalesce(2), root, prune_cols=["ts"]
    ) == 1
    assert write_versioned(
        delta.coalesce(2), root, mode="append", expected_parent=1,
        prune_cols=["ts"],
    ) == 2
    # a second writer that also read v1 must NOT silently clobber v2
    with pytest.raises(CommitConflict):
        write_versioned(
            delta.limit(1), root, mode="append", expected_parent=1
        )

    # bootstrap state from the v1 snapshot (time travel), not from a
    # mutable "current" view — reruns are reproducible by construction
    state = flagship_entity_state(read_versioned(spark, root, version=1), cut)

    # the delta scan goes through manifest envelope pruning: the history
    # dir's [min,max] ts cannot intersect [cut, +inf), so only the v2
    # commit's data dir is planned
    hi = dt.datetime(2100, 1, 1)
    delta_read = read_versioned(spark, root, prune={"ts": (cut, hi)})
    dirs = {re.sub(r"/part-[^/]+$", "", f) for f in delta_read.inputFiles()}
    assert len(dirs) == 1, "manifest pruning must skip the history dir"
    delta_read = delta_read.filter(F.col("ts") >= F.lit(cut))

    new_probes = probes.filter(
        F.col("query_ts") >= F.lit(cut) + F.expr("INTERVAL 7 DAYS")
    )
    assert new_probes.count() > 30

    incr = feature_table_incremental(delta_read, new_probes, state,
                                     tolerance=TOL)
    full = feature_table_fused(
        read_versioned(spark, root), probes
    ).filter(F.col("query_ts") >= F.lit(cut) + F.expr("INTERVAL 7 DAYS"))
    assert _canon(incr) == _canon(full)
