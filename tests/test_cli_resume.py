"""CLI-surface resume: the spark-submit entry point's --resume flow must
checkpoint per-partition, skip completed partitions on re-invocation, and
produce output identical to the non-resumed run."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from esa_pfa_spark import cli


@pytest.fixture(scope="module")
def tiny_tokens(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("cli_resume")
    out = str(base / "tokens")
    cli.main([
        "synth", "--entities", "40", "--mean-obs", "8", "--mean-tok", "12",
        "--out", out,
    ])
    return out


def test_cli_run_resume_manifest_and_parity(spark, tiny_tokens, tmp_path):
    out_resumed = str(tmp_path / "feat_resumed")
    cli.main([
        "run", "--tokens", tiny_tokens, "--probes", tiny_tokens + "_probes",
        "--out", out_resumed, "--resume", "--partitions", "4",
    ])
    manifest = Path(out_resumed) / "manifest.jsonl"
    recs = [json.loads(l) for l in manifest.read_text().splitlines()]
    assert len(recs) == 4 and all(r["status"] == "done" for r in recs)
    assert all(r["rows_out"] >= 0 and "checksum" in r for r in recs)

    # second invocation: everything already done -> no new manifest rows
    cli.main([
        "run", "--tokens", tiny_tokens, "--probes", tiny_tokens + "_probes",
        "--out", out_resumed, "--resume", "--partitions", "4",
    ])
    recs2 = [json.loads(l) for l in manifest.read_text().splitlines()]
    assert len(recs2) == 4, "completed partitions must not be reprocessed"

    # parity with the straight (non-manifested) run
    out_plain = str(tmp_path / "feat_plain")
    cli.main([
        "run", "--tokens", tiny_tokens, "--probes", tiny_tokens + "_probes",
        "--out", out_plain,
    ])
    a = spark.read.parquet(out_resumed + "/part=*").drop("tokens")
    b = spark.read.parquet(out_plain).drop("tokens")
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
