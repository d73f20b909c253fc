"""Curation-pipeline stage semantics on hand-checkable inputs.  The oracle
mirror (test_entry_oracle.py: curation_survivors / curation_decontaminated /
training_windows_e2e) proves DuckDB parity at sf0.01; these pin each
stage's behavior on tiny frames."""

from __future__ import annotations

import pytest

from esa_pfa_spark.plans.curation import curate_documents

EVAL_RUN = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # contaminated: contains the eval corpus's 8-gram verbatim
        (1, "x " + EVAL_RUN + " tail", "s1"),
        # clean survivor
        (2, "one two three four five six seven eight nine", "s1"),
        # exact duplicate of 2 -> collapsed to min doc_id
        (3, "one two three four five six seven eight nine", "s1"),
        # too short for the quality gate (< 5 words)
        (4, "tiny doc here", "s2"),
        # clean and shorter than the 8-gram window: passes decontamination
        (5, "red green blue cyan magenta yellow", "s2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


@pytest.fixture(scope="module")
def eval_docs(spark):
    return spark.createDataFrame(
        [(100, "prefix " + EVAL_RUN + " suffix", "eval")],
        "doc_id long, text string, source string",
    )


def test_chain_without_decontamination(docs):
    kept = {r["doc_id"] for r in curate_documents(docs).collect()}
    # 4 fails quality; 3 is an exact dup of 2; 1, 2, 5 survive
    assert kept == {1, 2, 5}


def test_decontamination_drops_eval_overlap(docs, eval_docs):
    kept = {r["doc_id"] for r in curate_documents(docs, eval_docs=eval_docs).collect()}
    # doc 1 shares an 8-gram with the eval set -> dropped; doc 5 is shorter
    # than the window and passes through
    assert kept == {2, 5}


def test_curation_v3_chain_properties(spark):
    """The v3 chain must actually exercise every stage: gated docs
    nonempty, verified-duplicate merging strictly reduces (or keeps) the
    gated set, every export passed the quality gate, ranks are dense,
    and the chain never invents doc ids."""
    from pyspark.sql import functions as F

    from esa_pfa_spark.plans.curation import curate_documents_v3

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    out = curate_documents_v3(docs, emb, topn=50).collect()
    assert 0 < len(out) <= 50
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == list(
        range(1, len(out) + 1)
    )
    assert all(r["p_quality"] >= 0.5 for r in out)
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert all(r["doc_id"] in all_ids for r in out)
    # export order follows the combined weight
    ranked = sorted(out, key=lambda r: r["rank"])
    scores = [r["export_score"] for r in ranked]
    assert scores == sorted(scores, reverse=True)
