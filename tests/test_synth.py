"""Determinism of the synthetic generator (FIXTURES.md: pure function of
(seed, index); no wall-clock, no unseeded RNG)."""

import numpy as np

from esa_pfa_spark import synth


def test_entity_block_deterministic():
    a = synth.gen_entity_block(seed=42, entity=3, n_entities=10)
    b = synth.gen_entity_block(seed=42, entity=3, n_entities=10)
    assert a.equals(b) or (
        (a["ts"] == b["ts"]).all()
        and all(np.array_equal(x, y) for x, y in zip(a["tokens"], b["tokens"]))
    )


def test_seed_changes_data():
    a = synth.gen_entity_block(seed=42, entity=3, n_entities=10)
    b = synth.gen_entity_block(seed=43, entity=3, n_entities=10)
    m = min(len(a), len(b))
    assert len(a) != len(b) or not (a["ts"].iloc[:m].to_numpy() == b["ts"].iloc[:m].to_numpy()).all()


def test_timestamps_strictly_increasing():
    pdf = synth.gen_observations_pdf(seed=7, n_entities=5)
    for _, g in pdf.groupby("entity_id"):
        ts = g["ts"].to_numpy()
        assert (np.diff(ts) > np.timedelta64(0, "s")).all()


def test_gap_mix_exercises_tolerance_bounds():
    """Gaps must include <1d, [1d,7d] and >7d runs (FindPatchPairs.java:148-150)."""
    pdf = synth.gen_observations_pdf(seed=42, n_entities=20)
    gaps = pdf.groupby("entity_id")["ts"].diff().dt.total_seconds().dropna()
    assert (gaps < 86400).any()
    assert ((gaps >= 86400) & (gaps <= 7 * 86400)).any()
    assert (gaps > 7 * 86400).any()


def test_token_values_in_vocab():
    pdf = synth.gen_observations_pdf(seed=42, n_entities=3)
    for t in pdf["tokens"]:
        assert t.min() >= 0 and t.max() < synth.VOCAB
        assert t.dtype == np.int32


def test_spark_local_vs_distributed_identical(spark):
    local = synth.observations_df(spark, seed=42, n_entities=6, mean_obs=10, mean_tok=16)
    dist = synth.observations_df(
        spark, seed=42, n_entities=6, mean_obs=10, mean_tok=16, distributed=True
    )
    a = local.orderBy("entity_id", "ts").toPandas()
    b = dist.orderBy("entity_id", "ts").toPandas()
    assert len(a) == len(b)
    assert (a["doc_id"].to_numpy() == b["doc_id"].to_numpy()).all()
    assert (a["ts"].to_numpy() == b["ts"].to_numpy()).all()
    for x, y in zip(a["tokens"], b["tokens"]):
        assert np.array_equal(np.asarray(x), np.asarray(y))
