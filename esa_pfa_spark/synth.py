"""Deterministic synthetic data generator for the tokens/observations/queries
tables (FIXTURES.md F1-F3).

Every value is a pure function of ``(seed, entity index, sequence index)``
via splitmix64 — no wall-clock, no unseeded RNG (the reference's
``Math.random()`` in DsIndexer.java:164-169 is explicitly NOT reproduced).

The same numpy kernel serves three callers:
  * the pandas oracle (single-process golden data),
  * local test DataFrames (``spark.createDataFrame``),
  * distributed generation at bench scale (``mapInPandas`` over a range of
    entity ids — each Spark task generates complete entities, so per-entity
    cumulative timestamps never cross partition boundaries).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

VOCAB = 50257
SOURCES = np.array(["web", "book", "code", "news"])
SOURCE_CUM = np.array([0.55, 0.80, 0.95, 1.0])  # fixed weights
BASE_TS = np.datetime64("2024-01-01T00:00:00")

# Gap mix exercises the tolerance bounds of the as-of/pairing operators
# (FindPatchPairs.java:148-150: pairs only for dt in [1d, 7d]):
# short runs (<1d), in-tolerance gaps (1-7d), and window-reset gaps (>7d).
_GAP_SHORT_S = (1800, 21600)  # 30min .. 6h
_GAP_MID_S = (86400, 7 * 86400)  # 1d .. 7d
_GAP_LONG_S = (8 * 86400, 20 * 86400)  # 8d .. 20d


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant set)."""
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _rand_u64(seed: int, stream: int, idx: np.ndarray) -> np.ndarray:
    base = (seed * 0x9E3779B97F4A7C15 + stream * 0xD1B54A32D192ED03) % (1 << 64)
    with np.errstate(over="ignore"):
        return _splitmix64(idx.astype(np.uint64) + np.uint64(base))


def _rand_unit(seed: int, stream: int, idx: np.ndarray) -> np.ndarray:
    return _rand_u64(seed, stream, idx).astype(np.float64) / float(2**64)


def obs_count(seed: int, entity: int, mean_obs: int = 40) -> int:
    """Deterministic per-entity observation count in [4, 2*mean_obs]."""
    u = _rand_unit(seed, 1, np.array([entity], dtype=np.uint64))[0]
    return int(4 + u * (2 * mean_obs - 4))


def gen_entity_block(
    seed: int,
    entity: int,
    n_entities: int,
    mean_obs: int = 40,
    mean_tok: int = 64,
    hot_factor: int = 1,
) -> pd.DataFrame:
    """Generate one entity's complete observation history (F2 rows).

    ``hot_factor`` > 1 multiplies the row count for entity 0 (the skew knob:
    the reference never handles skew because its grid keys are uniform by
    construction, PatchCS.java:57-61; ours are not)."""
    n_obs = obs_count(seed, entity, mean_obs)
    if entity == 0 and hot_factor > 1:
        n_obs *= hot_factor
    seq = np.arange(n_obs, dtype=np.uint64)
    gidx = np.uint64(entity) * np.uint64(1 << 32) + seq

    # timestamps: cumulative deterministic gaps with the 3-way mix
    cat = _rand_unit(seed, 2, gidx)
    u = _rand_unit(seed, 3, gidx)
    gaps = np.where(
        cat < 0.6,
        _GAP_SHORT_S[0] + u * (_GAP_SHORT_S[1] - _GAP_SHORT_S[0]),
        np.where(
            cat < 0.85,
            _GAP_MID_S[0] + u * (_GAP_MID_S[1] - _GAP_MID_S[0]),
            _GAP_LONG_S[0] + u * (_GAP_LONG_S[1] - _GAP_LONG_S[0]),
        ),
    ).astype(np.int64)
    start = (_rand_u64(seed, 4, np.array([entity], dtype=np.uint64))[0] % np.uint64(30 * 86400)).astype(np.int64)
    ts = BASE_TS + (start + np.cumsum(gaps)).astype("timedelta64[s]")

    # token arrays: per-row length, then a flat uniform token stream
    ln = (8 + _rand_unit(seed, 5, gidx) * (2 * mean_tok - 8)).astype(np.int64)
    total = int(ln.sum())
    flat_idx = np.uint64(entity) * np.uint64(1 << 40) + np.arange(total, dtype=np.uint64)
    flat = (_rand_u64(seed, 6, flat_idx) % np.uint64(VOCAB)).astype(np.int32)
    offsets = np.concatenate([[0], np.cumsum(ln)])
    tokens = [flat[offsets[i] : offsets[i + 1]] for i in range(n_obs)]

    src = SOURCES[np.searchsorted(SOURCE_CUM, _rand_unit(seed, 7, gidx))]
    doc_no = (np.uint64(entity) * np.uint64(100000) + seq).astype(np.int64)
    return pd.DataFrame(
        {
            "entity_id": f"e{entity:05d}",
            "bucket_x": np.int32(entity % 360),
            "bucket_y": np.int32((entity // 360) % 180),
            "ts": ts,
            "doc_id": [f"doc{d:012d}" for d in doc_no],
            "tokens": tokens,
            "n_tok": ln.astype(np.int32),
            "source": src,
        }
    )


def gen_observations_pdf(
    seed: int, n_entities: int, mean_obs: int = 40, mean_tok: int = 64, hot_factor: int = 1
) -> pd.DataFrame:
    """All entities as one pandas frame (test scale only)."""
    blocks = [
        gen_entity_block(seed, e, n_entities, mean_obs, mean_tok, hot_factor)
        for e in range(n_entities)
    ]
    return pd.concat(blocks, ignore_index=True)


def gen_queries_pdf(seed: int, n_entities: int, mean_obs: int = 40, probes_per_entity: int = 8) -> pd.DataFrame:
    """F3 probe table: before/within/after observation ranges + exact ties,
    plus ~5% probe-only entities with no observations (null-match rows)."""
    frames = []
    extra = max(1, n_entities // 20)
    for e in range(n_entities + extra):
        if e < n_entities:
            obs = gen_entity_block(seed, e, n_entities, mean_obs, mean_tok=8)
            ts = obs["ts"].to_numpy()
            lo = ts.min() - np.timedelta64(3, "D")
            hi = ts.max() + np.timedelta64(3, "D")
            span_s = max(int((hi - lo) / np.timedelta64(1, "s")), 1)
            u = _rand_unit(seed, 8, np.uint64(e) * np.uint64(1 << 20) + np.arange(probes_per_entity, dtype=np.uint64))
            qts = lo + (u * span_s).astype(np.int64).astype("timedelta64[s]")
            # exact-tie probe pins inclusive semantics (asof matches ts == query_ts)
            tie = ts[int(_rand_u64(seed, 9, np.array([e], dtype=np.uint64))[0] % np.uint64(len(ts)))]
            qts = np.concatenate([qts, [tie]])
        else:
            qts = BASE_TS + np.arange(probes_per_entity).astype("timedelta64[D]")
        frames.append(pd.DataFrame({"entity_id": f"e{e:05d}", "query_ts": qts}))
    return pd.concat(frames, ignore_index=True)


# ---------------------------------------------------------------------------
# Spark-side constructors
# ---------------------------------------------------------------------------

def observations_df(spark, seed: int, n_entities: int, mean_obs: int = 40,
                    mean_tok: int = 64, hot_factor: int = 1, distributed: bool = False):
    """Observations as a Spark DataFrame.

    ``distributed=True`` generates on executors via ``mapInPandas`` over the
    entity-id range — scales linearly with cores, never materializes on the
    driver, and is the path a 10^12-row run would take (each task emits
    complete entities, so downstream range-partitioned as-of stages see
    already-contiguous keys)."""
    from esa_pfa_spark.schema import OBSERVATIONS_SCHEMA

    if not distributed:
        pdf = gen_observations_pdf(seed, n_entities, mean_obs, mean_tok, hot_factor)
        return spark.createDataFrame(pdf, schema=OBSERVATIONS_SCHEMA)

    n_parts = min(n_entities, spark.sparkContext.defaultParallelism * 4)
    entity_range = spark.range(0, n_entities, 1, n_parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            for e in batch["id"].tolist():
                yield gen_entity_block(seed, int(e), n_entities, mean_obs, mean_tok, hot_factor)

    return entity_range.mapInPandas(gen, schema=OBSERVATIONS_SCHEMA)


def queries_df(spark, seed: int, n_entities: int, mean_obs: int = 40, probes_per_entity: int = 8):
    from esa_pfa_spark.schema import QUERIES_SCHEMA

    pdf = gen_queries_pdf(seed, n_entities, mean_obs, probes_per_entity)
    return spark.createDataFrame(pdf, schema=QUERIES_SCHEMA)
