"""The flagship end-to-end pipeline (SURVEY.md §7 step 2, extended):

  observations (tokens table with entity/ts)
    -> per-row STX token stats                 (features.token_stats)
    -> lag/lead mean over the entity timeline  (windows.lag_lead)
    -> gap-based sessionization (gap > 7d)     (windows.sessionize)
    -> backward as-of join to probe timestamps (asof.asof_join)
  => one row per (entity_id, query_ts) carrying the matched observation's
     token array (byte-equal invariant) + feature vector, zero leakage.

This chain replaces the reference's BiTempPreprocessor -> FindPatchPairs ->
BiTempSpectralFeatureWriter flow (SURVEY.md §3.4) one-for-one.

Physical shape at scale: token_stats is one Arrow-vectorized projection
(no shuffle); lag/lead + sessionize + the as-of window share ONE shuffle on
entity_id (Catalyst reuses the hash partitioning across the window specs);
the probe union adds no extra shuffle beyond its own side.  Total: 2 sorts,
1 exchange per side — the minimal plan for this computation.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from esa_pfa_spark.operators.asof import asof_join
from esa_pfa_spark.operators.features import token_stats
from esa_pfa_spark.operators.windows import lag_lead, sessionize

DEFAULT_TOLERANCE = _dt.timedelta(days=7)
DEFAULT_SESSION_GAP = _dt.timedelta(days=7)

FEATURE_PAYLOAD = [
    "tokens",
    "n_tok",
    "mean",
    "stdev",
    "cvar",
    "min",
    "max",
    "p10",
    "p50",
    "p90",
    "skewness",
    "count",
    "lag_1_mean",
    "lead_1_mean",
    "session_id",
    "session_len",
]


def enrich_observations(observations: DataFrame) -> DataFrame:
    """Stage 1: per-row token stats + windowed features over the timeline.

    The explicit hash-repartition on entity_id comes FIRST so (a) the
    Arrow-UDF stat stage runs at full shuffle-partition width regardless of
    how few input splits the scan produced, and (b) every downstream window
    spec (lag/lead, sessionize, and the as-of union window) reuses this one
    exchange — Catalyst inserts only sorts after it.  This is the explicit
    co-partitioning requirement of SURVEY.md §4 (PatchCS grid-alignment
    analog): one shuffle for the whole enrichment chain."""
    parted = observations.repartition("entity_id")
    enriched = token_stats(parted, "tokens")
    enriched = lag_lead(enriched, "mean", key="entity_id", ts="ts")
    enriched = sessionize(enriched, key="entity_id", ts="ts", gap=DEFAULT_SESSION_GAP)
    return enriched


def feature_table(
    observations: DataFrame,
    probes: DataFrame,
    tolerance=DEFAULT_TOLERANCE,
) -> DataFrame:
    """Stage 2: point-in-time feature lookup at each probe timestamp."""
    enriched = enrich_observations(observations)
    return asof_join(
        probes,
        enriched,
        on="entity_id",
        probe_ts="query_ts",
        obs_ts="ts",
        payload=FEATURE_PAYLOAD,
        direction="backward",
        tolerance=tolerance,
    ).withColumnRenamed("matched_ts", "matched_ts")


def feature_table_sorted(observations: DataFrame, probes: DataFrame, tolerance=DEFAULT_TOLERANCE) -> DataFrame:
    """feature_table + deterministic output order (for checksums/goldens)."""
    return feature_table(observations, probes, tolerance).orderBy("entity_id", "query_ts")
