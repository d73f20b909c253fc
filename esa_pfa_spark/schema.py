"""Fixed StructType schemas for the engine's tables.

The reference declares its feature schema up front per application
(pfa-core/.../fe/AbstractApplicationDescriptor.java:52-71 and e.g.
pfa-bitemp-fex/.../BiTempSpectralApplicationDescriptor.java:174-218);
here each table is a declared StructType so Catalyst can prune/pushdown
and so the driver-facing contracts are stable.
"""

from __future__ import annotations

from pyspark.sql import types as T

# F1 — the exact input-hint table: pre-tokenized training sequences.
TOKENS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)

# F2 — entity×time observation view (entity/time derived deterministically,
# mirroring how the reference encodes both in product names:
# FindPatchPairs.java:45,85-91; grid keys PatchCS.java:57-61).
OBSERVATIONS_SCHEMA = T.StructType(
    [
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("bucket_x", T.IntegerType(), False),
        T.StructField("bucket_y", T.IntegerType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)

# F3 — as-of probe table.
QUERIES_SCHEMA = T.StructType(
    [
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("query_ts", T.TimestampType(), False),
    ]
)

# F4 — STX feature vector at each entity×query_ts.  Stat list mirrors the
# reference's canonical per-patch feature vector (FeatureWriter.java:159-176:
# mean/stdev/cvar/min/max/p10/p50/p90/skewness/count).
FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("query_ts", T.TimestampType(), False),
        T.StructField("matched_ts", T.TimestampType(), True),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), True),
        T.StructField("mean", T.DoubleType(), True),
        T.StructField("stdev", T.DoubleType(), True),
        T.StructField("cvar", T.DoubleType(), True),
        T.StructField("min", T.DoubleType(), True),
        T.StructField("max", T.DoubleType(), True),
        T.StructField("p10", T.DoubleType(), True),
        T.StructField("p50", T.DoubleType(), True),
        T.StructField("p90", T.DoubleType(), True),
        T.StructField("skewness", T.DoubleType(), True),
        T.StructField("count", T.IntegerType(), True),
    ]
)

# F5 — tolerance-bounded pair output (FindPatchPairs.java:57-76 semantics).
PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("ts1", T.TimestampType(), False),
        T.StructField("ts2", T.TimestampType(), False),
        T.StructField("doc_id1", T.StringType(), False),
        T.StructField("doc_id2", T.StringType(), False),
        T.StructField("overlap_ratio", T.DoubleType(), False),
        T.StructField("magnitude", T.DoubleType(), False),
        T.StructField("angle_1", T.DoubleType(), False),
        T.StructField("angle_2", T.DoubleType(), False),
        T.StructField("angle_3", T.DoubleType(), False),
    ]
)

# F6 — checkpoint/lineage manifest (modeled on FeatureWriterResult.java:13-35
# and the BiTempPreprocessor per-patch metrics CSV,
# BiTempPreprocessor.java:174-182).
MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("key_range_lo", T.StringType(), True),
        T.StructField("key_range_hi", T.StringType(), True),
        T.StructField("rows_in", T.LongType(), False),
        T.StructField("rows_out", T.LongType(), False),
        T.StructField("checksum", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("wall_ms", T.LongType(), False),
    ]
)
