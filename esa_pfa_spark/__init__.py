"""esa_pfa_spark — a from-scratch PySpark-native feature-engineering engine.

Re-expresses the semantics of the reference implementation (bcdev/esa-pfa,
a Java/Spark-1.2 per-product feature-extraction workflow) as an idiomatic
PySpark DataFrame engine: point-in-time correct as-of joins, windowed
operators (backfill/forward-fill, lag/lead, rolling, sessionization),
fixed-schema STX feature vectors, tolerance-bounded temporal pairing,
deduplication / similarity / text-analysis operators for training-data
pipelines, skew handling, and a per-partition checkpoint manifest.

This is NOT a port: no code is derived from the reference.  Reference
files are cited in docstrings (file:line under /root/reference) only to
document *semantic* parity.
"""

__version__ = "0.1.0"

from esa_pfa_spark.session import get_spark  # noqa: F401
