"""Table sources — the engine's scan layer.

The north rule targets an Iceberg lakehouse; this environment has no
Iceberg runtime jar, so the source layer abstracts the format: Iceberg
when the catalog is configured (``spark.sql.catalog.*`` present), plain
partitioned Parquet otherwise.  Both give Catalyst the same things the
reference hand-built (SURVEY.md §4): column pruning to the file reader,
min-max + dictionary predicate skipping (Lucene numeric-trie analog,
DsIndexer.java:277-289), and partition pruning over the date layout
(the ${yyyy}/${MM}/${dd} directory scheme, ExtractFexApp.java:275-287 —
hidden partitioning under Iceberg, explicit partition columns here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def load_table(spark: SparkSession, path_or_ident: str) -> DataFrame:
    """Load by parquet path or (if an Iceberg catalog is live) identifier."""
    if "/" not in path_or_ident and iceberg_available(spark):
        return spark.read.format("iceberg").load(path_or_ident)
    return spark.read.parquet(path_or_ident)


def load_sf_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in TPCH_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the standard tables as temp views for spark.sql access."""
    for name, df in load_sf_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
