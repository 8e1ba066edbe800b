"""Catalog over the driver-provided TPC-H-ish parquet tables.

Stands in for the reference's per-entity Elasticsearch indices
(``api/views.py:30-44`` ``ALLOWED_INDICES``): one DataFrame per entity,
registered as temp views so both the DataFrame API and ``spark.sql`` work.
Parquet scans give Catalyst pushdown/pruning for free (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
