"""Iceberg-aware table IO with a partitioned-parquet fallback.

The north rule targets Iceberg tables of image+caption pairs. This sandbox
has no Iceberg runtime jars, so every entry point here detects the
capability at runtime:

* **Iceberg available** (`iceberg-spark-runtime` on the classpath + a
  catalog configured, see :func:`iceberg_session_conf`): tables are read
  and written through ``format("iceberg")`` with hidden partitioning
  ``(fmt, bucket(N_BUCKETS, image_id))`` — the partition transform lives
  in table metadata, writers/readers never materialize a bucket column,
  and partition pruning follows from predicates on ``image_id``/``fmt``
  automatically.
* **Fallback (this sandbox)**: hive-layout parquet partitioned by
  ``(fmt, bucket)`` where ``bucket`` is an explicit
  ``crc32(image_id) % N_BUCKETS`` column (sources/image_table.py) — the
  same physical layout Iceberg's transform would produce, with pruning
  via directory filters. The engine's pipeline (plans/pipeline.py) only
  assumes this layout, so swapping the loader is the ONLY change needed
  on a real cluster.

What Iceberg adds at 10^12-row scale beyond the fallback, and why the
design leaves room for it: snapshot isolation for the idempotent
partition-overwrite commits (the manifest's effective exactly-once
becomes transactional), metadata-table planning instead of directory
listing (million-file tables), and ``RewriteDataFiles`` compaction after
skewed writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

N_BUCKETS = 8


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the classpath."""
    try:
        # py4j package access never raises; force a real classload
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Schema")
        return True
    except Exception:  # noqa: BLE001
        return False


def iceberg_session_conf(
    catalog: str = "local",
    warehouse: str = "/tmp/iceberg_warehouse",
) -> dict[str, str]:
    """Session conf enabling a Hadoop-catalog Iceberg deployment; pass to
    ``get_spark(extra_conf=...)`` on a cluster with the runtime jar."""
    return {
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
    }


def create_image_table(
    spark: SparkSession,
    table: str,
    n_buckets: int = N_BUCKETS,
) -> None:
    """Create the north-rule image table with hidden partitioning
    (Iceberg path only): ``PARTITIONED BY (fmt, bucket(n, image_id))``."""
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime not on the classpath; the sandbox fallback is "
            "sources/image_table.generate_* writing hive-layout parquet"
        )
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {table} (
            image_id STRING, bytes BINARY, w INT, h INT,
            fmt STRING, caption STRING, phash BIGINT
        )
        USING iceberg
        PARTITIONED BY (fmt, bucket({n_buckets}, image_id))
        TBLPROPERTIES ('write.distribution-mode' = 'hash')
        """
    )


def load_table(spark: SparkSession, table_or_path: str) -> DataFrame:
    """Read the image table: Iceberg identifier when the runtime is
    present and the name isn't a filesystem path, else partitioned
    parquet via the sandbox loader (types normalized either way)."""
    from .image_table import load_image_table

    looks_like_path = "/" in table_or_path
    if iceberg_available(spark) and not looks_like_path:
        return spark.read.format("iceberg").load(table_or_path)
    return load_image_table(spark, table_or_path)


def overwrite_partitions(df: DataFrame, table_or_path: str) -> None:
    """Idempotent per-partition overwrite (the resume-safe commit the
    manifest relies on): Iceberg's dynamic ``overwritePartitions`` when
    available — a transactional snapshot commit — else Spark's dynamic
    partition-overwrite on the parquet layout."""
    spark = df.sparkSession
    if iceberg_available(spark) and "/" not in table_or_path:
        df.writeTo(table_or_path).overwritePartitions()
        return
    # writer-scoped option, not session conf: mutating the shared session
    # would silently change overwrite semantics for the caller's own writes
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("fmt", "bucket")
        .parquet(table_or_path)
    )


def upsert_by_key(
    spark: SparkSession,
    table_or_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_cols: list[str] | None = None,
) -> None:
    """S11 analogue — the reference's ES index writer upserts documents
    by id (``trackhubs/tasks.py:330-375``); the engine's keyed sink is a
    partition-scoped merge:

    * **Iceberg available**: ``MERGE INTO … WHEN MATCHED UPDATE WHEN NOT
      MATCHED INSERT`` — a transactional row-level upsert; Iceberg
      rewrites only the files containing matched keys.
    * **Parquet fallback**: prune the existing table to the PARTITIONS
      present in the update batch (collected driver-side — a small list
      by construction, never data rows), anti-join away the updated keys,
      union the new rows, and dynamic-overwrite only those partitions.
      Untouched partitions are never read or rewritten, so the cost is
      O(touched partitions), not O(table) — the property that matters
      when one batch touches 10 of 10^5 partitions.

    Partition-stability contract (fallback path): with ``partition_cols``
    set, a key's partition value must be stable across updates (the id
    determines its partition, like ES routing) — a key that MOVES
    partitions would leave its old row behind because only touched
    partitions are merged. Keys without that property need
    ``partition_cols=None`` (full-table merge) or the Iceberg MERGE path,
    both of which handle moves correctly.
    """
    from pyspark.sql import functions as F

    if iceberg_available(spark) and "/" not in table_or_path:
        updates.createOrReplaceTempView("_upsert_src")
        on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
        spark.sql(
            f"MERGE INTO {table_or_path} t USING _upsert_src s ON {on} "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
        return
    from pyspark.errors import AnalysisException

    try:
        existing = spark.read.parquet(table_or_path)
    except AnalysisException as e:
        # ONLY a missing table is a first write; any other failure
        # (corrupt footer, permissions, transient FS error) must raise —
        # falling through would overwrite the whole table with the batch
        if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
            raise
        writer = updates.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(table_or_path)
        return
    if partition_cols:
        touched = updates.select(*partition_cols).distinct().collect()
        if not touched:
            return  # empty batch: nothing to merge, nothing to rewrite
        cond = None
        for row in touched:
            c = F.lit(True)
            for k in partition_cols:
                # eqNullSafe: a null-valued partition key must still SELECT
                # that partition's existing rows — plain == is never true
                # for null, which would drop other keys' rows from `kept`
                # while dynamic overwrite still rewrites the partition
                c = c & F.col(k).eqNullSafe(F.lit(row[k]))
            cond = c if cond is None else (cond | c)
        existing = existing.filter(cond)
    elif updates.isEmpty():
        return  # empty batch on the full-table path: no-op
    kept = existing.join(
        updates.select(*key_cols).distinct(), on=key_cols, how="left_anti"
    )
    merged = kept.unionByName(updates.select(*existing.columns))
    # break lineage before overwriting the path the plan reads from
    # (touched-partition-sized materialization, not the whole table)
    merged = merged.localCheckpoint(eager=True)
    writer = merged.write.mode("overwrite")
    if partition_cols:
        writer = writer.option("partitionOverwriteMode", "dynamic").partitionBy(
            *partition_cols
        )
    writer.parquet(table_or_path)
