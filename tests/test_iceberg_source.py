"""Iceberg source layer: in this sandbox (no runtime jars) every entry
point must detect the absence and fall back to the partitioned-parquet
layout without behavior change."""

from __future__ import annotations

import pytest

from dcc_validate_metadata_spark.sources.iceberg import (
    create_image_table,
    iceberg_available,
    load_table,
    overwrite_partitions,
)
from dcc_validate_metadata_spark.sources.image_table import load_image_table


def test_no_iceberg_in_sandbox(spark):
    assert iceberg_available(spark) is False


def test_create_raises_without_runtime(spark):
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        create_image_table(spark, "local.db.images")


def test_load_falls_back_to_parquet(spark, fixture_dir):
    via_iceberg = load_table(spark, str(fixture_dir / "image_caption"))
    via_parquet = load_image_table(spark, fixture_dir / "image_caption")
    assert via_iceberg.schema == via_parquet.schema
    assert via_iceberg.count() == via_parquet.count()


def test_overwrite_partitions_is_idempotent(spark, fixture_dir, tmp_path):
    df = load_image_table(spark, fixture_dir / "image_caption")
    sub = df.filter(df.fmt == "png")
    out = str(tmp_path / "iceberg_fallback")
    overwrite_partitions(sub, out)
    n1 = spark.read.parquet(out).count()
    overwrite_partitions(sub, out)  # rewrite same partitions: no dupes
    n2 = spark.read.parquet(out).count()
    assert n1 == n2 == sub.count()


def test_upsert_by_key_partition_scoped(spark, tmp_path):
    """S11 analogue: keyed upsert rewrites only the partitions the batch
    touches; untouched partitions keep their files."""
    import os

    from pyspark.sql import functions as F

    from dcc_validate_metadata_spark.sources.iceberg import upsert_by_key

    path = str(tmp_path / "kv")
    base = spark.createDataFrame(
        [(f"id{i}", i % 3, f"v{i}") for i in range(30)],
        "doc_id string, shard int, val string",
    )
    upsert_by_key(spark, path, base, ["doc_id"], partition_cols=["shard"])
    before = {
        s: sorted(os.listdir(f"{path}/shard={s}")) for s in (0, 1, 2)
    }

    # update 2 keys in shard 1, insert 1 new key in shard 1
    updates = spark.createDataFrame(
        [("id1", 1, "NEW1"), ("id4", 1, "NEW4"), ("id99", 1, "FRESH")],
        "doc_id string, shard int, val string",
    )
    upsert_by_key(spark, path, updates, ["doc_id"], partition_cols=["shard"])

    got = {r["doc_id"]: r["val"] for r in spark.read.parquet(path).collect()}
    assert len(got) == 31
    assert got["id1"] == "NEW1" and got["id4"] == "NEW4" and got["id99"] == "FRESH"
    assert got["id2"] == "v2"  # untouched key intact
    # untouched partitions were not rewritten (same files on disk)
    after = {s: sorted(os.listdir(f"{path}/shard={s}")) for s in (0, 2)}
    assert after[0] == before[0] and after[2] == before[2]


def test_upsert_by_key_unpartitioned(spark, tmp_path):
    from dcc_validate_metadata_spark.sources.iceberg import upsert_by_key

    path = str(tmp_path / "flat")
    upsert_by_key(
        spark,
        path,
        spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int"),
        ["k"],
    )
    upsert_by_key(
        spark,
        path,
        spark.createDataFrame([("b", 20), ("c", 3)], "k string, v int"),
        ["k"],
    )
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {"a": 1, "b": 20, "c": 3}


def test_upsert_null_partition_keeps_existing_rows(spark, tmp_path):
    """A batch touching a NULL-valued partition must still merge that
    partition's existing rows: null-unsafe equality would exclude them
    from `kept` while dynamic overwrite rewrites the partition —
    silently deleting other keys' rows."""
    from dcc_validate_metadata_spark.sources.iceberg import upsert_by_key

    path = str(tmp_path / "nullpart")
    base = spark.createDataFrame(
        [("a", None, "va"), ("b", None, "vb"), ("c", 1, "vc")],
        "doc_id string, shard int, val string",
    )
    upsert_by_key(spark, path, base, ["doc_id"], partition_cols=["shard"])
    updates = spark.createDataFrame(
        [("a", None, "NEW")], "doc_id string, shard int, val string"
    )
    upsert_by_key(spark, path, updates, ["doc_id"], partition_cols=["shard"])
    got = {r["doc_id"]: r["val"] for r in spark.read.parquet(path).collect()}
    assert got == {"a": "NEW", "b": "vb", "c": "vc"}


def test_upsert_empty_batch_is_noop(spark, tmp_path):
    import os

    from dcc_validate_metadata_spark.sources.iceberg import upsert_by_key

    path = str(tmp_path / "kv2")
    base = spark.createDataFrame(
        [("a", 0, "va")], "doc_id string, shard int, val string"
    )
    upsert_by_key(spark, path, base, ["doc_id"], partition_cols=["shard"])
    before = sorted(os.listdir(f"{path}/shard=0"))
    empty = base.limit(0)
    upsert_by_key(spark, path, empty, ["doc_id"], partition_cols=["shard"])
    upsert_by_key(spark, path, empty, ["doc_id"])  # full-table path too
    assert sorted(os.listdir(f"{path}/shard=0")) == before
    got = {r["doc_id"]: r["val"] for r in spark.read.parquet(path).collect()}
    assert got == {"a": "va"}
