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
