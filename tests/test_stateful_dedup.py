"""Cross-batch stateful dedup (applyInPandasWithState): duplicates are
caught within a batch, across batches via checkpointed state, and never
false-positive on unique keys."""

from __future__ import annotations

import pandas as pd

from dcc_validate_metadata_spark.streaming.stateful_dedup import (
    run_streaming_dedup,
)

SCHEMA = "image_id string, payload string"


def _write(landing, name, ids):
    pd.DataFrame({"image_id": ids, "payload": ["x"] * len(ids)}).to_parquet(
        landing / name, index=False
    )


def test_within_and_cross_batch_duplicates(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    out = tmp_path / "dedupout"

    # batch 1: one in-batch duplicate (b appears twice)
    _write(landing, "p0.parquet", ["a", "b", "b", "c"])
    run_streaming_dedup(spark, str(landing), str(out), schema=SCHEMA)
    d1 = spark.read.parquet(str(out / "duplicates")).toPandas()
    assert d1["key"].tolist() == ["b"]

    # batch 2: 'a' and 'c' repeat (cross-batch dups), 'd' is new
    _write(landing, "p1.parquet", ["a", "d", "c"])
    run_streaming_dedup(spark, str(landing), str(out), schema=SCHEMA)
    d2 = spark.read.parquet(str(out / "duplicates")).toPandas()
    assert sorted(d2["key"].tolist()) == ["a", "b", "c"]

    # batch 3: repeats of everything, including the batch-2 newcomer
    _write(landing, "p2.parquet", ["d", "b"])
    run_streaming_dedup(spark, str(landing), str(out), schema=SCHEMA)
    d3 = spark.read.parquet(str(out / "duplicates")).toPandas()
    assert sorted(d3["key"].tolist()) == ["a", "b", "b", "c", "d"]


def test_no_false_positives_many_groups(spark, tmp_path):
    landing = tmp_path / "landing2"
    landing.mkdir()
    out = tmp_path / "dedupout2"
    _write(landing, "p0.parquet", [f"k{i}" for i in range(500)])
    run_streaming_dedup(spark, str(landing), str(out), schema=SCHEMA)
    dups = spark.read.parquet(str(out / "duplicates"))
    assert dups.count() == 0
