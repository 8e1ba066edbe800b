"""Streaming ingestion validation: files land incrementally, each
micro-batch emits violations + a durable status event, and a restart with
the same checkpoint does not re-validate already-seen files."""

from __future__ import annotations

import pandas as pd
import pytest

from dcc_validate_metadata_spark.sources.image_table import (
    _gen_row,
    _rows_to_pdf,
)
from dcc_validate_metadata_spark.streaming import (
    stream_status_events,
    validate_stream,
)


def _write_landing_file(spark, path, idx_range):
    rows = [_gen_row(i, seed=42, n_buckets=4) for i in idx_range]
    pdf = _rows_to_pdf(rows)
    pdf.to_parquet(path, index=False)
    return rows


@pytest.fixture(scope="module")
def ontology(spark, fixture_dir):
    return spark.read.parquet(str(fixture_dir / "ontology_terms.parquet"))


def test_stream_validates_incrementally(spark, ontology, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    out = tmp_path / "streamout"

    _write_landing_file(spark, landing / "part-000.parquet", range(0, 300))
    validate_stream(spark, str(landing), str(out), ontology=ontology)
    ev1 = stream_status_events(out)
    assert len(ev1) >= 1
    assert sum(e["n_rows"] for e in ev1) == 300
    v1 = spark.read.parquet(str(out / "violations")).count()
    assert v1 > 0  # planted violations in slots 5,15,25,...

    # second file lands; a fresh availableNow query drains ONLY the new file
    _write_landing_file(spark, landing / "part-001.parquet", range(300, 500))
    validate_stream(spark, str(landing), str(out), ontology=ontology)
    ev2 = stream_status_events(out)
    assert sum(e["n_rows"] for e in ev2) == 500  # 300 + 200, no re-reads
    v2 = spark.read.parquet(str(out / "violations")).count()
    assert v2 > v1

    # idempotent restart with nothing new: no rows processed
    validate_stream(spark, str(landing), str(out), ontology=ontology)
    ev3 = stream_status_events(out)
    assert sum(e["n_rows"] for e in ev3) == 500

    # status events carry per-batch counts plus a running total — the
    # total equals the sum of batch counts AND the on-disk row count
    # (per-batch cost never rescans the accumulated directory)
    assert all("n_violation_rows" in e for e in ev3)
    assert ev3[-1]["total_violation_rows"] == sum(
        e["n_violation_rows"] for e in ev3
    )
    assert ev3[-1]["total_violation_rows"] == v2
    # violations are batch-scoped on disk (idempotent replay layout)
    assert "batch" in spark.read.parquet(str(out / "violations")).columns


def test_stream_violations_match_batch(spark, ontology, tmp_path):
    """The streaming path and the batch path produce identical violation
    rows for the same input (single shared build_violations plan)."""
    from dcc_validate_metadata_spark.plans.pipeline import build_violations

    landing = tmp_path / "landing2"
    landing.mkdir()
    out = tmp_path / "streamout2"
    _write_landing_file(spark, landing / "part-000.parquet", range(0, 202))

    validate_stream(spark, str(landing), str(out), ontology=ontology)
    got = (
        spark.read.parquet(str(out / "violations"))
        .toPandas()[["image_id", "field", "severity", "message"]]
        .sort_values(["image_id", "field", "message"])
        .reset_index(drop=True)
    )
    batch_df = spark.read.parquet(str(landing / "part-000.parquet"))
    exp = (
        build_violations(batch_df, ontology=ontology)
        .toPandas()[["image_id", "field", "severity", "message"]]
        .sort_values(["image_id", "field", "message"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_batch_write_replay_is_idempotent(spark, ontology, tmp_path):
    """A crashed-and-replayed micro-batch must not double-append: the
    batch-scoped dynamic overwrite rewrites its own batch=N partitions."""
    from pathlib import Path

    from dcc_validate_metadata_spark.plans.pipeline import build_violations
    from dcc_validate_metadata_spark.streaming.validate_stream import (
        write_batch_violations,
    )

    landing = tmp_path / "landing3"
    landing.mkdir()
    out = tmp_path / "streamout3"
    out.mkdir()
    _write_landing_file(spark, landing / "part-000.parquet", range(0, 120))
    batch_df = spark.read.parquet(str(landing / "part-000.parquet"))
    viol = build_violations(batch_df, ontology=ontology)

    n1 = write_batch_violations(spark, viol, Path(out), batch_id=0)
    n2 = write_batch_violations(spark, viol, Path(out), batch_id=0)  # replay
    assert n1 == n2 > 0
    total = spark.read.parquet(str(out / "violations")).count()
    assert total == n1  # no duplicates from the replay
    # a different batch appends alongside, untouched by batch-0 replays
    n3 = write_batch_violations(spark, viol, Path(out), batch_id=1)
    assert spark.read.parquet(str(out / "violations")).count() == n1 + n3
