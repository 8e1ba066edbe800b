"""Structured Streaming ingestion validation.

The reference has no true stream processing (SURVEY.md §2.8) — its
streaming-shaped surface is Celery task fan-out plus WebSocket progress
events (``metadata_validation_conversion/helpers.py:67-109``,
``ws/consumers.py:6-96``). At 10^12-image scale the natural analogue is
continuous ingestion: new image+caption files land in the table location
and must be validated as they arrive, emitting violations and per-batch
status events incrementally.

Spark-first realization:

* ``readStream`` over the table directory (file-source; Iceberg's
  streaming read on a real cluster) with the fixed input schema — schema
  is enforced at the source, no inference on executors.
* Every micro-batch runs the SAME ``build_violations`` plan as the batch
  pipeline (one code path for both — the rules are lazy Column
  expressions, so reuse is free).
* ``foreachBatch`` writes violations parquet under a ``batch=N``
  partition (dynamic overwrite, so a replayed micro-batch rewrites its
  own partitions instead of appending twice — idempotent, effectively
  exactly-once given the deterministic per-batch input) plus one status
  record per batch — the streaming equivalent of the reference's
  per-stage WS pushes (`Waiting` → … → `Finished`), durable instead of
  fire-and-forget.
* ``Trigger.AvailableNow`` drains the backlog then stops, which is also
  what the unit tests use; on a live cluster drop the trigger for a
  long-running query. Checkpointing prevents re-reading seen files; the
  batch-scoped overwrite above is what upgrades the restart story from
  at-least-once to effectively-exactly-once for the violations sink
  (the reference's visibility-timeout gives only at-least-once).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.image_table import IMAGE_SCHEMA


def stream_status_events(out_dir: str | Path) -> list[dict]:
    """Read back the per-batch status events (newest last)."""
    d = Path(out_dir) / "stream_status"
    if not d.exists():
        return []
    recs = []
    for f in sorted(d.glob("batch-*.json")):
        recs.append(json.loads(f.read_text()))
    return recs


def write_batch_violations(
    spark: SparkSession, violations: DataFrame, out: Path, batch_id: int
) -> int:
    """Idempotent per-batch violations write: batch-scoped dynamic
    overwrite (a replayed batch rewrites its own ``batch=N`` partitions
    instead of appending twice). Returns the batch's own violation count
    — read back from the written ``batch=N`` partitions, never from the
    whole accumulated directory."""
    tagged = violations.withColumn("batch", F.lit(int(batch_id)))
    (
        tagged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch", "fmt", "bucket")
        .parquet(str(out / "violations"))
    )
    from pyspark.errors import AnalysisException

    try:
        # read ONLY this batch's partition directory — the accumulated
        # root is never listed, so the count stays O(batch) even on a
        # stream with 10^5 completed batches (counting `tagged` pre-write
        # instead would recompute the decode lineage a second time)
        return spark.read.parquet(str(out / "violations" / f"batch={int(batch_id)}")).count()
    except AnalysisException as e:
        # only "no directory yet" means a zero-violation batch; any
        # other failure must surface, or the status events would record
        # a silently-wrong 0 and the running total would drift
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return 0
        raise


def validate_stream(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    ontology: DataFrame | None = None,
    ruleset=None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start (and with ``available_now=True`` run to completion) a
    streaming validation over ``input_path``. Returns the StreamingQuery.

    Outputs under ``out_dir``:
      ``violations/`` — parquet partitioned by (batch, fmt, bucket);
        each micro-batch dynamically overwrites only its own ``batch=N``
        partitions, so replays after a crash cannot double-append
      ``stream_status/batch-N.json`` — one status event per micro-batch
        with the batch's own violation count and a running total
      ``checkpoint/`` — Spark streaming checkpoint (restart-safe)
    """
    from ..plans.pipeline import build_violations

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    status_dir = out / "stream_status"
    status_dir.mkdir(exist_ok=True)

    # The staging dir is column-complete flat parquet (an ingestion landing
    # zone, not the fmt=/bucket=/ partitioned table): file-stream sources
    # don't do hive-partition discovery, so all 8 columns live in-file.
    reader = spark.readStream.schema(IMAGE_SCHEMA).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.load(str(input_path))

    def _last_running_total(before_batch: int) -> int:
        """Resume the running total from the newest prior status event —
        O(#batches) tiny-file glob, never a rescan of the violations data."""
        best = None
        for f in status_dir.glob("batch-*.json"):
            try:
                bid = int(f.stem.split("-", 1)[1])
            except ValueError:
                continue
            if bid < before_batch and (best is None or bid > best[0]):
                best = (bid, f)
        if best is None:
            return 0
        try:
            return int(json.loads(best[1].read_text())["total_violation_rows"])
        except (OSError, KeyError, ValueError):
            return 0

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.uniqueness import release_dup_tables

        t0 = time.time()
        n_rows = batch_df.count()
        violations = build_violations(batch_df, ruleset=ruleset, ontology=ontology)
        n_viol_batch = write_batch_violations(spark, violations, out, batch_id)
        # the batch's violations are on disk: release the per-unique-rule
        # dup-table caches, or thousands of micro-batches leak storage
        release_dup_tables()
        event = {
            "batch_id": int(batch_id),
            "status": "Finished",
            "n_rows": int(n_rows),
            "n_violation_rows": int(n_viol_batch),
            "total_violation_rows": _last_running_total(int(batch_id))
            + int(n_viol_batch),
            "elapsed_sec": round(time.time() - t0, 3),
            "finished": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        tmp = status_dir / f".batch-{batch_id}.{uuid.uuid4().hex[:6]}.tmp"
        tmp.write_text(json.dumps(event))
        os.rename(tmp, status_dir / f"batch-{batch_id}.json")

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", str(out / "checkpoint"))
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if available_now:
        query.awaitTermination()
    return query
