"""Event-time windowed aggregation with watermark-based late-data
handling over the ``events`` stream table.

The reference's "streaming" is task-progress plumbing with no event-time
semantics (SURVEY.md §2.8); a 10^12-row ingestion pipeline needs real
ones: per-window quality counters that tolerate out-of-order arrival and
drop state for windows older than the watermark. This is the native
Structured Streaming shape — state lives in the streaming aggregation,
bounded by the watermark, scaling with (windows x keys), not rows.

In append output mode a window is emitted exactly once, when the
watermark passes its end — so downstream consumers (the drift monitor
comparing adjacent windows) see each window as an immutable row, the
same contract as the batch pipeline's per-partition verdicts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def windowed_event_stats(
    stream: DataFrame,
    window: str = "1 day",
    watermark: str = "2 days",
) -> DataFrame:
    """Windowed per-type counters: (window_start, window_end, event_type,
    n_events, n_users_approx, sum_value). Late rows within the watermark
    still land in their event-time window; older ones are dropped and the
    window's state is freed — bounded state at unbounded input."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "n_users_approx",
            "sum_value",
        )
    )


def sessionized_user_stats(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time sessionization on the stream — the SAME
    ``session_window`` groupBy as the batch ``w2_sessionization`` query,
    so one definition serves both execution modes (the Structured
    Streaming contract). Sessions are dynamic-length state: a session
    stays open while events keep arriving within ``gap`` of its end and
    is emitted exactly once (append mode) when the watermark passes the
    session end. State is O(open sessions), not O(events). The value sum
    goes through an exact DECIMAL so totals are aggregation-order
    independent, byte-identical to the batch twin."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def _run_event_stream(
    spark: SparkSession, input_path: str, out_dir: str, agg_fn, subdir: str
):
    """Shared runner: file-stream the events landing dir, apply the
    aggregation, write append-mode results to parquet, drain with
    availableNow. One place owns the readStream/writeStream/checkpoint
    boilerplate for both the windowed and sessionized stats."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(str(input_path))
    )
    q = (
        agg_fn(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{out_dir}/{subdir}")
        .option("checkpointLocation", f"{out_dir}/checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_sessionized_stats(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
):
    """File-stream the events landing dir, write watermark-closed
    sessions to parquet (append mode, availableNow drain)."""
    return _run_event_stream(
        spark,
        input_path,
        out_dir,
        lambda s: sessionized_user_stats(s, gap=gap, watermark=watermark),
        "sessions",
    )


def run_windowed_stats(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    window: str = "1 day",
    watermark: str = "2 days",
):
    """File-stream the events landing dir, write closed windows (append
    mode: one immutable row per window, emitted when the watermark passes
    its end) to parquet; availableNow drains the backlog then stops."""
    return _run_event_stream(
        spark,
        input_path,
        out_dir,
        lambda s: windowed_event_stats(s, window=window, watermark=watermark),
        "windows",
    )
