"""Windowed streaming stats: append-mode windows must exactly equal the
batch computation for every window the watermark closed, and late-but-
within-watermark rows must land in their event-time window."""

from __future__ import annotations

import shutil
from pathlib import Path

import pandas as pd

from pyspark.sql import functions as F

from dcc_validate_metadata_spark.streaming import run_windowed_stats
from dcc_validate_metadata_spark.streaming.windowed_stats import EVENTS_SCHEMA

SF_EVENTS = "/root/testdata/sf0.001/events.parquet"


def test_stream_windows_match_batch(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    shutil.copy(SF_EVENTS, landing / "part-000.parquet")
    out = tmp_path / "wout"

    run_windowed_stats(spark, str(landing), str(out), window="1 day", watermark="2 days")
    got = (
        spark.read.parquet(str(out / "windows"))
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    assert len(got) > 0

    # batch twin over the same input, restricted to windows the stream's
    # final watermark (max ts - 2 days) had closed
    ev = spark.read.schema(EVENTS_SCHEMA).parquet(str(landing))
    max_ts = ev.agg(F.max("ts")).first()[0]
    batch = (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
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
        .filter(F.col("window_end") <= F.lit(max_ts) - F.expr("INTERVAL 2 DAYS"))
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, batch)


def test_late_rows_within_watermark_counted(spark, tmp_path):
    landing = tmp_path / "landing2"
    landing.mkdir()
    out = tmp_path / "wout2"

    def write(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        pdf["props"] = pdf["props"].astype("string")  # all-None must still be typed
        # pandas defaults to nanosecond timestamps, which Spark's parquet
        # reader rejects against a TimestampType schema — write micros
        pdf.to_parquet(
            landing / name, index=False,
            coerce_timestamps="us", allow_truncated_timestamps=True,
        )

    # batch 1: two days of events
    write(
        "p0.parquet",
        [
            (1, "2026-01-01 10:00:00", 1, "click", 1.0, None),
            (2, "2026-01-01 11:00:00", 2, "click", 1.0, None),
            (3, "2026-01-02 09:00:00", 1, "view", 1.0, None),
        ],
    )
    run_windowed_stats(spark, str(landing), str(out), window="1 day", watermark="1 day")

    # batch 2: a LATE click for Jan 1 (1 day late, still within the 1-day
    # watermark relative to the new max ts Jan 4) plus an advancing event
    write(
        "p1.parquet",
        [
            (4, "2026-01-01 23:00:00", 3, "click", 1.0, None),
            (5, "2026-01-04 12:00:00", 4, "view", 1.0, None),
        ],
    )
    run_windowed_stats(spark, str(landing), str(out), window="1 day", watermark="1 day")

    got = spark.read.parquet(str(out / "windows")).toPandas()
    jan1_clicks = got[
        (got.window_start == pd.Timestamp("2026-01-01")) & (got.event_type == "click")
    ]
    assert len(jan1_clicks) == 1
    # the late row made it into the window before the watermark closed it
    assert int(jan1_clicks.iloc[0]["n_events"]) == 3


def test_stream_sessions_match_batch(spark, tmp_path):
    """Streaming sessionization (append mode) emits exactly the sessions
    the batch session_window computation produces, restricted to those
    the final watermark closed — the same groupBy definition serves both
    modes (w2_sessionization's streaming claim, proven)."""
    from dcc_validate_metadata_spark.streaming import run_sessionized_stats

    landing = tmp_path / "landing_s"
    landing.mkdir()
    shutil.copy(SF_EVENTS, landing / "part-000.parquet")
    out = tmp_path / "sout"

    run_sessionized_stats(
        spark, str(landing), str(out), gap="30 minutes", watermark="2 hours"
    )
    got = (
        spark.read.parquet(str(out / "sessions"))
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    assert len(got) > 0

    ev = spark.read.schema(EVENTS_SCHEMA).parquet(str(landing))
    max_ts = ev.agg(F.max("ts")).first()[0]
    batch = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
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
        .filter(F.col("session_end") <= F.lit(max_ts) - F.expr("INTERVAL 2 HOURS"))
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, batch)
    # sanity: sessions really merge events (some multi-event sessions)
    assert (got["n_events"] > 1).any()
