"""Structured Streaming forms of the event operators.

The reference is strictly batch (SURVEY.md §2.A explicit negatives); these
are the north-star streaming twins, kept expression-compatible with the
batch plans in plans/queries.py so one set of semantics serves both.

Patterns: file-source ``readStream`` with an explicit schema (ns-int64 ts
conversion identical to the batch reader), event-time watermarks, tumbling
``window()`` aggregation, ``session_window`` gap sessionization,
``dropDuplicatesWithinWatermark`` for late-dup removal, and an
``applyInPandasWithState`` custom stateful operator. Tests drive each with
``trigger(availableNow=True)`` into a memory sink and assert equality with
the batch results.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import EVENTS, EVENTS_RAW


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the events parquet (same ts-unit sniffing
    as io.read_table: ns fixtures read as raw int64 + integer division,
    us fixtures read natively — a streaming schema is static, so the
    unit is resolved once at plan-build time from the footer)."""
    import os

    from ..io import events_ts_unit

    is_ns = (
        events_ts_unit(os.path.join(sf_dir, "events.parquet")) == "ns"
    )
    reader = (
        spark.readStream.schema(EVENTS_RAW if is_ns else EVENTS)
        .option("pathGlobFilter", "events.parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    out = reader.parquet(sf_dir)
    if is_ns:
        out = out.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return out


def tumbling_counts(
    events: DataFrame, window_size: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window aggregation — the streaming twin of the
    batch events_tumbling plan (same exact-decimal sum)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_size), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,10)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_bucket"
            ),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap sessionization via the built-in session_window — the streaming
    twin of the batch lag/cumsum sessionizer."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,10)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Late-duplicate removal keyed on event_id, bounded state via the
    watermark (the streaming form of exact dedup)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_to_memory(
    stream_df: DataFrame,
    output_mode: str = "complete",
    table_name: str | None = None,
) -> DataFrame:
    """Execute a streaming plan with availableNow into a memory sink and
    return the result table (drains all available input, then stops)."""
    name = table_name or f"stream_result_{uuid.uuid4().hex[:8]}"
    query = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return stream_df.sparkSession.table(name)


def hopping_counts(
    events: DataFrame,
    width: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked hopping-window aggregation — streaming twin of the
    batch events_hopping plan (every event lands in width/slide
    epoch-aligned windows; identical exact-decimal sum)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,10)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "win_start"
            ),
            F.date_format(F.col("window.end"), "yyyy-MM-dd HH:mm:ss").alias(
                "win_end"
            ),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def interval_join_pairs(
    events: DataFrame, band_seconds: int = 60, watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream self-join with a time-range condition — streaming
    twin of the batch banded range join (events_copair_60s). The
    watermark plus the range bound let Spark expire join state: side *a*
    rows are held only ``band_seconds`` past the watermark."""
    a = events.withWatermark("ts", watermark).alias("a")
    b = events.withWatermark("ts", watermark).alias("b")
    return a.join(
        b,
        F.expr(
            f"""a.user_id = b.user_id
            AND b.ts > a.ts
            AND b.ts <= a.ts + INTERVAL {band_seconds} SECONDS"""
        ),
    ).select(
        F.col("a.user_id").alias("user_id"),
        F.col("a.event_id").alias("a_id"),
        F.col("b.event_id").alias("b_id"),
        F.col("a.event_type").alias("a_type"),
        F.col("b.event_type").alias("b_type"),
        (
            F.unix_micros(F.col("b.ts")) - F.unix_micros(F.col("a.ts"))
        ).alias("gap_us"),
    )
