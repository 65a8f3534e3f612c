"""Watermarked event-time ingest metrics — the streaming windowed-agg
analogue of the batch metrics table (SURVEY §2.13).

The reference records ingestion health driver-side (episode queue
logging, server/graph_service/routers/ingest.py:13-38); at cluster
scale the equivalent is an event-time aggregation over the episode
stream itself: episodes and extracted-span counts per
(event-time window, group_id), tolerating late arrivals up to a
bounded watermark delay. This is the one streaming shape the rest of
the engine deliberately avoids for the GRAPH tables (facts must never
be dropped; T1/T2 monotone merges handle out-of-order there) — but for
rate METRICS, bounded state + drop-too-late is exactly right: an
unwatermarked running agg over 10^12 docs of event time is unbounded
state.

Semantics (standard Structured Streaming):
- state per (window, group) only until the watermark passes the window
  end — O(open windows), not O(stream);
- rows later than (max event time seen − delay) are dropped from the
  aggregation (update/append modes) — tested explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..schemas import EPISODES_SCHEMA

DEFAULT_WINDOW = "30 days"
DEFAULT_DELAY = "30 days"


def episode_rate_agg(
    episodes: DataFrame,
    window_duration: str = DEFAULT_WINDOW,
    watermark_delay: str = DEFAULT_DELAY,
) -> DataFrame:
    """(window_start, window_end, group_id, n_episodes, n_text_spans)
    per event-time tumbling window of ``valid_at``.

    Works on a streaming OR batch episodes frame (``withWatermark`` is
    a no-op on batch input) — the batch form is the oracle in
    tests/test_streaming.py."""
    df = episodes
    if df.isStreaming:
        df = df.withWatermark("valid_at", watermark_delay)
    return (
        df.groupBy(
            F.window("valid_at", window_duration).alias("w"), "group_id"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_episodes"),
            F.sum(
                F.size(F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("text")))
            ).cast("long").alias("n_text_spans"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "group_id",
            "n_episodes",
            "n_text_spans",
        )
    )


def stream_ingest_rates(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    sink_table: str = "ingest_rates",
    window_duration: str = DEFAULT_WINDOW,
    watermark_delay: str = DEFAULT_DELAY,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """File-source episode stream → watermarked windowed rates into an
    update-mode in-memory sink (swap for a Delta/Iceberg/Kafka sink in
    production; update mode emits each window's refined count as the
    watermark advances)."""
    reader = spark.readStream.schema(EPISODES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    out = episode_rate_agg(
        stream, window_duration=window_duration, watermark_delay=watermark_delay
    )
    writer = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
