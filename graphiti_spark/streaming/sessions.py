"""Streaming gap-based sessionization — the Structured Streaming
sibling of the batch ``operators/events.py::sessionize``.

The batch operator computes 30-minute-gap sessions with lag +
running-sum windows (deterministic, DuckDB-oracle-checkable). A live
deployment runs the SAME semantics with the engine's native
``session_window`` aggregation: state is one open session per active
user (merged as events arrive, emitted once the watermark passes the
session's close), so memory is O(active users), not O(stream).

Two deliberate semantic notes, pinned by tests/test_streaming.py:

- For ON-TIME data the per-session aggregates (start, end, event
  count, error count, value cents, max k) match the batch operator
  exactly, session for session. ``session_id`` differs by design:
  the batch id is the session's MIN event_id (content-derived), while
  session_window keys sessions by (user, window start) — the test
  aligns on (user_id, session_start).
- Late events beyond the watermark are DROPPED from session state
  (bounded state at 10^12-event scale); the batch operator replayed
  over the full log is the reconciliation path, exactly the
  rates-vs-graph division of ``streaming/rates.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.events import SESSION_GAP_MINUTES, _K_RE

DEFAULT_DELAY = "1 hour"


def session_agg(
    events: DataFrame,
    gap_minutes: int = SESSION_GAP_MINUTES,
    watermark_delay: str = DEFAULT_DELAY,
) -> DataFrame:
    """(user_id, session_start, session_end, n_events, n_errors,
    value_cents, max_k) — native session_window aggregation over an
    events frame (streaming or batch; ``withWatermark`` is a no-op on
    batch input, which is how the equivalence test runs both paths).

    value_cents uses the batch operator's exact per-event rounding
    (``round(value·100)`` cast to long), max_k the same pinned regex
    over props — identical arithmetic, so the session-for-session
    comparison is exact, not approximate.
    """
    df = events
    # the fixture stores TIMESTAMP_NTZ; watermarks require TIMESTAMP —
    # the cast is value-preserving under the session's pinned UTC TZ
    # (same routing the batch operator documents for epoch seconds)
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    if df.isStreaming:
        df = df.withWatermark("ts", watermark_delay)
    cents = F.round(F.col("value") * 100).cast("long")
    k = F.regexp_extract(F.col("props"), _K_RE, 1).cast("int")
    return (
        df.groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("w"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("long")
            .alias("n_errors"),
            F.sum(cents).cast("long").alias("value_cents"),
            F.max(k).alias("max_k"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            "user_id", "session_start", "session_end",
            "n_events", "n_errors", "value_cents", "max_k",
        )
    )
