"""Event-stream operators over the `events` table: gap-based
sessionization — the canonical event-analytics shape (and the batch
form of what a Structured Streaming deployment runs with
``session_window``; the batch window formulation here is
deterministic and DuckDB-oracle-checkable).

Scale shape: ONE shuffle on user_id; both windows (lag + running sum)
and the final per-session aggregation share that partitioning, so
Catalyst plans a single Exchange regardless of event count. Hot users
are bounded by human activity (no corpus-wide hot key); value sums are
kept in integer cents so multiset comparison is float-order-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SESSION_GAP_MINUTES = 30

# props is a fixed '{"k": N}' payload in the fixture; a pinned regex
# keeps Spark and the DuckDB oracle byte-identical without depending on
# JSON-function parity across engines
_K_RE = r'"k": ([0-9]+)'


def sessionize(
    events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES
) -> DataFrame:
    """(user_id, session_id, session_start, session_end, n_events,
    n_errors, value_cents, max_k) — one row per user session, where a
    session breaks when consecutive events are more than
    ``gap_minutes`` apart (epoch-second arithmetic, deterministic).

    ``session_id`` = the session's MINIMUM event_id (content-derived,
    stable under replays — never a rank or uuid; note this differs from
    "first event's id" whenever event_ids are not monotone in ts for a
    user — both engines use MIN deliberately)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # the fixture stores ts as TIMESTAMP_NTZ; route through timestamp
    # (session TZ is pinned UTC in session.py) to get epoch seconds —
    # the same value DuckDB's floor(epoch(ts)) computes on naive ts
    secs = F.col("ts").cast("timestamp").cast("long")
    prev = F.lag(secs).over(w)
    is_new = (prev.isNull() | ((secs - prev) > gap_minutes * 60)).cast("int")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_sess = events.withColumn("sess_idx", F.sum(is_new).over(run))
    sess_w = Window.partitionBy("user_id", "sess_idx")
    return (
        with_sess.withColumn(
            "session_id", F.min(F.col("event_id")).over(sess_w).cast("long")
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum((F.col("event_type") == "error").cast("int"))
            .cast("long")
            .alias("n_errors"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("value_cents"),
            F.max(F.regexp_extract("props", _K_RE, 1).cast("int")).alias("max_k"),
        )
    )


DEFAULT_FUNNEL = ("view", "click", "signup", "purchase")


def funnel(events: DataFrame, steps: tuple = DEFAULT_FUNNEL) -> DataFrame:
    """(step_idx, step_name, n_users) — ordered conversion funnel: a
    user counts for step i iff they performed step i's event type
    strictly AFTER their earliest qualifying time for step i−1 (the
    classic strictly-ordered funnel; ties at the same timestamp do not
    advance).

    Scale shape: one filtered groupBy(user) per step, chained by a
    per-user equi-join — k small aggregations over the SAME user_id
    partitioning (no windows, no sequence explode, no per-user event
    sorting); each step's frame only shrinks. k is a query constant,
    so this is a fixed-depth DAG regardless of event count."""
    reached = None  # (user_id, ts_i)
    counts = []
    for i, step in enumerate(steps):
        ev = events.where(F.col("event_type") == step).select(
            "user_id", F.col("ts").alias("_t")
        )
        if reached is None:
            cur = ev
        else:
            cur = ev.join(reached, "user_id").where(F.col("_t") > F.col("_ts"))
        reached = cur.groupBy("user_id").agg(F.min("_t").alias("_ts"))
        # global agg (no GROUP BY) so a step nobody reached still emits
        # one row with n_users = 0, matching the oracle's COUNT(*)
        counts.append(
            reached.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
                F.lit(i + 1).cast("int").alias("step_idx"),
                F.lit(step).alias("step_name"),
                "n_users",
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out
