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


def cohort_retention(events: DataFrame) -> DataFrame:
    """(cohort_month, activity_month, n_users) — classic cohort
    retention matrix: users grouped by the calendar month of their
    FIRST event, counted once per later month they were active in.
    Month keys are 'yyyy-MM' strings (UTC, engine-exact).

    Scale shape: both the (user, month) distinct and the first-month
    reduction are partial-aggregated groupBys on user_id sharing one
    shuffle; the final matrix groupBy runs on months × cohorts — a
    tiny key space. No windows, no sorting of the event stream.
    """
    um = events.select(
        "user_id", F.date_format("ts", "yyyy-MM").alias("activity_month")
    ).distinct()
    first = um.groupBy("user_id").agg(
        F.min("activity_month").alias("cohort_month")
    )
    return (
        um.join(first, "user_id")
        .groupBy("cohort_month", "activity_month")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def rolling_active_users(events: DataFrame, window_days: int = 7) -> DataFrame:
    """(day, n_active_1d, n_active_wd) — daily and trailing-N-day
    distinct active users, the DAU/WAU health curve. Exact (no sketch):
    each (user, active-day) pair contributes to the ``window_days``
    observation days it stays inside, then one distinct+count per
    observation day; days beyond the data's [min, max] range are
    clamped, and gap days WITHIN range still get a row whenever a
    trailing window covers them.

    Scale shape: the explode amplifies per-user-DAY rows (already
    collapsed from raw events by a partial-agg distinct) by
    ``window_days`` — bounded, and the per-day count is again a
    partial-agg groupBy. All date math on integer epoch days (Spark
    ``datediff`` = DuckDB date subtraction) so the oracle hash-matches.
    """
    epoch = F.lit("1970-01-01").cast("date")
    ud = events.select(
        "user_id", F.datediff(F.to_date("ts"), epoch).alias("d")
    ).distinct()
    bounds = F.broadcast(ud.agg(F.min("d").alias("dmin"), F.max("d").alias("dmax")))
    contrib = (
        ud.crossJoin(bounds)
        .select(
            "user_id",
            "d",
            "dmax",
            F.explode(
                F.sequence(F.col("d"), F.least(F.col("d") + window_days - 1, F.col("dmax")))
            ).alias("od"),
        )
        .select("user_id", "od", (F.col("od") == F.col("d")).alias("same_day"))
    )
    per_day = contrib.groupBy("od").agg(
        F.count_distinct(F.when(F.col("same_day"), F.col("user_id"))).alias(
            "n_active_1d"
        ),
        F.count_distinct("user_id").alias("n_active_wd"),
    )
    return per_day.select(
        F.date_add(epoch, F.col("od").cast("int")).alias("day"),
        F.col("n_active_1d").cast("long").alias("n_active_1d"),
        F.col("n_active_wd").cast("long").alias("n_active_wd"),
    )
