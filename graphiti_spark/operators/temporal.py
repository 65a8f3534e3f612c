"""Bi-temporal edge resolution (T1/T2/T3) as window-ordered merges.

Reference semantics being replicated exactly (pure logic — no LLM):
- T1 ``resolve_edge_contradictions``
  (graphiti_core/utils/maintenance/edge_operations.py:379-409): for a
  resolved edge R and contradiction candidates C: skip c when intervals
  are disjoint (c.invalid_at <= R.valid_at or R.invalid_at <=
  c.valid_at); otherwise an older candidate (c.valid_at < R.valid_at)
  gets c.invalid_at = R.valid_at and c.expired_at = now.
- T2 new-edge self-expiry (edge_operations.py:505-519): the first
  candidate with valid_at > R.valid_at (candidates sorted by valid_at,
  line 507) sets R.invalid_at = c.valid_at.
- T3 invalid_at ⇒ expired_at (edge_operations.py:502-503;
  bulk_utils.py:459-460).
- T4 contradiction detection is an LLM call in the reference
  (temporal_operations.py:72-99); here it is the deterministic relation
  "same unordered endpoint pair AND same predicate-class", where a
  class groups mutually-contradicting predicates (corpus.CONTRADICTS —
  the LIKES/DISLIKES, WORKS_FOR/LEFT_JOB matrix of
  tests/utils/maintenance/test_temporal_operations_int.py:94-264) and
  every predicate contradicts its own older assertions.

Batch formulation: both T1 (seen from the older edge) and T2 (seen from
the newer edge) collapse to ONE rule over the set of mutually
contradicting facts: each fact's invalid_at is the smallest strictly
greater valid_at within its (pair, class) partition — a window-ordered
merge. Pre-existing closed intervals are respected: a candidate starting
at/after an existing invalid_at is disjoint and cannot shrink it
further, so the final invalid_at is least(existing, next-distinct
valid_at).

Scale notes: the shuffle key is (group_id, pair_key, pred_class) —
high cardinality even with a hot entity, because the hot entity pairs
with many distinct others. Purely columnar (whole-stage codegen), no
UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .. import corpus

# predicate → class id (canonical sorted join of the mutual-contradiction
# group; singleton predicates class with themselves).
def predicate_class_map() -> dict[str, str]:
    groups: dict[str, set[str]] = {}
    for a, b in corpus.CONTRADICTS:
        s = groups.setdefault(a, {a})
        s.add(b)
        groups[b] = groups.setdefault(b, {b}) | {a}
    # transitive closure within the tiny predicate set
    changed = True
    while changed:
        changed = False
        for p, s in list(groups.items()):
            ns = set(s)
            for q in s:
                ns |= groups.get(q, {q})
            if ns != s:
                groups[p] = ns
                changed = True
    out = {}
    for pred, _ in corpus.PREDICATES:
        cls = sorted(groups.get(pred, {pred}))
        out[pred] = "|".join(cls)
    return out


def with_pred_class(edges: DataFrame, pred_col: str = "predicate") -> DataFrame:
    mapping = predicate_class_map()
    expr = F.col(pred_col)
    col = None
    # build a chained when() — tiny map, constant-folded by Catalyst
    for pred, cls in mapping.items():
        cond = F.when(expr == pred, F.lit(cls))
        col = cond if col is None else col.when(expr == pred, F.lit(cls))
    col = col.otherwise(expr)
    return edges.withColumn("pred_class", col)


def pair_key(src: Column, dst: Column) -> Column:
    """Unordered endpoint pair (direction-agnostic, like the reference's
    `-[:RELATES_TO]-` match in get_relevant_edges,
    search_utils.py:781-848)."""
    return F.concat_ws("~", F.least(src, dst), F.greatest(src, dst))


def resolve_bitemporal(edges: DataFrame, batch_time: str = corpus.BATCH_TIME) -> DataFrame:
    """Apply T1/T2/T3 to a deduplicated edges DataFrame.

    Input columns required: group_id, source_node_uuid, target_node_uuid,
    predicate, valid_at; optional pre-existing invalid_at / expired_at.
    Returns the same frame with invalid_at/expired_at resolved.
    """
    if "invalid_at" not in edges.columns:
        edges = edges.withColumn("invalid_at", F.lit(None).cast("timestamp"))
    if "expired_at" not in edges.columns:
        edges = edges.withColumn("expired_at", F.lit(None).cast("timestamp"))

    e = with_pred_class(edges).withColumn(
        "pair", pair_key(F.col("source_node_uuid"), F.col("target_node_uuid"))
    )

    # Next strictly-greater valid_at within (group, pair, class):
    # computed over the DISTINCT valid_at set so equal timestamps never
    # shadow a later contradiction (lead() over raw rows would).
    distinct_va = e.select("group_id", "pair", "pred_class", "valid_at").dropDuplicates()
    w = Window.partitionBy("group_id", "pair", "pred_class").orderBy("valid_at")
    nxt = distinct_va.withColumn("next_valid_at", F.lead("valid_at").over(w))

    out = e.join(nxt, ["group_id", "pair", "pred_class", "valid_at"], "left")
    # T1 disjointness + least-non-null merge with pre-existing interval;
    # T3 expired_at stamp. F.least skips nulls (as does DuckDB/Postgres).
    out = (
        out.withColumn("invalid_at", F.least(F.col("invalid_at"), F.col("next_valid_at")))
        .withColumn(
            "expired_at",
            F.coalesce(
                F.col("expired_at"),
                F.when(
                    F.col("invalid_at").isNotNull(),
                    F.lit(batch_time).cast("timestamp"),
                ),
            ),
        )
        .drop("pair", "pred_class", "next_valid_at")
    )
    return out


def fact_churn(edges: DataFrame) -> DataFrame:
    """(group_id, month, n_started, n_invalidated, n_expired) — monthly
    fact-lifecycle timeline over the bi-temporal edge ledger: how many
    facts became valid, were invalidated (valid-time end), and were
    expired (transaction-time tombstone) in each calendar month. The
    churn curve is the standard freshness/volatility dashboard for a
    temporal KG (a spike in n_invalidated flags a contradiction storm
    or a bad ingest batch).

    Month keys are 'yyyy-MM' strings from UTC-normalized timestamps
    (T5) — engine-exact, no timezone arithmetic. Scale shape: one
    explode of each edge into ≤3 (month, kind) lifecycle events
    followed by a single partial-aggregated groupBy — months × groups
    is a tiny key space, so the shuffle is a rounding error.
    """
    def ev(col: str, kind: str) -> DataFrame:
        return (
            edges.where(F.col(col).isNotNull())
            .select(
                "group_id",
                F.date_format(F.col(col), "yyyy-MM").alias("month"),
                F.lit(kind).alias("kind"),
            )
        )

    events = (
        ev("valid_at", "started")
        .unionByName(ev("invalid_at", "invalidated"))
        .unionByName(ev("expired_at", "expired"))
    )
    return events.groupBy("group_id", "month").agg(
        F.sum(F.when(F.col("kind") == "started", 1).otherwise(0))
        .cast("long")
        .alias("n_started"),
        F.sum(F.when(F.col("kind") == "invalidated", 1).otherwise(0))
        .cast("long")
        .alias("n_invalidated"),
        F.sum(F.when(F.col("kind") == "expired", 1).otherwise(0))
        .cast("long")
        .alias("n_expired"),
    )


def fact_diff(edges: DataFrame, t1: str, t2: str) -> DataFrame:
    """(group_id, subj_name, predicate, obj_name, valid_at, status) —
    the event-time DELTA between two as-of instants: which temporal
    assertions became visible ('added') or ceased to be visible
    ('removed') between t1 and t2. This is the KG analogue of a CDC
    diff — "what changed in the graph last quarter" as one query —
    and composes the same slice predicate as point-in-time retrieval
    (T6), so the two snapshots are never materialized.

    A fact is visible at t iff valid_at <= t < coalesce(invalid_at,
    inf); keys are the distinct 5-tuples (group, subj, pred, obj,
    valid_at) — a re-asserted fact with a new valid_at is a new
    assertion, matching the ledger's grain.

    Scale shape: two filters over one scan of the ledger + one
    full-outer hash join on the assertion key; no windows, no state.
    Output rows are only the CHANGED assertions, so a quiet graph
    diffs to near-zero rows regardless of ledger size.
    """
    def visible(t: str) -> DataFrame:
        ts = F.lit(t).cast("timestamp")
        return (
            edges.where(
                (F.col("valid_at").isNotNull())
                & (F.col("valid_at") <= ts)
                & (F.col("invalid_at").isNull() | (F.col("invalid_at") > ts))
            )
            .select("group_id", "subj_name", "predicate", "obj_name", "valid_at")
            .distinct()
        )

    key = ["group_id", "subj_name", "predicate", "obj_name", "valid_at"]
    a = visible(t1).withColumn("in_a", F.lit(True))
    b = visible(t2).withColumn("in_b", F.lit(True))
    return (
        a.join(b, key, "full_outer")
        .where(F.col("in_a").isNull() | F.col("in_b").isNull())
        .select(
            *key,
            F.when(F.col("in_a").isNull(), F.lit("added"))
            .otherwise(F.lit("removed"))
            .alias("status"),
        )
    )


def entity_timeline(edges: DataFrame) -> DataFrame:
    """(group_id, name, seq, role, predicate, other, fact, valid_at,
    invalid_at) — the per-entity chronological fact ledger: every
    temporal assertion appears on BOTH endpoints' timelines (role =
    'subject'|'object', ``other`` = the far endpoint), ordered by
    (valid_at, fact identity) with a dense per-entity ``seq``. This is
    the "everything we learned about X, in order" view a KG consumer
    reads after point-in-time retrieval narrows WHEN — the reference
    serves it per-entity via get_entity_edges (graphiti_core
    EntityEdge queries); here it is one set-returning frame.

    Scale shape: one union of two projections of the ledger (no
    explode), then a single rank window partitioned by (group, name) —
    per-entity fact counts are bounded by the entity's real-world
    activity, and a hot entity's window is one partition's sort, not
    a corpus sort.
    """
    def side(role: str, me: str, other: str) -> DataFrame:
        return edges.select(
            "group_id",
            F.col(me).alias("name"),
            F.lit(role).alias("role"),
            "predicate",
            F.col(other).alias("other"),
            "fact",
            "valid_at",
            "invalid_at",
        )

    both = side("subject", "subj_name", "obj_name").unionByName(
        side("object", "obj_name", "subj_name")
    )
    # total order: (valid_at, predicate, other, role) alone can tie if
    # the same pair re-asserts at one instant with differing fact text
    # or invalid_at — fact + invalid_at close the key so seq is
    # deterministic cross-engine
    w = Window.partitionBy("group_id", "name").orderBy(
        F.col("valid_at").asc_nulls_last(),
        "predicate",
        "other",
        "role",
        "fact",
        F.col("invalid_at").asc_nulls_last(),
    )
    return both.withColumn("seq", F.row_number().over(w).cast("long")).select(
        "group_id", "name", "seq", "role", "predicate", "other", "fact",
        "valid_at", "invalid_at",
    )
