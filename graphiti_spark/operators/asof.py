"""Temporal (as-of) joins over the bi-temporal edge table.

Spark has no built-in as-of/range join; this composes one from an
equi-join on the endpoint-pair key plus interval predicates — the
pattern the task calls out for operators the engine lacks natively.

Two variants:
- ``interval_join``: probe (pair, t) → ALL facts whose validity
  interval contains t (valid_at ≤ t < invalid_at).
- ``as_of_join``: probe (pair, t) → the LATEST fact at or before t per
  (probe, predicate-class) — classic as-of semantics, implemented as
  the equi-join + a window row_number over valid_at desc.

Scale notes: the join key is (group_id, pair) — high cardinality; the
probe side is usually small → broadcast. For huge probe sets, both
sides bucket by the pair key and the join is shuffle-free. The
interval predicates are pure columns (pushed into the join filter, no
post-filter pass at the scan level is needed because edges are already
pair-partitioned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .temporal import pair_key


def _with_pair(df: DataFrame, a: str, b: str) -> DataFrame:
    return df.withColumn("_pair", pair_key(F.col(a), F.col(b)))


def interval_join(
    edges: DataFrame,
    probes: DataFrame,
    broadcast_probes: bool = True,
) -> DataFrame:
    """probes: (group_id, name_a, name_b, t timestamp). Returns one row
    per (probe, fact valid at t) with the probe's columns prefixed."""
    e = _with_pair(edges, "subj_name", "obj_name")
    p = _with_pair(probes, "name_a", "name_b").select(
        F.col("group_id").alias("_pg"), "_pair", F.col("t")
    )
    if broadcast_probes:
        p = F.broadcast(p)
    cond = (
        (e["group_id"] == p["_pg"])
        & (e["_pair"] == p["_pair"])
        & (e["valid_at"] <= p["t"])
        & (e["invalid_at"].isNull() | (e["invalid_at"] > p["t"]))
    )
    return e.join(p, cond).select(
        "group_id", "t", "subj_name", "predicate", "obj_name",
        "valid_at", "invalid_at", "fact",
    )


def as_of_join(
    edges: DataFrame,
    probes: DataFrame,
    broadcast_probes: bool = True,
) -> DataFrame:
    """Latest fact at or before t per (probe, predicate): the classic
    as-of join. A fact already invalidated BY time t still loses to
    nothing newer — as-of answers 'what was the last assertion', the
    interval variant answers 'what was true'."""
    e = _with_pair(edges, "subj_name", "obj_name")
    p = _with_pair(probes, "name_a", "name_b").select(
        F.col("group_id").alias("_pg"), F.col("_pair").alias("_ppair"), F.col("t")
    )
    if broadcast_probes:
        p = F.broadcast(p)
    cond = (
        (e["group_id"] == p["_pg"])
        & (e["_pair"] == p["_ppair"])
        & (e["valid_at"] <= p["t"])
    )
    joined = e.join(p, cond)
    w = Window.partitionBy("group_id", "_ppair", "t", "predicate").orderBy(
        F.desc("valid_at")
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "group_id", "t", "subj_name", "predicate", "obj_name",
            "valid_at", "invalid_at", "fact",
        )
    )
