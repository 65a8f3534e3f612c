"""Explicit skew handling (north rule: 'explicit salting for
hot-entity skew').

AQE's skew-join splitting covers joins; what it cannot fix is a
``collect_set``/``collect_list`` aggregation where one key owns a huge
share of rows (a hot entity mentioned in ~20% of all documents → at
10^12 docs one edge's provenance set is billions of doc_ids landing on
ONE reducer). The cure is two-phase aggregation over an explicit salt:

  phase 1: groupBy(key, salt = pmod(xxhash64(doc_id), S))   S-way split
  phase 2: groupBy(key) merge of the S partial results

Counts stay EXACT (salts partition the rows disjointly, so per-salt
distinct counts sum); the materialized set is capped at ``cap`` items
(provenance beyond the cap is countable but not enumerable — the only
sane contract at web scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_SALTS = 8
PROVENANCE_CAP = 100_000


def salted_collect_set(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    agg_aliases: dict[str, Column] | None = None,
    n_salts: int = N_SALTS,
    cap: int = PROVENANCE_CAP,
) -> DataFrame:
    """Two-phase distinct-collect of ``value_col`` per key.

    Returns one row per key with:
      - ``{value_col}s``: sorted array of distinct values (≤ cap)
      - ``n_{value_col}s``: EXACT distinct count (long)
    ``agg_aliases``: extra first-value aggregates carried through
    phase 1 (must be functionally dependent on the key).
    """
    extra = agg_aliases or {}
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts))
    )
    phase1 = salted.groupBy(*key_cols, "_salt").agg(
        F.collect_set(value_col).alias("_vals"),
        *[F.first(c).alias(a) for a, c in extra.items()],
    )
    phase2 = phase1.groupBy(*key_cols).agg(
        F.slice(
            F.sort_array(F.array_distinct(F.flatten(F.collect_list("_vals")))),
            1,
            cap,
        ).alias(f"{value_col}s"),
        F.sum(F.size("_vals")).alias(f"n_{value_col}s"),
        *[F.first(a).alias(a) for a in extra],
    )
    return phase2


def hot_keys(df: DataFrame, key_cols: list[str], min_count: int) -> DataFrame:
    """Detection sketch: keys whose row count exceeds ``min_count``
    (run on a sample at scale; used to decide salting/broadcast
    strategies and reported to the metrics table)."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .where(F.col("n_rows") >= min_count)
    )
