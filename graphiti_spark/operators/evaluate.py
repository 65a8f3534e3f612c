"""Extraction-quality evaluation — the north rule's accuracy half as a
first-class, oracle-checkable operator.

The reference pins extraction quality with fixture tests
(graphiti_core's tests/test_edge_int.py and the dedup/resolve suites:
extracted EntityNode/EntityEdge sets compared against expected sets).
This module is the engine-side generalization of that gate: exact
set-precision/recall/F1 between any keyed "extracted" and "expected"
triple sets, reported in integer micro-units so the metric itself is
cross-engine hash-checkable (no float division anywhere — Spark ``DIV``
and DuckDB ``//`` floor identically).

Scale shape (100 TB): both inputs collapse through a DISTINCT
(map-side partial aggregation) before the single hash join on the key
columns; the output is |by| rows. No cross joins, no windows, no
driver-side iteration — the metric costs two shuffles regardless of
corpus size, and the join key includes ``doc_id`` so skew follows the
document distribution, not any hot entity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphiti_spark import corpus as C

__all__ = ["expected_triples", "triple_prf"]


def expected_triples(eps: DataFrame) -> DataFrame:
    """Ground-truth (group_id, doc_id, offset, speaker, subj_name,
    predicate, obj_name, year) rows re-derived from the synthesis
    arithmetic (corpus.fact_params / FIXTURES.md §1) as pure column
    expressions over the episodes table's ``doc_id`` alone — never
    reading span text, so it is an independent check of the extraction
    path end to end (including the bench's replica-amplification
    arithmetic: ``doc-<d>-r<rep>`` maps to d + rep*500009, rep absent
    → 0).

    This is the engine twin of the reference's extraction fixtures:
    the expected set the extractor's output is graded against.
    """
    d0 = F.regexp_extract("doc_id", r"^doc-(\d+)", 1).cast("long")
    rep_s = F.regexp_extract("doc_id", r"-r(\d+)$", 1)
    rep = F.when(rep_s == "", F.lit(0)).otherwise(rep_s.cast("long"))
    d = (d0 + rep * F.lit(500009)).alias("d")

    ents = F.array(*[F.lit(e) for e in C.ENTITIES])
    preds = F.array(*[F.lit(p[0]) for p in C.PREDICATES])
    speakers = F.array(*[F.lit(s) for s in C.SPEAKERS])

    rows = eps.select("doc_id", d).select(
        "doc_id",
        "d",
        F.explode(F.sequence(F.lit(0), (F.col("d") % 3).cast("int"))).alias("j"),
        F.element_at(
            F.array(*[F.lit(k) for k in C.MEDIA_K]),
            ((F.col("d") / 3).cast("long") % len(C.MEDIA_K)).cast("int") + 1,
        ).alias("k"),
    )
    dd, j = F.col("d"), F.col("j")
    subj = F.when((dd + j) % C.HOT_EVERY == 0, F.lit(0)).otherwise(
        (dd * 7 + j * 13) % C.N_ENTITIES
    )
    obj0 = (dd * 11 + j * 17 + 1) % C.N_ENTITIES
    obj = F.when(obj0 == subj, (obj0 + 1) % C.N_ENTITIES).otherwise(obj0)
    return rows.select(
        F.concat(F.lit("g"), (dd % C.N_GROUPS).cast("string")).alias("group_id"),
        "doc_id",
        # text span j (0-based) sits after floor(j/k) interleaved media
        (j + F.floor(j / F.col("k"))).cast("int").alias("offset"),
        F.element_at(speakers, ((dd + j) % len(C.SPEAKERS)).cast("int") + 1).alias(
            "speaker"
        ),
        F.element_at(ents, subj.cast("int") + 1).alias("subj_name"),
        F.element_at(preds, ((dd * 3 + j * 5) % len(C.PREDICATES)).cast("int") + 1).alias(
            "predicate"
        ),
        F.element_at(ents, obj.cast("int") + 1).alias("obj_name"),
        (F.lit(C.BASE_YEAR) + (F.floor(dd / 16) + 3 * j) % 10).cast("int").alias(
            "year"
        ),
    )


def triple_prf(
    extracted: DataFrame,
    expected: DataFrame,
    keys: list[str],
    by: list[str] | tuple[str, ...] = ("group_id",),
) -> DataFrame:
    """Set precision/recall/F1 between two keyed triple frames, per
    ``by`` group, in exact integer micro-units.

    Both sides are reduced to DISTINCT (by + keys) rows (set
    semantics — the reference's fixture comparisons are set-based
    too), then:

    - ``n_extracted`` / ``n_expected``: per-group distinct counts,
    - ``n_tp``: distinct rows present in BOTH (inner join),
    - ``precision_micro`` = 1e6·tp DIV n_extracted (0 when empty),
    - ``recall_micro``    = 1e6·tp DIV n_expected  (0 when empty),
    - ``f1_micro``        = 2e6·tp DIV (n_extracted + n_expected)
      (the harmonic mean 2PR/(P+R) simplified to counts — one floor
      division total, so no compounding of rounding).

    A group present on only one side still yields a row (full outer
    join of the per-group counts) with zeros on the missing side —
    a disappearing group must move the metric, not vanish from it.
    """
    by = list(by)
    keys = list(keys)
    cols = by + keys
    e = extracted.select(*cols).distinct()
    g = expected.select(*cols).distinct()
    ne = e.groupBy(*by).agg(F.count(F.lit(1)).cast("long").alias("n_extracted"))
    ng = g.groupBy(*by).agg(F.count(F.lit(1)).cast("long").alias("n_expected"))
    tp = (
        e.join(g, cols, "inner")
        .groupBy(*by)
        .agg(F.count(F.lit(1)).cast("long").alias("n_tp"))
    )
    counts = (
        ne.join(ng, by, "full")
        .join(tp, by, "left")
        .select(
            *by,
            F.coalesce("n_extracted", F.lit(0)).cast("long").alias("n_extracted"),
            F.coalesce("n_expected", F.lit(0)).cast("long").alias("n_expected"),
            F.coalesce("n_tp", F.lit(0)).cast("long").alias("n_tp"),
        )
    )
    return counts.select(
        *by,
        "n_extracted",
        "n_expected",
        "n_tp",
        F.when(F.col("n_extracted") > 0, F.expr("1000000 * n_tp DIV n_extracted"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("precision_micro"),
        F.when(F.col("n_expected") > 0, F.expr("1000000 * n_tp DIV n_expected"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("recall_micro"),
        F.when(
            (F.col("n_extracted") + F.col("n_expected")) > 0,
            F.expr("2000000 * n_tp DIV (n_extracted + n_expected)"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("f1_micro"),
    )
