"""Deterministic interleaved-span episode synthesizer.

Builds the BASELINE.json ``input_hint`` table::

    doc_id string,
    spans  array<struct<kind string, text string, media_ref string, offset int>>

from ``documents.parquet``'s doc_id column (FIXTURES.md §1 recipe), as
PURE column expressions — no UDF, no shuffle, fully pushdown-friendly:
the scan reads only ``doc_id`` (column pruning) and every row is
independent (embarrassingly parallel at 10^12 docs).

Each doc carries 1–3 templated "Speaker: Subj phrase Obj since YYYY."
text spans with a media span interleaved after every k-th text span
(k = MEDIA_K[doc_id % 3]); offsets are dense 0-based over the final
sequence; ``media_ref = 'img://' || md5(doc_id ':' offset)[:12]``.

The per-row span-sequence invariant (kind, text, media_ref, order) is
checked by tests against ``corpus.fact_params`` (pure-Python mirror) and
by the driver against ``oracle.py``'s independent SQL derivation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import corpus

def _arr(values) -> Column:
    return F.array(*[F.lit(v) for v in values])


def _sentence(d: Column, j: Column) -> Column:
    """Column mirror of ``corpus.sentence`` — keep in sync with
    ``corpus.fact_params`` and ``oracle._FACTS_SQL``."""
    _ENTITIES = _arr(corpus.ENTITIES)
    _PHRASES = _arr([p[1] for p in corpus.PREDICATES])
    _SPEAKERS = _arr(corpus.SPEAKERS)
    subj = F.when((d + j) % corpus.HOT_EVERY == 0, F.lit(0)).otherwise(
        (d * 7 + j * 13) % corpus.N_ENTITIES
    )
    obj0 = (d * 11 + j * 17 + 1) % corpus.N_ENTITIES
    obj = F.when(obj0 == subj, (obj0 + 1) % corpus.N_ENTITIES).otherwise(obj0)
    pred = (d * 3 + j * 5) % corpus.N_PREDICATES
    year = F.lit(corpus.BASE_YEAR) + (F.floor(d / 16) + 3 * j) % 10
    speaker = (d + j) % len(corpus.SPEAKERS)
    return F.concat(
        F.element_at(_SPEAKERS, speaker.cast("int") + 1),
        F.lit(": "),
        F.element_at(_ENTITIES, subj.cast("int") + 1),
        F.lit(" "),
        F.element_at(_PHRASES, pred.cast("int") + 1),
        F.lit(" "),
        F.element_at(_ENTITIES, obj.cast("int") + 1),
        F.lit(" since "),
        year.cast("string"),
        F.lit("."),
    )


def synthesize_episodes(
    spark: SparkSession, sf_dir: str, replicas: int = 1
) -> DataFrame:
    """documents.parquet → episodes table (EPISODES_SCHEMA shape).

    ``replicas`` > 1 amplifies the corpus deterministically for
    benchmarking (each replica r re-derives facts from d + r*500009, a
    prime stride, so content varies per replica; doc_ids get an ``-r<i>``
    suffix). Tests and the correctness oracle always use replicas=1.
    """
    d = F.col("d")
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").cast("long").alias("d0"))
    )
    if replicas > 1:
        docs = docs.crossJoin(
            spark.range(replicas).select(F.col("id").cast("int").alias("rep"))
        )
    else:
        docs = docs.withColumn("rep", F.lit(0))
    docs = docs.select((F.col("d0") + F.col("rep") * F.lit(500009)).alias("d"), "rep", "d0")

    n_facts = F.lit(1) + d % 3
    k = F.element_at(
        _arr(corpus.MEDIA_K), ((d / 3).cast("long") % len(corpus.MEDIA_K)).cast("int") + 1
    )

    # 1-based text-span index i → [text_span] or [text_span, media_span].
    base_spans = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n_facts),
            lambda i: F.when(
                i % k == 0,
                F.array(
                    F.struct(
                        F.lit("text").alias("kind"),
                        _sentence(d, i - 1).alias("text"),
                    ),
                    F.struct(F.lit("media").alias("kind"), F.lit("").alias("text")),
                ),
            ).otherwise(
                F.array(
                    F.struct(
                        F.lit("text").alias("kind"),
                        _sentence(d, i - 1).alias("text"),
                    )
                )
            ),
        )
    )

    trailer = F.when(
        d % corpus.MEDIA_TRAILER_EVERY == 0,
        F.array(F.struct(F.lit("media").alias("kind"), F.lit("").alias("text"))),
    ).otherwise(F.array().cast("array<struct<kind:string,text:string>>"))
    base_spans = F.concat(base_spans, trailer)

    doc_id_str = F.concat(
        F.lit("doc-"),
        F.lpad(F.col("d0").cast("string"), 6, "0"),
        F.when(F.col("rep") > 0, F.concat(F.lit("-r"), F.col("rep").cast("string"))).otherwise(
            F.lit("")
        ),
    )

    # Assign dense offsets positionally; media_ref derives from the FINAL
    # offset so the invariant is checkable from (doc_id, offset) alone.
    spans = F.transform(
        base_spans,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            F.when(
                s["kind"] == "media",
                F.concat(
                    F.lit("img://"),
                    F.substring(
                        F.md5(F.concat(doc_id_str, F.lit(":"), i.cast("string"))), 1, 12
                    ),
                ),
            )
            .otherwise(F.lit(""))
            .alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )

    return docs.select(
        doc_id_str.alias("doc_id"),
        F.concat(F.lit("g"), (d % corpus.N_GROUPS).cast("string")).alias("group_id"),
        F.concat(F.lit("episode "), doc_id_str).alias("name"),
        F.lit("message").alias("source"),
        F.lit("synthetic interleaved corpus").alias("source_description"),
        spans.alias("spans"),
        F.lit(corpus.BATCH_TIME).cast("timestamp").alias("created_at"),
        (
            F.lit(corpus.EPISODE_EPOCH).cast("timestamp")
            # d mod 1e6 keeps valid_at within pandas' ns-timestamp range
            # (~year 2262) even at high replica counts; identity for all
            # replicas=1 doc ids, so the oracle mirrors are unaffected.
            + F.make_dt_interval(F.lit(0), F.lit(0), (d % 1000000).cast("int"), F.lit(0))
        ).alias("valid_at"),
    )


def exploded_spans(episodes: DataFrame) -> DataFrame:
    """Flat (doc_id, group_id, kind, text, media_ref, offset) view —
    the span-sequence invariant surface and the extraction input."""
    return episodes.select(
        "doc_id", "group_id", "valid_at", F.explode("spans").alias("span")
    ).select(
        "doc_id",
        "group_id",
        "valid_at",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )
