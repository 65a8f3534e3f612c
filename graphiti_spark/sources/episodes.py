"""Episode table source: schema-validated reads + input invariants.

The BASELINE input contract is an Iceberg-shaped table
``(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``
plus the EpisodicNode context columns (schemas.EPISODES_SCHEMA). This
reader enforces the contract at the boundary — the difference between
'the pipeline crashed three stages in' and 'the input was rejected with
a reason' matters at 10^12 docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import EPISODES_SCHEMA

REQUIRED_COLUMNS = {f.name for f in EPISODES_SCHEMA.fields}
SPAN_FIELDS = ["kind", "text", "media_ref", "offset"]


class InvalidEpisodesInput(ValueError):
    pass


def read_episodes(spark: SparkSession, path: str, validate: bool = True) -> DataFrame:
    df = spark.read.parquet(path)
    if validate:
        return validated(df)
    return df


def validated(df: DataFrame) -> DataFrame:
    missing = REQUIRED_COLUMNS - set(df.columns)
    if missing:
        raise InvalidEpisodesInput(f"episodes table missing columns: {sorted(missing)}")
    span_type = dict(zip(df.schema.names, df.schema.fields))["spans"].dataType
    try:
        span_fields = [f.name for f in span_type.elementType.fields]
    except AttributeError as exc:
        raise InvalidEpisodesInput(
            f"spans must be array<struct<...>>, got {span_type.simpleString()}"
        ) from exc
    if span_fields != SPAN_FIELDS:
        raise InvalidEpisodesInput(
            f"span struct fields must be {SPAN_FIELDS}, got {span_fields}"
        )
    return df


def span_violations(df: DataFrame) -> DataFrame:
    """Rows violating the per-row span-sequence invariant: offsets must
    be dense 0-based in array order; text spans carry text and no
    media_ref; media spans the reverse. Empty result == valid input.
    Pure column expressions — run it as a cheap pre-flight on any
    partition before processing."""
    offsets_ok = F.forall(
        F.transform(
            F.col("spans"), lambda s, i: s["offset"] == i
        ),
        lambda x: x,
    )
    kinds_ok = F.forall(
        F.col("spans"),
        lambda s: (
            ((s["kind"] == "text") & (s["media_ref"] == "") & (s["text"] != ""))
            | ((s["kind"] == "media") & (s["media_ref"] != "") & (s["text"] == ""))
        ),
    )
    return df.where(~offsets_ok | ~kinds_ok).select(
        "doc_id",
        offsets_ok.alias("offsets_ok"),
        kinds_ok.alias("kinds_ok"),
    )
