"""Streaming corpus dedup — DedupIndex behind foreachBatch.

The crawl-firehose shape: documents land in a directory (stand-in for
Kafka/Iceberg CDC), each micro-batch dedups against the FULL historical
corpus via the persisted band index (O(batch) probe —
operators/dedup_index.py) and appends its decisions to a ``decisions``
table; only keepers enter the index, so downstream consumers read an
already-deduplicated stream.

Exactly-once story, same as streaming/ingest.py: the stream checkpoint
gives at-least-once foreachBatch delivery; ``DedupIndex.merge`` is
idempotent on re-submitted doc_ids (same-id docs collide with their own
stored copy and are not re-indexed; pinned by
tests/test_dedup_index.py::test_merge_is_idempotent_on_resubmission),
and the decisions table is merged on doc_id with hash-of-doc_id
partition scoping — a replayed batch rewrites only the buckets its own
docs live in, with byte-identical content (merge decisions are
deterministic) — together: effectively-once. Keying the merge on
doc_id (not batch_id) also means a doc re-emitted in a LATER batch
(crawlers do) updates its one decision row instead of accumulating a
second: consumers can join/count decisions by doc_id without
deduplicating first.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..io.tables import TableIO
from ..operators.dedup_index import DedupIndex

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)


def stream_dedup(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """File-source stream of document parquet → per-micro-batch
    incremental dedup. Decisions accumulate in the index root's
    ``decisions`` table as (doc_id, dup_of, is_kept, batch_id), merged
    on doc_id and partitioned by a hash bucket of doc_id so the merge
    only rewrites the buckets the batch touches (O(batch), and one row
    per doc_id even when a doc is re-emitted in a later batch)."""
    io = TableIO(spark, index_dir)
    idx = DedupIndex(io, threshold=threshold)
    n_buckets = 64

    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        decisions = (
            idx.merge(batch_df)
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .withColumn("bpart", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)))
        )
        io.merge_upsert(
            "decisions", decisions, key_cols=["doc_id"],
            partition_col="bpart",
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
