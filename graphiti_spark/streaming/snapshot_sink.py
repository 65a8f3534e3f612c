"""Exactly-once streaming append sink on SnapshotStore.

Structured Streaming's foreachBatch is at-least-once: after a crash
between the sink's write and the checkpoint commit, the SAME batch is
re-delivered. The graph tables absorb that with keyed merges
(streaming/ingest.py's effectively-once story), but a pure APPEND
table — event logs, span archives, metric streams — would double its
rows on replay. This sink closes that gap transactionally: each
micro-batch commits through ``SnapshotStore.commit_append(batch_id=)``,
which records the batch id in the published manifest and no-ops when
a surviving manifest already carries it. Write and replay-guard land
in the same atomic ``os.replace`` — there is no window where the data
is visible but the guard isn't (the Delta/Iceberg ``txnAppId``
idempotent-writer pattern).

Scale: the sink adds one manifest per micro-batch (O(files-in-batch)
renames, no rewrite of prior data); run ``store.compact`` +
``expire_snapshots`` on a maintenance cadence to fold the small files
the trigger interval produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..io.snapshots import SnapshotStore

__all__ = ["snapshot_append_sink"]


def snapshot_append_sink(
    stream_df: DataFrame,
    store: SnapshotStore,
    table: str,
    checkpoint_dir: str,
    partition_by: list[str] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Start a foreachBatch query appending every micro-batch to
    ``table`` exactly once (idempotent under re-delivery)."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        store.commit_append(
            table, batch_df, partition_by=partition_by, batch_id=batch_id
        )

    writer = (
        stream_df.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
