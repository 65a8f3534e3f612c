"""Custom stateful streaming operator: the episode context window as
``applyInPandasWithState``.

The reference's episode context window (J10, ``retrieve_episodes``
called per add_episode, graphiti_core/graphiti.py:430-439) is its
watermark-free session state — each new episode sees the previous
≤ EPISODE_WINDOW_LEN episodes of its group. The batch engine computes
it as one window pass (operators/maintenance.py:82-94); this module is
the STREAMING form: per-``group_id`` state holds the trailing window of
(doc_id, valid_at) and each micro-batch's episodes are emitted with the
context the reference would have given them at arrival time.

Semantics / scale notes:
- state per group is a bounded list (≤ window_len entries) — O(groups)
  state total, no unbounded growth, no watermark needed (late episodes
  UPDATE downstream intervals via the monotone merges, they are never
  dropped here — context reflects ARRIVAL order, exactly like the
  reference's sequential queue consumer, graphiti.py:411-414).
- within a micro-batch, episodes are processed in (valid_at, doc_id)
  order so a batch containing several episodes of one group chains
  their contexts deterministically.
- shuffle key is group_id (the reference's own partition key).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EPISODE_WINDOW_LEN = 3  # graphiti_core/graph_data_operations.py:27

CONTEXT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("group_id", T.StringType(), False),
        T.StructField("valid_at", T.TimestampType(), True),
        T.StructField("previous_episode_ids", T.ArrayType(T.StringType()), False),
    ]
)

CONTEXT_STATE_SCHEMA = T.StructType(
    [T.StructField("window_ids", T.ArrayType(T.StringType()), True)]
)


def _context_fn(window_len: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (group_id,) = key
        prev: list[str] = list(state.get[0]) if state.exists else []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["valid_at", "doc_id"], kind="mergesort")
        out = []
        for r in rows.itertuples(index=False):
            out.append(
                {
                    "doc_id": r.doc_id,
                    "group_id": group_id,
                    "valid_at": r.valid_at,
                    "previous_episode_ids": list(prev[-window_len:]),
                }
            )
            prev.append(r.doc_id)
        state.update((prev[-window_len:],))
        yield pd.DataFrame(out)

    return update


def episodes_with_streaming_context(
    episodes_stream: DataFrame, window_len: int = EPISODE_WINDOW_LEN
) -> DataFrame:
    """Attach the arrival-time context window to a streaming episodes
    DataFrame: (doc_id, group_id, valid_at, previous_episode_ids)."""
    slim = episodes_stream.select("doc_id", "group_id", "valid_at")
    return slim.groupBy("group_id").applyInPandasWithState(
        _context_fn(window_len),
        outputStructType=CONTEXT_OUTPUT_SCHEMA,
        stateStructType=CONTEXT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_context_windows(
    spark,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window_len: int = EPISODE_WINDOW_LEN,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """File-source episodes stream → stateful context windows →
    parquet sink. The stream checkpoint carries the per-group state, so
    a restart resumes the window where it left off."""
    from ..schemas import EPISODES_SCHEMA

    reader = spark.readStream.schema(EPISODES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    out = episodes_with_streaming_context(stream, window_len=window_len)
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
