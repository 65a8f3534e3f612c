"""Pluggable summarization (X4 node summaries + C3/A7 community
summaries).

The reference generates summaries with an LLM: ≤250-word entity
summaries (graphiti_core/utils/maintenance/node_operations.py:341-425)
and pairwise tree-reduced community summaries (summarize_pair prompt,
graphiti_core/prompts/summarize_nodes.py:48-65, reduction loop
community_operations.py:156-176). This engine keeps deterministic
defaults (oracle-checkable), and exposes the LLM slot as a
client-backed plug point with the scale-correct execution shape:

- ``UdfSummarizer``: any ``client(contexts: list[str]) -> list[str]``
  wrapped in an Arrow-batched pandas UDF — summaries are produced
  executor-side over column batches, never a driver loop over
  ``collect()`` rows. A remote LLM client plugs in unchanged (batch
  its HTTP calls inside the callable). The client must be
  deterministic per context string or resumed runs stop being
  byte-identical.
- ``tree_reduce_summaries``: the reference's pairwise reduction, run
  as ONE ``applyInPandas`` over communities — each community's
  members are reduced within its group partition (pairs combined,
  odd one carried), so ten million communities reduce in parallel
  with no driver involvement. The combine callable sees
  ``(left, right) -> str`` exactly like the reference's
  ``summarize_pair``.
"""

from __future__ import annotations

from typing import Callable, Protocol

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Summarizer(Protocol):
    """Turns a context column into a summary column."""

    def summarize(self, context: Column) -> Column: ...


class DeterministicSummarizer:
    """Default: the context IS the summary (callers build the roster /
    stat sentence as the context expression)."""

    def summarize(self, context: Column) -> Column:
        return context


class UdfSummarizer:
    """Client-backed summarizer as an Arrow-batched pandas UDF."""

    def __init__(self, client: Callable[[list[str]], list[str]]):
        self.client = client

    def summarize(self, context: Column) -> Column:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        client = self.client

        def _summ(texts):
            return pd.Series(
                client(texts.tolist()), index=texts.index, dtype="object"
            )

        # explicit annotations (not the module's stringified ones):
        # pandas_udf resolves hints from function globals, where the
        # locally-imported pd would not resolve
        _summ.__annotations__ = {"texts": pd.Series, "return": pd.Series}
        return pandas_udf(_summ, "string")(context)


def tree_reduce_summaries(
    members: DataFrame,
    combine: Callable[[str, str], str] | None = None,
    key_cols: tuple[str, str] = ("group_id", "community"),
    text_col: str = "name",
) -> DataFrame:
    """Distributed A7: per (group_id, community), pairwise tree-reduce
    the sorted member texts to one summary — the reference's reduction
    shape (community_operations.py:156-176) inside one grouped pandas
    pass. Returns (group_id, community, summary)."""
    combine = combine or (lambda a, b: " ".join(sorted({a, b})))
    g, c = key_cols

    def _reduce(pdf):
        import pandas as pd

        layer = sorted(pdf[text_col].astype(str).tolist())
        while len(layer) > 1:
            nxt = [
                combine(layer[i], layer[i + 1])
                for i in range(0, len(layer) - 1, 2)
            ]
            if len(layer) % 2:
                nxt.append(layer[-1])
            layer = nxt
        return pd.DataFrame(
            {
                g: [pdf[g].iloc[0]],
                c: [pdf[c].iloc[0]],
                "summary": [layer[0] if layer else ""],
            }
        )

    return members.groupBy(g, c).applyInPandas(
        _reduce, schema=f"{g} string, {c} string, summary string"
    )
