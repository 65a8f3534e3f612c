"""Table schemas (SURVEY.md §1.3) + deterministic id helpers.

Reference data model: Pydantic models persisted as property-graph nodes
(graphiti_core/nodes.py:89-94,141-151,291-296) and relationships
(graphiti_core/edges.py:57-62,197-216). Here: one columnar table per
abstraction, partitioned by ``group_id`` and hash-bucketed by
``doc_id``/``uuid`` (the north rule's layout).

Ids are sha2-derived from content, NOT uuid4 (reference nodes.py:90 uses
uuid4) — deterministic ids make replay/resume idempotent (SURVEY §7
"Hard parts").
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),       # 'text' | 'media'
        T.StructField("text", T.StringType(), False),       # '' for media
        T.StructField("media_ref", T.StringType(), False),  # '' for text
        T.StructField("offset", T.IntegerType(), False),    # dense 0-based
    ]
)

# BASELINE.json input_hint shape + EpisodicNode context columns
# (reference graphiti_core/nodes.py:141-151).
EPISODES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("group_id", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("source", T.StringType(), False),  # message|text|json
        T.StructField("source_description", T.StringType(), True),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT), False),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("valid_at", T.TimestampType(), False),
    ]
)

# EntityNode (reference nodes.py:291-296).
NODES_SCHEMA = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("group_id", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("labels", T.ArrayType(T.StringType()), False),
        T.StructField("summary", T.StringType(), True),
        T.StructField("attributes", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("name_embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("created_at", T.TimestampType(), False),
    ]
)

# EntityEdge — the (subj, pred, obj) fact triple with bi-temporal fields
# (reference edges.py:197-216; valid_at/invalid_at/expired_at 205-213).
EDGES_SCHEMA = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("group_id", T.StringType(), False),
        T.StructField("source_node_uuid", T.StringType(), False),
        T.StructField("target_node_uuid", T.StringType(), False),
        T.StructField("name", T.StringType(), False),  # predicate
        T.StructField("fact", T.StringType(), False),
        T.StructField("fact_embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("episodes", T.ArrayType(T.StringType()), False),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("valid_at", T.TimestampType(), True),
        T.StructField("invalid_at", T.TimestampType(), True),
        T.StructField("expired_at", T.TimestampType(), True),
        T.StructField("attributes", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# EpisodicEdge / MENTIONS (reference edges.py:93-107).
MENTIONS_SCHEMA = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("group_id", T.StringType(), False),
        T.StructField("episode_uuid", T.StringType(), False),
        T.StructField("entity_uuid", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), False),
    ]
)

COMMUNITIES_SCHEMA = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("group_id", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("summary", T.StringType(), True),
        T.StructField("name_embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("created_at", T.TimestampType(), False),
    ]
)

COMMUNITY_MEMBERS_SCHEMA = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("group_id", T.StringType(), False),
        T.StructField("community_uuid", T.StringType(), False),
        T.StructField("entity_uuid", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), False),
    ]
)


def entity_uuid(group_id: Column, name: Column) -> Column:
    """Deterministic entity id: sha2('entity|' group '|' lower(name)).

    Same formula is emitted as DuckDB SQL by ``oracle.py`` — keep in sync.
    """
    return F.sha2(F.concat_ws("|", F.lit("entity"), group_id, F.lower(name)), 256)


def edge_uuid(
    group_id: Column, src: Column, name: Column, dst: Column, valid_at: Column
) -> Column:
    """Deterministic fact-edge id over the canonical triple + valid_at."""
    return F.sha2(
        F.concat_ws(
            "|", F.lit("edge"), group_id, src, name, dst,
            F.date_format(valid_at, "yyyy-MM-dd HH:mm:ss"),
        ),
        256,
    )
