"""4-lane search() recipes over the pipeline graph (H2 semantics:
overscan → rerank → limit; lane independence; center-node variant)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from graphiti_spark.pipeline import run_on_sf
from graphiti_spark.search_api import (
    COMBINED_HYBRID_SEARCH_RRF,
    EDGE_HYBRID_SEARCH_MMR,
    NODE_HYBRID_SEARCH_NODE_DISTANCE,
    NODE_HYBRID_SEARCH_RRF,
    SearchConfig,
    LaneConfig,
    episode_content,
    search,
    search_many,
    with_fact_embeddings,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def graph(spark):
    out = run_on_sf(spark, SF_SMOKE)
    return {
        "nodes": out.nodes.cache(),
        "edges": with_fact_embeddings(out.edges).cache(),
        "mentions": out.mentions.cache(),
        "episodes_text": episode_content(out.episodes).cache(),
    }


def test_node_hybrid_rrf(spark, graph):
    res = search(
        "Acme Corp", NODE_HYBRID_SEARCH_RRF(), nodes=graph["nodes"],
        group_ids=["g0"],
    )
    rows = res.nodes.collect()
    assert 0 < len(rows) <= 10
    names = {
        r.name
        for r in graph["nodes"].join(
            res.nodes.select(F.col("id").alias("uuid")), "uuid"
        ).collect()
    }
    assert "Acme Corp" in names
    assert res.edges is None and res.episodes is None


def test_combined_search_all_lanes(spark, graph):
    res = search(
        "Globex works for Acme Corp",
        COMBINED_HYBRID_SEARCH_RRF(),
        nodes=graph["nodes"],
        edges=graph["edges"],
        episodes_text=graph["episodes_text"],
        mentions=graph["mentions"],
    )
    assert res.nodes.count() > 0
    assert res.edges.count() > 0
    assert res.episodes.count() > 0


def test_node_distance_recipe(spark, graph):
    center = hashlib.sha256(b"entity|g0|globex").hexdigest()
    res = search(
        "Acme", NODE_HYBRID_SEARCH_NODE_DISTANCE(), nodes=graph["nodes"],
        edges=graph["edges"], group_ids=["g0"], center_uuid=center,
    )
    rows = res.nodes.collect()
    assert rows, "no results"
    # scores must be from the distance lattice {inf, 1, 0}
    assert all(r.score in (float("inf"), 1.0, 0.0) for r in rows)


def test_edge_mmr_recipe(spark, graph):
    res = search(
        "Globex likes Acme Corp", EDGE_HYBRID_SEARCH_MMR(), edges=graph["edges"]
    )
    rows = res.edges.collect()
    assert 0 < len(rows) <= 10
    assert len({r.id for r in rows}) == len(rows)


def test_bfs_method_lane(spark, graph):
    center = hashlib.sha256(b"entity|g0|globex").hexdigest()
    cfg = SearchConfig(nodes=LaneConfig(methods=["bm25", "cosine", "bfs"]))
    res = search(
        "Acme", cfg, nodes=graph["nodes"], edges=graph["edges"],
        group_ids=["g0"], bfs_origins=[center],
    )
    assert res.nodes.count() > 0


def test_search_many_batched(spark, graph):
    g0 = graph["nodes"].where("group_id = 'g0'")
    queries = g0.orderBy("uuid").limit(3).select(
        F.col("uuid").alias("query_id"), F.col("name_embedding").alias("query_vec")
    )
    out = search_many(queries, g0, limit=5)
    per_q = {r.query_id: [] for r in out.collect()}
    for r in out.collect():
        per_q[r.query_id].append((r.rank, r.id))
    assert len(per_q) == 3
    for qid, hits in per_q.items():
        hits.sort()
        assert hits[0][1] == qid  # self is the nearest neighbor
        assert len(hits) == 5
