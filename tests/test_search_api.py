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


def test_edge_episode_mentions_reranker_is_provenance_size(spark, graph):
    """A3: the edge lane's episode_mentions reranker orders by
    size(episodes) desc (reference search/search.py:255-256)."""
    from graphiti_spark.search_api import EDGE_HYBRID_SEARCH_EPISODE_MENTIONS

    res = search(
        "Globex works for Acme Corp",
        EDGE_HYBRID_SEARCH_EPISODE_MENTIONS(),
        edges=graph["edges"],
    )
    got = res.edges.collect()
    assert got
    sizes = {
        r.uuid: r.n for r in graph["edges"].select(
            "uuid", F.size("episodes").alias("n")
        ).collect()
    }
    scores = [r.score for r in got]
    assert scores == sorted(scores, reverse=True)
    for r in got:
        assert r.score == float(sizes[r.id])
    # and the ordering is genuinely by provenance size (ties broken by id)
    assert [r.id for r in got] == [
        r.id for r in sorted(got, key=lambda r: (-r.score, r.id))
    ]


def test_recipe_parity_with_reference_names():
    """Exact 1:1 recipe parity (VERDICT r2 #8): the reference's 16
    canned recipes (search_config_recipes.py:34-224) each have a
    same-named constructor producing a runnable SearchConfig, and the
    ONLY non-reference name is the explicitly-listed episode extra —
    so RECIPES == reference ∪ EXTRA_RECIPES, nothing unaccounted."""
    from graphiti_spark import search_api
    from graphiti_spark.search_api import EXTRA_RECIPES, RECIPES

    reference_names = {
        "COMBINED_HYBRID_SEARCH_RRF",
        "COMBINED_HYBRID_SEARCH_MMR",
        "COMBINED_HYBRID_SEARCH_CROSS_ENCODER",
        "EDGE_HYBRID_SEARCH_RRF",
        "EDGE_HYBRID_SEARCH_MMR",
        "EDGE_HYBRID_SEARCH_NODE_DISTANCE",
        "EDGE_HYBRID_SEARCH_EPISODE_MENTIONS",
        "EDGE_HYBRID_SEARCH_CROSS_ENCODER",
        "NODE_HYBRID_SEARCH_RRF",
        "NODE_HYBRID_SEARCH_MMR",
        "NODE_HYBRID_SEARCH_NODE_DISTANCE",
        "NODE_HYBRID_SEARCH_EPISODE_MENTIONS",
        "NODE_HYBRID_SEARCH_CROSS_ENCODER",
        "COMMUNITY_HYBRID_SEARCH_RRF",
        "COMMUNITY_HYBRID_SEARCH_MMR",
        "COMMUNITY_HYBRID_SEARCH_CROSS_ENCODER",
    }
    assert len(reference_names) == 16
    assert EXTRA_RECIPES == {"EPISODE_HYBRID_SEARCH_RRF"}
    assert set(RECIPES) == reference_names | EXTRA_RECIPES
    for name in RECIPES:
        cfg = getattr(search_api, name)()
        assert isinstance(cfg, SearchConfig)
        assert any(
            getattr(cfg, lane) is not None
            for lane in ("edges", "nodes", "episodes", "communities")
        )


@pytest.fixture(scope="module")
def communities(spark, graph):
    from graphiti_spark import corpus
    from graphiti_spark.operators.community import (
        build_communities,
        detect_communities,
    )

    membership = detect_communities(graph["edges"], graph["nodes"])
    comms, _members = build_communities(
        membership, graph["nodes"], corpus.BATCH_TIME
    )
    return comms.cache()


def test_community_similarity_lane(spark, communities):
    """V3: the community cosine lane runs directly on build_communities
    output (name_embedding emitted at build time)."""
    from graphiti_spark.search_api import COMMUNITY_HYBRID_SEARCH_RRF

    assert "name_embedding" in communities.columns
    target = communities.limit(1).collect()[0]
    res = search(
        target.name,
        SearchConfig(communities=LaneConfig(methods=["cosine"])),
        communities=communities,
    )
    rows = res.communities.collect()
    assert rows and rows[0].id == target.uuid  # exact-name cosine hit on top

    # and the full hybrid recipe (bm25 ∪ cosine) runs too
    res2 = search(
        target.name, COMMUNITY_HYBRID_SEARCH_RRF(), communities=communities
    )
    assert res2.communities.collect()


def test_update_community_reembeds(spark, graph, communities):
    from graphiti_spark.operators.community import detect_communities
    from graphiti_spark.operators.graph_api import update_community

    membership = detect_communities(graph["edges"], graph["nodes"])
    ent = membership.limit(1).collect()[0]
    updated = update_community(communities, membership, ent.uuid, "New Member")
    rows = {r.uuid: r for r in updated.collect()}
    assert any(" +New Member" in r.summary for r in rows.values())
    assert all(r.name_embedding is not None for r in rows.values())


def test_rrf_many_partitions_per_query(spark):
    from graphiti_spark.operators.search import rrf, rrf_many

    lane_a = spark.createDataFrame(
        [("q1", "a", 3.0), ("q1", "b", 2.0), ("q2", "b", 5.0), ("q2", "c", 4.0)],
        "query_id string, id string, score double",
    )
    lane_b = spark.createDataFrame(
        [("q1", "b", 9.0), ("q1", "c", 1.0), ("q2", "a", 2.0)],
        "query_id string, id string, score double",
    )
    fused = rrf_many([lane_a, lane_b], limit=10)
    got = {
        (r.query_id, r.id): round(r.score, 9) for r in fused.collect()
    }
    # per-query fusion equals single-query rrf run query-by-query
    for q in ("q1", "q2"):
        solo = rrf(
            [
                df.where(F.col("query_id") == q).select("id", "score")
                for df in (lane_a, lane_b)
                if df.where(F.col("query_id") == q).count() > 0
            ]
        )
        for r in solo.collect():
            assert got[(q, r.id)] == round(r.score, 9)
    # the plan's rank windows are partitioned by query, not global
    from graphiti_spark.plans.explain import physical_plan

    plan = physical_plan(fused)
    assert "partitionspec=[query_id" in plan.replace(" ", "").lower() or \
        "query_id" in plan


def test_hybrid_search_many_matches_per_query(spark, graph):
    """Batched hybrid (one postings pass + one vector pass + rrf_many)
    returns exactly what per-query search() returns, query by query."""
    from graphiti_spark.search_api import NODE_HYBRID_SEARCH_RRF, hybrid_search_many

    queries = [("qa", "Acme Corp"), ("qb", "John Smith"), ("qc", "Initech")]
    batched = hybrid_search_many(queries, graph["nodes"], limit=10)
    got = {}
    for r in batched.collect():
        got.setdefault(r.query_id, {})[r.id] = round(r.score, 9)
    for qid, text in queries:
        solo = search(text, NODE_HYBRID_SEARCH_RRF(), nodes=graph["nodes"]).nodes
        solo_rows = {r.id: round(r.score, 9) for r in solo.collect()}
        assert got.get(qid) == solo_rows, qid


def test_pluggable_cross_encoder(spark, graph):
    """R3 plug point: a custom CrossEncoder instance drives the
    cross_encoder reranker; the BM25-graded deterministic scorer orders
    candidates by graded relevance."""
    from graphiti_spark.search_api import (
        Bm25CrossEncoder,
        NODE_HYBRID_SEARCH_CROSS_ENCODER,
    )

    res = search(
        "Acme Corp",
        NODE_HYBRID_SEARCH_CROSS_ENCODER(),
        nodes=graph["nodes"],
        cross_encoder=Bm25CrossEncoder(),
    )
    rows = res.nodes.collect()
    assert rows
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    top = graph["nodes"].where(F.col("uuid") == rows[0].id).collect()[0]
    assert "Acme" in top.name

    class ConstEncoder:
        def score(self, df, text_col, query):
            return df.withColumn("score", F.lit(0.5))

    res2 = search(
        "Acme Corp", NODE_HYBRID_SEARCH_CROSS_ENCODER(), nodes=graph["nodes"],
        cross_encoder=ConstEncoder(),
    )
    assert all(r.score == 0.5 for r in res2.nodes.collect())


def test_udf_cross_encoder_matches_driver_scorer(spark, graph):
    """R3 client-backed path (VERDICT r2 #4): a fake client wrapped in
    UdfCrossEncoder (pandas UDF, executor-side batches) must produce
    the identical lane ordering and scores as the JVM-side
    TokenOverlapCrossEncoder computing the same function."""
    from graphiti_spark.operators.search import tokenize_py
    from graphiti_spark.search_api import (
        NODE_HYBRID_SEARCH_CROSS_ENCODER,
        TokenOverlapCrossEncoder,
        UdfCrossEncoder,
    )

    def fake_client(query: str, passages: list[str]) -> list[float]:
        q = set(tokenize_py(query))
        return [
            len(q & set(tokenize_py(p))) / max(len(q), 1) for p in passages
        ]

    for query in ("Acme Corp", "John Smith Initech"):
        udf_rows = search(
            query, NODE_HYBRID_SEARCH_CROSS_ENCODER(), nodes=graph["nodes"],
            cross_encoder=UdfCrossEncoder(fake_client),
        ).nodes.collect()
        drv_rows = search(
            query, NODE_HYBRID_SEARCH_CROSS_ENCODER(), nodes=graph["nodes"],
            cross_encoder=TokenOverlapCrossEncoder(),
        ).nodes.collect()
        assert [(r.id, round(r.score, 9)) for r in udf_rows] == [
            (r.id, round(r.score, 9)) for r in drv_rows
        ], query
    assert udf_rows  # the lane actually returned candidates
