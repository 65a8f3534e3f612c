"""Search-operator fixtures (FIXTURES.md §7), mirroring the reference's
hybrid-search unit suite
(/root/reference/tests/utils/search/search_utils_test.py:10-163): lane
union dedup, hand-computed RRF, BM25 ordering, cosine top-k, BFS
depths, MMR greedy selection."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphiti_spark.functions.similarity import hash_embed_py
from graphiti_spark.operators.search import (
    bfs_neighborhood,
    bm25_score,
    build_postings,
    episode_mentions_rerank,
    fulltext_search,
    hybrid_node_search,
    mmr,
    node_distance_rerank,
    rrf,
    similarity_search,
    tokenize_py,
)


@pytest.fixture(scope="module")
def corpus_df(spark):
    rows = [
        ("alice", "g0", "Alice climbs mountains and likes maps"),
        ("bob", "g0", "Bob likes maps and maps of mountains"),
        ("charlie", "g0", "Charlie brews coffee"),
    ]
    return spark.createDataFrame(rows, "uuid string, group_id string, name string")


def test_tokenizer():
    assert tokenize_py("Alice: likes, MAPS!") == ["alice", "likes", "maps"]


def test_bm25_ordering(spark, corpus_df):
    postings = build_postings(corpus_df, "uuid", "name")
    scored = {r.id: r.score for r in bm25_score(postings, "maps").collect()}
    # 'maps' appears 2x in bob (shorter per-term weight saturates but tf
    # wins), 1x in alice, 0 in charlie
    assert set(scored) == {"alice", "bob"}
    assert scored["bob"] > scored["alice"]


def test_fulltext_limit_and_group_filter(spark, corpus_df):
    r = fulltext_search(corpus_df, "uuid", "name", "maps coffee", limit=2)
    assert r.count() == 2
    r2 = fulltext_search(
        corpus_df, "uuid", "name", "coffee", group_ids=["g1"], limit=5
    )
    assert r2.count() == 0


def test_similarity_search_exact_match_first(spark, corpus_df):
    emb = corpus_df.withColumn(
        "name_embedding",
        F.udf(lambda s: [float(x) for x in hash_embed_py(s)], "array<float>")(
            F.col("name")
        ),
    )
    qv = [float(x) for x in hash_embed_py("Alice climbs mountains and likes maps")]
    top = similarity_search(emb, "uuid", "name_embedding", qv, min_score=0.3).collect()
    assert top[0].id == "alice"
    assert abs(top[0].score - 1.0) < 1e-5


def test_rrf_hand_computed(spark):
    # list1: a(r0), b(r1); list2: b(r0), c(r1)
    l1 = spark.createDataFrame([("a", 2.0), ("b", 1.0)], "id string, score double")
    l2 = spark.createDataFrame([("b", 9.0), ("c", 8.0)], "id string, score double")
    got = {r.id: r.score for r in rrf([l1, l2]).collect()}
    assert got == {"a": 1.0, "b": 0.5 + 1.0, "c": 0.5}


def test_rrf_dedup_union_semantics(spark):
    # overlapping lanes → one row per id (search_utils.py:672-675)
    l1 = spark.createDataFrame([("a", 1.0)], "id string, score double")
    l2 = spark.createDataFrame([("a", 1.0)], "id string, score double")
    assert rrf([l1, l2]).count() == 1


def test_bfs_depths(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")],
        "source_node_uuid string, target_node_uuid string",
    )
    got = {r.uuid: r.depth for r in bfs_neighborhood(edges, ["a"]).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}  # e is depth 4 > max; x/y unreachable


def test_mmr_prefers_diverse():
    q = np.array([1.0, 0.0])
    cands = [
        ("near_dup1", np.array([1.0, 0.01])),
        ("near_dup2", np.array([1.0, 0.02])),
        ("diverse", np.array([0.6, -0.8])),
    ]
    picked = [i for i, _ in mmr(cands, q, lambda_=0.5, limit=2)]
    assert picked[0] == "near_dup1"
    assert picked[1] == "diverse"  # second pick penalized for similarity


def test_node_distance_rerank(spark):
    edges = spark.createDataFrame(
        [("center", "adj1"), ("adj1", "far")],
        "source_node_uuid string, target_node_uuid string",
    )
    cands = spark.createDataFrame([("adj1",), ("far",), ("center",)], "id string")
    got = {r.id: r.score for r in node_distance_rerank(cands, edges, "center").collect()}
    assert got["center"] == float("inf")
    assert got["adj1"] == 1.0
    assert got["far"] == 0.0


def test_episode_mentions_rerank(spark):
    mentions = spark.createDataFrame(
        [("d1", "a"), ("d2", "a"), ("d1", "b")], "doc_id string, entity_uuid string"
    )
    cands = spark.createDataFrame([("a",), ("b",), ("c",)], "id string")
    got = [r.id for r in episode_mentions_rerank(cands, mentions).collect()]
    assert got == ["a", "b", "c"]


def test_hybrid_node_search_dedups(spark, corpus_df):
    emb = corpus_df.withColumn(
        "name_embedding",
        F.udf(lambda s: [float(x) for x in hash_embed_py(s)], "array<float>")(
            F.col("name")
        ),
    )
    qv = [float(x) for x in hash_embed_py("maps of mountains")]
    res = hybrid_node_search(emb, "maps mountains", qv, limit=3).collect()
    ids = [r.id for r in res]
    assert len(ids) == len(set(ids))
    assert ids[0] == "bob"
