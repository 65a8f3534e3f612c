"""Client-backed summarizer plug point (X4 / C3 / A7): the LLM slot
the reference fills with summarize_nodes prompts
(/root/reference/graphiti_core/prompts/summarize_nodes.py:48-65,
node_operations.py:341-425) — here any callable runs executor-side
through an Arrow-batched pandas UDF / grouped pandas pass, with the
deterministic default left bit-identical (oracles unaffected)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from graphiti_spark.functions.summarize import (
    DeterministicSummarizer,
    UdfSummarizer,
    tree_reduce_summaries,
)
from graphiti_spark.operators.graph_api import pairwise_summary_reduce


def _fake_client(contexts: list[str]) -> list[str]:
    # deterministic stand-in for an LLM: content-addressed rewrite
    return [
        "LLM[" + hashlib.sha256(c.encode()).hexdigest()[:12] + "]"
        for c in contexts
    ]


def test_udf_summarizer_matches_driver_side(spark):
    df = spark.range(50).select(
        F.concat(F.lit("entity "), F.col("id").cast("string")).alias("ctx")
    )
    out = df.withColumn(
        "summary", UdfSummarizer(_fake_client).summarize(F.col("ctx"))
    )
    got = {(r.ctx, r.summary) for r in out.collect()}
    want = {(c, _fake_client([c])[0]) for c in (r.ctx for r in df.collect())}
    assert got == want


def test_default_summarizer_is_identity(spark):
    df = spark.range(3).select(F.col("id").cast("string").alias("ctx"))
    out = df.withColumn(
        "summary", DeterministicSummarizer().summarize(F.col("ctx"))
    )
    assert all(r.ctx == r.summary for r in out.collect())


def test_enrich_nodes_udf_summarizer_rewrites_default_context(spark):
    from graphiti_spark.operators.ontology import enrich_nodes_with_stats

    nodes = spark.createDataFrame(
        [("u1", "g", "J. Smith"), ("u2", "g", "Acme Corp")],
        "uuid string, group_id string, name string",
    )
    stats = spark.createDataFrame(
        [("u1", 3)], "entity_uuid string, n_episodes long"
    )
    plain = {
        r.uuid: r.summary
        for r in enrich_nodes_with_stats(nodes, stats).collect()
    }
    udf = {
        r.uuid: r.summary
        for r in enrich_nodes_with_stats(
            nodes, stats, summarizer=UdfSummarizer(_fake_client)
        ).collect()
    }
    # the client sees exactly the deterministic context sentence
    assert udf == {u: _fake_client([s])[0] for u, s in plain.items()}
    assert "is mentioned in 3 episodes" in plain["u1"]


def test_build_communities_udf_summarizer(spark):
    from graphiti_spark.operators.community import build_communities

    membership = spark.createDataFrame(
        [("g", "a", "c1"), ("g", "b", "c1"), ("g", "c", "c2")],
        "group_id string, uuid string, community string",
    )
    nodes = spark.createDataFrame(
        [("a", "Ann"), ("b", "Bob"), ("c", "Cyd")],
        "uuid string, name string",
    )
    plain, _ = build_communities(membership, nodes, "2025-01-01 00:00:00")
    udf, _ = build_communities(
        membership,
        nodes,
        "2025-01-01 00:00:00",
        summarizer=UdfSummarizer(_fake_client),
    )
    p = {r.uuid: r.summary for r in plain.collect()}
    u = {r.uuid: r.summary for r in udf.collect()}
    assert u == {k: _fake_client([v])[0] for k, v in p.items()}
    assert p[min(p)] .startswith("Community of: ")


def test_tree_reduce_matches_driver_reduce(spark):
    rows = [
        ("g", "c1", n) for n in ["delta", "alpha", "echo", "bravo", "charlie"]
    ] + [("g", "c2", "solo")] + [("h", "c1", n) for n in ["x", "y"]]
    members = spark.createDataFrame(
        rows, "group_id string, community string, name string"
    )

    def combine(a: str, b: str) -> str:
        return "(" + a + "+" + b + ")"

    got = {
        (r.group_id, r.community): r.summary
        for r in tree_reduce_summaries(members, combine).collect()
    }
    for (g, c), texts in {
        ("g", "c1"): ["delta", "alpha", "echo", "bravo", "charlie"],
        ("g", "c2"): ["solo"],
        ("h", "c1"): ["x", "y"],
    }.items():
        assert got[(g, c)] == pairwise_summary_reduce(texts, combine)
