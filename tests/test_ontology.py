"""Custom ontology + exclusion (FIXTURES.md §6), mirroring the
reference's entity-typing suite
(/root/reference/tests/test_entity_exclusion_int.py:39-117): typed
entities get type labels + attribute maps; excluded types disappear
before resolution; every node keeps the 'Entity' label."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphiti_spark.pipeline import run_pipeline
from graphiti_spark.synth import synthesize_episodes
from tests.conftest import SF_SMOKE


def test_entity_typing_and_attributes(spark):
    eps = synthesize_episodes(spark, SF_SMOKE)
    out = run_pipeline(spark, eps)
    nodes = {r.name: r for r in out.nodes.where("group_id = 'g0'").collect()}

    js = nodes["J. Smith"]
    assert js.entity_type == "Person"
    assert js.labels == ["Entity", "Person"]
    assert js.attributes["first_name"] == "J."
    assert js.attributes["last_name"] == "Smith"

    acme = nodes["Acme Corp"]
    assert acme.entity_type == "Organization"
    assert acme.labels == ["Entity", "Organization"]
    assert acme.attributes["organization_type"] == "corporation"

    alice = nodes["Alice"]
    assert alice.entity_type == "Person"  # speaker-first rule
    assert "is mentioned in" in alice.summary


def test_every_node_keeps_entity_label(spark):
    eps = synthesize_episodes(spark, SF_SMOKE)
    out = run_pipeline(spark, eps)
    assert (
        out.nodes.where(~F.array_contains(F.col("labels"), "Entity")).count() == 0
    )


def test_excluded_entity_types(spark):
    eps = synthesize_episodes(spark, SF_SMOKE)
    out = run_pipeline(spark, eps, excluded_entity_types=["Person"])
    names = [r.name for r in out.nodes.collect()]
    assert "J. Smith" not in names
    assert "Alice" not in names  # speakers are Persons
    assert any(n == "Acme Corp" for n in names)
    # edges touching a Person endpoint are gone too
    assert (
        out.edges.where(
            (F.col("subj_name") == "J. Smith") | (F.col("obj_name") == "J. Smith")
        ).count()
        == 0
    )


def test_reflexion_fallback_pass(spark):
    # sentence without the ' since <year>' suffix is missed by the main
    # pattern and recovered by the reflexion pass at episode valid_at
    from graphiti_spark.operators.extract import RuleBasedExtractor

    import datetime

    eps = spark.createDataFrame(
        [
            (
                "doc-x", "g0", "n", "message", None,
                [("text", "Alice: Hooli acquired Pied Piper.", "", 0)],
                datetime.datetime(2025, 1, 1),
                datetime.datetime(2024, 5, 5),
            )
        ],
        "doc_id string, group_id string, name string, source string, "
        "source_description string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
        "created_at timestamp, valid_at timestamp",
    )
    from graphiti_spark.operators.extract import extract_triples

    none_found = extract_triples(eps, RuleBasedExtractor(reflexion=False))
    assert none_found.count() == 0
    found = extract_triples(eps, RuleBasedExtractor(reflexion=True)).collect()
    assert len(found) == 1
    assert found[0].predicate == "ACQUIRED"
    assert str(found[0].valid_at) == "2024-05-05 00:00:00"
