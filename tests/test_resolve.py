"""Dedup / resolve suite (FIXTURES.md §4) — mirrors the reference's
resolve_extracted_nodes / compress_uuid_map decisions
(/root/reference/graphiti_core/utils/maintenance/node_operations.py:229-338,
bulk_utils.py:291-301,400-409) with the deterministic scorer."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphiti_spark.functions.minhash import lsh_candidate_pairs
from graphiti_spark.functions.similarity import jaro_winkler
from graphiti_spark.operators.resolve import (
    build_uuid_map,
    connected_components,
    distinct_entities,
    duplicate_pairs,
)


def _entities(spark, names, group="g0"):
    df = spark.createDataFrame(
        [(group, n) for n in names], "group_id string, name string"
    )
    return distinct_entities(df)


def test_exact_name_dedup_is_identity(spark):
    # two identical mentions → ONE entity row (J6): deterministic ids
    # make exact dedup a dropDuplicates.
    df = spark.createDataFrame(
        [("g0", "Alice"), ("g0", "Alice"), ("g1", "Alice")],
        "group_id string, name string",
    )
    ents = distinct_entities(df)
    assert ents.count() == 2  # one per group
    assert ents.select("uuid").distinct().count() == 2


def test_near_duplicates_merge_and_distinct_stay(spark):
    ents = _entities(
        spark, ["Acme Corp", "Acme Corporation", "Apex Corp", "Globex"]
    )
    pairs = duplicate_pairs(ents).collect()
    names = {
        tuple(
            sorted(
                [
                    r.id_a,
                    r.id_b,
                ]
            )
        )
        for r in pairs
    }
    assert len(pairs) == 1  # only the Acme pair; Apex Corp stays distinct
    comps = connected_components(ents, duplicate_pairs(ents))
    um = build_uuid_map(ents, comps)
    got = {r.name: r.canonical_name for r in um.collect()}
    assert got["Acme Corporation"] == "Acme Corp"
    assert got["Acme Corp"] == "Acme Corp"
    assert got["Apex Corp"] == "Apex Corp"
    assert got["Globex"] == "Globex"


def test_transitive_chain_closure(spark):
    # a→b and b→c pairs must close to one component (D5,
    # compress_uuid_map bulk_utils.py:400-409). 'Initech' ~ 'Initech Inc'
    # ~ 'Initech Incorp' chain: ends may not pair directly but must land
    # in one component.
    ents = _entities(spark, ["Initech", "Initech Inc", "Initech Incorp"])
    pairs = duplicate_pairs(ents)
    comps = connected_components(ents, pairs)
    assert comps.select("component").distinct().count() == 1
    um = build_uuid_map(ents, comps)
    got = {r.name: r.canonical_name for r in um.collect()}
    assert set(got.values()) == {"Initech"}  # min (len, name)


def test_distributed_cc_matches_driver_cc(spark):
    # force the iterative hash-join path (driver_threshold=0) and check
    # it produces the same components as the driver union-find.
    ents = _entities(spark, ["Initech", "Initech Inc", "Initech Incorp", "Globex"])
    pairs = duplicate_pairs(ents)
    dist = {
        r.uuid: r.component
        for r in connected_components(ents, pairs, driver_threshold=0).collect()
    }
    drv = {
        r.uuid: r.component for r in connected_components(ents, pairs).collect()
    }
    assert dist == drv
    assert len(set(dist.values())) == 2  # {Initech*}, {Globex}


def test_no_cross_group_merge(spark):
    df = spark.createDataFrame(
        [("g0", "Acme Corp"), ("g1", "Acme Corporation")],
        "group_id string, name string",
    )
    ents = distinct_entities(df)
    assert duplicate_pairs(ents).count() == 0


def test_lsh_recalls_all_wanted_pairs(spark):
    # blocking must not drop the corpus' designed near-dup pairs.
    from graphiti_spark import corpus

    ents = _entities(spark, corpus.ENTITIES)
    cand = lsh_candidate_pairs(
        ents, id_col="uuid", text_col="name", partition_cols=["group_id"]
    )
    texts = {tuple(sorted([r.text_a, r.text_b])) for r in cand.collect()}
    for a, b in [
        ("Acme Corp", "Acme Corporation"),
        ("John Smith", "J. Smith"),
        ("Initech", "Initech Inc"),
    ]:
        assert tuple(sorted([a, b])) in texts, f"LSH missed {(a, b)}"


def test_jaro_winkler_reference_values():
    assert jaro_winkler("abc", "abc") == 1.0
    assert jaro_winkler("abc", "xyz") == 0.0
    # classic published example
    assert abs(jaro_winkler("martha", "marhta") - 0.9611) < 1e-3
    assert abs(jaro_winkler("dwayne", "duane") - 0.84) < 1e-2
