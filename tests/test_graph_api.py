"""Graph-level API: point-in-time slices, add_triplet through the
temporal machinery, episode subgraphs, summary tree-reduce."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphiti_spark.operators.graph_api import (
    add_triplet,
    facts_as_of,
    pairwise_summary_reduce,
    system_time_predicate,
)
from graphiti_spark.pipeline import run_on_sf
from tests.conftest import SF_SMOKE


def test_facts_as_of_slices_intervals(spark):
    out = run_on_sf(spark, SF_SMOKE)
    e = out.edges.cache()
    t = "2019-06-01 00:00:00"
    sliced = facts_as_of(e, t)
    rows = sliced.collect()
    assert rows
    for r in rows:
        assert str(r.valid_at) <= t
        assert r.invalid_at is None or str(r.invalid_at) > t
    # slices at different times differ (intervals actually close)
    assert facts_as_of(e, "2016-01-02 00:00:00").count() != sliced.count()


def test_system_time_slice(spark):
    out = run_on_sf(spark, SF_SMOKE)
    # before the batch ran, nothing existed in system time
    assert out.edges.where(system_time_predicate("2024-12-31 00:00:00")).count() == 0
    # right at batch time, every row is current (expired_at == batch
    # time means it was never current after creation — still counted
    # out by the strict < bound)
    cur = out.edges.where(system_time_predicate("2025-06-01 00:00:00"))
    assert cur.count() == out.edges.where(F.col("expired_at").isNull()).count()


def test_add_triplet_invalidates_prior_fact(spark):
    out = run_on_sf(spark, SF_SMOKE)
    pair = out.edges.where(
        "predicate = 'LIKES' and invalid_at is null"
    ).orderBy("group_id", "subj_name").limit(1).collect()[0]
    new_edges = add_triplet(
        out.edges,
        group_id=pair.group_id,
        subj_name=pair.subj_name,
        predicate="DISLIKES",
        obj_name=pair.obj_name,
        fact=f"{pair.subj_name} dislikes {pair.obj_name} since 2030.",
        valid_at="2030-01-01 00:00:00",
    )
    updated = new_edges.where(
        (F.col("uuid") == pair.uuid)
    ).collect()[0]
    assert str(updated.invalid_at) == "2030-01-01 00:00:00"
    assert new_edges.where("valid_at = '2030-01-01'").count() == 1


def test_pairwise_summary_reduce():
    assert pairwise_summary_reduce([]) == ""
    assert pairwise_summary_reduce(["a"]) == "a"
    out = pairwise_summary_reduce(["c", "a", "b"])
    assert set(out.split()) == {"a", "b", "c"}
    # odd-one-out carried, deterministic regardless of input order
    assert out == pairwise_summary_reduce(["b", "c", "a"])
