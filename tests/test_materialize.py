"""North-rule resumability: materialized runs are idempotent; a
partial run + resume converges to the same tables as one full run."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphiti_spark.io.tables import TableIO
from graphiti_spark.materialize import materialize_graph, with_part
from graphiti_spark.synth import synthesize_episodes
from tests.conftest import SF_SMOKE


def _table_fingerprint(io: TableIO, name: str):
    df = io.read(name)
    cols = sorted(df.columns)
    rows = df.select(*cols).collect()
    return sorted(tuple(str(v) for v in r) for r in rows)


TABLES = ["episodes", "triples_raw", "nodes", "uuid_map", "edges", "mentions"]


@pytest.fixture(scope="module")
def episodes(spark):
    return synthesize_episodes(spark, SF_SMOKE).cache()


def test_full_vs_partial_resume(spark, episodes, tmp_path_factory):
    full_dir = str(tmp_path_factory.mktemp("full"))
    part_dir = str(tmp_path_factory.mktemp("partial"))

    io_full = materialize_graph(spark, episodes, full_dir)

    # simulate a crash: first run saw only half the partitions
    eps_p = with_part(episodes)
    first_half = eps_p.where(F.col("part") < 16).drop("part")
    materialize_graph(spark, first_half, part_dir)
    # resume with the complete input
    io_resumed = materialize_graph(spark, episodes, part_dir, resume=True)

    for t in TABLES:
        assert _table_fingerprint(io_full, t) == _table_fingerprint(io_resumed, t), t


def test_rerun_is_noop(spark, episodes, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("noop"))
    io1 = materialize_graph(spark, episodes, d)
    before = {t: _table_fingerprint(io1, t) for t in TABLES}
    io2 = materialize_graph(spark, episodes, d, resume=True)
    after = {t: _table_fingerprint(io2, t) for t in TABLES}
    assert before == after


def test_lineage_and_metrics_written(spark, episodes, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("lin"))
    io = materialize_graph(spark, episodes, d)
    lineage = io.read("lineage")
    assert lineage.where(F.col("stage") == "extract").count() > 0
    assert set(lineage.columns) >= {"stage", "part", "row_count", "content_hash"}
    metrics = {
        (r.stage, r.metric): r.value for r in io.read("metrics").collect()
    }
    assert metrics[("extract", "n_triples")] == 999.0
    assert metrics[("edges", "n_invalidated")] == 390.0


def test_tableio_merge_semantics(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("io"))
    io = TableIO(spark, d)
    a = spark.createDataFrame([("k1", 1), ("k2", 2)], "k string, v int")
    io.merge_upsert("t", a, ["k"])
    b = spark.createDataFrame([("k2", 20), ("k3", 30)], "k string, v int")
    io.merge_upsert("t", b, ["k"])
    got = {r.k: r.v for r in io.read("t").collect()}
    assert got == {"k1": 1, "k2": 20, "k3": 30}  # update wins, rest survive
    io.delete_where("t", F.col("k") == "k1")
    assert {r.k for r in io.read("t").collect()} == {"k2", "k3"}
