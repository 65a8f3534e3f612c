"""SnapshotStore (io/snapshots.py): versioned commits, time travel,
rollback, crash-consistency, snapshot expiry, and compaction on plain
parquet — the operational Iceberg half TableIO's single-version swap
deliberately omits."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from graphiti_spark.io.snapshots import SnapshotStore


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, part long, val string")


def _rows(df):
    return sorted((r.id, r.part, r.val) for r in df.collect())


@pytest.fixture
def store(spark, tmp_path):
    return SnapshotStore(spark, str(tmp_path / "snap"))


def test_commit_versions_and_time_travel(spark, store):
    v1 = store.commit_overwrite("t", _df(spark, [(1, 0, "a"), (2, 1, "b")]))
    v2 = store.commit_append("t", _df(spark, [(3, 0, "c")]))
    v3 = store.commit_overwrite("t", _df(spark, [(9, 9, "z")]))
    assert (v1, v2, v3) == (1, 2, 3)
    # every historical version stays byte-readable after later commits
    assert _rows(store.read("t", 1)) == [(1, 0, "a"), (2, 1, "b")]
    assert _rows(store.read("t", 2)) == [(1, 0, "a"), (2, 1, "b"), (3, 0, "c")]
    assert _rows(store.read("t")) == [(9, 9, "z")]
    ops = [h["operation"] for h in store.history("t")]
    assert ops == ["overwrite", "append", "overwrite"]
    parents = [h["parent"] for h in store.history("t")]
    assert parents == [None, 1, 2]


def test_partitioned_reads_keep_partition_column(spark, store):
    df = _df(spark, [(1, 0, "a"), (2, 1, "b"), (3, 1, "c")])
    store.commit_overwrite("t", df, partition_by=["part"])
    got = store.read("t")
    # hive partition column survives the explicit-file-list read
    assert _rows(got) == _rows(df)
    # and partition filters still prune at the scan
    assert _rows(got.where(F.col("part") == 1)) == [(2, 1, "b"), (3, 1, "c")]


def test_overwrite_partitions_is_one_atomic_snapshot(spark, store):
    store.commit_overwrite(
        "t", _df(spark, [(1, 0, "a"), (2, 1, "b"), (3, 2, "c")]),
        partition_by=["part"],
    )
    store.commit_overwrite_partitions(
        "t", _df(spark, [(20, 1, "B2")]), "part"
    )
    assert _rows(store.read("t")) == [(1, 0, "a"), (3, 2, "c"), (20, 1, "B2")]
    # the untouched partitions' rows came from version 1's files
    assert _rows(store.read("t", 1)) == [(1, 0, "a"), (2, 1, "b"), (3, 2, "c")]
    # naming a part with no rows in df empties it in the new snapshot
    store.commit_overwrite_partitions(
        "t", _df(spark, []).limit(0), "part", parts=[2]
    )
    assert _rows(store.read("t")) == [(1, 0, "a"), (20, 1, "B2")]


def test_interrupted_commit_is_invisible(spark, store):
    store.commit_overwrite("t", _df(spark, [(1, 0, "a")]))
    # simulate a crash AFTER data files land but BEFORE the manifest
    # publish: stage files and stop
    store._stage_files("t", _df(spark, [(99, 9, "orphan")]), None)
    assert _rows(store.read("t")) == [(1, 0, "a")]
    assert store.current_version("t") == 1
    # the sweep removes the orphans without touching live data
    res = store.expire_snapshots("t", keep_last=5)
    assert res["deleted_files"] >= 1
    assert _rows(store.read("t")) == [(1, 0, "a")]


def test_rollback_is_roll_forward(spark, store):
    store.commit_overwrite("t", _df(spark, [(1, 0, "good")]))
    store.commit_overwrite("t", _df(spark, [(2, 0, "bad")]))
    v3 = store.rollback("t", 1)
    assert v3 == 3
    assert _rows(store.read("t")) == [(1, 0, "good")]
    # the bad version is still auditable (history never rewritten)
    assert _rows(store.read("t", 2)) == [(2, 0, "bad")]
    assert store.history("t")[-1]["operation"] == "rollback_to_v1"


def test_expire_snapshots_gc(spark, store):
    store.commit_overwrite("t", _df(spark, [(1, 0, "a")]))
    store.commit_overwrite("t", _df(spark, [(2, 0, "b")]))
    store.commit_append("t", _df(spark, [(3, 0, "c")]))
    res = store.expire_snapshots("t", keep_last=1)
    assert res["expired_manifests"] == 2
    # v1's file is gone from disk; current still reads fine
    assert res["deleted_files"] >= 1
    assert _rows(store.read("t")) == [(2, 0, "b"), (3, 0, "c")]
    with pytest.raises(ValueError):
        store.read("t", 1)
    # files on disk == files the surviving manifest references
    base = store.path("t")
    on_disk = {
        os.path.relpath(os.path.join(d, f), base)
        for d, _s, fs in os.walk(base)
        for f in fs
        if f.endswith(".parquet")
    }
    live = set(store._manifest("t", store.current_version("t"))["files"])
    assert on_disk == live


def test_compact_preserves_rows_and_reduces_files(spark, store):
    # many small appends → many files
    store.commit_overwrite("t", _df(spark, [(0, 0, "r0")]))
    for i in range(1, 6):
        store.commit_append("t", _df(spark, [(i, 0, f"r{i}")]))
    before = store.history("t")[-1]["n_files"]
    expected = _rows(store.read("t"))
    store.compact("t", target_files=1)
    after = store.history("t")[-1]["n_files"]
    assert after < before and after == 1
    assert _rows(store.read("t")) == expected
    assert store.history("t")[-1]["operation"] == "compact"
    # pre-compaction snapshot still time-travels until expired
    assert _rows(store.read("t", 6)) == expected


def test_empty_table_roundtrip(spark, store):
    df = _df(spark, []).limit(0)
    store.commit_overwrite("t", df)
    got = store.read("t")
    assert got.count() == 0
    assert got.schema == df.schema


def test_read_as_of_wall_clock(spark, store):
    store.commit_overwrite("t", _df(spark, [(1, 0, "a")]))
    store.commit_overwrite("t", _df(spark, [(2, 0, "b")]))
    h = store.history("t")
    assert _rows(store.read_as_of("t", h[0]["ts"])) == [(1, 0, "a")]
    assert _rows(store.read_as_of("t", h[1]["ts"] + 1)) == [(2, 0, "b")]
    with pytest.raises(ValueError):
        store.read_as_of("t", h[0]["ts"] - 1)


def test_batch_id_append_is_idempotent(spark, store):
    store.commit_append("t", _df(spark, [(1, 0, "a")]), batch_id=0)
    # re-delivery of the same micro-batch is a no-op
    assert store.commit_append("t", _df(spark, [(1, 0, "a")]), batch_id=0) is None
    assert _rows(store.read("t")) == [(1, 0, "a")]
    # the next batch commits normally
    assert store.commit_append("t", _df(spark, [(2, 0, "b")]), batch_id=1) == 2
    assert store.committed_batch_ids("t") == {0, 1}


def test_snapshot_append_sink_exactly_once_across_restarts(
    spark, store, tmp_path
):
    from graphiti_spark.streaming.snapshot_sink import snapshot_append_sink

    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    _df(spark, [(1, 0, "a"), (2, 1, "b")]).write.parquet(str(src / "f1"))

    def run():
        stream = spark.readStream.schema("id long, part long, val string").parquet(
            str(src / "*")
        )
        q = snapshot_append_sink(stream, store, "ev", ckpt, partition_by=["part"])
        q.awaitTermination(300)

    run()
    assert _rows(store.read("ev")) == [(1, 0, "a"), (2, 1, "b")]
    # restart with the SAME checkpoint and one new file: only the new
    # batch lands, nothing is double-appended
    _df(spark, [(3, 0, "c")]).write.parquet(str(src / "f2"))
    run()
    assert _rows(store.read("ev")) == [(1, 0, "a"), (2, 1, "b"), (3, 0, "c")]
    # simulate crash-replay of the LAST batch (checkpoint lost after
    # the sink committed): re-running its foreachBatch body is a no-op
    last_bid = max(store.committed_batch_ids("ev"))
    store.commit_append(
        "ev", _df(spark, [(3, 0, "c")]), partition_by=["part"], batch_id=last_bid
    )
    assert _rows(store.read("ev")) == [(1, 0, "a"), (2, 1, "b"), (3, 0, "c")]


def test_schema_evolution_on_read(spark, store):
    store.commit_overwrite("t", spark.createDataFrame([(1, "a")], "id long, val string"))
    store.commit_append(
        "t",
        spark.createDataFrame([(2, "b", "en")], "id long, val string, lang string"),
    )
    got = store.read("t", merge_schema=True)
    assert set(got.columns) == {"id", "val", "lang"}
    rows = {r.id: (r.val, r.lang) for r in got.collect()}
    # pre-evolution rows surface NULL for the added column
    assert rows == {1: ("a", None), 2: ("b", "en")}
    # time travel to v1 sees the original schema
    assert store.read("t", 1).columns == ["id", "val"]


def test_overwrite_partitions_never_duplicates_unlisted_written_parts(
    spark, store
):
    store.commit_overwrite(
        "t", _df(spark, [(1, 1, "a"), (2, 2, "b")]), partition_by=["part"]
    )
    # df carries rows for part=1 AND part=2 but parts names only [1]:
    # part=2 must still be REPLACED (not doubled alongside v1's files)
    store.commit_overwrite_partitions(
        "t", _df(spark, [(10, 1, "A"), (20, 2, "B")]), "part", parts=[1]
    )
    assert _rows(store.read("t")) == [(10, 1, "A"), (20, 2, "B")]


def test_replay_guard_survives_compact_and_expiry(spark, store):
    store.commit_append("ev", _df(spark, [(1, 0, "a")]), batch_id=0)
    store.commit_append("ev", _df(spark, [(2, 0, "b")]), batch_id=1)
    store.compact("ev", target_files=1)
    store.expire_snapshots("ev", keep_last=1)
    # ids survived the compact manifest + expiry of the carriers
    assert store.committed_batch_ids("ev") == {0, 1}
    assert store.commit_append("ev", _df(spark, [(2, 0, "b")]), batch_id=1) is None
    assert _rows(store.read("ev")) == [(1, 0, "a"), (2, 0, "b")]
    # ...and survives rollback too (monotone guard)
    store.commit_append("ev", _df(spark, [(3, 0, "c")]), batch_id=2)
    store.rollback("ev", store.current_version("ev") - 1)
    assert 2 in store.committed_batch_ids("ev")


def test_expire_sweeps_abandoned_staging_dirs(spark, store):
    import os

    store.commit_overwrite("t", _df(spark, [(1, 0, "a")]))
    # simulate a crash DURING the staged write (before any rename)
    stale = store.path("t") + ".staging-deadbeef"
    os.makedirs(stale)
    open(os.path.join(stale, "part-00000.parquet"), "wb").write(b"x")
    store.expire_snapshots("t", keep_last=1)
    assert not os.path.exists(stale)
    assert _rows(store.read("t")) == [(1, 0, "a")]


def test_graph_tables_get_transaction_time_travel(spark, store):
    """Bi-temporal in BOTH dimensions: the edge ledger already carries
    VALID time (valid_at/invalid_at); committing each batch's edges
    through SnapshotStore adds TRANSACTION time — "what did the graph
    say after batch 1" is a snapshot read, independent of any
    event-time slice run on top of it."""
    from pyspark.sql import functions as F

    from graphiti_spark.pipeline import run_pipeline
    from graphiti_spark.synth import synthesize_episodes

    eps = synthesize_episodes(spark, "/root/testdata/sf0.001")
    half = eps.where(F.col("doc_id") < "doc-000250")
    e1 = run_pipeline(spark, half).edges.select(
        "group_id", "subj_name", "predicate", "obj_name", "valid_at", "invalid_at"
    )
    e2 = run_pipeline(spark, eps).edges.select(
        "group_id", "subj_name", "predicate", "obj_name", "valid_at", "invalid_at"
    )
    store.commit_overwrite("edges", e1)
    store.commit_overwrite("edges", e2)
    # transaction-time travel: batch-1 state is intact after batch 2
    assert store.read("edges", 1).count() == e1.count()
    assert store.read("edges").count() == e2.count()
    got = sorted(map(tuple, store.read("edges", 1).collect()))
    assert got == sorted(map(tuple, e1.collect()))
    # and VALID-time ops compose on any snapshot: an event-time slice
    # of the historical snapshot (facts true mid-2019 as known after
    # batch 1)
    t = F.lit("2019-06-01 00:00:00").cast("timestamp")
    sliced = store.read("edges", 1).where(
        (F.col("valid_at") <= t)
        & (F.col("invalid_at").isNull() | (F.col("invalid_at") > t))
    )
    assert 0 < sliced.count() < e1.count()


def test_overwrite_partitions_rejects_mismatched_parent_layout(spark, store):
    # parent committed UNPARTITIONED: its root-level files can't be
    # replaced by any part= filter — proceeding would duplicate rows
    store.commit_overwrite("t", _df(spark, [(1, 0, "a"), (2, 1, "b")]))
    with pytest.raises(ValueError, match="partitioned by"):
        store.commit_overwrite_partitions("t", _df(spark, [(9, 1, "z")]), "part")
    # parent partitioned by a DIFFERENT column: same refusal
    sdf = spark.createDataFrame(
        [(1, 0, "x"), (2, 1, "y")], "id long, part long, val string"
    )
    store.commit_overwrite("u", sdf, partition_by=["val"])
    with pytest.raises(ValueError, match="partitioned by"):
        store.commit_overwrite_partitions("u", sdf, "part")
    # no parent at all: first commit via overwrite_partitions is fine
    v = store.commit_overwrite_partitions("w", sdf, "part")
    assert v == 1
    assert _rows(store.read("w")) == [(1, 0, "x"), (2, 1, "y")]


def test_overwrite_partitions_matches_spark_escaped_part_values(spark, store):
    # partition values Spark percent-escapes in directory names (':',
    # '/', '%'): naming them in ``parts`` must still replace them
    df = spark.createDataFrame(
        [(1, "a:b", "x"), (2, "c/d", "y"), (3, "plain", "z")],
        "id long, part string, val string",
    )
    store.commit_overwrite("t", df, partition_by=["part"])
    # sanity: the value really was escaped on disk
    dirs = {
        d for d in os.listdir(os.path.join(store.root, "t"))
        if d.startswith("part=")
    }
    assert "part=a:b" not in dirs and any("%3A" in d for d in dirs)
    empty = spark.createDataFrame([], "id long, part string, val string")
    store.commit_overwrite_partitions("t", empty, "part", parts=["a:b", "c/d"])
    assert sorted((r.id, r.part, r.val) for r in store.read("t").collect()) == [
        (3, "plain", "z")
    ]


def test_expire_snapshots_reports_staging_sweeps_separately(spark, store):
    store.commit_overwrite("t", _df(spark, [(1, 0, "a")]))
    # an abandoned staging dir (crash mid-_stage_files) with several
    # files inside — simulated directly since a completed stage cleans
    # itself up
    stag = os.path.join(store.root, "t.staging-deadbeef")
    os.makedirs(stag)
    for i in range(3):
        with open(os.path.join(stag, f"part-{i}.parquet"), "w") as f:
            f.write("x")
    res = store.expire_snapshots("t", keep_last=5)
    assert res["swept_staging_dirs"] == 1
    assert res["swept_staging_files"] >= 3
    # deleted_files counts only manifest-tracked parquet GC, not dirs
    assert res["deleted_files"] == 0
