"""Incremental corpus-dedup index (operators/dedup_index.py): the
O(batch) crawl-shard dedup path. Pins (1) cross-batch duplicate
detection against keepers only, (2) single-batch equivalence with the
one-shot keep-list, (3) idempotent re-submission, (4) the pruned probe
plan shape."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from graphiti_spark.io.tables import TableIO
from graphiti_spark.operators.dedup_index import DedupIndex


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _mk(spark, threshold=0.5):
    root = tempfile.mkdtemp(prefix="dedup_idx_")
    return DedupIndex(TableIO(spark, root), threshold=threshold)


BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def _t(i):
    # 16 tokens -> 14 word-3-shingles; two docs share only BASE's 8
    # internal shingles: J = 8/20 = 0.4 < 0.5. A twin differing in the
    # last token shares 11: J = 11/17 ~= 0.647 >= 0.5.
    return f"{BASE} doc{i} unique{i} marker{i} extra{i} token{i} pad{i}"


def _twin(i, tag="X"):
    return _t(i).rsplit(" ", 1)[0] + f" pad{tag}"


def test_single_batch_matches_one_shot_keep_list(spark):
    from graphiti_spark.operators.docops import dedup_keep_list

    rows = [(i, _t(i)) for i in range(20)]
    # twins of docs 0..4 (near-dups), plus one exact dup of doc 7
    rows += [(100 + i, _twin(i)) for i in range(5)]
    rows += [(207, rows[7][1])]
    docs = _docs(spark, rows)

    idx = _mk(spark)
    got = {r.doc_id: r.dup_of for r in idx.merge(docs).collect()}
    want = {
        r.doc_id: (None if r.is_kept else r.keep_doc_id)
        for r in dedup_keep_list(docs, threshold=0.5).collect()
    }
    # keep-list only covers clustered docs; unclustered are trivially kept
    for doc_id, dup in want.items():
        assert got[doc_id] == dup
    assert all(
        got[str(i)] is None for i in range(20) if str(i) not in want
    )


def test_cross_batch_dups_point_at_stored_keepers(spark):
    idx = _mk(spark)
    b1 = _docs(spark, [(i, _t(i)) for i in range(10)])
    d1 = {r.doc_id: r for r in idx.merge(b1).collect()}
    assert all(r.is_kept for r in d1.values())

    # batch 2: near-twin of doc 3, exact copy of doc 5, one new unique,
    # and an intra-batch twin pair (20, 21)
    b2 = _docs(
        spark,
        [
            (103, _twin(3)),
            (105, _t(5)),
            (19, "totally different content nothing shared here at all"),
            (20, _t(20)),
            (21, _twin(20, tag="Y")),
        ],
    )
    d2 = {r.doc_id: r.dup_of for r in idx.merge(b2).collect()}
    assert d2["103"] == "3" and d2["105"] == "5"
    assert d2["19"] is None
    # intra-batch component with no stored anchor: lexicographic min kept
    assert d2["20"] is None and d2["21"] == "20"

    # batch 3: an exact copy of 21 (dropped, unindexed) must still be
    # caught through the shared content with its keeper 20
    b3 = _docs(spark, [(30, _twin(20, tag="Y"))])
    d3 = {r.doc_id: r.dup_of for r in idx.merge(b3).collect()}
    assert d3["30"] == "20"


def test_merge_is_idempotent_on_resubmission(spark):
    idx = _mk(spark)
    b = _docs(spark, [(i, _t(i)) for i in range(6)])
    idx.merge(b)
    n_bands = idx.io.read("doc_bands").count()
    n_sh = idx.io.read("doc_shingles").count()
    # re-submitting the same batch: each doc collides with its own
    # stored copy (same id ⇒ it IS the stored doc, so it stays kept)
    # and the anti-join stops any re-indexing
    again = {r.doc_id: r.is_kept for r in idx.merge(b).collect()}
    assert all(again[str(i)] for i in range(6))
    assert idx.io.read("doc_bands").count() == n_bands
    assert idx.io.read("doc_shingles").count() == n_sh


def test_probe_plan_prunes_partitions_and_pushes_keys(spark):
    """The stored-side lookup must be kpart-pruned with the batch's band
    keys pushed into the parquet scan — O(matching row groups), not
    O(corpus)."""
    idx = _mk(spark)
    idx.merge(_docs(spark, [(i, _t(i)) for i in range(8)]))
    from graphiti_spark.operators.dedup_index import KEY_PUSHDOWN_CAP  # noqa: F401
    from graphiti_spark.operators.incremental import KEY_PUSHDOWN_CAP as CAP

    bands_b = idx._band_rows(idx._shingled(_docs(spark, [(50, BASE + " probe")])))
    kp = [(r.kpart, r.key) for r in bands_b.select("kpart", "key").collect()]
    assert len(kp) <= CAP
    stored = (
        idx.io.read("doc_bands")
        .where(F.col("kpart").isin(sorted({k for k, _ in kp})))
        .where(F.col("key").isin(sorted({k for _, k in kp})))
    )
    plan = stored._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "kpart" in plan
    assert "PushedFilters" in plan and "In(key" in plan
