"""triple_prf — exact set-P/R/F1 semantics (operators/evaluate.py).

The reference grades extraction with fixture-set comparisons
(tests/test_edge_int.py, dedup/resolve suites); triple_prf is that gate
as an engine operator. These tests pin the metric arithmetic under
controlled perturbations — the driver's `triple_prf` row then checks
the real extraction path against the arithmetic-derived expected set.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graphiti_spark.operators.evaluate import triple_prf

KEYS = ["doc_id", "subj", "pred", "obj"]
SCHEMA = "group_id string, doc_id string, subj string, pred string, obj string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


GOLD = [
    ("g0", "d1", "a", "p", "b"),
    ("g0", "d1", "b", "p", "c"),
    ("g0", "d2", "a", "q", "c"),
    ("g1", "d3", "x", "p", "y"),
]


def test_perfect_match_is_exactly_one(spark):
    out = {
        r.group_id: r
        for r in triple_prf(_df(spark, GOLD), _df(spark, GOLD), KEYS).collect()
    }
    assert set(out) == {"g0", "g1"}
    for r in out.values():
        assert (r.precision_micro, r.recall_micro, r.f1_micro) == (
            1000000, 1000000, 1000000,
        )
        assert r.n_tp == r.n_extracted == r.n_expected


def test_false_positive_drops_precision_only(spark):
    ext = GOLD + [("g0", "d9", "junk", "p", "junk2")]
    out = {
        r.group_id: r
        for r in triple_prf(_df(spark, ext), _df(spark, GOLD), KEYS).collect()
    }
    g0 = out["g0"]
    # 3 tp over 4 extracted: floor(3e6/4); recall intact; f1 = 2*3e6//7
    assert (g0.n_extracted, g0.n_expected, g0.n_tp) == (4, 3, 3)
    assert g0.precision_micro == 750000
    assert g0.recall_micro == 1000000
    assert g0.f1_micro == 2 * 3 * 1000000 // 7
    assert out["g1"].precision_micro == 1000000  # other group untouched


def test_miss_drops_recall_only(spark):
    ext = [r for r in GOLD if r[1] != "d2"]
    out = {
        r.group_id: r
        for r in triple_prf(_df(spark, ext), _df(spark, GOLD), KEYS).collect()
    }
    g0 = out["g0"]
    assert (g0.n_extracted, g0.n_expected, g0.n_tp) == (2, 3, 2)
    assert g0.precision_micro == 1000000
    assert g0.recall_micro == 2 * 1000000 // 3
    assert g0.f1_micro == 2 * 2 * 1000000 // 5


def test_group_missing_from_extraction_still_emits_a_row(spark):
    """A group the extractor lost entirely must surface with zero
    precision/recall, not vanish (the funnel zero-step lesson)."""
    ext = [r for r in GOLD if r[0] != "g1"]
    out = {
        r.group_id: r
        for r in triple_prf(_df(spark, ext), _df(spark, GOLD), KEYS).collect()
    }
    assert set(out) == {"g0", "g1"}
    g1 = out["g1"]
    assert (g1.n_extracted, g1.n_expected, g1.n_tp) == (0, 1, 0)
    assert (g1.precision_micro, g1.recall_micro, g1.f1_micro) == (0, 0, 0)


def test_duplicate_rows_collapse_to_set_semantics(spark):
    ext = GOLD + GOLD  # exact duplicates must not inflate counts
    out = {
        r.group_id: r
        for r in triple_prf(_df(spark, ext), _df(spark, GOLD), KEYS).collect()
    }
    assert out["g0"].n_extracted == 3
    assert out["g0"].precision_micro == 1000000


def test_partition_invariance(spark):
    a = triple_prf(
        _df(spark, GOLD).repartition(7), _df(spark, GOLD).repartition(3), KEYS
    )
    b = triple_prf(_df(spark, GOLD), _df(spark, GOLD), KEYS)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
