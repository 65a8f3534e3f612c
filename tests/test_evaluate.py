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


# ---------------------------------------------------------------------------
# compare_graphs — the reference's E2E eval harness
# (tests/evals/eval_e2e_graph_building.py:105-180) engine-side
# ---------------------------------------------------------------------------


def _graph_frames(spark, drop_edges=(), mangle_summary=(), drop_nodes=()):
    """Candidate/baseline AddEpisodeResults-shaped frames over 4 docs;
    perturbations select (doc, idx) coordinates to damage."""
    nodes, edges = [], []
    people = ["alice", "bob", "cara"]
    for d in range(4):
        doc = f"doc-{d}"
        for i, p in enumerate(people):
            if (d, i) in drop_nodes:
                continue
            summ = f"{p} is a person seen in chat {d} often"
            if (d, i) in mangle_summary:
                summ = "totally unrelated words here entirely"
            nodes.append(("g0", doc, p, summ))
        for i in range(3):
            if (d, i) in drop_edges:
                continue
            edges.append(
                ("g0", doc, people[i], "knows", people[(i + 1) % 3])
            )
    ndf = spark.createDataFrame(
        nodes, "group_id string, doc_id string, name string, summary string"
    )
    edf = spark.createDataFrame(
        edges,
        "group_id string, doc_id string, subj_name string, "
        "predicate string, obj_name string",
    )
    return ndf, edf


def test_compare_graphs_identical_candidate_scores_perfect(spark):
    from graphiti_spark.operators.evaluate import (
        compare_graphs,
        graph_eval_score,
    )

    bn, be = _graph_frames(spark)
    cn, ce = _graph_frames(spark)
    per_ep = compare_graphs(cn, ce, bn, be)
    rows = {r.doc_id: r for r in per_ep.collect()}
    assert len(rows) == 4
    for r in rows.values():
        assert r.edge_f1_micro == 1_000_000
        assert r.node_recall_micro == 1_000_000
        assert r.summary_overlap_micro == 1_000_000
        assert r.candidate_is_worse is False
    score = graph_eval_score(per_ep).collect()[0]
    assert (score.n_episodes, score.n_not_worse, score.score_micro) == (
        4, 4, 1_000_000,
    )


def test_compare_graphs_scores_are_monotone_in_damage(spark):
    from graphiti_spark.operators.evaluate import (
        compare_graphs,
        graph_eval_score,
    )

    bn, be = _graph_frames(spark)

    def score(**damage):
        cn, ce = _graph_frames(spark, **damage)
        return graph_eval_score(
            compare_graphs(cn, ce, bn, be)
        ).collect()[0].score_micro

    s0 = score()
    s1 = score(drop_edges={(0, 0), (0, 1)})  # doc-0 damaged
    s2 = score(drop_edges={(0, 0), (0, 1), (1, 0), (1, 1)})  # +doc-1
    s3 = score(
        drop_edges={(0, 0), (0, 1), (1, 0), (1, 1)},
        mangle_summary={(2, 0)},  # +doc-2 via summary divergence
        drop_nodes={(3, 1)},      # +doc-3 via lost entity
    )
    assert s0 == 1_000_000
    assert s0 > s1 > s2 > s3  # strictly monotone in damage
    assert s3 == 0  # every episode flagged


def test_compare_graphs_per_metric_attribution(spark):
    from graphiti_spark.operators.evaluate import compare_graphs

    bn, be = _graph_frames(spark)
    cn, ce = _graph_frames(
        spark, drop_edges={(1, 2)}, mangle_summary={(2, 1)},
        drop_nodes={(3, 0)},
    )
    rows = {r.doc_id: r for r in compare_graphs(cn, ce, bn, be).collect()}
    # doc-0 untouched
    assert rows["doc-0"].candidate_is_worse is False
    # doc-1: one of three edges gone -> F1 = 2*2/(2+3)
    assert rows["doc-1"].edge_f1_micro == 800_000
    assert rows["doc-1"].node_recall_micro == 1_000_000
    # doc-2: summaries diverge, edges intact
    assert rows["doc-2"].edge_f1_micro == 1_000_000
    assert rows["doc-2"].summary_overlap_micro < 800_000
    assert rows["doc-2"].candidate_is_worse is True
    # doc-3: lost node -> recall 2/3
    assert rows["doc-3"].node_recall_micro == 666_666
    assert rows["doc-3"].candidate_is_worse is True


def test_compare_graphs_vanished_and_extra_docs_still_scored(spark):
    from graphiti_spark.operators.evaluate import compare_graphs

    bn, be = _graph_frames(spark)
    cn, ce = _graph_frames(spark)
    # candidate drops doc-3 entirely and invents doc-9
    cn = cn.where(F.col("doc_id") != "doc-3")
    ce = ce.where(F.col("doc_id") != "doc-3").unionByName(
        ce.where(F.col("doc_id") == "doc-0").withColumn(
            "doc_id", F.lit("doc-9")
        )
    )
    rows = {r.doc_id: r for r in compare_graphs(cn, ce, bn, be).collect()}
    assert rows["doc-3"].candidate_is_worse is True  # vanished episode
    assert "doc-9" in rows  # hallucinated episode surfaces too
    assert rows["doc-9"].edge_f1_micro == 0


def test_udf_graph_judge_client_backed(spark):
    from graphiti_spark.operators.evaluate import (
        UdfGraphJudge,
        compare_graphs,
    )

    bn, be = _graph_frames(spark)
    cn, ce = _graph_frames(spark, drop_edges={(0, 0), (0, 1)})

    def client(contexts):
        # an "LLM" that flags any imperfect edge F1 — stricter than
        # the default thresholded judge
        return [c["edge_f1_micro"] < 1_000_000 for c in contexts]

    judged = compare_graphs(cn, ce, bn, be, judge=UdfGraphJudge(client))
    rows = {r.doc_id: r.candidate_is_worse for r in judged.collect()}
    assert rows == {"doc-0": True, "doc-1": False, "doc-2": False,
                    "doc-3": False}


def test_graph_judge_through_llm_transport(spark):
    """Wire-readiness: the judge slot driven through the full
    HttpLLMClient retry/cache loop with a deterministic fake wire."""
    import json as _json

    from graphiti_spark.llm_transport import (
        HttpLLMClient,
        TransportConfig,
        TransportGraphJudgeClient,
    )
    from graphiti_spark.operators.evaluate import (
        UdfGraphJudge,
        compare_graphs,
        graph_eval_score,
    )

    def wire(payload):
        ctx = _json.loads(payload["messages"][-1]["content"])
        return _json.dumps(
            {"candidate_is_worse": ctx["edge_f1_micro"] < 800_000}
        )

    judge_client = TransportGraphJudgeClient(
        HttpLLMClient(wire, TransportConfig(), sleep=lambda s: None)
    )
    bn, be = _graph_frames(spark)
    cn, ce = _graph_frames(spark, drop_edges={(0, 0), (0, 1)})
    per_ep = compare_graphs(cn, ce, bn, be, judge=UdfGraphJudge(judge_client))
    score = graph_eval_score(per_ep).collect()[0]
    assert (score.n_episodes, score.n_not_worse) == (4, 3)
