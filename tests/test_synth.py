"""Span-sequence invariant: per-row (kind, text, media_ref, order)
equality of the synthesized episodes table vs the pure-Python mirror
(BASELINE.json input_hint invariant; FIXTURES.md §1)."""

from __future__ import annotations

from graphiti_spark import corpus
from graphiti_spark.synth import exploded_spans, synthesize_episodes
from tests.conftest import SF_SMOKE


def test_span_sequence_invariant(spark):
    eps = synthesize_episodes(spark, SF_SMOKE)
    rows = exploded_spans(eps).orderBy("doc_id", "offset").collect()
    by_doc: dict[str, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == 500
    for did, rs in by_doc.items():
        d = int(did.split("-")[1])
        expected = corpus.spans_for_doc(d)
        got = [
            {"kind": r.kind, "text": r.text, "media_ref": r.media_ref, "offset": r.offset}
            for r in rs
        ]
        assert got == expected, f"span mismatch for {did}"
        # offsets dense, 0-based, ordered
        assert [s["offset"] for s in got] == list(range(len(got)))


def test_media_spans_present(spark):
    eps = synthesize_episodes(spark, SF_SMOKE)
    counts = dict(
        exploded_spans(eps).groupBy("kind").count().collect()
    )
    assert counts.get("media", 0) > 100
    assert counts.get("text", 0) > 500


def test_episode_columns(spark):
    eps = synthesize_episodes(spark, SF_SMOKE)
    row = eps.where("doc_id = 'doc-000007'").collect()[0]
    assert row.group_id == "g3"
    assert row.source == "message"
    assert str(row.created_at) == corpus.BATCH_TIME
    # valid_at = epoch + doc_id minutes
    assert str(row.valid_at) == "2024-01-01 00:07:00"
