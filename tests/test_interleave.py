"""Interleaved-span structure operators: profile semantics on
hand-built span fixtures, packing conservation, and the plan shapes
(profile = map-only scan, packing = exactly one stream Exchange)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from graphiti_spark.operators.interleave import interleave_profile, pack_interleaved
from graphiti_spark.plans.explain import physical_plan, scan_summary
from tests.conftest import SF_SMOKE

SPAN_SCHEMA = (
    "doc_id string, group_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def _eps(spark, rows):
    return spark.createDataFrame(rows, SPAN_SCHEMA)


def _span(kind, text, off):
    ref = f"img://{off:012d}" if kind == "media" else ""
    return (kind, text, ref, off)


def test_profile_runs_and_tokens(spark):
    eps = _eps(
        spark,
        [
            # text,text,media,text -> runs: [text x2][media][text], max_text_run 2
            (
                "d1",
                "g0",
                [
                    _span("text", "Alpha beta gamma.", 0),
                    _span("text", "Delta.", 1),
                    _span("media", "", 2),
                    _span("text", "Eps zeta", 3),
                ],
            ),
            # all media
            ("d2", "g0", [_span("media", "", 0), _span("media", "", 1)]),
            # single text span
            ("d3", "g1", [_span("text", "One two-three", 0)]),
        ],
    )
    out = {r.doc_id: r for r in interleave_profile(eps).collect()}
    r = out["d1"]
    assert (r.n_spans, r.n_text, r.n_media) == (4, 3, 1)
    assert r.n_runs == 3 and r.max_text_run == 2
    assert r.text_tokens == 3 + 1 + 2
    assert r.media_fraction_micro == 250_000
    assert (r.first_kind, r.last_kind) == ("text", "text")
    assert r.offsets_ok and r.refs_ok
    m = out["d2"]
    assert (m.n_text, m.n_media, m.n_runs, m.max_text_run) == (0, 2, 1, 0)
    assert m.media_fraction_micro == 1_000_000
    s = out["d3"]
    assert (s.n_runs, s.max_text_run, s.text_tokens) == (1, 1, 3)


def test_profile_contract_violations_flagged(spark):
    eps = _eps(
        spark,
        [
            # offsets not dense (0,2)
            ("bad_off", "g0", [_span("text", "a", 0), _span("text", "b", 2)]),
            # text span carrying a media_ref
            ("bad_ref", "g0", [("text", "a", "img://deadbeef0000", 0)]),
            # media span with empty ref
            ("bad_media", "g0", [("media", "", "", 0)]),
            ("ok", "g0", [_span("text", "a", 0), _span("media", "", 1)]),
        ],
    )
    out = {r.doc_id: (r.offsets_ok, r.refs_ok) for r in interleave_profile(eps).collect()}
    assert out == {
        "bad_off": (False, True),
        "bad_ref": (True, False),
        "bad_media": (True, False),
        "ok": (True, True),
    }


def test_null_span_fields_flagged_not_hidden(spark):
    """NULL text/media_ref/offset/kind inside a span must (a) not
    poison packing (NULL text costs 0 tokens, not NULL-out the doc's
    stream slot) and (b) flip the contract booleans to False — a NULL
    forall would make the row vanish from BOTH where(ok) and
    where(~ok), hiding exactly the most broken episodes."""
    eps = _eps(
        spark,
        [
            ("null_text", "g0", [("text", None, "", 0), _span("text", "a b", 1)]),
            ("null_ref", "g0", [("media", "", None, 0)]),
            ("null_off", "g0", [("text", "a", "", None)]),
            ("bad_kind", "g0", [("audio", "", "", 0), _span("text", "a", 1)]),
        ],
    )
    prof = {r.doc_id: r for r in interleave_profile(eps).collect()}
    t = prof["null_text"]
    assert t.text_tokens == 2 and t.n_text == 2  # NULL text = 0 tokens
    assert prof["null_ref"].refs_ok is False
    assert prof["null_off"].offsets_ok is False
    k = prof["bad_kind"]
    assert k.kinds_ok is False
    assert (k.n_text, k.n_media) == (1, 0)  # 'audio' counted as neither
    assert all(r.kinds_ok for d, r in prof.items() if d != "bad_kind")
    packed = {r.doc_id: r for r in pack_interleaved(eps).collect()}
    assert packed["null_text"].n_tokens == 2
    assert packed["null_text"].start_off is not None


def test_profile_empty_spans_degenerate(spark):
    # NULL span lists normalize to empty (no NULL-riddled rows)
    eps = _eps(spark, [("empty", "g0", []), ("nullspans", "g0", None)])
    rows = interleave_profile(eps).collect()
    assert len(rows) == 2
    for r in rows:
        assert (r.n_spans, r.n_text, r.n_media, r.n_runs, r.max_text_run) == (
            0, 0, 0, 0, 0,
        )
        assert r.media_fraction_micro == 0 and r.text_tokens == 0
        assert r.first_kind is None and r.last_kind is None
        assert r.offsets_ok and r.refs_ok  # vacuously true on empty
    packed = {r.doc_id: r for r in pack_interleaved(eps).collect()}
    assert all(r.n_tokens == 0 and r.n_media == 0 for r in packed.values())


def test_pack_conservation_and_atomicity(spark):
    rows = []
    for i in range(40):
        spans = [_span("text", f"word{j} tok tok" , j) for j in range(i % 3 + 1)]
        if i % 2 == 0:
            spans.append(_span("media", "", len(spans)))
        rows.append((f"d{i:03d}", "g0", spans))
    eps = _eps(spark, rows)
    budget, media_tokens = 64, 10
    out = pack_interleaved(eps, budget=budget, n_streams=4, media_tokens=media_tokens)
    rs = out.collect()
    assert len(rs) == 40
    # cost = 3 tokens per text span + fixed media charge
    for r in rs:
        n_text_spans = int(r.doc_id[1:]) % 3 + 1
        assert r.n_tokens == 3 * n_text_spans + media_tokens * r.n_media
    # per-stream offsets tile the stream exactly: sorted (start, end)
    # runs are gapless from 0
    by_stream = {}
    for r in rs:
        by_stream.setdefault(r.stream, []).append(r)
    for stream, docs in by_stream.items():
        docs.sort(key=lambda r: r.start_off)
        pos = 0
        for r in docs:
            assert r.start_off == pos
            pos += r.n_tokens
            assert r.first_chunk == r.start_off // budget
            assert r.last_chunk == max(r.first_chunk, (pos - 1) // budget)


def test_pack_deterministic_across_partitionings(spark):
    from graphiti_spark.synth import synthesize_episodes

    eps = synthesize_episodes(spark, SF_SMOKE)
    a = {r.doc_id: tuple(r) for r in pack_interleaved(eps).collect()}
    b = {
        r.doc_id: tuple(r)
        for r in pack_interleaved(eps.repartition(13)).collect()
    }
    assert a == b


def test_interleave_plan_shapes(spark):
    from graphiti_spark.synth import synthesize_episodes

    eps = synthesize_episodes(spark, SF_SMOKE)
    prof = interleave_profile(eps)
    scan_summary(prof).assert_no_python()
    # profile is map-only over the scan: no shuffle, no explode/Generate
    plan = physical_plan(prof)
    assert "Exchange" not in plan
    assert "Generate" not in plan

    packed = pack_interleaved(eps)
    scan_summary(packed).assert_no_python()
    pplan = physical_plan(packed)
    # exactly one Exchange: the stream repartition the window needs
    assert pplan.count("Exchange") == 1
    assert "Generate" not in pplan


def test_interleave_summary_rollup(spark):
    """Per-group rollup: counts, micro media fraction (floor over the
    GROUP totals, not an average of per-doc ratios), violation count."""
    from graphiti_spark.operators.interleave import interleave_summary

    eps = _eps(
        spark,
        [
            ("a1", "g0", [_span("text", "w w w", 0), _span("media", "", 1)]),
            ("a2", "g0", [_span("text", "w", 0)]),
            # violates the offset contract
            ("a3", "g0", [_span("text", "w", 5)]),
            ("b1", "g1", [_span("media", "", 0)]),
        ],
    )
    out = {r.group_id: r for r in interleave_summary(eps).collect()}
    g0 = out["g0"]
    assert (g0.n_episodes, g0.n_spans, g0.n_media, g0.text_tokens) == (3, 4, 1, 5)
    assert g0.media_fraction_micro == 250_000  # 1/4 of group spans
    assert g0.max_text_run == 1 and g0.n_contract_violations == 1
    g1 = out["g1"]
    assert (g1.n_episodes, g1.n_media, g1.media_fraction_micro) == (1, 1, 1_000_000)
    assert g1.n_contract_violations == 0
