"""X9 client-backed extractor: a deterministic fake client (standing in
for an LLM returning structured triples, reference
llm_client/client.py:129-169) wired through ``ClientBackedExtractor``
must drive the pipeline end-to-end to output identical to the
rule-based extractor's on the fixture corpus."""

from __future__ import annotations

import re
from datetime import datetime, timezone

from graphiti_spark import corpus
from graphiti_spark.operators.extract import (
    ClientBackedExtractor,
    extract_triples,
)
from graphiti_spark.pipeline import run_pipeline
from graphiti_spark.synth import synthesize_episodes


def make_fake_client():
    """Deterministic stand-in for an LLM client: parses the fixture's
    templated sentences into the structured triples the reference's
    extract_edges prompt returns (edge_operations.py:106-240)."""
    phrases = sorted((p for _, p in corpus.PREDICATES), key=len, reverse=True)
    alt = "|".join(re.escape(p) for p in phrases)
    pat = re.compile(
        rf"^(?P<speaker>[^:]+): (?P<subj>.+?) (?P<phrase>{alt}) "
        rf"(?P<obj>.+?) since (?P<year>\d{{4}})\.$"
    )
    to_pred = {p: name for name, p in corpus.PREDICATES}

    def client(episodes: list[dict]) -> list[list[dict]]:
        out = []
        for ep in episodes:
            m = pat.match(ep["text"])
            if not m:
                out.append([])
                continue
            out.append(
                [
                    {
                        "speaker": m["speaker"],
                        "subj_name": m["subj"],
                        "predicate": to_pred[m["phrase"]],
                        "obj_name": m["obj"],
                        "fact": ep["text"].split(": ", 1)[1],
                        "valid_at": datetime(
                            int(m["year"]), 1, 1, tzinfo=timezone.utc
                        ),
                    }
                ]
            )
        return out

    return client


def test_client_extractor_matches_rule_based_triples(spark):
    from tests.conftest import SF_SMOKE

    eps = synthesize_episodes(spark, SF_SMOKE)
    rule = {tuple(r) for r in extract_triples(eps).collect()}
    client = {
        tuple(r)
        for r in extract_triples(
            eps, extractor=ClientBackedExtractor(make_fake_client())
        ).collect()
    }
    assert rule == client
    assert len(rule) > 0


def test_client_extractor_pipeline_end_to_end(spark):
    from tests.conftest import SF_SMOKE

    eps = synthesize_episodes(spark, SF_SMOKE)
    base = run_pipeline(spark, eps)
    via_client = run_pipeline(
        spark, eps, extractor=ClientBackedExtractor(make_fake_client())
    )
    def freeze(v, key=None):
        if isinstance(v, dict):
            return tuple(sorted((k, freeze(x, k)) for k, x in v.items()))
        if isinstance(v, list):
            # provenance arrays are set-valued (collect_set order is
            # plan-dependent); embeddings are positional — sort only
            # the former
            if key == "episodes":
                return tuple(sorted(str(x) for x in v))
            return tuple(freeze(x) for x in v)
        return v

    def norm(r):
        return freeze(r.asDict(recursive=True))

    for attr in ("nodes", "edges", "uuid_map", "mentions"):
        a = {norm(r) for r in getattr(base, attr).collect()}
        b = {norm(r) for r in getattr(via_client, attr).collect()}
        assert a == b, f"{attr} diverged between extractor paths"
        assert len(a) > 0


def test_client_extractor_filters_and_empty_batches(spark):
    """Reference-side post-filters: empty names and self-loops are
    dropped; a client returning nothing for every episode yields an
    empty, correctly-typed frame."""
    rows = [
        ("d0", "g0", [{"kind": "text", "text": "whatever", "media_ref": None,
                       "offset": 0}], datetime(2025, 1, 1, tzinfo=timezone.utc)),
    ]
    eps = spark.createDataFrame(
        rows,
        "doc_id string, group_id string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
        "valid_at timestamp",
    )

    def noisy_client(episodes):
        return [
            [
                {"speaker": "s", "subj_name": "", "predicate": "P",
                 "obj_name": "o", "fact": "f"},          # empty subject
                {"speaker": "s", "subj_name": "x", "predicate": "P",
                 "obj_name": "x", "fact": "f"},          # self-loop
                {"speaker": "s", "subj_name": "a", "predicate": "P",
                 "obj_name": "b", "fact": "f"},          # survives, NULL valid_at
            ]
            for _ in episodes
        ]

    got = extract_triples(eps, extractor=ClientBackedExtractor(noisy_client)).collect()
    assert [(r.subj_name, r.obj_name, r.valid_at) for r in got] == [("a", "b", None)]

    def silent_client(episodes):
        return [[] for _ in episodes]

    empty = extract_triples(eps, extractor=ClientBackedExtractor(silent_client))
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ClientBackedExtractor._COLS


def test_client_extractor_malformed_dates_fall_back_to_null(spark):
    """A malformed or out-of-ns-range valid_at from the client becomes
    NULL (the documented date-parse failure path, reference
    edge_operations.py:207-221) — never a stage-killing exception."""
    rows = [
        ("d0", "g0", [{"kind": "text", "text": "whatever", "media_ref": None,
                       "offset": 0}], datetime(2025, 1, 1, tzinfo=timezone.utc)),
    ]
    eps = spark.createDataFrame(
        rows,
        "doc_id string, group_id string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
        "valid_at timestamp",
    )

    def bad_date_client(episodes):
        return [
            [
                {"speaker": "s", "subj_name": "a", "predicate": "P",
                 "obj_name": "b", "fact": "f", "valid_at": "9999-01-01"},
                {"speaker": "s", "subj_name": "c", "predicate": "P",
                 "obj_name": "d", "fact": "f", "valid_at": "not-a-date"},
                {"speaker": "s", "subj_name": "e", "predicate": "P",
                 "obj_name": "g", "fact": "f",
                 "valid_at": "2020-06-01T00:00:00Z"},
            ]
            for _ in episodes
        ]

    got = extract_triples(
        eps, extractor=ClientBackedExtractor(bad_date_client)
    ).collect()
    by_subj = {r.subj_name: r.valid_at for r in got}
    assert by_subj["a"] is None          # out-of-ns-range sentinel
    assert by_subj["c"] is None          # unparseable
    assert by_subj["e"].year == 2020     # well-formed survives


def test_client_extractor_rejects_result_count_mismatch(spark):
    """A client returning the wrong number of result lists must fail
    loudly — zip truncation would silently drop or misattribute
    triples."""
    import pytest

    rows = [
        ("d0", "g0", [{"kind": "text", "text": "t0", "media_ref": None,
                       "offset": 0}], datetime(2025, 1, 1, tzinfo=timezone.utc)),
        ("d1", "g0", [{"kind": "text", "text": "t1", "media_ref": None,
                       "offset": 0}], datetime(2025, 1, 1, tzinfo=timezone.utc)),
    ]
    eps = spark.createDataFrame(
        rows,
        "doc_id string, group_id string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
        "valid_at timestamp",
    )

    def short_client(episodes):
        return [[] for _ in episodes][:-1]   # one list too few

    df = extract_triples(
        eps, extractor=ClientBackedExtractor(short_client)
    ).coalesce(1)  # both episodes in one arrow batch so the check fires
    with pytest.raises(Exception, match="result lists for"):
        df.collect()
