"""Extraction kernel equivalence (X1/X3): the three kernels — pandas
``str.extract``, RE2 ``pc.extract_regex`` over RecordBatches, and the
pure-Catalyst ``regexp_*`` path — must parse byte-identically: same
backtracking splits, cleaning, self-loop drop, reflexion fallback.
``extract_triples`` routes the default extractor through ``mapInArrow``
(measured fastest — see its docstring); the Catalyst kernel (zero
Python in the stage) is opt-in via ``kernel="native"``."""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa
import pytest

from graphiti_spark.operators.extract import RuleBasedExtractor, extract_triples

TRICKY = [
    "Alice: Acme Corp works for Big Co since 2015.",
    "Bob: J. Smith left Wonka Works since 2017.",
    "junk line with no structure",
    "Cyd: A works for B works for C since 2001.",  # phrase inside object
    "Dee: X​ works for Y since 1999.",  # zero-width char cleaned
    "Eve: Solo partners with Solo since 2010.",  # self-loop dropped
    "Fay: Thing works for Other.",  # fallback shape (no year)
]


def _pdf():
    return pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(len(TRICKY))],
            "group_id": ["g"] * len(TRICKY),
            "offset": pd.array(range(len(TRICKY)), dtype="int32"),
            "episode_valid_at": pd.to_datetime("2025-01-01", utc=True),
            "text": TRICKY,
        }
    )


@pytest.mark.parametrize("reflexion", [False, True])
def test_arrow_kernel_matches_pandas_kernel(reflexion):
    ex = RuleBasedExtractor(reflexion=reflexion)
    pdf = _pdf()
    want = ex.extract(pdf).sort_values("doc_id").reset_index(drop=True)
    got = (
        ex.extract_arrow(pa.RecordBatch.from_pandas(pdf, preserve_index=False))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) == (5 if reflexion else 4)


@pytest.mark.parametrize("reflexion", [False, True])
def test_native_kernel_matches_pandas_kernel(spark, reflexion):
    """The Catalyst kernel (java.util.regex) must split the TRICKY
    corpus exactly like the pandas kernel (Python re) — same lazy
    quantifier backtracking, alternation order, cleaning, ns-range
    NULLing, reflexion fallback."""
    ex = RuleBasedExtractor(reflexion=reflexion)
    pdf = _pdf()
    want = ex.extract(pdf).sort_values("doc_id").reset_index(drop=True)
    spans = spark.createDataFrame(pdf)
    got = (
        ex.extract_native(spans)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # Spark returns tz-aware UTC timestamps; align dtypes only
    for c in ("valid_at", "episode_valid_at"):
        got[c] = pd.to_datetime(got[c], utc=True)
        want[c] = pd.to_datetime(want[c], utc=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) == (5 if reflexion else 4)


def test_extract_triples_default_routes_mapinarrow(spark):
    """The default kernel is the measured-fastest one: mapInArrow
    (RE2 over RecordBatches) — see extract_triples' docstring for the
    A/B numbers that picked it over the Catalyst kernel."""
    from graphiti_spark.synth import synthesize_episodes
    from tests.conftest import SF_SMOKE

    eps = synthesize_episodes(spark, SF_SMOKE)
    plan = extract_triples(eps)._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan, plan[:1500]


def test_native_kernel_is_pure_codegen(spark):
    """kernel="native" must be pure JVM: no Python eval node of any
    kind in the executed plan, and the regexp projection inside a
    WholeStageCodegen span."""
    from graphiti_spark.synth import synthesize_episodes
    from tests.conftest import SF_SMOKE

    eps = synthesize_episodes(spark, SF_SMOKE)
    df = extract_triples(eps, kernel="native")
    plan = df._jdf.queryExecution().executedPlan().toString()
    for node in ("MapInArrow", "MapInPandas", "EvalPython", "ArrowEval"):
        assert node not in plan, plan[:1500]
    # executedPlan().toString() marks WholeStageCodegen spans with the
    # "*(n)" prefix; the regexp projection must carry one.
    assert re.search(r"\*\(\d+\) Project \[doc_id", plan), plan[:1500]


def test_native_and_arrow_kernels_agree_on_spark(spark):
    """Routing equivalence end-to-end through extract_triples: the
    opt-in Catalyst kernel returns exactly the default kernel's rows."""
    from graphiti_spark.synth import synthesize_episodes
    from tests.conftest import SF_SMOKE

    eps = synthesize_episodes(spark, SF_SMOKE)
    arrow_rows = {tuple(r) for r in extract_triples(eps).collect()}
    native_rows = {tuple(r) for r in extract_triples(eps, kernel="native").collect()}
    assert native_rows == arrow_rows
    assert len(arrow_rows) > 0


def test_custom_pandas_extractor_still_routes_mapinpandas(spark):
    from graphiti_spark.synth import synthesize_episodes
    from tests.conftest import SF_SMOKE

    class PandasOnly:
        def extract(self, pdf):
            return RuleBasedExtractor().extract(pdf)

    eps = synthesize_episodes(spark, SF_SMOKE)
    df = extract_triples(eps, extractor=PandasOnly())
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan[:1500]
    # and the two paths produce identical rows
    arrow_rows = {tuple(r) for r in extract_triples(eps).collect()}
    pandas_rows = {tuple(r) for r in df.collect()}
    assert arrow_rows == pandas_rows
