"""As-of / interval joins over the bi-temporal edges."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from graphiti_spark.operators.asof import as_of_join, interval_join


def _edges(spark):
    rows = [
        # Globex~Acme: LIKES 2015 (inv 2017), DISLIKES 2017 (inv 2020), LIKES 2020
        ("g0", "Globex", "LIKES", "Acme", "2015-01-01", "2017-01-01"),
        ("g0", "Globex", "DISLIKES", "Acme", "2017-01-01", "2020-01-01"),
        ("g0", "Globex", "LIKES", "Acme", "2020-01-01", None),
        ("g0", "Globex", "ACQUIRED", "Hooli", "2018-01-01", None),
    ]
    return (
        spark.createDataFrame(
            rows,
            "group_id string, subj_name string, predicate string, obj_name string, "
            "va string, ia string",
        )
        .withColumn("valid_at", F.col("va").cast("timestamp"))
        .withColumn("invalid_at", F.col("ia").cast("timestamp"))
        .withColumn("fact", F.concat_ws(" ", "subj_name", "predicate", "obj_name"))
        .drop("va", "ia")
    )


def _probes(spark, rows):
    return spark.createDataFrame(
        rows, "group_id string, name_a string, name_b string, t string"
    ).withColumn("t", F.col("t").cast("timestamp"))


def test_interval_join_returns_facts_true_at_t(spark):
    probes = _probes(spark, [("g0", "Acme", "Globex", "2018-06-01")])
    got = interval_join(_edges(spark), probes).collect()
    assert len(got) == 1
    assert got[0].predicate == "DISLIKES"


def test_as_of_join_latest_per_predicate(spark):
    probes = _probes(spark, [("g0", "Acme", "Globex", "2018-06-01")])
    got = {r.predicate: str(r.valid_at) for r in as_of_join(_edges(spark), probes).collect()}
    # latest LIKES at/before t is the 2015 row; latest DISLIKES the 2017 row
    assert got == {
        "LIKES": "2015-01-01 00:00:00",
        "DISLIKES": "2017-01-01 00:00:00",
    }


def test_join_is_pair_scoped(spark):
    # the Hooli edge never leaks into the Acme-pair probe
    probes = _probes(spark, [("g0", "Globex", "Acme", "2019-01-01")])
    got = interval_join(_edges(spark), probes).collect()
    assert all(r.obj_name == "Acme" for r in got)


def test_multi_probe_times(spark):
    probes = _probes(
        spark,
        [
            ("g0", "Globex", "Acme", "2016-06-01"),
            ("g0", "Globex", "Acme", "2021-06-01"),
        ],
    )
    by_t = {}
    for r in interval_join(_edges(spark), probes).collect():
        by_t.setdefault(str(r.t), set()).add(r.predicate)
    assert by_t == {
        "2016-06-01 00:00:00": {"LIKES"},
        "2021-06-01 00:00:00": {"LIKES"},
    }
