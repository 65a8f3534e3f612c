"""Salted two-phase aggregation: identical results to the single-phase
form, exact counts, hot-key detection."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphiti_spark.functions.skew import hot_keys, salted_collect_set


def test_salted_collect_set_matches_plain(spark):
    rows = [("k%d" % (i % 3), "v%03d" % (i % 17)) for i in range(200)]
    df = spark.createDataFrame(rows, "k string, v string")
    got = {
        r.k: (r.vs, r.n_vs)
        for r in salted_collect_set(df, ["k"], "v").collect()
    }
    plain = {
        r.k: sorted(r.s)
        for r in df.groupBy("k").agg(F.collect_set("v").alias("s")).collect()
    }
    for k, (vs, n) in got.items():
        assert vs == plain[k]
        assert n == len(plain[k])


def test_salted_cap(spark):
    df = spark.createDataFrame(
        [("k", "v%04d" % i) for i in range(100)], "k string, v string"
    )
    r = salted_collect_set(df, ["k"], "v", cap=10).collect()[0]
    assert len(r.vs) == 10          # enumerable set capped...
    assert r.n_vs == 100            # ...but the count stays exact
    assert r.vs == ["v%04d" % i for i in range(10)]  # deterministic prefix


def test_hot_keys(spark):
    rows = [("hot", i) for i in range(50)] + [("cold", i) for i in range(3)]
    df = spark.createDataFrame(rows, "k string, v int")
    hot = {r.k for r in hot_keys(df, ["k"], min_count=10).collect()}
    assert hot == {"hot"}
