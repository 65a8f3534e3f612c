"""P2/P3/P5: label filters, bi-temporal CNF builder, group validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphiti_spark.operators.filters import (
    DateFilter,
    SearchFilters,
    apply_edge_filters,
    apply_node_filters,
    date_filter_expr,
    validate_group_ids,
)


@pytest.fixture(scope="module")
def edges(spark):
    return (
        spark.createDataFrame(
            [
                ("e1", "LIKES", "2020-01-01 00:00:00", "2021-01-01 00:00:00"),
                ("e2", "DISLIKES", "2021-01-01 00:00:00", None),
                ("e3", "WORKS_FOR", "2019-01-01 00:00:00", None),
            ],
            "uuid string, predicate string, valid_at string, invalid_at string",
        )
        .withColumn("valid_at", F.col("valid_at").cast("timestamp"))
        .withColumn("invalid_at", F.col("invalid_at").cast("timestamp"))
    )


def test_cnf_or_of_ands(spark, edges):
    # (valid_at >= 2020 AND valid_at < 2021) OR (valid_at = 2019-01-01)
    cnf = [
        [DateFilter(">=", "2020-01-01"), DateFilter("<", "2021-01-01")],
        [DateFilter("=", "2019-01-01")],
    ]
    got = {r.uuid for r in edges.where(date_filter_expr("valid_at", cnf)).collect()}
    assert got == {"e1", "e3"}


def test_null_checks(spark, edges):
    cnf = [[DateFilter("is_null")]]
    got = {r.uuid for r in edges.where(date_filter_expr("invalid_at", cnf)).collect()}
    assert got == {"e2", "e3"}


def test_edge_type_filter(spark, edges):
    flt = SearchFilters(edge_types=["LIKES", "DISLIKES"])
    assert apply_edge_filters(edges, flt).count() == 2


def test_node_label_filter(spark):
    nodes = spark.createDataFrame(
        [("n1", ["Entity", "Person"]), ("n2", ["Entity"])],
        "uuid string, labels array<string>",
    )
    flt = SearchFilters(node_labels=["Person"])
    assert apply_node_filters(nodes, flt).collect()[0].uuid == "n1"


def test_group_id_validation():
    validate_group_ids(["g0", "team_1", "a-b"])
    with pytest.raises(ValueError):
        validate_group_ids(["bad group!"])
