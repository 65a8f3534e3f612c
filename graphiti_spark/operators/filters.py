"""Search filters: label/type predicates + bi-temporal CNF builder.

Reference surface (graphiti_core/search/search_filters.py):
- P2 node-label / edge-type predicates (:53-82);
- P3 temporal comparison filters: for each of valid_at / invalid_at /
  created_at / expired_at an OR-of-ANDs (CNF) of
  {=, <>, >, <, >=, <=} comparisons (ComparisonOperator :24-30,
  DateFilter :33-37, query constructors :84-183);
- P5 group-id validation (helpers.py:113-136).

Spark mapping: a compositional Column-expression builder —
``reduce(or_, [reduce(and_, ...)])`` — that Catalyst folds and pushes
into the parquet scan (these predicates are exactly the min/max
file-skipping shape).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import reduce
from operator import and_, or_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

COMPARATORS = {
    "=": lambda c, v: c == v,
    "<>": lambda c, v: c != v,
    ">": lambda c, v: c > v,
    "<": lambda c, v: c < v,
    ">=": lambda c, v: c >= v,
    "<=": lambda c, v: c <= v,
    "is_null": lambda c, v: c.isNull(),
    "is_not_null": lambda c, v: c.isNotNull(),
}


@dataclass
class DateFilter:
    comparison: str          # key into COMPARATORS
    date: str | None = None  # ISO timestamp (None for null checks)


def date_filter_expr(column: str, cnf: list[list[DateFilter]]) -> Column:
    """CNF per the reference: the outer list is OR-ed, the inner lists
    are AND-ed (search_filters.py:84-113)."""
    def leaf(f: DateFilter) -> Column:
        fn = COMPARATORS[f.comparison]
        return fn(F.col(column), F.lit(f.date).cast("timestamp"))

    if not cnf:
        return F.lit(True)
    return reduce(or_, [reduce(and_, [leaf(f) for f in conj]) for conj in cnf])


@dataclass
class SearchFilters:
    node_labels: list[str] | None = None
    edge_types: list[str] | None = None
    valid_at: list[list[DateFilter]] | None = None
    invalid_at: list[list[DateFilter]] | None = None
    created_at: list[list[DateFilter]] | None = None
    expired_at: list[list[DateFilter]] | None = None


def apply_node_filters(nodes: DataFrame, flt: SearchFilters) -> DataFrame:
    if flt.node_labels:
        nodes = nodes.where(
            F.arrays_overlap(
                F.col("labels"), F.array(*[F.lit(l) for l in flt.node_labels])
            )
        )
    return nodes


def apply_edge_filters(edges: DataFrame, flt: SearchFilters) -> DataFrame:
    if flt.edge_types:
        edges = edges.where(F.col("predicate").isin(flt.edge_types))
    for col in ("valid_at", "invalid_at", "created_at", "expired_at"):
        cnf = getattr(flt, col)
        if cnf:
            edges = edges.where(date_filter_expr(col, cnf))
    return edges


GROUP_ID_RE = re.compile(r"^[a-zA-Z0-9_-]+$")


def validate_group_ids(group_ids: list[str]) -> None:
    """P5 (helpers.py:113-136): alphanumeric/underscore/dash only."""
    for g in group_ids:
        if not GROUP_ID_RE.match(g):
            raise ValueError(f"invalid group_id: {g!r}")
