"""Graph-centrality operators (operators/centrality.py). PageRank is
hash-checked against its unrolled DuckDB oracle by test_oracle_parity;
here triangle_count gets crafted-graph semantics checks."""

from __future__ import annotations

from graphiti_spark.operators.centrality import triangle_count


def _graph(spark, pairs, names=None):
    edges = spark.createDataFrame(
        [("g", a, b) for a, b in pairs],
        "group_id string, subj_name string, obj_name string",
    )
    if names is None:
        names = sorted({n for p in pairs for n in p})
    nodes = spark.createDataFrame(
        [("g", n) for n in names], "group_id string, name string"
    )
    return nodes, edges


def test_triangle_square_pendant(spark):
    # triangle a-b-c, square d-e-f-g (chordless), pendant h off a
    nodes, edges = _graph(
        spark,
        [("a", "b"), ("b", "c"), ("c", "a"),
         ("d", "e"), ("e", "f"), ("f", "g"), ("g", "d"),
         ("a", "h")],
    )
    out = {r.name: r.n_triangles for r in triangle_count(nodes, edges).collect()}
    assert out == {"a": 1, "b": 1, "c": 1, "d": 0, "e": 0, "f": 0, "g": 0, "h": 0}


def test_triangle_k4_and_direction_collapse(spark):
    # K4: every node sits in C(3,2) = 3 triangles; parallel/reverse
    # directed edges and self-loops must collapse before counting
    pairs = [("a", "b"), ("b", "a"), ("a", "c"), ("a", "d"),
             ("b", "c"), ("b", "d"), ("c", "d"), ("c", "c")]
    nodes, edges = _graph(spark, pairs, names=["a", "b", "c", "d"])
    out = {r.name: r.n_triangles for r in triangle_count(nodes, edges).collect()}
    assert out == {"a": 3, "b": 3, "c": 3, "d": 3}
    # global count = sum / 3
    assert sum(out.values()) // 3 == 4
