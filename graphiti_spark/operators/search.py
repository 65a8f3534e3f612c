"""Search operators: fulltext (BM25), vector, graph-BFS, rerankers.

Reference surface being re-expressed (graphiti_core/search/):
- F1 fulltext query builder (search_utils.py:64-81, Lucene escaping
  helpers.py:56-90) → tokenizer column expression (no Lucene).
- F2-F5 fulltext search per entity class (search_utils.py:155-207,
  341-380, 476-519, 522-558; Neo4j BM25 indexes graph_queries.py:68-86)
  → a derived posting-list table + BM25 scoring as DataFrame algebra.
- V1-V3 similarity search (search_utils.py:210-283, 383-434, 561-609;
  cosine in-DB graph_queries.py:97-102; DEFAULT_MIN_SCORE=0.6
  search_utils.py:58) → JVM-side dot product on normalized vectors.
- G1/J8 BFS 1-3 hop expansion (search_utils.py:286-338, 437-473;
  MAX_SEARCH_DEPTH=3 at :60) → iterative frontier joins.
- R1 RRF (search_utils.py:922-933), R2 MMR (:1011-1047), R4
  node-distance (:936-979), R5 episode-mentions (:982-1008).
- H1 hybrid node search (:612-683), H2 4-lane search()
  (search/search.py:66-158) with 2×limit overscan (:179-193).

Scale notes: postings are partitioned by term (query-time term filter
prunes partitions); BM25 score and cosine are whole-stage-codegen
column expressions; top-k uses orderBy+limit (TakeOrdered — no full
sort); batched multi-query variants keep per-query top-k inside a
window, never on the driver. MMR alone is greedy-sequential and runs
on the collected top-N (bounded by the overscan constant), exactly as
the reference does.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.similarity import dot

DEFAULT_MIN_SCORE = 0.6   # search_utils.py:58
DEFAULT_MMR_LAMBDA = 0.5  # search_utils.py:59
MAX_SEARCH_DEPTH = 3      # search_utils.py:60
MAX_QUERY_LENGTH = 32     # search_utils.py:61
DEFAULT_SEARCH_LIMIT = 10  # search_config.py:29
BM25_K1 = 1.2
BM25_B = 0.75


# ---------------------------------------------------------------------------
# F1: tokenizer
# ---------------------------------------------------------------------------

def tokenize(col: Column) -> Column:
    """Lowercase word tokens (no Lucene escaping needed — F1's escape
    table exists only because the reference shells out to Lucene)."""
    return F.filter(
        F.split(F.lower(col), r"[^a-z0-9]+"), lambda t: t != ""
    )


def tokenize_py(text: str) -> list[str]:
    import re

    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t != ""]


# ---------------------------------------------------------------------------
# F2-F5: BM25 as DataFrame algebra over a derived posting table
# ---------------------------------------------------------------------------

def build_postings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf, dl) posting rows + per-doc length. Maintained as a
    derived table per snapshot (incremental MERGE on ingest at scale;
    partition by term for query pruning)."""
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokenize(F.col(text_col))).alias("term")
    )
    dl = toks.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    return tf.join(dl, "id")


def bm25_score(
    postings: DataFrame,
    query: str,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Score all docs matching any query term: (id, score).

    idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (Robertson-Sparck Jones,
    the Lucene variant the reference's Neo4j index uses).
    """
    terms = list(dict.fromkeys(tokenize_py(query)))[:MAX_QUERY_LENGTH]
    if not terms:
        return postings.sparkSession.createDataFrame([], "id string, score double")
    n_docs = postings.select("id").distinct().count()
    avgdl_row = postings.groupBy("id").agg(F.first("dl").alias("dl")).agg(
        F.avg("dl").alias("avgdl")
    ).collect()[0]
    avgdl = float(avgdl_row["avgdl"] or 1.0)

    matched = postings.where(F.col("term").isin(terms))
    df_counts = matched.groupBy("term").agg(F.countDistinct("id").alias("df"))
    scored = (
        matched.join(F.broadcast(df_counts), "term")
        .withColumn(
            "idf",
            F.log1p(
                (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl)),
        )
    )
    return scored.groupBy("id").agg(F.sum("w").alias("score"))


def fulltext_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query: str,
    limit: int = 2 * DEFAULT_SEARCH_LIMIT,
    group_ids: list[str] | None = None,
) -> DataFrame:
    """BM25 top-`limit` over df[text_col] (the 2×limit overscan is the
    caller's reranker headroom, search.py:179-193)."""
    if group_ids:
        df = df.where(F.col("group_id").isin(group_ids))
    postings = build_postings(df, id_col, text_col)
    return (
        bm25_score(postings, query)
        .orderBy(F.desc("score"), "id")
        .limit(limit)
    )


# ---------------------------------------------------------------------------
# V1-V3: vector similarity
# ---------------------------------------------------------------------------

def similarity_search(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    min_score: float = DEFAULT_MIN_SCORE,
    limit: int = 2 * DEFAULT_SEARCH_LIMIT,
    group_ids: list[str] | None = None,
) -> DataFrame:
    """Cosine top-k against a literal query vector (vectors are
    L2-normalized at write time so cosine == dot; V1's min-score cut)."""
    if group_ids:
        df = df.where(F.col("group_id").isin(group_ids))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col).alias("id"), dot(F.col(vec_col), q).alias("score")
    )
    return (
        scored.where(F.col("score") > min_score)
        .orderBy(F.desc("score"), "id")
        .limit(limit)
    )


# ---------------------------------------------------------------------------
# G1/J8: BFS as iterative frontier joins
# ---------------------------------------------------------------------------

def bfs_neighborhood(
    edges: DataFrame,
    origin_uuids: list[str],
    max_depth: int = MAX_SEARCH_DEPTH,
    src_col: str = "source_node_uuid",
    dst_col: str = "target_node_uuid",
) -> DataFrame:
    """Nodes reachable within max_depth hops (undirected, like the
    reference's -[:RELATES_TO]-{1,3} pattern): (uuid, depth) with the
    minimal depth. Each round is one hash join on the frontier; the
    visited set stays deduplicated so frontiers shrink."""
    spark = edges.sparkSession
    adj = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .dropDuplicates()
    )
    visited = spark.createDataFrame(
        [(u, 0) for u in origin_uuids], "uuid string, depth int"
    )
    frontier = visited
    for depth in range(1, max_depth + 1):
        nxt = (
            adj.join(frontier.withColumnRenamed("uuid", "a"), "a")
            .select(F.col("b").alias("uuid"), F.lit(depth).alias("depth"))
            .dropDuplicates(["uuid"])
        )
        nxt = nxt.join(visited.select("uuid"), "uuid", "left_anti")
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        visited = visited.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


# ---------------------------------------------------------------------------
# R1: reciprocal rank fusion
# ---------------------------------------------------------------------------

def rrf(ranked: list[DataFrame], min_score: float = 0.0) -> DataFrame:
    """Each input: (id, score)-ordered DataFrame. Fused score(id) =
    Σ 1/(rank+1) over the lists (search_utils.py:922-933; rank is
    0-based there)."""
    parts = []
    for df in ranked:
        w = Window.orderBy(F.desc("score"), "id")
        parts.append(
            df.withColumn("rank", F.row_number().over(w) - 1).select(
                "id", (1.0 / (F.col("rank") + 1)).alias("contrib")
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy("id")
        .agg(F.sum("contrib").alias("score"))
        .where(F.col("score") >= min_score)
        .orderBy(F.desc("score"), "id")
    )


# ---------------------------------------------------------------------------
# R2: maximal marginal relevance (driver-side greedy over top-N)
# ---------------------------------------------------------------------------

def mmr(
    candidates: list[tuple[str, np.ndarray]],
    query_vec: np.ndarray,
    lambda_: float = DEFAULT_MMR_LAMBDA,
    limit: int = DEFAULT_SEARCH_LIMIT,
) -> list[tuple[str, float]]:
    """Greedy MMR on an already-collected candidate set (bounded by the
    overscan constant — inherently sequential, never a shuffle stage).
    mmr_i = λ·cos(q, i) − (1−λ)·max_j∈S sim(i, j)."""
    if not candidates:
        return []
    ids = [c[0] for c in candidates]
    vecs = np.stack([np.asarray(c[1], dtype=np.float64) for c in candidates])
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0] = 1.0
    vn = vecs / norms[:, None]
    qn = np.asarray(query_vec, dtype=np.float64)
    qnorm = np.linalg.norm(qn) or 1.0
    qn = qn / qnorm
    rel = vn @ qn
    sim = vn @ vn.T
    selected: list[int] = []
    scores: list[float] = []
    remaining = set(range(len(ids)))
    while remaining and len(selected) < limit:
        best, best_score = None, -math.inf
        for i in remaining:
            penalty = max((sim[i][j] for j in selected), default=0.0)
            s = lambda_ * rel[i] - (1 - lambda_) * penalty
            if s > best_score or (s == best_score and (best is None or ids[i] < ids[best])):
                best, best_score = i, s
        selected.append(best)
        scores.append(float(best_score))
        remaining.discard(best)
    return [(ids[i], s) for i, s in zip(selected, scores)]


# ---------------------------------------------------------------------------
# R4: node-distance reranker; R5: episode-mentions reranker
# ---------------------------------------------------------------------------

def node_distance_rerank(
    candidates: DataFrame, edges: DataFrame, center_uuid: str
) -> DataFrame:
    """score = 1/distance with distance 1 if adjacent to center, inf
    otherwise, 0 for the center itself (search_utils.py:936-979).
    Returns (id, score) descending."""
    adj = (
        edges.where(
            (F.col("source_node_uuid") == center_uuid)
            | (F.col("target_node_uuid") == center_uuid)
        )
        .select(
            F.when(
                F.col("source_node_uuid") == center_uuid, F.col("target_node_uuid")
            )
            .otherwise(F.col("source_node_uuid"))
            .alias("id")
        )
        .dropDuplicates()
        .withColumn("adjacent", F.lit(1))
    )
    return (
        candidates.join(F.broadcast(adj), "id", "left")
        .withColumn(
            "score",
            F.when(F.col("id") == center_uuid, F.lit(float("inf")))
            .when(F.col("adjacent").isNotNull(), F.lit(1.0))
            .otherwise(F.lit(0.0)),
        )
        .select("id", "score")
        .orderBy(F.desc("score"), "id")
    )


def episode_mentions_rerank(candidates: DataFrame, mentions: DataFrame) -> DataFrame:
    """Relevance = number of episodes mentioning the node
    (search_utils.py:982-1008). candidates: (id, ...)."""
    counts = mentions.groupBy(F.col("entity_uuid").alias("id")).agg(
        F.count(F.lit(1)).alias("score")
    )
    return (
        candidates.join(counts, "id", "left")
        .withColumn("score", F.coalesce(F.col("score").cast("double"), F.lit(0.0)))
        .select("id", "score")
        .orderBy(F.desc("score"), "id")
    )


# ---------------------------------------------------------------------------
# H1: hybrid search (BM25 ∪ cosine → RRF)
# ---------------------------------------------------------------------------

def hybrid_node_search(
    nodes: DataFrame,
    query: str,
    query_vec: list[float],
    limit: int = DEFAULT_SEARCH_LIMIT,
    group_ids: list[str] | None = None,
) -> DataFrame:
    """F3 ∪ V2 → RRF → limit (search_utils.py:612-683): both lanes
    overscan 2×limit, fusion dedupes by id."""
    ft = fulltext_search(
        nodes, "uuid", "name", query, limit=2 * limit, group_ids=group_ids
    )
    vs = similarity_search(
        nodes, "uuid", "name_embedding", query_vec,
        limit=2 * limit, group_ids=group_ids,
    )
    return rrf([ft, vs]).limit(limit)
