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

# 256 term-hash partitions for the persisted index: at 16, one bucket
# held 1/16 of the vocabulary and a stopword's posting list dominated
# its partition; finer buckets keep per-query partition pruning tight
# as the corpus grows (VERDICT r2 #5). Bucket count only shapes the
# layout — BM25 scores are bucket-independent.
TERM_BUCKETS = 256


def term_bucket_py(term: str, n_buckets: int = TERM_BUCKETS) -> int:
    """crc32-based term bucket, computable both driver-side (to prune
    partitions for a query's literal terms) and JVM-side (F.crc32 at
    index-build time). xxhash64 would need a Spark job to evaluate on
    the driver; crc32 doesn't."""
    import zlib

    return zlib.crc32(term.encode("utf-8")) % n_buckets


def term_bucket_col(term: Column, n_buckets: int = TERM_BUCKETS) -> Column:
    return F.pmod(F.crc32(term.cast("binary")), F.lit(n_buckets)).cast("int")



def _rank_order(score_col: str = "score", id_col: str = "id"):
    """Deterministic ranking keys: sort on the score ROUNDED to 9
    digits (descending), then id. Mathematically-tied scores can differ
    in their last float bits depending on aggregation order (inline vs
    persisted-index plans sum per-term weights in different orders);
    rounding the SORT KEY — never the returned score — makes every
    ranking, cut, and RRF contribution identical across plans."""
    return [F.desc(F.round(F.col(score_col), 9)), F.col(id_col)]


def build_postings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf, dl, tpart) posting rows + per-doc length. tpart is
    the term's hash bucket — the persisted index's partition key, so a
    query's term filter becomes static partition pruning.

    dl (the doc's total token count) is computed BEFORE the explode and
    carried through the tf aggregation — one shuffle total, instead of
    the two-groupBys-plus-rejoin formulation (which shuffled the
    exploded token stream twice and hash-joined 10^? posting rows back
    on id)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.size(tokenize(F.col(text_col))).cast("long").alias("dl"),
        F.explode(tokenize(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    return tf.select("id", "term", "tf", "dl").withColumn(
        "tpart", term_bucket_col(F.col("term"))
    )


def build_corpus_stats(postings: DataFrame) -> DataFrame:
    """1-row (n_docs, total_dl, avgdl) — persisted next to the postings
    so scoring needs zero per-query driver actions."""
    return (
        postings.groupBy("id")
        .agg(F.first("dl").alias("dl"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("dl").cast("long").alias("total_dl"),
        )
        .withColumn(
            "avgdl",
            F.when(F.col("n_docs") > 0, F.col("total_dl") / F.col("n_docs")).otherwise(
                F.lit(1.0)
            ),
        )
    )


def bm25_score(
    postings: DataFrame,
    query: str,
    k1: float = BM25_K1,
    b: float = BM25_B,
    stats: DataFrame | None = None,
    max_df_ratio: float | None = None,
) -> DataFrame:
    """Score all docs matching any query term: (id, score).

    idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (Robertson-Sparck Jones,
    the Lucene variant the reference's Neo4j index uses).

    Fully lazy — no driver actions: corpus stats ride along as a
    broadcast 1-row cross join (pass the persisted ``stats`` table;
    when absent they are derived in-plan from the postings).

    ``max_df_ratio``: optional effective-stopword cut (Lucene-style):
    query terms whose document frequency exceeds this fraction of the
    corpus contribute nothing (their near-zero idf buys a scan of the
    corpus's biggest posting lists). Applied in-plan from the matched
    df counts — still zero driver actions. Off by default (exact BM25).
    """
    terms = list(dict.fromkeys(tokenize_py(query)))[:MAX_QUERY_LENGTH]
    if not terms:
        return postings.sparkSession.createDataFrame([], "id string, score double")
    scored = _bm25_weights(postings, terms, k1, b, stats, max_df_ratio)
    return scored.groupBy("id").agg(F.sum("w").alias("score"))


def _bm25_weights(
    postings: DataFrame,
    terms: list[str],
    k1: float,
    b: float,
    stats: DataFrame | None,
    max_df_ratio: float | None = None,
) -> DataFrame:
    """Per-(term, id) BM25 weights for the matched postings — weights
    are query-independent, so batched scoring computes them once and
    lets each query sum its own terms' rows."""
    if stats is None:
        stats = build_corpus_stats(postings)
    matched = postings.where(F.col("term").isin(terms))
    if "tpart" in postings.columns:
        # static partition pruning on the persisted, term-bucketed index
        buckets = sorted({term_bucket_py(t) for t in terms})
        matched = matched.where(F.col("tpart").isin(buckets))
    df_counts = matched.groupBy("term").agg(F.countDistinct("id").alias("df"))
    out = (
        matched.join(F.broadcast(df_counts), "term")
        .crossJoin(F.broadcast(stats.select("n_docs", "avgdl")))
    )
    if max_df_ratio is not None:
        out = out.where(
            F.col("df") <= F.lit(float(max_df_ratio)) * F.col("n_docs")
        )
    return (
        out
        .withColumn(
            "idf",
            F.log1p(
                (F.col("n_docs").cast("double") - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )


def bm25_score_many(
    postings: DataFrame,
    queries: list[tuple[str, str]],
    k1: float = BM25_K1,
    b: float = BM25_B,
    stats: DataFrame | None = None,
    max_df_ratio: float | None = None,
) -> DataFrame:
    """Batched BM25: score MANY queries in ONE pass over the postings.

    ``queries``: [(query_id, query_text)]. The per-(term, id) weight is
    query-independent, so the matched postings are weighted once and a
    broadcast (query_id, term) join + one (query_id, id) aggregation
    serves the whole batch — the read-path shape for 10^12-doc serving
    that a per-query loop cannot express. Returns (query_id, id, score).
    """
    spark = postings.sparkSession
    qt = []
    for qid, text in queries:
        for t in list(dict.fromkeys(tokenize_py(text)))[:MAX_QUERY_LENGTH]:
            qt.append((qid, t))
    if not qt:
        return spark.createDataFrame([], "query_id string, id string, score double")
    qdf = spark.createDataFrame(qt, "query_id string, term string")
    terms = sorted({t for _, t in qt})
    w = _bm25_weights(postings, terms, k1, b, stats, max_df_ratio)
    return (
        w.join(F.broadcast(qdf), "term")
        .groupBy("query_id", "id")
        .agg(F.sum("w").alias("score"))
    )


def fulltext_search_many(
    queries: list[tuple[str, str]],
    df: DataFrame | None = None,
    id_col: str = "id",
    text_col: str = "text",
    limit: int = 2 * DEFAULT_SEARCH_LIMIT,
    postings: DataFrame | None = None,
    stats: DataFrame | None = None,
    max_df_ratio: float | None = None,
) -> DataFrame:
    """Batched F2-F5: per-query BM25 top-`limit` inside a
    Window.partitionBy(query_id) — no global sort, one shuffle for the
    whole query batch."""
    if postings is None:
        postings = build_postings(df, id_col, text_col)
    scored = bm25_score_many(postings, queries, stats=stats, max_df_ratio=max_df_ratio)
    wq = Window.partitionBy("query_id").orderBy(*_rank_order())
    return (
        scored.withColumn("rank", F.row_number().over(wq))
        .where(F.col("rank") <= limit)
        .drop("rank")
    )


def fulltext_search(
    df: DataFrame | None,
    id_col: str,
    text_col: str,
    query: str,
    limit: int = 2 * DEFAULT_SEARCH_LIMIT,
    group_ids: list[str] | None = None,
    postings: DataFrame | None = None,
    stats: DataFrame | None = None,
    max_df_ratio: float | None = None,
) -> DataFrame:
    """BM25 top-`limit` over df[text_col] (the 2×limit overscan is the
    caller's reranker headroom, search.py:179-193).

    Pass a persisted ``postings`` (+ ``stats``) index to skip the
    corpus re-tokenization entirely — the read path then touches only
    the query terms' partitions of the index (see SearchIndex).

    group_ids + persisted postings: the index rows are scoped via the
    backing ``df`` (semi-join on the group's ids), and the persisted
    corpus-wide stats are DISCARDED so n_docs/avgdl re-derive from the
    group's postings — identical scores to the inline path (BM25 idf is
    corpus-relative; mixing group-scoped df counts with global stats
    would silently shift rankings). Requires ``df``; raises otherwise
    rather than silently returning unfiltered results."""
    if postings is None:
        if group_ids:
            df = df.where(F.col("group_id").isin(group_ids))
        postings = build_postings(df, id_col, text_col)
    elif group_ids:
        if "group_id" in postings.columns:
            postings = postings.where(F.col("group_id").isin(group_ids))
        elif df is not None:
            # no broadcast hint: a group's doc set is usually small but
            # unbounded — AQE picks broadcast when it actually is
            ids = df.where(F.col("group_id").isin(group_ids)).select(
                F.col(id_col).alias("id")
            )
            postings = postings.join(ids, "id", "left_semi")
        else:
            raise ValueError(
                "group_ids filtering over a persisted postings index needs "
                "either a group_id column in the index or the backing df "
                "to resolve the group's ids"
            )
        # group scope changes the corpus: re-derive stats in-plan
        stats = None
    return (
        bm25_score(postings, query, stats=stats, max_df_ratio=max_df_ratio)
        .orderBy(*_rank_order())
        .limit(limit)
    )


class SearchIndex:
    """Persisted BM25 index: term-bucketed postings + 1-row corpus
    stats + a doc-bucketed (id, dl) ledger, maintained incrementally at
    ingest — the Spark analogue of the reference's persistent Lucene
    indexes (graph_queries.py:68-86). The read path touches only the
    query terms' partitions and performs ZERO per-query driver actions;
    the write path appends O(batch) posting files and never re-tokenizes
    the corpus."""

    def __init__(self, io, prefix: str = "ft", n_doc_buckets: int = 32):
        self.io = io
        self.prefix = prefix
        self.n_doc_buckets = n_doc_buckets
        # _migrate_epoch_format is a per-merge no-op after the first
        # check: cache the verdict so steady-state ingest never re-probes
        # the stored postings schema (a driver footer read per call that
        # the round-3 bench showed adds up at micro-batch cadence)
        self._fmt_checked = False

    def _t(self, suffix: str) -> str:
        return f"{self.prefix}_{suffix}"

    def exists(self) -> bool:
        return self.io.exists(self._t("postings"))

    def _migrate_epoch_format(self) -> None:
        """One-time layout upgrade from the epoch-less round-2 format:
        postings/stats/tombstones gain an ``epoch`` write-generation
        column and legacy-tombstoned ids leave the doc ledger (the
        legacy delete left them there, which made a deleted id
        permanently un-indexable: a re-merge was skipped by the ledger
        while its postings stayed tombstone-hidden). O(table) once,
        never again — the same pattern as the node_stats layout
        migration. The probe (a driver-side schema read) is cached per
        instance: once the layout is current it stays current — every
        writer in this module stamps epoch."""
        if self._fmt_checked:
            return
        if not self.exists():
            self._fmt_checked = True
            return
        p = self.io.read(self._t("postings"))
        if "epoch" in p.columns:
            self._fmt_checked = True
            return
        self.io.write(
            self._t("postings"),
            p.withColumn("epoch", F.lit(0).cast("long")),
            partition_by=["tpart"],
        )
        s = self.io.read(self._t("stats"))
        if "epoch" not in s.columns:
            self.io.write(
                self._t("stats"), s.withColumn("epoch", F.lit(0).cast("long"))
            )
        if self.io.exists(self._t("tombstones")):
            t = self.io.read(self._t("tombstones"))
            docs = self.io.read(self._t("docs"))
            self.io.write(
                self._t("docs"),
                docs.join(t.select("id"), "id", "left_anti"),
                partition_by=["part"],
            )
            self.io.write(
                self._t("tombstones"),
                t.select("id", "dl").withColumn("epoch", F.lit(0).cast("long")),
            )
        self._fmt_checked = True

    def _epoch(self) -> int:
        """Current write generation from the 1-row stats table (0 when
        the index is empty). Ingest-side driver read — the QUERY path
        never calls this. Read with pyarrow directly: the table is one
        row in one file, and a Spark job here charged ~100ms of
        scheduling to every micro-batch merge for one integer."""
        if not self.io.exists(self._t("stats")):
            return 0
        import os

        import pyarrow.parquet as pq

        p = self.io.path(self._t("stats"))
        files = [
            os.path.join(p, f)
            for f in os.listdir(p)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        ]
        epoch = 0
        for f in files:
            pf = pq.ParquetFile(f)
            if "epoch" not in pf.schema_arrow.names:
                continue
            col = pf.read(columns=["epoch"]).column("epoch")
            if len(col):
                epoch = max(epoch, int(col[0].as_py()))
        return epoch

    def merge(self, df: DataFrame, id_col: str, text_col: str) -> None:
        """Index the batch: drop already-indexed ids (bucket-scoped
        anti-join on the doc ledger), append their postings stamped with
        a fresh write ``epoch``, fold the (n_docs, total_dl) delta into
        the stats row. Because delete() removes its ids from the ledger
        and tombstones hide only postings written at-or-before the
        delete's epoch, a previously-deleted id is simply re-indexed
        here — its new postings outrank the tombstone."""
        self._migrate_epoch_format()
        epoch = self._epoch() + 1
        docs = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
        docs = docs.withColumn(
            "part",
            F.pmod(F.xxhash64(F.col("id")), F.lit(self.n_doc_buckets)).cast("int"),
        )
        if self.io.exists(self._t("docs")):
            parts = [r[0] for r in docs.select("part").distinct().collect()]
            already = (
                self.io.read(self._t("docs"))
                .where(F.col("part").isin(parts))
                .select("id")
            )
            docs = docs.join(already, "id", "left_anti")
        docs = docs.localCheckpoint(eager=True)
        if docs.isEmpty():
            return  # everything already indexed: true no-op, no epoch bump

        # Postings are written EXACTLY ONCE: tokenize → tf-aggregate →
        # one layout shuffle to tpart (so the partitioned append emits
        # one file per touched bucket, not tasks × buckets small files)
        # → append. The round-3 formulation localCheckpoint'ed the
        # postings before appending them — a second full write of the
        # index plus a redundant read-back — because the ledger and the
        # stats delta were derived FROM the postings; both now derive
        # from the (already-checkpointed) docs batch, so the postings
        # plan has a single consumer and needs no materialization.
        postings = (
            build_postings(docs, "id", "text")
            .withColumn("epoch", F.lit(epoch).cast("long"))
            .repartition(TERM_BUCKETS, "tpart")
        )
        self.io.append(self._t("postings"), postings, partition_by=["tpart"])
        # docs with zero tokens still enter the ledger (dl=0) so a
        # re-ingest of them stays a no-op — but they don't count toward
        # corpus stats (matching build_corpus_stats on inline postings).
        # dl comes straight from the batch text (same expression
        # build_postings uses), not from a groupBy over the postings.
        # Checkpointed: it is tiny (id, part, dl) and feeds three
        # consumers (the parts collect inside merge_upsert, the bucket
        # rewrite, the stats delta).
        ledger = (
            docs.select(
                "id",
                "part",
                F.coalesce(
                    F.size(tokenize(F.col("text"))).cast("long"), F.lit(0).cast("long")
                ).alias("dl"),
            )
            .repartition(self.n_doc_buckets, "part")
            .localCheckpoint(eager=True)
        )
        self.io.merge_upsert(
            self._t("docs"), ledger, key_cols=["id"], partition_col="part"
        )
        delta = ledger.where(F.col("dl") > 0).agg(
            F.count(F.lit(1)).cast("long").alias("d_docs"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("d_dl"),
        )
        if self.io.exists(self._t("stats")):
            merged = (
                self.io.read(self._t("stats"))
                .crossJoin(delta)
                .select(
                    (F.col("n_docs") + F.col("d_docs")).alias("n_docs"),
                    (F.col("total_dl") + F.col("d_dl")).alias("total_dl"),
                )
            )
        else:
            merged = delta.select(
                F.col("d_docs").alias("n_docs"), F.col("d_dl").alias("total_dl")
            )
        merged = merged.withColumn(
            "avgdl",
            F.when(F.col("n_docs") > 0, F.col("total_dl") / F.col("n_docs")).otherwise(
                F.lit(1.0)
            ),
        ).withColumn("epoch", F.lit(epoch).cast("long"))
        self.io.write(self._t("stats"), merged)

    def delete(self, ids: DataFrame) -> None:
        """Delete already-indexed ids (Lucene-style): postings stay on
        disk, hidden by a tombstone recording the CURRENT write epoch
        (the read path keeps only postings strictly newer); the ids
        leave the doc ledger (partition-scoped rewrite of their doc-hash
        buckets) so a later merge can re-index them; corpus stats
        subtract the dead docs' lengths. Needed when canonicalization
        merges away node/edge uuids; compaction physically drops the
        hidden rows. O(batch): the tombstone append, the affected ledger
        buckets, and the 1-row stats."""
        self._migrate_epoch_format()
        epoch = self._epoch()
        ids = ids.toDF("id").dropDuplicates()
        ledger = self.io.read(self._t("docs"))
        dead = ledger.join(ids, "id", "left_semi").localCheckpoint(eager=True)
        self.io.append(
            self._t("tombstones"),
            dead.select("id", "dl").withColumn("epoch", F.lit(epoch).cast("long")),
        )
        parts = [r[0] for r in dead.select("part").distinct().collect()]
        if parts:
            content = ledger.where(F.col("part").isin(parts)).join(
                F.broadcast(dead.select("id")), "id", "left_anti"
            )
            self.io.overwrite_partitions(
                self._t("docs"), content, "part", parts=parts
            )
        delta = dead.where(F.col("dl") > 0).agg(
            F.count(F.lit(1)).cast("long").alias("d_docs"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("d_dl"),
        )
        merged = (
            self.io.read(self._t("stats"))
            .crossJoin(delta)
            .select(
                (F.col("n_docs") - F.col("d_docs")).alias("n_docs"),
                (F.col("total_dl") - F.col("d_dl")).alias("total_dl"),
                "epoch",
            )
            .withColumn(
                "avgdl",
                F.when(
                    F.col("n_docs") > 0, F.col("total_dl") / F.col("n_docs")
                ).otherwise(F.lit(1.0)),
            )
        )
        self.io.write(self._t("stats"), merged)

    def compact(self) -> None:
        """Iceberg-style index maintenance: rewrite the postings with
        tombstone-hidden rows physically dropped and the append-generated
        small files coalesced (one file per term bucket), then clear the
        tombstone set (delete() already keeps the doc ledger live-only).
        Stats are already tombstone-adjusted, so they are unchanged.
        This is the one full-rewrite operation of the index; run it on
        a maintenance cadence, not per batch."""
        self._migrate_epoch_format()
        live = self.postings().repartition("tpart").localCheckpoint(eager=True)
        self.io.write(self._t("postings"), live, partition_by=["tpart"])
        if self.io.exists(self._t("tombstones")):
            self.io.drop(self._t("tombstones"))

    def postings(self) -> DataFrame:
        p = self.io.read(self._t("postings"))
        if self.io.exists(self._t("tombstones")):
            t = self.io.read(self._t("tombstones"))
            if "epoch" in p.columns and "epoch" in t.columns:
                # a tombstone hides postings written AT OR BEFORE its
                # epoch; rows re-indexed after the delete stay visible
                tm = t.groupBy("id").agg(F.max("epoch").alias("_te"))
                p = (
                    p.join(F.broadcast(tm), "id", "left")
                    .where(F.col("_te").isNull() | (F.col("epoch") > F.col("_te")))
                    .drop("_te")
                )
            else:
                p = p.join(F.broadcast(t.select("id")), "id", "left_anti")
        return p

    def stats(self) -> DataFrame:
        return self.io.read(self._t("stats"))

    def search(
        self,
        query: str,
        limit: int = 2 * DEFAULT_SEARCH_LIMIT,
        group_ids: list[str] | None = None,
        df: DataFrame | None = None,
        id_col: str = "id",
        max_df_ratio: float | None = None,
    ) -> DataFrame:
        return fulltext_search(
            df,
            id_col,
            "",
            query,
            limit=limit,
            group_ids=group_ids,
            postings=self.postings(),
            stats=self.stats(),
            max_df_ratio=max_df_ratio,
        )

    def search_many(
        self,
        queries: list[tuple[str, str]],
        limit: int = 2 * DEFAULT_SEARCH_LIMIT,
        max_df_ratio: float | None = None,
    ) -> DataFrame:
        """Batched read path: all queries scored in one pass over the
        pruned index partitions (bm25_score_many) — (query_id, id,
        score), top-`limit` per query."""
        return fulltext_search_many(
            queries, limit=limit, postings=self.postings(), stats=self.stats(),
            max_df_ratio=max_df_ratio,
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
        .orderBy(*_rank_order())
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
    0-based there).

    The unpartitioned rank window is fine here because every input is
    already top-k-bounded by the lane overscan (≤ 2×limit rows); the
    batched multi-query path uses ``rrf_many`` with a per-query
    window instead."""
    parts = []
    for df in ranked:
        w = Window.orderBy(*_rank_order())
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
        .orderBy(*_rank_order())
    )


def rrf_many(
    ranked: list[DataFrame],
    query_col: str = "query_id",
    min_score: float = 0.0,
    limit: int | None = None,
) -> DataFrame:
    """Batched RRF: each input holds MANY queries' candidate lists as
    (query_id, id, score). Ranks and fusion are computed inside a
    ``Window.partitionBy(query_id)`` — one shuffle keyed by query for
    the whole batch, no single-partition sort (the scale shape for a
    multi-query read path)."""
    parts = []
    for df in ranked:
        w = Window.partitionBy(query_col).orderBy(*_rank_order())
        parts.append(
            df.withColumn("rank", F.row_number().over(w) - 1).select(
                query_col, "id", (1.0 / (F.col("rank") + 1)).alias("contrib")
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = (
        u.groupBy(query_col, "id")
        .agg(F.sum("contrib").alias("score"))
        .where(F.col("score") >= min_score)
    )
    if limit is not None:
        wq = Window.partitionBy(query_col).orderBy(*_rank_order())
        fused = fused.withColumn("rank", F.row_number().over(wq)).where(
            F.col("rank") <= limit
        ).drop("rank")
    return fused


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


def provenance_size_rerank(candidates: DataFrame, edges: DataFrame) -> DataFrame:
    """A3: edge-lane episode-mentions rerank — order edges by the SIZE
    of their episode provenance array (reference search/search.py:255-256
    sorts edge results by ``len(edge.episodes)`` desc). candidates:
    (id, ...); edges must carry (uuid, episodes)."""
    sizes = edges.select(
        F.col("uuid").alias("id"), F.size("episodes").cast("double").alias("score")
    )
    return (
        candidates.select("id")
        .join(sizes, "id", "left")
        .withColumn("score", F.coalesce(F.col("score"), F.lit(0.0)))
        .orderBy(*_rank_order())
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
