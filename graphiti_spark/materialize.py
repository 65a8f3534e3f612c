"""Materialized pipeline runs: tables + lineage + metrics + resume.

North-rule requirements implemented here:
- every stage output lands in a partitioned table (parquet stand-in for
  Iceberg; see io.tables.TableIO) — `episodes`, `triples_raw`, `nodes`,
  `edges`, `mentions`, `uuid_map`;
- per-partition lineage rows (stage, partition, row_count,
  content_hash) written after each stage;
- per-stage metrics (row counts — the triple-count metrics);
- idempotent resume: `materialize_graph` with `resume=True` anti-joins
  the episode partitions against the extract stage's lineage and only
  processes what is missing, then merges (keyed upserts) into the
  downstream tables. Re-running after a crash (or running twice) gives
  byte-identical tables.

Partition key: `part = pmod(xxhash64(doc_id), n_buckets)` — the north
rule's doc_id-hash partitioning. Entity/edge tables key on
content-derived uuids, so upserts are naturally idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import corpus
from .io.tables import TableIO
from .operators.temporal import resolve_bitemporal
from .pipeline import run_pipeline


def _regroup_edges(df: DataFrame) -> DataFrame:
    """After endpoint re-canonicalization, rows can collide on the
    canonical triple: regroup, union provenance, rebuild the fact text
    from canonical names, recompute the deterministic uuid. Interval
    fields keep their tightest (min) values; the following upsert's
    bi-temporal rectify recomputes them over the merged table (the
    merge lattice is monotone, so replays and partial runs converge)."""
    from .pipeline import _phrase_col
    from .schemas import edge_uuid

    g = df.groupBy(
        "group_id", "source_node_uuid", "predicate", "target_node_uuid", "valid_at"
    ).agg(
        F.min("subj_name").alias("subj_name"),
        F.min("obj_name").alias("obj_name"),
        F.sort_array(F.array_distinct(F.flatten(F.collect_list("episodes")))).alias(
            "episodes"
        ),
        F.min("created_at").alias("created_at"),
        F.min("invalid_at").alias("invalid_at"),
        F.min("expired_at").alias("expired_at"),
        F.first("attributes").alias("attributes"),
    )
    fact = F.concat(
        F.col("subj_name"), F.lit(" "), _phrase_col("predicate"), F.lit(" "),
        F.col("obj_name"), F.lit(" since "), F.year("valid_at").cast("string"),
        F.lit("."),
    )
    return g.withColumn("fact", fact).withColumn(
        "uuid",
        edge_uuid(
            F.col("group_id"), F.col("source_node_uuid"), F.col("predicate"),
            F.col("target_node_uuid"), F.col("valid_at"),
        ),
    )


def upsert_edges(io: TableIO, updates: DataFrame) -> None:
    """Edge MERGE with provenance union + bi-temporal rectification.

    Unlike a plain keyed upsert, colliding edge uuids UNION their
    episode provenance (the reference appends episodes on duplicate,
    edge_operations.py:468-469) and keep the tightest validity interval;
    then T1/T2/T3 re-runs over the merged table so facts arriving in a
    later batch invalidate earlier ones. All operations are monotone
    (min / array-union / least), so replays converge — idempotent
    resume.
    """
    if not io.exists("edges"):
        io.write("edges", updates)
        return
    allrows = io.read("edges").unionByName(updates)
    merged = allrows.groupBy("uuid").agg(
        F.first("group_id").alias("group_id"),
        F.first("source_node_uuid").alias("source_node_uuid"),
        F.first("predicate").alias("predicate"),
        F.first("target_node_uuid").alias("target_node_uuid"),
        F.first("valid_at").alias("valid_at"),
        F.first("subj_name").alias("subj_name"),
        F.first("obj_name").alias("obj_name"),
        F.first("fact").alias("fact"),
        F.sort_array(F.array_distinct(F.flatten(F.collect_list("episodes")))).alias(
            "episodes"
        ),
        F.min("created_at").alias("created_at"),
        F.min("invalid_at").alias("invalid_at"),
        F.min("expired_at").alias("expired_at"),
        F.first("attributes").alias("attributes"),
    )
    rectified = resolve_bitemporal(merged.drop("pair", "pred_class"))
    io.write("edges", rectified.select(*allrows.columns))

N_BUCKETS = 32


def with_part(df: DataFrame, col: str = "doc_id", n_buckets: int = N_BUCKETS) -> DataFrame:
    return df.withColumn("part", F.pmod(F.xxhash64(F.col(col)), F.lit(n_buckets)))


def materialize_graph(
    spark: SparkSession,
    episodes: DataFrame,
    out_dir: str,
    resume: bool = False,
    batch_time: str = corpus.BATCH_TIME,
    n_buckets: int = N_BUCKETS,
    incremental: bool | None = None,
    skip_completed: bool | None = None,
) -> TableIO:
    """Run the pipeline and persist all outputs with lineage/metrics.

    With resume=True, episode partitions already recorded in the
    'extract' lineage are skipped; outputs MERGE into existing tables
    keyed on their deterministic ids. Because ids and timestamps are
    content-derived (never now()/uuid4), a partial re-run converges to
    the same table state.
    """
    # resume = crash-recovery over the SAME logical batch: skip already
    # completed partitions AND resolve against prior state. Streaming
    # micro-batches want incremental=True / skip_completed=False (each
    # batch has fresh doc_ids; the part buckets repeat, so the lineage
    # anti-join must not apply — idempotency there comes from the
    # sink's keyed merges + the stream checkpoint).
    incremental = resume if incremental is None else incremental
    skip_completed = resume if skip_completed is None else skip_completed

    io = TableIO(spark, out_dir)
    eps = with_part(episodes, n_buckets=n_buckets)

    todo = io.resume_filter("extract", eps, "part") if skip_completed else eps
    if todo.isEmpty():
        return io

    # Incremental runs resolve new mentions against the existing
    # graph's surface forms, producing a GLOBAL uuid_map.
    existing_names = (
        io.read("uuid_map").select("group_id", "name")
        if incremental and io.exists("uuid_map")
        else None
    )
    out = run_pipeline(
        spark,
        todo.drop("part"),
        batch_time=batch_time,
        extra_entity_names=existing_names,
    )
    uuid_map = out.uuid_map

    triples = with_part(out.triples_raw, n_buckets=n_buckets)
    io.merge_upsert("episodes", eps, key_cols=["doc_id"])
    io.merge_upsert("triples_raw", triples, key_cols=["doc_id", "offset"])

    # A new batch can merge clusters the old graph kept separate, so
    # STORED edges/mentions are re-canonicalized through the new global
    # map before the merge (J1 over the stored tables — the incremental
    # form of compress_uuid_map + resolve_edge_pointers).
    remap = F.broadcast(
        uuid_map.select(
            F.col("uuid").alias("_old"),
            F.col("canonical_uuid").alias("_new"),
            F.col("canonical_name").alias("_new_name"),
        )
    )
    if io.exists("edges"):
        old_edges = io.read("edges")
        for endpoint, name_col in (
            ("source_node_uuid", "subj_name"),
            ("target_node_uuid", "obj_name"),
        ):
            old_edges = (
                old_edges.join(
                    remap, old_edges[endpoint] == remap["_old"], "left"
                )
                .withColumn(endpoint, F.coalesce("_new", F.col(endpoint)))
                .withColumn(name_col, F.coalesce("_new_name", F.col(name_col)))
                .drop("_old", "_new", "_new_name")
            )
        old_edges = old_edges.where(
            F.col("source_node_uuid") != F.col("target_node_uuid")
        )
        io.write("edges", _regroup_edges(old_edges))
    if io.exists("mentions"):
        old_m = io.read("mentions")
        old_m = (
            old_m.join(remap, old_m["entity_uuid"] == remap["_old"], "left")
            .withColumn("entity_uuid", F.coalesce("_new", F.col("entity_uuid")))
            .withColumn("name", F.coalesce("_new_name", F.col("name")))
            .drop("_old", "_new", "_new_name")
            .dropDuplicates(["doc_id", "entity_uuid"])
            .withColumn(
                "uuid",
                F.sha2(
                    F.concat_ws(
                        "|", F.lit("mention"), F.col("doc_id"), F.col("entity_uuid")
                    ),
                    256,
                ),
            )
        )
        io.write("mentions", old_m)

    # nodes/uuid_map are fully derivable from the global map: overwrite
    # (stale canonicals disappear, exactly as in a from-scratch run).
    io.write("uuid_map", uuid_map)
    upsert_edges(io, out.edges)
    io.merge_upsert("mentions", out.mentions, key_cols=["uuid"])

    # Node enrichment (summary = all-time mention stats) must see the
    # MERGED mentions table, not just this batch's.
    from .operators.ontology import enrich_nodes

    nodes_base = out.nodes.select(
        "group_id", "uuid", "name", "name_embedding", "created_at"
    )
    io.write("nodes", enrich_nodes(nodes_base, io.read("mentions")))

    # lineage AFTER the writes (a crash before this point re-runs the
    # partitions; the keyed merges make that idempotent)
    io.record_lineage("extract", triples, "part")
    io.record_metric("extract", "n_triples", io.read("triples_raw").count())
    io.record_metric("resolve", "n_nodes", io.read("nodes").count())
    io.record_metric("edges", "n_edges", io.read("edges").count())
    io.record_metric(
        "edges",
        "n_invalidated",
        io.read("edges").where(F.col("invalid_at").isNotNull()).count(),
    )
    io.record_metric("mentions", "n_mentions", io.read("mentions").count())
    return io
