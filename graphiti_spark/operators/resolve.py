"""Entity resolution: exact dedup → LSH blocking → scoring → components.

Reference pipeline being re-expressed (NOT ported):
- exact-name match within batch: ``node_name_match``
  (graphiti_core/utils/bulk_utils.py:291-301) → here the entity id IS a
  deterministic function of (group_id, lower(name)), so exact dedup is a
  ``dropDuplicates`` — J6.
- similarity blocking: ``compress_nodes`` (bulk_utils.py:304-375) does
  O(N²) embedding dots + LLM chunk dedup; here MinHash-LSH banding
  (functions/minhash.py) generates candidate pairs linearly — D4.
- duplicate decision: LLM judgment (node_operations.py:229-338,
  prompts/dedupe_nodes.py:106-168) → deterministic score: Jaro-Winkler ≥
  θ_jw AND trigram-embedding cosine ≥ θ_cos (north-star rule).
- transitive closure: ``compress_uuid_map`` (bulk_utils.py:400-409) →
  connected components by iterative hash-join min-label propagation — D5.
- pointer rewrite: ``resolve_edge_pointers`` (bulk_utils.py:415-422) →
  broadcast left join + coalesce — J1.

Scale notes: LSH join keys are (group_id, band, band_hash) — no
cross-partition pairs; component propagation joins are on entity uuid
(high cardinality, well distributed); each iteration is localCheckpointed
to truncate lineage; the duplicate-pair graph is tiny relative to the
corpus (only near-dup names), so the uuid_map broadcast in J1 is cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.minhash import lsh_candidate_pairs
from ..functions.similarity import dot, jaro_winkler_udf
from ..schemas import entity_uuid

# Tuned on the fixture pairs (tests/test_resolve.py): accepts
# (Acme Corp~Acme Corporation JW .912/cos .707), (John Smith~J. Smith
# .873/.559), (Initech~Initech Inc .927/.839); rejects (Acme Corp~Apex
# Corp .867/.402). Mirrors the reference's 0.6-cosine candidate cutoff
# (search_utils.py:58) with the name-string check the LLM judgment used
# to provide.
JW_THRESHOLD = 0.85
COS_THRESHOLD = 0.50


def distinct_entities(mentions: DataFrame) -> DataFrame:
    """J6: one vertex per distinct (group_id, lower(name)) — the SAME
    key ``schemas.entity_uuid`` hashes, so case-variant surface forms
    ('Acme Corp' / 'ACME CorP') share one vertex row instead of
    emitting duplicate uuids. The representative surface form is the
    deterministic min by (length, name); ``resolve_pointers`` joins on
    the lowercase key, so every variant still resolves.

    Two-phase on purpose: a direct ``groupBy(...).agg(min_by(name, ...))``
    carries a string-payload aggregate, which is not hash-aggregable —
    Spark plans a SortAggregate, i.e. a full sort of the ENTIRE exploded
    mention stream on both sides of the exchange. Distinct surface
    forms first (pure grouping keys → HashAggregate with map-side
    partial dedup collapses the stream before the shuffle), then the
    min_by runs over the already-tiny distinct set. min_by over the
    distinct multiset equals min_by over the raw stream, so the result
    is unchanged (plan + equality pinned in tests/test_resolve.py)."""
    distinct_forms = (
        mentions.select(
            "group_id", F.lower(F.col("name")).alias("_k"), "name"
        ).distinct()
    )
    return (
        distinct_forms.groupBy("group_id", "_k")
        .agg(
            F.min_by(
                F.col("name"), F.struct(F.length("name"), F.col("name"))
            ).alias("name")
        )
        .drop("_k")
        .withColumn("uuid", entity_uuid(F.col("group_id"), F.col("name")))
    )


# The resolution path operates on the distinct-name space — orders of
# magnitude smaller than the corpus. Its stage sizing follows DATA
# size, not cluster size: with the session's shuffle.partitions (sized
# for the big tables) every tiny resolution stage would pay one task
# per partition of pure scheduling overhead, and that overhead GROWS
# with the cluster.
ROWS_PER_RESOLUTION_PARTITION = 50_000


def resolution_partitions(
    entities: DataFrame, rows_per_partition: int = ROWS_PER_RESOLUTION_PARTITION
) -> int:
    """|entities|-derived stage sizing for the resolution path: one
    partition per ~rows_per_partition distinct names, capped at the
    session's shuffle parallelism (never sized by cluster alone)."""
    import math

    n = entities.count()
    cap = int(entities.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    return max(1, min(cap, math.ceil(n / rows_per_partition)))


def duplicate_pairs(
    entities: DataFrame,
    embedded: DataFrame | None = None,
    n_partitions: int | None = None,
) -> DataFrame:
    """D4 blocking + deterministic dedup decision.

    ``embedded``: optional (uuid, name_embedding) — defaults to hashing
    embeddings computed inline. Returns (group_id, id_a, id_b) with
    id_a < id_b for accepted duplicate pairs.
    """
    from ..functions.similarity import hash_embed_udf

    if n_partitions is None:
        n_partitions = resolution_partitions(entities)
    entities = entities.repartition(n_partitions)
    pairs = lsh_candidate_pairs(
        entities, id_col="uuid", text_col="name", partition_cols=["group_id"]
    )
    if embedded is None:
        embedded = entities.select(
            "uuid", hash_embed_udf(F.col("name")).alias("name_embedding")
        )
    ea = embedded.select(
        F.col("uuid").alias("id_a"), F.col("name_embedding").alias("emb_a")
    )
    eb = embedded.select(
        F.col("uuid").alias("id_b"), F.col("name_embedding").alias("emb_b")
    )
    scored = (
        pairs.join(ea, "id_a")
        .join(eb, "id_b")
        .withColumn("jw", jaro_winkler_udf(F.col("text_a"), F.col("text_b")))
        .withColumn("cos", dot(F.col("emb_a"), F.col("emb_b")))
    )
    return scored.where(
        (F.col("jw") >= JW_THRESHOLD) & (F.col("cos") >= COS_THRESHOLD)
    ).select("group_id", "id_a", "id_b")


DRIVER_CC_THRESHOLD = 500_000


def connected_components(
    vertices: DataFrame,
    pairs: DataFrame,
    max_iters: int = 20,
    driver_threshold: int = DRIVER_CC_THRESHOLD,
) -> DataFrame:
    """D5: connected components of the duplicate-pair graph.

    vertices: (uuid, ...); pairs: (id_a, id_b). Returns (uuid, component)
    where component = min uuid in the connected component.

    Two physical strategies behind one semantics:
    - pair graph fits the driver (≤ driver_threshold edges — near-dup
      pairs are a vanishing fraction of the corpus, so this is the
      common case even at huge doc counts): union-find on the driver,
      broadcast the non-identity labels back. Zero iterative jobs.
    - otherwise: iterative min-label hash-join propagation with
      localCheckpoint per round (no Catalyst recursion), converging in
      O(log diameter) rounds — the north rule's 'iterative hash-join
      label propagation'.
    """
    # one materialization decides the strategy AND feeds the fast path
    probe = pairs.select("id_a", "id_b").limit(driver_threshold + 1).collect()
    if len(probe) <= driver_threshold:
        edges_local = probe
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for r in edges_local:
            ra, rb = find(r.id_a), find(r.id_b)
            if ra != rb:
                # min-id becomes the root → component = min uuid
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        mapping = [(x, find(x)) for x in list(parent)]
        spark = vertices.sparkSession
        if mapping:
            mdf = F.broadcast(
                spark.createDataFrame(mapping, "uuid string, _component string")
            )
            return vertices.join(mdf, "uuid", "left").select(
                "uuid", F.coalesce("_component", "uuid").alias("component")
            )
        return vertices.select("uuid", F.col("uuid").alias("component"))

    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .dropDuplicates(["src", "dst"])
    )
    labels = vertices.select(F.col("uuid"), F.col("uuid").alias("component"))
    edges = edges.localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["uuid"])
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["uuid"] == neighbor_min["src"], "left")
            .select(
                "uuid",
                F.least(F.col("component"), F.col("nbr_component")).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "uuid")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def build_uuid_map(entities: DataFrame, components: DataFrame) -> DataFrame:
    """Component → canonical member; canonical = min by (len(name), name)
    (the shortest, lexicographically-first surface form — deterministic
    stand-in for the reference's 'existing node wins' rule,
    node_operations.py:306-318).

    Returns (group_id, uuid, name, canonical_uuid, canonical_name).
    """
    labeled = entities.join(components, "uuid")
    canon = (
        labeled.groupBy("component")
        .agg(
            F.min_by(
                F.struct(F.col("uuid").alias("u"), F.col("name").alias("n")),
                F.struct(F.length("name"), F.col("name")),
            ).alias("c")
        )
        .select(
            "component",
            F.col("c.u").alias("canonical_uuid"),
            F.col("c.n").alias("canonical_name"),
        )
    )
    return labeled.join(canon, "component").select(
        "group_id", "uuid", "name", "canonical_uuid", "canonical_name"
    )


def resolve_pointers(
    triples: DataFrame,
    uuid_map: DataFrame,
    col_name: str,
    name_col: str,
    join_strategy: str = "auto",
) -> DataFrame:
    """J1: rewrite one endpoint column through the uuid_map via left
    join + coalesce (identity when unmapped). Joins on the NAME key
    (group_id, lower(name)) because raw triples carry surface names and
    the vertex set keeps one representative per lowercase name — the
    same normalization ``entity_uuid`` hashes.

    ``join_strategy``: 'auto' (default) carries no hint — AQE picks a
    broadcast join at runtime when the map side is actually small and
    falls back to a shuffle join when it isn't (the uuid_map is one row
    per distinct entity name: usually tiny, but O(entities) — at 100×
    an unconditional broadcast would OOM the executors). 'broadcast' /
    'shuffle' force the respective strategy (tests pin equivalence
    through both physical paths)."""
    m = uuid_map.select(
        F.col("group_id").alias(f"__g_{col_name}"),
        F.col("name").alias(f"__k_{col_name}"),
        F.col("canonical_uuid").alias(f"__cu_{col_name}"),
        F.col("canonical_name").alias(f"__cn_{col_name}"),
    )
    if join_strategy == "broadcast":
        m = F.broadcast(m)
    elif join_strategy == "shuffle":
        m = m.hint("shuffle_hash")
    elif join_strategy != "auto":
        raise ValueError(f"unknown join_strategy: {join_strategy!r}")
    joined = triples.join(
        m,
        (triples["group_id"] == m[f"__g_{col_name}"])
        & (F.lower(triples[name_col]) == F.lower(m[f"__k_{col_name}"])),
        "left",
    ).drop(f"__g_{col_name}")
    return (
        joined.withColumn(
            col_name,
            F.coalesce(
                F.col(f"__cu_{col_name}"),
                entity_uuid(F.col("group_id"), F.col(name_col)),
            ),
        )
        .withColumn(name_col, F.coalesce(F.col(f"__cn_{col_name}"), F.col(name_col)))
        .drop(f"__k_{col_name}", f"__cu_{col_name}", f"__cn_{col_name}")
    )


def merge_near_duplicate_facts(
    edges: DataFrame, threshold: float = 0.6
) -> DataFrame:
    """Fact-level near-duplicate edge merge within an endpoint-pair
    group.

    Reference semantics: ``get_relevant_edges`` gathers same-pair
    candidates above DEFAULT_MIN_SCORE=0.6 fact-embedding cosine
    (search_utils.py:781-848); ``resolve_extracted_edge`` then lets the
    LLM pick a ``duplicate_fact_id`` — the duplicate keeps the existing
    edge's uuid/dates and appends the new episode provenance
    (edge_operations.py:460-469).

    Deterministic stand-in for the LLM judgment: two same-pair edges
    are duplicates iff their fact-embedding cosine ≥ ``threshold`` AND
    their valid_at timestamps agree (null-safe) — paraphrases of one
    dated fact merge; differently-dated facts stay separate so the
    bi-temporal chain is untouched. The canonical survivor is the
    earliest edge by (created_at, uuid) (the reference's 'existing edge
    wins'); its predicate/fact/uuid are kept and provenance is unioned.

    Not wired into the default pipeline: the deterministic extractor
    regenerates fact text from canonical names, so exact triple dedup
    already collapses surface variants there. Enable (run_pipeline
    ``near_dup_fact_threshold``) when a pluggable extractor emits
    varied predicate/fact surface forms for one semantic fact.

    Scale shape: the pairwise comparison runs per (group, pair) Arrow
    batch; pair groups are small by construction (facts per entity
    pair), so the O(k²) inner loop is bounded — the same shape as the
    reference's per-pair candidate sets.
    """
    import numpy as np
    import pandas as pd

    from .temporal import pair_key

    has_emb = "fact_embedding" in edges.columns
    if not has_emb:
        from ..functions.similarity import hash_embed_udf

        e = edges.withColumn("fact_embedding", hash_embed_udf(F.col("fact")))
    else:
        e = edges
    out_schema = edges.schema if not has_emb else e.schema
    base_cols = [f.name for f in out_schema.fields]
    e = e.withColumn(
        "__pair", pair_key(F.col("source_node_uuid"), F.col("target_node_uuid"))
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) <= 1:
            return pdf[base_cols]
        n = len(pdf)
        vecs = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf["fact_embedding"]]
        )
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        vn = vecs / norms[:, None]
        sim = vn @ vn.T
        va = pdf["valid_at"].tolist()
        parent = list(range(n))

        def find(i: int) -> int:
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for i in range(n):
            for j in range(i + 1, n):
                same_date = (pd.isna(va[i]) and pd.isna(va[j])) or (
                    not pd.isna(va[i]) and not pd.isna(va[j]) and va[i] == va[j]
                )
                if same_date and sim[i][j] >= threshold:
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[max(ri, rj)] = min(ri, rj)

        clusters: dict[int, list[int]] = {}
        for i in range(n):
            clusters.setdefault(find(i), []).append(i)
        rows = []
        for idxs in clusters.values():
            canon = min(
                idxs,
                key=lambda i: (str(pdf["created_at"].iloc[i]), pdf["uuid"].iloc[i]),
            )
            row = pdf.iloc[canon].copy()
            row["episodes"] = sorted(
                {d for i in idxs for d in pdf["episodes"].iloc[i]}
            )
            rows.append(row[base_cols])
        return pd.DataFrame(rows)

    return e.groupBy("group_id", "__pair").applyInPandas(fn, schema=out_schema)


def get_relevant_nodes(
    corpus: DataFrame,
    queries: DataFrame,
    min_score: float = 0.6,
    limit: int = 10,
    id_col: str = "uuid",
    text_col: str = "name",
    emb_col: str = "name_embedding",
    group_col: str = "group_id",
    postings: DataFrame | None = None,
) -> DataFrame:
    """J2 FULL parity: the reference's hybrid candidate generation for
    entity resolution (``get_relevant_nodes``, search_utils.py:686-746)
    — per query node, the union of

    - **vector lane**: cosine over ``emb_col`` strictly above
      ``min_score`` (search_utils.py:58, DEFAULT_MIN_SCORE 0.6), top
      ``limit`` per query (RELEVANT_SCHEMA_LIMIT 10), ordered
      (score DESC, id);
    - **fulltext lane**: BM25 over ``text_col``, top ``limit`` per
      query. Faithful to the reference, the fulltext index is
      corpus-wide and the group filter applies AFTER scoring
      (search_utils.py:718-721 queries the global Lucene index, then
      ``WHERE m.group_id = $group_id``) — so idf/avgdl are corpus
      stats, not group stats.

    A candidate in both lanes surfaces once with lane='vector' (the
    reference keeps vector hits and appends only unseen fulltext hits,
    search_utils.py:724-728). Both lanes are scoped to the query's
    group. Returns (query_id, id, lane, score), score rounded to 6.

    ``queries``: a micro-batch DataFrame with (query_id, query_text,
    query_vec, <group_col>) — the reference's input is literally a
    driver-side ``list[EntityNode]`` (the batch being resolved), so the
    one bounded collect of (query_id, query_text, group) for the BM25
    term relation mirrors the input contract, not a scale compromise.

    Scale shape: ONE corpus scan per lane. The vector lane broadcasts
    the query batch and computes the dot JVM-side (zip_with/aggregate,
    no Python); the fulltext lane is bm25_score_many's single postings
    aggregation — pass a persisted SearchIndex ``postings`` frame and
    the scan prunes to the query terms' partitions.
    """
    from pyspark.sql import Window

    from ..functions.similarity import cosine
    from .search import bm25_score_many, build_postings

    spark = corpus.sparkSession
    rank_w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.col("id")
    )

    q = queries.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col(group_col).alias("_qg"),
        F.col("query_vec"),
    )
    vec = (
        corpus.join(F.broadcast(q), F.col(group_col) == F.col("_qg"))
        .withColumn(
            "score", F.round(cosine(F.col(emb_col), F.col("query_vec")), 6)
        )
        .where(F.col("score") > min_score)
        .select("query_id", F.col(id_col).cast("string").alias("id"), "score")
        .withColumn("rank", F.row_number().over(rank_w))
        .where(F.col("rank") <= limit)
        .select("query_id", "id", F.lit("vector").alias("lane"), "score")
    )

    qrows = queries.select("query_id", "query_text", group_col).collect()
    if postings is None:
        postings = build_postings(corpus, id_col, text_col)
    scored = bm25_score_many(
        postings, [(str(r["query_id"]), r["query_text"]) for r in qrows]
    )
    qg = spark.createDataFrame(
        [(str(r["query_id"]), r[group_col]) for r in qrows],
        f"query_id string, _qg string",
    )
    cg = corpus.select(
        F.col(id_col).cast("string").alias("id"), F.col(group_col).alias("_cg")
    )
    ft = (
        scored.join(F.broadcast(qg), "query_id")
        .join(cg, "id")
        .where(F.col("_cg") == F.col("_qg"))
        .select("query_id", "id", F.round("score", 6).alias("score"))
        .withColumn("rank", F.row_number().over(rank_w))
        .where(F.col("rank") <= limit)
        .select("query_id", "id", F.lit("fulltext").alias("lane"), "score")
    )
    ft_only = ft.join(
        vec.select("query_id", "id"), ["query_id", "id"], "left_anti"
    )
    return vec.unionByName(ft_only)
