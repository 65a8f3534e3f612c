"""Graph-ML training-data export over the canonical entity graph.

The reference stops at a queryable graph; a training-data pipeline
also has to hand that graph to a GNN / link-prediction trainer, which
wants (a) contiguous integer node ids per graph, (b) an edge index in
those ids with a dense relation vocabulary, (c) deterministic negative
samples filtered against true edges, and (d) a temporal train/valid/
test split that respects event time and flags inductive (unseen-
endpoint) evaluation edges. Each is a pure DataFrame derivation over
the pipeline's (nodes, edges) outputs, exact enough to hash-match a
DuckDB oracle (`oracle_ops.q_gnn_*`).

Scale shapes (100 TB corpus → entity graph orders of magnitude
smaller, but still potentially billions of nodes):

- ``node_index``: one rank window per group over the ENTITY set (not
  the corpus). Contiguity inherently serializes a group's id space;
  at extreme per-group cardinality swap the rank for the two-pass
  per-partition-offset scheme (count per partition → running offset),
  which trades the sort for two bounded passes — the window form is
  kept because it is deterministic and oracle-checkable.
- ``edge_index``: two hash joins on (group_id, name) — AQE broadcasts
  the index side when a tenant's entity set is small; the relation
  vocabulary is a distinct over predicates (tiny, broadcast).
- ``negative_edges``: md5-ranked corruption — no RNG state, so any
  shard of a 100 TB export re-draws identical negatives (the
  `mixture_sample` resumability property). One join against the node
  index on the derived rank + one left-anti join against true edges;
  never a cross join.
- ``temporal_edge_split``: pure column split + two left joins against
  the train-endpoint set (itself a distinct over train edges).

Reference parity anchor: the exported edges are exactly the emitted
EntityEdge set (graphiti_core/edges.py EntityEdge; driver oracle
`edges_resolved`), so P/R of the export inherits the extraction gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphiti_spark.operators.docops import _md5_u32

__all__ = [
    "node_index",
    "edge_index",
    "negative_edges",
    "temporal_edge_split",
    "random_walks",
    "skipgram_pairs",
    "biased_walks",
    "ranking_metrics",
    "sampled_neighborhood",
]


def node_index(
    nodes: DataFrame, strategy: str = "window", n_parts: int | None = None
) -> DataFrame:
    """(group_id, name, node_idx) — contiguous 0-based node ids per
    group, ordered by name (the only deterministic total order the
    canonical node set carries everywhere).

    ``strategy="window"`` (default): one ``row_number`` window per
    group — simple and oracle-checkable, but each tenant's full entity
    set funnels through ONE task (fine while entity vocab ≪ corpus).

    ``strategy="offset"``: the two-pass per-bucket-offset scheme for
    billion-entity tenants. Pass 0 derives up to ``n_parts - 1``
    GLOBAL name-range boundaries from a deterministic md5-ranked name
    sample (a distributed top-k — TakeOrderedAndProject, never a full
    sort) and assigns each row an order-preserving bucket by
    broadcast-comparing against those boundary literals. Because the
    boundaries are literals fixed in the plan and the bucket is a pure
    function of the name, EVERY recomputation — task retry, executor
    loss, lineage replay — reproduces the identical layout (a
    spark_partition_id()-based scheme would not survive that: range
    re-sampling can move rows between physical partitions after the
    counts were collected, silently corrupting ids; nothing needs
    persist() here). Pass 1 collects the bounded (bucket x group)
    count matrix (n_parts x n_groups rows — driver-side by
    construction, never O(rows)) and prefix-sums per-(group, bucket)
    starting offsets, exploiting that every name in bucket i sorts
    before every name in bucket j>i. Pass 2 broadcast-joins the
    offsets back and ranks WITHIN (bucket, group) — parallelism is
    n_parts x n_groups instead of n_groups, and no single-partition
    per-group sort appears in the plan (pinned by
    tests/test_gnn.py::test_node_index_offset_strategy). Output is
    byte-equal to the window form by construction: offset + local
    rank is exactly the global per-group rank. Boundary skew bound:
    the sample is the ``64 * n_parts`` md5-smallest names (uniform
    over the vocabulary), so expected bucket size is within a small
    factor of n/n_parts.
    """
    base = nodes.select("group_id", "name").distinct()
    if strategy == "window":
        w = Window.partitionBy("group_id").orderBy("name")
        return base.select(
            "group_id",
            "name",
            (F.row_number().over(w) - 1).cast("long").alias("node_idx"),
        )
    if strategy != "offset":
        raise ValueError(f"strategy must be window|offset, got {strategy!r}")
    spark = nodes.sparkSession
    if n_parts is None:
        n_parts = spark.sparkContext.defaultParallelism
    samp = [
        r.name
        for r in base.select("name")
        .distinct()
        .orderBy(
            _md5_u32(F.concat_ws("|", F.lit("nb"), F.col("name"))), "name"
        )
        .limit(64 * n_parts)
        .collect()
    ]
    samp.sort()
    step = max(1, len(samp) // n_parts)
    bounds = sorted(set(samp[step::step]))[: n_parts - 1]
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(F.col("name") > F.lit(b), 1).otherwise(0)
    bucketed = base.withColumn("_bkt", bucket.cast("int"))
    counts = bucketed.groupBy("_bkt", "group_id").count().collect()
    offs, running = [], {}
    for r in sorted(counts, key=lambda r: (r["group_id"], r["_bkt"])):
        offs.append((r["group_id"], r["_bkt"], running.get(r["group_id"], 0)))
        running[r["group_id"]] = running.get(r["group_id"], 0) + r["count"]
    off_df = spark.createDataFrame(
        offs, "group_id string, _bkt int, _off long"
    )
    lw = Window.partitionBy("_bkt", "group_id").orderBy("name")
    return (
        bucketed.join(F.broadcast(off_df), ["group_id", "_bkt"])
        .select(
            "group_id",
            "name",
            (F.col("_off") + F.row_number().over(lw) - 1)
            .cast("long")
            .alias("node_idx"),
        )
    )


def relation_index(edges: DataFrame) -> DataFrame:
    """(predicate, rel_idx) — dense global relation vocabulary, ordered
    by predicate name. Tiny (the predicate space), broadcast by AQE."""
    w = Window.orderBy("predicate")
    return (
        edges.select("predicate")
        .distinct()
        .select(
            "predicate", (F.row_number().over(w) - 1).cast("long").alias("rel_idx")
        )
    )


def edge_index(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """(group_id, src_idx, rel_idx, dst_idx, subj_name, predicate,
    obj_name) — the canonical directed edge set mapped into contiguous
    node ids + a dense relation vocabulary: the COO edge index a GNN
    trainer loads directly.

    Distinct (group, subj, pred, obj) triples only — parallel temporal
    assertions collapse to one structural edge (the trainer's graph),
    the bi-temporal detail stays in the ledger.
    """
    idx = node_index(nodes)
    rel = relation_index(edges)
    e = edges.select("group_id", "subj_name", "predicate", "obj_name").distinct()
    return (
        e.join(
            idx.select(
                "group_id",
                F.col("name").alias("subj_name"),
                F.col("node_idx").alias("src_idx"),
            ),
            ["group_id", "subj_name"],
        )
        .join(
            idx.select(
                "group_id",
                F.col("name").alias("obj_name"),
                F.col("node_idx").alias("dst_idx"),
            ),
            ["group_id", "obj_name"],
        )
        .join(rel, "predicate")
        .select(
            "group_id", "src_idx", "rel_idx", "dst_idx",
            "subj_name", "predicate", "obj_name",
        )
    )


def negative_edges(nodes: DataFrame, edges: DataFrame, n_neg: int = 3) -> DataFrame:
    """(group_id, src_name, j, neg_name, neg_idx) — deterministic
    negative samples for link-prediction training: for each distinct
    directed positive pair and draw j, corrupt the destination to the
    node ranked ``md5_u32('neg|' g '|' src '|' dst '|' j) % n_group``
    in the group's node index, then drop draws that hit the source,
    the true destination, or ANY true edge of that source (left-anti
    against the positive pair set — the standard "filtered" negative
    protocol).

    Draw count per positive is at most ``n_neg`` (collisions are
    dropped, not redrawn — redrawing would need data-dependent
    iteration; at KG densities the drop rate is ≈ (deg(src)+2)/n_group
    and the oracle reproduces it exactly).
    """
    idx = node_index(nodes)
    ng = idx.groupBy("group_id").agg(F.max("node_idx").alias("max_idx"))
    pos = edges.select(
        "group_id",
        F.col("subj_name").alias("src_name"),
        F.col("obj_name").alias("dst_name"),
    ).distinct()
    draws = (
        pos.join(ng, "group_id")
        .select(
            "group_id",
            "src_name",
            "dst_name",
            "max_idx",
            F.explode(F.sequence(F.lit(0), F.lit(n_neg - 1))).alias("j"),
        )
        .select(
            "group_id",
            "src_name",
            "dst_name",
            "j",
            (
                _md5_u32(
                    F.concat_ws(
                        "|",
                        F.lit("neg"),
                        F.col("group_id"),
                        F.col("src_name"),
                        F.col("dst_name"),
                        F.col("j").cast("string"),
                    )
                )
                % (F.col("max_idx") + 1)
            ).alias("neg_idx"),
        )
    )
    cand = draws.join(
        idx.select(
            "group_id",
            F.col("node_idx").alias("neg_idx"),
            F.col("name").alias("neg_name"),
        ),
        ["group_id", "neg_idx"],
    ).where(
        (F.col("neg_name") != F.col("src_name"))
        & (F.col("neg_name") != F.col("dst_name"))
    )
    filtered = cand.join(
        pos.select(
            "group_id",
            "src_name",
            F.col("dst_name").alias("neg_name"),
        ),
        ["group_id", "src_name", "neg_name"],
        "left_anti",
    )
    return filtered.select(
        "group_id", "src_name", "dst_name", "j", "neg_name", "neg_idx"
    )


def temporal_edge_split(
    edges: DataFrame,
    train_end: str,
    valid_end: str,
) -> DataFrame:
    """(group_id, subj_name, predicate, obj_name, valid_at, split,
    src_unseen, dst_unseen) — event-time train/valid/test split of the
    distinct temporal assertions, the temporal-KG evaluation protocol:
    everything asserted before ``train_end`` trains; [train_end,
    valid_end) validates; the rest tests. NULL ``valid_at`` (facts
    with no extractable event time) goes to train — they're visible
    at ingest, hiding them would leak nothing and starve training.

    ``src_unseen`` / ``dst_unseen`` flag endpoints that appear in NO
    train edge — the inductive subset a transductive model must be
    filtered on (scored separately, never silently mixed).
    """
    e = edges.select(
        "group_id", "subj_name", "predicate", "obj_name", "valid_at"
    ).distinct()
    te, ve = F.lit(train_end).cast("timestamp"), F.lit(valid_end).cast("timestamp")
    e = e.withColumn(
        "split",
        F.when(F.col("valid_at").isNull() | (F.col("valid_at") < te), "train")
        .when(F.col("valid_at") < ve, "valid")
        .otherwise("test"),
    )
    tn = (
        e.where(F.col("split") == "train")
        .select("group_id", F.col("subj_name").alias("name"))
        .union(
            e.where(F.col("split") == "train").select(
                "group_id", F.col("obj_name").alias("name")
            )
        )
        .distinct()
        .withColumn("seen", F.lit(True))
    )
    out = (
        e.join(
            tn.select(
                "group_id", F.col("name").alias("subj_name"),
                F.col("seen").alias("s_seen"),
            ),
            ["group_id", "subj_name"],
            "left",
        )
        .join(
            tn.select(
                "group_id", F.col("name").alias("obj_name"),
                F.col("seen").alias("o_seen"),
            ),
            ["group_id", "obj_name"],
            "left",
        )
        .select(
            "group_id", "subj_name", "predicate", "obj_name", "valid_at", "split",
            ((F.col("split") != "train") & F.col("s_seen").isNull()).alias(
                "src_unseen"
            ),
            ((F.col("split") != "train") & F.col("o_seen").isNull()).alias(
                "dst_unseen"
            ),
        )
    )
    return out


def _undirected_neighbors(edges: DataFrame) -> DataFrame:
    """(group_id, src, dst, rk, deg) — the canonical undirected
    adjacency with a deterministic per-source neighbor rank (ordered
    by name) and the source degree. The indexable form a
    deterministic walk needs: "neighbor #r of v" is well-defined and
    engine-independent."""
    e = edges.select(
        "group_id",
        F.col("subj_name").alias("a"),
        F.col("obj_name").alias("b"),
    ).where(F.col("a") != F.col("b"))
    und = (
        e.select("group_id", F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(
            e.select("group_id", F.col("b").alias("src"), F.col("a").alias("dst"))
        )
        .distinct()
    )
    w = Window.partitionBy("group_id", "src").orderBy("dst")
    return und.select(
        "group_id",
        "src",
        "dst",
        (F.row_number().over(w) - 1).cast("long").alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("group_id", "src"))
        .cast("long")
        .alias("deg"),
    )


def _walk_starts(deg: DataFrame, n_walks: int) -> DataFrame:
    """(group_id, start, walk, cur=start) — n_walks walk slots per
    start node. n_walks < 1 raises: F.sequence(0, n_walks-1) would
    DESCEND for negative bounds (Spark semantics), silently emitting
    walks the DuckDB oracle's generate_series would not."""
    if n_walks < 1:
        raise ValueError(f"n_walks must be >= 1, got {n_walks}")
    return deg.select(
        "group_id",
        F.col("src").alias("start"),
        F.explode(F.sequence(F.lit(0), F.lit(n_walks - 1))).alias("walk"),
    ).select("group_id", "start", "walk", F.col("start").alias("cur"))


def _uniform_step(
    frontier: DataFrame, nbr: DataFrame, deg: DataFrame, salt: str, t: int
) -> DataFrame:
    """One uniform walk step shared by random_walks and biased_walks'
    first hop: md5('<salt>|' g '|' start '|' walk '|' t) mod
    deg(cur) picks the ranked neighbor. Returns (group_id, start,
    walk, prev, cur)."""
    r = (
        _md5_u32(
            F.concat_ws(
                "|",
                F.lit(salt),
                F.col("group_id"),
                F.col("start"),
                F.col("walk").cast("string"),
                F.lit(str(t)),
            )
        )
        % F.col("deg")
    )
    return (
        frontier.join(
            deg.select("group_id", F.col("src").alias("cur"), "deg"),
            ["group_id", "cur"],
        )
        .withColumn("_r", r)
        .join(
            nbr.select(
                "group_id", F.col("src").alias("cur"),
                F.col("rk").alias("_r"), "dst",
            ),
            ["group_id", "cur", "_r"],
        )
        .select(
            "group_id", "start", "walk",
            F.col("cur").alias("prev"), F.col("dst").alias("cur"),
        )
    )


def _assemble_walks(steps: list[DataFrame]) -> DataFrame:
    """Union per-step (group_id, start, walk, step, name) frames into
    the walk-corpus output shape."""
    res = steps[0]
    for df in steps[1:]:
        res = res.unionByName(df)
    return res.select(
        "group_id", "start", F.col("walk").cast("int").alias("walk"),
        F.col("step").cast("int").alias("step"), "name",
    )


def _step_rows(frame: DataFrame, t: int) -> DataFrame:
    return frame.select(
        "group_id", "start", "walk",
        F.lit(t).alias("step"), F.col("cur").alias("name"),
    )


def random_walks(
    edges: DataFrame,
    walk_len: int = 4,
    n_walks: int = 2,
) -> DataFrame:
    """(group_id, start, walk, step, name) — DeepWalk-style uniform
    random walks (Perozzi et al. 2014, arXiv:1403.6652) over the
    undirected canonical graph, ``n_walks`` per start node of length
    ``walk_len`` — except that every "random" step is derived from
    md5('walk|' group '|' start '|' walk '|' step) mod deg(current),
    so the whole corpus of walks is reproducible across runs,
    partitionings, and engines (the DuckDB oracle replays every step
    bit-for-bit), and resuming a 100 TB walk job re-draws identical
    walks. Start nodes are those with ≥ 1 neighbor (an isolated node
    has no walk); every reached node has degree ≥ 1 on the undirected
    graph, so started walks always run to full length.

    Scale shape: one join against the ranked adjacency per step (the
    iterative hash-join propagation shape of pagerank/LPA — cut
    lineage every few steps with localCheckpoint for long walks); the
    adjacency is built once with two windows over the edge set.
    """
    nbr = _undirected_neighbors(edges)
    deg = nbr.select("group_id", "src", "deg").distinct()
    frontier = _walk_starts(deg, n_walks)
    out = [_step_rows(frontier, 0)]
    for t in range(1, walk_len + 1):
        frontier = _uniform_step(frontier, nbr, deg, "walk", t)
        out.append(_step_rows(frontier, t))
    return _assemble_walks(out)


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """(group_id, center, context, n_pairs) — skip-gram co-occurrence
    counts from the walk corpus (the node2vec/DeepWalk training-pair
    extraction): every (center, context) node pair whose steps lie
    within ``window`` of each other on the same walk, aggregated to
    counts (what a downstream embedding trainer consumes).

    One self-join per walk keyed on (group, start, walk) with a step
    band predicate, then a partial-aggregated count — the join key
    includes the walk id, so it never crosses walks.
    """
    a = walks.select(
        "group_id", "start", "walk",
        F.col("step").alias("s1"), F.col("name").alias("center"),
    )
    b = walks.select(
        "group_id", "start", "walk",
        F.col("step").alias("s2"), F.col("name").alias("context"),
    )
    pairs = a.join(b, ["group_id", "start", "walk"]).where(
        (F.col("s1") != F.col("s2"))
        & (F.abs(F.col("s1") - F.col("s2")) <= window)
    )
    return pairs.groupBy("group_id", "center", "context").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )


def capped_neighbors(nbr: DataFrame, max_deg: int) -> DataFrame:
    """(group_id, src, dst, rk) — the biased-step candidate adjacency
    with hub degrees capped at ``max_deg``. Sources at or below the
    cap keep their full neighbor list and original rank untouched
    (byte-identical to the uncapped adjacency), so the cap is a no-op
    on graphs with no hub. Sources above the cap keep a deterministic
    md5-sampled subset: neighbors re-ranked by
    md5('cap|' g '|' src '|' dst) (dst tie-break), first ``max_deg``
    kept — an unbiased sample that any engine (and the DuckDB oracle)
    replays exactly. The re-rank window costs one pass over deg(hub)
    rows ONCE per job, not per walk-step — the whole point.
    """
    keep = nbr.where(F.col("deg") <= max_deg).select(
        "group_id", "src", "dst", "rk"
    )
    hw = Window.partitionBy("group_id", "src").orderBy("hrk", "dst")
    hubs = (
        nbr.where(F.col("deg") > max_deg)
        .withColumn(
            "hrk",
            _md5_u32(
                F.concat_ws(
                    "|", F.lit("cap"), F.col("group_id"),
                    F.col("src"), F.col("dst"),
                )
            ),
        )
        .withColumn("crk", (F.row_number().over(hw) - 1).cast("long"))
        .where(F.col("crk") < max_deg)
        .select("group_id", "src", "dst", F.col("crk").alias("rk"))
    )
    return keep.unionByName(hubs)


def biased_walks(
    edges: DataFrame,
    walk_len: int = 3,
    n_walks: int = 1,
    w_return: int = 1,
    w_near: int = 4,
    w_far: int = 1,
    max_deg: int | None = 64,
) -> DataFrame:
    """(group_id, start, walk, step, name) — node2vec second-order
    biased walks (Grover & Leskovec 2016, arXiv:1607.00653) with
    INTEGER edge weights replacing the 1/p, 1, 1/q return/BFS/DFS
    bias (w_return : w_near : w_far ≡ 1/p : 1 : 1/q scaled to
    integers), so the cumulative-weight draw — md5-derived mod the
    total neighbor weight — is exact and the DuckDB oracle replays
    every step bit-for-bit. Step 1 is uniform (no previous node).

    Scale shape: each biased step scans the CURRENT node's neighbor
    list (one join on cur + a per-walk cumulative window + one
    membership equi-join against the adjacency for the
    "neighbor-of-previous" test — the equi-join never fans out), so a
    step costs O(Σ min(deg(cur), max_deg)) rows. **Hub safety**
    (output contract): ``max_deg`` (default 64) caps the candidate
    list of any node whose degree exceeds it to a deterministic
    md5-sampled subset built ONCE via :func:`capped_neighbors` — a
    walk sitting on a 10⁶-degree celebrity entity fans max_deg rows
    per step, not deg. Nodes at or below the cap are byte-identical
    to the exact uncapped walk, so on hub-free graphs the cap is
    invisible; ``max_deg=None`` opts into the exact O(deg) form.
    Step 1's uniform pick and the w_near membership test always use
    the FULL adjacency (both are O(1)-per-walk equi-joins — no fanout
    to cap). The DuckDB oracle (oracle_ops.q_biased_walks) composes
    the identical cap, so capped walks stay fully value-oracled.
    """
    nbr = _undirected_neighbors(edges)
    deg = nbr.select("group_id", "src", "deg").distinct()
    starts = _walk_starts(deg, n_walks)
    out = [_step_rows(starts, 0)]
    # step 1: uniform rank pick (same mechanics as random_walks, its
    # own salt) — shared via _uniform_step
    frontier = _uniform_step(starts, nbr, deg, "n2v", 1)
    out.append(_step_rows(frontier, 1))
    adj = nbr.select(
        "group_id", F.col("src").alias("x"), F.col("dst").alias("p"),
        F.lit(True).alias("near"),
    )
    if max_deg is not None:
        if max_deg < 1:
            raise ValueError(f"max_deg must be >= 1 or None, got {max_deg}")
        nbr = capped_neighbors(nbr, max_deg)
    for t in range(2, walk_len + 1):
        cand = frontier.join(
            nbr.select("group_id", F.col("src").alias("cur"), "rk", "dst"),
            ["group_id", "cur"],
        ).join(
            adj.select(
                "group_id", F.col("x").alias("dst"), F.col("p").alias("prev"),
                "near",
            ),
            ["group_id", "dst", "prev"],
            "left",
        ).select(
            "group_id", "start", "walk", "prev", "cur", "rk", "dst",
            F.when(F.col("dst") == F.col("prev"), F.lit(w_return))
            .when(F.col("near"), F.lit(w_near))
            .otherwise(F.lit(w_far))
            .cast("long")
            .alias("w"),
        )
        wpart = Window.partitionBy("group_id", "start", "walk")
        worder = wpart.orderBy("rk")
        cum = F.sum("w").over(
            worder.rowsBetween(Window.unboundedPreceding, 0)
        )
        total = F.sum("w").over(wpart)
        r = (
            _md5_u32(
                F.concat_ws(
                    "|", F.lit("n2v"), F.col("group_id"), F.col("start"),
                    F.col("walk").cast("string"), F.lit(str(t)),
                )
            )
            % total
        )
        frontier = (
            cand.withColumn("_cum", cum)
            .withColumn("_r", r)
            .where((F.col("_cum") - F.col("w") <= F.col("_r")) & (F.col("_r") < F.col("_cum")))
            .select(
                "group_id", "start", "walk",
                F.col("cur").alias("prev"), F.col("dst").alias("cur"),
            )
        )
        out.append(_step_rows(frontier, t))
    return _assemble_walks(out)


def ranking_metrics(
    candidates: DataFrame,
    test: DataFrame,
    k: int = 10,
) -> DataFrame:
    """(group_id, n_test, n_ranked, mrr_micro, hits_at_k) — filtered
    ranking evaluation for link prediction: each test edge's true
    destination is ranked within its source's scored candidate list
    (score DESC, name ASC on ties — total order), then aggregated to
    mean reciprocal rank (integer micro-units, floor(1e6/rank)
    averaged with floor division) and Hits@k. Test edges whose
    destination is absent from the candidate list are counted in
    ``n_test`` but not ranked (``n_ranked`` discloses coverage — the
    honest number; silently scoring them rank-∞ or dropping them
    silently both misreport).

    ``candidates``: (group_id, src, dst, score) with integer scores
    (e.g. link_prediction_ra's ra_micro); ``test``: (group_id, src,
    dst) held-out true edges (e.g. temporal_edge_split's test rows).

    Scale shape: one join to fetch the true score + one
    (test × per-src candidates) join bounded by the top-k candidate
    list length, then partial-agg counts — never corpus × corpus.
    """
    c = candidates.select(
        "group_id", "src", F.col("dst").alias("cand"), F.col("score").cast("long")
    )
    t = test.select("group_id", "src", "dst").distinct()
    truth = t.join(
        c.select(
            "group_id", "src", F.col("cand").alias("dst"),
            F.col("score").alias("s_true"),
        ),
        ["group_id", "src", "dst"],
    )
    pairs = truth.join(c, ["group_id", "src"])
    better = (
        (F.col("score") > F.col("s_true"))
        | ((F.col("score") == F.col("s_true")) & (F.col("cand") < F.col("dst")))
    )
    ranks = pairs.groupBy("group_id", "src", "dst").agg(
        (F.sum(F.when(better, 1).otherwise(0)) + 1).cast("long").alias("rank")
    )
    per_group = ranks.groupBy("group_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_ranked"),
        F.sum(F.expr("1000000 DIV rank")).cast("long").alias("_rr_sum"),
        F.sum(F.when(F.col("rank") <= k, 1).otherwise(0))
        .cast("long")
        .alias("hits_at_k"),
    )
    totals = t.groupBy("group_id").agg(F.count(F.lit(1)).cast("long").alias("n_test"))
    return (
        totals.join(per_group, "group_id", "left")
        .select(
            "group_id",
            "n_test",
            F.coalesce("n_ranked", F.lit(0)).alias("n_ranked"),
            F.coalesce(
                F.expr("_rr_sum DIV n_ranked"), F.lit(0)
            ).cast("long").alias("mrr_micro"),
            F.coalesce("hits_at_k", F.lit(0)).alias("hits_at_k"),
        )
    )


def sampled_neighborhood(
    edges: DataFrame,
    seeds: DataFrame,
    fanouts: tuple[int, ...] | list[int] = (3, 2),
) -> DataFrame:
    """(group_id, seed, hop, src, dst) — GraphSAGE-style fanout-
    sampled k-hop neighborhoods (Hamilton et al. 2017,
    arXiv:1706.02216): per seed, hop h keeps at most ``fanouts[h-1]``
    neighbors of each frontier node, chosen as the smallest
    md5('sage|' group '|' seed '|' hop '|' src '|' dst) — a uniform
    without-replacement draw that is reproducible across runs,
    partitionings, and engines, so a 100 TB mini-batch epoch re-draws
    identical subgraphs and the DuckDB oracle replays every hop.

    Scale shape: each hop is one join frontier⋈adjacency followed by
    a per-(seed, src) rank that compiles to WindowGroupLimit — a hub
    on the frontier forwards ``fanout`` rows per task, not its full
    degree; the frontier for the next hop is the distinct sampled
    destination set. This bounded fanout is exactly why SAGE sampling
    exists — the full k-hop neighborhood of a hub would be the whole
    graph.
    """
    if not fanouts:
        raise ValueError("fanouts must be non-empty")
    nbr = _undirected_neighbors(edges).select("group_id", "src", "dst")
    frontier = seeds.select(
        "group_id", F.col("name").alias("seed"), F.col("name").alias("src")
    ).distinct()
    out = []
    for hop, s in enumerate(fanouts, 1):
        cand = frontier.join(nbr, ["group_id", "src"])
        h = _md5_u32(
            F.concat_ws(
                "|", F.lit("sage"), F.col("group_id"), F.col("seed"),
                F.lit(str(hop)), F.col("src"), F.col("dst"),
            )
        )
        w = Window.partitionBy("group_id", "seed", "src").orderBy(
            h.asc(), "dst"
        )
        samp = (
            cand.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= s)
            .select(
                "group_id", "seed", F.lit(hop).alias("hop"), "src", "dst"
            )
        )
        out.append(samp)
        frontier = samp.select(
            "group_id", "seed", F.col("dst").alias("src")
        ).distinct()
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res.select(
        "group_id", "seed", F.col("hop").cast("int").alias("hop"), "src", "dst"
    )
