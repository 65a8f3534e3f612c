"""O(batch) incremental corpus dedup against a persisted LSH band index.

The training-data twin of the entity-resolution band index
(operators/incremental.py): a crawl pipeline at 10^12-doc scale cannot
re-run corpus-wide near-dup detection for every arriving shard — each
batch must be deduped against the FULL historical corpus touching only
the rows the batch collides with. Same physical recipe, document
payload instead of entity names:

- ``doc_bands`` (kpart, band, key, doc_id): append-only MinHash band
  index over word shingles, hash-partitioned by (band, key) bucket,
  files key-sorted with a parquet bloom filter on ``key`` — a batch's
  band keys push down as one InSet and skip non-matching row groups
  (the parquet stand-in for Iceberg bloom-filter file skipping).
- ``doc_shingles`` (dpart, doc_id, sh): the verify payload, pulled only
  for collided doc_ids via dpart partition pruning + broadcast semi-join
  — never a corpus scan.

Keep rule (deterministic): verified pairs (exact word-shingle Jaccard ≥
threshold on LSH candidates only) form components over (batch ∪ matched
stored keepers); a component containing a stored keeper marks every
batch member a duplicate of the lexicographically-smallest stored
member; otherwise the lexicographically-smallest batch member is kept
and the rest point at it. Only KEPT docs are indexed — the standard
incremental-dedup contract (new docs dedup against keepers; a dropped
doc's future near-twins match its keeper through the shared content).
That makes batched processing approximate w.r.t. one-shot global
clustering exactly where near-dup transitivity is itself approximate —
pinned in tests/test_dedup_index.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.minhash import band_keys, lsh_candidate_pairs
from .docops import jaccard, word_shingles
from .incremental import BAND_INDEX_WRITE_OPTIONS, KEY_PUSHDOWN_CAP

DOC_BAND_KPARTS = 64
DOC_SHINGLE_DPARTS = 32


def _kpart(band, key):
    return F.pmod(F.xxhash64(band, key), F.lit(DOC_BAND_KPARTS)).cast("int")


def _dpart(doc_id):
    return F.pmod(F.xxhash64(doc_id), F.lit(DOC_SHINGLE_DPARTS)).cast("int")


class DedupIndex:
    """Persisted incremental near-dup index over a document corpus.

    ``io``: a TableIO rooted at the index directory. One ``merge()``
    call per arriving batch; reads nothing proportional to the corpus.
    """

    def __init__(self, io, threshold: float = 0.5, shingle_words: int = 3):
        self.io = io
        self.threshold = threshold
        self.shingle_words = shingle_words

    # -- helpers -----------------------------------------------------------

    def _shingled(self, batch: DataFrame) -> DataFrame:
        return batch.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            word_shingles(F.col("text"), self.shingle_words).alias("sh"),
        )

    def _band_rows(self, sh: DataFrame) -> DataFrame:
        return (
            sh.select("doc_id", F.explode(band_keys("sh")).alias("bk"))
            .select(
                "doc_id",
                F.col("bk.band").alias("band"),
                F.col("bk.key").alias("key"),
            )
            .withColumn("kpart", _kpart(F.col("band"), F.col("key")))
        )

    # -- the per-batch operation -------------------------------------------

    def merge(self, batch: DataFrame) -> DataFrame:
        """Dedup one batch against the index, then add its keepers.

        Returns (doc_id, dup_of, is_kept) for every batch doc:
        ``dup_of`` NULL iff kept. Work is O(batch + collided rows).
        """
        spark = batch.sparkSession
        sh_b = self._shingled(batch).localCheckpoint(eager=True)
        bands_b = self._band_rows(sh_b)

        have_index = self.io.exists("doc_bands")
        if have_index:
            # --- collided stored docs: kpart pruning + key InSet pushdown
            kp_rows = (
                bands_b.select("kpart", "key")
                .dropDuplicates()
                .limit(KEY_PUSHDOWN_CAP + 1)
                .collect()
            )
            capped = len(kp_rows) > KEY_PUSHDOWN_CAP
            stored = self.io.read("doc_bands")
            if capped:
                kparts = sorted(
                    {r.kpart for r in bands_b.select("kpart").distinct().collect()}
                )
            else:
                kparts = sorted({r.kpart for r in kp_rows})
            stored = stored.where(F.col("kpart").isin(kparts))
            if not capped:
                stored = stored.where(
                    F.col("key").isin(sorted({r.key for r in kp_rows}))
                )
            cross = (
                stored.join(
                    F.broadcast(
                        bands_b.select(
                            "band", "key", F.col("doc_id").alias("id_new")
                        ).dropDuplicates()
                    ),
                    ["band", "key"],
                )
                .select(F.col("doc_id").alias("id_old"), "id_new")
                .dropDuplicates()
                .localCheckpoint(eager=True)
            )
            # --- verify payload pull: dpart-pruned, semi-joined
            old_ids = cross.select(F.col("id_old").alias("doc_id")).dropDuplicates()
            dparts = sorted(
                {
                    r.p
                    for r in old_ids.select(
                        _dpart(F.col("doc_id")).alias("p")
                    )
                    .distinct()
                    .collect()
                }
            )
            if dparts:
                sh_old = (
                    self.io.read("doc_shingles")
                    .where(F.col("dpart").isin(dparts))
                    .join(F.broadcast(old_ids), "doc_id", "left_semi")
                    .select("doc_id", "sh")
                )
                pairs_cross = (
                    cross.join(
                        sh_b.select(
                            F.col("doc_id").alias("id_new"),
                            F.col("sh").alias("sh_new"),
                        ),
                        "id_new",
                    )
                    .join(
                        sh_old.select(
                            F.col("doc_id").alias("id_old"),
                            F.col("sh").alias("sh_old"),
                        ),
                        "id_old",
                    )
                    .where(
                        F.round(jaccard(F.col("sh_new"), F.col("sh_old")), 6)
                        >= self.threshold
                    )
                    .select("id_new", "id_old")
                )
            else:
                pairs_cross = cross.limit(0)
        else:
            pairs_cross = spark.createDataFrame(
                [], "id_old string, id_new string"
            )

        # --- intra-batch pairs (LSH blocking + exact verify)
        cand_new = lsh_candidate_pairs(
            sh_b,
            id_col="doc_id",
            text_col="sh",
            pre_shingled=True,
            include_texts=False,
        )
        pairs_new = (
            cand_new.join(
                sh_b.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")),
                "id_a",
            )
            .join(
                sh_b.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")),
                "id_b",
            )
            .where(
                F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6)
                >= self.threshold
            )
            .select("id_a", "id_b")
        )

        # --- components over (batch ∪ matched stored), stored anchors win
        from .resolve import connected_components

        all_pairs = pairs_new.unionByName(
            pairs_cross.select(
                F.col("id_new").alias("id_a"), F.col("id_old").alias("id_b")
            )
        ).localCheckpoint(eager=True)
        vertices = (
            all_pairs.select(F.col("id_a").alias("uuid"))
            .union(all_pairs.select("id_b"))
            .dropDuplicates()
        )
        comps = connected_components(vertices, all_pairs)
        stored_flag = pairs_cross.select(
            F.col("id_old").alias("uuid")
        ).dropDuplicates()
        flagged = comps.join(
            stored_flag.withColumn("_stored", F.lit(True)), "uuid", "left"
        ).withColumn("_stored", F.coalesce(F.col("_stored"), F.lit(False)))
        targets = flagged.groupBy("component").agg(
            F.min(F.when(F.col("_stored"), F.col("uuid"))).alias("_t_stored"),
            F.min(F.when(~F.col("_stored"), F.col("uuid"))).alias("_t_new"),
        ).withColumn("_target", F.coalesce("_t_stored", "_t_new"))
        decided = (
            flagged.where(~F.col("_stored"))
            .join(targets.select("component", "_target"), "component")
            .select(
                F.col("uuid").alias("doc_id"),
                F.when(F.col("uuid") != F.col("_target"), F.col("_target")).alias(
                    "dup_of"
                ),
            )
        )
        decisions = (
            sh_b.select("doc_id")
            .join(decided, "doc_id", "left")
            .select(
                "doc_id",
                "dup_of",
                F.col("dup_of").isNull().alias("is_kept"),
            )
            .localCheckpoint(eager=True)
        )

        # --- index the keepers (append-only, idempotent on doc_id)
        keepers = decisions.where("is_kept").select("doc_id")
        sh_keep = sh_b.join(F.broadcast(keepers), "doc_id", "left_semi")
        if have_index:
            # idempotence: a re-submitted batch must not double-index
            dparts_k = sorted(
                {
                    r.p
                    for r in keepers.select(_dpart(F.col("doc_id")).alias("p"))
                    .distinct()
                    .collect()
                }
            )
            if dparts_k:
                present = (
                    self.io.read("doc_shingles")
                    .where(F.col("dpart").isin(dparts_k))
                    .select("doc_id")
                )
                sh_keep = sh_keep.join(F.broadcast(present), "doc_id", "left_anti")
        sh_keep = sh_keep.localCheckpoint(eager=True)
        self.io.append(
            "doc_bands",
            self._band_rows(sh_keep)
            .repartition("kpart")
            .sortWithinPartitions("key"),
            partition_by=["kpart"],
            options=BAND_INDEX_WRITE_OPTIONS,
        )
        self.io.append(
            "doc_shingles",
            sh_keep.withColumn("dpart", _dpart(F.col("doc_id"))),
            partition_by=["dpart"],
        )
        return decisions

    def compact(self) -> None:
        """Rewrite the append-only band index to one key-sorted,
        bloom-filtered file per kpart bucket (same maintenance contract
        as incremental.compact_entity_bands / SearchIndex.compact)."""
        bands = (
            self.io.read("doc_bands")
            .repartition(DOC_BAND_KPARTS, "kpart")
            .sortWithinPartitions("key")
        )
        self.io.write(
            "doc_bands", bands, partition_by=["kpart"],
            options=BAND_INDEX_WRITE_OPTIONS,
        )
