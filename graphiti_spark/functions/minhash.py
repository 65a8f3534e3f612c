"""MinHash-LSH blocking as pure column expressions.

Replaces the reference's O(N²) pairwise-dot blocking
(graphiti_core/utils/bulk_utils.py:304-375, dot products at 317-321 —
quadratic in batch size) with banded MinHash over character shingles:
candidate pairs come only from shared (band_id, band_hash) buckets, so
pair generation is a self-equi-join that scales linearly with bucket
occupancy. Everything is JVM-side (`xxhash64`, `transform`,
`array_min`) — no Python in this stage at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NUM_HASHES = 48
BAND_SIZE = 2  # 24 bands of 2 → catches Jaccard ≳ 0.35 pairs w.h.p.
SHINGLE_K = 3


def shingles(col: Column, k: int = SHINGLE_K) -> Column:
    """Distinct lowercase character k-grams of ' '||col||' '."""
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(padded) - (k - 1), F.lit(1))),
            lambda i: padded.substr(i, F.lit(k)),
        )
    )


def _minhash(sh: Column, seed: int) -> Column:
    """Min over seeded xxhash64 of each shingle. The seed is mixed in by
    prefixing the shingle (the SQL surface of xxhash64 has a fixed
    seed)."""
    return F.array_min(
        F.transform(sh, lambda s: F.xxhash64(F.concat(F.lit(f"{seed}|"), s)))
    )


def band_keys(
    sh: Column | str, num_hashes: int = NUM_HASHES, band_size: int = BAND_SIZE
) -> Column:
    """array<struct<band:int, key:long>> — one LSH bucket key per band.

    IMPORTANT: built directly from the shingle column, NOT from an
    intermediate signature array — ``element_at(sig, i)`` would inline
    the whole num_hashes-element array expression once per reference
    (num_hashes² copies of the shingle subtree), which blows plan
    compilation up from milliseconds to minutes. This shape keeps it at
    num_hashes min-hash subtrees total.

    Pass the shingle column NAME (not a Column) on hot paths: the
    num_hashes-subtree expression is then rendered as ONE SQL string and
    parsed JVM-side in a single call. Building the identical tree
    through the Column API costs hundreds of py4j round-trips (~2.5 s of
    driver time per call — measured as the top fixed cost of the
    incremental micro-batch, where this runs per batch, not per job).
    The Column overload is kept for composed expressions."""
    n_bands = num_hashes // band_size
    if isinstance(sh, str):
        def mh(seed: int) -> str:
            return (
                f"array_min(transform({sh}, s -> xxhash64(concat('{seed}|', s))))"
            )

        bands = ", ".join(
            "named_struct('band', {b}, 'key', xxhash64({ms}))".format(
                b=b,
                ms=", ".join(
                    mh(b * band_size + j) for j in range(band_size)
                ),
            )
            for b in range(n_bands)
        )
        return F.expr(f"array({bands})")
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[_minhash(sh, b * band_size + j) for j in range(band_size)]
                ).alias("key"),
            )
            for b in range(n_bands)
        ]
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    partition_cols: list[str] | None = None,
    num_hashes: int = NUM_HASHES,
    band_size: int = BAND_SIZE,
    pre_shingled: bool = False,
    include_texts: bool = True,
) -> DataFrame:
    """Self-join on LSH buckets → distinct unordered candidate pairs.

    ``partition_cols`` (e.g. ['group_id']) are included in the bucket
    key so pairs never cross graph partitions. Output columns:
    partition_cols + (id_a, id_b, text_a, text_b) with id_a < id_b.

    ``pre_shingled``: ``text_col`` is already an array<string> shingle
    set — minhash it directly. For DOCUMENT near-dup the caller's word
    shingles are the right universe: hashing them costs one xxhash per
    word shingle, versus ~20× that for character trigrams of the joined
    string, and the banding probability is then calibrated against the
    exact word-shingle Jaccard the verify stage computes.
    ``include_texts``: skip the text re-join when the caller only needs
    (id_a, id_b) — Catalyst cannot eliminate the joins on its own.
    """
    parts = partition_cols or []
    sh = df.select(
        *parts,
        F.col(id_col).alias("_id"),
        (F.col(text_col) if pre_shingled else shingles(F.col(text_col))).alias(
            "_sh"
        ),
    )
    # id-only bucket rows: carrying the text through the band explode
    # would replicate every document's text n_bands times through the
    # self-join shuffle, and force the pair dedup into a SortAggregate
    # (string payload aggregates are not hash-aggregable). Texts
    # re-join by id onto the deduped pair set instead — both text
    # joins shuffle the lookup side on the same key, so the exchange
    # is reused.
    buckets = sh.select(
        *parts,
        "_id",
        F.explode(band_keys("_sh", num_hashes, band_size)).alias("bk"),
    ).select(*parts, "_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    # The self-join would compile + execute the bucket plan twice; the
    # bucket table is small (distinct keys only), so checkpoint it.
    buckets = buckets.localCheckpoint(eager=True)

    a = buckets.alias("a")
    b = buckets.alias("b")
    join_cond = (
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a._id") < F.col("b._id"))
    )
    for p in parts:
        join_cond = join_cond & (F.col(f"a.{p}") == F.col(f"b.{p}"))
    pairs = (
        a.join(b, join_cond)
        .select(
            *[F.col(f"a.{p}").alias(p) for p in parts],
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
        )
        .dropDuplicates(parts + ["id_a", "id_b"])
    )
    if not include_texts:
        return pairs
    texts = df.select(F.col(id_col).alias("_tid"), F.col(text_col).alias("_ttext"))
    return (
        pairs.join(texts.withColumnsRenamed({"_tid": "id_a", "_ttext": "text_a"}), "id_a")
        .join(texts.withColumnsRenamed({"_tid": "id_b", "_ttext": "text_b"}), "id_b")
        .select(*parts, "id_a", "id_b", "text_a", "text_b")
    )
