"""TableIO — Iceberg-style persistence on plain parquet.

The reference persists via Cypher ``MERGE`` upserts keyed on uuid
(graphiti_core/models/nodes/node_db_queries.py:17-52,
models/edges/edge_db_queries.py:17-56). The Spark-native equivalent is
Iceberg ``MERGE INTO``; the iceberg-spark runtime jar is not available
offline in this sandbox, so this layer reproduces the same semantics
(idempotent keyed upsert, snapshot swap, partition layout) on parquet
directories behind one storage-agnostic interface — swap the
implementation for `spark.sql("MERGE INTO ...")` on a real cluster.

Also the home of the north-rule bookkeeping:
- ``lineage`` table: one row per (stage, partition key, row_count,
  content_hash) — resuming a stage anti-joins its input against
  completed lineage, making every stage restart idempotent.
- ``metrics`` table: per-stage row counts (the reference logs these ad
  hoc, graphiti_core/graphiti.py:651).
"""

from __future__ import annotations

import os
import shutil
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class TableIO:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        p = self.path(name)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") for f in os.listdir(p)
        ) or os.path.isfile(os.path.join(p, "_SUCCESS"))

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.path(name))

    def write(
        self, name: str, df: DataFrame, partition_by: list[str] | None = None
    ) -> None:
        """Snapshot-swap overwrite: write to a staging dir, then rename —
        readers never observe a half-written table (the parquet stand-in
        for an Iceberg snapshot commit)."""
        final = self.path(name)
        staging = final + ".staging-" + _uuid.uuid4().hex[:8]
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(staging)
        old = final + ".old-" + _uuid.uuid4().hex[:8]
        if os.path.exists(final):
            os.rename(final, old)
        os.rename(staging, final)
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)

    def merge_upsert(self, name: str, updates: DataFrame, key_cols: list[str]) -> None:
        """MERGE INTO … WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT:
        updates win on key collision; all other existing rows survive."""
        if not self.exists(name):
            self.write(name, updates)
            return
        existing = self.read(name)
        kept = existing.join(
            F.broadcast(updates.select(*key_cols).dropDuplicates(key_cols))
            if len(key_cols) <= 2
            else updates.select(*key_cols).dropDuplicates(key_cols),
            key_cols,
            "left_anti",
        )
        self.write(name, kept.unionByName(updates, allowMissingColumns=True))

    def delete_where(self, name: str, condition) -> None:
        """MERGE ... WHEN MATCHED THEN DELETE equivalent (S8)."""
        self.write(name, self.read(name).where(~condition))

    # ------------------------------------------------------------------
    # lineage + metrics (north rule: per-partition lineage & counts)
    # ------------------------------------------------------------------

    def record_lineage(self, stage: str, df: DataFrame, partition_col: str) -> DataFrame:
        """Aggregate per-partition row counts + order-insensitive content
        hash for ``stage``; append to the lineage table and return the
        summary. The hash is xor-of-row-hashes (commutative), computed
        JVM-side."""
        hashed = df.withColumn("_h", F.xxhash64(*[F.col(c) for c in df.columns]))
        summary = hashed.groupBy(F.col(partition_col).alias("part")).agg(
            F.count(F.lit(1)).alias("row_count"),
            F.expr("bit_xor(_h)").alias("content_hash"),  # xor: commutative, no overflow
        ).withColumn("stage", F.lit(stage))
        if self.exists("lineage"):
            # merge per (stage, part): a resume run records only ITS
            # partitions — prior completions for the same stage must
            # survive or a later resume would reprocess them.
            prior = self.read("lineage").join(
                summary.select(F.lit(stage).alias("stage"), "part"),
                ["stage", "part"],
                "left_anti",
            )
            self.write("lineage", prior.unionByName(summary))
        else:
            self.write("lineage", summary)
        return summary

    def completed_parts(self, stage: str) -> DataFrame | None:
        if not self.exists("lineage"):
            return None
        return self.read("lineage").where(F.col("stage") == stage).select("part")

    def resume_filter(self, stage: str, df: DataFrame, partition_col: str) -> DataFrame:
        """Idempotent resume: drop input partitions whose lineage rows
        already exist for ``stage`` (anti-join on the partition key)."""
        done = self.completed_parts(stage)
        if done is None:
            return df
        return df.join(
            F.broadcast(done.withColumnRenamed("part", partition_col)),
            partition_col,
            "left_anti",
        )

    def record_metric(self, stage: str, metric: str, value: float) -> None:
        row = self.spark.createDataFrame(
            [(stage, metric, float(value))], "stage string, metric string, value double"
        )
        if self.exists("metrics"):
            self.write("metrics", self.read("metrics").unionByName(row))
        else:
            self.write("metrics", row)
