"""SparkSession factory.

Defaults tuned for the sandbox (local[N], single JVM) but every knob is
what we would set on a 1000-executor cluster too: UTC session timezone
(reference normalizes all datetimes to UTC,
graphiti_core/utils/datetime_utils.py:20-42), Arrow transport for the
pandas-UDF extraction stage, AQE for runtime coalescing + skew-join
splitting.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "graphiti_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``cpus`` controls local parallelism (``local[cpus]``); defaults to
    ``$SPARK_GRAFT_CPUS`` or ``*``. Shuffle partitions default to the
    same number — on a real cluster you size this to cores×executors,
    and AQE coalesces small post-shuffle partitions either way.
    """
    if cpus is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        n_shuffle = int(env) if env else DEFAULT_SHUFFLE_PARTITIONS
    else:
        master = f"local[{cpus}]"
        n_shuffle = cpus
    if shuffle_partitions is not None:
        n_shuffle = shuffle_partitions

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
