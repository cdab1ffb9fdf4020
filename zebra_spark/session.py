"""SparkSession factory.

Single place for engine configuration.  Scale posture: these configs are
tuned for the local[N] test harness; on a real cluster the same code runs
unchanged — AQE handles partition coalescing / skew-join splitting, and
shuffle partitions should be raised to ~2-3x total cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "zebra-spark", cpus: str | None = None) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "*")
    shuffle = os.environ.get("ZEBRA_SHUFFLE_PARTITIONS") or (
        "32" if cpus == "*" else str(max(8, int(cpus)))
    )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled",
                os.environ.get("ZEBRA_AQE", "true"))
        .config("spark.sql.codegen.wholeStage",
                os.environ.get("ZEBRA_CODEGEN", "true"))
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("ZEBRA_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # events.parquet stores TIMESTAMP(NANOS) which Spark rejects by
        # default; read as epoch-nanos long, io.load converts to us.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # zstd pages: the engine's storage-compression posture (plays the
        # reference's per-doc LZ4, better ratio at scale)
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
