"""Table loading.

All fixture tables are parquet; `spark.read.parquet` gives Catalyst
predicate pushdown + column pruning for free.  At 100 TB the same reads
work against a partitioned data lake path — nothing here assumes local
files beyond the path string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def ensure_session_confs(spark: SparkSession) -> None:
    """Engine-required runtime confs, applied defensively so queries are
    correct even on a caller-provided SparkSession (e.g. the driver's):
    UTC session time (oracle parity) and nanos-as-long parquet reads
    (events.ts is TIMESTAMP(NANOS), which Spark otherwise rejects)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ts is TIMESTAMP(NANOS) on disk, surfaced as epoch-nanos long via
        # spark.sql.legacy.parquet.nanosAsLong.  Truncate ns -> us with
        # integer division (epoch-ns ~1.7e18 overflows double precision,
        # so no float math) — matches DuckDB's ns -> us truncation.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def embeddings_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings with the vector cast to array<double>.

    All distance arithmetic is done in float64 so Spark and the DuckDB
    oracle (embedding::DOUBLE[]) accumulate identically; the source of
    truth stays float32 on disk, like the reference's `Embedding<N>`
    (reference src/lib.rs:16-48).
    """
    return load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb"), "label"
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
