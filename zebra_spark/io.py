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
        # ts is TIMESTAMP(NANOS) on disk, surfaced as epoch-nanos long
        # via spark.sql.legacy.parquet.nanosAsLong.  Truncate ns -> us
        # with integer division (epoch-ns ~1.7e18 overflows double
        # precision, so no float math) — matches DuckDB's ns -> us
        # truncation.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Normalize EVERY remaining TIMESTAMP_NTZ column to the instant type.
    # The fixtures regenerated between rounds as timestamp[us] without
    # UTC adjustment (Spark TIMESTAMP_NTZ), which unix_micros / window()
    # / session_window reject at analysis time (the r3 regression).
    # Session TZ is UTC (ensure_session_confs), so the cast preserves
    # wall-clock values exactly and keeps DuckDB epoch_us parity; the
    # engine then presents ONE timestamp semantics everywhere.
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def spread_scan(df: DataFrame, *cols: str) -> DataFrame:
    """Parallelism floor for a CORPUS-scale scan feeding a per-row
    fan-out kernel (r17 optimization pass, guide §2.5 input skew / §6
    input split size): a fixture-sized parquet table is one row group
    = ONE scan task, so a broadcast crossJoin over it ran
    single-threaded on a 32-core session (measured: the knn scoring
    stage used 1 of 32 cores).  Hash-repartition by `cols`
    (deterministic, never round-robin) to defaultParallelism before
    the fan-out.

    Apply ONLY where the input is the corpus side of a broadcast
    fan-out (kNN scoring, full-corpus seed assignment, label
    propagation): there the narrow-row shuffle this adds is negligible
    against the fan-out compute it parallelizes — and it also evens
    out input-order skew — at any scale.  Do NOT apply to batch-sized
    frames (ingest deltas, drift gates): for them the extra exchange
    is pure overhead (measured: the tick's drift gate tripled when
    this was applied indiscriminately; an earlier plan-time
    `.rdd.getNumPartitions()` probe variant cost ~0.3-1 s of driver
    planning per call and was dropped for the same reason)."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *[F.col(c) for c in cols])


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


# --- generic source/sink formats --------------------------------------------
#
# Parquet is the native format (pushdown + pruning + page compression);
# these adapters let the same tables round-trip through the other
# formats a data lake grows: CSV/JSON for interchange (schema carried
# explicitly — both are schema-less on disk), ORC as the columnar
# alternative.  Timestamp columns are emitted as ISO strings in
# CSV/JSON (both engines' parsers disagree on bare timestamp syntax
# otherwise) and restored via the supplied schema.

FORMATS = ("parquet", "orc", "json", "csv")


def write_table(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; pick one of {FORMATS}")
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w = w.option("header", "true").option("timestampFormat",
                                              "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    if fmt == "json":
        w = w.option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    w.save(path)


def read_table(
    spark: SparkSession, path: str, fmt: str = "parquet", schema: str | None = None
) -> DataFrame:
    """Read a table written by write_table.  For CSV/JSON pass the
    explicit schema string (DDL) — inference re-types columns silently
    and is forbidden on the query path."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; pick one of {FORMATS}")
    ensure_session_confs(spark)
    r = spark.read.format(fmt)
    if fmt in ("csv", "json"):
        if schema is None:
            raise ValueError(f"{fmt} requires an explicit schema")
        r = r.schema(schema).option("timestampFormat",
                                    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    if fmt == "csv":
        r = r.option("header", "true")
    return r.load(path)
