"""Text-analysis surface over `documents` (SURVEY §2.B + north-star
training-data ops): word count, pairwise token-set Jaccard, token
counting, quality scoring, language-ID, fingerprinting.

All are native DataFrame ops (split/explode/groupBy/window) — the
explode-join-agg pattern shuffles on (source, word)-grain keys, which is
how it stays balanced at scale (the hot key is the word, not the doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zebra_spark.functions import rnd
from zebra_spark.io import load
from zebra_spark.registry import query, sql_rnd

JACCARD_THRESHOLD = 0.2


def tokens(spark: SparkSession, sf_dir: str, distinct: bool = True) -> DataFrame:
    t = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("word")
    )
    return t.distinct() if distinct else t


@query(
    "q_text_wordcount",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    )
    SELECT word, count(*) AS n, count(DISTINCT doc_id) AS n_docs
    FROM tok GROUP BY word
    """,
)
def q_text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tokenize -> explode -> count: the canonical text map/reduce."""
    tok = tokens(spark, sf_dir, distinct=False)
    return tok.groupBy("word").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


@query(
    "q_text_jaccard_pairs",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, source, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.source, a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM tok a
      JOIN tok b ON a.word = b.word AND a.source = b.source
                AND a.doc_id < b.doc_id
      GROUP BY a.source, a.doc_id, b.doc_id
    )
    SELECT i.source, i.doc_a, i.doc_b, i.n_common,
           {sql_rnd("i.n_common * 1.0 / (sa.n + sb.n - i.n_common)")} AS jaccard
    FROM inter i
    JOIN sz sa ON sa.doc_id = i.doc_a
    JOIN sz sb ON sb.doc_id = i.doc_b
    WHERE i.n_common * 1.0 / (sa.n + sb.n - i.n_common) >= {JACCARD_THRESHOLD}
    """,
)
def q_text_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dedup candidate scoring: token-set Jaccard for doc pairs
    within the same `source` group.

    Scale note: the pair space is bounded by the blocking key (`source`),
    mirroring MinHash-LSH banding where the band bucket is the blocking
    key — the full-corpus version is q_dedup_minhash (zebra_spark.queries
    .dedup), which generates candidate pairs from LSH bands instead of a
    quadratic per-group self-join.
    """
    tok = tokens(spark, sf_dir, distinct=True)
    sz = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = tok.select("source", F.col("doc_id").alias("doc_a"), "word")
    b = tok.select(
        F.col("source").alias("source_b"), F.col("doc_id").alias("doc_b"), F.col("word").alias("word_b")
    )
    inter = (
        a.join(
            b,
            (F.col("word") == F.col("word_b"))
            & (F.col("source") == F.col("source_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .groupBy("source", "doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select(
            "source",
            "doc_a",
            "doc_b",
            "n_common",
            rnd(jac).alias("jaccard"),
        )
    )
