"""Pluggable embedding models (reference trait DatabaseEmbeddingModel,
src/model/core.rs:12-37: batch bytes -> fixed-dim float vector).

The default embedder is a deterministic hashing-TF text embedder built
from pure DataFrame ops (no model download, no UDF): tokenize -> hash
words into `dim` buckets -> log(1+tf) -> L2 normalize.  It plays the
role of BGE-small (src/model/text.rs:11-31) for offline testing: same
shape (text column -> array<double> column), stable across runs.

Real model hooks (BGE / ViT, src/model/image.rs:50-83) are pandas_udf
factories gated behind import-try — the container has no torch/PIL, so
they raise NotImplementedError with the integration contract documented.
Unlike the reference (which instantiates the model PER CALL,
src/model/text.rs:15-17), a real deployment loads the model once per
executor inside the pandas_udf closure.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_DIM = 64


def hash_tf_embedding(df: DataFrame, text_col: str, id_col: str, dim: int = DEFAULT_DIM) -> DataFrame:
    """Add an `embedding array<double>` column: hashing-TF + L2 norm.

    All native ops: explode -> xxhash64 bucket -> count -> dense array via
    map lookup -> normalize.  One shuffle (the per-doc groupBy).
    """
    tok = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("word")
    )
    counts = (
        tok.withColumn("bucket", F.pmod(F.xxhash64("word"), F.lit(dim)).cast("int"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    sparse = counts.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct("bucket", F.log1p(F.col("cnt").cast("double")).alias("w")))
        ).alias("m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.try_element_at("m", i.cast("int")), F.lit(0.0)),
    )
    norm = F.sqrt(
        F.aggregate(dense, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    unit = F.transform(dense, lambda x: F.when(norm == 0.0, F.lit(0.0)).otherwise(x / norm))
    emb = sparse.select(id_col, unit.alias("embedding"))
    return df.join(emb, id_col, "left").withColumn(
        "embedding",
        F.coalesce(
            "embedding",
            F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), lambda _: F.lit(0.0)),
        ),
    )


def embed_column(kind: str):
    """Return a pandas_udf (binary/text batch -> vector) for a real model.
    STUB: torch/transformers are not in this container (SURVEY §7 M4);
    the Spark-side contract (Arrow batch in, array<float> out, model
    loaded once per executor) is exercised by the deterministic fake in
    zebra_spark.multimodal."""
    raise NotImplementedError(
        f"model-backed embedder '{kind}' requires torch/transformers; "
        "use hash_tf_embedding (text) or multimodal.fake_decode_embed "
        "(binary) offline. Integration: wrap the model in @F.pandas_udf("
        "ArrayType(FloatType())) with lazy per-executor init."
    )


def l2_normalize(col: Column) -> Column:
    norm = F.sqrt(F.aggregate(col, F.lit(0.0), lambda a, x: a + x * x))
    return F.transform(col, lambda x: F.when(norm == 0.0, F.lit(0.0)).otherwise(x / norm))
