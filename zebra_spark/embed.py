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

from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
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


# --- model-backed embedders -------------------------------------------------
#
# Contract (≙ reference trait DatabaseEmbeddingModel, src/model/core.rs:
# 12-37): a model object exposes `embed(batch) -> np.ndarray[n, dim]`
# over a list of texts or byte blobs.  A FACTORY (zero-arg callable
# returning such an object) is registered per kind; the pandas_udf below
# calls the factory lazily ONCE PER EXECUTOR PROCESS on the first Arrow
# batch — never per call, which is the reference's antipattern
# (src/model/text.rs:15-17 re-instantiates fastembed per embed call).
#
# Real-model factories (fastembed BGE, torch ViT) are import-gated: the
# wrapper code is complete and unit-tested with injected fakes; only the
# weights/libs are environment-dependent.

_MODEL_FACTORIES: dict[str, Callable[[], Any]] = {}


class CharSumModel:
    """Deterministic no-weights model honoring the embed(batch) contract:
    dim-d vector of byte-value sums by position.  The offline stand-in
    for wiring/end-to-end tests of the model-backed path (factories that
    construct it are picklable and executor-importable); real models
    replace it without touching any Spark-side code."""

    def __init__(self, dim: int = 8, init_log: str | None = None):
        self.dim = dim
        if init_log is not None:  # lets tests observe when/where init runs
            with open(init_log, "a") as f:
                f.write("init\n")

    def embed(self, batch):
        out = np.zeros((len(batch), self.dim), dtype=np.float32)
        for i, t in enumerate(batch):
            s = t if isinstance(t, str) else bytes(t).decode("utf8", "ignore")
            for j, ch in enumerate(s.encode()):
                out[i, j % self.dim] += ch
        return out


def register_model(kind: str, factory: Callable[[], Any]) -> None:
    """Register (or override) a model factory.  The factory must be
    picklable (cloudpickle ships it to executors) and cheap to hold —
    all heavy lifting belongs inside its call."""
    _MODEL_FACTORIES[kind] = factory


def _builtin_factory(kind: str) -> Callable[[], Any] | None:
    """Factories for the reference's model zoo.  Each import-gates its
    library and raises NotImplementedError (with the exact integration
    recipe) where the container lacks it — on the EXECUTOR, at first
    batch, which is also where a real model would fail to load."""
    if kind in ("bge", "bge-small-en-v1.5"):

        def make_bge():
            try:
                from fastembed import TextEmbedding  # noqa: PLC0415
            except ImportError as e:  # pragma: no cover - env-dependent
                raise NotImplementedError(
                    "kind='bge' needs the fastembed package "
                    "(BAAI/bge-small-en-v1.5, 384-d — reference "
                    "src/model/text.rs:11-31); pip install fastembed or "
                    "register_model('bge', factory) with your own loader"
                ) from e
            mdl = TextEmbedding("BAAI/bge-small-en-v1.5")

            class _Bge:
                dim = 384

                def embed(self, batch):
                    return np.array(list(mdl.embed(list(batch))), dtype=np.float32)

            return _Bge()

        return make_bge
    if kind in ("vit", "vit-base-patch16-224"):

        def make_vit():
            try:
                import torch  # noqa: F401, PLC0415
                from transformers import ViTModel  # noqa: PLC0415
            except ImportError as e:  # pragma: no cover - env-dependent
                raise NotImplementedError(
                    "kind='vit' needs torch+transformers "
                    "(google/vit-base-patch16-224, 768-d — reference "
                    "src/model/image.rs:50-83); install them or "
                    "register_model('vit', factory) with your own loader"
                ) from e
            mdl = ViTModel.from_pretrained("google/vit-base-patch16-224")
            mdl.eval()

            class _Vit:
                dim = 768

                def embed(self, batch):
                    import torch  # noqa: PLC0415

                    from zebra_spark.multimodal import decode_pixels  # noqa: PLC0415

                    px = np.stack([
                        np.broadcast_to(decode_pixels(b), (3, 224, 224))
                        for b in batch
                    ]).astype(np.float32) / 255.0
                    with torch.no_grad():
                        out = mdl(pixel_values=torch.from_numpy(px))
                    return out.pooler_output.numpy().astype(np.float32)

            return _Vit()

        return make_vit
    return None


def embed_column(kind: str):
    """Pandas UDF (text/binary column -> array<float>) backed by the
    `kind` model: Arrow batch in, matrix out, model constructed lazily
    once per executor process and reused across batches.

    Creation validates only that a factory EXISTS (registered via
    register_model or built-in); model construction — and therefore any
    missing-library NotImplementedError — happens executor-side on the
    first batch, exactly where a real weight load would fail."""
    factory = _MODEL_FACTORIES.get(kind) or _builtin_factory(kind)
    if factory is None:
        raise NotImplementedError(
            f"no embedding model registered for kind='{kind}' — "
            f"known: {sorted(_MODEL_FACTORIES) + ['bge', 'vit']}; use "
            "register_model(kind, factory) to plug one in"
        )
    state: dict[str, Any] = {}

    @F.pandas_udf("array<float>")
    def _embed(batch: pd.Series) -> pd.Series:
        mdl = state.get("m")
        if mdl is None:
            mdl = state["m"] = factory()
        vecs = np.asarray(mdl.embed(batch.tolist()), dtype=np.float32)
        return pd.Series(list(vecs))

    return _embed


def l2_normalize(col: Column) -> Column:
    norm = F.sqrt(F.aggregate(col, F.lit(0.0), lambda a, x: a + x * x))
    return F.transform(col, lambda x: F.when(norm == 0.0, F.lit(0.0)).otherwise(x / norm))
