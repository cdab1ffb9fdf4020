"""Multimodal plumbing: schema normalization, mapInPandas decode/embed
(deterministic fake), frame sampling — the Spark-side contract is real
even though the decoder is stubbed."""

from __future__ import annotations

import pytest


@pytest.fixture()
def blobs(spark):
    from zebra_spark.multimodal import to_multimodal

    raw = spark.createDataFrame(
        [(1, b"fake-image-bytes-aaaa" * 50), (2, b"fake-image-bytes-bbbb" * 80),
         (3, b"tiny")],
        "id bigint, content binary",
    )
    return to_multimodal(raw, "id", "content", "image")


def test_schema(blobs):
    assert blobs.schema.simpleString() == (
        "struct<id:bigint,modality:string,content:binary,meta:map<string,string>>"
    )
    metas = {r.id: r.meta for r in blobs.collect()}
    assert metas[3]["n_bytes"] == "4"


def test_decode_and_embed(blobs):
    from zebra_spark.multimodal import EMBED_DIM, IMAGE_SIZE, decode_and_embed

    out = decode_and_embed(blobs).toPandas().set_index("id")
    assert len(out) == 3
    assert (out["height"] == IMAGE_SIZE).all()
    assert all(len(e) == EMBED_DIM for e in out["embedding"])
    # deterministic: same bytes -> same embedding
    out2 = decode_and_embed(blobs).toPandas().set_index("id")
    assert all(
        list(out.loc[i, "embedding"]) == list(out2.loc[i, "embedding"])
        for i in (1, 2, 3)
    )
    # unit norm
    import numpy as np

    v = np.array(out.loc[1, "embedding"])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5


def test_frame_sample(blobs):
    from zebra_spark.multimodal import frame_sample

    frames = frame_sample(blobs, every_n=1).toPandas()
    assert set(frames.columns) == {"id", "frame_no", "frame"}
    assert (frames.groupby("id").size() >= 1).all()
    assert all(len(f) == 32 for f in frames["frame"])  # sha256 frames
