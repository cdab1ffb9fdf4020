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


def test_audio_windows_shape_and_determinism(spark):
    """Audio windowing plumbing: window count tracks blob duration
    (ceil((len - win)/hop) + 1), features are n_mels doubles in [0, 1],
    deterministic across runs, and per-id pooling works downstream."""
    from pyspark.sql import functions as F

    from zebra_spark.multimodal import audio_windows, to_multimodal

    # 1 s and 0.25 s of fake 16 kHz 16-bit PCM
    blobs = spark.createDataFrame(
        [(1, bytes(range(256)) * 125), (2, b"\x01\x02" * 2000)],
        "id bigint, content binary",
    )
    mm = to_multimodal(blobs, "id", "content", "audio")
    out = audio_windows(mm, win_ms=400, hop_ms=200).toPandas()
    # blob 1: 32000 B = 1 s -> (32000-12800)//6400 + 1 = 4 windows
    assert len(out[out.id == 1]) == 4
    # blob 2: 4000 B < one window -> exactly 1 window
    assert len(out[out.id == 2]) == 1
    assert all(len(f) == 16 for f in out.features)
    assert out.features.map(lambda f: all(0.0 <= x <= 1.0 for x in f)).all()
    again = audio_windows(mm, win_ms=400, hop_ms=200).toPandas()
    assert out.equals(again)
    pooled = (
        audio_windows(mm)
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_windows"))
        .toPandas()
        .set_index("id")
    )
    assert pooled.loc[1, "n_windows"] == 4 and pooled.loc[2, "n_windows"] == 1
