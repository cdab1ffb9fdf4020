"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed by Arrow-batched pandas UDFs over mapInPandas.

Mirrors the reference's multimodal design: one vector space per database,
modality handled at embed time (audio is reduced to a spectrogram IMAGE
and embedded by the image model — src/model/audio.rs:86-99,106-142;
images are resized/normalized to 224x224 CHW — src/model/image.rs:24-43).

The actual decoders (PIL / symphonia-equivalent) are NOT in this
container, so the decode step is STUBBED: `_HAVE_PIL` gates the real
path, and the deterministic fake derives pseudo-pixels from the byte
content (stable, testable).  Everything Spark-side is real and tested:
schemas, Arrow batch shapes, mapInPandas iteration, partitioning.

Scale posture: mapInPandas streams Arrow record batches — constant
memory per task regardless of partition size; binary payloads never
transit the driver; repartition by id range upstream if blob sizes are
skewed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real decoder gate — not available in this container
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

IMAGE_SIZE = 224
EMBED_DIM = 64

MULTIMODAL_SCHEMA = (
    "id bigint, modality string, content binary, "
    "meta map<string,string>"
)

FEATURE_SCHEMA = (
    "id bigint, modality string, n_bytes bigint, "
    "height int, width int, embedding array<float>"
)


def _fake_pixels(content: bytes, size: int = IMAGE_SIZE) -> np.ndarray:
    """Deterministic stand-in for image decode: expand the byte content's
    SHA-256 stream into a (size, size) uint8 array.  STUB for
    PIL.Image.open(...).resize((224, 224)) — see module docstring."""
    n = size * size
    out = np.empty(n, dtype=np.uint8)
    h = hashlib.sha256(content).digest()
    reps = (n + len(h) - 1) // len(h)
    stream = (hashlib.sha256(content + i.to_bytes(4, "little")).digest() for i in range(reps))
    buf = b"".join(stream)[:n]
    out[:] = np.frombuffer(buf, dtype=np.uint8)
    return out.reshape(size, size)


def _pil_pixels(content: bytes, size: int = IMAGE_SIZE) -> np.ndarray:
    """Real image decode (reference src/model/image.rs:24-43): open,
    grayscale, resize to (size, size).  Only reachable when PIL is
    installed; the plumbing around it is exercised with injected fake
    decoders in tests/test_multimodal.py."""
    import io  # noqa: PLC0415

    img = PIL.Image.open(io.BytesIO(content)).convert("L").resize((size, size))
    return np.asarray(img, dtype=np.uint8)


def decode_pixels(content: bytes, size: int = IMAGE_SIZE) -> np.ndarray:
    """Decode a blob to a (size, size) uint8 grid: PIL when available,
    the deterministic fake otherwise."""
    return (_pil_pixels if _HAVE_PIL else _fake_pixels)(content, size)


def _embed_pixels(pixels: np.ndarray, dim: int = EMBED_DIM) -> np.ndarray:
    """Deterministic feature extraction: mean-pool the pixel grid into
    `dim` blocks and L2-normalize (plays the ViT forward's role,
    src/model/image.rs:59-69)."""
    flat = pixels.astype(np.float64).ravel()
    blocks = np.array_split(flat, dim)
    v = np.array([b.mean() for b in blocks])
    n = np.linalg.norm(v)
    return (v / n if n else v).astype(np.float32)


def decode_and_embed(
    df: DataFrame, dim: int = EMBED_DIM, decoder=None
) -> DataFrame:
    """mapInPandas: (id, modality, content, meta) -> decoded features +
    embedding of length `dim`.  Audio reduces to a spectrogram image
    first (the reference's audio≙image reduction), video would
    frame-sample — both collapse to the image path.

    `dim` MUST match the owning database's configured dimension (the
    facade passes db.meta['dim']); `decoder` (bytes -> (H, W) uint8
    grid) defaults to the PIL path when installed, else the
    deterministic fake — tests inject fakes here to exercise the real
    branch's plumbing."""
    dec = decoder or decode_pixels

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                content = bytes(r.content) if r.content is not None else b""
                pixels = np.asarray(dec(content), dtype=np.uint8)
                rows.append(
                    {
                        "id": r.id,
                        "modality": r.modality,
                        "n_bytes": len(content),
                        "height": pixels.shape[0],
                        "width": pixels.shape[1],
                        "embedding": _embed_pixels(pixels, dim),
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling (stub): emit every_n pseudo-frames per blob.
    Real path: pyav/ffmpeg demux inside the same mapInPandas shape."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                content = bytes(r.content) if r.content is not None else b""
                n_frames = max(1, len(content) // 1024)
                for f in range(0, n_frames, every_n):
                    rows.append(
                        {
                            "id": r.id,
                            "frame_no": f,
                            "frame": hashlib.sha256(
                                content + f.to_bytes(4, "little")
                            ).digest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=["id", "frame_no", "frame"])

    return df.mapInPandas(op, schema="id bigint, frame_no int, frame binary")


def to_multimodal(df: DataFrame, id_col: str, content_col: str, modality: str) -> DataFrame:
    """Normalize any (id, binary) frame into the multimodal schema."""
    return df.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.lit(modality).alias("modality"),
        F.col(content_col).cast("binary").alias("content"),
        F.create_map(
            F.lit("n_bytes"), F.length(content_col).cast("string")
        ).alias("meta"),
    )


def audio_windows(
    df: DataFrame,
    sample_rate: int = 16_000,
    win_ms: int = 400,
    hop_ms: int = 200,
    n_mels: int = 16,
) -> DataFrame:
    """Audio windowing + per-window features (stub decode): treat each
    blob as 16-bit PCM at `sample_rate`, slice into overlapping
    windows (win_ms long, hop_ms apart), and emit one deterministic
    `n_mels`-dim feature vector per window — the plumbing shape of a
    spectrogram/mel front-end (whisper-style framing), with the real
    librosa/torchaudio transform droppable into the same mapInPandas
    without touching the Spark side.

    Per-row output fan-out is duration/hop (bounded by blob size);
    windows of one blob stay in its Arrow batch, so the op is one
    shuffle-free pass and downstream aggs (per-id pooling) shuffle on
    `id` only."""
    bytes_per_win = int(sample_rate * win_ms / 1000) * 2
    bytes_per_hop = int(sample_rate * hop_ms / 1000) * 2

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                content = bytes(r.content) if r.content is not None else b""
                n = max(1, (max(len(content) - bytes_per_win, 0))
                        // bytes_per_hop + 1)
                for w in range(n):
                    chunk = content[
                        w * bytes_per_hop : w * bytes_per_hop + bytes_per_win
                    ]
                    # deterministic fake mel vector from the window bytes
                    # (real path: rfft/mel filterbank over the PCM)
                    h = hashlib.sha256(chunk).digest()
                    feats = [
                        (int.from_bytes(h[2 * i : 2 * i + 2], "little")
                         / 65535.0)
                        for i in range(n_mels)
                    ]
                    rows.append(
                        {
                            "id": r.id,
                            "win_no": w,
                            "start_ms": w * hop_ms,
                            "features": feats,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["id", "win_no", "start_ms", "features"]
            )

    return df.mapInPandas(
        op,
        schema="id bigint, win_no int, start_ms int, features array<double>",
    )
