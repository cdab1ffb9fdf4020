"""CLI — parity with the reference binary's command surface
(reference src/main.rs:30-139): `text|image|audio insert|insert-from-files|
query|clear` against a database path.

Result rendering (sixel image preview, audio playback — src/main.rs:
216-231, 286-292) is out of engine scope; results print as tables.

Usage:
    python -m zebra_spark.cli --database-path /tmp/db text insert "a doc" "b doc"
    python -m zebra_spark.cli --database-path /tmp/db text insert-from-files f1.txt f2.txt
    python -m zebra_spark.cli --database-path /tmp/db text query "a doc" --k 3
    python -m zebra_spark.cli --database-path /tmp/db text clear
    python -m zebra_spark.cli --database-path /tmp/db image insert-from-files *.png
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="zebra-spark")
    p.add_argument("--database-path", required=True)
    p.add_argument("--cpus", default=None)
    p.add_argument(
        "--index", default="lsh", choices=("lsh", "ivf", "pq", "ivfpq"),
        help="ANN index family recorded at database creation "
        "(ignored when opening an existing database, whose metadata "
        "already fixes the family)",
    )
    sub = p.add_subparsers(dest="modality", required=True)
    for modality in ("text", "image", "audio"):
        mp = sub.add_parser(modality)
        msub = mp.add_subparsers(dest="command", required=True)
        ins = msub.add_parser("insert")
        ins.add_argument("items", nargs="+")
        inf = msub.add_parser("insert-from-files")
        inf.add_argument("paths", nargs="+")
        inf.add_argument("--batch-size", type=int, default=100)  # ≙ main.rs:80-81
        q = msub.add_parser("query")
        q.add_argument("items", nargs="+")
        q.add_argument("--k", type=int, default=1)  # ≙ main.rs:86-87
        msub.add_parser("clear")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from zebra_spark.database import ZebraDatabase
    from zebra_spark.session import get_spark

    spark = get_spark("zebra-cli", cpus=args.cpus)
    db = ZebraDatabase.open_or_create(
        spark, args.database_path, index_kind=args.index
    )
    t0 = time.perf_counter()

    if args.command == "clear":
        db.clear()
        print("cleared")
    elif args.command == "insert":
        if args.modality == "text":
            db.insert_texts(args.items)
        else:
            # binary modalities: inline items are file paths
            insert_from_files(db, args.modality, args.items)
        print(f"inserted {len(args.items)} documents")
    elif args.command == "insert-from-files":
        n = insert_from_files(db, args.modality, args.paths)
        print(f"inserted {n} documents from {len(args.paths)} paths")
    elif args.command == "query":
        if args.modality == "text":
            res = db.query_texts(args.items, k=args.k)
        else:
            blobs = [open(p, "rb").read() for p in args.items]
            res = db.query_blobs(blobs, modality=args.modality, k=args.k)
        for r in res.orderBy("query_id", "rank").collect():
            print(f"q{r.query_id} #{r.rank} dist={r.dist:.4f} id={r.vec_id} doc={r.doc!r}")
    else:
        print(f"unsupported: {args.modality} {args.command}", file=sys.stderr)
        return 2
    print(f"({time.perf_counter() - t0:.2f}s)")  # ≙ per-op wall-clock, main.rs:146-160
    return 0


def insert_from_files(db, modality: str, paths: list[str]) -> int:
    """≙ CLI InsertFromFiles (src/main.rs:308-362): bulk file ingestion.
    Text files go through spark.read.text (one doc per file, matching the
    reference's whole-file reads); binaries through the binaryFile source.
    Batching is Spark's job (Arrow batches / task partitions), not a
    driver loop — the batch_size knob exists only for CLI parity."""
    spark = db.spark
    from pyspark.sql import functions as F

    if modality == "text":
        df = (
            spark.read.format("text")
            .option("wholetext", "true")
            .load(paths)
            .withColumnRenamed("value", "doc")
        )
        n = df.count()
        db.insert_documents(df, text_col="doc")
        return n
    # image/audio: opaque binary + deterministic fake embedding offline
    from zebra_spark.multimodal import decode_and_embed, to_multimodal

    raw = spark.read.format("binaryFile").load(paths)
    blobs = to_multimodal(
        raw.withColumn("id", F.monotonically_increasing_id()), "id", "content", modality
    )
    feats = decode_and_embed(blobs, dim=db.meta["dim"])
    records = feats.select(
        F.col("id").cast("string").alias("doc"),
        F.col("embedding").cast("array<double>").alias("embedding"),
        F.col("modality"),
    )
    n = records.count()
    db.insert_records(records)
    return n


if __name__ == "__main__":
    raise SystemExit(main())
