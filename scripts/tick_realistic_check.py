"""Chained ticks on a REALISTIC corpus (r10): tick_chain_scale.py runs
on the driver fixtures, which are near-duplicate-SATURATED by
construction (31-word vocabulary — every doc near-dups every other), so
its per-tick delta volume grows with the corpus and the sf0.1 update_s
slope needs the 'delta growth, not corpus scan' explanation.  This
harness measures the claim that explanation rests on: on a corpus with
BOUNDED dup families (the realistic shape), the per-tick delta row
count and update_s are both FLAT while the accumulated corpus grows.

Synthetic corpus: families of 3 near-dup docs over DISJOINT per-family
vocabularies (in-family Jaccard ~0.9 >> threshold; cross-family ~0),
ingested as fixed-size batches — every tick adds the same number of
docs and families, so a correct delta path writes a constant number of
pair rows per tick no matter how large the maintained corpus already
is.  A 10% slice of each batch's families SPANS into the next batch
(one member deferred), so the batch x corpus-so-far join path is
exercised, not just in-batch pairs.  Vectors are per-family clustered
points, so the semantic family stays quiet and bounded too.

    python scripts/tick_realistic_check.py [families_per_tick] [n_ticks]
"""

from __future__ import annotations

import json
import random
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

FAMILY = 3
WORDS_PER_DOC = 40
SPAN_EVERY = 10  # every 10th family defers one member to the next tick
DIM = 16


def main() -> None:
    fams = int(sys.argv[1]) if len(sys.argv) > 1 else 700
    n_ticks = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from zebra_spark.io import embeddings_d, load
    from zebra_spark.session import get_spark
    from zebra_spark.queries.tick import init_tick_state, run_tick

    spark = get_spark("tick-realistic")
    rng = random.Random(42)

    # generate all batches up front (ids strictly monotone across ticks)
    batches = []  # list of (docs_rows, vecs_rows)
    deferred: list[tuple] = []
    next_id = 0
    for t in range(n_ticks):
        docs = list(deferred)  # (text, emb) carried from the last tick
        deferred = []
        for f in range(fams):
            fam_id = t * fams + f
            base_vocab = [f"w{fam_id}_{i}" for i in range(50)]
            center = [rng.uniform(-1, 1) for _ in range(DIM)]
            members = []
            for m in range(FAMILY):
                words = rng.sample(base_vocab, WORDS_PER_DOC)
                text = " ".join(words)
                emb = [c + rng.uniform(-0.01, 0.01) for c in center]
                members.append((text, emb))
            spans = (f % SPAN_EVERY == 0) and t < n_ticks - 1
            for i, (text, emb) in enumerate(members):
                if spans and i == FAMILY - 1:
                    deferred.append((text, emb))
                else:
                    docs.append((next_id, text, emb))
                    next_id += 1
        # carried-over members get this tick's ids (still monotone:
        # every id assigned this tick exceeds every earlier tick's)
        fixed = []
        for row in docs:
            if len(row) == 2:
                text, emb = row
                fixed.append((next_id, text, emb))
                next_id += 1
            else:
                fixed.append(row)
        batches.append(fixed)

    def docs_df(rows):
        return spark.createDataFrame(
            [(i, t) for i, t, _ in rows], "doc_id bigint, text string"
        )

    def vecs_df(rows):
        return spark.createDataFrame(
            [(i, e) for i, _, e in rows], "vec_id bigint, emb array<double>"
        )

    # a corpus dir: the tick registry keys by sf_dir; raw tables only
    # seed the schemas (all real data arrives via batches)
    d = tempfile.mkdtemp(prefix="zebra_tick_real_")
    docs_df(batches[0]).select(
        "doc_id", "text",
        F.lit("en").alias("lang"), F.lit("syn").alias("source"),
        F.length("text").alias("n_chars"),
    ).limit(10).write.parquet(f"{d}/documents.parquet")
    vecs_df(batches[0]).select(
        "vec_id", F.col("emb").alias("embedding"), F.lit(0).alias("label")
    ).limit(10).write.parquet(f"{d}/embeddings.parquet")

    all_vecs = None
    for rows in batches:
        v = vecs_df(rows)
        all_vecs = v if all_vecs is None else all_vecs.unionByName(v)

    state = f"{d}/state"
    init_tick_state(spark, d, state, seed_vecs=all_vecs)

    results = []
    prev_pairs = 0
    for t, rows in enumerate(batches):
        timings: dict = {}
        run_tick(spark, d, state, docs_df(rows), vecs_df(rows),
                 timings=timings)
        pairs = spark.read.parquet(f"{state}/minhash").count()
        row = {
            "tick": t,
            "corpus_docs_before": sum(len(b) for b in batches[:t]),
            "update_s": timings["update_s"],
            "delta_pair_rows": pairs - prev_pairs,
            "reseed": timings["reseed_triggered"],
        }
        prev_pairs = pairs
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({
        "families_per_tick": fams, "n_ticks": n_ticks,
        "final_pairs": prev_pairs, "results": results,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
