"""Similarity-search suite: brute-force kNN lives in queries.vector
(q_knn_exact); this module adds the scale paths — IVF (deterministic
coarse quantizer) and the LSH bucket index (zebra_spark.index).

Wave 2 — implementations land after the core manifest is green.
"""

from __future__ import annotations
