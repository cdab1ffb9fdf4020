"""Deduplication suite (north-star training-data ops): exact dedup lives
in queries.vector (q_dedup_exact); this module adds MinHash+LSH,
SimHash, character-n-gram Jaccard, and embedding-cosine near-dup.

Wave 2 — implementations land after the core manifest is green.
"""

from __future__ import annotations
