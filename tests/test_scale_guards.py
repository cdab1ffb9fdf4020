"""Non-empty guards for threshold-bearing queries at the smallest
fixture.

The sf0.1 sweep caught q_tpch_q11's fixed-fraction threshold going
EMPTY as the part count grew — a whole class of bug (a cutoff tuned to
one scale silently filtering everything at another).  This pins the
smallest scale; the sf0.1 sweep's non-empty assertion pins the top.
"""

from __future__ import annotations

import pytest

import zebra_spark
from tests.conftest import SF_SMOKE

zebra_spark.load_all_queries()

THRESHOLD_QUERIES = [
    "q_tpch_q11",        # value > 1.2x mean part value
    "q_dedup_minhash",   # jaccard >= 0.5
    "q_text_jaccard_pairs",
    "q_dedup_incremental",
    "q_neardup_cosine",
    "q_semantic_clusters",
    "q_curation_pipeline",
    "q_text_surprisal",
    "q_contamination",
    "q_domain_cap",
]


@pytest.mark.parametrize("name", THRESHOLD_QUERIES)
def test_nonempty_at_smallest_scale(spark, name):
    assert zebra_spark.QUERIES[name](spark, SF_SMOKE).count() > 0, (
        f"{name}: threshold filters everything at sf0.001 — "
        "scale-dependent cutoff"
    )
