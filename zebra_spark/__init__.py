"""zebra_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference vector database
(emmyoh/zebra: LSH ANN search, distance metrics, CRUD, dedup) plus the
LLM-data-pipeline operator surface (relational, text analysis, near-dedup,
similarity search, streaming) required by the north star.

Design stance (SURVEY.md §4): declare logical plans with the DataFrame
API, let Catalyst/Tungsten pick physical strategy.  No RDDs, no custom
plan nodes; the engine is a library of composable DataFrame transforms,
expression builders, and a persisted LSH index layout.
"""

from zebra_spark.registry import QUERIES, ORACLES
from zebra_spark.session import get_spark

__version__ = "0.1.0"


def load_all_queries() -> None:
    """Import every query module so its @query registrations run."""
    from zebra_spark.queries import (  # noqa: F401
        vector,
        relational,
        temporal,
        text,
        dedup,
        ann,
        tpch,
        audit,
        tick,
    )


__all__ = ["QUERIES", "ORACLES", "get_spark", "load_all_queries"]
