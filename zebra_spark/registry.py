"""Declared-query registry (SURVEY.md §2.C contract).

Every hash-checked operator registers a PySpark implementation and a
DuckDB-dialect oracle SQL string under the same name.  Rows-only ops
register with oracle=None.
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[..., Any]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register fn(spark, sf_dir) -> DataFrame under `name`; optionally
    attach the equivalent DuckDB oracle SQL (hash-checked by the driver)."""

    def deco(fn):
        # duplicate names silently replace earlier registrations (last
        # import wins), which once shadowed a richer operator with a
        # same-named rewrite — fail loudly instead.  Module re-imports
        # don't re-run decorators (sys.modules caching), so this only
        # fires on a genuine second definition.
        if name in QUERIES:
            raise ValueError(f"query {name!r} registered twice")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = textwrap.dedent(oracle).strip()
        fn.query_name = name
        # machine-readable marker: True == "no_oracle by design" (driver
        # records a rows-only check), distinguishing it from an oracle
        # that is missing by accident (VERDICT r4 directive 8)
        fn.rows_only = oracle is None
        return fn

    return deco


def sql_rnd(expr: str, nd: int = 4) -> str:
    """Oracle-side float normalizer, the exact twin of functions.rnd:
    floor(x * 10^nd + 0.5) / 10^nd in double (bit-identical across
    engines, unlike native round() — see functions.rnd), -0.0 collapsed
    to 0.0."""
    s = float(10 ** nd)
    r = f"(floor(CAST({expr} AS DOUBLE) * {s} + 0.5) / {s})"
    return f"(CASE WHEN {r} = 0 THEN 0.0 ELSE {r} END)"
