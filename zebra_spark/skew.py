"""Skew mitigation: salted joins.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; salting is the explicit tool for pathological keys (one user =
10% of events, one stopword = half the postings).  `salted_join`
produces a result identical to the plain inner equi-join: the big side's
hot rows spread over `n_salts` sub-keys, the small side replicates once
per salt, so no single task owns a whole hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big ⋈ small` on column `on`, salted.

    The salt is derived from xxhash64 of the big side's whole row (any
    per-row value works — it only needs to spread rows, not be stable),
    so no column requirements beyond the join key.

    Only join types where the replicated small side cannot leak
    duplicates are allowed: inner/left/left_semi/left_anti.  A right or
    full join would emit each unmatched small-side row n_salts times.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti", "semi", "anti"}
    if how not in allowed:
        raise ValueError(f"salted_join supports {sorted(allowed)}, not {how!r}")
    salt = F.pmod(F.xxhash64(*big.columns), F.lit(n_salts)).cast("int")
    big_s = big.withColumn("_salt", salt)
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).alias("_salt")
    small_s = small.select("*", salts)
    out = big_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")
