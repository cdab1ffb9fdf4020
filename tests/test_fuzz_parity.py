"""Seeded differential fuzzing: random filter/aggregate/join shapes over
lineitem/orders executed on Spark AND DuckDB, results compared exactly.
Catches expression-semantics drift the fixed declared queries miss.
All randomness is seeded — failures reproduce.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE

COLS_NUM = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
COLS_STR = ["l_returnflag", "l_linestatus"]


def _mk_predicates(rng: random.Random):
    """Random conjunctive predicate: (spark_col_expr, sql_text)."""
    preds = []
    n = rng.randint(1, 3)
    for _ in range(n):
        kind = rng.choice(["range", "in", "cmp"])
        if kind == "range":
            c = rng.choice(COLS_NUM)
            lo = round(rng.uniform(0, 25), 2)
            hi = round(lo + rng.uniform(1, 30), 2)
            preds.append((F.col(c).between(lo, hi), f"{c} BETWEEN {lo} AND {hi}"))
        elif kind == "in":
            c = rng.choice(COLS_STR)
            vals = rng.sample(["A", "N", "R", "O", "F"], rng.randint(1, 3))
            quoted = ", ".join(f"'{v}'" for v in vals)
            preds.append((F.col(c).isin(vals), f"{c} IN ({quoted})"))
        else:
            c = rng.choice(COLS_NUM)
            thr = round(rng.uniform(0, 40000), 2)
            op = rng.choice(["<", ">", "<=", ">="])
            ops = {"<": "__lt__", ">": "__gt__", "<=": "__le__", ">=": "__ge__"}
            preds.append((getattr(F.col(c), ops[op])(thr), f"{c} {op} {thr}"))
    spark_pred = preds[0][0]
    for p, _ in preds[1:]:
        spark_pred = spark_pred & p
    sql_pred = " AND ".join(s for _, s in preds)
    return spark_pred, sql_pred


@pytest.mark.parametrize("seed", range(12))
def test_random_filter_agg(seed, spark, duck):
    rng = random.Random(1000 + seed)
    spark_pred, sql_pred = _mk_predicates(rng)
    group = rng.choice(COLS_STR)
    agg_col = rng.choice(COLS_NUM)

    from zebra_spark.io import load

    got = (
        load(spark, SF_ORACLE, "lineitem")
        .filter(spark_pred)
        .groupBy(group)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col(agg_col).cast("decimal(18,6)")).cast("double"), 4
            ).alias("s"),
        )
        .toPandas()
        .sort_values(group)
        .reset_index(drop=True)
    )
    want = (
        duck.execute(
            f"SELECT {group}, count(*) AS n,"
            f" round(CAST(sum(CAST({agg_col} AS DECIMAL(18,6))) AS DOUBLE), 4) AS s"
            f" FROM lineitem WHERE {sql_pred} GROUP BY {group} ORDER BY {group}"
        )
        .fetchdf()
        .reset_index(drop=True)
    )
    assert len(got) == len(want), (sql_pred, len(got), len(want))
    for i in range(len(got)):
        assert got.loc[i, group] == want.loc[i, group], sql_pred
        assert int(got.loc[i, "n"]) == int(want.loc[i, "n"]), sql_pred
        assert float(got.loc[i, "s"]) == float(want.loc[i, "s"]), (
            sql_pred, got.loc[i, "s"], want.loc[i, "s"],
        )


@pytest.mark.parametrize("seed", range(6))
def test_random_join_agg(seed, spark, duck):
    rng = random.Random(2000 + seed)
    thr = round(rng.uniform(50000, 400000), 2)
    how, sql_how = rng.choice(
        [("inner", "JOIN"), ("left_semi", "SEMI JOIN"), ("left_anti", "ANTI JOIN")]
    )

    from zebra_spark.io import load

    c = load(spark, SF_ORACLE, "customer")
    o = load(spark, SF_ORACLE, "orders").filter(F.col("o_totalprice") > thr)
    if how == "inner":
        got = c.join(o, c.c_custkey == o.o_custkey).count()
        want = duck.execute(
            f"SELECT count(*) FROM customer JOIN orders ON c_custkey = o_custkey"
            f" AND o_totalprice > {thr}"
        ).fetchone()[0]
    else:
        got = c.join(o, c.c_custkey == o.o_custkey, how).count()
        verb = "EXISTS" if how == "left_semi" else "NOT EXISTS"
        want = duck.execute(
            f"SELECT count(*) FROM customer WHERE {verb} (SELECT 1 FROM orders"
            f" WHERE o_custkey = c_custkey AND o_totalprice > {thr})"
        ).fetchone()[0]
    assert got == want, (how, thr, got, want)


@pytest.mark.parametrize("seed", range(6))
def test_random_window_shapes(seed, spark, duck):
    """Random running-aggregate window shapes: partition column, order
    column, and frame chosen per seed; decimal running sums compared
    exactly (sequential fold — same order both engines)."""
    rng = random.Random(3000 + seed)
    part = rng.choice(["l_returnflag", "l_linestatus", "l_suppkey"])
    n_prec = rng.choice([2, 5, 10])

    from pyspark.sql import Window
    from pyspark.sql import functions as F2

    from zebra_spark.io import load

    # (l_orderkey, l_linenumber) is NOT unique in the fixture (14k dup
    # pairs) — the window order must include l_partkey/l_suppkey to be a
    # total order, or running sums are genuinely ambiguous
    order_cols = ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"]
    w = Window.partitionBy(part).orderBy(*order_cols).rowsBetween(-n_prec, 0)
    got = (
        load(spark, SF_ORACLE, "lineitem")
        .select(
            *order_cols,
            F2.round(
                F2.sum(F2.col("l_quantity").cast("decimal(18,6)"))
                .over(w)
                .cast("double"),
                4,
            ).alias("run"),
        )
        .toPandas()
        .sort_values(order_cols)
        .reset_index(drop=True)
    )
    oc = ", ".join(order_cols)
    want = (
        duck.execute(
            f"SELECT {oc},"
            f" round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) OVER ("
            f" PARTITION BY {part} ORDER BY {oc}"
            f" ROWS BETWEEN {n_prec} PRECEDING AND CURRENT ROW) AS DOUBLE), 4)"
            f" AS run FROM lineitem ORDER BY {oc}"
        )
        .fetchdf()
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    import numpy as np

    assert np.array_equal(got["run"].values, want["run"].values), (part, n_prec)


@pytest.mark.parametrize("seed", range(6))
def test_random_string_chains(seed, spark, duck):
    """Random string-function chains (upper/lower/substr/concat/length)
    over orders: expression-semantics drift (collation, 1-indexing,
    null handling) that fixed queries can miss."""
    rng = random.Random(3000 + seed)
    col = rng.choice(["o_orderpriority", "o_orderstatus"])
    # (spark_builder, sql_fmt) op palette — applied as a chain
    sp = F.col(col)
    sql = col
    for _ in range(rng.randint(1, 3)):
        op = rng.choice(["upper", "lower", "substr", "concat", "trim"])
        if op == "upper":
            sp, sql = F.upper(sp), f"upper({sql})"
        elif op == "lower":
            sp, sql = F.lower(sp), f"lower({sql})"
        elif op == "substr":
            start = rng.randint(1, 3)
            ln = rng.randint(1, 6)
            sp = F.substring(sp, start, ln)
            sql = f"substr({sql}, {start}, {ln})"
        elif op == "concat":
            lit = rng.choice(["_x", "Q", "#9"])
            sp = F.concat(sp, F.lit(lit))
            sql = f"concat({sql}, '{lit}')"
        else:
            sp, sql = F.trim(sp), f"trim({sql})"

    from zebra_spark.io import load

    got = (
        load(spark, SF_ORACLE, "orders")
        .select(sp.alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    want = (
        duck.execute(
            f"SELECT {sql} AS v, count(*) AS n FROM orders GROUP BY v ORDER BY v"
        )
        .fetchdf()
        .reset_index(drop=True)
    )
    assert got["v"].tolist() == want["v"].tolist(), (seed, sql)
    assert got["n"].tolist() == want["n"].tolist(), (seed, sql)


@pytest.mark.parametrize("seed", range(6))
def test_random_date_arithmetic(seed, spark, duck):
    """Random date_trunc/offset/format chains over o_orderdate: the
    calendar-arithmetic drift catcher (truncation boundaries, day
    offsets across months, formatting)."""
    rng = random.Random(4000 + seed)
    unit = rng.choice(["year", "quarter", "month", "week", "day"])
    offset = rng.randint(-45, 45)

    from zebra_spark.io import load

    got = (
        load(spark, SF_ORACLE, "orders")
        .select(
            F.date_format(
                F.date_add(F.date_trunc(unit, F.col("o_orderdate")), offset),
                "yyyy-MM-dd",
            ).alias("d")
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
        .sort_values("d")
        .reset_index(drop=True)
    )
    want = (
        duck.execute(
            f"SELECT strftime(date_trunc('{unit}', o_orderdate)"
            f" + (INTERVAL 1 DAY) * ({offset}), '%Y-%m-%d') AS d,"
            f" count(*) AS n FROM orders GROUP BY d ORDER BY d"
        )
        .fetchdf()
        .reset_index(drop=True)
    )
    assert got["d"].tolist() == want["d"].tolist(), (seed, unit, offset)
    assert got["n"].tolist() == want["n"].tolist(), (seed, unit, offset)


@pytest.mark.parametrize("seed", range(6))
def test_random_array_chains(seed, spark, duck):
    """Random array-expression chains over the embeddings vectors —
    the kernel family the whole vector surface rests on (slice /
    affine transform / element access / extrema).  The chain is built
    once as a shared op list and rendered per dialect; constants are
    exact binary fractions and terminals are order-independent, so
    both engines must agree bit-for-bit."""
    rng = random.Random(5000 + seed)
    ops = []
    for _ in range(rng.randint(1, 3)):
        op = rng.choice(["slice", "scale", "shift"])
        if op == "slice":
            ops.append(("slice", rng.randint(1, 8), rng.randint(4, 16)))
        elif op == "scale":
            ops.append(("scale", rng.choice(["0.5", "2.0", "-1.0", "0.25"])))
        else:
            ops.append(("shift", rng.choice(["1.0", "-0.5", "4.0"])))
    term = rng.choice(["size", "elem", "max", "min"])

    sp_sql, du_sql = "emb", "emb"
    for op in ops:
        if op[0] == "slice":
            _, s, ln = op
            sp_sql = f"slice({sp_sql}, {s}, {ln})"
            du_sql = f"list_slice({du_sql}, {s}, {s + ln - 1})"
        elif op[0] == "scale":
            sp_sql = f"transform({sp_sql}, x -> x * {op[1]}d)"
            du_sql = f"list_transform({du_sql}, x -> x * {op[1]})"
        else:
            sp_sql = f"transform({sp_sql}, x -> x + {op[1]}d)"
            du_sql = f"list_transform({du_sql}, x -> x + {op[1]})"
    if term == "size":
        sp_sql, du_sql = f"size({sp_sql})", f"len({du_sql})"
    elif term == "elem":
        i = rng.randint(1, 4)
        sp_sql, du_sql = f"element_at({sp_sql}, {i})", f"({du_sql})[{i}]"
    elif term == "max":
        sp_sql, du_sql = f"array_max({sp_sql})", f"list_max({du_sql})"
    else:
        sp_sql, du_sql = f"array_min({sp_sql})", f"list_min({du_sql})"

    from zebra_spark.io import embeddings_d

    got = (
        embeddings_d(spark, SF_ORACLE)
        .select(F.expr(sp_sql).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    want = (
        duck.execute(
            "WITH e AS (SELECT embedding::DOUBLE[] AS emb FROM embeddings) "
            f"SELECT {du_sql} AS v, count(*) AS n FROM e "
            "GROUP BY v ORDER BY v"
        )
        .fetchdf()
        .reset_index(drop=True)
    )
    assert got["v"].tolist() == want["v"].tolist(), (seed, sp_sql, du_sql)
    assert got["n"].tolist() == want["n"].tolist(), (seed, sp_sql, du_sql)


@pytest.mark.parametrize("seed", range(8))
def test_random_cell_cap_kernel(seed, spark):
    """Seeded differential fuzz of the giant-cell cap (r9): for random
    multi-assignments and a random binding cap, the shared
    _cell_collide_pairs kernel must emit exactly the pairs among each
    cell's `cap` smallest vec_ids — recomputed independently in plain
    Python — for BOTH batch modes (full self-delta, and a random batch
    slice against the full view, whose union with the complement's
    pairs-plus-cross must still be a subset of the full capped set)."""
    rng = random.Random(7000 + seed)
    n_vecs = rng.randint(10, 60)
    n_cells = rng.randint(2, 6)
    per_vec = rng.randint(1, min(3, n_cells))
    cap = rng.randint(2, 8)
    rows = []
    for v in range(n_vecs):
        for c in rng.sample(range(n_cells), per_vec):
            rows.append((v, c))
    assign = spark.createDataFrame(rows, "vec_id bigint, cell_id bigint")

    from zebra_spark.queries.dedup import _cell_collide_pairs

    # independent model: per cell, the cap smallest members, all pairs
    cells: dict[int, list[int]] = {}
    for v, c in rows:
        cells.setdefault(c, []).append(v)
    want = set()
    for members in cells.values():
        m = sorted(set(members))[:cap]
        want |= {(a, b) for i, a in enumerate(m) for b in m[i + 1:]}

    got = {
        (r.id_a, r.id_b)
        for r in _cell_collide_pairs(assign, assign, max_cell=cap).collect()
    }
    assert got == want, (seed, n_vecs, n_cells, per_vec, cap)

    # batch mode: a random slice of vec_ids against the full view must
    # emit exactly the admitted pairs involving a batch member
    batch_ids = set(rng.sample(range(n_vecs), rng.randint(1, n_vecs)))
    batch = assign.filter(F.col("vec_id").isin(list(batch_ids)))
    got_b = {
        (r.id_a, r.id_b)
        for r in _cell_collide_pairs(batch, assign, max_cell=cap).collect()
    }
    want_b = {
        (a, b) for a, b in want if a in batch_ids or b in batch_ids
    }
    assert got_b == want_b, (seed, sorted(batch_ids), cap)


@pytest.mark.parametrize("seed", range(6))
def test_random_bucketed_window_decompositions(seed, spark, tmp_path):
    """Seeded differential fuzz of the r10 skew-free window
    decompositions: q_mix_rebalance (bucketed RANK) and
    q_token_budget_sample (bucketed RUNNING SUM) on random synthetic
    corpora must equal an independent plain-Python model that sorts
    each group by (hash, doc_id) outright — the bucket split must
    never change membership."""
    import zebra_spark
    from zebra_spark.queries.text import (
        MIX_BP,
        SPLIT_A,
        SPLIT_M,
        TOKEN_BUDGET_PER_SOURCE,
    )

    zebra_spark.load_all_queries()
    rng = random.Random(8000 + seed)
    langs = sorted(MIX_BP)
    sources = [f"s{i}" for i in range(rng.randint(2, 6))]
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    rows = []
    # sparse ids, out of order, some huge — membership is a pure row
    # function, so none of that may matter
    ids = rng.sample(range(0, 10_000_000), rng.randint(40, 300))
    for doc_id in ids:
        n_words = rng.randint(1, 120)
        text = " ".join(rng.choice(vocab) for _ in range(n_words))
        rows.append(
            (doc_id, text, rng.choice(langs), rng.choice(sources), len(text))
        )
    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    def hv(doc_id: int, const: int) -> int:
        return ((doc_id % SPLIT_M) * SPLIT_A + const) % SPLIT_M

    # --- mix rebalance: independent model -------------------------------
    by_lang: dict = {}
    for doc_id, text, lang, source, _ in rows:
        by_lang.setdefault(lang, []).append(doc_id)
    counts = {l: len(v) for l, v in by_lang.items() if l in MIX_BP}
    scale = min(counts[l] * 10000 // MIX_BP[l] for l in counts)
    want_mix = set()
    for l, members in by_lang.items():
        if l not in MIX_BP:
            continue
        quota = MIX_BP[l] * scale // 10000
        ranked = sorted(members, key=lambda i: (hv(i, 98765), i))
        want_mix.update((i, l) for i in ranked[:quota])
    got_mix = {
        (r.doc_id, r.lang)
        for r in zebra_spark.QUERIES["q_mix_rebalance"](spark, d).collect()
    }
    assert got_mix == want_mix, (seed, len(got_mix), len(want_mix))

    # --- token budget: independent model --------------------------------
    by_src: dict = {}
    for doc_id, text, lang, source, _ in rows:
        by_src.setdefault(source, []).append(
            (doc_id, len(text.split(" ")))
        )
    want_tb = set()
    for source, members in by_src.items():
        cum = 0
        for doc_id, nt in sorted(
            members, key=lambda t: (hv(t[0], 24680), t[0])
        ):
            cum += nt
            if cum > TOKEN_BUDGET_PER_SOURCE:
                break
            want_tb.add((doc_id, source, nt))
    got_tb = {
        (r.doc_id, r.source, r.n_tokens)
        for r in zebra_spark.QUERIES["q_token_budget_sample"](
            spark, d
        ).collect()
    }
    assert got_tb == want_tb, (seed, len(got_tb), len(want_tb))
