"""Text-analysis surface over `documents` (SURVEY §2.B + north-star
training-data ops): word count, pairwise token-set Jaccard, token
counting, quality scoring, language-ID, fingerprinting.

All are native DataFrame ops (split/explode/groupBy/window) — the
explode-join-agg pattern shuffles on (source, word)-grain keys, which is
how it stays balanced at scale (the hot key is the word, not the doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zebra_spark.functions import rnd
from zebra_spark.io import load
from zebra_spark.registry import query, sql_rnd

JACCARD_THRESHOLD = 0.2


def tokens(spark: SparkSession, sf_dir: str, distinct: bool = True) -> DataFrame:
    t = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("word")
    )
    return t.distinct() if distinct else t


@query(
    "q_text_wordcount",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    )
    SELECT word, count(*) AS n, count(DISTINCT doc_id) AS n_docs
    FROM tok GROUP BY word
    """,
)
def q_text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tokenize -> explode -> count: the canonical text map/reduce."""
    tok = tokens(spark, sf_dir, distinct=False)
    return tok.groupBy("word").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


@query(
    "q_text_jaccard_pairs",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, source, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.source, a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM tok a
      JOIN tok b ON a.word = b.word AND a.source = b.source
                AND a.doc_id < b.doc_id
      GROUP BY a.source, a.doc_id, b.doc_id
    )
    SELECT i.source, i.doc_a, i.doc_b, i.n_common,
           {sql_rnd("i.n_common * 1.0 / (sa.n + sb.n - i.n_common)")} AS jaccard
    FROM inter i
    JOIN sz sa ON sa.doc_id = i.doc_a
    JOIN sz sb ON sb.doc_id = i.doc_b
    WHERE i.n_common * 1.0 / (sa.n + sb.n - i.n_common) >= {JACCARD_THRESHOLD}
    """,
)
def q_text_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dedup candidate scoring: token-set Jaccard for doc pairs
    within the same `source` group.

    Scale note: the pair space is bounded by the blocking key (`source`),
    mirroring MinHash-LSH banding where the band bucket is the blocking
    key — the full-corpus version is q_dedup_minhash (zebra_spark.queries
    .dedup), which generates candidate pairs from LSH bands instead of a
    quadratic per-group self-join.
    """
    tok = tokens(spark, sf_dir, distinct=True)
    sz = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    # pair generation via per-(source,word) sorted posting lists instead
    # of a token self-join: one groupBy shuffle, each unordered pair
    # emitted exactly once (docs sorted, inner slice starts past i).
    # Scale note: a posting list is bounded by docs-per-(source,word);
    # for web-scale corpora cap or drop stopword-grade terms first —
    # their pairs are exactly the ones Jaccard filters out anyway.
    grp = tok.groupBy("source", "word").agg(
        F.sort_array(F.collect_list("doc_id")).alias("docs")
    )
    pairs = grp.select(
        "source",
        F.explode(
            F.expr(
                "flatten(transform(docs, (x, i) ->"
                " transform(slice(docs, i + 2, size(docs)),"
                " y -> struct(x AS doc_a, y AS doc_b))))"
            )
        ).alias("p"),
    )
    inter = (
        pairs.select("source", "p.doc_a", "p.doc_b")
        .groupBy("source", "doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select(
            "source",
            "doc_a",
            "doc_b",
            "n_common",
            rnd(jac).alias("jaccard"),
        )
    )


# --- training-data text analysis (north-star ops) ---------------------------

FP_P = 1_000_000_007
FP_POWS = [pow(31, k, FP_P) for k in range(8)]


def word_hash_expr(col: str = "word"):
    """Per-token positional polynomial hash (same family as
    q_text_fingerprint): sum_i ascii(c_i) * 31^(i mod 8) mod p.

    Pure per-row native expression — no vocabulary join, no global
    window — so token-id assignment is embarrassingly parallel at any
    scale.  `sql_word_hash` is the DuckDB twin; both engines produce
    identical ids (collisions included), so hash-parity is exact.
    """
    pows = ", ".join(str(p) for p in FP_POWS)
    return F.expr(
        f"CASE WHEN length({col}) = 0 THEN CAST(0 AS BIGINT) ELSE"
        f" aggregate(sequence(1, length({col})), CAST(0 AS BIGINT),"
        f" (h, i) -> h + (CAST(ascii(substring({col}, i, 1)) AS BIGINT)"
        f" * element_at(array({pows}), ((i - 1) % 8) + 1)) % {FP_P})"
        f" % {FP_P} END"
    )


def sql_word_hash(col: str = "word") -> str:
    """DuckDB twin of word_hash_expr (see q_text_fingerprint oracle)."""
    pows = ", ".join(str(p) for p in FP_POWS)
    return (
        f"coalesce(CAST(list_sum(list_transform(range(1, length({col}) + 1),"
        f" i -> (CAST(ascii(substr({col}, i, 1)) AS BIGINT) *"
        f" ([{pows}])[(i - 1) % 8 + 1]) % {FP_P})) AS BIGINT), 0) % {FP_P}"
    )


@query(
    "q_text_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
           CAST(list_sum(list_transform(string_split(text, ' '),
                w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT) AS bpe_ish
    FROM documents
    """,
)
def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish estimate
    (ceil(len/4) subword pieces per word) via a native array fold."""
    d = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    bpe = F.aggregate(
        F.transform(words, lambda w: F.ceil(F.length(w) / 4.0).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return d.select(
        "doc_id",
        F.size(words).alias("ws_tokens"),
        bpe.alias("bpe_ish"),
    )


@query(
    "q_text_quality",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    stop AS (
      SELECT word FROM (
        SELECT word, count(*) AS n,
               row_number() OVER (ORDER BY count(*) DESC, word) AS rk
        FROM tok GROUP BY word
      ) WHERE rk <= 10
    )
    SELECT doc_id,
           count(*) AS n_tokens,
           count(DISTINCT word) AS n_distinct,
           {sql_rnd("count(DISTINCT word) * 1.0 / count(*)")} AS ttr,
           {sql_rnd("avg(length(word))")} AS avg_wlen,
           {sql_rnd("sum(CASE WHEN word IN (SELECT word FROM stop) THEN 1 ELSE 0 END) * 1.0 / count(*)")} AS stop_ratio
    FROM tok GROUP BY doc_id
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: token count, type-token ratio, mean word length,
    stopword ratio (stoplist = data-derived global top-10 words,
    deterministic count-desc/word-asc tie-break)."""
    tok = tokens(spark, sf_dir, distinct=False).select("doc_id", "word")
    wc = tok.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    # orderBy+limit -> TakeOrderedAndProject (distributed partial top-k);
    # a global row_number window would drag the whole vocabulary through
    # one partition
    stop = (
        wc.orderBy(F.col("n").desc(), "word")
        .limit(10)
        .select("word", F.lit(1).alias("is_stop"))
    )
    t = tok.join(F.broadcast(stop), "word", "left")
    return t.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("word").alias("n_distinct"),
        rnd(F.countDistinct("word") / F.count(F.lit(1))).alias("ttr"),
        rnd(F.avg(F.length("word"))).alias("avg_wlen"),
        rnd(F.sum(F.coalesce("is_stop", F.lit(0))) / F.count(F.lit(1))).alias(
            "stop_ratio"
        ),
    )


@query(
    "q_text_langid",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, lang, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    lv AS (
      SELECT lang, word FROM (
        SELECT lang, word, row_number() OVER (
          PARTITION BY lang ORDER BY count(*) DESC, word) AS rk
        FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
              FROM documents)
        GROUP BY lang, word
      ) WHERE rk <= 20
    ),
    score AS (
      SELECT t.doc_id, lv.lang AS cand_lang, count(*) AS overlap
      FROM (SELECT DISTINCT doc_id, word FROM tok) t
      JOIN lv ON t.word = lv.word
      GROUP BY t.doc_id, lv.lang
    ),
    pick AS (
      SELECT doc_id, cand_lang AS pred_lang FROM (
        SELECT doc_id, cand_lang, row_number() OVER (
          PARTITION BY doc_id ORDER BY overlap DESC, cand_lang) AS rk
        FROM score
      ) WHERE rk = 1
    )
    SELECT d.doc_id, d.lang, p.pred_lang,
           CAST(CASE WHEN d.lang = p.pred_lang THEN 1 ELSE 0 END AS INTEGER)
             AS correct
    FROM documents d JOIN pick p ON d.doc_id = p.doc_id
    """,
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: per-language top-20 vocabulary (derived
    from the corpus itself), predict the language with max distinct-word
    overlap.  n-gram-profile langid reduced to vocab-profile — same
    argmax-over-profiles shape, fully portable."""
    d = load(spark, sf_dir, "documents")
    tok_all = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("word")
    )
    lv = (
        tok_all.groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(F.col("n").desc(), "word")
            ),
        )
        .filter(F.col("rk") <= 20)
        .select(F.col("lang").alias("cand_lang"), "word")
    )
    dtok = tok_all.select("doc_id", "word").distinct()
    score = (
        dtok.join(F.broadcast(lv), "word")
        .groupBy("doc_id", "cand_lang")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    pick = (
        score.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("overlap").desc(), "cand_lang"
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("cand_lang").alias("pred_lang"))
    )
    return (
        d.select("doc_id", "lang")
        .join(pick, "doc_id")
        .select(
            "doc_id",
            "lang",
            "pred_lang",
            F.when(F.col("lang") == F.col("pred_lang"), 1)
            .otherwise(0)
            .cast("int")
            .alias("correct"),
        )
    )


@query(
    "q_text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           coalesce(CAST(list_sum(list_transform(range(1, length(text) + 1),
                i -> (CAST(ascii(substr(text, i, 1)) AS BIGINT) *
                      ([{", ".join(str(p) for p in FP_POWS)}])[(i - 1) % 8 + 1])
                     % {FP_P}))
                AS BIGINT), 0) % {FP_P} AS fingerprint
    FROM documents
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: positional polynomial hash
    sum_i ascii(c_i) * 31^(i mod 8) mod p — a rolling-hash-family
    fingerprint expressible as one native array fold (no UDF)."""
    d = load(spark, sf_dir, "documents")
    pows = ", ".join(str(p) for p in FP_POWS)
    # per-term mod keeps the accumulator far from bigint overflow even
    # for huge/CJK texts (ascii() yields full codepoints); empty text ->
    # 0 on both engines (Spark's sequence(1,0) is DESCENDING, not empty,
    # so it must be guarded, and DuckDB's empty-list sum is NULL)
    fp = F.expr(
        f"CASE WHEN length(text) = 0 THEN CAST(0 AS BIGINT) ELSE"
        f" aggregate(sequence(1, length(text)), CAST(0 AS BIGINT),"
        f" (h, i) -> h + (CAST(ascii(substring(text, i, 1)) AS BIGINT)"
        f" * element_at(array({pows}), ((i - 1) % 8) + 1)) % {FP_P})"
        f" % {FP_P} END"
    )
    return d.select("doc_id", fp.alias("fingerprint"))


@query(
    "q_array_funcs2",
    oracle="""
    SELECT doc_id,
           CAST(list_contains(string_split(text, ' '), 'data') AS BOOLEAN)
             AS has_data,
           CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER)
             AS n_distinct,
           array_to_string(list_sort(list_distinct(
             string_split(text, ' ')))[1:3], '-') AS first3
    FROM documents
    """,
)
def q_array_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array battery on token arrays: contains, distinct-size, sorted
    slice joined to a string."""
    d = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.array_contains(words, "data").alias("has_data"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
        F.array_join(
            F.slice(F.array_sort(F.array_distinct(words)), 1, 3), "-"
        ).alias("first3"),
    )


@query(
    "q_regex_funcs",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[aeiou]')) AS INTEGER)
             AS n_vowels,
           CAST(len(regexp_extract_all(text, '\\b[a-z]{4}\\b')) AS INTEGER)
             AS n_four_letter,
           regexp_extract(text, '([a-z]{6,})', 1) AS first_long_word
    FROM documents
    """,
)
def q_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex battery: match counting and first-match extraction."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit("[aeiou]")).cast("int").alias("n_vowels"),
        F.regexp_count("text", F.lit(r"\b[a-z]{4}\b")).cast("int").alias(
            "n_four_letter"
        ),
        F.regexp_extract("text", "([a-z]{6,})", 1).alias("first_long_word"),
    )
