"""Corpus curation for training-data pipelines: stratified per-group
selection and deterministic hash-based splits.

The two primitives every large-corpus curation run needs after scoring:
* keep the top-K documents per stratum (language here; domain/source in
  production) by quality — one window over a (lang)-keyed shuffle, with
  `WindowGroupLimit` pushdown so each partition keeps only K rows before
  the final sort (no global materialization of the loser set);
* assign a deterministic train/val split from a content fingerprint, so
  the split is stable across re-runs, engines, and table re-partitioning
  (never `rand()` — not reproducible, not engine-portable).

Scale notes (10^9+ docs): the quality score and fingerprint are map-side
arithmetic (whole-stage codegen); the only shuffle is the window's
group-by-stratum exchange; skewed strata (one language dominating) are
bounded by the group-limit pushdown — each map task pre-trims to K per
stratum before exchanging.

ref: the reference's per-dataset event selection + weighted export
(fast_carpenter/summary/binned_dataframe.py collector + dataset column)
is the same select-then-stamp pattern, lifted to corpus curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import quality_score_sql, text_hash_sql

TOP_K = 40  # kept docs per stratum
TRAIN_PCT = 8  # _fp % 10 < TRAIN_PCT -> train


def stratified_topk(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
    k: int = TOP_K,
) -> DataFrame:
    """Top-k docs per ``group_col`` by quality score (ties -> smaller
    doc_id), stamped with a deterministic content-hash train/val split.

    Returns (doc_id, lang, quality, rk, split)."""
    q = quality_score_sql(text_col, "spark")
    fp = text_hash_sql(text_col, "spark")
    scored = docs.selectExpr(
        "doc_id",
        group_col,
        f"{q} AS quality",
        f"{fp} AS _fp",
    )
    w = Window.partitionBy(group_col).orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
        .withColumn(
            "split",
            F.expr(
                f"CASE WHEN _fp % 10 < {TRAIN_PCT} THEN 'train' ELSE 'val' END"
            ),
        )
        .drop("_fp")
    )


def stratified_topk_oracle_sql(
    text_col: str = "text", group_col: str = "lang", k: int = TOP_K
) -> str:
    q = quality_score_sql(text_col, "duck")
    fp = text_hash_sql(text_col, "duck")
    return f"""
WITH s AS (
  SELECT doc_id, {group_col}, {q} AS quality, {fp} AS _fp FROM documents
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY {group_col} ORDER BY quality DESC, doc_id
  ) AS rk FROM s
)
SELECT doc_id, {group_col}, quality, rk,
       CASE WHEN _fp % 10 < {TRAIN_PCT} THEN 'train' ELSE 'val' END AS split
FROM r WHERE rk <= {k}
"""


# ---------------------------------------------------------------------------
# Corpus term statistics: per-document top TF-IDF terms.
# ---------------------------------------------------------------------------

TFIDF_K = 3


def tfidf_topk(docs: DataFrame, text_col: str = "text", k: int = TFIDF_K) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    idf uses the RATIO form (N+1)/(df+1) instead of its logarithm: log/ln
    builtins differ between engines in the last ulp (same reason the
    geodesic joins never expose haversine values), while +,*,/ on doubles
    are correctly rounded and bit-identical — so the score column itself
    is hash-exact cross-engine.  The log is monotone in the ratio, so for
    a FIXED term the ranking pressure is the same; rankings across terms
    differ from the textbook log variant, which is fine for a
    vocabulary-audit pass and buys exact verifiability.

    Scale: tf = one (doc, token) groupBy; df = one token groupBy with
    map-side partial aggregation (hot stopwords combine before the
    shuffle); join tf<-df on token; one doc-keyed window with group-limit
    pushdown.  No driver-side data beyond the corpus row count N (a
    planning scalar, like the spatial join's cover resolutions).

    Returns (doc_id, token, tf, df, score, rk).
    """
    from .text import tokens_sql

    n_docs = docs.count()
    toks = docs.selectExpr(
        "doc_id", f"explode({tokens_sql(text_col, 'spark')}) AS token"
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    scored = tf.join(df_, "token").withColumn(
        "score",
        F.expr(
            f"CAST(tf AS DOUBLE) * (CAST({n_docs + 1} AS DOUBLE) / CAST(df + 1 AS DOUBLE))"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
        .select("doc_id", "token", "tf", "df", "score", "rk")
    )


def tfidf_topk_oracle_sql(text_col: str = "text", k: int = TFIDF_K) -> str:
    """Self-contained in N: the corpus size enters as a scalar subquery, so
    the same oracle string is exact at every scale factor."""
    from .text import tokens_sql

    return f"""
WITH toks AS (
  SELECT doc_id, unnest({tokens_sql(text_col, 'duck')}) AS token FROM documents
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
dft AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, dft.df,
         CAST(tf.tf AS DOUBLE) * (CAST((SELECT count(*) + 1 FROM documents) AS DOUBLE) / CAST(dft.df + 1 AS DOUBLE)) AS score
  FROM tf JOIN dft USING (token)
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rk
  FROM scored
)
SELECT doc_id, token, tf, df, score, rk FROM r WHERE rk <= {k}
"""
