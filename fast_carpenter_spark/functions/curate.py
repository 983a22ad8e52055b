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


# ---------------------------------------------------------------------------
# Quality-rule cutflow: the reference's selection cutflow (All/Any tree,
# 3-counter protocol) applied to corpus curation — Gopher-style document
# quality rules with per-rule pass/fail lineage counts.
# ---------------------------------------------------------------------------


def quality_columns_sql(text_col: str, dialect: str) -> dict[str, str]:
    """Per-document quality feature columns, value-identical across
    engines (integer counts cast to BIGINT; ratios are IEEE-exact
    divisions of identical operands)."""
    from .text import STOPWORDS, langid_pred_sql, quality_score_sql, tokens_sql

    toks = tokens_sql(text_col, dialect)
    size_f = "size" if dialect == "spark" else "len"
    all_stop = [w for ws in STOPWORDS.values() for w in ws]
    lit = ", ".join(f"'{w}'" for w in all_stop)
    if dialect == "spark":
        n_stop = f"size(filter({toks}, t -> array_contains(array({lit}), t)))"
    else:
        n_stop = f"len(list_filter({toks}, t -> list_contains([{lit}], t)))"
    n_tok = f"{size_f}({toks})"
    return {
        "n_tok": f"CAST({n_tok} AS BIGINT)",
        "n_chars": f"CAST(length({text_col}) AS BIGINT)",
        "stop_ratio": (
            f"(CAST({n_stop} AS DOUBLE) / CAST(GREATEST({n_tok}, 1) AS DOUBLE))"
        ),
        "quality": quality_score_sql(text_col, dialect),
        "lang": langid_pred_sql(text_col, dialect),
    }


def quality_scored_df(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Map-side scoring pass (whole-stage codegen, zero shuffles): the
    input to the quality cutflow / filter stages."""
    cols = quality_columns_sql(text_col, "spark")
    return docs.selectExpr(
        "doc_id", *[f"{sql} AS {name}" for name, sql in cols.items()]
    )


def quality_scored_oracle_sql(text_col: str = "text") -> str:
    cols = quality_columns_sql(text_col, "duck")
    sel = ", ".join(f"{sql} AS {name}" for name, sql in cols.items())
    return f"SELECT doc_id, {sel} FROM documents"


# ---------------------------------------------------------------------------
# Eval-set decontamination: n-gram shingle overlap between candidate
# training documents and a held-out eval set (the GPT-3/PaLM-style
# 13-gram decontamination pass, at n=3 for the short synthetic corpus).
# ---------------------------------------------------------------------------

EVAL_MOD = 23  # doc_id % EVAL_MOD == 0 -> member of the eval set
DECON_N = 3  # shingle width


def decontaminate(
    docs: DataFrame, text_col: str = "text", n: int = DECON_N,
    eval_mod: int = EVAL_MOD,
) -> DataFrame:
    """Per-eval-document contamination: the fraction of its distinct
    n-gram shingles that also occur in any candidate (non-eval) document.

    Scale shape: both sides reduce to distinct shingle keys map-side
    (partial aggregation), then meet in ONE shuffle hash join keyed on
    the shingle — the eval side is tiny (a benchmark suite, thousands of
    docs) so at production scale it broadcasts and the corpus side never
    shuffles at all; no driver-side state.  Documents shorter than n
    tokens have no shingles and drop out on both engines identically.

    Returns (doc_id, n_shingles, n_hit, frac) for eval docs.
    """
    from .text import ngram_hashes_from_col_sql, token_hashes_column

    scored = docs.withColumn("_th", token_hashes_column(text_col))
    sh = scored.select(
        "doc_id",
        (F.col("doc_id") % eval_mod == 0).alias("is_eval"),
        F.explode(F.expr(ngram_hashes_from_col_sql("_th", n))).alias("sh"),
    )
    ev = (
        sh.filter("is_eval").select("doc_id", "sh").distinct()
    )
    cor = sh.filter("NOT is_eval").select("sh").distinct()
    hits = ev.join(
        cor.withColumn("_hit", F.lit(1)), "sh", "left"
    )
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("bigint").alias("n_hit"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_hit",
            F.expr(
                "CAST(n_hit AS DOUBLE) / CAST(n_shingles AS DOUBLE)"
            ).alias("frac"),
        )
    )


def decontaminate_oracle_sql(
    text_col: str = "text", n: int = DECON_N, eval_mod: int = EVAL_MOD,
) -> str:
    from .text import ngram_hashes_sql

    grams = ngram_hashes_sql(text_col, n, "duck")
    return f"""
WITH ev AS (
  SELECT doc_id, unnest(list_distinct({grams})) AS sh
  FROM documents WHERE doc_id % {eval_mod} = 0
),
cor AS (
  SELECT DISTINCT unnest({grams}) AS sh
  FROM documents WHERE doc_id % {eval_mod} <> 0
)
SELECT ev.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(COALESCE(sum(CASE WHEN cor.sh IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_hit,
       CAST(COALESCE(sum(CASE WHEN cor.sh IS NOT NULL THEN 1 END), 0) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS frac
FROM ev LEFT JOIN cor USING (sh)
GROUP BY ev.doc_id
"""


# --- Bloom-prefiltered decontamination semi-join ---------------------------

# Sized for the TEST corpus to actually exhibit false positives (the point
# of the diagnostic); production sizing is m >= ~10 bits/key (2^30+ for
# billions of eval keys) — the shape below is unchanged.
BLOOM_BITS = 512
# (a, b) per probe: h < 1e9+7 and a <= 131 keeps h*a+b well inside BIGINT
# under ANSI overflow checking.  NB: affine probes of ONE base hash are
# correlated (measured FP above the independent-hash bound) — production
# would Kirsch-Mitzenmacher with two independent base hashes; the plan
# shape is identical.
BLOOM_PROBES = [(31, 7), (97, 17), (131, 3)]


def _bloom_pos_sql(h: str, a: int, b: int) -> str:
    return f"(({h}) * {a} + {b}) % {BLOOM_BITS}"


def bloom_prefilter(
    docs: DataFrame, *, eval_filter: str = "doc_id % 10 = 0", text_col: str = "text"
) -> DataFrame:
    """Sketch-prefiltered membership test: build a Bloom filter (k probe
    positions per key, deterministic shared-text hashes) over the EVAL
    set's document fingerprints, broadcast its set-bit table, and flag
    every corpus document with (bloom_hit, exact_hit) — exact_hit ⊆
    bloom_hit by construction; the gap is the deterministic
    false-positive set.

    The 100 TB shape: the eval side compresses to <= m set-bit rows
    (broadcastable regardless of eval-set cardinality), the corpus side is
    one scan + a constant k-explode + a broadcast join — the pattern that
    replaces an unbroadcastable raw-key semi-join; Bloom-positives then
    feed the exact (shuffle) join at a tiny fraction of the input."""
    from .text import text_hash_sql

    spark = docs.sparkSession
    h = text_hash_sql(text_col, "spark")
    base = docs.selectExpr("doc_id", f"{h} AS h").localCheckpoint()
    ev = base.filter(eval_filter).select("h").distinct()
    probes = ", ".join(_bloom_pos_sql("h", a, b) for a, b in BLOOM_PROBES)
    bits = ev.selectExpr(f"explode(array({probes})) AS pos").distinct()
    pos = base.selectExpr("doc_id", f"explode(array({probes})) AS pos")
    k = len(BLOOM_PROBES)
    bh = (
        pos.join(F.broadcast(bits), "pos")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("nm"))
    )
    return (
        base.join(bh, "doc_id", "left")
        .join(
            F.broadcast(ev.withColumn("_e", F.lit(1))), "h", "left"
        )
        .selectExpr(
            "doc_id",
            f"COALESCE(nm, 0) = {k} AS bloom_hit",
            "_e IS NOT NULL AS exact_hit",
        )
    )


def bloom_prefilter_oracle_sql(
    *, eval_filter: str = "doc_id % 10 = 0", text_col: str = "text"
) -> str:
    from .text import text_hash_sql

    h = text_hash_sql(text_col, "duck")
    probes = ", ".join(
        f"({a}, {b})" for a, b in BLOOM_PROBES
    )
    k = len(BLOOM_PROBES)
    return f"""
WITH base AS (SELECT doc_id, {h} AS h FROM documents),
ev AS (SELECT DISTINCT h FROM base WHERE {eval_filter}),
kf(a, b) AS (SELECT * FROM (VALUES {probes})),
bits AS (SELECT DISTINCT (h * a + b) % {BLOOM_BITS} AS pos FROM ev CROSS JOIN kf),
pos AS (SELECT doc_id, (h * a + b) % {BLOOM_BITS} AS pos FROM base CROSS JOIN kf),
bh AS (SELECT doc_id, count(*) AS nm FROM pos JOIN bits USING (pos) GROUP BY doc_id)
SELECT base.doc_id, COALESCE(bh.nm, 0) = {k} AS bloom_hit,
       base.h IN (SELECT h FROM ev) AS exact_hit
FROM base LEFT JOIN bh USING (doc_id)
"""


# --- Deequ-style single-pass constraint audit ------------------------------

# (name, predicate-free metric spec) — every metric derives from exact
# integer counts so the audit is bit-identical across engines; thresholds
# live HERE, not in the caller, so the audit is a versioned contract.
CONSTRAINT_LANGS = ("en", "es", "de", "fr", "zh")
N_CHARS_LO, N_CHARS_HI = 1, 100_000


def constraints_audit(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Data-quality constraint audit in ONE aggregation pass (the Deequ /
    dbt-test pattern): completeness, key uniqueness, value ranges, domain
    containment, and cross-column consistency, emitted as a
    (constraint, metric, passed) report table.

    Scale: one corpus scan for ALL checks (the naive one-query-per-check
    audit reads it K times).  Every counter except uniqueness is map-side
    combinable into a single 1-row exchange; the exact
    ``count(DISTINCT doc_id)`` is the one data-sized shuffle (its keys),
    which exactness requires — swap it for the HLL sketch
    (functions/sketch.py, the ``hll_distinct`` query) when an approximate
    uniqueness metric is acceptable and the audit becomes shuffle-free.
    """
    langs = ", ".join(f"'{l}'" for l in CONSTRAINT_LANGS)
    agg = docs.selectExpr(
        "CAST(count(*) AS DOUBLE) AS n",
        f"CAST(count_if({text_col} IS NULL OR {text_col} = '') AS DOUBLE) AS n_empty",
        "CAST(count(*) - count(DISTINCT doc_id) AS DOUBLE) AS n_dup",
        f"CAST(count_if(n_chars < {N_CHARS_LO} OR n_chars > {N_CHARS_HI}) AS DOUBLE)"
        " AS n_oob",
        f"CAST(count_if(lang NOT IN ({langs})) AS DOUBLE) AS n_badlang",
        f"CAST(count_if(n_chars <> length({text_col})) AS DOUBLE) AS n_incons",
    )
    return agg.selectExpr(
        """stack(5,
           'completeness_text',   1.0 - n_empty / n,  n_empty = 0,
           'uniqueness_doc_id',   1.0 - n_dup / n,    n_dup = 0,
           'range_n_chars',       n_oob,              n_oob = 0,
           'domain_lang',         n_badlang,          n_badlang = 0,
           'consistency_n_chars', n_incons,           n_incons = 0
        ) AS (constraint, metric, passed)"""
    )


def constraints_audit_oracle_sql(text_col: str = "text") -> str:
    langs = ", ".join(f"'{l}'" for l in CONSTRAINT_LANGS)
    return f"""
WITH a AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(count(*) FILTER ({text_col} IS NULL OR {text_col} = '') AS DOUBLE)
           AS n_empty,
         CAST(count(*) - count(DISTINCT doc_id) AS DOUBLE) AS n_dup,
         CAST(count(*) FILTER (n_chars < {N_CHARS_LO} OR n_chars > {N_CHARS_HI})
           AS DOUBLE) AS n_oob,
         CAST(count(*) FILTER (lang NOT IN ({langs})) AS DOUBLE) AS n_badlang,
         CAST(count(*) FILTER (n_chars <> length({text_col})) AS DOUBLE)
           AS n_incons
  FROM documents)
SELECT 'completeness_text' AS constraint, 1.0 - n_empty / n AS metric,
       n_empty = 0 AS passed FROM a
UNION ALL SELECT 'uniqueness_doc_id', 1.0 - n_dup / n, n_dup = 0 FROM a
UNION ALL SELECT 'range_n_chars', n_oob, n_oob = 0 FROM a
UNION ALL SELECT 'domain_lang', n_badlang, n_badlang = 0 FROM a
UNION ALL SELECT 'consistency_n_chars', n_incons, n_incons = 0 FROM a
"""


# --- deny-list scrubbing (dictionary redaction) -----------------------------

REDACT_TOKENS = ("customer", "vector")
REDACT_MARK = "[REDACTED]"


def redact_pattern() -> str:
    """Word-bounded alternation over the deny list — identical semantics in
    Java regex (Spark) and RE2 (DuckDB): no backrefs, no lookaround."""
    return r"\b(" + "|".join(REDACT_TOKENS) + r")\b"


def redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deny-list scrubbing: replace every occurrence of a deny-listed token
    with a marker and report the per-document hit count.  Pure map-side
    codegen (regexp_replace / regexp_count) — the scrub of a 10^12-doc
    corpus is a zero-shuffle rewrite pipeline stage.  Only affected
    documents are emitted (the common rewrite-sink pattern: untouched rows
    are carried by reference from the previous snapshot)."""
    pat = redact_pattern()
    out = docs.select(
        "doc_id",
        F.regexp_count(F.col(text_col), F.lit(pat)).alias("n_redacted"),
        F.regexp_replace(F.col(text_col), pat, REDACT_MARK).alias("redacted"),
    )
    return out.filter(F.col("n_redacted") > 0)


def redact_oracle_sql(text_col: str = "text") -> str:
    pat = redact_pattern()
    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all({text_col}, '{pat}')) AS INT) AS n_redacted,
       regexp_replace({text_col}, '{pat}', '{REDACT_MARK}', 'g') AS redacted
FROM documents
WHERE len(regexp_extract_all({text_col}, '{pat}')) > 0
"""


# --- domain-mixture rebalance (training-data composition) --------------------
# A pre-training corpus is composed to a TARGET mixture (e.g. 50% en /
# 12.5% each of de/es/fr/zh) from whatever the crawl actually yielded.
# All-integer formulation so the composed corpus is bit-reproducible
# across engines, restarts and partitionings:
#   * targets are parts-per-1024 integers summing to 1024;
#   * the binding group caps the output: N = min_g floor(n_g * 1024 / w_g)
#     (taking more would overdraw some group or break the mixture);
#   * each group contributes take_g = floor(N * w_g / 1024) docs, chosen
#     as the take_g smallest by the same integer hash priority the other
#     samplers use (no transcendentals, no RNG state).
# Scale shape: one groupBy count (bounded by |groups|), a 1-row global
# cap attach, one per-group WindowGroupLimit — a single corpus shuffle.

TRAIN_MIX_TARGETS = {"en": 512, "de": 128, "es": 128, "fr": 128, "zh": 128}


def _train_mix_sql(dialect: str, targets: dict[str, int], table: str) -> str:
    assert sum(targets.values()) == 1024, "targets must sum to 1024"
    fdiv = "DIV" if dialect == "spark" else "//"
    vals = ", ".join(f"('{g}', {w})" for g, w in sorted(targets.items()))
    pr = "(doc_id * 2654435761) % 1000003"
    return f"""
WITH tgt(lang, w) AS (VALUES {vals}),
avail AS (
  SELECT lang, count(1) AS n_avail FROM {table} GROUP BY lang
),
cap AS (
  SELECT min((a.n_avail * 1024) {fdiv} t.w) AS n_total
  FROM avail a JOIN tgt t ON t.lang = a.lang
),
take AS (
  SELECT t.lang, a.n_avail, (c.n_total * t.w) {fdiv} 1024 AS n_take
  FROM tgt t JOIN avail a ON a.lang = t.lang CROSS JOIN cap c
),
ranked AS (
  SELECT d.doc_id, d.lang, d.n_chars,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY {pr}, d.doc_id) AS rk
  FROM {table} d JOIN tgt t ON t.lang = d.lang
),
sel AS (
  SELECT r.lang, r.doc_id, r.n_chars, t.n_avail, t.n_take
  FROM ranked r JOIN take t ON t.lang = r.lang AND r.rk <= t.n_take
)
SELECT lang, n_avail, n_take,
       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM sel
GROUP BY lang, n_avail, n_take
"""


def train_mix(
    docs: DataFrame, targets: dict[str, int] | None = None
) -> DataFrame:
    """Per-group composition report of the rebalanced corpus: the group
    sums over the EXACT selected doc set (sum_doc_id pins the selection
    itself, not just its size) — swap the final aggregate for ``SELECT *
    FROM sel`` to emit the composed corpus."""
    docs.createOrReplaceTempView("docs_mix")
    return docs.sparkSession.sql(
        _train_mix_sql("spark", targets or TRAIN_MIX_TARGETS, "docs_mix")
    )


def train_mix_oracle_sql(targets: dict[str, int] | None = None) -> str:
    return _train_mix_sql("duck", targets or TRAIN_MIX_TARGETS, "documents")
