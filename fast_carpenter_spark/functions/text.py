"""Text analysis for training-data pipelines: tokenization, portable token
hashing, language-ID heuristic, quality scoring, document fingerprinting.

Everything is expressed as SQL over built-ins (split / transform /
aggregate) so Spark keeps it in whole-stage codegen; each helper emits both
Spark SQL and DuckDB SQL from the same arithmetic so oracle checks are
exact.  The token hash is a polynomial rolling hash over character codes:

    h(tok) = fold over chars c: (acc * 31 + ascii(c)) % 1_000_000_007

(DuckDB's list_reduce has no init value — it seeds with the first element,
which equals Spark's aggregate(0, ...) after one step, so the folds agree.)
"""

from __future__ import annotations

import pandas as pd

HASH_MOD = 1_000_000_007

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "de", "los", "y"],
    "fr": ["le", "les", "et", "des", "un"],
}


def tokens_sql(text: str, dialect: str) -> str:
    """Whitespace tokenization, empties dropped."""
    if dialect == "spark":
        return f"filter(split({text}, ' '), t -> length(t) > 0)"
    return f"list_filter(string_split({text}, ' '), t -> length(t) > 0)"


def token_hash_sql(tok: str, dialect: str) -> str:
    """Polynomial rolling hash of one token (BIGINT, < 1e9+7)."""
    if dialect == "spark":
        return (
            f"aggregate(sequence(1, length({tok})), CAST(0 AS BIGINT), "
            f"(acc, i) -> (acc * 31 + ascii(substring({tok}, i, 1))) % {HASH_MOD})"
        )
    return (
        f"list_reduce(list_transform(range(1, length({tok}) + 1), "
        f"i -> CAST(ascii(substr({tok}, i, 1)) AS BIGINT)), "
        f"(acc, c) -> (acc * 31 + c) % {HASH_MOD})"
    )


def token_hashes_sql(text: str, dialect: str) -> str:
    """array<bigint> of token hashes for a text column."""
    toks = tokens_sql(text, dialect)
    if dialect == "spark":
        return f"transform({toks}, _t -> {token_hash_sql('_t', 'spark')})"
    return f"list_transform({toks}, _t -> {token_hash_sql('_t', 'duck')})"


def text_hash_sql(text: str, dialect: str) -> str:
    """Whole-document rolling-hash fingerprint (includes spaces/order)."""
    return token_hash_sql(text, dialect)


def ngram_hashes_sql(text: str, n: int, dialect: str) -> str:
    """Hashes of token n-gram shingles: h = sum_i h_tok[i] * 31^(n-1-i) mod M.
    Empty when the document has fewer than ``n`` tokens."""
    hs = token_hashes_sql(text, dialect)
    if dialect == "spark":
        parts = " + ".join(
            f"try_element_at(_hs, _i + {j + 1}) * {31 ** (n - 1 - j)}" for j in range(n)
        )
        body = (
            f"transform(sequence(0, size(_hs) - {n}), _i -> ({parts}) % {HASH_MOD})"
        )
        return (
            f"(CASE WHEN size({hs}) >= {n} THEN {body.replace('_hs', f'({hs})')} "
            f"ELSE CAST(array() AS ARRAY<BIGINT>) END)"
        )
    parts = " + ".join(
        f"list_extract(_hs, _i + {j + 1}) * {31 ** (n - 1 - j)}" for j in range(n)
    )
    body = f"list_transform(range(0, len(_hs) - {n} + 1), _i -> ({parts}) % {HASH_MOD})"
    return (
        f"(CASE WHEN len({hs}) >= {n} THEN {body.replace('_hs', f'({hs})')} "
        f"ELSE CAST([] AS BIGINT[]) END)"
    )


def langid_scores_sql(text: str, dialect: str) -> dict[str, str]:
    """Per-language stopword counts (multiplicity-aware)."""
    toks = tokens_sql(text, dialect)
    out = {}
    for lang, words in STOPWORDS.items():
        lit = ", ".join(f"'{w}'" for w in words)
        if dialect == "spark":
            out[lang] = f"size(filter({toks}, t -> array_contains(array({lit}), t)))"
        else:
            out[lang] = f"len(list_filter({toks}, t -> list_contains([{lit}], t)))"
    return out


def langid_pred_sql(text: str, dialect: str) -> str:
    """argmax language with deterministic ties (fixed CASE order)."""
    s = langid_scores_sql(text, dialect)
    langs = list(STOPWORDS)
    best = f"GREATEST({', '.join(s[l] for l in langs)})"
    cases = " ".join(f"WHEN {s[l]} = _best THEN '{l}'" for l in langs)
    # evaluated in declared order -> first max wins (deterministic)
    expr = f"(CASE {cases} ELSE 'unk' END)"
    # inline _best
    return expr.replace("_best", best)


def quality_score_sql(text: str, dialect: str) -> str:
    """Composite quality score from length / token / stopword features.
    Pure arithmetic on identical doubles -> exact cross-engine parity."""
    toks = tokens_sql(text, dialect)
    n_tok = f"size({toks})" if dialect == "spark" else f"len({toks})"
    all_stop = [w for ws in STOPWORDS.values() for w in ws]
    lit = ", ".join(f"'{w}'" for w in all_stop)
    if dialect == "spark":
        n_stop = f"size(filter({toks}, t -> array_contains(array({lit}), t)))"
    else:
        n_stop = f"len(list_filter({toks}, t -> list_contains([{lit}], t)))"
    n_chars = f"length({text})"
    return (
        f"(0.3 * LEAST(CAST({n_tok} AS DOUBLE) / 64.0, 1.0) "
        f"+ 0.4 * (CAST({n_stop} AS DOUBLE) / CAST(GREATEST({n_tok}, 1) AS DOUBLE)) "
        f"+ 0.3 * LEAST(CAST({n_chars} AS DOUBLE) / 512.0, 1.0))"
    )


def ngram_hashes_from_col_sql(hs_col: str, n: int) -> str:
    """Spark: n-gram shingle hashes over an ALREADY-MATERIALIZED token-hash
    array column — tokenization/hashing runs once per row instead of being
    textually inlined at every occurrence (measured ~4x less CPU than
    ngram_hashes_sql on the hot dedup path)."""
    parts = " + ".join(
        f"try_element_at({hs_col}, _i + {j + 1}) * {31 ** (n - 1 - j)}" for j in range(n)
    )
    return (
        f"(CASE WHEN size({hs_col}) >= {n} THEN "
        f"transform(sequence(0, size({hs_col}) - {n}), _i -> ({parts}) % {HASH_MOD}) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END)"
    )


# ---------------------------------------------------------------------------
# Arrow-batched token hashing — the scale path.
#
# The SQL formulation (token_hashes_sql) folds per CHARACTER through an
# interpreted higher-order expression: measured ~4us/char, which at 10^12
# documents is the text pipeline's bottleneck.  This numpy kernel computes
# the identical values ((acc*31 + code) % M fold == sum(code_i * 31^(L-1-i))
# mod M with powers reduced mod M; every term < 2.6e11 so int64 never
# overflows) vectorized over whole Arrow batches: measured ~80x faster.
# The SQL twin remains the DuckDB oracle; equality is asserted in tests.
# ---------------------------------------------------------------------------


def token_hashes_batch(texts) -> "list":
    """Vectorized token hashes for a batch of strings (numpy; exact parity
    with token_hashes_sql)."""
    import numpy as np

    doc_toks = [[t for t in s.split(" ") if t] if s else [] for s in texts]
    n_toks = np.fromiter((len(ts) for ts in doc_toks), dtype=np.int64, count=len(doc_toks))
    all_toks = [t for ts in doc_toks for t in ts]
    if not all_toks:
        return [np.empty(0, dtype=np.int64) for _ in doc_toks]
    lens = np.fromiter((len(t) for t in all_toks), dtype=np.int64, count=len(all_toks))
    # UTF-32-LE: one uint32 per code point, so offsets (len() in code points)
    # align with the code buffer and values equal ascii()/ord — UTF-8 bytes
    # would desync on any non-ASCII char and hash the wrong values.
    codes = np.frombuffer("".join(all_toks).encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    ends = np.cumsum(lens)
    starts = ends - lens
    idx = np.arange(codes.shape[0], dtype=np.int64)
    off_in_tok = idx - np.repeat(starts, lens)
    pow_idx = np.repeat(lens, lens) - 1 - off_in_tok
    maxlen = int(lens.max())
    powers = np.empty(maxlen, dtype=np.int64)
    p = 1
    for i in range(maxlen):
        powers[i] = p
        p = (p * 31) % HASH_MOD
    # mod per term: code points reach 0x10FFFF, so an unreduced sum could
    # overflow int64 on pathological tokens; reduced terms are < 1e9+7
    terms = (codes * powers[pow_idx]) % HASH_MOD
    tok_hash = np.add.reduceat(terms, starts) % HASH_MOD
    doc_ends = np.cumsum(n_toks)
    doc_starts = doc_ends - n_toks
    return [tok_hash[s:e] for s, e in zip(doc_starts, doc_ends)]


def token_hashes_column(text_col: str):
    """Spark Column: Arrow-batched token hashes (array<bigint>) — use this
    on hot paths; token_hashes_sql for oracle parity."""
    from pyspark.sql import functions as F, types as T

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _udf(text: pd.Series) -> pd.Series:
        return pd.Series(token_hashes_batch(text.fillna("").tolist()))

    return _udf(F.col(text_col))


BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def subword_count_sql(text: str, dialect: str) -> str:
    """BPE-ish subword count: runs of letters, runs of digits, and single
    punctuation marks each count as one token (the pre-tokenization split
    most BPE vocabularies start from)."""
    if dialect == "spark":
        return f"size(regexp_extract_all({text}, '{BPE_TOKEN_RE}', 0))"
    return f"len(regexp_extract_all({text}, '{BPE_TOKEN_RE}'))"


def doc_hash_batch(texts) -> "list":
    """Vectorized whole-document fingerprint (polynomial rolling hash over
    the full text incl. spaces) — exact parity with text_hash_sql; same
    mod-power formulation as token_hashes_batch but one segment per doc."""
    import numpy as np

    n = len(texts)
    strs = ["" if t is None else t for t in texts]
    lens = np.fromiter((len(t) for t in strs), dtype=np.int64, count=n)
    out = np.zeros(n, dtype=np.int64)
    nz = lens > 0
    if not nz.any():
        return out.tolist()
    # code points (UTF-32-LE), not UTF-8 bytes: keeps offsets aligned with
    # len() and values equal to the oracle's ascii() fold on non-ASCII text
    codes = np.frombuffer("".join(strs).encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    ends = np.cumsum(lens)
    starts = ends - lens
    idx = np.arange(codes.shape[0], dtype=np.int64)
    off = idx - np.repeat(starts, lens)
    pow_idx = np.repeat(lens, lens) - 1 - off
    maxlen = int(lens.max())
    powers = np.empty(maxlen, dtype=np.int64)
    p = 1
    for i in range(maxlen):
        powers[i] = p
        p = (p * 31) % HASH_MOD
    # chunk the per-doc dot products so partial sums never overflow int64:
    # each term < 256 * HASH_MOD < 2.6e11; 3.5e7 terms would overflow, so
    # reduce in <= 1024-char chunks with a mod between chunks
    CH = 1024
    acc = np.zeros(n, dtype=np.int64)
    shift_pow = np.empty(CH + 1, dtype=np.int64)
    shift_pow[0] = 1
    for i in range(1, CH + 1):
        shift_pow[i] = (shift_pow[i - 1] * 31) % HASH_MOD
    terms = codes
    for s_idx in range(n):
        if lens[s_idx] == 0:
            continue
        a, b = starts[s_idx], ends[s_idx]
        h = 0
        for cs in range(a, b, CH):
            ce = min(cs + CH, b)
            seg = terms[cs:ce]
            L = ce - cs
            h = (h * shift_pow[L]) % HASH_MOD
            h = (h + int((seg * powers[L - 1 - np.arange(L)] % HASH_MOD).sum() % HASH_MOD)) % HASH_MOD
        out[s_idx] = h
    return out.tolist()


def doc_hash_column(text_col: str):
    """Spark Column: Arrow-batched whole-document fingerprint."""
    from pyspark.sql import functions as F, types as T

    @F.pandas_udf(T.LongType())
    def _udf(text: pd.Series) -> pd.Series:
        return pd.Series(doc_hash_batch(text.tolist()), dtype="int64")

    return _udf(F.col(text_col))


def simhash_batch(texts, bits: int = 32) -> "list":
    """Vectorized SimHash over a batch: token hashes via token_hashes_batch,
    then bit k of the fingerprint = sign of sum over tokens of
    ((h >> k & 1) * 2 - 1).  Exact parity with dedup.simhash_sql, which
    re-derives the token hashes once PER BIT (32x) in interpreted SQL."""
    import numpy as np

    th = token_hashes_batch(texts)
    n_toks = np.fromiter((len(a) for a in th), dtype=np.int64, count=len(th))
    out = np.zeros(len(th), dtype=np.int64)
    nz = n_toks > 0
    if not nz.any():
        return out.tolist()
    flat = np.concatenate([a for a in th if len(a)])
    starts = np.concatenate([[0], np.cumsum(n_toks[nz])[:-1]])
    # accumulate one bit at a time: peak memory stays O(total_tokens)
    # instead of the O(total_tokens * bits) dense +-1 matrix, which at
    # 64Ki-record Arrow batches with realistic doc lengths is multiple GB
    fp = np.zeros(int(nz.sum()), dtype=np.int64)
    for k in range(bits):
        bit_pm = (((flat >> k) & 1) * 2 - 1)  # +-1 per token, this bit only
        sums_k = np.add.reduceat(bit_pm, starts)
        fp |= (sums_k > 0).astype(np.int64) << k
    out[nz] = fp
    return out.tolist()


def simhash_column(text_col: str, bits: int = 32):
    """Spark Column: Arrow-batched SimHash fingerprint."""
    from pyspark.sql import functions as F, types as T

    @F.pandas_udf(T.LongType())
    def _udf(text: pd.Series) -> pd.Series:
        return pd.Series(simhash_batch(text.tolist(), bits), dtype="int64")

    return _udf(F.col(text_col))


# --- Winnowing fingerprints (MOSS-style rolling-hash min-sampling) ----------
#
# The document-fingerprinting scheme with the POSITIONAL guarantee MinHash
# lacks: selecting the minimum k-gram hash in every w-window means any two
# documents sharing a substring of >= w + k - 1 tokens share at least one
# selected fingerprint — so overlap detection is exact-by-construction for
# long shared runs, not probabilistic.  Both engines evaluate the same
# logical algorithm through their list dialects (shared constants, same
# remix), so fingerprints match bit-for-bit.
#
# Evaluation is STAGED (grams -> remixed -> window mins as separate select
# layers): inlining the gram hashing into every window's slice-min would
# textually expand the token fold per window — the same plan blow-up the PQ
# distance polynomials hit (NOTES_r3 #10) — whereas a staged column is
# computed once per row.
#
# Scale shape: selection is pure map-side array algebra (no shuffle); the
# overlap join is a posting-list equi-join on the fingerprint with a
# common-fingerprint frequency cap (df > cap dropped — boilerplate shared
# by every doc is noise for plagiarism-style matching and the skew pivot
# for the join).

WINNOW_K = 3  # k-gram shingle length (tokens)
WINNOW_W = 4  # winnowing window (shingles)
WINNOW_DF_CAP = 50  # drop fingerprints shared by more docs than this


def winnow_fps_query_sql(
    dialect: str,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    docs: str = "documents",
) -> str:
    """(doc_id, fp) rows of distinct winnowed fingerprints per document:
    avalanche-remixed k-gram hashes, min per w-window; short docs
    (0 < n_grams < w) keep the global min so no non-empty doc goes
    unfingerprinted."""
    grams = ngram_hashes_sql("text", k, dialect)
    remix = f"(_g * 2654435761 + 40503) % {HASH_MOD}"
    if dialect == "spark":
        # ROW-BASED sliding min: posexplode the gram hashes, then one
        # doc_id-partitioned window (ROWS BETWEEN CURRENT AND w-1
        # FOLLOWING).  The array formulation (min per slice) is a trap on
        # Spark: CollapseProject inlines the gram-hash fold into every
        # window's slice, recomputing the whole array per window — O(L^2)
        # per doc and a ~100x measured blow-up.  Generate (explode) is a
        # collapse barrier, and the window shuffle on doc_id is the same
        # single-shuffle shape as every per-doc stage.
        rh = remix.replace("_g", "gh")
        return f"""
WITH g AS (
  SELECT doc_id, posexplode(grams) AS (idx, gh) FROM (
    SELECT doc_id, {grams} AS grams FROM {docs}
  )
),
r AS (
  SELECT doc_id, idx, {rh} AS rh,
         count(*) OVER (PARTITION BY doc_id) AS n
  FROM g
),
wins AS (
  SELECT doc_id, idx, n,
         min(rh) OVER (
           PARTITION BY doc_id ORDER BY idx
           ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING
         ) AS m
  FROM r
)
SELECT DISTINCT doc_id, m AS fp FROM wins WHERE n >= {w} AND idx <= n - {w}
UNION ALL
SELECT doc_id, min(rh) AS fp FROM r GROUP BY doc_id HAVING count(*) < {w}
"""
    rem = f"list_transform(grams, _g -> {remix})"
    wins = (
        f"list_transform(range(1, len(rem) - {w} + 2), "
        f"_i -> list_min(rem[_i:_i + {w} - 1]))"
    )
    fps = (
        f"CASE WHEN len(rem) >= {w} THEN list_distinct({wins}) "
        f"WHEN len(rem) > 0 THEN [list_min(rem)] "
        f"ELSE CAST([] AS BIGINT[]) END"
    )
    return f"""
SELECT doc_id, unnest(fps) AS fp FROM (
  SELECT doc_id, {fps} AS fps FROM (
    SELECT doc_id, {rem} AS rem FROM (
      SELECT doc_id, {grams} AS grams FROM {docs}
    )
  )
)
"""


def winnow_overlap_query_sql(
    dialect: str,
    min_shared: int = 2,
    df_cap: int = WINNOW_DF_CAP,
) -> str:
    """Document pairs sharing >= min_shared winnowed fingerprints, via a
    posting-list equi-join on the fingerprint.  Fingerprints with document
    frequency > df_cap are dropped first (shared boilerplate = noise AND
    the join's skew pivot; the rule text is shared so capped semantics stay
    exact across engines)."""
    fps = winnow_fps_query_sql(dialect)
    if dialect == "spark":
        # Spark INLINES non-materialized CTEs, so the groupBy-then-join-back
        # df-cap formulation recomputes the whole fingerprint stream once
        # per reference (the tile_contour lesson).  A count() window over
        # one fps pass computes the document frequency on the SAME fp
        # shuffle the self-join needs — one fingerprint stream, total.
        return f"""
WITH kept AS (
  SELECT doc_id, fp FROM (
    SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS df FROM ({fps})
  ) WHERE df <= {df_cap}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= {min_shared}
"""
    # DuckDB materializes multiply-referenced CTEs, so the straightforward
    # groupBy + join-back stays the INDEPENDENT oracle formulation.
    return f"""
WITH fps AS ({fps}),
rare AS (
  SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {df_cap}
),
kept AS (SELECT f.doc_id, f.fp FROM fps f JOIN rare r ON r.fp = f.fp)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= {min_shared}
"""


def winnow_fps_df(docs, k: int = WINNOW_K, w: int = WINNOW_W):
    """Arrow-kernel hot path for winnowing: token hashing via the batched
    numpy kernel (~80x the SQL char fold), gram/remix/sliding-min as the
    same row-based SQL shape as winnow_fps_query_sql('spark').  Values are
    identical to the SQL twin (asserted in tests); the oracle stays the
    independent DuckDB list formulation."""
    from pyspark.sql import Window as W_, functions as F

    remix = f"(gh * 2654435761 + 40503) % {HASH_MOD}"
    g = docs.select(
        "doc_id", token_hashes_column("text").alias("ths")
    ).select(
        "doc_id",
        F.posexplode(F.expr(ngram_hashes_from_col_sql("ths", k))).alias("idx", "gh"),
    )
    r = g.select(
        "doc_id", "idx", F.expr(remix).alias("rh")
    ).withColumn("n", F.count(F.lit(1)).over(W_.partitionBy("doc_id")))
    wins = r.withColumn(
        "m",
        F.min("rh").over(
            W_.partitionBy("doc_id").orderBy("idx").rowsBetween(0, w - 1)
        ),
    )
    sel = (
        wins.filter(f"n >= {w} AND idx <= n - {w}")
        .select("doc_id", F.col("m").alias("fp"))
        .distinct()
    )
    short = (
        r.groupBy("doc_id")
        .agg(F.min("rh").alias("fp"), F.count(F.lit(1)).alias("cnt"))
        .filter(f"cnt < {w}")
        .select("doc_id", "fp")
    )
    return sel.unionByName(short)


def winnow_overlap_df(docs, min_shared: int = 2, df_cap: int = WINNOW_DF_CAP):
    """Arrow-kernel hot path for the overlap join (see
    winnow_overlap_query_sql for the shape rationale)."""
    from pyspark.sql import Window as W_, functions as F

    fps = winnow_fps_df(docs)
    kept = (
        fps.withColumn("df", F.count(F.lit(1)).over(W_.partitionBy("fp")))
        .filter(f"df <= {df_cap}")
        .select("doc_id", "fp")
    )
    a = kept.select(F.col("doc_id").alias("doc_a"), "fp")
    b = kept.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter("doc_a < doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(f"n_shared >= {min_shared}")
    )
