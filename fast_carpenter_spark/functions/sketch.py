"""Count-min sketch heavy hitters — bounded-state frequency estimation.

The exact heavy-hitter pass (token_topk) shuffles one row per DISTINCT
token; at 10^12 documents the distinct-token cardinality is itself huge
(typos, ids, urls), so the groupBy state grows with the corpus.  The
count-min sketch replaces it with a FIXED d×w counter grid
(D_ROWS × W_COLS = 1024 cells here): the build is a map-side explode to
(row, cell) pairs + one bounded-cardinality groupBy — sketch size is
independent of corpus size, the property that matters at 100 TB.  Point
estimates are `min over rows of cell count`, a one-sided overestimate
(est >= true count always; equality unless every row collides).

All hashing is the repo's portable polynomial token hash re-mixed with
per-row affine constants mod a prime — pure integer arithmetic emitted in
both dialects, so the DuckDB oracle reproduces the sketch bit-for-bit.
The query keeps the exact count alongside the estimate so the
overestimate invariant is itself oracle-checked.

ref parity note: the reference has no sketching; this extends the
training-data-pipeline surface (same family as curate.bloom_prefilter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import HASH_MOD, token_hash_sql, tokens_sql

D_ROWS = 4
W_COLS = 256
# per-row affine remix h_j(x) = ((x * A_j + B_j) % P) % W; P prime > any
# token hash, products bounded by ~7e13 (exact BIGINT in both engines)
_A = (1, 40503, 69621, 48271)
_B = (12345, 30307, 54321, 9973)


def cms_cells_sql(h: str, dialect: str) -> str:
    """array<bigint> of the D_ROWS cell indices for one token hash."""
    cells = ", ".join(
        f"((({h}) * {_A[j]} + {_B[j]}) % {HASH_MOD}) % {W_COLS}"
        for j in range(D_ROWS)
    )
    if dialect == "spark":
        return f"array({cells})"
    return f"list_value({cells})"


def _token_stream(docs: DataFrame) -> DataFrame:
    return docs.select(
        F.explode(F.expr(tokens_sql("text", "spark"))).alias("token")
    ).withColumn("h", F.expr(token_hash_sql("token", "spark")))


def cms_sketch(docs: DataFrame) -> DataFrame:
    """(row, cell, cnt) — the sketch itself: <= D_ROWS * W_COLS rows
    regardless of corpus size.  Map-side explode + partial agg before the
    single bounded exchange."""
    return (
        _token_stream(docs)
        .select(F.posexplode(F.expr(cms_cells_sql("h", "spark"))).alias("row", "cell"))
        .groupBy("row", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_topk(docs: DataFrame, *, k: int = 15) -> DataFrame:
    """Top-k heavy hitters by count-min ESTIMATE, with the exact count
    kept alongside (est >= exact is the sketch's one-sided guarantee and
    is verified by the oracle compare).  Output: (token, est, exact).

    At scale the candidate set would be sampled/streamed rather than
    `distinct token` (which reintroduces the unbounded shuffle the sketch
    avoids) — the sketch JOIN shape is the at-scale piece: 4 probes
    against a broadcastable 1024-row table."""
    sketch = cms_sketch(docs)
    stream = _token_stream(docs)
    exact = stream.groupBy("token", "h").agg(F.count(F.lit(1)).alias("exact"))
    probes = exact.select(
        "token", "exact",
        F.posexplode(F.expr(cms_cells_sql("h", "spark"))).alias("row", "cell"),
    )
    est = (
        probes.join(F.broadcast(sketch), ["row", "cell"])
        .groupBy("token", "exact")
        .agg(F.min("cnt").alias("est"))
    )
    w = Window.orderBy(F.col("est").desc(), F.col("token").asc())
    return (
        est.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("token", "est", "exact")
    )


def cms_sketch_oracle_sql() -> str:
    """The bare d×w grid (row, cell, cnt) — oracle twin of cms_sketch,
    shared by the batch and streaming sum-merge compares."""
    h = token_hash_sql("token", "duck")
    cells = cms_cells_sql("_h", "duck")
    return f"""
WITH toks AS (
  SELECT unnest({tokens_sql('text', 'duck')}) AS token FROM documents
),
hashed AS (
  SELECT token, {h} AS _h FROM toks
),
pairs AS (
  SELECT generate_subscripts(cs, 1) - 1 AS row, unnest(cs) AS cell
  FROM (SELECT {cells} AS cs FROM hashed)
)
SELECT CAST(row AS INT) AS row, cell, CAST(count(*) AS BIGINT) AS cnt
FROM pairs GROUP BY 1, 2
"""


def cms_topk_oracle_sql(*, k: int = 15) -> str:
    h = token_hash_sql("token", "duck")
    cells = cms_cells_sql("_h", "duck")
    return f"""
WITH toks AS (
  SELECT unnest({tokens_sql('text', 'duck')}) AS token FROM documents
),
hashed AS (
  SELECT token, {h} AS _h FROM toks
),
pairs AS (
  SELECT generate_subscripts(cs, 1) - 1 AS row, unnest(cs) AS cell
  FROM (SELECT {cells} AS cs FROM hashed)
),
sketch AS (
  SELECT row, cell, count(*) AS cnt FROM pairs GROUP BY 1, 2
),
exact AS (
  SELECT token, any_value(_h) AS _h, count(*) AS exact
  FROM hashed GROUP BY token
),
probe AS (
  SELECT token, exact, generate_subscripts(cs, 1) - 1 AS row, unnest(cs) AS cell
  FROM (SELECT token, exact, {cells} AS cs FROM exact)
),
est AS (
  SELECT p.token, p.exact, min(s.cnt) AS est
  FROM probe p JOIN sketch s ON s.row = p.row AND s.cell = p.cell
  GROUP BY 1, 2
)
SELECT token, est, exact FROM (
  SELECT token, est, exact,
         row_number() OVER (ORDER BY est DESC, token ASC) AS rk
  FROM est
) WHERE rk <= {k}
"""


# --- HyperLogLog-style distinct sketch ---------------------------------------

HLL_M = 64          # registers per group
HLL_W_BITS = 24     # h < 2^30, idx eats 6 bits -> w < 2^24
# single-literal numerator alpha_64 * m^2 * 2^40 (precomputed so the only
# float op per estimate is ONE division — deterministic IEEE both engines)
HLL_ALPHA_NUM = 0.709 * HLL_M * HLL_M * float(1 << 40)


def _rho_sql(w: str) -> str:
    """Leading-zero rank of ``w`` within HLL_W_BITS bits (+1), via
    length(bin(w)) = floor(log2 w) + 1 — exact integer in both engines."""
    return (
        f"(CASE WHEN {w} = 0 THEN {HLL_W_BITS + 1} "
        f"ELSE {HLL_W_BITS} - length(bin({w})) + 1 END)"
    )


def hll_registers(docs: DataFrame) -> DataFrame:
    """Sparse per-language registers (lang, idx, M) of the bigram HLL —
    the MERGEABLE partial: max per (lang, idx) across any partitioning of
    the corpus reproduces the whole-corpus registers (used by both
    :func:`hll_union` and the streaming sketch)."""
    toks = docs.filter(
        f"size({tokens_sql('text', 'spark')}) >= 2"
    ).select(
        "lang", F.explode(F.expr(_bigrams_sql("spark"))).alias("token")
    ).withColumn(
        "h",
        F.expr(
            f"(({token_hash_sql('token', 'spark')}) * 2654435761 + 40503) % {HASH_MOD}"
        ),
    )
    return (
        toks.select(
            "lang",
            F.expr(f"h % {HLL_M}").alias("idx"),
            F.expr(_rho_sql(f"(h DIV {HLL_M})")).alias("rho"),
        )
        .groupBy("lang", "idx")
        .agg(F.max("rho").alias("M"))
    )


def hll_finalize(regs: DataFrame, langs: DataFrame) -> DataFrame:
    """Densify sparse registers to all HLL_M slots per lang and emit
    (lang, n_hit, sum_int, est) — no exact count (the finalize step works
    from sketch state alone, which is the point of the sketch)."""
    full = (
        langs.crossJoin(
            regs.sparkSession.range(HLL_M).select(F.col("id").cast("int").alias("idx"))
        )
        .join(regs, ["lang", "idx"], "left")
        .select("lang", F.coalesce("M", F.lit(0)).alias("M"))
    )
    summed = full.groupBy("lang").agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 40 - M)")).alias("sum_int"),
        F.sum(F.expr("CASE WHEN M > 0 THEN 1 ELSE 0 END")).cast("long").alias("n_hit"),
    )
    return summed.select(
        "lang", "n_hit", "sum_int",
        F.expr(f"CAST({HLL_ALPHA_NUM!r} AS DOUBLE) / CAST(sum_int AS DOUBLE)").alias("est"),
    )


def hll_distinct(docs: DataFrame) -> DataFrame:
    """Per-language HLL distinct-BIGRAM estimate NEXT TO the exact count.

    Registers are exact integers (max leading-zero rank per 64-way hash
    slot), the estimate's register sum is an exact BIGINT (2^(40-M) via
    shiftleft), and the only float operation is one division by a
    precomputed literal — so the classically-approximate sketch is itself
    bit-exact across engines and aggregation orders.  Raw HLL estimator
    (no small-range correction; the zero-register count is emitted so a
    consumer can apply linear counting).  State: 64 BIGINTs per group —
    the bounded-state substitute for count(DISTINCT token) whose hash
    shuffle grows with the vocabulary.  Output:
    (lang, n_hit, sum_int, est, exact).

    The sketched unit is the adjacent-token BIGRAM, not the token: the
    synthetic corpus has a ~31-word per-language vocabulary, far below
    the raw estimator's validity floor (~2.5m = 160), where raw HLL is
    known-biased; the ~960-bigram vocabulary sits in the estimator's
    standard regime (relative error ~1.04/sqrt(m))."""
    toks = docs.filter(
        f"size({tokens_sql('text', 'spark')}) >= 2"
    ).select(
        "lang", F.explode(F.expr(_bigrams_sql("spark"))).alias("token")
    ).withColumn(
        # avalanche remix: the polynomial hash of SHORT tokens is a small
        # integer (h("a") = 97), which would give them enormous rho and
        # wreck the estimate; an odd-multiplier remix mod the same prime
        # spreads them uniformly
        "h",
        F.expr(
            f"(({token_hash_sql('token', 'spark')}) * 2654435761 + 40503) % {HASH_MOD}"
        ),
    )
    regs = (
        toks.select(
            "lang",
            F.expr(f"h % {HLL_M}").alias("idx"),
            F.expr(_rho_sql(f"(h DIV {HLL_M})")).alias("rho"),
        )
        .groupBy("lang", "idx")
        .agg(F.max("rho").alias("M"))
    )
    langs = docs.select("lang").distinct()
    full = (
        langs.crossJoin(
            docs.sparkSession.range(HLL_M).select(F.col("id").cast("int").alias("idx"))
        )
        .join(regs, ["lang", "idx"], "left")
        .select("lang", F.coalesce("M", F.lit(0)).alias("M"))
    )
    summed = full.groupBy("lang").agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 40 - M)")).alias("sum_int"),
        F.sum(F.expr("CASE WHEN M > 0 THEN 1 ELSE 0 END")).cast("long").alias("n_hit"),
    )
    exact = toks.groupBy("lang").agg(F.countDistinct("token").alias("exact"))
    return summed.join(exact, "lang").select(
        "lang", "n_hit", "sum_int",
        F.expr(f"CAST({HLL_ALPHA_NUM!r} AS DOUBLE) / CAST(sum_int AS DOUBLE)").alias("est"),
        "exact",
    )


def _bigrams_sql(dialect: str) -> str:
    """Adjacent-token bigram strings (same text as bigram_topk)."""
    toks = tokens_sql("text", dialect)
    if dialect == "spark":
        return (
            f"transform(sequence(1, size({toks}) - 1), i -> "
            f"concat(element_at({toks}, i), ' ', element_at({toks}, i + 1)))"
        )
    return (
        f"list_transform(range(1, len({toks})), i -> "
        f"list_extract({toks}, i) || ' ' || list_extract({toks}, i + 1))"
    )


def hll_distinct_oracle_sql() -> str:
    h = f"(({token_hash_sql('token', 'duck')}) * 2654435761 + 40503) % {HASH_MOD}"
    rho = _rho_sql(f"(_h // {HLL_M})")
    return f"""
WITH toks AS (
  SELECT lang, unnest({_bigrams_sql('duck')}) AS token
  FROM documents WHERE len({tokens_sql('text', 'duck')}) >= 2
),
hashed AS (SELECT lang, token, {h} AS _h FROM toks),
regs AS (
  SELECT lang, _h % {HLL_M} AS idx, max({rho}) AS M
  FROM hashed GROUP BY 1, 2
),
allregs AS (
  SELECT l.lang, g.idx, coalesce(r.M, 0) AS M
  FROM (SELECT DISTINCT lang FROM documents) l
  CROSS JOIN (SELECT unnest(range(0, {HLL_M})) AS idx) g
  LEFT JOIN regs r ON r.lang = l.lang AND r.idx = g.idx
),
summed AS (
  SELECT lang,
         CAST(sum(CAST(1 AS BIGINT) << (40 - M)) AS BIGINT) AS sum_int,
         CAST(sum(CASE WHEN M > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
  FROM allregs GROUP BY 1
),
exact AS (SELECT lang, count(DISTINCT token) AS exact FROM hashed GROUP BY 1)
SELECT s.lang, s.n_hit, s.sum_int,
       CAST({HLL_ALPHA_NUM!r} AS DOUBLE) / CAST(s.sum_int AS DOUBLE) AS est,
       e.exact
FROM summed s JOIN exact e ON e.lang = s.lang
"""


def hll_union(docs: DataFrame) -> DataFrame:
    """HLL MERGEABILITY demonstrated end-to-end: per-(lang, source)
    partial sketches (the shape a 1000-executor job produces, one sketch
    per partition/shard) merged into per-lang sketches by register-wise
    MAX — the lossless union that lets distinct sketches be built in one
    pass over arbitrarily-partitioned data and combined on the driver.

    Because merge(max) of per-source registers equals the registers of a
    single whole-corpus pass (max of maxes), the estimate emitted here is
    IDENTICAL to :func:`hll_distinct`'s — asserted by a unit test; the
    exact per-lang distinct count rides alongside as in hll_distinct.

    Output: (lang, n_sources, n_hit, sum_int, est, exact).
    """
    toks = docs.filter(
        f"size({tokens_sql('text', 'spark')}) >= 2"
    ).select(
        "lang", "source", F.explode(F.expr(_bigrams_sql("spark"))).alias("token")
    ).withColumn(
        "h",
        F.expr(
            f"(({token_hash_sql('token', 'spark')}) * 2654435761 + 40503) % {HASH_MOD}"
        ),
    )
    # stage 1: per-(lang, source) PARTIAL sketches
    partials = (
        toks.select(
            "lang", "source",
            F.expr(f"h % {HLL_M}").alias("idx"),
            F.expr(_rho_sql(f"(h DIV {HLL_M})")).alias("rho"),
        )
        .groupBy("lang", "source", "idx")
        .agg(F.max("rho").alias("M"))
    )
    # stage 2: register-wise MAX merge across sources
    merged = partials.groupBy("lang", "idx").agg(F.max("M").alias("M"))
    langs = docs.select("lang").distinct()
    full = (
        langs.crossJoin(
            docs.sparkSession.range(HLL_M).select(F.col("id").cast("int").alias("idx"))
        )
        .join(merged, ["lang", "idx"], "left")
        .select("lang", F.coalesce("M", F.lit(0)).alias("M"))
    )
    summed = full.groupBy("lang").agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 40 - M)")).alias("sum_int"),
        F.sum(F.expr("CASE WHEN M > 0 THEN 1 ELSE 0 END")).cast("long").alias("n_hit"),
    )
    n_src = partials.select("lang", "source").distinct().groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sources")
    )
    exact = toks.groupBy("lang").agg(F.countDistinct("token").alias("exact"))
    return summed.join(n_src, "lang").join(exact, "lang").select(
        "lang", "n_sources", "n_hit", "sum_int",
        F.expr(f"CAST({HLL_ALPHA_NUM!r} AS DOUBLE) / CAST(sum_int AS DOUBLE)").alias("est"),
        "exact",
    )


def hll_union_oracle_sql() -> str:
    h = f"(({token_hash_sql('token', 'duck')}) * 2654435761 + 40503) % {HASH_MOD}"
    rho = _rho_sql(f"(_h // {HLL_M})")
    return f"""
WITH toks AS (
  SELECT lang, source, unnest({_bigrams_sql('duck')}) AS token
  FROM documents WHERE len({tokens_sql('text', 'duck')}) >= 2
),
hashed AS (SELECT lang, source, token, {h} AS _h FROM toks),
partials AS (
  SELECT lang, source, _h % {HLL_M} AS idx, max({rho}) AS M
  FROM hashed GROUP BY 1, 2, 3
),
merged AS (
  SELECT lang, idx, max(M) AS M FROM partials GROUP BY 1, 2
),
allregs AS (
  SELECT l.lang, g.idx, coalesce(r.M, 0) AS M
  FROM (SELECT DISTINCT lang FROM documents) l
  CROSS JOIN (SELECT unnest(range(0, {HLL_M})) AS idx) g
  LEFT JOIN merged r ON r.lang = l.lang AND r.idx = g.idx
),
summed AS (
  SELECT lang,
         CAST(sum(CAST(1 AS BIGINT) << (40 - M)) AS BIGINT) AS sum_int,
         CAST(sum(CASE WHEN M > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
  FROM allregs GROUP BY 1
),
nsrc AS (
  SELECT lang, CAST(count(DISTINCT source) AS BIGINT) AS n_sources
  FROM partials GROUP BY 1
),
exact AS (SELECT lang, count(DISTINCT token) AS exact FROM hashed GROUP BY 1)
SELECT s.lang, n.n_sources, s.n_hit, s.sum_int,
       CAST({HLL_ALPHA_NUM!r} AS DOUBLE) / CAST(s.sum_int AS DOUBLE) AS est,
       e.exact
FROM summed s JOIN nsrc n ON n.lang = s.lang JOIN exact e ON e.lang = s.lang
"""


# --- Theta (fixed-threshold KMV-style) distinct sketch -----------------------
#
# The third sketch family, and the one HLL cannot replace: a SAMPLE of the
# distinct-hash space (keep every distinct hash below theta = HASH_MOD/16)
# supports SET OPERATIONS — intersection and Jaccard estimates between
# groups — because kept sets of different groups live in the same sampled
# sub-space and can simply be intersected.  HLL registers only union.
#
# Scale shape: the theta filter runs MAP-SIDE before any exchange, so the
# distinct shuffle carries ~1/16 of the distinct-hash stream; the kept set
# (the sketch) is mergeable by plain set-union (distinct), so 1000
# executors sketch shards independently and the union of kept sets IS the
# corpus sketch — same partial-merge algebra as hll_registers, with
# `distinct` playing the role of `max`.  All arithmetic is exact BIGINT
# until the single Jaccard division, so the DuckDB oracle reproduces the
# sketch bit-for-bit.
#
# ref parity note: the reference has no sketching; sibling of hll_distinct.

THETA_DEN = 16  # keep h*16 < HASH_MOD, i.e. ~1/16 of the hash space


def _theta_hash_sql(dialect: str) -> str:
    """Remixed bigram hash (same remix as the HLL family)."""
    return f"(({token_hash_sql('token', dialect)}) * 2654435761 + 40503) % {HASH_MOD}"


def theta_registers(docs: DataFrame) -> DataFrame:
    """Sparse kept set (lang, h): every DISTINCT remixed bigram hash with
    h * THETA_DEN < HASH_MOD.  This is the sketch — mergeable by union."""
    toks = docs.filter(
        f"size({tokens_sql('text', 'spark')}) >= 2"
    ).select(
        "lang", F.explode(F.expr(_bigrams_sql("spark"))).alias("token")
    ).select("lang", F.expr(_theta_hash_sql("spark")).alias("h"))
    return (
        toks.filter(F.expr(f"h * {THETA_DEN} < {HASH_MOD}")).distinct()
    )


def theta_distinct(docs: DataFrame) -> DataFrame:
    """Per-language distinct-bigram estimate from the theta sketch, with
    the exact count alongside (est_int = n_kept * THETA_DEN, pure BIGINT)."""
    kept = theta_registers(docs).groupBy("lang").agg(
        F.count("*").alias("n_kept")
    )
    toks = docs.filter(
        f"size({tokens_sql('text', 'spark')}) >= 2"
    ).select("lang", F.explode(F.expr(_bigrams_sql("spark"))).alias("token"))
    exact = toks.groupBy("lang").agg(
        F.countDistinct("token").alias("exact")
    )
    return (
        exact.join(kept, "lang", "left")
        .select(
            "lang",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            (F.coalesce("n_kept", F.lit(0)) * THETA_DEN).cast("long").alias("est_int"),
            "exact",
        )
        .orderBy("lang")
    )


def theta_distinct_oracle_sql() -> str:
    h = _theta_hash_sql("duck")
    return f"""
WITH toks AS (
  SELECT lang, unnest({_bigrams_sql('duck')}) AS token
  FROM documents WHERE len({tokens_sql('text', 'duck')}) >= 2
),
hashed AS (SELECT lang, token, {h} AS h FROM toks),
kept AS (
  SELECT k.lang, count(*) AS n_kept FROM (
    SELECT DISTINCT lang, h FROM hashed WHERE h * {THETA_DEN} < {HASH_MOD}
  ) k GROUP BY 1
),
exact AS (SELECT lang, count(DISTINCT token) AS exact FROM hashed GROUP BY 1)
SELECT e.lang AS lang,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(coalesce(k.n_kept, 0) * {THETA_DEN} AS BIGINT) AS est_int,
       e.exact
FROM exact e LEFT JOIN kept k ON k.lang = e.lang
ORDER BY 1
"""


def theta_jaccard(docs: DataFrame) -> DataFrame:
    """Pairwise language similarity from theta sketches: for every lang
    pair (a < b), the intersection ESTIMATE (inter_kept * THETA_DEN) and
    Jaccard estimate from the kept sets, with the exact values alongside.

    The pairwise work is a posting-list equi-join ON THE HASH (each hash
    appears in <= n_langs kept sets), never a cross join of corpora —
    the shape that survives when the kept sets have millions of entries."""
    regs = theta_registers(docs)
    a = regs.toDF("lang_a", "h")
    b = regs.toDF("lang_b", "h")
    inter = (
        a.join(b, "h")
        .filter("lang_a < lang_b")
        .groupBy("lang_a", "lang_b")
        .agg(F.count("*").alias("inter_kept"))
    )
    sizes = regs.groupBy("lang").agg(F.count("*").alias("n_kept"))
    # exact pairwise intersection via the same posting-list shape on the
    # FULL distinct sets (diagnostic twin; the sketch path above is the
    # one that scales)
    toks = docs.filter(
        f"size({tokens_sql('text', 'spark')}) >= 2"
    ).select(
        "lang", F.explode(F.expr(_bigrams_sql("spark"))).alias("token")
    ).distinct()
    ea = toks.toDF("lang_a", "token")
    eb = toks.toDF("lang_b", "token")
    einter = (
        ea.join(eb, "token")
        .filter("lang_a < lang_b")
        .groupBy("lang_a", "lang_b")
        .agg(F.count("*").alias("inter_exact"))
    )
    esizes = toks.groupBy("lang").agg(F.count("*").alias("n_exact"))
    out = (
        inter
        .join(sizes.toDF("lang_a", "kept_a"), "lang_a")
        .join(sizes.toDF("lang_b", "kept_b"), "lang_b")
        .join(einter, ["lang_a", "lang_b"])
        .join(esizes.toDF("lang_a", "exact_a"), "lang_a")
        .join(esizes.toDF("lang_b", "exact_b"), "lang_b")
    )
    return out.select(
        "lang_a", "lang_b",
        (F.col("inter_kept") * THETA_DEN).cast("long").alias("inter_est"),
        F.col("inter_exact").cast("long").alias("inter_exact"),
        F.expr(
            "CAST(inter_kept AS DOUBLE) / CAST(kept_a + kept_b - inter_kept AS DOUBLE)"
        ).alias("jac_est"),
        F.expr(
            "CAST(inter_exact AS DOUBLE) / CAST(exact_a + exact_b - inter_exact AS DOUBLE)"
        ).alias("jac_exact"),
    ).orderBy("lang_a", "lang_b")


def theta_jaccard_oracle_sql() -> str:
    h = _theta_hash_sql("duck")
    return f"""
WITH toks AS (
  SELECT lang, unnest({_bigrams_sql('duck')}) AS token
  FROM documents WHERE len({tokens_sql('text', 'duck')}) >= 2
),
hashed AS (SELECT DISTINCT lang, token, {h} AS h FROM toks),
regs AS (SELECT DISTINCT lang, h FROM hashed WHERE h * {THETA_DEN} < {HASH_MOD}),
sizes AS (SELECT lang, count(*) AS n_kept FROM regs GROUP BY 1),
inter AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b, count(*) AS inter_kept
  FROM regs a JOIN regs b ON a.h = b.h AND a.lang < b.lang
  GROUP BY 1, 2
),
full_sets AS (SELECT DISTINCT lang, token FROM hashed),
esizes AS (SELECT lang, count(*) AS n_exact FROM full_sets GROUP BY 1),
einter AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b, count(*) AS inter_exact
  FROM full_sets a JOIN full_sets b ON a.token = b.token AND a.lang < b.lang
  GROUP BY 1, 2
)
SELECT i.lang_a AS lang_a, i.lang_b AS lang_b,
       CAST(i.inter_kept * {THETA_DEN} AS BIGINT) AS inter_est,
       CAST(e.inter_exact AS BIGINT) AS inter_exact,
       CAST(i.inter_kept AS DOUBLE)
         / CAST(sa.n_kept + sb.n_kept - i.inter_kept AS DOUBLE) AS jac_est,
       CAST(e.inter_exact AS DOUBLE)
         / CAST(ea.n_exact + eb.n_exact - e.inter_exact AS DOUBLE) AS jac_exact
FROM inter i
JOIN sizes sa ON sa.lang = i.lang_a
JOIN sizes sb ON sb.lang = i.lang_b
JOIN einter e ON e.lang_a = i.lang_a AND e.lang_b = i.lang_b
JOIN esizes ea ON ea.lang = i.lang_a
JOIN esizes eb ON eb.lang = i.lang_b
ORDER BY 1, 2
"""


# --- CMS join-size estimation (sketch inner product) --------------------------
#
# The planner-grade application of the count-min grid: the equi-join
# cardinality |A ⋈_k B| = Σ_k f_A(k)·f_B(k) is estimated from the two
# tables' grids alone as min over rows of Σ_cells cntA[cell]·cntB[cell].
# Every hash collision only ADDS non-negative cross terms, so each row's
# inner product ≥ the true join size and the min keeps the tightest row —
# a deterministic one-sided guarantee (est ≥ exact), oracle-checked with
# the exact join size alongside.  At 10^12 rows the estimate costs two
# bounded grid aggregates + a 1024-row join — no data-sized join at all —
# which is exactly how an optimizer sizes a join before committing to it.

def _int_key_cells_sql(key: str, dialect: str) -> str:
    return cms_cells_sql(f"(({key}) % {HASH_MOD})", dialect)


def cms_join_size(spark) -> DataFrame:
    """(est, exact) for |orders ⋈ customer on custkey| from CMS grids."""
    def grid(table: str, key: str) -> DataFrame:
        return (
            spark.table(table)
            .select(
                F.posexplode(
                    F.expr(_int_key_cells_sql(key, "spark"))
                ).alias("row", "cell")
            )
            .groupBy("row", "cell")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    ga = grid("orders", "o_custkey")
    gb = grid("customer", "c_custkey")
    per_row = (
        ga.join(gb.withColumnRenamed("cnt", "cnt_b"), ["row", "cell"])
        .groupBy("row")
        .agg(F.sum(F.col("cnt") * F.col("cnt_b")).alias("ip"))
    )
    est = per_row.agg(F.min("ip").alias("est"))
    exact = (
        spark.table("orders")
        .join(
            spark.table("customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    return est.crossJoin(exact).select(
        F.col("est").cast("long").alias("est"),
        F.col("exact").cast("long").alias("exact"),
    )


def cms_join_size_oracle_sql() -> str:
    ca = _int_key_cells_sql("o_custkey", "duck")
    cb = _int_key_cells_sql("c_custkey", "duck")
    return f"""
WITH pa AS (
  SELECT generate_subscripts(cs, 1) - 1 AS row, unnest(cs) AS cell
  FROM (SELECT {ca} AS cs FROM orders)
),
ga AS (SELECT row, cell, count(*) AS cnt FROM pa GROUP BY 1, 2),
pb AS (
  SELECT generate_subscripts(cs, 1) - 1 AS row, unnest(cs) AS cell
  FROM (SELECT {cb} AS cs FROM customer)
),
gb AS (SELECT row, cell, count(*) AS cnt FROM pb GROUP BY 1, 2),
per_row AS (
  SELECT ga.row, sum(ga.cnt * gb.cnt) AS ip
  FROM ga JOIN gb ON ga.row = gb.row AND ga.cell = gb.cell
  GROUP BY 1
),
ex AS (
  SELECT count(*) AS exact FROM orders o JOIN customer c
  ON o.o_custkey = c.c_custkey
)
SELECT CAST(m.est AS BIGINT) AS est, CAST(ex.exact AS BIGINT) AS exact
FROM (SELECT min(ip) AS est FROM per_row) m, ex
"""
