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
