"""Deduplication at training-data scale: exact, MinHash+LSH, SimHash,
n-gram Jaccard.  All hot paths are Spark built-ins (transform / aggregate /
explode / joins) — JVM codegen, no Python in the loop — and every
arithmetic step has an exact DuckDB twin for the oracle.

Scale notes (designed for 10^9+ docs):
* exact dedup        — one hash-groupBy on the text fingerprint;
* MinHash+LSH        — signatures map-side; candidate pairs come from a
  shuffle self-join keyed by (band, band-hash): only same-bucket docs meet,
  never the full cross product;
* n-gram Jaccard     — posting-list self-join on shingle hash with
  per-shingle frequency capping (hot shingles are dropped like hot cells);
* SimHash            — 32-bit fingerprint map-side; Hamming<=k pairs via
  pigeonhole band self-join (complete for k = n_bands - 1, so the
  banded plan provably equals the quadratic scan it replaces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import (
    HASH_MOD,
    ngram_hashes_from_col_sql,
    ngram_hashes_sql,
    text_hash_sql,
    token_hashes_column,
    token_hashes_sql,
)

N_HASHES = 8  # minhash signature length
N_BANDS = 4  # LSH bands (rows per band = N_HASHES / N_BANDS)
LSH_MOD = 1_000_000_009


def _minhash_j_sql(hashes: str, j: int, dialect: str) -> str:
    """j-th minhash: min over token hashes of (a_j*h + b_j) % M, with
    a_j = 2j+1 (odd), b_j = 12345*j + 1.  NULL for empty token sets."""
    a, b = 2 * j + 1, 12345 * j + 1
    if dialect == "spark":
        return f"array_min(transform({hashes}, h -> ({a} * h + {b}) % {HASH_MOD}))"
    return f"list_min(list_transform({hashes}, h -> ({a} * h + {b}) % {HASH_MOD}))"


def minhash_signature_sql(text: str, dialect: str, n: int = N_HASHES) -> str:
    hashes = token_hashes_sql(text, dialect)
    parts = ", ".join(_minhash_j_sql("_th", j, dialect) for j in range(n))
    if dialect == "spark":
        body = f"array({parts})"
        # bind _th once via a lambda-less trick: inline (hashes) everywhere
        return body.replace("_th", f"({hashes})")
    return f"[{parts}]".replace("_th", f"({hashes})")


def minhash_signature_from_col_sql(hs_col: str, n: int = N_HASHES) -> str:
    """Spark: minhash signature over an already-materialized token-hash
    array COLUMN — each of the n hash families reads the attribute instead
    of re-deriving the tokenization (n+1 fewer full-text passes per doc)."""
    parts = ", ".join(_minhash_j_sql(hs_col, j, "spark") for j in range(n))
    return f"array({parts})"


def band_keys_sql(sig: str, dialect: str, n_bands: int = N_BANDS) -> str:
    """LSH band keys: band b hashes its signature rows together.
    key_b = (sig[2b] * 1000003 + sig[2b+1]) % LSH_MOD  (rows-per-band = 2)."""
    rows = N_HASHES // n_bands
    assert rows == 2, "band key formula assumes 2 rows per band"
    parts = []
    for b in range(n_bands):
        i, j = rows * b + 1, rows * b + 2
        if dialect == "spark":
            parts.append(
                f"(try_element_at({sig}, {i}) * 1000003 + try_element_at({sig}, {j})) % {LSH_MOD}"
            )
        else:
            parts.append(
                f"(list_extract({sig}, {i}) * 1000003 + list_extract({sig}, {j})) % {LSH_MOD}"
            )
    return f"array({', '.join(parts)})" if dialect == "spark" else f"[{', '.join(parts)}]"


def simhash_sql(text: str, dialect: str, bits: int = 32) -> str:
    """SimHash fingerprint: bit k set iff sum over tokens of
    (((h >> k) & 1) * 2 - 1) > 0.  NULL-free: empty docs -> 0."""
    hashes = token_hashes_sql(text, dialect)
    if dialect == "spark":
        inner = (
            f"aggregate(_th, CAST(0 AS BIGINT), "
            f"(a, h) -> a + (CAST(shiftright(h, k) AS BIGINT) % 2) * 2 - 1)"
        )
        out = (
            f"aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT), "
            f"(acc, k) -> acc + CASE WHEN ({inner}) > 0 THEN shiftleft(CAST(1 AS BIGINT), k) ELSE CAST(0 AS BIGINT) END)"
        )
    else:
        inner = (
            f"list_sum(list_transform(_th, h -> ((h >> k) & 1) * 2 - 1))"
        )
        out = (
            f"list_sum(list_transform(range(0, {bits}), "
            f"k -> CASE WHEN COALESCE(({inner}), 0) > 0 THEN (CAST(1 AS BIGINT) << k) ELSE 0 END))"
        )
        # DuckDB list_sum returns HUGEINT; cast so the oracle frame hashes as int64.
        out = f"CAST(COALESCE({out}, 0) AS BIGINT)"
    return out.replace("_th", f"({hashes})")


# ---------------------------------------------------------------------------
# Spark pipelines
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(fingerprint, canonical_doc_id, n_dups): exact duplicate groups via
    one hash-groupBy on the rolling-hash fingerprint (Arrow kernel;
    text_hash_sql is the oracle twin — NB the kernel maps empty/NULL text
    to 0 where SQL list_reduce yields NULL; the synthetic corpus has no
    empty documents and tests assert parity on real data)."""
    from .text import doc_hash_column

    return (
        docs.withColumn("fingerprint", doc_hash_column(text_col))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count("*").alias("n_dups"))
    )


def minhash_lsh_pairs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Candidate near-dup pairs (doc_a < doc_b) from MinHash band collisions,
    verified with exact token-set Jaccard.  Shuffle key = (band, key)."""
    # two shuffle barriers so the token-hash array and the signature are
    # each computed ONCE per doc — Catalyst's projection collapse would
    # otherwise re-inline the full tokenize+hash chain into all 16 minhash
    # families and every band key (measured ~2.5x the query's runtime)
    # Arrow-batched token hashing (text.token_hashes_batch): ~60x the
    # interpreted SQL fold, bit-identical values (oracle still checks the
    # SQL twin)
    hs = docs.select(
        "doc_id", token_hashes_column(text_col).alias("_th")
    ).repartition("doc_id")
    sigd = hs.select(
        "doc_id",
        F.expr(minhash_signature_from_col_sql("_th")).alias("sig"),
        F.expr("array_distinct(_th)").alias("tokset"),
    ).repartition("doc_id")
    keys = band_keys_sql("sig", "spark")
    with_keys = (
        sigd.select("doc_id", "tokset", F.posexplode(F.expr(keys)))
        .withColumnRenamed("pos", "band")
        .withColumnRenamed("col", "band_key")
    )
    a = with_keys.select(
        F.col("doc_id").alias("doc_a"), F.col("tokset").alias("tok_a"),
        "band", "band_key",
    )
    b = with_keys.select(
        F.col("doc_id").alias("doc_b"), F.col("tokset").alias("tok_b"),
        "band", "band_key",
    )
    pairs = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "tok_a", "tok_b")
        .distinct()
    )
    jac = (
        "CAST(size(array_intersect(tok_a, tok_b)) AS DOUBLE) / "
        "CAST(size(array_union(tok_a, tok_b)) AS DOUBLE)"
    )
    return (
        pairs.withColumn("jaccard", F.expr(jac))
        .select("doc_a", "doc_b", "jaccard")
        .distinct()
    )


def simhash_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) via the Arrow kernel (text.simhash_batch);
    simhash_sql is the oracle twin."""
    from .text import simhash_column

    return docs.select("doc_id", simhash_column(text_col).alias("simhash"))


def _simhash_fingerprints_sql(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select(
        "doc_id", F.expr(simhash_sql(text_col, "spark")).alias("simhash")
    )


SIMHASH_BANDS = 4  # pigeonhole bands over the 32-bit fingerprint
SIMHASH_K = SIMHASH_BANDS - 1  # Hamming radius the banding is COMPLETE for


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = SIMHASH_K,
    n_bands: int = SIMHASH_BANDS,
    bits: int = 32,
    max_bucket: int = 100_000,
) -> DataFrame:
    """Near-dup pairs (doc_a < doc_b, hamming) with SimHash Hamming
    distance <= ``k``, found WITHOUT the all-pairs cross product.

    Pigeonhole banding: split the ``bits``-bit fingerprint into
    ``n_bands`` contiguous bands; if two fingerprints differ in at most
    ``k = n_bands - 1`` bits, those differing bits occupy at most k bands,
    so AT LEAST ONE band is bit-identical — a self-join keyed on
    (band_index, band_value) therefore finds every qualifying pair
    (Manku et al., WWW'07 web-dedup construction), and the exact
    ``bit_count(xor)`` refine discards band collisions beyond radius k.
    The result is provably equal to the quadratic scan the oracle runs.

    Scale: candidates only meet inside a band bucket (one shuffle on the
    band key); per-bucket population concentrates where the corpus is
    near-duplicative, exactly like hot tiles — ``max_bucket`` drops
    pathological buckets (e.g. a constant boilerplate fingerprint) the
    same way ngram_jaccard_pairs caps hot shingles.  Fingerprints ride
    the Arrow kernel (map-side, no shuffle).

    Plays the role of the reference's event-pair selection stages
    (ref: fast_carpenter/selection/stage.py) recast as a dedup operator.
    """
    width = bits // n_bands
    fp = simhash_fingerprints(docs, text_col)
    bands = fp.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {n_bands - 1}), "
                f"b -> shiftright(simhash, b * {width}) % {1 << width})"
            )
        ).alias("band", "band_key"),
    )
    hot = (
        bands.groupBy("band", "band_key")
        .count()
        .filter(F.col("count") > max_bucket)
        .select("band", "band_key")
    )
    bands = bands.join(F.broadcast(hot), ["band", "band_key"], "left_anti")
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"),
        "band", "band_key",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"),
        "band", "band_key",
    )
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.expr("CAST(bit_count(sim_a ^ sim_b) AS BIGINT)").alias("hamming"),
        )
        .filter(F.col("hamming") <= k)
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame, text_col: str = "text", n: int = 3,
    threshold: float = 0.2, max_posting: int = 1000,
) -> DataFrame:
    """Near-dup pairs by n-gram shingle Jaccard via posting-list self-join.

    Per-shingle postings above ``max_posting`` are dropped (hot-key cap —
    the text analogue of hot-cell salting; a shingle shared by >1000 docs
    carries no signal and would quadratically blow up the join)."""
    # Shingle derivation as codegen'd window algebra: posexplode the
    # token-hash array (one higher-order eval per doc), then shingle hash
    # via lead() — whole-stage codegen, provably linear.  The earlier
    # lambda formulation (transform + array_distinct + explode over the
    # inlined expression) cost ~460us per OUTPUT row in interpreted
    # expression eval (12s for 500 docs; this shape: <2s).
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id",
        F.posexplode(token_hashes_column(text_col)).alias("_idx", "_h"),
    )
    wseq = Window.partitionBy("doc_id").orderBy("_idx")
    shingle_expr = None
    for j in range(n):
        term = (F.col("_h") if j == 0 else F.lead("_h", j).over(wseq)) * (31 ** (n - 1 - j))
        shingle_expr = term if shingle_expr is None else shingle_expr + term
    sh = toks.select(
        "doc_id", (shingle_expr % HASH_MOD).alias("shingle")
    ).filter(F.col("shingle").isNotNull())
    uniq = sh.groupBy("doc_id", "shingle").agg(F.lit(1).alias("_one")).drop("_one")
    posts = uniq.withColumn(
        "n_sh", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    ).repartition(F.col("shingle"))
    hot = posts.groupBy("shingle").count().filter(F.col("count") > max_posting)
    posts = posts.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    a = posts.select(
        F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"), "shingle"
    )
    b = posts.select(
        F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"), "shingle"
    )
    common = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.withColumn(
            "jaccard",
            F.expr("CAST(n_common AS DOUBLE) / CAST(na + nb - n_common AS DOUBLE)"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# Near-dup clustering: candidate pairs -> connected components -> canonical
# doc per cluster.  This is the step a real 100 TB dedup pipeline actually
# ships: pair lists are intermediate, the kept-set is the product.
# ---------------------------------------------------------------------------

CLUSTER_JACCARD = 0.5  # verified-Jaccard edge threshold for clustering


def dedup_clusters(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = CLUSTER_JACCARD,
    max_iter: int = 25,
) -> DataFrame:
    """(doc_id, cluster_id) for EVERY document: connected components of the
    MinHash-LSH near-dup graph (edges = band-collision pairs whose exact
    token-set Jaccard >= ``threshold``); ``cluster_id`` is the
    lexicographically smallest doc_id of the component (singletons label
    themselves).

    Algorithm: Pregel-style neighbor-min label propagation — each round
    every node adopts ``min(own label, min over neighbours' labels)`` via
    one edge-keyed shuffle join + groupBy, iterated to fixpoint.  This is
    exactly GraphX/GraphFrames' connectedComponents superstep; rounds =
    graph diameter, and near-dup graphs are unions of near-cliques
    (template bursts), so it converges in a handful of rounds.  The loop
    itself (including the per-round localCheckpoint lineage truncation and
    the 100 TB notes) lives in ``functions/graph.py`` and is shared with
    the contiguous hot-region labelling operator.

    Plays the role of the reference's chunk-merge collector step
    (ref: fast_carpenter/summary/binned_dataframe.py:232-238 — associative
    merge of partials) lifted to a graph fixpoint.
    """
    from .graph import connected_components

    pairs = minhash_lsh_pairs(docs, text_col).filter(F.col("jaccard") >= threshold)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    return connected_components(
        docs.select("doc_id"), edges, node_col="doc_id", max_iter=max_iter
    )


def dedup_canonical(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = CLUSTER_JACCARD,
) -> DataFrame:
    """One row per near-dup cluster: (cluster_id, n_members, kept_doc,
    kept_len).  The canonical (kept) document is the longest text in the
    cluster, smallest doc_id on ties — i.e. the dedup pipeline's actual
    output: which document survives and how many it replaces."""
    from pyspark.sql import Window

    labels = dedup_clusters(docs, text_col, threshold)
    members = labels.join(
        docs.select(
            "doc_id", F.length(text_col).cast("bigint").alias("_len")
        ),
        "doc_id",
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("_len"), F.asc("doc_id")
    )
    kept = (
        members.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("kept_doc"),
            F.col("_len").alias("kept_len"),
        )
    )
    counts = labels.groupBy("cluster_id").agg(
        F.count("*").alias("n_members")
    )
    return counts.join(kept, "cluster_id").select(
        "cluster_id", "n_members", "kept_doc", "kept_len"
    )


# ---------------------------------------------------------------------------
# Incremental-ingest dedup: a new snapshot arrives; keep only documents
# whose fingerprint is absent from the existing corpus.  The steady-state
# operation of a production dedup pipeline (full-corpus dedup runs once;
# every day after is this).
# ---------------------------------------------------------------------------

INGEST_COPY_MOD = 7  # doc_id % 7 == 0 -> re-ingested copy (must be dropped)
INGEST_NEW_MOD = 5  # doc_id % 5 == 0 -> genuinely new content (must be kept)


def incremental_new_docs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """New-document set of a synthetic incoming batch vs the full corpus.

    The incoming batch mixes re-ingested copies of existing documents
    (same text, new ids — the anti-join must drop them) with genuinely new
    documents (transformed text — the anti-join must keep them), so both
    branches of the filter are exercised.

    Scale shape: fingerprints are map-side (Arrow kernel); the LEFT ANTI
    join shuffles on the fingerprint.  At 10^12 docs the corpus fingerprint
    table is stored bucketed by fingerprint, so only the (small) incoming
    batch shuffles and the corpus side is a local bucket probe; within-batch
    dedup rides the same exchange (groupBy on the join key reuses it).

    Returns (doc_id, fingerprint, n_batch) — surviving incoming docs,
    deduplicated within the batch (min doc_id wins, multiplicity kept).
    """
    from .text import doc_hash_column

    copies = docs.filter(F.col("doc_id") % INGEST_COPY_MOD == 0).select(
        (F.col("doc_id") + 1_000_000_000).alias("doc_id"), F.col(text_col).alias("text")
    )
    fresh = docs.filter(F.col("doc_id") % INGEST_NEW_MOD == 0).select(
        (F.col("doc_id") + 2_000_000_000).alias("doc_id"),
        F.concat(F.col(text_col), F.lit(" #new")).alias("text"),
    )
    incoming = copies.unionByName(fresh)
    corpus_fp = docs.select(doc_hash_column(text_col).alias("fingerprint")).distinct()
    inc_fp = incoming.withColumn("fingerprint", doc_hash_column("text"))
    new = inc_fp.join(corpus_fp, "fingerprint", "left_anti")
    return new.groupBy("fingerprint").agg(
        F.min("doc_id").alias("doc_id"), F.count("*").alias("n_batch")
    ).select("doc_id", "fingerprint", "n_batch")


def incremental_new_docs_oracle_sql(text_col: str = "text") -> str:
    fp_text = text_hash_sql("text", "duck")
    return f"""
WITH incoming AS (
  SELECT doc_id + 1000000000 AS doc_id, {text_col} AS text
  FROM documents WHERE doc_id % {INGEST_COPY_MOD} = 0
  UNION ALL
  SELECT doc_id + 2000000000 AS doc_id, concat({text_col}, ' #new') AS text
  FROM documents WHERE doc_id % {INGEST_NEW_MOD} = 0
),
corpus AS (SELECT DISTINCT {text_hash_sql(text_col, 'duck')} AS fingerprint FROM documents),
inc_fp AS (SELECT doc_id, {fp_text} AS fingerprint FROM incoming),
new AS (
  SELECT * FROM inc_fp WHERE fingerprint NOT IN (SELECT fingerprint FROM corpus)
)
SELECT min(doc_id) AS doc_id, fingerprint, count(*) AS n_batch
FROM new GROUP BY fingerprint
"""


# --- character-level fuzzy dedup (edit distance) -----------------------------

ED_THRESHOLD = 8
ED_PREFIX = 4
ED_LEN_BUCKET = 8


def edit_distance_pairs(docs: DataFrame, *, threshold: int = ED_THRESHOLD) -> DataFrame:
    """Character-level fuzzy near-dup pairs: levenshtein <= ``threshold``
    within blocking keys — the typo/OCR-noise modality MinHash token
    shingles can miss (a one-char edit flips at most a few shingles but
    EVERY containing token).

    Blocking = (first ED_PREFIX normalized chars, length // ED_LEN_BUCKET):
    candidate pairs only meet inside a block via ONE equi self-join —
    never an all-pairs theta join; pairs straddling a block boundary are
    out of contract (same declared-miss model as LSH banding).  At 10^12
    docs hot blocks get the same size-cap/salting toolbox as hot shingles.

    Unicode note: both engines are levenshtein-capable but DuckDB counts
    BYTES and Spark counts CODEPOINTS, so non-ASCII chars are normalized
    to '?' first (regexp_replace is codepoint-wise in both) — making the
    metric well-defined and the oracle exact on any input."""
    n = docs.selectExpr(
        "doc_id",
        "regexp_replace(text, '[^\\\\x20-\\\\x7e]', '?') AS t",
    ).selectExpr(
        "doc_id", "t",
        f"substring(t, 1, {ED_PREFIX}) AS pfx",
        f"CAST(floor(length(t) / {ED_LEN_BUCKET}) AS BIGINT) AS lb",
    )
    a = n.select(F.col("doc_id").alias("doc_a"), F.col("t").alias("ta"), "pfx", "lb")
    b = n.select(F.col("doc_id").alias("doc_b"), F.col("t").alias("tb"), "pfx", "lb")
    return (
        a.join(b, ["pfx", "lb"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("ed", F.expr("levenshtein(ta, tb)"))
        .filter(F.col("ed") <= threshold)
        .select("doc_a", "doc_b", F.col("ed").cast("int").alias("ed"))
    )


def edit_distance_pairs_oracle_sql(*, threshold: int = ED_THRESHOLD) -> str:
    return f"""
WITH n AS (
  SELECT doc_id, regexp_replace(text, '[^\\x20-\\x7e]', '?', 'g') AS t
  FROM documents
),
b AS (
  SELECT doc_id, t, substr(t, 1, {ED_PREFIX}) AS pfx,
         CAST(floor(length(t) / {ED_LEN_BUCKET}) AS BIGINT) AS lb
  FROM n
)
SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
       CAST(levenshtein(a.t, b2.t) AS INT) AS ed
FROM b a JOIN b b2 ON a.pfx = b2.pfx AND a.lb = b2.lb AND a.doc_id < b2.doc_id
WHERE levenshtein(a.t, b2.t) <= {threshold}
"""
