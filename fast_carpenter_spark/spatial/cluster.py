"""Density-based spatial clustering (DBSCAN) as a composition of audited
distributed primitives — no bespoke iteration of its own.

The classic sequential DBSCAN (Ester et al., KDD'96) is re-expressed in
three scale-safe stages:

1. eps-neighborhood pairs via the bounded cell-ring ``radius_join`` (one
   BIGINT-keyed shuffle; candidates only meet inside a ~3x3 ring, never
   all-pairs),
2. core test = a degree count (partial agg before the exchange),
3. cluster formation = connected components over the core-core subgraph
   (the shared Pregel min-label loop, rounds = component diameter).

Border points take the MINIMUM cluster id among their core neighbours —
the one deterministic resolution of the classic algorithm's
visit-order-dependent border tie, so the output is reproducible and
oracle-checkable.  Noise keeps the classic ``cluster_id = -1`` (not NULL,
so the value hash is engine-stable).

At 100 TB the eps-ring join dominates; it inherits radius_join's knobs
(resolution auto-sized so the ring stays ~3x3, hot cells salted upstream).
The Pregel loop runs only on CORE points — in sparse corpora that is a
small fraction of the input — and its per-round shuffle is keyed by node
id, bucketable on a real cluster.

ref: fast-carpenter has no clustering stage; this extends the engine's
spatial family (SURVEY.md §2.4) the same way kNN/radius did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.graph import connected_components, plan_truncate, reach_cte_sql
from .knn import radius_join


def dbscan(
    points: DataFrame,
    *,
    eps: float,
    min_pts: int,
    id_col: str = "doc_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    max_iter: int = 50,
) -> DataFrame:
    """(id_col, role in {core, border, noise}, cluster_id).

    ``cluster_id`` is the minimum member id of the point's cluster (the
    component label), the min core-neighbour's label for borders, and
    ``-1`` for noise.  A point is core when its eps-neighbourhood —
    including itself — holds at least ``min_pts`` points.
    """
    pairs = radius_join(
        points, radius=eps, id_col=id_col, lon_col=lon_col, lat_col=lat_col
    ).select("doc_a", "doc_b")
    # both orientations once; every downstream stage reuses this exchange
    sym = (
        pairs.union(pairs.select(F.col("doc_b"), F.col("doc_a")))
        .toDF("src", "dst")
    )
    sym = plan_truncate(sym)
    ids = points.select(F.col(id_col).alias("id"))
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("_deg"))
    core = (
        ids.join(deg, "id", "left")
        .filter(F.coalesce("_deg", F.lit(0)) + 1 >= min_pts)
        .select("id")
    )
    core = plan_truncate(core)
    core_edges = (
        sym.join(core.select(F.col("id").alias("src")), "src")
        .join(core.select(F.col("id").alias("dst")), "dst")
        .select("src", "dst")
    )
    comp = connected_components(core, core_edges, node_col="id", max_iter=max_iter)
    noncore = ids.join(core, "id", "left_anti")
    border = (
        sym.join(noncore.select(F.col("id").alias("src")), "src")
        .join(comp.select(F.col("id").alias("dst"), "cluster_id"), "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    out = comp.withColumn("role", F.lit("core")).unionByName(
        border.withColumn("role", F.lit("border"))
    )
    noise = (
        ids.join(out.select("id"), "id", "left_anti")
        .withColumn("cluster_id", F.lit(-1).cast(points.schema[id_col].dataType))
        .withColumn("role", F.lit("noise"))
    )
    return out.unionByName(noise).select(
        F.col("id").alias(id_col), "role", "cluster_id"
    )


def dbscan_oracle_sql(points_sql: str, *, eps: float, min_pts: int) -> str:
    """DuckDB ground truth: brute-force eps-pairs, degree core test, the
    shared recursive-CTE min-label components, min-label border tie-break.
    ``points_sql`` must yield (doc_id, lon, lat).  Wrap the result in
    ``WITH RECURSIVE ... SELECT`` — this returns the full statement."""
    cc = reach_cte_sql(
        "SELECT p.src, p.dst FROM pairs p "
        "JOIN core a ON p.src = a.id JOIN core b ON p.dst = b.id",
        "SELECT id AS node FROM core",
        "node",
    )
    return f"""
WITH RECURSIVE pts AS (SELECT doc_id AS id, lon, lat FROM ({points_sql})),
pairs AS (
  SELECT a.id AS src, b.id AS dst FROM pts a JOIN pts b
  ON a.id <> b.id
 AND (a.lon - b.lon) * (a.lon - b.lon) + (a.lat - b.lat) * (a.lat - b.lat)
     <= {eps!r} * {eps!r}
),
deg AS (SELECT src AS id, count(*) AS n FROM pairs GROUP BY 1),
core AS (SELECT id FROM deg WHERE n + 1 >= {min_pts}),
{cc},
border AS (
  SELECT p.src AS id, min(c.cluster_id) AS cluster_id
  FROM pairs p JOIN cl c ON c.node = p.dst
  WHERE p.src NOT IN (SELECT id FROM core)
  GROUP BY 1
)
SELECT node AS doc_id, 'core' AS role, cluster_id FROM cl
UNION ALL
SELECT id, 'border', cluster_id FROM border
UNION ALL
SELECT id, 'noise', -1 FROM pts
WHERE id NOT IN (SELECT id FROM core) AND id NOT IN (SELECT id FROM border)
"""
