"""Generic Pregel-style connected components (min-label propagation).

Extracted from the near-dup clustering path so every component-labelling
operator (near-dup graphs, adjacent-dense-cell clusters, session stitching)
shares one audited loop.  Each superstep: every node adopts
``min(own label, min over in-neighbour labels)`` via ONE edge-keyed shuffle
join + groupBy — exactly the GraphX/GraphFrames connectedComponents
superstep.  Rounds = component diameter.

Per-round ``localCheckpoint`` truncates the logical plan: persist alone
does NOT, and an iterative loop otherwise compounds lineage until plan
construction itself OOMs (observed on a diameter-11 chain).  On a real
cluster substitute reliable ``checkpoint()`` (HDFS-backed) and bucket the
edge table by ``dst`` so the per-round join is co-partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    node_col: str = "node",
    max_iter: int = 50,
) -> DataFrame:
    """Label every node with its component's minimum node id.

    ``nodes``: one column ``node_col`` (any orderable type, must be unique).
    ``edges``: columns (src, dst); treated as DIRECTED messages dst -> src,
    so pass both orientations for an undirected graph.
    Returns (``node_col``, cluster_id).
    """
    edges = edges.repartition("dst").localCheckpoint()
    labels = (
        nodes.select(F.col(node_col), F.col(node_col).alias("cluster_id"))
        .repartition(node_col)
        .localCheckpoint()
    )
    for _ in range(max_iter):
        msgs = (
            edges.join(labels, edges["dst"] == labels[node_col])
            .groupBy(F.col("src").alias(node_col))
            .agg(F.min("cluster_id").alias("_nbr_min"))
        )
        new = (
            labels.join(msgs, node_col, "left")
            .select(
                node_col,
                F.least(
                    F.col("cluster_id"), F.coalesce("_nbr_min", "cluster_id")
                ).alias("cluster_id"),
            )
            .repartition(node_col)
            .localCheckpoint()
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), node_col)
            .filter("n.cluster_id <> o.cluster_id")
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels


def bfs_hops(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    seed,
    node_col: str = "node",
    max_iter: int = 64,
) -> DataFrame:
    """Unweighted shortest-hop distances from ``seed`` (Pregel min-dist
    propagation — the BFS sibling of :func:`connected_components`; rounds
    = eccentricity of the seed).  ``edges`` must carry both orientations.
    Returns (``node_col``, hops) for REACHABLE nodes only."""
    INF = 1 << 60
    edges = edges.repartition("dst").localCheckpoint()
    dist = (
        nodes.select(
            F.col(node_col),
            F.when(F.col(node_col) == seed, F.lit(0))
            .otherwise(F.lit(INF))
            .cast("long")
            .alias("hops"),
        )
        .repartition(node_col)
        .localCheckpoint()
    )
    for _ in range(max_iter):
        msgs = (
            edges.join(dist, edges["dst"] == dist[node_col])
            .groupBy(F.col("src").alias(node_col))
            .agg(F.min(F.expr("hops + 1")).alias("_nbr"))
        )
        new = (
            dist.join(msgs, node_col, "left")
            .select(
                node_col,
                F.least(F.col("hops"), F.coalesce("_nbr", F.col("hops"))).alias(
                    "hops"
                ),
            )
            .repartition(node_col)
            .localCheckpoint()
        )
        changed = (
            new.alias("n")
            .join(dist.alias("o"), node_col)
            .filter("n.hops <> o.hops")
            .limit(1)
            .count()
        )
        dist = new
        if changed == 0:
            break
    return dist.filter(F.col("hops") < INF)


def bfs_cte_sql(
    edges_sql: str, seed_sql: str, node_col: str = "node", max_hops: int = 64
) -> str:
    """DuckDB oracle twin: bounded recursive walk, min hop count per node.
    ``edges_sql`` must yield (src, dst) in both orientations."""
    return f"""
edges AS ({edges_sql}),
walk(node, d) AS (
  SELECT ({seed_sql}), 0
  UNION
  SELECT e.src, w.d + 1 FROM edges e JOIN walk w ON e.dst = w.node
  WHERE w.d < {max_hops}
),
hops AS (SELECT node AS {node_col}, CAST(min(d) AS BIGINT) AS hops FROM walk GROUP BY 1)
"""


def triangle_counts(pairs: DataFrame) -> DataFrame:
    """Per-node triangle counts via degree-oriented wedge join
    (compact-forward / Cohen's MapReduce triangle algorithm).

    ``pairs``: undirected edges (doc_a, doc_b), one row per edge, no
    self-loops.  Returns (node, n_tri) for every node in >= 1 triangle.

    Scale shape: orienting every edge from its (degree, id)-SMALLER to
    -LARGER endpoint bounds each node's out-degree by O(sqrt(m)), so the
    wedge join (the quadratic step) does O(m^{3/2}) work TOTAL regardless
    of hub skew — the id-ordered naive orientation explodes on low-id
    hubs.  Three exchanges: degree count, wedge self-join on the oriented
    source, closing-edge join; all BIGINT-keyed equi-joins.
    """
    und = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    sym = und.union(und.select(F.col("v"), F.col("u")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    # edge + both endpoint degrees, oriented by (degree, id)
    withd = (
        und.join(deg.select(F.col("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("u").alias("v"), F.col("d").alias("dv")), "v")
    )
    lo_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    ori = withd.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(lo_first, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
    ).localCheckpoint()  # consumed twice (wedge sides) + once (closure)
    a = ori.select("src", F.col("dst").alias("x"), F.col("ddst").alias("dx"))
    b = ori.select("src", F.col("dst").alias("y"), F.col("ddst").alias("dy"))
    wedges = a.join(b, "src").filter(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = ori.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    tri = wedges.join(closing, ["x", "y"]).select("src", "x", "y")
    nodes = (
        tri.select(F.col("src").alias("node"))
        .union(tri.select(F.col("x")))
        .union(tri.select(F.col("y")))
    )
    return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n_tri"))


def triangle_counts_oracle_sql(pairs_sql: str, out_col: str = "node") -> str:
    """DuckDB ground truth: id-ordered 3-way self-join (a<b<c) — the
    orientation does not change the triangle set, only the work bound."""
    return f"""
WITH e AS (SELECT least(doc_a, doc_b) AS a, greatest(doc_a, doc_b) AS b
           FROM ({pairs_sql})),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT node AS {out_col}, count(*) AS n_tri
FROM (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
GROUP BY 1
"""


def reach_cte_sql(edges_sql: str, nodes_sql: str, node_col: str = "node") -> str:
    """DuckDB oracle twin: recursive CTE computing the same min-label
    components.  ``edges_sql`` must yield (src, dst) in both orientations;
    ``nodes_sql`` one column named ``node_col``.  reach(node, lbl)
    enumerates labels lbl < node reachable from node; pruning on
    lbl < src keeps the fixpoint at O(sum component^2) rows while still
    delivering every component's global min to every member (the min m
    reaches n along any path because m < v holds at each hop)."""
    return f"""
edges AS ({edges_sql}),
reach(node, lbl) AS (
  SELECT src, dst FROM edges WHERE dst < src
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.node = e.dst WHERE r.lbl < e.src
),
cl AS (
  SELECT n.{node_col} AS node, COALESCE(min(r.lbl), n.{node_col}) AS cluster_id
  FROM ({nodes_sql}) n LEFT JOIN reach r ON r.node = n.{node_col}
  GROUP BY n.{node_col}
)
"""
