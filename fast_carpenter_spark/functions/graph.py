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
