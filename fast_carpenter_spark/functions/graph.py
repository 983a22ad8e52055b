"""Distributed connected components + graph kernels.

Two component-labelling implementations share one signature:

* :func:`connected_components` — alternating LARGE-STAR / SMALL-STAR
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC 2014).  Converges in O(log n) rounds REGARDLESS of component
  diameter — the 100 TB shape: a chained near-dup corpus can have
  diameter in the hundreds, which kills any per-hop propagation.
* :func:`connected_components_minlabel` — classic Pregel min-label
  propagation (rounds = component diameter), kept as the independently
  derived twin; a result-identity test pins the two to each other and
  the DuckDB recursive-CTE oracle pins both.

Per-round plan truncation: ``localCheckpoint`` by default (fast,
executor-local blocks); set ``spark.graft.checkpointDir`` to switch every
iterative loop in this package to reliable ``checkpoint()`` (HDFS-backed)
so a lost executor can't kill a long iterative job on a real cluster —
persist alone does NOT truncate, and an iterative loop otherwise compounds
lineage until plan construction itself OOMs (observed on a diameter-11
chain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def plan_truncate(df: DataFrame) -> DataFrame:
    """Cut lineage between supersteps of an iterative loop.

    Default: ``localCheckpoint(eager=True)`` — blocks live on executors,
    no DFS round-trip, right for local mode and short loops.  When
    ``spark.graft.checkpointDir`` is set, use reliable ``checkpoint()``
    instead: blocks go to the fault-tolerant store, so on a real cluster
    an executor loss mid-loop recomputes nothing older than one round.
    """
    spark = df.sparkSession
    ckdir = spark.conf.get("spark.graft.checkpointDir", None)
    if ckdir:
        spark.sparkContext.setCheckpointDir(ckdir)
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    node_col: str = "node",
    max_iter: int = 50,
    _stats: dict | None = None,
) -> DataFrame:
    """Label every node with its component's minimum node id — alternating
    large-star/small-star, O(log n) rounds.

    ``nodes``: one column ``node_col`` (any orderable type, must be unique).
    ``edges``: columns (src, dst); orientation is irrelevant (edges are
    canonicalized), self-loops ignored.  Returns (``node_col``, cluster_id).

    Round shape (all BIGINT/orderable-keyed equi-joins + groupBys, no
    collect): LARGE-STAR symmetrizes, computes each node's neighborhood
    min m = min(N(u) ∪ {u}) with one groupBy, and rewires every LARGER
    neighbor to m; SMALL-STAR (edges now oriented hi→lo) rewires every
    smaller neighbor and u itself to the group min.  Both strictly
    decrease the potential Σ(u - root(u)), halving tree heights, hence
    O(log n) rounds; convergence = edge set unchanged (exact ``exceptAll``
    probe, one extra shuffle per round — cheap next to the round itself).

    ``_stats``: optional dict; records ``rounds`` for diagnostics/tests.
    """
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
        )
        .distinct()
    )
    e = plan_truncate(e.repartition("u"))
    e_count = e.count()
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # large-star: m = min over symmetric neighborhood ∪ self;
        # every neighbor v > u re-attaches to m (output oriented hi→lo)
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        lmin = (
            sym.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select("u", F.least("_mn", "u").alias("m"))
        )
        ls = (
            sym.join(lmin, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: all neighbors of u are < u; m = their min; every
        # neighbor AND u itself re-attach to m
        smin = ls.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            ls.join(smin, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(smin.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        ss = plan_truncate(ss.repartition("u"))
        # both sides are distinct sets, so ss == e  ⇔  |ss| = |e| ∧ ss\e = ∅;
        # a one-sided exceptAll alone would accept a strict subset and stop
        # on a not-yet-converged edge set
        ss_count = ss.count()
        changed = ss_count != e_count or ss.exceptAll(e).limit(1).count() > 0
        e, e_count = ss, ss_count
        if not changed:
            break
    if _stats is not None:
        _stats["rounds"] = rounds
    stars = e.groupBy(F.col("u").alias(node_col)).agg(
        F.min("v").alias("_root")
    )
    return nodes.join(stars, node_col, "left").select(
        node_col,
        F.coalesce("_root", F.col(node_col)).alias("cluster_id"),
    )


def connected_components_minlabel(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    node_col: str = "node",
    max_iter: int = 50,
    _stats: dict | None = None,
) -> DataFrame:
    """Pregel min-label propagation twin of :func:`connected_components`.

    Each superstep: every node adopts ``min(own label, min over
    in-neighbour labels)`` via ONE edge-keyed shuffle join + groupBy —
    the GraphX/GraphFrames connectedComponents superstep.  Rounds =
    component DIAMETER, so this is the small-graph / oracle-parity path;
    the alternating-star version is the at-scale default.

    ``edges``: treated as DIRECTED messages dst -> src, so pass both
    orientations for an undirected graph (kept from the original
    signature; the star version canonicalizes internally instead).
    """
    edges = plan_truncate(edges.repartition("dst"))
    labels = plan_truncate(
        nodes.select(F.col(node_col), F.col(node_col).alias("cluster_id"))
        .repartition(node_col)
    )
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        msgs = (
            edges.join(labels, edges["dst"] == labels[node_col])
            .groupBy(F.col("src").alias(node_col))
            .agg(F.min("cluster_id").alias("_nbr_min"))
        )
        new = plan_truncate(
            labels.join(msgs, node_col, "left")
            .select(
                node_col,
                F.least(
                    F.col("cluster_id"), F.coalesce("_nbr_min", "cluster_id")
                ).alias("cluster_id"),
            )
            .repartition(node_col)
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
    if _stats is not None:
        _stats["rounds"] = rounds
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
    edges = plan_truncate(edges.repartition("dst"))
    dist = plan_truncate(
        nodes.select(
            F.col(node_col),
            F.when(F.col(node_col) == seed, F.lit(0))
            .otherwise(F.lit(INF))
            .cast("long")
            .alias("hops"),
        ).repartition(node_col)
    )
    for _ in range(max_iter):
        msgs = (
            edges.join(dist, edges["dst"] == dist[node_col])
            .groupBy(F.col("src").alias(node_col))
            .agg(F.min(F.expr("hops + 1")).alias("_nbr"))
        )
        new = plan_truncate(
            dist.join(msgs, node_col, "left")
            .select(
                node_col,
                F.least(F.col("hops"), F.coalesce("_nbr", F.col("hops"))).alias(
                    "hops"
                ),
            )
            .repartition(node_col)
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


def sssp(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    seed,
    node_col: str = "node",
    max_iter: int = 256,
) -> DataFrame:
    """Weighted single-source shortest paths from ``seed`` — Bellman-Ford
    min-plus propagation, the weighted sibling of :func:`bfs_hops`.

    ``edges`` must carry (src, dst, w) in BOTH orientations with INTEGER
    weights w >= 1: min() over integer sums is aggregation-order-
    independent, so the iterative kernel is bit-exact across engines and
    partitionings (the same float-free discipline as :func:`pagerank`).

    Scale shape: each superstep is one dst-keyed hash join + a min
    aggregate onto src — the relaxations of classic Bellman-Ford batched
    per round; rounds = hop length of the longest shortest path (NOT
    |V| - 1: the convergence probe stops as soon as no distance improved).
    Per-round :func:`plan_truncate` keeps lineage flat; on a real cluster
    set ``spark.graft.checkpointDir`` for reliable checkpoints.

    Returns (``node_col``, dist) for REACHABLE nodes only.
    """
    INF = 1 << 60
    edges = plan_truncate(edges.repartition("dst"))
    dist = plan_truncate(
        nodes.select(
            F.col(node_col),
            F.when(F.col(node_col) == seed, F.lit(0))
            .otherwise(F.lit(INF))
            .cast("long")
            .alias("dist"),
        ).repartition(node_col)
    )
    for _ in range(max_iter):
        msgs = (
            edges.join(dist, edges["dst"] == dist[node_col])
            .filter(F.col("dist") < INF)  # only settled frontiers relax
            .groupBy(F.col("src").alias(node_col))
            .agg(F.min(F.expr("dist + w")).alias("_nbr"))
        )
        new = plan_truncate(
            dist.join(msgs, node_col, "left")
            .select(
                node_col,
                F.least(F.col("dist"), F.coalesce("_nbr", F.col("dist"))).alias(
                    "dist"
                ),
            )
            .repartition(node_col)
        )
        changed = (
            new.alias("n")
            .join(dist.alias("o"), node_col)
            .filter("n.dist <> o.dist")
            .limit(1)
            .count()
        )
        dist = new
        if changed == 0:
            break
    return dist.filter(F.col("dist") < INF)


def sssp_cte_sql(
    edges_sql: str, seed_sql: str, node_col: str = "node", max_cost: int = 512
) -> str:
    """DuckDB oracle twin of :func:`sssp`: bounded recursive weighted walk,
    min cumulative cost per node.  ``edges_sql`` must yield (src, dst, w)
    in both orientations with integer w >= 1; ``max_cost`` must exceed the
    true maximum shortest distance (w >= 1 guarantees termination — the
    UNION dedups (node, d) pairs, so the working set is <= |V| * max_cost)."""
    return f"""
edges AS ({edges_sql}),
walk(node, d) AS (
  SELECT ({seed_sql}), CAST(0 AS BIGINT)
  UNION
  SELECT e.src, w.d + e.w FROM edges e JOIN walk w ON e.dst = w.node
  WHERE w.d + e.w <= {max_cost}
),
dists AS (SELECT node AS {node_col}, CAST(min(d) AS BIGINT) AS dist FROM walk GROUP BY 1)
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


# --- PageRank (integer fixed-point) ------------------------------------------

PR_SCALE = 1_000_000_000
PR_ITERS = 5


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    node_col: str = "node",
    iters: int = PR_ITERS,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Damped PageRank with EXACT integer fixed-point arithmetic:

        contrib(u) = pr(u) DIV outdeg(u)
        pr'(v)     = 0.15*scale + (85 * sum_in contrib(u)) DIV 100

    Every operation is BIGINT (floor division, integer sums), so the
    result is independent of aggregation order — the trick that lets a
    floating-point-free iterative ML/graph kernel be bit-exact across
    engines (same family as ivf_centroid_update's fixed-point M-step).
    Per round: one edge-keyed join + one groupBy (the Pregel superstep
    shape); plan_truncate bounds lineage; fixed ``iters`` (power-iteration
    convergence is geometric; rank ordering stabilizes long before
    values).  Dangling-mass redistribution is intentionally omitted (this
    is a centrality score, not a probability distribution); isolated
    nodes sit at the 0.15*scale base.  ``edges`` must contain both
    orientations for an undirected graph."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    e = plan_truncate(edges.join(deg, "src").repartition("dst"))
    pr = plan_truncate(
        nodes.select(F.col(node_col), F.lit(scale).cast("long").alias("pr"))
    )
    base = (15 * scale) // 100
    for _ in range(iters):
        msgs = (
            e.join(pr, e["src"] == pr[node_col])
            .select(F.col("dst"), F.expr("pr DIV _deg").alias("_c"))
            .groupBy("dst")
            .agg(F.sum("_c").alias("_m"))
        )
        pr = plan_truncate(
            nodes.select(node_col)
            .join(msgs, F.col(node_col) == F.col("dst"), "left")
            .select(
                F.col(node_col),
                F.expr(
                    f"CAST({base} AS BIGINT) + (85 * coalesce(_m, CAST(0 AS BIGINT))) DIV 100"
                ).alias("pr"),
            )
            .repartition(node_col)
        )
    return pr


def pagerank_cte_sql(
    edges_sql: str,
    nodes_sql: str,
    node_col: str,
    *,
    iters: int = PR_ITERS,
    scale: int = PR_SCALE,
) -> str:
    """DuckDB twin: the same integer recurrence unrolled as chained CTEs
    (fixed iteration count -> plain SQL, no recursion needed)."""
    base = (15 * scale) // 100
    parts = [
        f"e AS ({edges_sql})",
        f"nd AS ({nodes_sql})",
        "deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1)",
        f"pr0 AS (SELECT {node_col}, CAST({scale} AS BIGINT) AS pr FROM nd)",
    ]
    for i in range(iters):
        parts.append(
            f"m{i} AS (SELECT e.dst AS {node_col}, "
            f"CAST(sum(pr{i}.pr // deg.d) AS BIGINT) AS m "
            f"FROM e JOIN deg USING (src) "
            f"JOIN pr{i} ON pr{i}.{node_col} = e.src GROUP BY 1)"
        )
        parts.append(
            f"pr{i + 1} AS (SELECT nd.{node_col}, "
            f"CAST({base} + (85 * coalesce(m{i}.m, 0)) // 100 AS BIGINT) AS pr "
            f"FROM nd LEFT JOIN m{i} USING ({node_col}))"
        )
    return ",\n".join(parts) + f",\nprf AS (SELECT {node_col}, pr FROM pr{iters})"


def kcore(
    nodes: DataFrame, edges: DataFrame, k: int, node_col: str = "node"
) -> tuple[DataFrame, int]:
    """k-core: the maximal subgraph where every node keeps >= k neighbours
    — iterative peel (drop alive-degree < k, recompute, repeat) to the
    unique fixpoint.  Returns (core nodes with their in-core degree,
    rounds taken).

    Peeling is monotone (the alive set only shrinks) and IDEMPOTENT at the
    fixpoint — re-running a round changes nothing — which is what lets the
    DuckDB oracle unroll a fixed number of rounds safely (kcore_cte_sql;
    tests assert the engine converged well inside the unroll depth).

    Scale shape: per round one equi-join of the edge list against the
    alive set (both orientations already in ``edges``) + a degree
    aggregate; plan_truncate between rounds keeps lineage flat.  Rounds
    are bounded by the peel depth (degeneracy ordering length), typically
    a handful on blob-shaped spatial graphs."""
    from pyspark.sql import functions as F

    alive = nodes.select(node_col)
    rounds = 0
    n_alive = alive.count()
    while True:
        deg = (
            edges.join(alive.withColumnRenamed(node_col, "src"), "src")
            .join(alive.withColumnRenamed(node_col, "dst"), "dst")
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        nxt = plan_truncate(
            deg.filter(F.col("deg") >= k)
            .select(F.col("src").alias(node_col), "deg")
        )
        rounds += 1
        n_next = nxt.count()
        if n_next == n_alive:
            return nxt, rounds
        n_alive = n_next
        alive = nxt.select(node_col)


def kcore_cte_sql(
    edges_sql: str, nodes_sql: str, k: int, node_col: str = "node", rounds: int = 16
) -> str:
    """Fixed-depth unrolled peel as chained CTEs (safe past the fixpoint
    by idempotence).  Expects ``edges_sql``/``nodes_sql`` to reference
    CTEs already defined by the caller; emits alive0..alive{rounds} and a
    final ``core`` CTE of ({node_col}, deg)."""
    parts = [f"alive0 AS (SELECT {node_col} FROM ({nodes_sql}) _n)"]
    parts.append(f"eg AS MATERIALIZED ({edges_sql})")
    for i in range(rounds):
        # MATERIALIZED at every level: alive{i} is referenced twice per
        # round, so inlining doubles the plan per round (2^rounds blow-up)
        parts.append(
            f"deg{i + 1} AS MATERIALIZED (SELECT e.src AS {node_col}, "
            f"CAST(count(*) AS BIGINT) AS deg "
            f"FROM eg e JOIN alive{i} x ON x.{node_col} = e.src "
            f"JOIN alive{i} y ON y.{node_col} = e.dst GROUP BY 1)"
        )
        parts.append(
            f"alive{i + 1} AS MATERIALIZED "
            f"(SELECT {node_col} FROM deg{i + 1} WHERE deg >= {k})"
        )
    parts.append(
        f"core AS (SELECT {node_col}, deg FROM deg{rounds} WHERE deg >= {k})"
    )
    return ",\n".join(parts)
