"""Graph analytics — PageRank over the customer↔supplier graph.

Completes the iterative-algorithm family (connected components in
:mod:`.dedup`, Lloyd k-means and the GD trainer in :mod:`.similarity` /
:mod:`.regression`) with the canonical power-iteration pattern: ranks
flow along edges, one keyed shuffle per iteration.

Graph: the bipartite trade graph — an undirected edge between customer
c and supplier s for every distinct (c, s) pair that shares a lineitem
(suppliers offset by 2^40 into a shared node-id space).  PageRank per
Brin & Page 1998 with damping 0.85, two unrolled iterations from a
uniform start.

Integer-exact discipline (the k-means/GD recipe): ranks live as
integers scaled by 1e9; every per-step operation is integer floor
division / multiplication (`div` in Spark, `//` in DuckDB — identical
on non-negative operands), so the final ranks are bit-identical across
engines with no float fold to reconcile.  Real deployments run float
ranks; the quantized spelling changes nothing structural (ranks stay a
DataFrame, never visit the driver).

Scale shape per iteration: edges ⋈ ranks (shuffle on src — at 100 TB
the edge table is partitioned by src once and REUSED, so each
iteration's join is co-located) → contributions groupBy(dst) with
map-side partial sums → join back to the nodes frame.  The iteration
count is the only serial dimension; everything inside an iteration is
one pass over edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..io import load
from ..plans.registry import query

PR_SCALE = 1_000_000_000
# supplier ids shift into a disjoint range of the shared node-id space;
# 2^40 keeps customer keys collision-free up to ~10^12 rows (a 1e6
# offset would collide at TPC-H SF >= ~7)
PR_SUPP_OFFSET = 1 << 40
PR_TOP = 20

_PR_ORACLE = f"""
    WITH pairs AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    edges AS (
        SELECT c AS src, s + {PR_SUPP_OFFSET} AS dst FROM pairs
        UNION ALL
        SELECT s + {PR_SUPP_OFFSET} AS src, c AS dst FROM pairs
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (
        SELECT node, {PR_SCALE} // n AS r, n FROM nodes, nn
    ),
    s1 AS (
        SELECT e.dst AS node, SUM(r.r // dg.d) AS contrib
        FROM edges e JOIN r0 r ON e.src = r.node JOIN deg dg ON e.src = dg.src
        GROUP BY e.dst
    ),
    r1 AS (
        SELECT r0.node,
               (15 * ({PR_SCALE} // r0.n)) // 100
                   + (85 * COALESCE(s1.contrib, 0)) // 100 AS r,
               r0.n
        FROM r0 LEFT JOIN s1 ON r0.node = s1.node
    ),
    s2 AS (
        SELECT e.dst AS node, SUM(r.r // dg.d) AS contrib
        FROM edges e JOIN r1 r ON e.src = r.node JOIN deg dg ON e.src = dg.src
        GROUP BY e.dst
    ),
    r2 AS (
        SELECT r1.node,
               (15 * ({PR_SCALE} // r1.n)) // 100
                   + (85 * COALESCE(s2.contrib, 0)) // 100 AS r
        FROM r1 LEFT JOIN s2 ON r1.node = s2.node
    )
    SELECT CASE WHEN node >= {PR_SUPP_OFFSET} THEN 'supplier'
                ELSE 'customer' END AS node_type,
           CASE WHEN node >= {PR_SUPP_OFFSET} THEN node - {PR_SUPP_OFFSET}
                ELSE node END AS node_id,
           CAST(r AS BIGINT) AS rank_scaled
    FROM r2
    ORDER BY r DESC, node ASC
    LIMIT {PR_TOP}
"""


def _pr_step(edges: DataFrame, ranks: DataFrame) -> DataFrame:
    """One power iteration: push rank/deg along edges, damp, re-base.
    `ranks` carries (node, r, n, d) — degree rides WITH the rank so an
    iteration is ONE edges⋈state join (not edges⋈ranks⋈deg), and the
    per-edge contribution r div d is computed before the exchange."""
    contrib = (
        edges.join(
            ranks.select(
                F.col("node").alias("src"), F.expr("r div d").alias("u")
            ),
            "src",
        )
        .groupBy("dst")
        .agg(F.sum("u").alias("contrib"))
    )
    return (
        ranks.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
        .select(
            "node",
            (
                F.expr(f"(15 * ({PR_SCALE} div n)) div 100")
                + F.expr("(85 * coalesce(contrib, 0)) div 100")
            ).alias("r"),
            "n",
            "d",
        )
    )


@query("q_graph_pagerank", _PR_ORACLE)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 nodes of the customer↔supplier trade graph by PageRank
    (damping 0.85, two unrolled integer-exact iterations — see module
    docstring for the graph, the quantization, and the per-iteration
    scale shape)."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    fwd = pairs.select(
        F.col("c").alias("src"), (F.col("s") + PR_SUPP_OFFSET).alias("dst")
    )
    rev = pairs.select(
        (F.col("s") + PR_SUPP_OFFSET).alias("src"), F.col("c").alias("dst")
    )
    # the edge frame feeds two joins per iteration x two iterations:
    # pin it once, LAZILY (eager=False: constructing the query must not
    # launch a Spark job).  localCheckpoint stores unreplicated blocks,
    # so an executor loss loses the cut lineage — acceptable in
    # local[*]; a cluster deployment should swap this for
    # `spark.sparkContext.setCheckpointDir(...)` + `.checkpoint()` to
    # reliable storage (or a src-partitioned materialized edge table)
    edges = fwd.unionByName(rev).localCheckpoint(eager=False)
    # deg doubles as the node list (every node has an out-edge in the
    # undirected graph) — no separate distinct pass
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    nn = deg.agg(F.count(F.lit(1)).alias("n"))
    ranks = deg.crossJoin(broadcast(nn)).select(
        "node", F.expr(f"{PR_SCALE} div n").alias("r"), "n", "d"
    )
    for _ in range(2):
        ranks = _pr_step(edges, ranks)
    node_type = F.when(
        F.col("node") >= PR_SUPP_OFFSET, "supplier"
    ).otherwise("customer")
    node_id = F.when(
        F.col("node") >= PR_SUPP_OFFSET, F.col("node") - PR_SUPP_OFFSET
    ).otherwise(F.col("node"))
    return (
        ranks.orderBy(F.desc("r"), F.asc("node"))
        .limit(PR_TOP)
        .select(
            node_type.alias("node_type"),
            node_id.alias("node_id"),
            F.col("r").cast("long").alias("rank_scaled"),
        )
    )
