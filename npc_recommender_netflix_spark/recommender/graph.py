"""Graph analytics over the co-purchase graph (SURVEY.md §2.8 extension).

PageRank as an iterative DataFrame algorithm — the MapReduce reference's
canonical "chained jobs" workload re-expressed as a driver-side loop over
lazy plans. Determinism across engines comes from rounding the rank to 9dp
at the END of every iteration: the rounded values are exact decimals, so
each iteration starts from bit-identical inputs on both engines and the
only float noise is one iteration's sum association (~1e-13, far inside
the 9dp grid).

100 TB shape: edges/degrees are computed once and cached; each iteration is
one shuffle (groupBy dst) sized by edge count. The iteration count is fixed
(3) — at real scale you iterate to a convergence epsilon with the same loop
body and localCheckpoint() every few rounds to truncate lineage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register
from ..session import f6, load_table

# co-purchase edges: items (l_partkey % 500) sharing an order, symmetric,
# distinct; degrees; node universe
_GRAPH_SQL = r"""
    items AS (SELECT DISTINCT l_orderkey, l_partkey % 500 AS item FROM lineitem),
    edges AS (SELECT DISTINCT a.item AS src, b.item AS dst
              FROM items a JOIN items b
                ON a.l_orderkey = b.l_orderkey AND a.item <> b.item),
    deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    n AS (SELECT count(*) AS c FROM nodes)
"""

_PR_ITER_SQL = """
    p{next} AS (SELECT e.dst AS node,
                       round(0.15 / n.c + 0.85 * sum(p{cur}.r / deg.d), 9) AS r
                FROM p{cur}
                JOIN edges e ON e.src = p{cur}.node
                JOIN deg ON deg.src = p{cur}.node
                CROSS JOIN n
                GROUP BY e.dst, n.c)
"""


@register(
    "r_pagerank",
    f"""
    WITH {_GRAPH_SQL},
    p0 AS (SELECT node, 1.0 / n.c AS r FROM nodes CROSS JOIN n),
    {_PR_ITER_SQL.format(cur=0, next=1)},
    {_PR_ITER_SQL.format(cur=1, next=2)},
    {_PR_ITER_SQL.format(cur=2, next=3)}
    SELECT node, round(r, 6) + 0 AS rank
    FROM p3
    """,
)
def r_pagerank(spark, sf_dir):
    """PageRank (damping 0.85, 3 fixed iterations) over the co-purchase
    item graph. The oracle unrolls the same three iterations as chained
    CTEs; per-iteration 9dp rounding makes the fixpoint engine-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        "l_orderkey", (F.col("l_partkey") % 500).alias("item")
    ).distinct()
    a = items.alias("a")
    b = items.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("a.item") != F.col("b.item"))
        .select(F.col("a.item").alias("src"), F.col("b.item").alias("dst"))
        .distinct()
        .cache()  # reused by every iteration (Spark won't share the subtree)
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("d")).cache()
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n = nodes.count()  # one scalar to the driver; fine at any scale
    pr = nodes.withColumn("r", F.lit(1.0 / n))
    for _ in range(3):
        contrib = (
            edges.join(pr, edges.src == pr.node)
            .join(deg, "src")
            .select("dst", (F.col("r") / F.col("d")).alias("w"))
        )
        pr = contrib.groupBy("dst").agg(
            F.round(F.lit(0.15 / n) + 0.85 * F.sum("w"), 9).alias("r")
        ).select(F.col("dst").alias("node"), "r")
    return pr.select("node", f6(F.col("r")).alias("rank"))
