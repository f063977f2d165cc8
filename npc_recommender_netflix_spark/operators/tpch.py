"""Composite TPC-H-style analytics queries (adapted to the trimmed fixture
schemas) — multi-operator end-to-end plans a warehouse user actually runs,
exercising join ordering, broadcast selection, partial aggregation,
TakeOrderedAndProject, and selective scan pushdown TOGETHER.

Scale notes: every dim (region/nation/customer-as-dim, supplier) joins
broadcast; the fact-fact orders⋈lineitem join shuffles on orderkey; date
predicates reach the parquet scans (PushedFilters); final top-k is
TakeOrderedAndProject (per-partition heap + driver merge of k rows).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table, money2, tables

def _rev_exact():
    """Revenue summand as an exact integer (price-cents x discount-percent
    units): l_extendedprice has 2dp and l_discount 2dp, so the product has
    exactly 4 decimal places — summing it as BIGINT is bit-exact in any
    order on any engine, where summing the raw double product can land on
    opposite sides of a half-cent rounding boundary depending on reduction
    order (caught by the sf0.001 cross-check). Built lazily: classic-mode
    Column construction needs an active context."""
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round((1 - F.col("l_discount")) * 100).cast("long")
    return cents * disc


@register(
    "q_shipping_priority",
    """
    SELECT l.l_orderkey,
           round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                     * CAST(round((1 - l.l_discount) * 100) AS BIGINT)) / 10000.0, 2)
               + 0.0 AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: unshipped-order revenue by priority, top 10."""
    cust, orders, li = tables(spark, sf_dir, "customer", "orders", "lineitem")
    j = (
        cust.where(F.col("c_mktsegment") == "BUILDING")
        .join(orders, cust.c_custkey == orders.o_custkey)
        .where(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
        .join(li, li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    )
    return (
        j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.round(F.sum(_rev_exact()) / 10000.0, 2) + 0.0).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "q_local_supplier_volume",
    """
    SELECT n.n_name,
           round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                     * CAST(round((1 - l.l_discount) * 100) AS BIGINT)) / 10000.0, 2)
               + 0.0 AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                    JOIN nation n ON n.n_nationkey = s.s_nationkey
                    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE c.c_nationkey = s.s_nationkey
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: revenue where customer and supplier share a nation.

    The region/nation/supplier dims broadcast; customer⋈orders⋈lineitem
    shuffles on the join keys; the same-nation predicate is applied as a
    post-join filter exactly as written.
    """
    cust, orders, li, supp, nation, region = tables(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    j = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), supp.s_suppkey == li.l_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), nation.n_nationkey == supp.s_nationkey)
        .join(F.broadcast(region), region.r_regionkey == nation.n_regionkey)
    )
    return (
        j.groupBy("n_name")
        .agg((F.round(F.sum(_rev_exact()) / 10000.0, 2) + 0.0).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "q_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                     * CAST(round((1 - l.l_discount) * 100) AS BIGINT)) / 10000.0, 2)
               + 0.0 AS revenue,
           round(c.c_acctbal, 2) + 0.0 AS c_acctbal, n.n_name
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: top-20 customers by returned-item revenue."""
    cust, orders, li, nation = tables(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    j = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .where(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(li.where(F.col("l_returnflag") == "R"), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), nation.n_nationkey == cust.c_nationkey)
    )
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg((F.round(F.sum(_rev_exact()) / 10000.0, 2) + 0.0).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            money2(F.col("c_acctbal")).alias("c_acctbal"),
            "n_name",
        )
    )


@register(
    "q_large_volume_customer",
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           round(o.o_totalprice, 2) + 0.0 AS total,
           CAST(sum(l.l_quantity) AS BIGINT) AS order_qty
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q_large_volume_customer(spark, sf_dir):
    """TPC-H Q18-shape composite: customers holding orders whose total
    quantity exceeds 250, top-100 by order value.

    Plan shape: the HAVING subquery is one partial+final agg over lineitem
    producing a small qualifying-order set; it semi-joins orders BEFORE the
    customer join, so the expensive join only sees qualifying orders. At
    100 TB both aggregates combine map-side (sum/count), and the final
    TakeOrdered keeps 100 rows per partition. l_quantity is integral, so
    sum order never matters (exact in doubles, cast to BIGINT both sides).
    """
    cust, orders, li = tables(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("oq"))
        .where(F.col("oq") > 250)
        .select("l_orderkey")
    )
    qualifying = orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
    j = cust.join(qualifying, cust.c_custkey == qualifying.o_custkey).join(
        li, li.l_orderkey == qualifying.o_orderkey
    )
    return (
        j.groupBy("c_name", "c_custkey", "o_orderkey", "o_totalprice")
        .agg(F.sum("l_quantity").cast("long").alias("order_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            money2(F.col("o_totalprice")).alias("total"), "order_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@register(
    "q_promo_revenue",
    """
    SELECT round(100.0 * CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%'
                     THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                          * CAST(round((1 - l.l_discount) * 100) AS BIGINT)
                     ELSE 0 END) AS DOUBLE)
                 / CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                            * CAST(round((1 - l.l_discount) * 100) AS BIGINT))
                        AS DOUBLE), 6) + 0.0 AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def q_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: share of one month's revenue from PROMO parts.

    Plan shape: the shipdate range predicate reaches the lineitem parquet
    scan (PushedFilters), shrinking the fact side before the join; part is
    a dim and joins broadcast (no shuffle of lineitem at all), and the
    conditional sum combines map-side into two BIGINT cells per partition.
    Both summands use the exact cents*discount-percent integer encoding
    (see _rev_exact), so the only float math is the final ratio — computed
    as (100.0 * promo) / total in the SAME association on both engines.
    """
    li, part = tables(spark, sf_dir, "lineitem", "part")
    sel = li.where(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    j = sel.join(F.broadcast(part), sel.l_partkey == part.p_partkey)
    rev = _rev_exact()
    promo = F.sum(
        F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0).cast("long"))
    )
    total = F.sum(rev)
    return j.agg(
        (
            F.round(F.lit(100.0) * promo.cast("double") / total.cast("double"), 6)
            + 0.0
        ).alias("promo_pct")
    )


@register(
    "q_top_supplier",
    """
    WITH rev AS (
        SELECT l_suppkey,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS rv
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           round(rev.rv / 10000.0, 2) + 0.0 AS total_revenue
    FROM supplier s JOIN rev ON s.s_suppkey = rev.l_suppkey
    WHERE rev.rv = (SELECT max(rv) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def q_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: supplier(s) with the maximum revenue in a quarter.

    Plan shape: one partial+final agg over the date-pruned lineitem scan
    builds the per-supplier revenue (exact BIGINT cents*percent units, so
    the max comparison has no float-tie ambiguity), the global max is a
    single-row aggregate broadcast back as a cross join (never a global
    window sort — at 100 TB the supplier set is millions of rows and a
    partitionBy()-less window would funnel them through one task), and the
    supplier dim attaches via its own broadcast. rev feeds both the max and
    the final join, so it is cached (Spark does not reuse repeated subtrees).
    """
    li, supp = tables(spark, sf_dir, "lineitem", "supplier")
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev_exact()).alias("rv"))
        .cache()
    )
    mx = rev.agg(F.max("rv").alias("mx"))
    top = rev.join(F.broadcast(mx), rev.rv == F.col("mx")).drop("mx")
    return (
        supp.join(top, supp.s_suppkey == top.l_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.round(F.col("rv") / 10000.0, 2) + 0.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )
