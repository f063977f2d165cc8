"""§2.6 Sorts / limits / top-k / set operations.

`o_topk` compiles to TakeOrderedAndProject (per-partition top-k + merge on
the driver) — no global sort even at 100 TB. Set ops are shuffles on the
full row; at scale prefer the *_distinct variants only when needed (they add
a hash-aggregate).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table, money2


@register(
    "o_topk",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS total
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def o_topk(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", money2(F.col("o_totalprice")).alias("total"))
    )


@register(
    "o_sort_nulls",
    """
    SELECT c.c_custkey, round(m.max_total, 2) AS max_total
    FROM customer c
    LEFT JOIN (SELECT o_custkey, max(o_totalprice) AS max_total FROM orders
               WHERE o_orderkey < 10 GROUP BY o_custkey) m
      ON c.c_custkey = m.o_custkey
    ORDER BY max_total DESC NULLS LAST, c.c_custkey LIMIT 20
    """,
)
def o_sort_nulls(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    m = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 10)
        .groupBy("o_custkey")
        .agg(F.max("o_totalprice").alias("max_total"))
    )
    j = cust.join(m, cust.c_custkey == m.o_custkey, "left")
    return (
        j.orderBy(F.col("max_total").desc_nulls_last(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", money2(F.col("max_total")).alias("max_total"))
    )


@register(
    "set_union_all",
    """
    SELECT c_nationkey AS nk, 'customer' AS side FROM customer
    UNION ALL
    SELECT s_nationkey AS nk, 'supplier' AS side FROM supplier
    """,
)
def set_union_all(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk"), F.lit("customer").alias("side")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk"), F.lit("supplier").alias("side")
    )
    return cust.unionByName(supp)


@register(
    "set_union_distinct",
    """
    SELECT c_nationkey AS nk FROM customer
    UNION
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def set_union_distinct(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return cust.union(supp).distinct()


@register(
    "set_intersect",
    """
    SELECT c_nationkey AS nk FROM customer
    INTERSECT
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def set_intersect(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return cust.intersect(supp)


@register(
    "set_except",
    """
    SELECT n_nationkey AS nk FROM nation
    EXCEPT
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def set_except(spark, sf_dir):
    nat = load_table(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nk"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return nat.subtract(supp)


@register(
    "set_intersect_all",
    """
    SELECT c_nationkey AS nk FROM customer WHERE c_custkey < 200
    INTERSECT ALL
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def set_intersect_all(spark, sf_dir):
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < 200)
        .select(F.col("c_nationkey").alias("nk"))
    )
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return cust.intersectAll(supp)


@register(
    "set_except_all",
    """
    SELECT c_nationkey AS nk FROM customer WHERE c_custkey < 200
    EXCEPT ALL
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def set_except_all(spark, sf_dir):
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < 200)
        .select(F.col("c_nationkey").alias("nk"))
    )
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return cust.exceptAll(supp)
