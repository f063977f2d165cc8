"""§2.2 Projections / filters / predicates.

All predicates here are Catalyst-pushable expressions (no UDFs), so at scale
they run inside the parquet scan / whole-stage codegen, not in Python.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register
from ..session import f6, load_table, money2


@register(
    "p_select_alias",
    "SELECT o_orderkey AS id, o_orderstatus AS status, o_orderpriority AS priority FROM orders",
)
def p_select_alias(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    )


@register(
    "p_computed_expr",
    """
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge
    FROM lineitem
    """,
)
def p_computed_expr(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    charge = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    return li.select("l_orderkey", "l_linenumber", f6(charge).alias("charge"))


@register(
    "p_case_when",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'high' END AS bucket
    FROM orders
    """,
)
def p_case_when(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
    )
    return orders.select("o_orderkey", bucket.alias("bucket"))


@register(
    "p_cast",
    """
    SELECT o_orderkey,
           CAST(trunc(o_totalprice) AS BIGINT) AS price_long,      -- Spark cast(double->long) truncates; DuckDB rounds
           round(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE), 2) + 0.0 AS price_dec,
           CAST(o_orderdate AS DATE) AS odate,
           CAST(o_custkey AS INT) AS custkey_int
    FROM orders
    """,
)
def p_cast(spark, sf_dir):
    # The DECIMAL(12,2) cast is still exercised, but the emitted column is a
    # rounded double: DECIMAL output shapes canonicalize differently between
    # Spark and the driver's pandas hasher (r1 hash_match=false), while every
    # other money column in the suite hashes fine as round(double, 2) + 0.0.
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.col("o_totalprice").cast("long").alias("price_long"),
        (F.round(F.col("o_totalprice").cast("decimal(12,2)").cast("double"), 2) + 0.0).alias(
            "price_dec"
        ),
        F.col("o_orderdate").cast("date").alias("odate"),
        F.col("o_custkey").cast("int").alias("custkey_int"),
    )


@register(
    "f_where_and_or",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_discount
    FROM lineitem
    WHERE (l_returnflag = 'R' AND l_discount > 0.05) OR NOT (l_linestatus = 'F')
    """,
)
def f_where_and_or(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    pred = ((F.col("l_returnflag") == "R") & (F.col("l_discount") > 0.05)) | ~(
        F.col("l_linestatus") == "F"
    )
    return li.where(pred).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_discount"
    )


@register(
    "f_in_list",
    """
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
    """,
)
def f_in_list(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    return cust.where(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY")).select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "f_between",
    """
    SELECT o_orderkey, o_orderdate FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 23:59:59'
    """,
)
def f_between(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-12-31 23:59:59").cast("timestamp")
    return orders.where(F.col("o_orderdate").between(lo, hi)).select("o_orderkey", "o_orderdate")


@register(
    "f_like",
    """
    SELECT p_partkey, p_name, p_brand FROM part
    WHERE p_name LIKE '%gear%' OR starts_with(p_brand, 'Brand#1') OR ends_with(p_name, 'bolt')
    """,
)
def f_like(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    pred = (
        F.col("p_name").like("%gear%")
        | F.col("p_brand").startswith("Brand#1")
        | F.col("p_name").endswith("bolt")
    )
    return part.where(pred).select("p_partkey", "p_name", "p_brand")


@register(
    "f_null_checks",
    """
    SELECT c.c_custkey,
           o.o_orderkey IS NULL AS no_big_order,
           coalesce(round(o.o_totalprice, 2), -1.0) AS big_price,
           nullif(c.c_mktsegment, 'BUILDING') AS seg_or_null
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
      ON c.c_custkey = o.o_custkey
    """,
)
def f_null_checks(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    j = cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
    return j.select(
        "c_custkey",
        F.col("o_orderkey").isNull().alias("no_big_order"),
        F.coalesce(money2(F.col("o_totalprice")), F.lit(-1.0)).alias("big_price"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_or_null"),
    )
