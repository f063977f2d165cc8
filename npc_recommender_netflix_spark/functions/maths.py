"""§2.7 scalar functions — math family.

Divergences handled: Spark ceil/floor return BIGINT while DuckDB returns
DOUBLE (oracle casts); mod only on non-negative ints (sign semantics differ
on negatives); sign cast to BIGINT both sides.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register
from ..session import f6, load_table


@register(
    "fn_math",
    """
    SELECT l_orderkey, l_linenumber,
           round(abs(l_quantity - 25), 6) AS ab,
           CAST(sign(l_quantity - 25) AS BIGINT) AS sg,
           round(l_extendedprice / 7, 6) AS dv,
           CAST(ceil(l_quantity / 3) AS BIGINT) AS ce,
           CAST(floor(l_quantity / 3) AS BIGINT) AS fl,
           round(sqrt(l_extendedprice), 6) AS sq,
           round(power(1 + l_discount, 3), 6) AS pw,
           round(exp(l_discount), 6) AS ex,
           round(ln(l_extendedprice), 6) AS lg,
           round(log10(l_extendedprice), 6) AS l10,
           l_partkey % 7 AS md,
           round(greatest(l_quantity, l_discount * 100), 6) AS gr,
           round(least(l_quantity, l_tax * 100), 6) AS ls
    FROM lineitem
    """,
)
def fn_math(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    ep = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        f6(F.abs(q - 25)).alias("ab"),
        F.signum(q - 25).cast("long").alias("sg"),
        f6(ep / 7).alias("dv"),
        F.ceil(q / 3).cast("long").alias("ce"),
        F.floor(q / 3).cast("long").alias("fl"),
        f6(F.sqrt(ep)).alias("sq"),
        f6(F.pow(F.lit(1) + F.col("l_discount"), 3)).alias("pw"),
        f6(F.exp("l_discount")).alias("ex"),
        f6(F.log(ep)).alias("lg"),
        f6(F.log10(ep)).alias("l10"),
        (F.col("l_partkey") % 7).alias("md"),
        f6(F.greatest(q, F.col("l_discount") * 100)).alias("gr"),
        f6(F.least(q, F.col("l_tax") * 100)).alias("ls"),
    )
