"""§2.8 token custom-MapReduce op (RDD API) — fidelity to the reference's
execution model (the driver explicitly allows "custom MapReduce via RDD").

One map -> reduceByKey chain computing per-item rating stats; result parity
with the DataFrame/SQL version proves the two execution models agree. Kept
to ONE op on purpose: everything else is DataFrame so Catalyst/Tungsten can
optimize — hand-written RDD pipelines forgo codegen, pushdown, and AQE,
which is exactly why this engine is not a literal port of the reference.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from ..registry import register
from ..session import load_table


@register(
    "r_rdd_mapreduce",
    """
    SELECT l_partkey AS item_id, count(*) AS n,
           round(sum(l_quantity), 2) AS total_qty,
           round(avg(l_quantity), 6) AS mean_qty
    FROM lineitem GROUP BY l_partkey
    """,
)
def r_rdd_mapreduce(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    # map: (item, (qty, 1)); combine+reduce: elementwise sum — the classic
    # MR combiner pattern, explicit here, automatic in every groupBy above.
    stats = (
        li.rdd.map(lambda r: (r[0], (r[1], 1)))
        .reduceByKey(lambda a, b: (a[0] + b[0], a[1] + b[1]))
        .map(lambda kv: (kv[0], kv[1][1], float(kv[1][0]), kv[1][0] / kv[1][1]))
    )
    schema = StructType(
        [
            StructField("item_id", LongType()),
            StructField("n", LongType()),
            StructField("total_qty", DoubleType()),
            StructField("mean_qty", DoubleType()),
        ]
    )
    df = spark.createDataFrame(stats, schema)
    return df.select(
        "item_id",
        "n",
        (F.round("total_qty", 2) + 0.0).alias("total_qty"),
        (F.round("mean_qty", 6) + 0.0).alias("mean_qty"),
    )
