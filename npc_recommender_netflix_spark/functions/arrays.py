"""§2.7 scalar functions — array families + explode/posexplode.

Arrays over the 64-dim float `embeddings.embedding` column are cast to
DOUBLE inside lambdas before rounding (float32 widening is exact). Both
engines fold list aggregates left-to-right, so the 64-term sums are
bit-identical before the 6dp round.

Scale: explode of a 64-dim vector multiplies rows x64 — at 100 TB prefer
the lambda forms (aggregate/transform, no row explosion) which these
queries also cover.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table


@register(
    "fn_array_basic",
    """
    SELECT n_nationkey,
           array_to_string([n_nationkey, n_regionkey, n_nationkey * 2], ',') AS arr,
           CAST(len([n_nationkey, n_regionkey, n_nationkey * 2]) AS BIGINT) AS sz,
           list_contains([n_nationkey, n_regionkey, n_nationkey * 2], 5) AS has5,
           [n_nationkey, n_regionkey, n_nationkey * 2][2] AS el2,
           array_to_string([n_nationkey, n_regionkey, n_nationkey * 2][1:2], ',') AS sl,
           array_to_string(list_sort(list_distinct([n_nationkey, n_regionkey, n_nationkey * 2])), ',') AS dst,
           array_to_string(flatten([[n_nationkey], [n_regionkey]]), ',') AS fl,
           CAST(list_position([n_nationkey, n_regionkey, n_nationkey * 2], n_regionkey) AS BIGINT) AS posr
    FROM nation
    """,
)
def fn_array_basic(spark, sf_dir):
    # Array constructors/slice/distinct/flatten are the operators under test;
    # array-typed outputs are ','-joined (int formatting is engine-identical)
    # because the driver hasher can't canonicalize raw ARRAY columns.
    nation = load_table(spark, sf_dir, "nation")
    arr = F.array("n_nationkey", "n_regionkey", F.col("n_nationkey") * 2)

    def joined(c):
        return F.array_join(F.transform(c, lambda x: x.cast("string")), ",")

    return nation.select(
        "n_nationkey",
        joined(arr).alias("arr"),
        F.size(arr).cast("long").alias("sz"),
        F.array_contains(arr, F.lit(5)).alias("has5"),
        F.element_at(arr, 2).alias("el2"),
        joined(F.slice(arr, 1, 2)).alias("sl"),
        joined(F.sort_array(F.array_distinct(arr))).alias("dst"),
        joined(F.flatten(F.array(F.array("n_nationkey"), F.array("n_regionkey")))).alias("fl"),
        F.array_position(arr, F.col("n_regionkey")).cast("long").alias("posr"),
    )


@register(
    "fn_array_lambda",
    """
    SELECT vec_id,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) + 0 AS total,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           len(list_filter(embedding, x -> x > 0.35)) > 0 AS has_big,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * 2)), 6) + 0 AS doubled_sum,
           round(CAST(list_transform(embedding, x -> CAST(x AS DOUBLE) * 2)[1] AS DOUBLE), 6) + 0 AS doubled_first
    FROM embeddings
    """,
)
def fn_array_lambda(spark, sf_dir):
    # transform/filter/exists/aggregate lambdas are the operators under test;
    # the transformed array is reduced to scalars (sum + first element)
    # because the driver hasher can't take ARRAY columns and double->string
    # formatting is not engine-stable.
    emb = load_table(spark, sf_dir, "embeddings")
    doubled = F.expr("transform(embedding, x -> CAST(x AS DOUBLE) * 2)")
    return emb.select(
        "vec_id",
        (F.round(
            F.expr("aggregate(embedding, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE))"),
            6,
        ) + 0.0).alias("total"),
        F.expr("size(filter(embedding, x -> x > 0))").cast("long").alias("n_pos"),
        F.expr("exists(embedding, x -> x > 0.35)").alias("has_big"),
        (F.round(F.aggregate(doubled, F.lit(0.0), lambda a, x: a + x), 6) + 0.0).alias(
            "doubled_sum"
        ),
        (F.round(F.element_at(doubled, 1), 6) + 0.0).alias("doubled_first"),
    )


@register(
    "fn_explode",
    """
    SELECT vec_id, round(CAST(unnest(embedding) AS DOUBLE), 6) + 0 AS val
    FROM embeddings
    """,
)
def fn_explode(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", F.explode("embedding").alias("v")).select(
        "vec_id", (F.round(F.col("v").cast("double"), 6) + 0.0).alias("val")
    )


@register(
    "fn_posexplode",
    """
    SELECT e.vec_id, t.i - 1 AS pos, round(CAST(e.embedding[t.i] AS DOUBLE), 6) + 0 AS val
    FROM embeddings e CROSS JOIN (SELECT unnest(range(1, 65)) AS i) t
    """,
)
def fn_posexplode(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", F.posexplode("embedding").alias("pos", "v")).select(
        "vec_id",
        F.col("pos").cast("long").alias("pos"),
        (F.round(F.col("v").cast("double"), 6) + 0.0).alias("val"),
    )


@register(
    "fn_inline_stack",
    """
    SELECT o_orderkey, 'price' AS measure,
           round(o_totalprice, 2) + 0 AS val
    FROM orders WHERE o_orderkey <= 200
    UNION ALL
    SELECT o_orderkey, 'price_with_tax',
           round(o_totalprice * 1.08, 2) + 0
    FROM orders WHERE o_orderkey <= 200
    UNION ALL
    SELECT o_orderkey, 'price_discounted',
           round(o_totalprice * 0.9, 2) + 0
    FROM orders WHERE o_orderkey <= 200
    ORDER BY o_orderkey, measure
    """,
)
def fn_inline_stack(spark, sf_dir):
    """Generator surface beyond explode: `stack(n, k1, v1, ...)` turns
    N (label, value) pairs per row into N rows — the inline unpivot
    for computed measures (a_unpivot melts existing COLUMNS; stack
    fabricates the long form from expressions in one generator, no
    intermediate wide frame). The third generator family member after
    explode and posexplode, same Generate operator underneath.

    One codegen Generate per input row (3× fan-out, map-side); the
    oracle is the UNION ALL the generator replaces — same rows, but
    the stack plan scans ONCE where the union scans three times,
    which at 100 TB is the entire point.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.where(F.col("o_orderkey") <= 200)
        .select(
            "o_orderkey",
            F.expr(
                "stack(3,"
                " 'price', round(o_totalprice, 2) + 0.0d,"
                " 'price_with_tax', round(o_totalprice * 1.08, 2) + 0.0d,"
                " 'price_discounted', round(o_totalprice * 0.9, 2) + 0.0d"
                ") AS (measure, val)"
            ),
        )
        .orderBy("o_orderkey", "measure")
    )
