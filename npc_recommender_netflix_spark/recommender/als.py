"""§2.8 MLlib ALS — the Spark-idiomatic replacement for the MR pipeline.

ALS(rank=8, seed=42, implicitPrefs=True) on the implicit ratings matrix.
Factor values are seeded but FP-reduction-order nondeterministic (SURVEY
§2.8), so both keys are declared rows-only; tests/test_recommender.py adds
the statistical check (ALS RMSE beats the item-mean baseline).

Scale: MLlib ALS is the canonical 100 TB path — block-partitioned normal
equations, no driver-side materialization; rank/regParam tune quality,
`coldStartStrategy="drop"` keeps transform() join-safe.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register
from .core import ratings_matrix


def fit_als(spark, sf_dir, rank: int = 8, max_iter: int = 5):
    from pyspark.ml.recommendation import ALS

    m = (
        ratings_matrix(spark, sf_dir)
        .select(
            F.col("user_id").cast("int").alias("user"),
            F.col("item_id").cast("int").alias("item"),
            F.col("rating").cast("float").alias("rating"),
        )
    )
    als = ALS(
        rank=rank,
        maxIter=max_iter,
        seed=42,
        implicitPrefs=True,
        userCol="user",
        itemCol="item",
        ratingCol="rating",
        coldStartStrategy="drop",
    )
    return als.fit(m), m


@register("r_als")  # rows-only: seeded but FP-order nondeterministic
def r_als(spark, sf_dir):
    model, m = fit_als(spark, sf_dir)
    pred = model.transform(m)
    return pred.select(
        F.col("user").cast("long").alias("user_id"),
        F.col("item").cast("long").alias("item_id"),
        F.round(F.col("rating").cast("double"), 2).alias("rating"),
        F.col("prediction").cast("double").alias("prediction"),
    )


@register("r_als_recs")  # rows-only
def r_als_recs(spark, sf_dir):
    model, _ = fit_als(spark, sf_dir)
    recs = model.recommendForAllUsers(3)
    ex = recs.select(
        F.col("user").cast("long").alias("user_id"),
        F.posexplode("recommendations").alias("rank0", "rec"),
    )
    return ex.select(
        "user_id",
        (F.col("rank0") + 1).cast("long").alias("rec_rank"),
        F.col("rec.item").cast("long").alias("item_id"),
        F.col("rec.rating").cast("double").alias("score"),
    )
