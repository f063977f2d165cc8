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

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table
from .core import ratings_matrix


def fit_als(spark, sf_dir, rank: int = 8, max_iter: int = 5):
    from pyspark.ml.recommendation import ALS

    # r17 (guide §2.4): every caller reuses m after the fit (transform,
    # fold-in target slice, rated anti-join) — cache it so the
    # orders⋈lineitem⋈groupBy matrix builds once per query instead of
    # once per consumer. Bounded: one row per (user, item) pair.
    m = (
        ratings_matrix(spark, sf_dir)
        .select(
            F.col("user_id").cast("int").alias("user"),
            F.col("item_id").cast("int").alias("item"),
            F.col("rating").cast("float").alias("rating"),
        )
        .cache()
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


@register("r_kmeans")  # rows-only: seeded but reduction-order dependent
def r_kmeans(spark, sf_dir):
    """MLlib KMeans over the embedding vectors (k=10, seed=42) — the coarse
    quantizer that replaces per-label cells in v_ann_ivf at scale. Cluster
    sizes returned; tests assert k clusters partition all 500 vectors."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    km = KMeans(k=10, seed=42, maxIter=10, featuresCol="features")
    model = km.fit(emb)
    pred = model.transform(emb)
    return (
        pred.groupBy(F.col("prediction").cast("long").alias("cluster"))
        .agg(F.count("*").alias("n"))
    )


@register("r_pca")  # rows-only: component signs/order are seed+order dependent
def r_pca(spark, sf_dir):
    """MLlib PCA 64 -> 8 dims over embeddings (dimensionality reduction for
    the vector pipeline); per-row projection norm returned (sign-invariant
    scalar — the raw component array is sign-ambiguous AND the driver
    harness can't hash ARRAY columns), variance checked in tests."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    model = PCA(k=8, inputCol="features", outputCol="pca").fit(emb)
    proj = model.transform(emb).select(
        "vec_id", vector_to_array(F.col("pca")).alias("pca8")
    )
    return proj.select(
        "vec_id",
        (F.round(
            F.sqrt(F.aggregate(F.col("pca8"), F.lit(0.0), lambda a, x: a + x * x)), 6
        ) + 0.0).alias("pca_norm"),
    )


@register("r_als_cv")  # rows-only: seeded fits, FP-order nondeterministic
def r_als_cv(spark, sf_dir):
    """Deterministic grid-search model selection over ALS — the
    CrossValidator/ParamGridBuilder workflow, hand-rolled so the split is
    hash-deterministic rather than RNG-split (the t_kfold_split
    discipline applied to model selection): train on l_orderkey%5!=0
    ratings, validate on the held-out fifth, score every (rank,
    regParam) cell in a 2x2 grid by validation RMSE.

    Emits the full leaderboard (one row per grid cell with is_best
    marking the winner) rather than just the champion — the artifact a
    training pipeline logs for tuning audits. Declared rows-only (ALS
    factors are seeded but reduction-order nondeterministic; RMSE noise
    is below ranking stability at this grid spacing — pytest pins the
    leaderboard SHAPE and that best validation RMSE beats the worst by
    a margin, not exact values).

    Scale: grid cells are INDEPENDENT fits of the same block-partitioned
    ALS — on a cluster they run as parallel jobs from one cached
    train/valid pair (here sequential on local[32]); the data is scanned
    once, the grid multiplies only compute.
    """
    from pyspark.ml.recommendation import ALS

    orders, li = (
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )
    base = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("o_custkey").cast("int").alias("user"),
            F.col("l_partkey").cast("int").alias("item"),
        )
        .agg(
            F.sum("l_quantity").cast("float").alias("rating"),
            F.min(F.col("l_orderkey") % 5).alias("fold"),
        )
        .cache()
    )
    train = base.where(F.col("fold") != 0).drop("fold")
    valid = base.where(F.col("fold") == 0).drop("fold")
    rows = []
    for rank in (4, 8):
        for reg in (0.05, 0.1):
            als = ALS(
                rank=rank,
                maxIter=5,
                regParam=reg,
                seed=42,
                implicitPrefs=True,
                userCol="user",
                itemCol="item",
                ratingCol="rating",
                coldStartStrategy="drop",
            )
            model = als.fit(train)
            pred = model.transform(valid)
            rmse = pred.agg(
                F.sqrt(
                    F.avg(
                        (F.col("prediction") - F.col("rating"))
                        * (F.col("prediction") - F.col("rating"))
                    )
                ).alias("rmse")
            ).collect()[0]["rmse"]
            rows.append((rank, float(reg), float(rmse)))
    best = min(rows, key=lambda r: r[2])
    out = spark.createDataFrame(
        [
            (r[0], r[1], round(r[2], 6), 1 if r == best else 0)
            for r in rows
        ],
        "rank long, reg_param double, valid_rmse double, is_best long",
    )
    return out.orderBy("rank", "reg_param")


@register("r_als_foldin")  # rows-only: derived from seeded MLlib factors
def r_als_foldin(spark, sf_dir):
    """ALS cold-start FOLD-IN — the serving-path solve every production
    ALS deployment needs and model.transform cannot do: a user who
    arrived AFTER training gets factors by solving the same implicit-
    feedback normal equations ALS itself alternates on (Hu-Koren-
    Volinsky: u = (YᵀY + Yᵀ(Cᵘ−I)Y + λI)⁻¹ Yᵀ Cᵘ p(u), confidence
    c = 1 + α·r), holding the trained item factors Y fixed — no
    retrain, no driver-side model surgery.

    Distribution of labor: YᵀY is rank×rank (8×8) and computes ONCE
    driver-side from the bounded factor table; the per-user system
    assembles from ONLY that user's rated items inside applyInPandas
    (each group ships its ratings joined with broadcast item factors;
    the 8×8 solve is numpy) — the exact shape MLlib's own user update
    uses, re-run for one user at serving time. Output: top-3 unrated
    items by folded-in score for the 1/199 user sample. Rows-only (it
    inherits r_als's seeded-but-FP-order-nondeterministic factors);
    tests/test_round7.py pins the fold-in identity: for users the
    model already knows, folded-in factors align with the trained
    user factors.
    """
    import numpy as np
    import pandas as pd

    model, m = fit_als(spark, sf_dir)
    rank, alpha, lam = 8, 1.0, 0.1
    Y_rows = model.itemFactors.collect()  # bounded: |items| x rank
    item_ids = np.array([r["id"] for r in Y_rows])
    Y = np.array([r["features"] for r in Y_rows], dtype=np.float64)
    YtY = Y.T @ Y
    fac = spark.createDataFrame(
        [(int(i), [float(x) for x in y]) for i, y in zip(item_ids, Y)],
        "item int, y array<double>",
    )
    tgt = m.where(F.col("user") % 199 == 0).join(F.broadcast(fac), "item")

    yty_b = spark.sparkContext.broadcast(YtY)

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        # r17 (guide §4.3 — vectorize inside the pandas UDF): one BLAS
        # Gram assembly replaces the per-row iterrows() outer-product
        # loop. Same normal equations; FP summation order changes, which
        # this rows-only key (seeded-but-nondeterministic MLlib factors
        # upstream) explicitly tolerates — the fold-in identity test
        # checks alignment, not bits.
        Ys = np.vstack(pdf["y"].to_numpy())  # (n_items, rank)
        c = 1.0 + alpha * pdf["rating"].to_numpy(dtype=np.float64)
        A = yty_b.value + lam * np.eye(rank) + Ys.T @ ((c - 1.0)[:, None] * Ys)
        b = Ys.T @ c
        u = np.linalg.solve(A, b)
        return pd.DataFrame(
            {"user": [int(pdf["user"].iloc[0])],
             "u": [[float(x) for x in u]]}
        )

    users = tgt.groupBy("user").applyInPandas(
        solve, schema="user int, u array<double>"
    )
    scored = (
        users.crossJoin(F.broadcast(fac))
        .select(
            F.col("user").cast("long").alias("user_id"),
            F.col("item").cast("long").alias("item_id"),
            F.expr(
                "aggregate(zip_with(u, y, (a, b) -> a * b),"
                " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
            ).alias("score"),
        )
        .join(
            m.select(
                F.col("user").cast("long").alias("user_id"),
                F.col("item").cast("long").alias("item_id"),
            ),
            ["user_id", "item_id"],
            "left_anti",
        )
    )
    w = Window.partitionBy("user_id").orderBy(F.col("score").desc(), "item_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("user_id", "item_id", F.round("score", 6).alias("score"), "rn")
    )


@register("r_mllib_logreg")  # rows-only: LBFGS optimizer path is MLlib-internal
def r_mllib_logreg(spark, sf_dir):
    """MLlib LogisticRegression on the a_logistic_irls design matrix —
    the library-fit counterpart to the hand-rolled IRLS key (round-8
    verdict item 5): P(urgent-or-high priority) ~ relative price decile
    + order year index, regParam=0 to match the unregularized IRLS,
    standardization off so coefficients live in the same feature units.

    Input uses the SAME grouped-data reduction as a_logistic_irls
    (operators/aggregates.py): rows collapse to <=70 (price decile x
    year) cells via one map-side-combinable groupBy, then each cell
    expands to at most two WEIGHTED instances (label 1 weight sy,
    label 0 weight n-sy) — the grouped binomial likelihood is identical
    to the per-row one, so MLlib's LBFGS optimizes the exact objective
    the IRLS key's Newton steps descend. That keeps the 100 TB cost
    profile: one aggregation shuffle, then a bounded ~140-row fit.

    Declared rows-only: LBFGS iteration count/line search are
    MLlib-internal and not SQL-expressible. tests/test_recommender.py
    pins parity — coefficients and avg log loss match a_logistic_irls
    (4 Newton steps, quadratically converged) to ~1e-3.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    orders = load_table(spark, sf_dir, "orders")
    mx = orders.agg(
        F.max(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("maxc")
    )
    cells = (
        orders.crossJoin(F.broadcast(mx))
        .select(
            F.floor(
                F.round(F.col("o_totalprice") * 100).cast("long")
                * 10
                / (F.col("maxc") + 1)
            )
            .cast("long")
            .alias("x1"),
            (F.year("o_orderdate") - 1992).cast("long").alias("x2"),
            F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
            .otherwise(0)
            .alias("y"),
        )
        .groupBy("x1", "x2")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("y").cast("long").alias("sy"),
        )
    )
    pos = cells.where(F.col("sy") > 0).select(
        "x1", "x2", F.lit(1.0).alias("label"), F.col("sy").cast("double").alias("wt")
    )
    neg = cells.where(F.col("n") > F.col("sy")).select(
        "x1",
        "x2",
        F.lit(0.0).alias("label"),
        (F.col("n") - F.col("sy")).cast("double").alias("wt"),
    )
    inst = pos.unionByName(neg).select(
        "label",
        "wt",
        F.col("x1").cast("double").alias("x1"),
        F.col("x2").cast("double").alias("x2"),
        array_to_vector(
            F.array(F.col("x1").cast("double"), F.col("x2").cast("double"))
        ).alias("features"),
    ).cache()  # <=140 rows, but three consumers (multi-pass LBFGS fit,
    # log-loss pass, n_obs) would each re-run the orders scan + groupBy
    lr = LogisticRegression(
        maxIter=200,
        regParam=0.0,
        elasticNetParam=0.0,
        tol=1e-12,
        standardization=False,
        weightCol="wt",
        family="binomial",
    )
    model = lr.fit(inst)
    b0 = float(model.intercept)
    b1, b2 = (float(c) for c in model.coefficients)
    eta = F.lit(b0) + F.lit(b1) * F.col("x1") + F.lit(b2) * F.col("x2")
    p = 1.0 / (1.0 + F.exp(-eta))
    ll = (
        inst.select(
            (
                F.col("wt")
                * -F.log(F.when(F.col("label") > 0.5, p).otherwise(1.0 - p))
            ).alias("wl"),
            "wt",
        )
        .agg((F.sum("wl") / F.sum("wt")).alias("avg_ll"), F.sum("wt").alias("n"))
        .collect()[0]
    )
    return spark.createDataFrame(
        [
            (
                int(ll["n"]),
                round(b0, 6),
                round(b1, 6),
                round(b2, 6),
                round(float(ll["avg_ll"]), 6),
            )
        ],
        "n_obs bigint, b_intercept double, b_price_bucket double,"
        " b_year_idx double, avg_log_loss double",
    )
