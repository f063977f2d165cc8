"""Hand-built edge cases: ties, nulls, empty groups, as-of boundaries —
plus the metamorphic layer (DataFrame API ≡ SQL API on the same session)."""

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F

from npc_recommender_netflix_spark import registry
from tests.conftest import SF_SMALL


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_emulation_tie_and_missing(spark):
    """view at exactly the purchase ts is matched (ts >= view_ts); a user
    with no prior view gets NULL."""
    rows = [
        (1, 100, "view", _ts("2024-01-01 10:00:00")),
        (2, 100, "purchase", _ts("2024-01-01 10:00:00")),  # tie -> matches
        (3, 100, "view", _ts("2024-01-01 11:00:00")),
        (4, 100, "purchase", _ts("2024-01-01 10:30:00")),  # before 2nd view
        (5, 200, "purchase", _ts("2024-01-01 09:00:00")),  # no view ever
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP"
    )
    views = df.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.lit(0).alias("kind"), F.col("ts").alias("view_ts"), "event_id"
    )
    purch = df.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("kind"),
        F.lit(None).cast("timestamp").alias("view_ts"), "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = {
        r["event_id"]: r["view_ts"]
        for r in views.unionByName(purch)
        .withColumn("view_ts", F.last("view_ts", ignorenulls=True).over(w))
        .where(F.col("kind") == 1)
        .collect()
    }
    assert out[2] == _ts("2024-01-01 10:00:00")  # tie matched
    assert out[4] == _ts("2024-01-01 10:00:00")  # most recent earlier view
    assert out[5] is None  # no view


def test_rank_ties_deterministic(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 10.0), (3, 5.0)], "id LONG, v DOUBLE"
    )
    w = Window.orderBy(F.col("v").desc())
    got = {
        r["id"]: (r["rnk"], r["drnk"])
        for r in df.select(
            "id", F.rank().over(w).alias("rnk"), F.dense_rank().over(w).alias("drnk")
        ).collect()
    }
    assert got[1] == (1, 1) and got[2] == (1, 1) and got[3] == (3, 2)


def test_left_join_empty_group_aggregates_null(spark):
    cust = spark.createDataFrame([(1,), (2,)], "c LONG")
    orders = spark.createDataFrame([(1, 5.0)], "c LONG, v DOUBLE")
    j = cust.join(orders, "c", "left").groupBy("c").agg(F.sum("v").alias("s"))
    got = {r["c"]: r["s"] for r in j.collect()}
    assert got[1] == 5.0 and got[2] is None


def test_intersect_all_bag_semantics(spark):
    a = spark.createDataFrame([(1,), (1,), (2,)], "x LONG")
    b = spark.createDataFrame([(1,), (1,), (1,)], "x LONG")
    assert a.intersectAll(b).count() == 2  # min(multiplicity)
    assert a.exceptAll(b).count() == 1  # the single 2


def test_metamorphic_dataframe_equals_sql(spark):
    """The same logical query through the DataFrame API and spark.sql must
    agree row-for-row (catches API-mapping bugs without an oracle)."""
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    li.createOrReplaceTempView("mm_lineitem")
    for flag, lo, hi in [("N", 0.0, 0.05), ("R", 0.02, 0.08), ("A", 0.0, 1.0)]:
        api = (
            li.where((F.col("l_returnflag") == flag) & F.col("l_discount").between(lo, hi))
            .groupBy("l_linestatus")
            .agg(F.count("*").alias("c"), (F.round(F.sum("l_quantity"), 2) + 0.0).alias("s"))
        )
        sql = spark.sql(
            f"""
            SELECT l_linestatus, count(*) AS c, round(sum(l_quantity), 2) + 0.0 AS s
            FROM mm_lineitem
            WHERE l_returnflag = '{flag}' AND l_discount BETWEEN {lo} AND {hi}
            GROUP BY l_linestatus
            """
        )
        assert sorted(map(tuple, api.collect())) == sorted(map(tuple, sql.collect()))


def test_ns_timestamp_recipe_exact_microseconds(spark, duck):
    """events loader must be byte-identical to DuckDB's native ns read."""
    from npc_recommender_netflix_spark.session import load_table

    s = {
        r["event_id"]: r["ts"]
        for r in load_table(spark, SF_SMALL, "events").select("event_id", "ts").collect()
    }
    for eid, ts in duck.execute("SELECT event_id, ts FROM events").fetchall():
        assert s[eid] == ts, eid


def test_bucketed_range_join_equals_theta(spark):
    """The scale-path interval join must be row-identical to the naive one."""
    a = sorted(map(tuple, registry.QUERIES["j_range_bucketed"](spark, SF_SMALL).collect()))
    b = sorted(map(tuple, registry.QUERIES["j_theta_range"](spark, SF_SMALL).collect()))
    assert a == b and len(a) > 0


def test_salted_join_equals_plain(spark):
    got = sorted(map(tuple, registry.QUERIES["j_skew_salted"](spark, SF_SMALL).collect()))
    li = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    plain = sorted(
        map(
            tuple,
            li.join(cust, li.o_custkey == cust.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("cnt"), (F.round(F.sum("o_totalprice"), 2) + 0.0).alias("total"))
            .collect(),
        )
    )
    assert got == plain


def test_metamorphic_randomized_seeded(spark):
    """Seeded random predicates: DataFrame API ≡ SQL on the same session."""
    import random

    rnd = random.Random(42)
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    li.createOrReplaceTempView("mm2_lineitem")
    for _ in range(8):
        lo = round(rnd.uniform(0, 0.05), 2)
        hi = round(lo + rnd.uniform(0.01, 0.05), 2)
        qty = rnd.randint(5, 45)
        flag = rnd.choice(["N", "R", "A"])
        api = (
            li.where(
                (F.col("l_discount").between(lo, hi))
                & (F.col("l_quantity") > qty)
                & (F.col("l_returnflag") == flag)
            )
            .groupBy("l_linestatus")
            .agg(F.count("*").alias("c"))
        )
        sql = spark.sql(
            f"""SELECT l_linestatus, count(*) AS c FROM mm2_lineitem
                WHERE l_discount BETWEEN {lo} AND {hi} AND l_quantity > {qty}
                  AND l_returnflag = '{flag}' GROUP BY l_linestatus"""
        )
        assert sorted(map(tuple, api.collect())) == sorted(map(tuple, sql.collect())), (lo, hi, qty, flag)
