"""§2.3 Joins.

Scale notes per operator:
- Broadcast the small side whenever it fits (`j_broadcast` pins the plan);
  at 100 TB the dims (region/nation/part/supplier) stay broadcastable while
  facts (orders/lineitem/events) shuffle on join keys.
- Large x large equi-joins (`j_sortmerge`, `j_multiway`) rely on AQE for
  runtime coalescing and skew-join splitting; co-locating repeated joins on
  the same key would use bucketing in a persisted layout.
- The interval/as-of joins (`j_theta_range`, `j_asof`) avoid a full
  cartesian by keying on user_id first — the non-equi condition only runs
  within a user's partition. At 100 TB you'd additionally bucket time into
  coarse buckets to bound the per-key fan-out.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import register
from ..session import f6, load_table, money2, tables


@register(
    "j_inner_equi",
    """
    SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment, round(o.o_totalprice, 2) AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def j_inner_equi(spark, sf_dir):
    orders, cust = tables(spark, sf_dir, "orders", "customer")
    return orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_custkey", "c_mktsegment", money2(F.col("o_totalprice")).alias("total")
    )


@register(
    "j_broadcast",
    """
    SELECT p.p_brand, count(*) AS cnt, round(sum(l.l_extendedprice), 2) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def j_broadcast(spark, sf_dir):
    li, part = tables(spark, sf_dir, "lineitem", "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return j.groupBy("p_brand").agg(
        F.count("*").alias("cnt"), money2(F.sum("l_extendedprice")).alias("revenue")
    )


@register(
    "j_sortmerge",
    """
    SELECT o.o_orderstatus, count(*) AS cnt,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def j_sortmerge(spark, sf_dir):
    li, orders = tables(spark, sf_dir, "lineitem", "orders")
    j = li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.groupBy("o_orderstatus").agg(
        F.count("*").alias("cnt"), money2(F.sum(rev)).alias("revenue")
    )


@register(
    "j_left_outer",
    """
    SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice, 2) AS total
    FROM customer c LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'P') o
      ON c.c_custkey = o.o_custkey
    """,
)
def j_left_outer(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    j = cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
    return j.select("c_custkey", "o_orderkey", money2(F.col("o_totalprice")).alias("total"))


@register(
    "j_right_outer",
    """
    SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice, 2) AS total
    FROM (SELECT * FROM orders WHERE o_orderstatus = 'P') o
    RIGHT JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def j_right_outer(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    j = orders.join(cust, cust.c_custkey == orders.o_custkey, "right")
    return j.select("c_custkey", "o_orderkey", money2(F.col("o_totalprice")).alias("total"))


@register(
    "j_full_outer",
    """
    SELECT n.n_nationkey, n.n_name, cc.nk, cc.cust_cnt
    FROM (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 15) n
    FULL OUTER JOIN (
        SELECT c_nationkey AS nk, count(*) AS cust_cnt FROM customer
        WHERE c_nationkey >= 10 GROUP BY c_nationkey
    ) cc ON n.n_nationkey = cc.nk
    """,
)
def j_full_outer(spark, sf_dir):
    nation, cust = tables(spark, sf_dir, "nation", "customer")
    left = nation.where(F.col("n_nationkey") < 15).select("n_nationkey", "n_name")
    right = (
        cust.where(F.col("c_nationkey") >= 10)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("cust_cnt"))
    )
    return left.join(right, left.n_nationkey == right.nk, "full").select(
        "n_nationkey", "n_name", "nk", "cust_cnt"
    )


@register(
    "j_left_semi",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def j_left_semi(spark, sf_dir):
    cust, orders = tables(spark, sf_dir, "customer", "orders")
    big = orders.where(F.col("o_totalprice") > 300000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "j_left_anti",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def j_left_anti(spark, sf_dir):
    cust, orders = tables(spark, sf_dir, "customer", "orders")
    big = orders.where(F.col("o_totalprice") > 300000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "j_cross",
    "SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n",
)
def j_cross(spark, sf_dir):
    region, nation = tables(spark, sf_dir, "region", "nation")
    return region.crossJoin(nation).select("r_name", "n_name")


@register(
    "j_theta_range",
    """
    SELECT e1.event_id AS eid1, e2.event_id AS eid2, e1.user_id
    FROM events e1 JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.ts > e1.ts
     AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
    """,
)
def j_theta_range(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    e1 = ev.alias("e1")
    e2 = ev.alias("e2")
    cond = (
        (F.col("e1.user_id") == F.col("e2.user_id"))
        & (F.col("e2.ts") > F.col("e1.ts"))
        & (F.col("e2.ts") <= F.col("e1.ts") + F.expr("INTERVAL 5 MINUTE"))
    )
    return e1.join(e2, cond).select(
        F.col("e1.event_id").alias("eid1"),
        F.col("e2.event_id").alias("eid2"),
        F.col("e1.user_id").alias("user_id"),
    )


@register(
    "j_asof",
    """
    SELECT p.event_id, p.ts, v.ts AS view_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def j_asof(spark, sf_dir):
    # No native as-of join in Spark SQL: emulate with a union + running
    # last_value(view_ts) per user. At scale this is a single shuffle on
    # user_id + one sort — same cost class as a native as-of.
    ev = load_table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts"), F.lit(0).alias("kind"), F.col("ts").alias("view_ts"),
        F.col("event_id"),
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts"), F.lit(1).alias("kind"),
        F.lit(None).cast("timestamp").alias("view_ts"), F.col("event_id"),
    )
    u = views.unionByName(purch)
    # views sort before purchases at equal ts (kind 0 < 1) so ties are included.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lastv = F.last("view_ts", ignorenulls=True).over(w)
    return (
        u.withColumn("view_ts", lastv)
        .where(F.col("kind") == 1)
        .select("event_id", "ts", "view_ts")
    )


@register(
    "j_multiway",
    """
    SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS cnt
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name IN ('ASIA', 'AMERICA', 'EUROPE', 'AFRICA', 'MIDDLE EAST')
    GROUP BY n.n_name
    """,
)
def j_multiway(spark, sf_dir):
    region, nation, cust, orders, li = tables(
        spark, sf_dir, "region", "nation", "customer", "orders", "lineitem"
    )
    j = (
        region.where(
            F.col("r_name").isin("ASIA", "AMERICA", "EUROPE", "AFRICA", "MIDDLE EAST")
        )
        .join(F.broadcast(nation), nation.n_regionkey == region.r_regionkey)
        .join(cust, cust.c_nationkey == nation.n_nationkey)
        .join(orders, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.groupBy("n_name").agg(
        money2(F.sum(rev)).alias("revenue"), F.count("*").alias("cnt")
    )


@register(
    "j_self_pairs",
    """
    SELECT n1.n_regionkey, n1.n_name AS name_a, n2.n_name AS name_b
    FROM nation n1 JOIN nation n2
      ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
    """,
)
def j_self_pairs(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.alias("n1")
    n2 = nation.alias("n2")
    cond = (F.col("n1.n_regionkey") == F.col("n2.n_regionkey")) & (
        F.col("n1.n_nationkey") < F.col("n2.n_nationkey")
    )
    return n1.join(n2, cond).select(
        F.col("n1.n_regionkey").alias("n_regionkey"),
        F.col("n1.n_name").alias("name_a"),
        F.col("n2.n_name").alias("name_b"),
    )


@register(
    "j_asof_nearest",
    """
    WITH u AS (
        SELECT user_id, ts, 0 AS kind, ts AS view_ts, event_id
        FROM events WHERE event_type = 'view'
        UNION ALL
        SELECT user_id, ts, 1 AS kind, NULL AS view_ts, event_id
        FROM events WHERE event_type = 'purchase'
    ),
    m AS (
        SELECT *,
               last_value(view_ts IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, kind, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS back_ts,
               first_value(view_ts IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, kind, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fwd_ts
        FROM u
    )
    SELECT event_id, ts,
           CASE WHEN back_ts IS NULL THEN fwd_ts
                WHEN fwd_ts IS NULL THEN back_ts
                WHEN epoch_us(ts) - epoch_us(back_ts)
                     <= epoch_us(fwd_ts) - epoch_us(ts) THEN back_ts
                ELSE fwd_ts END AS near_ts,
           CAST(CASE WHEN back_ts IS NULL THEN epoch_us(fwd_ts) - epoch_us(ts)
                     WHEN fwd_ts IS NULL THEN epoch_us(ts) - epoch_us(back_ts)
                     WHEN epoch_us(ts) - epoch_us(back_ts)
                          <= epoch_us(fwd_ts) - epoch_us(ts)
                     THEN epoch_us(ts) - epoch_us(back_ts)
                     ELSE epoch_us(fwd_ts) - epoch_us(ts) END AS BIGINT) AS gap_us,
           CASE WHEN back_ts IS NULL THEN 'f'
                WHEN fwd_ts IS NULL THEN 'b'
                WHEN epoch_us(ts) - epoch_us(back_ts)
                     <= epoch_us(fwd_ts) - epoch_us(ts) THEN 'b'
                ELSE 'f' END AS side
    FROM m WHERE kind = 1
    """,
)
def j_asof_nearest(spark, sf_dir):
    """NEAREST-direction as-of join: each purchase pairs with its closest
    view in EITHER direction (backward tie-wins) — the kdb/QuestDB 'asof
    nearest' variant j_asof's backward-only semantics can't express.

    Same single-shuffle emulation as j_asof (union + one user_id sort),
    with BOTH directions read off the same sorted frame: running
    last_value behind, running first_value ahead — two frames over one
    Window partitioning, still one exchange. Gap compares run in integer
    microseconds; equal-distance ties choose backward deterministically.
    """
    ev = load_table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.lit(0).alias("kind"),
        F.col("ts").alias("view_ts"), "event_id",
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("kind"),
        F.lit(None).cast("timestamp").alias("view_ts"), "event_id",
    )
    u = views.unionByName(purch)
    ordered = Window.partitionBy("user_id").orderBy("ts", "kind", "event_id")
    back = F.last("view_ts", ignorenulls=True).over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = F.first("view_ts", ignorenulls=True).over(
        ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    m = u.select("event_id", "ts", "kind", back.alias("back_ts"), fwd.alias("fwd_ts"))
    gb = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("back_ts"))
    gf = F.unix_micros(F.col("fwd_ts")) - F.unix_micros(F.col("ts"))
    near = (
        F.when(F.col("back_ts").isNull(), F.col("fwd_ts"))
        .when(F.col("fwd_ts").isNull(), F.col("back_ts"))
        .when(gb <= gf, F.col("back_ts"))
        .otherwise(F.col("fwd_ts"))
    )
    gap = (
        F.when(F.col("back_ts").isNull(), gf)
        .when(F.col("fwd_ts").isNull(), gb)
        .when(gb <= gf, gb)
        .otherwise(gf)
    )
    side = (
        F.when(F.col("back_ts").isNull(), F.lit("f"))
        .when(F.col("fwd_ts").isNull(), F.lit("b"))
        .when(gb <= gf, F.lit("b"))
        .otherwise(F.lit("f"))
    )
    return m.where(F.col("kind") == 1).select(
        "event_id", "ts",
        near.alias("near_ts"),
        gap.cast("long").alias("gap_us"),
        side.alias("side"),
    )


@register(
    "j_null_safe_eq",
    """
    WITH l AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL
                    ELSE o_orderkey % 5 END AS grp
        FROM orders WHERE o_orderkey <= 2000
    ),
    r AS (
        SELECT CASE WHEN g = 9 THEN NULL ELSE g END AS grp,
               CASE WHEN g = 9 THEN 'null-bucket'
                    ELSE 'bucket-' || CAST(g AS VARCHAR) END AS label
        FROM (SELECT unnest([0, 1, 2, 3, 4, 9]) AS g)
    )
    SELECT l.o_orderkey, r.label
    FROM l JOIN r ON l.grp IS NOT DISTINCT FROM r.grp
    ORDER BY l.o_orderkey
    """,
)
def j_null_safe_eq(spark, sf_dir):
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each OTHER instead of silently dropping — the semantics a
    dimension with an explicit 'unknown' bucket needs, where a plain
    equi-join loses every unattributed fact row.

    `<=>` is a true equi-comparison, so Spark still plans a HASH join
    (broadcast here — the null-safe predicate does NOT degrade to a
    nested loop, which is the mistake hand-rolled
    `(a = b OR (a IS NULL AND b IS NULL))` provokes from engines that
    can't factor the OR). Same single-shuffle/broadcast cost model as
    j_inner_equi at any scale.
    """
    orders = load_table(spark, sf_dir, "orders")
    left = orders.where(F.col("o_orderkey") <= 2000).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("o_orderkey") % 5)
        .alias("grp"),
    )
    rows = [(g if g != 9 else None,
             "null-bucket" if g == 9 else f"bucket-{g}")
            for g in (0, 1, 2, 3, 4, 9)]
    right = spark.createDataFrame(rows, "grp LONG, label STRING")
    return (
        left.join(F.broadcast(right), left.grp.eqNullSafe(right.grp))
        .select("o_orderkey", "label")
        .orderBy("o_orderkey")
    )


@register(
    "j_grid_knn",
    """
    WITH cust AS (
        SELECT c_custkey,
               (c_custkey * 48271) % 1000 AS cx,
               (c_custkey * 69621) % 1000 AS cy
        FROM customer
    ),
    supp AS (
        SELECT s_suppkey,
               (s_suppkey * 48271 + 137) % 1000 AS sx,
               (s_suppkey * 69621 + 511) % 1000 AS sy
        FROM supplier
    ),
    scell AS (
        SELECT s_suppkey, sx, sy, sx // 100 AS gx, sy // 100 AS gy FROM supp
    ),
    cand AS (
        SELECT c.c_custkey, s.s_suppkey,
               (c.cx - s.sx) * (c.cx - s.sx)
               + (c.cy - s.sy) * (c.cy - s.sy) AS d2
        FROM cust c
        JOIN (SELECT unnest([-1, 0, 1]) AS dx) ox ON TRUE
        JOIN (SELECT unnest([-1, 0, 1]) AS dy) oy ON TRUE
        JOIN scell s
          ON s.gx = (c.cx // 100) + ox.dx AND s.gy = (c.cy // 100) + oy.dy
    )
    SELECT c_custkey, s_suppkey AS nearest_suppkey, CAST(d2 AS BIGINT) AS d2
    FROM (
        SELECT *, row_number() OVER (PARTITION BY c_custkey
                                     ORDER BY d2, s_suppkey) AS rn
        FROM cand
    ) WHERE rn = 1
    """,
)
def j_grid_knn(spark, sf_dir):
    """Grid-bucketed spatial nearest-neighbor join — the geohash/S2-cell
    pattern: every point lands in a 100x100 grid cell, candidate pairs
    come from the customer's 3x3 cell NEIGHBORHOOD (an equi-join on
    cell ids after a 9-way offset explode), and the exact squared
    distance reranks candidates to the nearest supplier per customer.
    Semantics are nearest-IN-NEIGHBORHOOD by contract (the honest grid
    trade-off: a customer whose 9 cells hold no supplier gets no row;
    production stacks coarser grids for those). Coordinates are
    deterministic LCG projections of the keys — the operator is about
    the JOIN SHAPE, not geography.

    This is the 2-D generalization of j_range_bucketed's 1-D banding:
    a naive nearest-neighbor join is |C|x|S| distance evaluations; the
    grid caps each customer's candidates at the 9-cell occupancy
    (density-bound, corpus-size-independent for constant density), and
    the 9-way explode rides the BUILD side of one hash equi-join on
    (gx, gy). All-integer distance arithmetic; s_suppkey tiebreak.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 48271) % 1000).alias("cx"),
        ((F.col("c_custkey") * 69621) % 1000).alias("cy"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 48271 + 137) % 1000).alias("sx"),
        ((F.col("s_suppkey") * 69621 + 511) % 1000).alias("sy"),
    )
    scell = supp.select(
        "s_suppkey", "sx", "sy",
        F.expr("sx div 100").alias("gx"), F.expr("sy div 100").alias("gy"),
    )
    offsets = F.explode(
        F.expr(
            "flatten(transform(sequence(-1, 1),"
            " dx -> transform(sequence(-1, 1), dy -> struct(dx, dy))))"
        )
    ).alias("o")
    probe = cust.select("c_custkey", "cx", "cy", offsets).select(
        "c_custkey", "cx", "cy",
        (F.expr("cx div 100") + F.col("o.dx")).alias("gx"),
        (F.expr("cy div 100") + F.col("o.dy")).alias("gy"),
    )
    d2 = (
        (F.col("cx") - F.col("sx")) * (F.col("cx") - F.col("sx"))
        + (F.col("cy") - F.col("sy")) * (F.col("cy") - F.col("sy"))
    )
    cand = probe.join(scell, ["gx", "gy"]).select(
        "c_custkey", "s_suppkey", d2.alias("d2")
    )
    w = Window.partitionBy("c_custkey").orderBy("d2", "s_suppkey")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "c_custkey",
            F.col("s_suppkey").alias("nearest_suppkey"),
            F.col("d2").cast("long").alias("d2"),
        )
    )


@register(
    "j_lateral_topn",
    """
    SELECT c.c_custkey, o.o_orderkey, o.cents, o.rn
    FROM customer c,
    LATERAL (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)
                    AS BIGINT) AS rn
        FROM orders
        WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
    ) o
    WHERE c.c_mktsegment = 'BUILDING'
    ORDER BY c.c_custkey, o.rn
    """,
)
def j_lateral_topn(spark, sf_dir):
    """Correlated LATERAL join — top-2 orders per BUILDING customer via a
    per-row dependent subquery, the SQL-standard surface (LATERAL /
    CROSS APPLY) that window functions usually shadow. It exists as its
    own key because the reference-class engines expose it and because
    Catalyst handles it with a dedicated path: DecorrelateInnerQuery
    rewrites the dependent subquery into a ranked join — the SAME
    physical plan the w_topk_group window produces — so the declarative
    per-row form costs nothing over the hand-written window. The scale
    argument is therefore inherited: one shuffle on the correlation key,
    WindowGroupLimit pruning, no per-customer re-execution (what a
    naive nested-loop interpretation of LATERAL would do).

    Spark runs the IDENTICAL SQL text via spark.sql on registered temp
    views — LATERAL is pure SQL surface with no DataFrame-API spelling.
    Exact cents; (price, orderkey) tiebreak everywhere.
    """
    cust, orders = tables(spark, sf_dir, "customer", "orders")
    cust.createOrReplaceTempView("lat_customer")
    orders.createOrReplaceTempView("lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.cents, o.rn
        FROM lat_customer c,
        LATERAL (
            SELECT o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                   CAST(row_number() OVER (ORDER BY o_totalprice DESC,
                                           o_orderkey) AS BIGINT) AS rn
            FROM lat_orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) o
        WHERE c.c_mktsegment = 'BUILDING'
        ORDER BY c.c_custkey, o.rn
        """
    )


@register(
    "j_runtime_bloom",
    """
    SELECT l.l_orderkey,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
      AND o.o_totalprice > 200000
    GROUP BY l.l_orderkey
    """,
)
def j_runtime_bloom(spark, sf_dir):
    """Runtime bloom-filter join pruning (SPARK-32268): a selective
    predicate on the DIMENSION side injects a bloom filter that the
    FACT-side scan probes BEFORE the shuffle, so rows that cannot join
    are dropped at the scan — the runtime cousin of static partition
    pruning (j_dpp_partitioned prunes partitions a predicate names;
    this prunes rows only a runtime subquery can know). On a 100 TB
    fact table with a 0.1%-selective dim filter, the join shuffle
    shrinks ~1000x for the cost of one bloom build + a map-side probe.

    The conf knobs live on an ISOLATED spark.newSession() (shared
    SparkContext, private SQLConf), because the honest 100 TB setup
    they model — a filtered dim too big to broadcast, a fact scan big
    enough to clear the 10 GB injection gate — must not leak into the
    shared session every other operator uses: Spark only injects the
    filter for shuffle joins (under a broadcast join the probe is
    pointless, so at test scale the broadcast path must be off to
    exercise the plan that matters at scale). Results are optimizer-
    independent, which is exactly what the DuckDB oracle (a plain
    join) verifies; tests/test_round7.py asserts the plan actually
    contains the might_contain probe, so the demonstration can't
    silently degrade into an ordinary join.
    """
    s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    s2.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
    )
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    orders, li = tables(s2, sf_dir, "orders", "lineitem")
    dim = orders.where(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 200000)
    )
    return (
        li.join(dim, li.l_orderkey == dim.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
        )
    )


@register(
    "j_fact_to_scd2",
    """
    WITH v AS (
        SELECT user_id, event_type AS state, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS valid_to
        FROM events WHERE event_type <> 'purchase'
    ),
    facts AS (
        SELECT user_id, event_id AS fact_id, ts AS fact_ts
        FROM events WHERE event_type = 'purchase'
    ),
    matched AS (
        SELECT f.user_id, f.fact_id, v.state
        FROM facts f JOIN v
          ON v.user_id = f.user_id
         AND v.valid_from <= f.fact_ts
         AND (v.valid_to IS NULL OR v.valid_to > f.fact_ts)
    ),
    integrity AS (
        SELECT fact_id, CAST(count(*) AS BIGINT) AS n_versions
        FROM matched GROUP BY fact_id
    )
    SELECT m.state,
           CAST(count(*) AS BIGINT) AS n_facts,
           CAST(count(DISTINCT m.user_id) AS BIGINT) AS n_users,
           CAST(max(i.n_versions) AS BIGINT) AS max_versions_per_fact
    FROM matched m JOIN integrity i ON i.fact_id = m.fact_id
    GROUP BY m.state ORDER BY m.state
    """,
)
def j_fact_to_scd2(spark, sf_dir):
    """Fact-to-SCD2 interval join — the canonical use of a versioned
    dimension: each (late-arriving) fact joins the dimension version
    that was valid AT THE FACT'S OWN TIMESTAMP, via half-open interval
    containment against the lead()-built validity table
    (q_scd2_snapshot's build step, consumed instead of snapshotted).
    This is what j_asof approximates with nearest-match tolerance;
    interval containment is the EXACT semantics, and the
    max_versions_per_fact column audits the SCD2 integrity property
    the half-open intervals guarantee — every fact matches exactly one
    version (a 2 here means overlapping validity, the classic broken-
    merge symptom).

    Concretely: purchases are the facts, the user's non-purchase
    event stream builds the state versions, and the output answers
    'what state was each user in when they bought' — purchase
    attribution against a versioned profile. Plan: the version build
    is one user-keyed window; the interval join is an equi-join on
    user_id with containment as a post-join filter — co-partitioned,
    no range explosion (each fact meets only ITS user's versions). At
    100 TB with the versioned table bucketed by user and partitioned
    by valid_from date, the probe prunes both ways.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = ev.where(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    facts = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("fact_id"), F.col("ts").alias("fact_ts")
    )
    matched = facts.join(v, "user_id").where(
        (F.col("valid_from") <= F.col("fact_ts"))
        & (
            F.col("valid_to").isNull()
            | (F.col("valid_to") > F.col("fact_ts"))
        )
    ).select("user_id", "fact_id", "state")
    integrity = matched.groupBy("fact_id").agg(
        F.count("*").cast("long").alias("n_versions")
    )
    return (
        matched.join(integrity, "fact_id")
        .groupBy("state")
        .agg(
            F.count("*").cast("long").alias("n_facts"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.max("n_versions").cast("long").alias("max_versions_per_fact"),
        )
        .orderBy("state")
    )


@register(
    "j_null_safe",
    """
    WITH a AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 10 = 0 THEN NULL
                    ELSE o_custkey % 500 END AS k
        FROM orders WHERE o_orderkey < 2000
    ),
    b AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL
                    ELSE o_custkey % 500 END AS k
        FROM orders WHERE o_orderkey >= 2000 AND o_orderkey < 4000
    ),
    eq AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM a JOIN b ON a.k = b.k
    ),
    ns AS (
        SELECT CAST(count(*) AS BIGINT) AS n
        FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    ),
    nulls AS (
        SELECT CAST((SELECT count(*) FROM a WHERE k IS NULL) AS BIGINT)
                   AS na,
               CAST((SELECT count(*) FROM b WHERE k IS NULL) AS BIGINT)
                   AS nb
    )
    SELECT eq.n AS n_eq_matches, ns.n AS n_nullsafe_matches,
           ns.n - eq.n AS n_null_only_pairs,
           nulls.na * nulls.nb AS expected_null_pairs
    FROM eq CROSS JOIN ns CROSS JOIN nulls
    """,
)
def j_null_safe(spark, sf_dir):
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM) against
    plain `=` — the semantics gap behind one of the most common silent
    data-loss bugs: `=` NEVER matches NULL keys (NULL = NULL is NULL,
    the rows just vanish from an inner join), while `<=>` treats NULL
    as a joinable value. Both joins run on the same deliberately-
    nullable keys and the census PROVES the difference arithmetically:
    n_nullsafe − n_eq must equal |NULLs left| × |NULLs right| (the
    null-key cross product), which the expected_null_pairs column
    recomputes independently — if the two columns disagree, an engine
    mishandled null-key semantics.

    Scale note the operator embodies: `<=>` compiles to an ordinary
    hash-join key (nulls hash to one bucket), so ALL null keys land in
    ONE partition — the built-in skew bomb of null-safe joins at
    100 TB, fixed by pre-filtering nulls into a union branch (the
    a_key_skew_census → j_skew_salted escalation). Plain `=` instead
    null-rejects at the scan. Both sides bounded here for the compare;
    the plan shapes are what matter.
    """
    orders = load_table(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderkey") < 2000).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 10 == 0, None)
        .otherwise(F.col("o_custkey") % 500)
        .alias("k"),
    )
    b = orders.where(
        (F.col("o_orderkey") >= 2000) & (F.col("o_orderkey") < 4000)
    ).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_custkey") % 500)
        .alias("k"),
    )
    aa, bb = a.alias("a"), b.alias("b")
    n_eq = aa.join(bb, F.col("a.k") == F.col("b.k")).count()
    n_ns = aa.join(bb, F.col("a.k").eqNullSafe(F.col("b.k"))).count()
    na = a.where(F.col("k").isNull()).count()
    nb = b.where(F.col("k").isNull()).count()
    return spark.createDataFrame(
        [(n_eq, n_ns, n_ns - n_eq, na * nb)],
        "n_eq_matches long, n_nullsafe_matches long,"
        " n_null_only_pairs long, expected_null_pairs long",
    )


@register(
    "j_asof_tolerance",
    """
    WITH p AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase'
    ),
    v AS (
        SELECT user_id, ts AS vts FROM events WHERE event_type = 'view'
    ),
    best AS (
        SELECT p.event_id, p.user_id, p.ts, max(v.vts) AS vts
        FROM p LEFT JOIN v
          ON v.user_id = p.user_id AND v.vts <= p.ts
        GROUP BY p.event_id, p.user_id, p.ts
    ),
    gated AS (
        SELECT event_id,
               CASE WHEN vts IS NOT NULL
                     AND ts - vts <= INTERVAL 1 HOUR THEN vts END AS fresh_vts,
               vts AS any_vts, ts
        FROM best
    )
    SELECT CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(CASE WHEN any_vts IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_matched_any,
           CAST(sum(CASE WHEN fresh_vts IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_matched_fresh,
           CAST(sum(CASE WHEN any_vts IS NOT NULL AND fresh_vts IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_stale_rejected,
           round(avg(CASE WHEN fresh_vts IS NOT NULL
                          THEN date_diff('second', fresh_vts, ts) END), 6) + 0
               AS avg_fresh_staleness_sec
    FROM gated
    """,
)
def j_asof_tolerance(spark, sf_dir):
    """As-of join WITH a staleness tolerance — the feature-store
    semantics j_asof lacks: a purchase may only use the latest prior
    view if it is at most 1 hour old, otherwise the feature is NULL
    (serving a 3-day-old 'last page viewed' as context is usually
    worse than serving none — every online feature store exposes
    exactly this max-staleness knob). The census quantifies the knob:
    matched-at-any-staleness vs matched-fresh vs STALE-REJECTED (the
    rows a toleranceless as-of would silently poison), plus mean
    accepted staleness as the SLA readback.

    Same single user-keyed shape as j_asof (the tolerance is a
    post-aggregation filter on the matched timestamp — it adds zero
    shuffle); at 100 TB the running-max formulation (j_asof's
    union+last_value trick) replaces the per-purchase max-aggregate
    used here for oracle clarity.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    # v_uid alias: both sides descend from `ev`, and a same-name
    # user_id == user_id predicate trips Spark's trivially-true-equals
    # lineage warning (round-11 logcap tripwire).
    v = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_uid"), F.col("ts").alias("vts")
    )
    best = (
        p.join(
            v,
            (p.user_id == F.col("v_uid")) & (F.col("vts") <= F.col("ts")),
            "left",
        )
        .groupBy("event_id", p.user_id, "ts")
        .agg(F.max("vts").alias("vts"))
    )
    fresh = F.when(
        F.col("vts").isNotNull()
        & (F.col("ts").cast("long") - F.col("vts").cast("long") <= 3600),
        F.col("vts"),
    )
    gated = best.select(
        "event_id", "ts", F.col("vts").alias("any_vts"), fresh.alias("fresh_vts")
    )
    return gated.agg(
        F.count("*").cast("long").alias("n_purchases"),
        F.sum(F.when(F.col("any_vts").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_matched_any"),
        F.sum(F.when(F.col("fresh_vts").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_matched_fresh"),
        F.sum(
            F.when(
                F.col("any_vts").isNotNull() & F.col("fresh_vts").isNull(), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_stale_rejected"),
        f6(
            F.avg(
                F.when(
                    F.col("fresh_vts").isNotNull(),
                    F.col("ts").cast("long") - F.col("fresh_vts").cast("long"),
                )
            )
        ).alias("avg_fresh_staleness_sec"),
    )


@register(
    "j_allen_relations",
    """
    WITH iv AS (
        SELECT l_orderkey, l_linenumber,
               CAST(l_shipdate AS DATE) AS s,
               CAST(l_shipdate AS DATE)
                   + to_days(CAST(l_quantity AS INTEGER)) AS e
        FROM lineitem
    ),
    pairs AS (
        SELECT a.s AS s1, a.e AS e1, b.s AS s2, b.e AS e2
        FROM iv a JOIN iv b
          ON a.l_orderkey = b.l_orderkey
         AND a.l_linenumber < b.l_linenumber
    ),
    rel AS (
        SELECT CASE
            WHEN e1 < s2 THEN 'before'
            WHEN e1 = s2 THEN 'meets'
            WHEN s1 = s2 AND e1 = e2 THEN 'equals'
            WHEN s1 = s2 AND e1 < e2 THEN 'starts'
            WHEN s1 = s2 AND e1 > e2 THEN 'started_by'
            WHEN e1 = e2 AND s1 < s2 THEN 'finished_by'
            WHEN e1 = e2 AND s1 > s2 THEN 'finishes'
            WHEN s1 < s2 AND e1 > e2 THEN 'contains'
            WHEN s1 > s2 AND e1 < e2 THEN 'during'
            WHEN s1 < s2 AND e1 > s2 AND e1 < e2 THEN 'overlaps'
            WHEN s2 < s1 AND e2 > s1 AND e2 < e1 THEN 'overlapped_by'
            WHEN e2 = s1 THEN 'met_by'
            ELSE 'after' END AS relation
        FROM pairs
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM rel)
    SELECT relation, CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(*) * 1000000 // max(tot.n) AS BIGINT) AS share_ppm
    FROM rel CROSS JOIN tot
    GROUP BY relation
    ORDER BY relation
    """,
)
def j_allen_relations(spark, sf_dir):
    """Allen's interval algebra census — the full 13-relation
    classification (before/meets/overlaps/starts/during/finishes,
    their inverses, and equals) applied to per-line handling windows
    [shipdate, shipdate + quantity days) of line pairs within the
    same order (quantity as duration — the deterministic stand-in
    for a receipt date this schema does not carry).
    Allen's relations are the complete, mutually exclusive vocabulary
    of temporal interaction (Allen 1983) — the semantics underneath
    every interval join, overlap dedup, and temporal-validity check
    this engine ships (j_interval_overlap, q_scd2_intervals answer
    ONE of these 13 questions; this key enumerates which question the
    data is actually asking, pair by pair).  The CASE ladder is
    ordered so each arm is reached only when all earlier (more
    specific) relations failed — equality arms before strict ones —
    making the 13 classes provably exhaustive and disjoint (pytest
    pins total coverage: shares sum to 1e6 ppm within rounding).

    Scale: the pair join is keyed on the shared order (co-partitioned,
    bounded fan-out: <= C(7,2) pairs per order), and the census is a
    13-row groupBy — the same shape at any volume.
    """
    li = load_table(spark, sf_dir, "lineitem")
    iv = li.select(
        "l_orderkey",
        "l_linenumber",
        F.to_date("l_shipdate").alias("s"),
        F.date_add(
            F.to_date("l_shipdate"), F.col("l_quantity").cast("int")
        ).alias("e"),
    )
    a, b = iv.alias("a"), iv.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") < F.col("b.l_linenumber")),
    ).select(
        F.col("a.s").alias("s1"),
        F.col("a.e").alias("e1"),
        F.col("b.s").alias("s2"),
        F.col("b.e").alias("e2"),
    )
    s1, e1, s2, e2 = (F.col(c) for c in ("s1", "e1", "s2", "e2"))
    rel = pairs.select(
        F.when(e1 < s2, "before")
        .when(e1 == s2, "meets")
        .when((s1 == s2) & (e1 == e2), "equals")
        .when((s1 == s2) & (e1 < e2), "starts")
        .when((s1 == s2) & (e1 > e2), "started_by")
        .when((e1 == e2) & (s1 < s2), "finished_by")
        .when((e1 == e2) & (s1 > s2), "finishes")
        .when((s1 < s2) & (e1 > e2), "contains")
        .when((s1 > s2) & (e1 < e2), "during")
        .when((s1 < s2) & (e1 > s2) & (e1 < e2), "overlaps")
        .when((s2 < s1) & (e2 > s1) & (e2 < e1), "overlapped_by")
        .when(e2 == s1, "met_by")
        .otherwise("after")
        .alias("relation")
    )
    tot = rel.agg(F.count("*").cast("long").alias("n"))
    return (
        rel.crossJoin(F.broadcast(tot))
        .groupBy("relation")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.expr("count(*) * 1000000 div max(n)")
            .cast("long")
            .alias("share_ppm"),
        )
        .orderBy("relation")
    )
