"""Advanced relational surface, round-2 additions (SURVEY.md §2.13).

Modern-SQL operators the round-1 surface lacked: recursive CTEs (Spark 4
`WITH RECURSIVE`), LIMIT/OFFSET pagination, cume_dist, bivariate statistics
(corr / covar / linear regression aggregates), URL parsing, and a mergeable
HyperLogLog sketch pipeline (the 100 TB partial-aggregation shape for
distinct counts).

Scale notes:
- `q_recursive_cte` iterates O(log key-space) rounds; each round is a
  map-side projection + filter, and the final rollup is one shuffle.
- `a_sketch_merge` is the pattern that replaces exact countDistinct at
  100 TB: per-partition/per-group fixed-size HLL sketches (map-side
  combinable), merged with `hll_union_agg` — bytes shuffled are O(groups ×
  sketch size), independent of row count. Estimates are
  implementation-defined, so the key is rows-only with a pytest error
  bound (§5.2).
- `a_corr_regr` runs on Spark's single-pass co-moment aggregates (partial
  + final, combiner-friendly) — one shuffle of 5 doubles per group.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import register
from ..session import f6, load_table, money2, tables


def _views(spark, sf_dir, *names):
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(f"v_{n}")


@register(
    "q_recursive_cte",
    """
    WITH RECURSIVE chain AS (
        SELECT s_suppkey AS suppkey, s_suppkey AS node, 0 AS depth
        FROM supplier
        UNION ALL
        SELECT suppkey, node // 2 AS node, depth + 1 AS depth
        FROM chain WHERE node > 0
    )
    SELECT suppkey, CAST(max(depth) AS BIGINT) AS depth,
           CAST(sum(node) AS BIGINT) AS path_sum
    FROM chain GROUP BY suppkey
    """,
)
def q_recursive_cte(spark, sf_dir):
    """Recursive CTE (Spark 4 `WITH RECURSIVE`): walk each supplier key up
    the implicit binary-heap hierarchy (parent = key DIV 2) to the root,
    emitting per-key chain depth and path sum.

    Each iteration is a narrow projection+filter over the frontier (no
    shuffle inside the loop); depth is bounded by log2(max key), so the
    plan is O(log N) rounds regardless of row count.
    """
    _views(spark, sf_dir, "supplier")
    return spark.sql(
        """
        WITH RECURSIVE chain AS (
            SELECT s_suppkey AS suppkey, s_suppkey AS node, 0 AS depth
            FROM v_supplier
            UNION ALL
            SELECT suppkey, node DIV 2 AS node, depth + 1 AS depth
            FROM chain WHERE node > 0
        )
        SELECT suppkey, CAST(max(depth) AS BIGINT) AS depth,
               CAST(sum(node) AS BIGINT) AS path_sum
        FROM chain GROUP BY suppkey
        """
    )


@register(
    "o_limit_offset",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS total
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 10
    """,
)
def o_limit_offset(spark, sf_dir):
    """Pagination: ORDER BY ... LIMIT 20 OFFSET 10 (rows 11-30).

    Ordering ends in the unique o_orderkey tiebreak so the page is
    deterministic on any engine/partitioning. Spark plans offset+limit as a
    single TakeOrdered-style global top-(offset+limit) — no full sort.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey", (F.round(F.col("o_totalprice"), 2) + 0.0).alias("total")
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(10)
        .limit(20)
    )


@register(
    "w_cume_dist",
    """
    SELECT c_custkey, c_mktsegment,
           round(cume_dist() OVER (PARTITION BY c_mktsegment
                                   ORDER BY c_acctbal, c_custkey), 6) AS cd
    FROM customer
    """,
)
def w_cume_dist(spark, sf_dir):
    """cume_dist window over per-segment account balance (unique tiebreak
    makes the distribution exact on both engines)."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey", "c_mktsegment", f6(F.cume_dist().over(w)).alias("cd")
    )


@register(
    "a_corr_regr",
    """
    SELECT l_returnflag,
           round(corr(l_extendedprice, l_quantity), 6) + 0 AS price_qty_corr,
           round(covar_samp(l_extendedprice, l_quantity), 4) + 0 AS price_qty_covar,
           round(regr_slope(l_extendedprice, l_quantity), 4) + 0 AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) + 0 AS intercept,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a_corr_regr(spark, sf_dir):
    """Bivariate statistics: correlation, sample covariance, and the least-
    squares fit of price on quantity, per return flag.

    Spark computes these as single-pass co-moment aggregates with partial
    (map-side) combine — one shuffle of a constant-size state per group.
    covar/slope/intercept are rounded at 4dp (not 6) because their
    magnitude is ~1e4: 6dp would sit inside cross-engine float-association
    noise for a 600k-row sum of products.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        (F.round(F.corr("l_extendedprice", "l_quantity"), 6) + 0.0).alias(
            "price_qty_corr"
        ),
        (F.round(F.covar_samp("l_extendedprice", "l_quantity"), 4) + 0.0).alias(
            "price_qty_covar"
        ),
        (F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4) + 0.0).alias(
            "slope"
        ),
        (F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4) + 0.0).alias(
            "intercept"
        ),
        F.count("*").cast("long").alias("n"),
    )


@register(
    "fn_url",
    """
    WITH u AS (
        SELECT c_custkey,
               'https://shop-' || CAST(c_custkey % 16 AS VARCHAR)
                 || '.example.com/seg/'
                 || lower(replace(c_mktsegment, ' ', '-'))
                 || '?cust=' || CAST(c_custkey AS VARCHAR)
                 || '&nation=' || CAST(c_nationkey AS VARCHAR) AS url
        FROM customer)
    SELECT c_custkey,
           regexp_extract(url, '^https://([^/]+)', 1) AS host,
           regexp_extract(url, '^https://[^/]+([^?]*)', 1) AS path,
           regexp_extract(url, '[?&]cust=([^&]*)', 1) AS cust_param
    FROM u
    """,
)
def fn_url(spark, sf_dir):
    """URL construction + parsing: host / path / query-parameter extraction
    via Spark's `parse_url` (oracle mirrors with regexes — DuckDB has no
    parse_url). Pure codegen projection, no shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    url = F.concat(
        F.lit("https://shop-"),
        (F.col("c_custkey") % 16).cast("string"),
        F.lit(".example.com/seg/"),
        F.lower(F.replace(F.col("c_mktsegment"), F.lit(" "), F.lit("-"))),
        F.lit("?cust="),
        F.col("c_custkey").cast("string"),
        F.lit("&nation="),
        F.col("c_nationkey").cast("string"),
    )
    u = cust.select("c_custkey", url.alias("url"))
    return u.select(
        "c_custkey",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("cust")).alias("cust_param"),
    )


@register("a_sketch_merge")  # rows-only: HLL estimates are engine-specific
def a_sketch_merge(spark, sf_dir):
    """Mergeable distinct-count sketches (Apache DataSketches HLL): build one
    fixed-size sketch per (orderpriority, order-month) partial, then merge
    partials per priority with `hll_union_agg` and estimate.

    This is the 100 TB replacement for exact countDistinct: partials are
    map-side combinable and constant-size, so the shuffle carries O(groups ×
    sketch bytes) regardless of row count, and sketches computed by
    independent jobs (e.g. daily partitions) merge exactly. Estimates are
    implementation-defined (rows-only key); tests/test_modern.py bounds the
    estimate against the exact distinct count (±5%, far beyond HLL's
    expected error at lgK=12).
    """
    orders = load_table(spark, sf_dir, "orders")
    partials = orders.groupBy(
        "o_orderpriority", F.date_trunc("month", "o_orderdate").alias("mon")
    ).agg(F.hll_sketch_agg("o_custkey").alias("sk"))
    return (
        partials.groupBy("o_orderpriority")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_custs"))
        .select("o_orderpriority", F.col("approx_custs").cast("long").alias("approx_custs"))
    )


@register(
    "fn_try_arith",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice / nullif(l_quantity - 25, 0) AS per_excess,
           TRY_CAST(CAST(l_linenumber AS VARCHAR) || '.' || CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)
                    AS DOUBLE) AS parsed,
           TRY_CAST(l_returnflag AS DOUBLE) AS not_a_number
    FROM lineitem WHERE l_orderkey < 1000
    """,
)
def fn_try_arith(spark, sf_dir):
    """Error-safe arithmetic/casts (`try_divide`, `try_cast`): division by
    zero and unparseable strings yield NULL instead of failing the job —
    at 100 TB one poison row must not kill a 1000-executor stage. Oracle
    mirrors with nullif-guarded division and DuckDB TRY_CAST."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 1000)
    parsed_src = F.concat(
        F.col("l_linenumber").cast("string"),
        F.lit("."),
        F.col("l_quantity").cast("long").cast("string"),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # no rounding on purpose: elementwise IEEE division of identical
        # inputs is bit-identical across engines; round()'s tie-breaking
        # (half-up vs half-even) is NOT, and price/small-int hits exact
        # 4dp ties. Rounding is for aggregates, where association differs.
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 25).alias(
            "per_excess"
        ),
        parsed_src.try_cast("double").alias("parsed"),
        F.col("l_returnflag").try_cast("double").alias("not_a_number"),
    )


@register("a_approx_quantile")  # rows-only: quantile-sketch values are engine-specific
def a_approx_quantile(spark, sf_dir):
    """Approximate percentiles (p50/p90/p99 of extended price per return
    flag) via Spark's approx_percentile sketch.

    The 100 TB path for order statistics: the sketch state is bounded
    (O(accuracy)), map-side combinable, and mergeable across partitions —
    exact percentile_cont would need a full sort per group. Sketch outputs
    are implementation-defined (rows-only key); tests/test_modern.py bounds
    each estimate against the exact percentile."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.expr(
        "approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 10000)"
    )
    return li.groupBy("l_returnflag").agg(
        (F.round(q.getItem(0), 2) + 0.0).alias("p50"),
        (F.round(q.getItem(1), 2) + 0.0).alias("p90"),
        (F.round(q.getItem(2), 2) + 0.0).alias("p99"),
    )


@register(
    "j_bloom_runtime_filter",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS cnt,
           round(sum(l_extendedprice), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_totalprice > 400000
    GROUP BY o_orderpriority
    """,
)
def j_bloom_runtime_filter(spark, sf_dir):
    """Runtime bloom-filter join: the selective predicate sits on the
    creation side (orders), so Catalyst injects `bloom_filter_agg` there and
    a `might_contain` filter on the probe side (lineitem) BEFORE its shuffle
    — at 100 TB the probe side drops non-matching rows at the scan instead
    of shuffling them (tests/test_plans.py asserts the injection).

    The scan-size threshold is lowered because the heuristic's 10 GB default
    never triggers at fixture scale; on a real cluster the default stands.
    At fixture scale Catalyst rightly prefers broadcasting the filtered
    orders side (broadcast joins need no bloom filter); the plan test pins
    the at-scale shuffle-join path by disabling auto-broadcast, mirroring
    test_colocated_bucketed_join. Bloom filtering never changes results —
    the oracle is the plain join.
    """
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    li = load_table(spark, sf_dir, "lineitem")
    sel = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    j = li.join(sel, li.l_orderkey == sel.o_orderkey)
    return j.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("cnt"),
        (F.round(F.sum("l_extendedprice"), 2) + 0.0).alias("revenue"),
    )


@register(
    "a_skew_twophase",
    """
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS cnt,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a_skew_twophase(spark, sf_dir):
    """Two-phase (salted) aggregation for skewed group keys: phase 1 groups
    by (key, salt) — splitting each hot key across 8 reducers — phase 2
    combines the partials per key. l_returnflag has only 3 values, the
    textbook hot-key case: a direct groupBy lands each flag's entire volume
    on one task; salting bounds per-task input at 1/8 of that. Salting
    changes placement, never membership — the oracle is the direct group-by.
    """
    li = load_table(spark, sf_dir, "lineitem")
    partial = li.groupBy(
        "l_returnflag", (F.col("l_orderkey") % 8).alias("salt")
    ).agg(F.count("*").alias("c"), F.sum("l_quantity").alias("s"))
    return partial.groupBy("l_returnflag").agg(
        F.sum("c").cast("long").alias("cnt"),
        (F.round(F.sum("s"), 2) + 0.0).alias("sum_qty"),
    )


@register(
    "u_map_in_arrow",
    """
    SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def u_map_in_arrow(spark, sf_dir):
    """mapInArrow: the zero-copy end of the Python UDF surface — the
    callable receives pyarrow RecordBatches directly (no pandas
    conversion), computes with Arrow kernels, and yields batches. The
    cheapest bridge for columnar Python logic at 100 TB; per-batch memory
    is bounded by the Arrow batch size, rows never materialize in Python.
    """
    # Defined inside the query fn so cloudpickle ships it by value.
    def arrow_lengths(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            text = batch.column(1)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(pc.binary_length(pc.cast(text, pa.binary())), pa.int64()),
                ],
                names=["doc_id", "n_chars", "n_bytes"],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(arrow_lengths, schema="doc_id long, n_chars long, n_bytes long")


@register(
    "a_hist_bins",
    """
    SELECT CAST(least(greatest(floor(o_totalprice / 50000.0) + 1, 0), 13) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           round(min(o_totalprice), 2) + 0.0 AS lo,
           round(max(o_totalprice), 2) + 0.0 AS hi
    FROM orders GROUP BY 1
    """,
)
def a_hist_bins(spark, sf_dir):
    """Histogram: bin order values into 12 equal-width 50k buckets (clamped
    to [0, 13] like width_bucket) with per-bin counts and observed ranges —
    one partial+final aggregate, the constant-size-state shape that turns a
    100 TB distribution scan into O(bins) shuffle bytes. The bucket index
    uses the same floor(v/width)+1 double math on both engines (DuckDB 1.0
    has no width_bucket), so the group key is bit-identical."""
    orders = load_table(spark, sf_dir, "orders")
    bin_col = F.least(
        F.greatest(F.floor(F.col("o_totalprice") / F.lit(50000.0)) + F.lit(1), F.lit(0)),
        F.lit(13),
    ).cast("long")
    return orders.groupBy(bin_col.alias("bin")).agg(
        F.count("*").cast("long").alias("n"),
        (F.round(F.min("o_totalprice"), 2) + 0.0).alias("lo"),
        (F.round(F.max("o_totalprice"), 2) + 0.0).alias("hi"),
    )


@register(
    "q_event_funnel",
    """
    WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'click' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t2
           FROM events e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'view' AND e.ts > s1.t1
             AND e.ts <= s1.t1 + INTERVAL 7 DAY
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(e.ts) AS t3
           FROM events e JOIN s2 ON e.user_id = s2.user_id
                         JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'purchase' AND e.ts > s2.t2
             AND e.ts <= s1.t1 + INTERVAL 7 DAY
           GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM s1) AS n_click,
           (SELECT count(*) FROM s2) AS n_click_view,
           (SELECT count(*) FROM s3) AS n_click_view_purchase,
           round(CAST((SELECT count(*) FROM s3) AS DOUBLE)
                 / (SELECT count(*) FROM s1), 6) AS conversion
    """,
)
def q_event_funnel(spark, sf_dir):
    """Event funnel (click → view → purchase within 7 days of the first
    click): per-user ordered step matching, then depth counts and overall
    conversion — the ClickHouse `windowFunnel` shape in portable SQL.

    Plan shape: three cascaded per-user min-aggregates, each a shuffle on
    user_id (partial min combines map-side); the step predicates prune the
    events scan by event_type before any shuffle. Timestamps are
    µs-aligned integers, so every comparison (including the +7 days
    interval bound) is exact on both engines. At 100 TB the funnel's state
    per user is one timestamp per step — a `applyInPandasWithState`
    streaming twin would hold the same three fields.
    """
    ev = load_table(spark, sf_dir, "events")
    # r17 (guide §2.4/§5): s1 feeds step 2, step 3 AND its own census —
    # the click scan+agg ran 3x uncached (s2 twice through s3). One
    # timestamp per user per step, exactly the bounded state the
    # docstring names; cached so each funnel stage computes once.
    s1 = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .cache()
    )
    lim = F.col("t1") + F.expr("INTERVAL 7 DAYS")
    s2 = (
        ev.where(F.col("event_type") == "view")
        .join(s1, "user_id")
        .where((F.col("ts") > F.col("t1")) & (F.col("ts") <= lim))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .cache()
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .join(s1, "user_id")
        .where((F.col("ts") > F.col("t2")) & (F.col("ts") <= lim))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    c1 = s1.agg(F.count(F.lit(1)).alias("n_click"))
    c2 = s2.agg(F.count(F.lit(1)).alias("n_click_view"))
    c3 = s3.agg(F.count(F.lit(1)).alias("n_click_view_purchase"))
    return (
        c1.join(F.broadcast(c2)).join(F.broadcast(c3)).select(
            "n_click", "n_click_view", "n_click_view_purchase",
            f6(F.col("n_click_view_purchase").cast("double") / F.col("n_click"))
            .alias("conversion"),
        )
    )


@register(
    "w_streaks",
    """
    WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    isl AS (SELECT user_id, d,
                   d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                            AS INTEGER) AS anchor
            FROM days),
    runs AS (SELECT user_id, anchor, count(*) AS len
             FROM isl GROUP BY user_id, anchor)
    SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
           CAST(max(len) AS BIGINT) AS longest_streak
    FROM runs GROUP BY user_id ORDER BY user_id
    """,
)
def w_streaks(spark, sf_dir):
    """Longest consecutive-day activity streak per user — the classic
    gaps-and-islands pattern (date minus row_number is constant within a
    run of consecutive days).

    Plan shape: the distinct, the window, and both rollups all share ONE
    hashpartitioning(user_id) exchange (the distinct's (user_id, d)
    clustering satisfies the window's partitionBy and the downstream
    groupBys). Dates are exact integers — no float anywhere. At 100 TB
    per-user state is bounded by the calendar, not the event volume: the
    distinct collapses the stream to ≤ days × users rows map-side first.
    """
    ev = load_table(spark, sf_dir, "events")
    # repartition on user_id FIRST: hashpartitioning(user_id) satisfies the
    # distinct's (user_id, d) clustering, the window's partitionBy, and both
    # rollups — one exchange instead of two (plan-asserted).
    days = (
        ev.select("user_id", F.col("ts").cast("date").alias("d"))
        .repartition("user_id")
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    runs = isl.groupBy("user_id", "anchor").agg(F.count(F.lit(1)).alias("len"))
    return (
        runs.groupBy("user_id")
        .agg(
            F.sum("len").cast("long").alias("n_active_days"),
            F.max("len").cast("long").alias("longest_streak"),
        )
        .orderBy("user_id")
    )


@register(
    "q_basket_rules",
    """
    WITH baskets AS (
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM baskets),
    item AS (SELECT p_brand, count(*) AS c FROM baskets GROUP BY p_brand),
    pair AS (
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS c_ab
        FROM baskets a JOIN baskets b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        GROUP BY a.p_brand, b.p_brand
    )
    SELECT p.brand_a, p.brand_b, CAST(p.c_ab AS BIGINT) AS c_ab,
           round(CAST(p.c_ab AS DOUBLE) / (SELECT n_orders FROM n), 6)
               AS support,
           round(CAST(p.c_ab AS DOUBLE) / ia.c, 6) AS confidence,
           round((CAST(p.c_ab AS DOUBLE) / ia.c)
                 / (CAST(ib.c AS DOUBLE) / (SELECT n_orders FROM n)), 6)
               AS lift
    FROM pair p JOIN item ia ON ia.p_brand = p.brand_a
                JOIN item ib ON ib.p_brand = p.brand_b
    ORDER BY c_ab DESC, brand_a, brand_b
    LIMIT 50
    """,
)
def q_basket_rules(spark, sf_dir):
    """Market-basket association rules at brand granularity: support,
    confidence, and lift for every brand pair co-occurring in an order,
    top-50 by pair count.

    Plan shape: baskets (order, brand) are deduped once and CACHED (three
    consumers: item counts, the self-join, the order count — Spark does not
    reuse repeated subtrees); the pair self-join is an equi-join on
    orderkey with a `<` predicate, so pairs per order are k(k-1)/2 of a
    ≤25-brand basket — bounded regardless of corpus size. Counts are exact
    ints; the three ratios divide in one fixed association each. The tiny
    item/order-count tables broadcast back onto pairs.
    """
    li, part = tables(spark, sf_dir, "lineitem", "part")
    baskets = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
        .cache()
    )
    n = baskets.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    item = baskets.groupBy("p_brand").agg(F.count(F.lit(1)).alias("c"))
    a = baskets.select(F.col("l_orderkey"), F.col("p_brand").alias("brand_a"))
    b = baskets.select(F.col("l_orderkey").alias("ok_b"), F.col("p_brand").alias("brand_b"))
    pair = (
        a.join(b, (a.l_orderkey == b.ok_b) & (F.col("brand_a") < F.col("brand_b")))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    ia = item.select(F.col("p_brand").alias("brand_a"), F.col("c").alias("c_a"))
    ib = item.select(F.col("p_brand").alias("brand_b"), F.col("c").alias("c_b"))
    conf = F.col("c_ab").cast("double") / F.col("c_a")
    return (
        pair.join(F.broadcast(ia), "brand_a")
        .join(F.broadcast(ib), "brand_b")
        .join(F.broadcast(n))
        .select(
            "brand_a", "brand_b", F.col("c_ab").cast("long").alias("c_ab"),
            f6(F.col("c_ab").cast("double") / F.col("n_orders")).alias("support"),
            f6(conf).alias("confidence"),
            f6(conf / (F.col("c_b").cast("double") / F.col("n_orders"))).alias("lift"),
        )
        .orderBy(F.col("c_ab").desc(), "brand_a", "brand_b")
        .limit(50)
    )


@register(
    "q_retention_cohort",
    """
    WITH act AS (
        SELECT DISTINCT user_id,
               CAST(floor(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7)
                    AS BIGINT) AS wk
        FROM events
    ),
    cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM act GROUP BY user_id)
    SELECT c.cohort_wk, a.wk - c.cohort_wk AS week_offset,
           count(*) AS n_users
    FROM act a JOIN cohort c ON a.user_id = c.user_id
    GROUP BY c.cohort_wk, week_offset
    ORDER BY cohort_wk, week_offset
    """,
)
def q_retention_cohort(spark, sf_dir):
    """Cohort retention: users grouped by first-activity week, counted at
    each later week offset — the standard product-analytics retention
    triangle.

    Week index is integer day-arithmetic from a fixed epoch (floor(days/7))
    — engine-exact, no date_trunc('week') locale/ISO ambiguity. Plan
    shape: the distinct, the cohort min, and the final rollup all cluster
    on user_id (the (user_id, wk) distinct partitioning satisfies the
    cohort agg; the join is user_id-to-user_id co-partitioned). Per-user
    state is calendar-bounded.
    """
    ev = load_table(spark, sf_dir, "events")
    act = (
        ev.select(
            "user_id",
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")) / 7
            ).cast("long").alias("wk"),
        )
        .distinct()
        .cache()
    )
    cohort = act.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        act.join(cohort, "user_id")
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_wk", "week_offset")
    )


@register(
    "q_upsert_merge",
    """
    WITH snap AS (
        SELECT o_orderkey AS k,
               CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
               o_orderstatus AS status
        FROM orders
    ),
    mx AS (SELECT max(k) AS mx FROM snap),
    changes AS (
        SELECT k, price_cents + 10000 AS price_cents, status, 'U' AS op
        FROM snap WHERE k % 10 = 0
        UNION ALL
        SELECT k + (SELECT mx FROM mx) + 1 AS k, price_cents, 'N' AS status,
               'I' AS op
        FROM snap WHERE k % 97 = 0
    ),
    merged AS (
        SELECT coalesce(c.k, s.k) AS k,
               coalesce(c.price_cents, s.price_cents) AS price_cents,
               coalesce(c.status, s.status) AS status,
               c.op
        FROM snap s FULL OUTER JOIN changes c ON s.k = c.k
    )
    SELECT count(*) AS n_rows,
           CAST(sum(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
           CAST(sum(CASE WHEN op = 'I' THEN 1 ELSE 0 END) AS BIGINT) AS n_inserted,
           round(sum(price_cents) / 100.0, 2) + 0.0 AS total_value
    FROM merged
    """,
)
def q_upsert_merge(spark, sf_dir):
    """MERGE INTO semantics on plain parquet snapshots: a changes batch
    (updates to every 10th order, inserts beyond the max key) upserts onto
    the snapshot via FULL OUTER join + coalesce — matched rows take the
    change, unmatched keep the snapshot, insert-only rows append. The
    lakehouse-table MERGE expressed as a pure relational plan.

    Plan shape: one shuffle on the merge key for the full-outer SMJ (at
    100 TB both sides bucket on k and the join is co-located); the audit
    aggregate combines map-side. Money rides as BIGINT cents so the merged
    total is reduction-order-free. Determinism: the changes batch derives
    from the snapshot itself (k % 10 / k % 97), so the oracle rebuilds it
    exactly.
    """
    orders = load_table(spark, sf_dir, "orders")
    snap = orders.select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
        F.col("o_orderstatus").alias("status"),
    )
    mx = snap.agg(F.max("k").alias("mx"))
    upd = snap.where(F.col("k") % 10 == 0).select(
        "k", (F.col("price_cents") + 10000).alias("price_cents"),
        "status", F.lit("U").alias("op"),
    )
    ins = (
        snap.where(F.col("k") % 97 == 0)
        .join(F.broadcast(mx))
        .select(
            (F.col("k") + F.col("mx") + 1).alias("k"), "price_cents",
            F.lit("N").alias("status"), F.lit("I").alias("op"),
        )
    )
    changes = upd.unionByName(ins)
    merged = (
        snap.alias("s")
        .join(changes.alias("c"), F.col("s.k") == F.col("c.k"), "full_outer")
        .select(
            F.coalesce(F.col("c.k"), F.col("s.k")).alias("k"),
            F.coalesce(F.col("c.price_cents"), F.col("s.price_cents")).alias("price_cents"),
            F.coalesce(F.col("c.status"), F.col("s.status")).alias("status"),
            F.col("c.op").alias("op"),
        )
    )
    return merged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("op") == "U", 1).otherwise(0)).cast("long").alias("n_updated"),
        F.sum(F.when(F.col("op") == "I", 1).otherwise(0)).cast("long").alias("n_inserted"),
        (F.round(F.sum("price_cents") / 100.0, 2) + 0.0).alias("total_value"),
    )


@register(
    "q_scd2_intervals",
    """
    SELECT o_custkey,
           o_orderkey,
           o_orderdate AS valid_from,
           lead(o_orderdate) OVER w AS valid_to,
           (lead(o_orderdate) OVER w IS NULL) AS is_current,
           CAST(coalesce(date_diff('day', CAST(o_orderdate AS DATE),
                         CAST(lead(o_orderdate) OVER w AS DATE)), -1)
                AS BIGINT) AS days_valid
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, valid_from, o_orderkey
    """,
)
def q_scd2_intervals(spark, sf_dir):
    """SCD Type-2 interval construction: each customer's order stream
    becomes validity intervals [valid_from, valid_to) via lead(), with the
    open current row flagged — the standard dimension-history build.

    Plan shape: one user-key shuffle for the window; the lead frame is one
    row, so state is O(1) per key. days_valid is exact integer date
    arithmetic (-1 sentinel for the open interval, matching coalesce on
    both engines). The o_custkey < 100 bound keeps the emitted fixture
    slice small; the plan is identical unbounded.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return (
        orders.where(F.col("o_custkey") < 100)
        .select(
            "o_custkey", "o_orderkey",
            F.col("o_orderdate").alias("valid_from"),
            nxt.alias("valid_to"),
            nxt.isNull().alias("is_current"),
            F.coalesce(
                F.datediff(nxt.cast("date"), F.col("o_orderdate").cast("date")),
                F.lit(-1),
            ).cast("long").alias("days_valid"),
        )
        .orderBy("o_custkey", "valid_from", "o_orderkey")
    )


@register(
    "q_point_in_time",
    """
    WITH iv AS (
        SELECT o_custkey, o_orderkey, o_orderdate AS valid_from,
               lead(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey)
                   AS valid_to
        FROM orders WHERE o_custkey < 100
    )
    SELECT o_custkey, o_orderkey, valid_from
    FROM iv
    WHERE valid_from <= TIMESTAMP '1998-06-15'
      AND (valid_to > TIMESTAMP '1998-06-15' OR valid_to IS NULL)
    ORDER BY o_custkey, o_orderkey
    """,
)
def q_point_in_time(spark, sf_dir):
    """Point-in-time (time-travel) lookup over the SCD2 intervals: the
    version of each customer's order history valid AS OF 1998-06-15 — the
    dimension-history read that pairs with `q_scd2_intervals`' build.

    Plan shape: the same single user-key window, then a constant-bound
    interval predicate. With intervals PERSISTED (the 100 TB layout) this
    is a pure scan filter — `valid_from <= D < valid_to` prunes at the
    parquet level with no window at all; ties on (custkey, date) resolve
    by the same orderkey tiebreak in build and lookup.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = F.lit("1998-06-15").cast("timestamp")
    iv = orders.where(F.col("o_custkey") < 100).select(
        "o_custkey", "o_orderkey",
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
    )
    return (
        iv.where(
            (F.col("valid_from") <= d)
            & ((F.col("valid_to") > d) | F.col("valid_to").isNull())
        )
        .select("o_custkey", "o_orderkey", "valid_from")
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "q_dau_wau",
    """
    WITH pairs AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
        FROM events
    ),
    dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM pairs GROUP BY d),
    anchors AS (
        SELECT d + CAST(i.i AS INTEGER) AS a_day, user_id
        FROM pairs, range(0, 7) i(i)
    ),
    wau AS (
        SELECT a.a_day AS d, CAST(count(DISTINCT a.user_id) AS BIGINT) AS wau
        FROM anchors a JOIN dau ON dau.d = a.a_day
        GROUP BY a.a_day
    )
    SELECT dau.d AS day, dau.dau, wau.wau,
           round(dau.dau * 1.0 / wau.wau, 6) AS stickiness
    FROM dau JOIN wau ON dau.d = wau.d
    """,
)
def q_dau_wau(spark, sf_dir):
    """DAU / trailing-7-day WAU / stickiness (DAU÷WAU) per day — the
    growth-team headline metric triple.

    The rolling DISTINCT is the hard part at scale: a naive per-day
    7-day-window count-distinct rescans events 7×. Instead activity first
    collapses to distinct (day, user) pairs (linear, one shuffle), each
    pair then explodes to the 7 anchor days it contributes to (7× the
    COLLAPSED pairs, not raw events), and WAU is an exact distinct count
    per anchor — joined back to real days only. All joins are equi-joins
    on day; no range join, no rescan. At 100 TB the pair collapse is the
    dominant shuffle and everything after is day-bounded.
    """
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select(
        F.to_date(F.date_trunc("day", "ts")).alias("d"), "user_id"
    ).distinct()
    dau = pairs.groupBy("d").agg(F.count("*").cast("long").alias("dau"))
    anchors = pairs.select(
        F.explode(F.expr("sequence(0, 6)")).alias("i"), "d", "user_id"
    ).select(F.expr("date_add(d, i)").alias("a_day"), "user_id")
    wau = (
        anchors.join(dau.select(F.col("d").alias("a_day")), "a_day")
        .groupBy("a_day")
        .agg(F.countDistinct("user_id").cast("long").alias("wau"))
    )
    return (
        dau.join(wau, dau.d == wau.a_day)
        .select(
            F.col("d").alias("day"), "dau", "wau",
            f6(F.col("dau") * 1.0 / F.col("wau")).alias("stickiness"),
        )
    )


@register(
    "q_event_transitions",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    c AS (
        SELECT prev_type, event_type AS next_type,
               CAST(count(*) AS BIGINT) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    )
    SELECT prev_type, next_type, n,
           round(n * 1.0 / sum(n) OVER (PARTITION BY prev_type), 6) AS prob
    FROM c
    """,
)
def q_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix over event types: for each
    (prev → next) pair, the count and the row-normalized transition
    probability — the flow/Sankey census product analytics builds every
    journey map from.

    The lag window and nothing else touches raw events (one user_id
    shuffle with a deterministic (ts, event_id) order); the census
    collapses to a |types|²-bounded axis, and the probability window
    normalizes over that aggregated frame. Exact counts; one division
    per matrix cell.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    c = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").cast("long").alias("n")
    )
    return c.select(
        "prev_type", "next_type", "n",
        f6(
            F.col("n") * 1.0 / F.sum("n").over(Window.partitionBy("prev_type"))
        ).alias("prob"),
    )


@register(
    "a_autocorr_daily",
    """
    WITH daily AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
               CAST(round(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                          / 1e5) AS BIGINT) AS kd
        FROM orders GROUP BY 1
    ),
    pairs AS (
        SELECT a.kd AS x, b.kd AS y
        FROM daily a JOIN daily b ON b.d = a.d + 1
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
        FROM pairs
    )
    SELECT n AS n_pairs,
           round((n * sxy - sx * sy) * 1.0
                 / sqrt((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy)),
                 6) + 0 AS lag1_autocorr
    FROM s
    """,
)
def a_autocorr_daily(spark, sf_dir):
    """Lag-1 autocorrelation of the daily revenue series — the one-number
    answer to "does yesterday predict today?" that gates whether a
    forecasting model is worth building (near 0: revenue is i.i.d. noise;
    the fixture's synthetic orders should show exactly that).

    Daily revenue snaps to exact kilodollar BIGINTs (coarse enough that
    n·Σx² stays far inside int64 at any SF), consecutive days pair via a
    date equi-join on the day-bounded aggregate, and all five Pearson
    sums are exact integer reductions — the correlation expression is the
    ONLY float math, evaluated once in a shared association (unlike
    corr(), whose streaming co-moments accumulate engine-specific float
    error).
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date(F.date_trunc("day", "o_orderdate")).alias("d")
    ).agg(
        F.round(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 1e5
        ).cast("long").alias("kd")
    )
    a = daily.select(F.col("d").alias("da"), F.col("kd").alias("x"))
    b = daily.select(F.expr("date_sub(d, 1)").alias("da"), F.col("kd").alias("y"))
    pairs = a.join(b, "da")
    s = pairs.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) * 1.0
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) * 1.0
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select(
        F.col("n").alias("n_pairs"),
        f6(num / den).alias("lag1_autocorr"),
    )


@register(
    "q_running_backlog",
    """
    WITH shipped AS (
        SELECT l_orderkey, max(l_shipdate) AS done_d
        FROM lineitem GROUP BY l_orderkey
    ),
    deltas AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
               CAST(1 AS BIGINT) AS delta
        FROM orders
        UNION ALL
        SELECT CAST(date_trunc('day', s.done_d) AS DATE) AS d,
               CAST(-1 AS BIGINT) AS delta
        FROM shipped s JOIN orders o ON o.o_orderkey = s.l_orderkey
    ),
    daily AS (
        SELECT d, sum(delta) AS net,
               sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS opened,
               sum(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS closed
        FROM deltas GROUP BY d
    )
    SELECT d AS day, CAST(opened AS BIGINT) AS opened,
           CAST(closed AS BIGINT) AS closed,
           CAST(sum(net) OVER (ORDER BY d) AS BIGINT) AS backlog
    FROM daily
    """,
)
def q_running_backlog(spark, sf_dir):
    """Open-order backlog curve: daily orders placed minus orders fully
    shipped (last line shipped), with the running open count — the
    operations chart that shows whether fulfillment keeps up with intake
    (backlog drifting up = capacity problem long before SLAs breach).

    The classic +1/−1 event-delta shape: both deltas collapse to the
    day-bounded axis BEFORE the cumulative window, so the global running
    sum orders days, not orders (the a_ks_drift aggregated-axis rule);
    the ship-completion date is one orderkey rollup joined back
    (orderkey-partitioned both sides). Exact integer counts end to end.
    """
    from pyspark.sql.window import Window

    orders, li = tables(spark, sf_dir, "orders", "lineitem")
    shipped = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("done_d"))
    opened = orders.select(
        F.to_date(F.date_trunc("day", "o_orderdate")).alias("d"),
        F.lit(1).cast("long").alias("delta"),
    )
    closed = (
        shipped.join(orders, shipped.l_orderkey == orders.o_orderkey)
        .select(
            F.to_date(F.date_trunc("day", "done_d")).alias("d"),
            F.lit(-1).cast("long").alias("delta"),
        )
    )
    daily = opened.unionAll(closed).groupBy("d").agg(
        F.sum("delta").alias("net"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias("opened"),
        F.sum(F.when(F.col("delta") == -1, 1).otherwise(0)).alias("closed"),
    )
    w = Window.orderBy("d")
    return daily.select(
        F.col("d").alias("day"),
        F.col("opened").cast("long").alias("opened"),
        F.col("closed").cast("long").alias("closed"),
        F.sum("net").over(w).cast("long").alias("backlog"),
    )


@register(
    "w_cusum",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(round(sum(CAST(round(value * 1e6) AS BIGINT)) * 1.0
                          / count(*)) AS BIGINT) AS mean6
        FROM events GROUP BY 1, 2
    ),
    base AS (
        SELECT event_type,
               CAST(round(sum(mean6) * 1.0 / count(*)) AS BIGINT) AS grand6
        FROM daily GROUP BY event_type
    )
    SELECT d.event_type, d.day,
           round(sum(d.mean6 - b.grand6)
                 OVER (PARTITION BY d.event_type ORDER BY d.day) / 1e6,
                 6) + 0 AS cusum
    FROM daily d JOIN base b ON b.event_type = d.event_type
    ORDER BY d.event_type, d.day
    """,
)
def w_cusum(spark, sf_dir):
    """CUSUM drift chart per event type: cumulative sum of each day's
    deviation from the type's long-run mean of daily means. A metric that
    drifts upward shows a steadily climbing CUSUM long before any single
    day breaches a threshold — the classic change-point screen on top of
    the a_ks_drift / a_psi_drift distribution monitors.

    Values snap to 1e-6 BIGINT units at the scan, each daily mean is ONE
    deterministic rounded division, and the running sum accumulates exact
    BIGINT deviations — so the curve is bit-identical regardless of
    partial-agg order. The daily axis (types × days) is calendar-bounded:
    the window sort runs over ~thousands of rows even when the event scan
    is 100 TB, and the per-type grand means broadcast back onto it.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.round(
                F.sum(F.round(F.col("value") * 1e6).cast("long")) * 1.0
                / F.count("*")
            ).cast("long").alias("mean6")
        )
    )
    base = daily.groupBy("event_type").agg(
        F.round(F.sum("mean6") * 1.0 / F.count("*")).cast("long").alias("grand6")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    return (
        daily.join(F.broadcast(base), "event_type")
        .select(
            "event_type",
            "day",
            f6(F.sum(F.col("mean6") - F.col("grand6")).over(w) / 1e6).alias("cusum"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "q_conversion_lag",
    """
    WITH firsts AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_buy
        FROM events GROUP BY user_id
    ),
    lags AS (
        SELECT CAST(epoch_us(first_buy) - epoch_us(first_view) AS BIGINT)
                   AS lag_us
        FROM firsts
        WHERE first_view IS NOT NULL AND first_buy IS NOT NULL
          AND first_buy >= first_view
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           CAST(min(lag_us) AS BIGINT) AS min_us,
           CAST(max(lag_us) AS BIGINT) AS max_us,
           round(avg(lag_us) / 3600e6, 6) + 0 AS avg_hours,
           round(quantile_cont(lag_us, 0.5) / 3600e6, 6) + 0 AS p50_hours,
           round(quantile_cont(lag_us, 0.9) / 3600e6, 6) + 0 AS p90_hours
    FROM lags
    """,
)
def q_conversion_lag(spark, sf_dir):
    """Time-to-convert funnel metric: for each user who both viewed and
    later purchased, the lag between FIRST view and FIRST purchase —
    reported as count / min / max plus interpolated p50/p90 hours. The
    scalar companion to q_event_funnel (which counts stage survivors,
    not how long stages take).

    One user_id aggregation computes both firsts via conditional min (no
    self-join of the event scan); lags are exact integer microseconds.
    The percentile runs on the converted-user axis — |users| rows, not
    |events| — and at extreme scale swaps to approx_percentile with a
    documented error bound (the q_ship_latency convention).
    """
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_buy"),
    )
    lags = (
        firsts.where(
            F.col("first_view").isNotNull()
            & F.col("first_buy").isNotNull()
            & (F.col("first_buy") >= F.col("first_view"))
        )
        .select(
            (F.unix_micros("first_buy") - F.unix_micros("first_view")).alias("lag_us")
        )
    )
    return lags.agg(
        F.count("*").cast("long").alias("n_converted"),
        F.min("lag_us").cast("long").alias("min_us"),
        F.max("lag_us").cast("long").alias("max_us"),
        f6(F.avg("lag_us") / 3600e6).alias("avg_hours"),
        f6(F.expr("percentile(lag_us, 0.5)") / 3600e6).alias("p50_hours"),
        f6(F.expr("percentile(lag_us, 0.9)") / 3600e6).alias("p90_hours"),
    )


@register(
    "w_rolling_median",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               sum(CAST(round(value * 1e6) AS BIGINT)) AS sum6
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, day,
           round(median(sum6)
                 OVER (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) / 1e6,
                 6) + 0 AS med7
    FROM daily
    ORDER BY event_type, day
    """,
)
def w_rolling_median(spark, sf_dir):
    """7-day rolling MEDIAN of daily value per event type — the robust
    twin of w_moving_avg: one outlier day (a flash sale, a logging bug)
    drags a mean for a week but leaves the median untouched.

    Daily values snap to exact 1e-6-unit BIGINTs in the one calendar
    fold; the median runs as an order-statistic aggregate over a 7-ROW
    frame on the (type, day)-bounded axis — O(frame log frame) per row
    on ~10³ rows total, regardless of the event volume underneath. Both
    engines average the two middle values on even frames, and the
    operands are integers, so the interpolation is engine-exact.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("value") * 1e6).cast("long")).alias("sum6")
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    return (
        daily.select(
            "event_type",
            "day",
            f6(F.expr("percentile(sum6, 0.5)").over(w) / 1e6).alias("med7"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "q_survival_curve",
    """
    WITH life AS (
        SELECT user_id,
               CAST(datediff('day', min(ts), max(ts)) AS BIGINT) AS lifetime_d
        FROM events GROUP BY user_id
    ),
    days AS (SELECT unnest(range(0, 31)) AS d),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM life)
    SELECT d.d AS day,
           CAST(sum(CASE WHEN l.lifetime_d >= d.d THEN 1 ELSE 0 END) AS BIGINT)
               AS n_surviving,
           round(sum(CASE WHEN l.lifetime_d >= d.d THEN 1 ELSE 0 END)
                 * 1.0 / max(t.n), 6) + 0 AS survival
    FROM days d CROSS JOIN life l CROSS JOIN tot t
    GROUP BY d.d
    ORDER BY day
    """,
)
def q_survival_curve(spark, sf_dir):
    """User survival curve: fraction of users still active d days after
    their first event, d = 0..30 — the retention summary behind churn
    models (q_retention_cohort slices it by cohort; this is the
    marginal curve with a per-day axis).

    Lifetimes fold to ONE per-user aggregate (first/last from the same
    user_id shuffle — the only fact-sized work); the curve itself is a
    31-row day spine crossed against the user-axis lifetimes, grouped
    back to 31 rows with exact integer survivor counts. At 100 TB
    the cross join is |users| x 31 — at extreme user counts, replace
    it with a lifetime histogram + reverse cumulative sum (same
    numbers, one window over ≤ max-lifetime rows); the survival shares
    divide exact BIGINTs once per output row.
    """
    ev = load_table(spark, sf_dir, "events")
    life = ev.groupBy("user_id").agg(
        F.datediff(F.max("ts"), F.min("ts")).cast("long").alias("lifetime_d")
    )
    days = spark.range(31).select(F.col("id").cast("long").alias("d"))
    tot = life.agg(F.count("*").cast("long").alias("n"))
    return (
        F.broadcast(days)
        .crossJoin(life)
        .crossJoin(F.broadcast(tot))
        .groupBy(F.col("d").alias("day"))
        .agg(
            F.sum(F.when(F.col("lifetime_d") >= F.col("d"), 1).otherwise(0))
            .cast("long")
            .alias("n_surviving"),
            f6(
                F.sum(F.when(F.col("lifetime_d") >= F.col("d"), 1).otherwise(0))
                * 1.0
                / F.max("n")
            ).alias("survival"),
        )
        .orderBy("day")
    )


@register(
    "q_attribution_last_touch",
    """
    WITH buys AS (
        SELECT event_id, user_id, ts,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
        SELECT user_id, ts, event_type FROM events
        WHERE event_type IN ('view', 'click')
    ),
    attributed AS (
        SELECT b.event_id, b.cents, t.event_type AS channel, t.ts AS touch_ts,
               row_number() OVER (PARTITION BY b.event_id
                                  ORDER BY t.ts DESC, t.event_type) AS rn
        FROM buys b
        JOIN touches t
          ON t.user_id = b.user_id
         AND t.ts <= b.ts
         AND t.ts >= b.ts - INTERVAL 7 DAY
    )
    SELECT channel,
           CAST(count(*) AS BIGINT) AS n_purchases,
           round(sum(cents) / 100.0, 2) + 0 AS attributed_revenue
    FROM attributed WHERE rn = 1
    GROUP BY channel
    ORDER BY channel
    """,
)
def q_attribution_last_touch(spark, sf_dir):
    """Last-touch marketing attribution: each purchase's revenue is
    credited to the LAST view-or-click by the same user within a 7-day
    lookback — the default attribution model every growth dashboard
    starts from (j_asof is the raw primitive; this is the business
    query on top, with the channel rollup).

    The purchase↔touch pairing keys on user_id FIRST (the j_asof
    argument: interval predicates ride a user-keyed join, never a time
    cross join); the last-touch pick is a WindowGroupLimit on the
    per-purchase candidate set, bounded by a user's 7-day touch count.
    Revenue stays exact cents into the channel rollup. At 100 TB the
    7-day window bounds candidates per purchase regardless of history
    length — and the bucketed-range twin (j_range_bucketed) swaps in
    if per-user touch volume explodes.
    """
    ev = load_table(spark, sf_dir, "events")
    buys = ev.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("buy_ts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    touches = ev.where(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("touch_ts"),
        F.col("event_type").alias("channel"),
    )
    cand = buys.join(
        touches,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("touch_ts") <= F.col("buy_ts"))
        & (F.col("touch_ts") >= F.col("buy_ts") - F.expr("INTERVAL 7 DAY")),
    )
    w = Window.partitionBy("event_id").orderBy(
        F.col("touch_ts").desc(), "channel"
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .groupBy("channel")
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            (F.round(F.sum("cents") / 100.0, 2) + 0.0).alias("attributed_revenue"),
        )
        .orderBy("channel")
    )


@register(
    "a_diff_in_diff",
    """
    WITH base AS (
        SELECT CAST(user_id % 2 AS BIGINT) AS treated,
               CASE WHEN epoch_us(ts) >=
                        (SELECT epoch_us(min(ts))
                                + (epoch_us(max(ts)) - epoch_us(min(ts))) // 2
                         FROM events WHERE event_type = 'purchase')
                    THEN 1 ELSE 0 END AS post,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    cells AS (
        SELECT treated, post, CAST(count(*) AS BIGINT) AS n,
               sum(cents) AS s
        FROM base GROUP BY treated, post
    ),
    m AS (
        SELECT
            max(CASE WHEN treated = 1 AND post = 1 THEN s * 1.0 / n END) AS t1,
            max(CASE WHEN treated = 1 AND post = 0 THEN s * 1.0 / n END) AS t0,
            max(CASE WHEN treated = 0 AND post = 1 THEN s * 1.0 / n END) AS c1,
            max(CASE WHEN treated = 0 AND post = 0 THEN s * 1.0 / n END) AS c0,
            CAST(sum(n) AS BIGINT) AS n_total
        FROM cells
    )
    SELECT n_total,
           round((t1 - t0) / 100, 6) + 0 AS treat_delta,
           round((c1 - c0) / 100, 6) + 0 AS control_delta,
           round(((t1 - t0) - (c1 - c0)) / 100, 6) + 0 AS did_effect
    FROM m
    """,
)
def a_diff_in_diff(spark, sf_dir):
    """Difference-in-differences estimator on purchase values: treated
    cohort (user_id parity — a deterministic stand-in for a rollout
    flag) vs control, before vs after the observation midpoint. DiD =
    (treated after − treated before) − (control after − control before):
    the causal-inference workhorse when you can't randomize — the
    control delta nets out seasonality that a naive before/after
    (w_cusum's drift view) would book as treatment effect.

    One conditional scan folds all four cells (the a_cohens_d moment
    pattern on a 2×2 grid); the midpoint is a 1-row scalar subquery
    (broadcast). All cell sums are exact cents; the three deltas
    evaluate once on the 1-row result.
    """
    ev = load_table(spark, sf_dir, "events")
    buys = ev.where(F.col("event_type") == "purchase")
    mid = buys.agg(
        (
            F.unix_micros(F.min("ts"))
            + F.floor(
                (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / 2
            )
        ).cast("long").alias("mid_us")
    )
    base = buys.crossJoin(F.broadcast(mid)).select(
        (F.col("user_id") % 2).cast("long").alias("treated"),
        F.when(F.unix_micros(F.col("ts")) >= F.col("mid_us"), 1)
        .otherwise(0)
        .alias("post"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    cells = base.groupBy("treated", "post").agg(
        F.count("*").cast("long").alias("n"), F.sum("cents").alias("s")
    )
    mean = F.col("s") * 1.0 / F.col("n")
    m = cells.agg(
        F.max(F.when((F.col("treated") == 1) & (F.col("post") == 1), mean)).alias("t1"),
        F.max(F.when((F.col("treated") == 1) & (F.col("post") == 0), mean)).alias("t0"),
        F.max(F.when((F.col("treated") == 0) & (F.col("post") == 1), mean)).alias("c1"),
        F.max(F.when((F.col("treated") == 0) & (F.col("post") == 0), mean)).alias("c0"),
        F.sum("n").cast("long").alias("n_total"),
    )
    return m.select(
        "n_total",
        f6((F.col("t1") - F.col("t0")) / 100).alias("treat_delta"),
        f6((F.col("c1") - F.col("c0")) / 100).alias("control_delta"),
        f6(((F.col("t1") - F.col("t0")) - (F.col("c1") - F.col("c0"))) / 100).alias(
            "did_effect"
        ),
    )


@register(
    "w_control_chart",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(round(sum(CAST(round(value * 100) AS BIGINT)) * 1.0
                          / count(*)) AS BIGINT) AS mean2
        FROM events GROUP BY 1
    ),
    lim AS (
        SELECT avg(mean2 * 1.0) AS center,
               stddev_samp(mean2 * 1.0) AS sd,
               CAST(count(*) AS BIGINT) AS n_days
        FROM daily
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           round(max(l.center) / 100, 6) + 0 AS center,
           round((max(l.center) + 3 * max(l.sd)) / 100, 6) + 0 AS ucl,
           round((max(l.center) - 3 * max(l.sd)) / 100, 6) + 0 AS lcl,
           CAST(sum(CASE WHEN d.mean2 > l.center + 3 * l.sd
                           OR d.mean2 < l.center - 3 * l.sd
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_out_of_control
    FROM daily d CROSS JOIN lim l
    """,
)
def w_control_chart(spark, sf_dir):
    """X-bar control chart: daily mean value vs 3-sigma limits computed
    from the daily-mean distribution, with the out-of-control day
    count — the SPC (statistical process control) alarm that fires on
    LEVEL breaks where w_cusum accumulates slow drift; run both and
    you cover step changes and creep.

    Daily means fold to one rounded cent-unit BIGINT per day (one
    deterministic division each); the limits are a 1-row broadcast
    over the calendar-bounded day axis, and the breach comparison uses
    the identical center/sd floats in both engines. A 100 TB event
    scan reduces to |days| rows before any float math.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.round(
            F.sum(F.round(F.col("value") * 100).cast("long")) * 1.0 / F.count("*")
        )
        .cast("long")
        .alias("mean2")
    )
    lim = daily.agg(
        F.avg(F.col("mean2") * 1.0).alias("center"),
        F.stddev_samp(F.col("mean2") * 1.0).alias("sd"),
    )
    j = daily.crossJoin(F.broadcast(lim))
    breach = (F.col("mean2") > F.col("center") + 3 * F.col("sd")) | (
        F.col("mean2") < F.col("center") - 3 * F.col("sd")
    )
    return j.agg(
        F.count("*").cast("long").alias("n_days"),
        f6(F.max("center") / 100).alias("center"),
        f6((F.max("center") + 3 * F.max("sd")) / 100).alias("ucl"),
        f6((F.max("center") - 3 * F.max("sd")) / 100).alias("lcl"),
        F.sum(F.when(breach, 1).otherwise(0)).cast("long").alias("n_out_of_control"),
    )


@register(
    "w_peak_days",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               sum(CAST(round(value * 100) AS BIGINT)) AS v2
        FROM events GROUP BY 1
    ),
    ctx AS (
        SELECT day, v2,
               lag(v2) OVER (ORDER BY day) AS prev,
               lead(v2) OVER (ORDER BY day) AS next,
               median(v2) OVER (ORDER BY day
                                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                   AS med7
        FROM daily
    )
    SELECT day, round(v2 / 100.0, 2) + 0 AS total_value,
           round(med7 / 100.0, 2) + 0 AS med7
    FROM ctx
    WHERE prev IS NOT NULL AND next IS NOT NULL
      AND v2 > prev AND v2 > next AND v2 * 20 > med7 * 21
    ORDER BY day
    """,
)
def w_peak_days(spark, sf_dir):
    """Peak detection: days that are strict local maxima AND exceed
    1.05× their trailing 7-day median — the spike-day report (campaign
    launches, incidents) that w_control_chart's global 3σ band misses
    when the baseline itself trends (a rising series puts every recent
    day over a fixed band; a local-max + relative-median test doesn't).

    All four context columns (lag/lead/rolling median) share ONE
    ordered pass over the calendar-bounded day axis; the 1.05×
    threshold compares exact integers (v2*20 > med7*21 — no float
    boundary: the median of integers is at worst a .5, and scaling
    both sides to integers clears it; the margin is deliberately tight
    because relative daily noise shrinks as volume grows). Fact-table
    cost is the single day fold.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("v2")
    )
    w = Window.orderBy("day")
    wmed = Window.orderBy("day").rowsBetween(-6, 0)
    ctx = daily.select(
        "day",
        "v2",
        F.lag("v2").over(w).alias("prev"),
        F.lead("v2").over(w).alias("next"),
        F.expr("percentile(v2, 0.5)").over(wmed).alias("med7"),
    )
    return (
        ctx.where(
            F.col("prev").isNotNull()
            & F.col("next").isNotNull()
            & (F.col("v2") > F.col("prev"))
            & (F.col("v2") > F.col("next"))
            & (F.col("v2") * 20 > F.col("med7") * 21)
        )
        .select(
            "day",
            money2(F.col("v2") / 100.0).alias("total_value"),
            money2(F.col("med7") / 100.0).alias("med7"),
        )
        .orderBy("day")
    )


@register(
    "q_duplicate_charges",
    """
    WITH base AS (
        SELECT o_orderkey, o_custkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderdate
        FROM orders
    ),
    feed AS (
        SELECT * FROM base
        UNION ALL
        SELECT o_orderkey + 10000000, o_custkey, cents,
               o_orderdate + INTERVAL 1 DAY
        FROM base WHERE o_orderkey % 37 = 0
    )
    SELECT a.o_custkey,
           a.o_orderkey AS first_order, b.o_orderkey AS dup_order,
           round(a.cents / 100.0, 2) + 0 AS amount,
           CAST(datediff('day', a.o_orderdate, b.o_orderdate) AS BIGINT)
               AS gap_days
    FROM feed a JOIN feed b
      ON a.o_custkey = b.o_custkey
     AND a.cents = b.cents
     AND a.o_orderkey < b.o_orderkey
     AND b.o_orderdate >= a.o_orderdate
     AND b.o_orderdate <= a.o_orderdate + INTERVAL 2 DAY
    ORDER BY a.o_custkey, first_order, dup_order
    """,
)
def q_duplicate_charges(spark, sf_dir):
    """Duplicate-charge audit: pairs of orders by the SAME customer for
    the EXACT same amount within 2 days — the double-billing /
    double-click screen every payments team runs nightly
    (q_upsert_merge dedups exact keys; this finds near-in-time value
    collisions that exact dedup calls distinct orders). The fixture's
    uniform amounts never collide naturally, so every 37th order is
    re-fed one day later under a new key (the t_exact_dedup
    duplicate-injection convention) — the audit must recover exactly
    the injected pairs.

    The self-join keys on (custkey, exact cents) — a true equi-join on
    amount, so candidate pairs are per-(customer, amount) groups and
    the 2-day predicate rides as a post-condition (the j_theta_range
    argument: never a time-only join). Amounts compare as exact cent
    integers — float equality on money would both miss and invent
    collisions. At 100 TB fan-out is bounded by per-(cust, amount)
    multiplicity, and a date-bucketed twin (j_range_bucketed) caps hot
    pairs if needed.
    """
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderdate",
    )
    injected = base.where(F.col("o_orderkey") % 37 == 0).select(
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
        "o_custkey",
        "cents",
        (F.col("o_orderdate") + F.expr("INTERVAL 1 DAY")).alias("o_orderdate"),
    )
    feed = base.unionByName(injected)
    a, b = feed.alias("a"), feed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.cents") == F.col("b.cents"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (F.col("b.o_orderdate") >= F.col("a.o_orderdate"))
            & (
                F.col("b.o_orderdate")
                <= F.col("a.o_orderdate") + F.expr("INTERVAL 2 DAY")
            ),
        )
        .select(
            F.col("a.o_custkey").alias("o_custkey"),
            F.col("a.o_orderkey").alias("first_order"),
            F.col("b.o_orderkey").alias("dup_order"),
            money2(F.col("a.cents") / 100.0).alias("amount"),
            F.datediff(F.col("b.o_orderdate"), F.col("a.o_orderdate"))
            .cast("long")
            .alias("gap_days"),
        )
        .orderBy("o_custkey", "first_order", "dup_order")
    )


@register(
    "w_seasonal_naive_mape",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               sum(CAST(round(value * 100) AS BIGINT)) AS v2
        FROM events GROUP BY 1
    ),
    fc AS (
        SELECT day, v2,
               lag(v2, 7) OVER (ORDER BY day) AS forecast
        FROM daily
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           round(sum(CAST(round(abs(v2 - forecast) * 1e6 / v2) AS BIGINT))
                 / 1e6 / count(*), 6) + 0 AS mape,
           round(max(abs(v2 - forecast) / 100.0), 2) + 0 AS worst_abs_err
    FROM fc WHERE forecast IS NOT NULL AND v2 > 0
    """,
)
def w_seasonal_naive_mape(spark, sf_dir):
    """Seasonal-naive backtest: forecast each day with the SAME WEEKDAY
    one week earlier (lag-7), report MAPE and worst absolute error —
    the baseline every fancy forecaster must beat before it ships
    (q_forecast_revenue projects forward; this scores a method
    BACKWARD against actuals, and seasonal-naive is the canonical
    yardstick for weekly-seasonal series).

    One day-axis fold, one lag-7 window on the calendar-bounded axis;
    per-day relative errors snap to 1e-6 BIGINT units before the
    reorder-safe sum (each is ONE deterministic division on exact cent
    integers). Swapping the lag offset backtests any seasonal period
    with zero plan change.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("v2")
    )
    fc = daily.withColumn("forecast", F.lag("v2", 7).over(Window.orderBy("day")))
    err6 = F.round(
        F.abs(F.col("v2") - F.col("forecast")) * 1e6 / F.col("v2")
    ).cast("long")
    return (
        fc.where(F.col("forecast").isNotNull() & (F.col("v2") > 0))
        .agg(
            F.count("*").cast("long").alias("n_days"),
            f6(F.sum(err6) / 1e6 / F.count("*")).alias("mape"),
            money2(F.max(F.abs(F.col("v2") - F.col("forecast")) / 100.0)).alias(
                "worst_abs_err"
            ),
        )
    )


@register(
    "w_max_drawdown",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               sum(CAST(round(value * 100) AS BIGINT)) AS v2
        FROM events GROUP BY 1
    ),
    ctr AS (
        SELECT day,
               v2 - CAST(round((SELECT sum(v2) * 1.0 / count(*) FROM daily))
                    AS BIGINT) AS dv
        FROM daily
    ),
    cum AS (
        SELECT day,
               sum(dv) OVER (ORDER BY day) AS equity
        FROM ctr
    ),
    dd AS (
        SELECT day, equity,
               max(equity) OVER (ORDER BY day) AS peak
        FROM cum
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           round(max(peak - equity) / 100.0, 2) + 0 AS max_drawdown,
           round(max(CASE WHEN peak > 0
                          THEN CAST(round((peak - equity) * 1e6 / peak)
                               AS BIGINT) ELSE 0 END) / 1e6, 6) + 0
               AS max_drawdown_pct
    FROM dd
    """,
)
def w_max_drawdown(spark, sf_dir):
    """Maximum drawdown of the cumulative daily-value curve: the
    largest peak-to-trough fall, absolute and as a fraction of the
    running peak — finance's worst-case-so-far metric, and on an
    operations dashboard the deepest cumulative shortfall vs the
    best run rate (q_running_backlog tracks level; drawdown tracks
    regret against the peak).

    The equity curve cumulates CENTERED dailies (daily − overall mean,
    the w_cusum centering — a raw positive series is monotone and its
    drawdown is trivially zero), so peaks and troughs are real.
    Running sum and running max share ONE ordered pass over the
    calendar-bounded day axis; equity stays exact cent BIGINTs, and
    the percentage snaps each day's ratio to 1e-6 units before the
    max — one division per day, never a float accumulation.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("v2")
    )
    mean = daily.agg(
        F.round(F.sum("v2") * 1.0 / F.count("*")).cast("long").alias("mu")
    )
    ctr = daily.crossJoin(F.broadcast(mean)).select(
        "day", (F.col("v2") - F.col("mu")).alias("dv")
    )
    w = Window.orderBy("day")
    cum = ctr.select(
        "day", F.sum("dv").over(w).alias("equity")
    )
    dd = cum.select(
        "day",
        "equity",
        F.max("equity").over(w).alias("peak"),
    )
    pct6 = F.when(
        F.col("peak") > 0,
        F.round((F.col("peak") - F.col("equity")) * 1e6 / F.col("peak")).cast("long"),
    ).otherwise(F.lit(0))
    return dd.agg(
        F.count("*").cast("long").alias("n_days"),
        money2(F.max(F.col("peak") - F.col("equity")) / 100.0).alias("max_drawdown"),
        f6(F.max(pct6) / 1e6).alias("max_drawdown_pct"),
    )


@register(
    "w_p_chart",
    """
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS r
        FROM lineitem GROUP BY 1
    ),
    pbar AS (
        SELECT sum(r) * 1.0 / sum(n) AS p FROM daily
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           round(max(pb.p), 6) + 0 AS p_bar,
           CAST(sum(CASE WHEN d.r * 1.0 / d.n
                              > pb.p + 3 * sqrt(pb.p * (1 - pb.p) / d.n)
                           OR d.r * 1.0 / d.n
                              < pb.p - 3 * sqrt(pb.p * (1 - pb.p) / d.n)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_out_of_control
    FROM daily d CROSS JOIN pbar pb
    """,
)
def w_p_chart(spark, sf_dir):
    """p-chart (proportion control chart) on the daily return rate: each
    day's returned-lineitem fraction vs binomial 3σ limits p̄ ±
    3√(p̄(1−p̄)/n_day) — completing the SPC pair with w_control_chart
    (X-bar watches a MEAN with fixed limits; the p-chart watches a
    PROPORTION whose limits WIDEN on low-volume days, so a 3-return day
    out of 10 shipments doesn't false-alarm while the same rate on
    10,000 shipments screams).

    Day-axis fold carries exact (n, r) integer pairs; p̄ is a 1-row
    broadcast; each day's breach test uses its OWN n in the limit —
    the per-day division and sqrt are computed identically in both
    engines. A 100 TB lineitem scan reduces to |days| rows before any
    float math.
    """
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").cast("date").alias("day")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("r"),
    )
    pbar = daily.agg((F.sum("r") * 1.0 / F.sum("n")).alias("p"))
    rate = F.col("r") * 1.0 / F.col("n")
    sigma = F.sqrt(F.col("p") * (1 - F.col("p")) / F.col("n"))
    breach = (rate > F.col("p") + 3 * sigma) | (rate < F.col("p") - 3 * sigma)
    return (
        daily.crossJoin(F.broadcast(pbar))
        .agg(
            F.count("*").cast("long").alias("n_days"),
            f6(F.max("p")).alias("p_bar"),
            F.sum(F.when(breach, 1).otherwise(0))
            .cast("long")
            .alias("n_out_of_control"),
        )
    )


@register(
    "w_burn_rate",
    """
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hr,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS errs
        FROM events GROUP BY 1
    ),
    win AS (
        SELECT hr, n, errs,
               sum(errs) OVER (ORDER BY hr
                               ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
                   AS errs6,
               sum(n) OVER (ORDER BY hr
                            ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS n6
        FROM hourly
    )
    SELECT hr, CAST(errs AS BIGINT) AS errs,
           round(errs * 1.0 / n, 6) + 0 AS rate_1h,
           round(errs6 * 1.0 / n6, 6) + 0 AS rate_6h,
           round((errs * 1.0 / n) / (errs6 * 1.0 / n6), 6) + 0 AS burn_ratio
    FROM win WHERE errs6 > 0
    ORDER BY burn_ratio DESC, hr LIMIT 20
    """,
)
def w_burn_rate(spark, sf_dir):
    """Multi-window error burn rate: each hour's error rate vs its own
    trailing-6-hour rate, largest spikes first — the SRE error-budget
    alert shape (short window catches the spike, long window suppresses
    flapping; a burn_ratio ≫ 1 hour is a page, a slightly-elevated
    long window is a ticket). w_cusum watches a mean drift; this
    watches a RATE against its own recent baseline.

    The hour fold carries exact (n, errs) pairs; both trailing sums
    ride ONE ordered pass over the calendar-bounded hour axis; each
    rate is a single exact-integer division and the ratio divides the
    two identical quotients in both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hr")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("errs"),
    )
    w6 = Window.orderBy("hr").rowsBetween(-5, 0)
    win = hourly.select(
        "hr",
        "n",
        "errs",
        F.sum("errs").over(w6).alias("errs6"),
        F.sum("n").over(w6).alias("n6"),
    )
    rate1 = F.col("errs") * 1.0 / F.col("n")
    rate6 = F.col("errs6") * 1.0 / F.col("n6")
    return (
        win.where(F.col("errs6") > 0)
        .select(
            "hr",
            "errs",
            f6(rate1).alias("rate_1h"),
            f6(rate6).alias("rate_6h"),
            f6(rate1 / rate6).alias("burn_ratio"),
        )
        .orderBy(F.col("burn_ratio").desc(), "hr")
        .limit(20)
    )


@register(
    "w_twap",
    """
    WITH seq AS (
        SELECT user_id, ts,
               CAST(round(value * 100) AS BIGINT) AS cents,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS next_ts
        FROM events
    ),
    held AS (
        SELECT user_id, cents,
               epoch_us(next_ts) - epoch_us(ts) AS held_us
        FROM seq WHERE next_ts IS NOT NULL
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           round(sum(cents * held_us) * 1.0 / sum(held_us) / 100.0, 6) + 0
               AS twap
    FROM held
    GROUP BY user_id
    ORDER BY user_id LIMIT 50
    """,
)
def w_twap(spark, sf_dir):
    """Time-weighted average (TWAP): each observation holds until the
    next one, weighted by its holding duration — the correct average
    for step-wise signals (prices, sensor states, feature values
    between updates), where the arithmetic mean over-counts bursty
    periods (10 readings in one minute ≠ 10 minutes of that value).

    One lead() per user gives exact integer-µs holding times off the
    same user clustering the rollup reuses; cents × µs products stay
    in BIGINT (≤ 5e4 × 9e12 ≈ 4.5e17 per interval — inside int64 with
    room), so the weighted sum is reorder-safe and the single division
    lands once per user. The last observation per user carries no
    duration and is excluded (documented open-interval convention).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).withColumn("next_ts", F.lead("ts").over(w))
    held = seq.where(F.col("next_ts").isNotNull()).select(
        "user_id",
        "cents",
        (F.unix_micros("next_ts") - F.unix_micros("ts")).alias("held_us"),
    )
    return (
        held.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_intervals"),
            f6(
                F.sum(F.col("cents") * F.col("held_us")) * 1.0
                / F.sum("held_us")
                / 100.0
            ).alias("twap"),
        )
        .orderBy("user_id")
        .limit(50)
    )


@register(
    "j_interval_overlap",
    """
    WITH sess AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts, event_id) IS NULL
                         OR ts - lag(ts) OVER (PARTITION BY user_id, event_type
                                               ORDER BY ts, event_id)
                            > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events WHERE event_type IN ('view', 'click')
    ),
    sid AS (
        SELECT user_id, event_type, ts,
               sum(brk) OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS s
        FROM sess
    ),
    iv AS (
        SELECT user_id, event_type,
               epoch_us(min(ts)) AS lo,
               epoch_us(max(ts)) + 1800000000 AS hi
        FROM sid GROUP BY user_id, event_type, s
    ),
    ov AS (
        SELECT v.user_id,
               greatest(CAST(least(v.hi, c.hi) - greatest(v.lo, c.lo)
                             AS BIGINT), 0) AS olap_us
        FROM iv v JOIN iv c
          ON c.user_id = v.user_id
         AND v.event_type = 'view' AND c.event_type = 'click'
         AND c.lo < v.hi AND v.lo < c.hi
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_overlaps,
           round(sum(olap_us) / 60e6, 6) + 0 AS co_active_minutes
    FROM ov GROUP BY user_id
    ORDER BY co_active_minutes DESC, user_id LIMIT 20
    """,
)
def j_interval_overlap(spark, sf_dir):
    """Interval-overlap aggregation: total co-active time between each
    user's VIEW sessions and CLICK sessions (30-min-gap islands per
    type, then pairwise interval intersection) — the interval-algebra
    operator behind concurrency billing, device co-usage, and
    'attention overlap' metrics; j_theta_range joins point-to-interval,
    this intersects interval SETS and sums the measure.

    Per-type sessions reuse the islands machinery on one (user, type)
    clustering; the overlap join keys on user_id with the interval
    predicate as a post-condition (bounded: sessions-per-user ×
    sessions-per-user, both gap-compressed); intersection lengths are
    exact integer µs via least/greatest, and only the final
    minutes conversion divides. At 100 TB the session compression IS
    the scalability: raw events never pair, intervals do.
    """
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "click")
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    sess = ev.withColumn(
        "brk",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
                > 1800000000
            ),
            1,
        ).otherwise(0),
    )
    sid = sess.withColumn(
        "s",
        F.sum("brk").over(
            Window.partitionBy("user_id", "event_type")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    iv = sid.groupBy("user_id", "event_type", "s").agg(
        F.unix_micros(F.min("ts")).alias("lo"),
        (F.unix_micros(F.max("ts")) + F.lit(1800000000)).alias("hi"),
    )
    v = iv.where(F.col("event_type") == "view").select(
        "user_id", F.col("lo").alias("vlo"), F.col("hi").alias("vhi")
    )
    c = iv.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("lo").alias("clo"),
        F.col("hi").alias("chi"),
    )
    ov = v.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("clo") < F.col("vhi"))
        & (F.col("vlo") < F.col("chi")),
    ).select(
        "user_id",
        F.greatest(
            (
                F.least(F.col("vhi"), F.col("chi"))
                - F.greatest(F.col("vlo"), F.col("clo"))
            ).cast("long"),
            F.lit(0),
        ).alias("olap_us"),
    )
    return (
        ov.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_overlaps"),
            f6(F.sum("olap_us") / 60e6).alias("co_active_minutes"),
        )
        .orderBy(F.col("co_active_minutes").desc(), "user_id")
        .limit(20)
    )


@register(
    "q_join_hints",
    """
    SELECT n_nationkey, CAST(count(*) AS BIGINT) AS n_customers
    FROM customer JOIN nation ON n_nationkey = c_nationkey
    GROUP BY n_nationkey ORDER BY n_nationkey
    """,
)
def q_join_hints(spark, sf_dir):
    """Join-strategy HINTS: the same customer⋈nation join planned twice
    — once under /*+ BROADCAST(nation) */, once under
    /*+ MERGE(nation) */ — with identical results demanded of both
    (hints steer the PLANNER, never the SEMANTICS; a hint that changes
    an answer is a bug report). The escape hatch for when statistics
    mislead the optimizer: a hint is one line, a config change is a
    blast radius.

    The returned frame is the broadcast-hinted census (the right plan
    here); the merge-hinted twin is built and asserted EQUAL inside
    tests/test_plans.py, which also pins that the two hints really
    produced BroadcastHashJoin vs SortMergeJoin respectively — the
    plan divergence IS the feature under test.
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cust.createOrReplaceTempView("hint_cust")
    nation.createOrReplaceTempView("hint_nation")
    return spark.sql(
        """
        SELECT /*+ BROADCAST(hint_nation) */ n_nationkey,
               CAST(count(*) AS BIGINT) AS n_customers
        FROM hint_cust JOIN hint_nation ON n_nationkey = c_nationkey
        GROUP BY n_nationkey ORDER BY n_nationkey
        """
    )


@register(
    "q_kaplan_meier",
    """
    WITH bounds AS (SELECT max(o_orderdate) AS tmax FROM orders),
    life AS (
        SELECT o_custkey,
               CAST(datediff('day', min(o_orderdate), max(o_orderdate))
                    AS BIGINT) AS t,
               CASE WHEN datediff('day', max(o_orderdate),
                                  (SELECT tmax FROM bounds)) > 90
                    THEN 1 ELSE 0 END AS died
        FROM orders GROUP BY o_custkey
    ),
    counts AS (
        SELECT t, CAST(count(*) AS BIGINT) AS c,
               CAST(sum(died) AS BIGINT) AS d
        FROM life GROUP BY t
    ),
    at_risk AS (
        SELECT t, d,
               sum(c) OVER (ORDER BY t DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS n
        FROM counts
    ),
    km AS (
        SELECT t, d, n,
               sum(CAST(round(ln(1.0 - d * 1.0 / n) * 1e12) AS BIGINT))
                   OVER (ORDER BY t) AS logs12
        FROM at_risk WHERE d > 0 AND d < n
    )
    SELECT t AS day, d AS n_churned, CAST(n AS BIGINT) AS n_at_risk,
           round(exp(logs12 / 1e12), 6) + 0 AS survival
    FROM km
    ORDER BY day DESC LIMIT 25
    """,
)
def q_kaplan_meier(spark, sf_dir):
    """Kaplan-Meier survival of customer ORDER activity with
    right-censoring: a customer "dies" when their last order precedes
    the observation end by >90 days (dormancy, the q_dormant_customers
    boundary); recently-active customers are CENSORED — still alive,
    we just stopped watching. q_survival_curve counts every quiet user
    as dead and so underestimates survival near the boundary; KM's
    product-limit S(t) = Π(1 − dᵢ/nᵢ) keeps censored customers in the
    risk set for as long as they were observed — the gap between the
    two curves IS the censoring bias. Output: the 25 latest event
    times on the curve.

    Lifetimes and death flags fold per customer (the horizon is a
    broadcast scalar); at-risk counts are a reverse cumulative sum
    over the lifetime axis; the product becomes a running SUM of
    ln(1−d/n) terms snapped to 1e-12 BIGINT units (exact,
    reorder-safe — the multiplicative twin of w_cusum's additive
    trick) with one exp() per output row. The event-time axis is
    calendar-bounded at any order volume.
    """
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(F.max("o_orderdate").alias("tmax"))
    life = (
        orders.groupBy("o_custkey")
        .agg(F.min("o_orderdate").alias("t0"), F.max("o_orderdate").alias("t1"))
        .crossJoin(F.broadcast(bounds))
        .select(
            F.datediff(F.col("t1"), F.col("t0")).cast("long").alias("t"),
            F.when(F.datediff(F.col("tmax"), F.col("t1")) > 90, 1)
            .otherwise(0)
            .alias("died"),
        )
    )
    counts = life.groupBy("t").agg(
        F.count("*").cast("long").alias("c"),
        F.sum("died").cast("long").alias("d"),
    )
    w_rev = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    at_risk = counts.select("t", "d", F.sum("c").over(w_rev).alias("n"))
    risk = at_risk.where((F.col("d") > 0) & (F.col("d") < F.col("n")))
    log12 = F.round(F.log(1.0 - F.col("d") * 1.0 / F.col("n")) * 1e12).cast("long")
    km = risk.select(
        "t", "d", "n", F.sum(log12).over(Window.orderBy("t")).alias("logs12")
    )
    return (
        km.select(
            F.col("t").alias("day"),
            F.col("d").alias("n_churned"),
            F.col("n").cast("long").alias("n_at_risk"),
            f6(F.exp(F.col("logs12") / 1e12)).alias("survival"),
        )
        .orderBy(F.col("day").desc())
        .limit(25)
    )


@register(
    "w_rolling_corr",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               sum(CASE WHEN event_type = 'purchase'
                        THEN CAST(round(value * 100) AS BIGINT)
                        ELSE 0 END) AS x,
               sum(CASE WHEN event_type = 'view'
                        THEN CAST(round(value * 100) AS BIGINT)
                        ELSE 0 END) AS y
        FROM events GROUP BY 1
    ),
    roll AS (
        SELECT day,
               CAST(count(*) OVER w AS BIGINT) AS n,
               sum(x) OVER w AS sx, sum(y) OVER w AS sy,
               sum(x * y) OVER w AS sxy,
               sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)),
                 6) + 0 AS corr14
    FROM roll
    WHERE n >= 14
      AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
    ORDER BY day LIMIT 50
    """,
)
def w_rolling_corr(spark, sf_dir):
    """Rolling 14-day correlation between daily purchase and view
    revenue — the time-varying-relationship monitor: a stable
    cross-metric correlation that suddenly decays often flags an
    instrumentation break in ONE of the streams before either stream's
    own level alarms (a_corr_regr gives the global number; rolling
    shows WHEN the relationship held). The frame is 14 days — sized to
    the fixture's ~1-month span; at production span it's one literal.

    Five rolling moment sums over exact cent integers share ONE
    14-row frame on the calendar-bounded day axis; Pearson assembles
    from those sums per row (the a_spearman_corr moment pattern,
    windowed) — no streaming corr() state, and every operand that can
    accumulate is a BIGINT. Degenerate windows (zero variance) are
    filtered by exact integer tests, not float epsilons.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        ).alias("x"),
        F.sum(
            F.when(
                F.col("event_type") == "view",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        ).alias("y"),
    )
    w = Window.orderBy("day").rowsBetween(-13, 0)
    roll = daily.select(
        "day",
        F.count("*").over(w).cast("long").alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) * F.sqrt(
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    )
    return (
        roll.where(
            (F.col("n") >= 14)
            & (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
            & (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy") > 0)
        )
        .select("day", f6(num / den).alias("corr14"))
        .orderBy("day")
        .limit(50)
    )


@register(
    "q_bounce_rate",
    """
    WITH o AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) IS NULL
                         OR ts - lag(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id)
                            > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events
    ),
    s AS (
        SELECT user_id,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM o
    ),
    sess AS (
        SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_events
        FROM s GROUP BY user_id, sid
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounces,
           round(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) + 0 AS bounce_rate
    FROM sess
    """,
)
def q_bounce_rate(spark, sf_dir):
    """Bounce rate: fraction of 30-min-gap sessions containing exactly
    ONE event — the single most-watched engagement-quality number on a
    web dashboard, and the canary for broken landing pages (traffic
    holds, bounces spike). Composes the w_sessionize islands machinery
    down to one scalar with its numerator (w_sessionize reports the
    sessions; this grades them).

    Session ids derive from the same single user-keyed ordered pass as
    every sessionization in this engine; the session-size fold and the
    bounce census are exact integer counts into one division. At
    100 TB: one user shuffle, then counters.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
                > 1800000000
            ),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    s = o.select(
        "user_id",
        F.sum("brk")
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("sid"),
    )
    sess = s.groupBy("user_id", "sid").agg(
        F.count("*").cast("long").alias("n_events")
    )
    return sess.agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_bounces"),
        f6(
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)) * 1.0
            / F.count("*")
        ).alias("bounce_rate"),
    )


@register(
    "q_peak_concurrency",
    """
    WITH o AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) IS NULL
                         OR ts - lag(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id)
                            > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events
    ),
    s AS (
        SELECT user_id, ts,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM o
    ),
    sess AS (
        SELECT user_id, min(ts) AS t0,
               max(ts) + INTERVAL 30 MINUTE AS t1
        FROM s GROUP BY user_id, sid
    ),
    deltas AS (
        SELECT t0 AS t, 1 AS delta FROM sess
        UNION ALL
        SELECT t1 AS t, -1 AS delta FROM sess
    ),
    sweep AS (
        SELECT t,
               sum(delta) OVER (ORDER BY t, delta
                                ROWS UNBOUNDED PRECEDING) AS open_now
        FROM deltas
    )
    SELECT CAST(max(open_now) AS BIGINT) AS peak_concurrent,
           CAST((SELECT count(*) FROM sess) AS BIGINT) AS n_sessions
    FROM sweep
    """,
)
def q_peak_concurrency(spark, sf_dir):
    """Peak concurrency: the maximum number of simultaneously-open
    sessions — the sweep-line algorithm in SQL (+1 at each session
    start, −1 at each end, running sum, take the max). THE capacity
    number: licenses, connection pools, and autoscaling floors are all
    sized to it, and averages hide it completely (w_sessionize counts
    sessions; this counts their OVERLAP).

    Sessions come from the shared islands machinery; the sweep runs
    over the 2×|sessions| delta-event axis, ordered (t, delta) so
    closes sort before opens at the same instant (touching sessions
    don't double-count). The running sum is exact integers; output is
    two counters from any event volume.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
                > 1800000000
            ),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    s = o.select(
        "user_id",
        "ts",
        F.sum("brk")
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("sid"),
    )
    sess = s.groupBy("user_id", "sid").agg(
        F.min("ts").alias("t0"),
        (F.max("ts") + F.expr("INTERVAL 30 MINUTE")).alias("t1"),
    )
    deltas = sess.select(F.col("t0").alias("t"), F.lit(1).alias("delta")).unionByName(
        sess.select(F.col("t1").alias("t"), F.lit(-1).alias("delta"))
    )
    sweep = deltas.select(
        F.sum("delta")
        .over(Window.orderBy("t", "delta").rowsBetween(Window.unboundedPreceding, 0))
        .alias("open_now")
    )
    n_sess = sess.agg(F.count("*").cast("long").alias("n_sessions"))
    return (
        sweep.agg(F.max("open_now").cast("long").alias("peak_concurrent"))
        .crossJoin(F.broadcast(n_sess))
    )


@register(
    "q_hazard_curve",
    """
    WITH bounds AS (SELECT max(o_orderdate) AS tmax FROM orders),
    life AS (
        SELECT CAST(datediff('day', min(o_orderdate), max(o_orderdate))
                    AS BIGINT) // 90 AS q,
               CASE WHEN datediff('day', max(o_orderdate),
                                  (SELECT tmax FROM bounds)) > 90
                    THEN 1 ELSE 0 END AS died
        FROM orders GROUP BY o_custkey
    ),
    counts AS (
        SELECT q, CAST(count(*) AS BIGINT) AS c,
               CAST(sum(died) AS BIGINT) AS d
        FROM life GROUP BY q
    ),
    at_risk AS (
        SELECT q, d,
               sum(c) OVER (ORDER BY q DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS n
        FROM counts
    )
    SELECT q AS quarter, d AS n_churned, CAST(n AS BIGINT) AS n_at_risk,
           round(d * 1.0 / n, 6) + 0 AS hazard
    FROM at_risk
    WHERE d > 0
    ORDER BY quarter
    """,
)
def q_hazard_curve(spark, sf_dir):
    """Discrete hazard rate h(q) = churned(q)/at-risk(q) by customer-
    lifetime QUARTER — the derivative view of q_kaplan_meier: survival
    says how many remain, hazard says WHEN the risk spikes (an early-
    quarter hazard peak means onboarding loses them; a late plateau
    means contracts expire). Same censoring rule as KM (90-day
    dormancy), lifetimes bucketed to 90-day quarters so each cell has
    statistical mass.

    Per-customer fold → quarter-axis counts → reverse-cumulative
    at-risk (the KM ingredient, surfaced instead of folded into the
    product); hazard is one exact-integer division per quarter row.
    The axis is lifetime-bounded (~30 quarters) at any order volume.
    """
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(F.max("o_orderdate").alias("tmax"))
    life = (
        orders.groupBy("o_custkey")
        .agg(F.min("o_orderdate").alias("t0"), F.max("o_orderdate").alias("t1"))
        .crossJoin(F.broadcast(bounds))
        .select(
            F.floor(F.datediff(F.col("t1"), F.col("t0")) / 90)
            .cast("long")
            .alias("q"),
            F.when(F.datediff(F.col("tmax"), F.col("t1")) > 90, 1)
            .otherwise(0)
            .alias("died"),
        )
    )
    counts = life.groupBy("q").agg(
        F.count("*").cast("long").alias("c"),
        F.sum("died").cast("long").alias("d"),
    )
    w_rev = Window.orderBy(F.col("q").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    at_risk = counts.select("q", "d", F.sum("c").over(w_rev).alias("n"))
    return (
        at_risk.where(F.col("d") > 0)
        .select(
            F.col("q").alias("quarter"),
            F.col("d").alias("n_churned"),
            F.col("n").cast("long").alias("n_at_risk"),
            f6(F.col("d") * 1.0 / F.col("n")).alias("hazard"),
        )
        .orderBy("quarter")
    )


@register(
    "w_mtd_pace",
    """
    WITH daily AS (
        SELECT date_trunc('month', o_orderdate) AS mon,
               CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS dom,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders GROUP BY 1, 2
    ),
    mtd AS (
        SELECT mon, dom,
               sum(cents) OVER (PARTITION BY mon ORDER BY dom) AS mtd_cents
        FROM daily
    ),
    paced AS (
        SELECT cur.mon, cur.dom,
               cur.mtd_cents,
               prev.mtd_cents AS prev_mtd_cents
        FROM mtd cur
        JOIN mtd prev
          ON prev.mon = cur.mon - INTERVAL 1 MONTH AND prev.dom = cur.dom
    )
    SELECT CAST(mon AS DATE) AS mon, dom,
           round(mtd_cents / 100.0, 2) + 0 AS mtd,
           round(prev_mtd_cents / 100.0, 2) + 0 AS prev_mtd,
           round(mtd_cents * 1.0 / prev_mtd_cents, 6) + 0 AS pace
    FROM paced
    WHERE dom = 15
    ORDER BY mon LIMIT 24
    """,
)
def w_mtd_pace(spark, sf_dir):
    """Month-to-date pacing: cumulative revenue at day N of this month
    vs the SAME day of last month — the FP&A mid-month report that
    answers 'are we ahead?' while the month can still be influenced
    (q_yoy_growth compares CLOSED periods; pace compares open ones at
    matched completeness, which is the only fair mid-period compare).
    Sampled at day 15 of each month.

    Daily cents fold exactly; the MTD cumsum partitions by month; the
    pace join matches (month-1, same day-of-month) by calendar
    arithmetic — an equi-join on derived keys, no self-window. Axes
    are calendar-bounded throughout; one division per output row.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("mon"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    mtd = daily.select(
        "mon",
        "dom",
        F.sum("cents")
        .over(Window.partitionBy("mon").orderBy("dom"))
        .alias("mtd_cents"),
    )
    cur = mtd.alias("cur")
    prev = mtd.select(
        (F.col("mon") + F.expr("INTERVAL 1 MONTH")).alias("nmon"),
        F.col("dom").alias("pdom"),
        F.col("mtd_cents").alias("prev_mtd_cents"),
    )
    paced = cur.join(
        prev,
        (F.col("nmon") == F.col("mon")) & (F.col("pdom") == F.col("dom")),
    )
    return (
        paced.where(F.col("dom") == 15)
        .select(
            F.col("mon").cast("date").alias("mon"),
            "dom",
            money2(F.col("mtd_cents") / 100.0).alias("mtd"),
            money2(F.col("prev_mtd_cents") / 100.0).alias("prev_mtd"),
            f6(F.col("mtd_cents") * 1.0 / F.col("prev_mtd_cents")).alias("pace"),
        )
        .orderBy("mon")
        .limit(24)
    )


@register(
    "q_sequence_inversions",
    """
    WITH seq AS (
        SELECT user_id, event_id, ts,
               lead(event_id) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_id
        FROM events
    )
    SELECT CAST(count(*) AS BIGINT) AS n_adjacent_pairs,
           CAST(sum(CASE WHEN next_id < event_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_inversions,
           round(sum(CASE WHEN next_id < event_id THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) + 0 AS inversion_rate
    FROM seq WHERE next_id IS NOT NULL
    """,
)
def q_sequence_inversions(spark, sf_dir):
    """Clock-skew audit: adjacent event pairs (time-ordered per user)
    where the LATER timestamp carries the SMALLER event id — each one
    is a producer whose sequence counter and clock disagree (buffered
    flushes, NTP steps, multi-writer id races). Event-time pipelines
    (st_watermark, j_asof, w_sessionize) silently reorder these; the
    audit makes the rate visible BEFORE it becomes a correctness
    mystery.

    One user-keyed ordered pass (lead) — the same clustering every
    sessionizer uses, here emitting three counters instead of
    sessions. Adjacent-pair inversions undercount full Kendall
    inversions but are linear-cost and catch every LOCAL disorder,
    which is what buffering produces. At 100 TB: one shuffle, three
    numbers.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_id", F.lead("event_id").over(w).alias("next_id")
    ).where(F.col("next_id").isNotNull())
    inv = F.when(F.col("next_id") < F.col("event_id"), 1).otherwise(0)
    return seq.agg(
        F.count("*").cast("long").alias("n_adjacent_pairs"),
        F.sum(inv).cast("long").alias("n_inversions"),
        f6(F.sum(inv) * 1.0 / F.count("*")).alias("inversion_rate"),
    )


def _markov_iter_sql(tname: str, cur: int, nxt: int) -> str:
    """One absorption-value iteration over the bounded state space."""
    return f"""
    v{tname}{nxt} AS (
        SELECT s.state,
               CASE WHEN s.state = 'purchase' THEN 1.0
                    WHEN s.state = '__null' THEN 0.0
                    ELSE round(coalesce(sum(t.p * v.val), 0), 9)
               END AS val
        FROM states s
        LEFT JOIN {tname} t ON t.src = s.state
        LEFT JOIN v{tname}{cur} v ON v.state = t.dst
        GROUP BY s.state
    )"""


def _markov_sql() -> str:
    channels = ["click", "error", "signup", "view"]
    base = """
    WITH firstp AS (
        SELECT user_id, min(ts) AS pts FROM events
        WHERE event_type = 'purchase' GROUP BY user_id
    ),
    path AS (
        SELECT e.user_id, e.ts, e.event_id, e.event_type
        FROM events e LEFT JOIN firstp f ON f.user_id = e.user_id
        WHERE f.pts IS NULL OR e.ts <= f.pts
    ),
    ordered AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM path
    ),
    trans_raw AS (
        SELECT 'start' AS src, event_type AS dst FROM ordered WHERE rn = 1
        UNION ALL
        SELECT event_type AS src, coalesce(nxt, '__null') AS dst
        FROM ordered WHERE event_type <> 'purchase'
    ),
    t AS (
        SELECT src, dst,
               count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY src) AS p
        FROM trans_raw GROUP BY src, dst
    ),
    states AS (SELECT unnest(['start', 'click', 'error', 'signup', 'view',
                              'purchase', '__null']) AS state),
    vt0 AS (SELECT state,
                   CASE WHEN state = 'purchase' THEN 1.0 ELSE 0.0 END AS val
            FROM states)"""
    parts = [base]
    for k in range(6):
        parts.append("," + _markov_iter_sql("t", k, k + 1))
    for ch in channels:
        parts.append(f""",
    t_{ch} AS (
        SELECT src,
               CASE WHEN dst = '{ch}' THEN '__null' ELSE dst END AS dst,
               sum(p) AS p
        FROM t WHERE src <> '{ch}' GROUP BY 1, 2
    ),
    vt_{ch}0 AS (SELECT state,
                        CASE WHEN state = 'purchase' THEN 1.0 ELSE 0.0 END
                            AS val
                 FROM states)""")
        for k in range(6):
            parts.append("," + _markov_iter_sql(f"t_{ch}", k, k + 1))
    union = "\n        UNION ALL\n".join(
        f"""        SELECT '{ch}' AS channel,
               (SELECT val FROM vt6 WHERE state = 'start') AS p_base,
               (SELECT val FROM vt_{ch}6 WHERE state = 'start') AS p_removed"""
        for ch in channels
    )
    parts.append(f""",
    eff AS (
{union}
    ),
    scored AS (
        SELECT channel, p_base, p_removed,
               round((p_base - p_removed) / p_base, 9) AS re
        FROM eff
    )
    SELECT channel, round(p_base, 6) + 0 AS p_base,
           round(p_removed, 6) + 0 AS p_removed,
           round(re, 6) + 0 AS removal_effect,
           round(re / sum(re) OVER (), 6) + 0 AS attribution
    FROM scored ORDER BY channel""")
    return "".join(parts)


def _rhu(x: float, n: int) -> float:
    """Half-AWAY-from-zero round, matching SQL round() semantics.

    Python's round() is banker's (half-to-even); the DuckDB oracle's
    round() is half-away. A value landing exactly on a half boundary
    at the snap precision would diverge across engines under round()
    — everywhere else the repo pairs F.round (HALF_UP) with SQL
    round, and driver-side arithmetic must match that convention.
    """
    import math

    scaled = x * 10**n
    return (
        math.floor(scaled + 0.5) if scaled >= 0 else math.ceil(scaled - 0.5)
    ) / 10**n


@register("q_attribution_markov", _markov_sql())
def q_attribution_markov(spark, sf_dir):
    """Markov removal-effect attribution — the data-driven successor to
    q_attribution_last_touch: model each user's pre-conversion journey
    as a first-order Markov chain (start -> {click, error, signup,
    view} -> ... -> purchase | abandon), and credit each channel by how
    much the conversion probability DROPS when that channel is removed
    (its transitions redirected to abandonment) — Shapley-flavored
    credit from observed dynamics instead of position heuristics.

    The division of labor is the point: transition COUNTS are the only
    data-scale computation (one window pass over user journeys
    truncated at first purchase, one groupBy — both user_id-keyed),
    while the chain itself lives on a BOUNDED state space (6 sources x
    7 destinations), so the absorption solve is metadata-scale by
    construction. Both engines run the identical 6 unrolled value
    iterations (v_{{k+1}}(s) = sum_t p(s,t)·v_k(t), absorbing states
    pinned, 9dp snap per iteration) on that bounded matrix — Spark
    collects the <=36-row matrix to the driver exactly like the
    DESCRIBE-metadata pattern (at 100 TB it is still <=36 rows) and
    replays the same arithmetic, so the driver never touches row-scale
    data and the oracle hash covers the full pipeline end to end.
    """
    channels = ["click", "error", "signup", "view"]
    ev = load_table(spark, sf_dir, "events")
    firstp = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    path = ev.join(firstp, "user_id", "left").where(
        F.col("pts").isNull() | (F.col("ts") <= F.col("pts"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = path.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.lead("event_type").over(w).alias("nxt"),
    )
    trans_raw = (
        ordered.where(F.col("rn") == 1)
        .select(F.lit("start").alias("src"), F.col("event_type").alias("dst"))
        .unionByName(
            ordered.where(F.col("event_type") != "purchase").select(
                F.col("event_type").alias("src"),
                F.coalesce("nxt", F.lit("__null")).alias("dst"),
            )
        )
    )
    wsrc = Window.partitionBy("src")
    t_rows = (
        trans_raw.groupBy("src", "dst")
        .agg(F.count("*").alias("c"))
        .select(
            "src", "dst", (F.col("c") * 1.0 / F.sum("c").over(wsrc)).alias("p")
        )
        .collect()  # bounded: <= 6 sources x 7 destinations at ANY scale
    )
    trans = {}
    for r in t_rows:
        trans.setdefault(r["src"], []).append((r["dst"], r["p"]))

    states = ["start", "click", "error", "signup", "view", "purchase", "__null"]

    def absorb(tmap):
        val = {s: (1.0 if s == "purchase" else 0.0) for s in states}
        for _ in range(6):
            nxt = {}
            for s in states:
                if s == "purchase":
                    nxt[s] = 1.0
                elif s == "__null":
                    nxt[s] = 0.0
                else:
                    # sorted dst order: same 9dp result as the SQL sum.
                    # val.get(d, 0.0): a dst OUTSIDE the 7-state chain
                    # (event types beyond the modeled channels, e.g. the
                    # ladder corpus's extra types) contributes nothing —
                    # exactly what the oracle's vt join does by dropping
                    # the row; adding literal 0.0 terms leaves the FP
                    # sum bit-identical.
                    nxt[s] = _rhu(
                        sum(
                            p * val.get(d, 0.0)
                            for d, p in sorted(tmap.get(s, []))
                        ),
                        9,
                    )
            val = nxt
        return val["start"]

    p_base = absorb(trans)
    rows = []
    for ch in channels:
        tmap = {
            src: [
                ("__null" if dst == ch else dst, p)
                for dst, p in dsts
            ]
            for src, dsts in trans.items()
            if src != ch
        }
        # re-aggregate duplicate (src, '__null') entries like the SQL GROUP BY
        merged = {}
        for src, dsts in tmap.items():
            agg = {}
            for dst, p in dsts:
                agg[dst] = agg.get(dst, 0.0) + p
            merged[src] = list(agg.items())
        p_removed = absorb(merged)
        rows.append((ch, p_base, p_removed, _rhu((p_base - p_removed) / p_base, 9)))
    total_re = sum(r[3] for r in rows)
    out = spark.createDataFrame(
        [
            (ch, _rhu(pb, 6), _rhu(pr, 6), _rhu(re, 6), _rhu(re / total_re, 6))
            for ch, pb, pr, re in rows
        ],
        "channel string, p_base double, p_removed double,"
        " removal_effect double, attribution double",
    )
    return out.orderBy("channel")


@register(
    "q_scd2_snapshot",
    """
    WITH v AS (
        SELECT user_id, event_type AS state, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS valid_to,
               CAST(row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id)
                    AS BIGINT) AS version_no
        FROM events
    )
    SELECT user_id, state, valid_from, version_no,
           CAST(date_diff('second', valid_from,
                          TIMESTAMP '2024-02-01 00:00:00') AS BIGINT)
               AS age_seconds
    FROM v
    WHERE valid_from <= TIMESTAMP '2024-02-01 00:00:00'
      AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-02-01 00:00:00')
    ORDER BY user_id
    """,
)
def q_scd2_snapshot(spark, sf_dir):
    """Slowly-changing-dimension type 2, built and queried: the change
    log (each user's event stream, event_type standing in for the
    tracked attribute) becomes versioned rows with [valid_from,
    valid_to) intervals via ONE lead() pass, then the as-of snapshot
    'what was each user's state at T' is a pure interval-containment
    filter — the warehouse pattern behind every point-in-time customer
    dimension, and the batch-build complement to j_asof (which probes
    an existing versioned table; this MAKES one).

    The interval build needs no self-join and no grouping: lead() over
    the (user_id)-partitioned, (ts, event_id)-ordered window is the
    whole algorithm, one shuffle on user_id. The snapshot predicate
    keeps exactly one version per user active at T (half-open
    intervals make the boundary unambiguous; the open-ended current
    version handles users with no later change). At 100 TB the
    versioned table writes out partitioned by valid_from date, so any
    as-of query partition-prunes to history ≤ T.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t_snap = F.lit("2024-02-01 00:00:00").cast("timestamp")
    v = ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).cast("long").alias("version_no"),
    )
    return (
        v.where(
            (F.col("valid_from") <= t_snap)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > t_snap))
        )
        .select(
            "user_id",
            "state",
            "valid_from",
            "version_no",
            (
                F.unix_timestamp(t_snap) - F.unix_timestamp("valid_from")
            )
            .cast("long")
            .alias("age_seconds"),
        )
        .orderBy("user_id")
    )


@register(
    "q_repeat_purchase_rate",
    """
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS cohort,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT cohort,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_repeat,
           round(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) + 0 AS repeat_rate,
           round(sum(n_orders) * 1.0 / count(*), 6) + 0
               AS avg_orders_per_customer
    FROM per_cust GROUP BY cohort ORDER BY cohort
    """,
)
def q_repeat_purchase_rate(spark, sf_dir):
    """Repeat-purchase rate by acquisition cohort — the retention
    metric every subscription/commerce dashboard leads with: group
    customers by their first-order month and report what share ever
    ordered again (vs q_retention_cohort's period-by-period grid,
    this is the single-number summary an exec reads; vs
    q_new_vs_returning's calendar view, this follows the COHORT).

    One customer-keyed aggregate builds (cohort, n_orders) per
    customer — min and count fold in the same partial pass — then a
    bounded month-keyed rollup. Integer counts throughout; the two
    ratios divide once at the end. Two shuffles total, the second
    over |months| keys, at any order count.
    """
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.trunc(F.min("o_orderdate"), "month").alias("cohort"),
        F.count("*").cast("long").alias("n_orders"),
    )
    rep = F.when(F.col("n_orders") >= 2, 1).otherwise(0)
    return (
        per_cust.groupBy("cohort")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum(rep).cast("long").alias("n_repeat"),
            f6(F.sum(rep) * 1.0 / F.count("*")).alias("repeat_rate"),
            f6(F.sum("n_orders") * 1.0 / F.count("*")).alias(
                "avg_orders_per_customer"
            ),
        )
        .orderBy("cohort")
    )


@register(
    "q_velocity_rules",
    """
    WITH p AS (
        SELECT user_id, ts, event_id,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    r1 AS (
        SELECT user_id,
               max(CASE WHEN cnt60 >= 3 THEN 1 ELSE 0 END) AS hit
        FROM (
            SELECT user_id,
                   count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                                  RANGE BETWEEN 3600000000 PRECEDING
                                           AND CURRENT ROW) AS cnt60
            FROM p
        ) GROUP BY user_id
    ),
    med AS (
        SELECT user_id, cents,
               2 * sum(cents) OVER (PARTITION BY user_id) AS t2,
               CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
        FROM p
    ),
    r2 AS (
        SELECT user_id,
               max(CASE WHEN cents * n * 2 > t2 * 3 THEN 1 ELSE 0 END) AS hit
        FROM med GROUP BY user_id
    ),
    gaps AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM p
    ),
    r3 AS (
        SELECT user_id,
               max(CASE WHEN gap_us >= 30 * 86400000000 THEN 1 ELSE 0 END)
                   AS hit
        FROM gaps GROUP BY user_id
    )
    SELECT 'burst_3_in_60min' AS rule,
           CAST(sum(hit) AS BIGINT) AS n_flagged,
           CAST(min(CASE WHEN hit = 1 THEN user_id END) AS BIGINT)
               AS first_user
    FROM r1
    UNION ALL
    SELECT 'spend_3x_own_mean', CAST(sum(hit) AS BIGINT),
           CAST(min(CASE WHEN hit = 1 THEN user_id END) AS BIGINT) FROM r2
    UNION ALL
    SELECT 'dormancy_reactivation', CAST(sum(hit) AS BIGINT),
           CAST(min(CASE WHEN hit = 1 THEN user_id END) AS BIGINT) FROM r3
    ORDER BY rule
    """,
)
def q_velocity_rules(spark, sf_dir):
    """Velocity rule engine — the fraud/abuse decisioning pass every
    payments pipeline runs: three archetypal rules over the purchase
    stream, reported as a per-rule flagged census with a first-offender
    id for triage. (1) BURST: ≥3 purchases inside any sliding 60-minute
    window — a RANGE frame over event-time microseconds, the exact
    sliding-count semantics st_sliding streams; (2) OUTLIER SPEND: any
    purchase over 3× the user's own mean, tested by integer
    cross-multiplication (cents·n·2 > 2Σ·3 — no float mean, no
    division); (3) DORMANCY REACTIVATION: a purchase after ≥30 days of
    silence (lag gap) — the account-takeover tell.

    All three rules ride ONE user_id exchange (three windows over the
    same partitioning — Spark reuses the sort); per-rule rollups are
    map-side partial max/sum. Output is 3 rows at any scale. The same
    shape extends to N rules by adding window expressions, not jobs —
    which is why rule engines belong in the engine, not in a per-event
    microservice.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    us = F.unix_micros(F.col("ts"))
    w60 = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3600000000, Window.currentRow)
    )
    r1 = (
        p.select("user_id", F.count("*").over(w60).alias("cnt60"))
        .groupBy("user_id")
        .agg(F.max(F.when(F.col("cnt60") >= 3, 1).otherwise(0)).alias("hit"))
    )
    w_all = Window.partitionBy("user_id")
    r2 = (
        p.select(
            "user_id",
            "cents",
            (2 * F.sum("cents").over(w_all)).alias("t2"),
            F.count("*").over(w_all).cast("long").alias("n"),
        )
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    F.col("cents") * F.col("n") * 2 > F.col("t2") * 3, 1
                ).otherwise(0)
            ).alias("hit")
        )
    )
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r3 = (
        p.select(
            "user_id", (us - F.lag(us).over(w_lag)).alias("gap_us")
        )
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("gap_us") >= 30 * 86400000000, 1).otherwise(0)
            ).alias("hit")
        )
    )

    def census(df, name):
        return df.agg(
            F.lit(name).alias("rule"),
            F.sum("hit").cast("long").alias("n_flagged"),
            F.min(F.when(F.col("hit") == 1, F.col("user_id")))
            .cast("long")
            .alias("first_user"),
        )

    return (
        census(r1, "burst_3_in_60min")
        .unionByName(census(r2, "spend_3x_own_mean"))
        .unionByName(census(r3, "dormancy_reactivation"))
        .orderBy("rule")
    )


@register(
    "q_receivables_aging",
    """
    WITH open_orders AS (
        SELECT o_orderkey, o_custkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               CAST(date_diff('day', o_orderdate,
                              TIMESTAMP '1998-08-01 00:00:00') AS BIGINT)
                   AS age_days
        FROM orders
        WHERE o_orderstatus <> 'F'
          AND o_orderdate <= TIMESTAMP '1998-08-01 00:00:00'
    ),
    banded AS (
        SELECT *,
               CASE WHEN age_days <= 30 THEN '0: current'
                    WHEN age_days <= 60 THEN '1: 31-60'
                    WHEN age_days <= 90 THEN '2: 61-90'
                    ELSE '3: 90+' END AS bucket
        FROM open_orders
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(cents) / 100.0, 2) + 0.0 AS open_usd,
           round(sum(cents) * 100.0
                 / (SELECT sum(cents) FROM open_orders), 6) + 0
               AS pct_of_open,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM banded GROUP BY bucket ORDER BY bucket
    """,
)
def q_receivables_aging(spark, sf_dir):
    """Receivables aging report — finance ops' daily bread: every
    non-finalized order still open at the snapshot date, bucketed by
    age (current / 31-60 / 61-90 / 90+), with open dollars, share of
    total exposure, and distinct customers per band — the report that
    drives dunning priority and bad-debt reserves (the 90+ band's
    share IS the reserve conversation). Complements q_running_backlog
    (a time series of total open) with the cross-sectional WHO-OWES-
    WHAT-HOW-LONG cut at one date.

    Exact BIGINT cents; integer day arithmetic against a fixed
    snapshot literal; band labels carry sort prefixes so ordering is
    engine-stable without a CASE rank. One filtered scan + a 4-band
    partial+final aggregate and a broadcast 1-row total — at 100 TB
    the status+date filter pushes to the scan and the report costs a
    single pass.
    """
    orders = load_table(spark, sf_dir, "orders")
    snap = F.lit("1998-08-01 00:00:00").cast("timestamp")
    open_orders = orders.where(
        (F.col("o_orderstatus") != "F") & (F.col("o_orderdate") <= snap)
    ).select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.datediff(F.to_date(snap), F.to_date("o_orderdate"))
        .cast("long")
        .alias("age_days"),
    )
    bucket = (
        F.when(F.col("age_days") <= 30, "0: current")
        .when(F.col("age_days") <= 60, "1: 31-60")
        .when(F.col("age_days") <= 90, "2: 61-90")
        .otherwise("3: 90+")
    )
    banded = open_orders.withColumn("bucket", bucket)
    tot = open_orders.agg(F.sum("cents").alias("total_cents"))
    return (
        banded.groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            (F.round(F.sum("cents") / 100.0, 2) + 0.0).alias("open_usd"),
            F.sum("cents").alias("_c"),
            F.countDistinct("o_custkey").cast("long").alias("n_customers"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_orders",
            "open_usd",
            f6(F.col("_c") * 100.0 / F.col("total_cents")).alias("pct_of_open"),
            "n_customers",
        )
        .orderBy("bucket")
    )


@register(
    "q_skyline_orders",
    """
    WITH pts AS (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               epoch_us(o_orderdate) AS date_us, o_orderdate
        FROM orders WHERE o_custkey % 11 = 0
    ),
    sweep AS (
        SELECT *,
               max(date_us) OVER (ORDER BY cents
                                  RANGE BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING) AS best_newer,
               max(date_us) OVER (PARTITION BY cents) AS best_same_price,
               min(o_orderkey) OVER (PARTITION BY cents, date_us) AS first_key
        FROM pts
    )
    SELECT o_orderkey, round(cents / 100.0, 2) + 0.0 AS price_usd, o_orderdate
    FROM sweep
    WHERE (best_newer IS NULL OR best_newer < date_us)
      AND date_us = best_same_price
      AND o_orderkey = first_key
    ORDER BY cents, o_orderkey
    """,
)
def q_skyline_orders(spark, sf_dir):
    """2-D skyline (Pareto frontier) — cheapest-and-newest orders no
    other order dominates (lower-or-equal price AND newer-or-equal
    date, one strict): the multi-criteria shortlist operator behind
    'show me options that aren't strictly worse than something else'
    (Börzsönyi et al. 2001, the classic SKYLINE OF clause). The naive
    formulation is an O(n²) NOT EXISTS self-join; in 2-D the frontier
    falls out of ONE window sweep: sorted by price, a point survives
    iff its date beats the running max date of all strictly cheaper
    points — O(n log n), and the RANGE .. 1 PRECEDING frame makes
    'strictly cheaper' exact under price ties (same-price groups keep
    only their newest, identical pairs dedupe by min key).

    All comparisons on exact integers (cents, epoch micros). Scale:
    one range-frame window = one sort; in d>2 dimensions the sweep
    generalizes to grid-prune + per-cell skylines (the j_grid_knn
    bucketing applied to domination), which the docstring records as
    the escalation path. Sampled 1/11 by customer for a bounded
    compare; the plan is sample-independent.
    """
    orders = load_table(spark, sf_dir, "orders")
    pts = orders.where(F.col("o_custkey") % 11 == 0).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("date_us"),
        "o_orderdate",
    )
    w_strict = (
        Window.orderBy("cents").rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("cents")
    w_dup = Window.partitionBy("cents", "date_us")
    sweep = pts.select(
        "o_orderkey",
        "cents",
        "date_us",
        "o_orderdate",
        F.max("date_us").over(w_strict).alias("best_newer"),
        F.max("date_us").over(w_same).alias("best_same_price"),
        F.min("o_orderkey").over(w_dup).alias("first_key"),
    )
    return (
        sweep.where(
            (F.col("best_newer").isNull() | (F.col("best_newer") < F.col("date_us")))
            & (F.col("date_us") == F.col("best_same_price"))
            & (F.col("o_orderkey") == F.col("first_key"))
        )
        .select(
            "o_orderkey",
            (F.round(F.col("cents") / 100.0, 2) + 0.0).alias("price_usd"),
            "o_orderdate",
        )
        .orderBy("price_usd", "o_orderkey")
    )


@register(
    "q_hourly_heatmap",
    """
    SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
           CAST(hour(ts) AS BIGINT) AS hod,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) + 0.0
               AS volume_usd,
           round(count(*) * 1.0
                 / (SELECT count(*) FROM events), 6) + 0 AS share
    FROM events
    GROUP BY 1, 2 ORDER BY dow, hod
    """,
)
def q_hourly_heatmap(spark, sf_dir):
    """Day-of-week × hour-of-day activity heatmap — the capacity/ops
    grid every on-call dashboard leads with (when to schedule
    maintenance, when the batch window is safe, where the weekly
    traffic ridge sits). 7×24 cells with event counts, exact-cents
    volume, and share of total traffic.

    One partial+final aggregate over ≤168 cells; the share divides by
    a broadcast scalar. Spark's dayofweek is 1=Sunday like DuckDB's
    dayofweek+1 — the off-by-one family §5's divergence list tracks —
    so both engines emit identical keys here (Spark dayofweek ==
    DuckDB dayofweek + 1; the oracle uses DuckDB's own dayofweek which
    is 0=Sunday, hence the CAST on the Spark side must match: verified
    by the hash). At 100 TB this is a single scan with map-side
    combine into 168 counters.
    """
    ev = load_table(spark, sf_dir, "events")
    tot = ev.agg(F.count("*").alias("n"))
    return (
        ev.groupBy(
            F.dayofweek("ts").cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hod"),
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            (
                F.round(
                    F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0,
                    2,
                )
                + 0.0
            ).alias("volume_usd"),
            F.count("*").alias("_c"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "hod",
            "n_events",
            "volume_usd",
            f6(F.col("_c") * 1.0 / F.col("n")).alias("share"),
        )
        .orderBy("dow", "hod")
    )


@register(
    "q_fx_rate_asof",
    """
    WITH rates AS (
        SELECT CAST(DATE '1996-01-01' + INTERVAL (w * 7) DAY AS DATE)
                   AS rate_date,
               CAST(1050000 + ((w * 48271) % 200001) - 100000 AS BIGINT)
                   AS rate6
        FROM (SELECT unnest(range(0, 157)) AS w)
    ),
    o AS (
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
    ),
    matched AS (
        SELECT o.o_orderkey, o.od, o.cents,
               max(r.rate_date) AS rate_date
        FROM o JOIN rates r ON r.rate_date <= o.od
        GROUP BY 1, 2, 3
    ),
    conv AS (
        SELECT m.od, m.cents, r.rate6
        FROM matched m JOIN rates r ON r.rate_date = m.rate_date
    )
    SELECT CAST(date_trunc('month', od) AS DATE) AS month,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(cents) / 100.0, 2) + 0.0 AS usd,
           round(sum(cents * rate6) / 1e6 / 100.0, 2) + 0.0 AS eur
    FROM conv GROUP BY 1 ORDER BY month
    """,
)
def q_fx_rate_asof(spark, sf_dir):
    """Currency conversion through an as-of rate lookup — the
    multi-currency warehouse pattern: each 1997 order converts at the
    latest weekly FX rate on or before its order date (rates are a
    deterministic 157-week synthetic table at 1e-6 precision — the
    fn_ipv4_cidr precedent for reference data the fixtures lack), and
    revenue reports monthly in both currencies. Conversion is exact
    integer arithmetic end to end: cents × rate6 sums as BIGINT
    (≤1e7 cents × 1.15e6 × 15k orders ≈ 1e17 < 2^63), divided once
    per month at display — the discipline that makes FX-converted
    revenue reduction-order-free, which float rate multiplication
    never is.

    The as-of resolves as join-to-candidates + max(rate_date) + rate
    re-join — all against a BROADCAST 157-row rate dim, so the fact
    table never shuffles for the lookup; at production rate-table
    sizes the running-max union trick (j_asof) replaces it unchanged.
    """
    orders = load_table(spark, sf_dir, "orders")
    rates = spark.range(0, 157).select(
        F.date_add(F.lit("1996-01-01").cast("date"), (F.col("id") * 7).cast("int"))
        .alias("rate_date"),
        (1050000 + ((F.col("id") * 48271) % 200001) - 100000)
        .cast("long")
        .alias("rate6"),
    )
    o = orders.where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("od"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    matched = (
        o.join(F.broadcast(rates), F.col("rate_date") <= F.col("od"))
        .groupBy("o_orderkey", "od", "cents")
        .agg(F.max("rate_date").alias("rate_date"))
    )
    conv = matched.join(F.broadcast(rates), "rate_date")
    return (
        conv.groupBy(F.trunc("od", "month").alias("month"))
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            (F.round(F.sum("cents") / 100.0, 2) + 0.0).alias("usd"),
            (
                F.round(
                    F.sum(F.col("cents") * F.col("rate6")) / 1e6 / 100.0, 2
                )
                + 0.0
            ).alias("eur"),
        )
        .orderBy("month")
    )


@register(
    "q_attribution_position",
    """
    WITH buys AS (
        SELECT event_id, user_id, ts,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
        SELECT event_id, user_id, ts, event_type FROM events
        WHERE event_type IN ('view', 'click')
    ),
    cand AS (
        SELECT b.event_id AS buy_id, b.cents, t.event_type AS channel,
               CAST(row_number() OVER (PARTITION BY b.event_id
                                       ORDER BY t.ts, t.event_id)
                    AS BIGINT) AS pos,
               CAST(count(*) OVER (PARTITION BY b.event_id) AS BIGINT) AS m
        FROM buys b
        JOIN touches t
          ON t.user_id = b.user_id
         AND t.ts <= b.ts
         AND t.ts >= b.ts - INTERVAL 7 DAY
    ),
    credit AS (
        SELECT channel,
               CASE WHEN m = 1 THEN 'only'
                    WHEN pos = 1 THEN 'first'
                    WHEN pos = m THEN 'last'
                    ELSE 'middle' END AS position_class,
               CAST(round(cents * 1e6
                          * (CASE WHEN m = 1 THEN 1.0
                                  WHEN m = 2 THEN 0.5
                                  WHEN pos = 1 OR pos = m THEN 0.4
                                  ELSE 0.2 / (m - 2) END))
                    AS BIGINT) AS cu
        FROM cand
    )
    SELECT channel, position_class,
           CAST(count(*) AS BIGINT) AS n_credits,
           round(sum(cu) / 1e6 / 100.0, 4) + 0 AS attributed_usd
    FROM credit GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_attribution_position(spark, sf_dir):
    """Position-based (U-shaped, 40/20/40) attribution — the third leg
    of the family: q_attribution_last_touch gives the default single-
    credit model, q_attribution_markov the counterfactual one; the
    U-shape is the standard COMPROMISE (introducer and closer each get
    40%, the middle splits 20%) that marketing actually configures.
    Output keeps the position class visible so the U is auditable per
    channel (first/middle/last/only columns in one rollup).

    Same scale shape as last-touch: the purchase↔touch pairing rides
    the user-keyed join with the 7-day bound, positions come from ONE
    per-purchase window (row_number + count over the same partition —
    single exchange), and per-touch credit snaps to micro-cent BIGINTs
    (the only float is the weight CASE, identical text in both
    engines) so channel sums are reduction-order-free.
    """
    ev = load_table(spark, sf_dir, "events")
    buys = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("buy_id"),
        "user_id",
        F.col("ts").alias("buy_ts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    touches = ev.where(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("touch_ts"),
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("channel"),
    )
    cand = buys.join(
        touches,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("touch_ts") <= F.col("buy_ts"))
        & (F.col("touch_ts") >= F.col("buy_ts") - F.expr("INTERVAL 7 DAY")),
    )
    wp = Window.partitionBy("buy_id").orderBy("touch_ts", "touch_id")
    wm = Window.partitionBy("buy_id")
    pos, m = F.col("pos"), F.col("m")
    weighted = cand.select(
        "channel",
        "cents",
        F.row_number().over(wp).cast("long").alias("pos"),
        F.count("*").over(wm).cast("long").alias("m"),
    ).select(
        "channel",
        F.when(m == 1, "only")
        .when(pos == 1, "first")
        .when(pos == m, "last")
        .otherwise("middle")
        .alias("position_class"),
        F.round(
            F.col("cents")
            * 1e6
            * (
                F.when(m == 1, 1.0)
                .when(m == 2, 0.5)
                .when((pos == 1) | (pos == m), 0.4)
                .otherwise(0.2 / (m - 2))
            )
        )
        .cast("long")
        .alias("cu"),
    )
    return (
        weighted.groupBy("channel", "position_class")
        .agg(
            F.count("*").cast("long").alias("n_credits"),
            (F.round(F.sum("cu") / 1e6 / 100.0, 4) + 0.0).alias(
                "attributed_usd"
            ),
        )
        .orderBy("channel", "position_class")
    )


@register(
    "q_growth_accounting",
    """
    WITH au AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    seq AS (
        SELECT user_id, d,
               min(d) OVER (PARTITION BY user_id) AS first_d,
               lag(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d,
               lead(d) OVER (PARTITION BY user_id ORDER BY d) AS next_d
        FROM au
    ),
    days AS (SELECT DISTINCT d FROM au),
    act AS (
        SELECT d,
               CAST(count(*) AS BIGINT) AS dau,
               CAST(sum(CASE WHEN d = first_d THEN 1 ELSE 0 END) AS BIGINT)
                   AS new_users,
               CAST(sum(CASE WHEN d > first_d AND prev_d = d - 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS retained,
               CAST(sum(CASE WHEN d > first_d
                              AND (prev_d IS NULL OR prev_d < d - 1)
                             THEN 1 ELSE 0 END) AS BIGINT) AS resurrected
        FROM seq GROUP BY d
    ),
    churn AS (
        SELECT CAST(d + 1 AS DATE) AS d, CAST(count(*) AS BIGINT) AS churned
        FROM seq
        WHERE next_d IS NULL OR next_d > d + 1
        GROUP BY 1
    )
    SELECT a.d AS day, a.dau, a.new_users, a.retained, a.resurrected,
           CAST(coalesce(c.churned, 0) AS BIGINT) AS churned,
           CAST(a.dau - coalesce(c.churned, 0)
                - lag(a.dau) OVER (ORDER BY a.d) AS BIGINT) AS net_check
    FROM act a
    LEFT JOIN churn c ON c.d = a.d
    ORDER BY day
    """,
)
def q_growth_accounting(spark, sf_dir):
    """Growth accounting — the canonical DAU decomposition (the 'Social
    Capital' accounting identity every product-analytics stack runs):
    each day's active users split into NEW (first day ever), RETAINED
    (also active yesterday), RESURRECTED (seen before, not yesterday),
    and each day debits CHURNED (active yesterday, absent today), with
    the identity dau_t − dau_{t−1} = new + resurrected − churned
    surfaced as net_check (= new + resurrected − churned by
    construction — a drifting pipeline breaks it visibly).  This is
    the decomposition q_dau_wau (totals) and q_new_vs_returning
    (binary) cannot give: WHY the count moved.

    One distinct pass + ONE user-keyed window (min/lag/lead share the
    same partition ordering — single exchange), then day-keyed rollups;
    churn attributes to the day it is FELT (d+1) via lead(), no
    day-to-day self-join.  All counts exact.
    """
    ev = load_table(spark, sf_dir, "events")
    au = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    wa = Window.partitionBy("user_id")
    seq = au.select(
        "user_id",
        "d",
        F.min("d").over(wa).alias("first_d"),
        F.lag("d").over(w).alias("prev_d"),
        F.lead("d").over(w).alias("next_d"),
    )
    act = seq.groupBy("d").agg(
        F.count("*").cast("long").alias("dau"),
        F.sum(F.when(F.col("d") == F.col("first_d"), 1).otherwise(0))
        .cast("long")
        .alias("new_users"),
        F.sum(
            F.when(
                (F.col("d") > F.col("first_d"))
                & (F.col("prev_d") == F.date_sub(F.col("d"), 1)),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("retained"),
        F.sum(
            F.when(
                (F.col("d") > F.col("first_d"))
                & (
                    F.col("prev_d").isNull()
                    | (F.col("prev_d") < F.date_sub(F.col("d"), 1))
                ),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("resurrected"),
    )
    churn = (
        seq.where(
            F.col("next_d").isNull()
            | (F.col("next_d") > F.date_add(F.col("d"), 1))
        )
        .groupBy(F.date_add(F.col("d"), 1).alias("d"))
        .agg(F.count("*").cast("long").alias("churned"))
    )
    wd = Window.orderBy("d")
    return (
        act.join(churn, "d", "left")
        .select(
            "d",
            "dau",
            "new_users",
            "retained",
            "resurrected",
            F.coalesce(F.col("churned"), F.lit(0))
            .cast("long")
            .alias("churned"),
        )
        .withColumn(
            "net_check",
            (
                F.col("dau")
                - F.col("churned")
                - F.lag("dau").over(wd)
            ).cast("long"),
        )
        .select(
            F.col("d").alias("day"),
            "dau",
            "new_users",
            "retained",
            "resurrected",
            "churned",
            "net_check",
        )
        .orderBy("day")
    )


@register(
    "q_incremental_aggregate",
    """
    SELECT o_custkey % 97 AS bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents,
           CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS max_cents,
           min(CAST(o_orderdate AS DATE)) AS first_order
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def q_incremental_aggregate(spark, sf_dir):
    """Incremental view maintenance — the nightly-ETL contract made
    checkable: the Spark side NEVER aggregates the full table; it
    aggregates the BASE period and the DELTA batch separately and
    MERGES the partial states (n₁+n₂, Σ₁+Σ₂, max/max, min/min via a
    full-outer join on the group key), while the oracle recomputes
    from scratch.  The hash match proves the merge algebra equals
    recompute — the property every incremental pipeline silently
    assumes and almost never tests (the a_bitmap_overlap
    independent-oracle trick applied to IVM).

    count/sum/max/min are the inserts-only-safe state algebra
    (retractions additionally need count-per-value or monoid inverses
    — q_upsert_merge's territory); at 100 TB this is the difference
    between scanning one day and rescanning three years.  Both passes
    are map-side-combinable groupBys; the merge join carries one row
    per group key.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")

    def state(df):
        return df.groupBy(
            (F.col("o_custkey") % 97).alias("bucket")
        ).agg(
            F.count("*").cast("long").alias("n"),
            F.sum(cents).cast("long").alias("s"),
            F.max(cents).cast("long").alias("mx"),
            F.min(F.to_date("o_orderdate")).alias("fd"),
        )

    cut = F.lit("1997-01-01").cast("timestamp")
    base = state(orders.where(F.col("o_orderdate") < cut))
    delta = state(orders.where(F.col("o_orderdate") >= cut))
    b = base.select(
        "bucket",
        F.col("n").alias("n1"),
        F.col("s").alias("s1"),
        F.col("mx").alias("mx1"),
        F.col("fd").alias("fd1"),
    )
    d = delta.select(
        "bucket",
        F.col("n").alias("n2"),
        F.col("s").alias("s2"),
        F.col("mx").alias("mx2"),
        F.col("fd").alias("fd2"),
    )
    merged = b.join(d, "bucket", "full_outer").select(
        "bucket",
        (
            F.coalesce(F.col("n1"), F.lit(0))
            + F.coalesce(F.col("n2"), F.lit(0))
        )
        .cast("long")
        .alias("n_orders"),
        (
            F.coalesce(F.col("s1"), F.lit(0))
            + F.coalesce(F.col("s2"), F.lit(0))
        )
        .cast("long")
        .alias("cents"),
        F.greatest(
            F.coalesce(F.col("mx1"), F.lit(-1)),
            F.coalesce(F.col("mx2"), F.lit(-1)),
        )
        .cast("long")
        .alias("max_cents"),
        F.least(
            F.coalesce(F.col("fd1"), F.lit("9999-12-31").cast("date")),
            F.coalesce(F.col("fd2"), F.lit("9999-12-31").cast("date")),
        ).alias("first_order"),
    )
    return merged.orderBy("bucket")


@register(
    "q_weibull_fit",
    """
    WITH bounds AS (SELECT max(o_orderdate) AS tmax FROM orders),
    life AS (
        SELECT o_custkey,
               CAST(datediff('day', min(o_orderdate), max(o_orderdate))
                    AS BIGINT) AS t,
               CASE WHEN datediff('day', max(o_orderdate),
                                  (SELECT tmax FROM bounds)) > 90
                    THEN 1 ELSE 0 END AS died
        FROM orders GROUP BY o_custkey
    ),
    deaths AS (
        SELECT t, o_custkey,
               CAST(row_number() OVER (ORDER BY t, o_custkey) AS BIGINT)
                   AS i,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM life WHERE died = 1 AND t >= 1
    ),
    pts AS (
        SELECT n,
               CAST(round(ln(CAST(t AS DOUBLE)) * 1e9) AS BIGINT) AS x9,
               CAST(round(ln(0.0 - ln(1.0 - (i - 0.3) / (n + 0.4)))
                          * 1e9) AS BIGINT) AS y9,
               CAST(round(ln(CAST(t AS DOUBLE))
                          * ln(0.0 - ln(1.0 - (i - 0.3) / (n + 0.4)))
                          * 1e9) AS BIGINT) AS xy9,
               CAST(round(ln(CAST(t AS DOUBLE)) * ln(CAST(t AS DOUBLE))
                          * 1e9) AS BIGINT) AS xx9
        FROM deaths
    ),
    fit AS (
        SELECT CAST(max(n) AS BIGINT) AS k,
               CAST(sum(x9) AS BIGINT) AS sx,
               CAST(sum(y9) AS BIGINT) AS sy,
               CAST(sum(xy9) AS BIGINT) AS sxy,
               CAST(sum(xx9) AS BIGINT) AS sxx
        FROM pts
    )
    SELECT k AS n_deaths,
           round((k * (sxy / 1e9) - (sx / 1e9) * (sy / 1e9))
                 / (k * (sxx / 1e9) - (sx / 1e9) * (sx / 1e9)), 6) + 0
               AS shape,
           round(exp(0.0 - ((sy / 1e9) / k
                            - ((k * (sxy / 1e9)
                                - (sx / 1e9) * (sy / 1e9))
                               / (k * (sxx / 1e9)
                                  - (sx / 1e9) * (sx / 1e9)))
                              * ((sx / 1e9) / k))
                           / ((k * (sxy / 1e9) - (sx / 1e9) * (sy / 1e9))
                              / (k * (sxx / 1e9)
                                 - (sx / 1e9) * (sx / 1e9)))), 6) + 0
               AS scale_days
    FROM fit
    """,
)
def q_weibull_fit(spark, sf_dir):
    """Weibull survival fit by median-rank regression — the PARAMETRIC
    rung completing the survival family (q_kaplan_meier estimates the
    curve nonparametrically, a_log_rank_test compares arms, q_hazard_
    curve profiles risk; this compresses the churn process into two
    interpretable numbers): shape k < 1 means churn risk FALLS with
    tenure (retention compounds — invest in onboarding), k > 1 means
    it rises (subscriptions age out).  Uncensored lifetimes rank into
    Bernard median-rank plotting positions F̂ᵢ = (i−0.3)/(n+0.4);
    ln(−ln(1−F̂)) against ln t is linear for a Weibull, so shape =
    OLS slope and scale = exp(−intercept/shape) — the classic
    probability-plot estimator, closed-form and engine-exact.

    Same censoring rule as q_kaplan_meier (>90 days silent at corpus
    end = churned; t ≥ 1 so ln t exists).  The global failure ranking
    is one two-phase sort (the a_propensity_strata global-order
    license); every per-user ln term snaps to a 1e-9 BIGINT BEFORE
    the OLS sums, so the fit is reduction-order-free at any
    parallelism.
    """
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(F.max("o_orderdate").alias("tmax"))
    life = (
        orders.crossJoin(F.broadcast(bounds))
        .groupBy("o_custkey", "tmax")
        .agg(
            F.datediff(
                F.max("o_orderdate"), F.min("o_orderdate")
            )
            .cast("long")
            .alias("t"),
            F.datediff(F.first("tmax"), F.max("o_orderdate")).alias(
                "gap"
            ),
        )
        .select(
            "o_custkey",
            "t",
            F.when(F.col("gap") > 90, 1).otherwise(0).alias("died"),
        )
    )
    deaths = (
        life.where((F.col("died") == 1) & (F.col("t") >= 1))
        .select(
            "t",
            "o_custkey",
            F.row_number()
            .over(Window.orderBy("t", "o_custkey"))
            .cast("long")
            .alias("i"),
        )
        .withColumn(
            "n", F.count("*").over(Window.partitionBy()).cast("long")
        )
    )
    lx = F.log(F.col("t").cast("double"))
    ly = F.log(
        F.lit(0.0) - F.log(1.0 - (F.col("i") - 0.3) / (F.col("n") + 0.4))
    )
    pts = deaths.select(
        "n",
        F.round(lx * 1e9).cast("long").alias("x9"),
        F.round(ly * 1e9).cast("long").alias("y9"),
        F.round(lx * ly * 1e9).cast("long").alias("xy9"),
        F.round(lx * lx * 1e9).cast("long").alias("xx9"),
    )
    fit = pts.agg(
        F.max("n").cast("long").alias("k"),
        F.sum("x9").cast("long").alias("sx"),
        F.sum("y9").cast("long").alias("sy"),
        F.sum("xy9").cast("long").alias("sxy"),
        F.sum("xx9").cast("long").alias("sxx"),
    )
    k = F.col("k")
    sx, sy = F.col("sx"), F.col("sy")
    sxy, sxx = F.col("sxy"), F.col("sxx")
    slope = (k * (sxy / 1e9) - (sx / 1e9) * (sy / 1e9)) / (
        k * (sxx / 1e9) - (sx / 1e9) * (sx / 1e9)
    )
    intercept = (sy / 1e9) / k - slope * ((sx / 1e9) / k)
    return fit.select(
        k.alias("n_deaths"),
        f6(slope).alias("shape"),
        f6(F.exp(F.lit(0.0) - intercept / slope)).alias("scale_days"),
    )


@register(
    "q_data_contract",
    """
    WITH r1 AS (
        SELECT 'orders.o_orderkey.not_null' AS rule,
               CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_violations
        FROM orders
    ),
    r2 AS (
        SELECT 'orders.o_orderkey.unique' AS rule,
               CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
                   AS n_violations
        FROM orders
    ),
    r3 AS (
        SELECT 'orders.o_totalprice.range_0_1e7' AS rule,
               CAST(sum(CASE WHEN o_totalprice <= 0
                              OR o_totalprice > 1e7
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        FROM orders
    ),
    r4 AS (
        SELECT 'orders.o_orderdate.range_1990_2000' AS rule,
               CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
                              OR o_orderdate >= TIMESTAMP '2000-01-01'
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        FROM orders
    ),
    r5 AS (
        SELECT 'orders.o_custkey.fk_customer' AS rule,
               CAST(count(*) AS BIGINT) AS n_violations
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)
    ),
    r6 AS (
        SELECT 'orders.o_orderpriority.accepted_values' AS rule,
               CAST(sum(CASE WHEN o_orderpriority NOT IN
                             ('1-URGENT', '2-HIGH', '3-MEDIUM',
                              '4-NOT SPECIFIED', '5-LOW')
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        FROM orders
    ),
    allr AS (
        SELECT * FROM r1 UNION ALL SELECT * FROM r2
        UNION ALL SELECT * FROM r3 UNION ALL SELECT * FROM r4
        UNION ALL SELECT * FROM r5 UNION ALL SELECT * FROM r6
    )
    SELECT rule, n_violations,
           CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT)
               AS passed
    FROM allr ORDER BY rule
    """,
)
def q_data_contract(spark, sf_dir):
    """Data-contract check surface — the dbt-tests / expectations shape
    every production table ships with: not_null, unique, accepted
    range, accepted values, and FK integrity evaluated in ONE pass
    over the fact table (plus one anti-join for the FK), returning a
    machine-readable violations census instead of a boolean — the gate
    a write-audit-publish flow (s_write_audit_publish) evaluates
    before the pointer swap, and the per-rule counts that page the
    right owner when it fails.

    Plan shape matters at 100 TB: the five column rules share ONE scan
    (each is a conditional aggregate, map-side combined — not five
    passes); uniqueness is count−count(distinct) in the same pass
    group; only the FK rule adds a join, and it broadcasts the dim.
    q_fk_orphans/q_id_gaps diagnose one rule deeply; this key is the
    CONTRACT — all rules, one artifact, stable rule ids.
    """
    orders, customer = tables(spark, sf_dir, "orders", "customer")
    one_pass = orders.agg(
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("not_null"),
        (F.count("*") - F.countDistinct("o_orderkey"))
        .cast("long")
        .alias("unique"),
        F.sum(
            F.when(
                (F.col("o_totalprice") <= 0)
                | (F.col("o_totalprice") > 1e7),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("range_price"),
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))
                | (
                    F.col("o_orderdate")
                    >= F.lit("2000-01-01").cast("timestamp")
                ),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("range_date"),
        F.sum(
            F.when(
                ~F.col("o_orderpriority").isin(
                    "1-URGENT",
                    "2-HIGH",
                    "3-MEDIUM",
                    "4-NOT SPECIFIED",
                    "5-LOW",
                ),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("accepted_values"),
    )
    fk = (
        orders.join(
            F.broadcast(customer.select("c_custkey")),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count("*").cast("long").alias("fk"))
    )
    wide = one_pass.crossJoin(F.broadcast(fk))
    rules = wide.selectExpr(
        """stack(6,
            'orders.o_orderkey.not_null', not_null,
            'orders.o_orderkey.unique', unique,
            'orders.o_totalprice.range_0_1e7', range_price,
            'orders.o_orderdate.range_1990_2000', range_date,
            'orders.o_custkey.fk_customer', fk,
            'orders.o_orderpriority.accepted_values', accepted_values
        ) AS (rule, n_violations)"""
    )
    return rules.select(
        "rule",
        F.col("n_violations").cast("long").alias("n_violations"),
        F.when(F.col("n_violations") == 0, 1)
        .otherwise(0)
        .cast("long")
        .alias("passed"),
    ).orderBy("rule")


@register(
    "q_woe_iv",
    """
    WITH base AS (
        SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS bad,
               CAST(floor(CAST(round(o_totalprice * 100) AS BIGINT) * 10
                          / ((SELECT max(CAST(round(o_totalprice * 100)
                                              AS BIGINT)) FROM orders)
                             + 1)) AS BIGINT) AS bucket
        FROM orders
    ),
    tot AS (
        SELECT CAST(sum(bad) AS BIGINT) AS nb,
               CAST(sum(1 - bad) AS BIGINT) AS ng
        FROM base
    ),
    cell AS (
        SELECT bucket,
               CAST(sum(bad) AS BIGINT) AS b,
               CAST(sum(1 - bad) AS BIGINT) AS g
        FROM base GROUP BY bucket
    ),
    woe AS (
        SELECT c.bucket, c.b, c.g,
               CAST(round(ln(((c.g + 0.5) / (t.ng + 0.5))
                             / ((c.b + 0.5) / (t.nb + 0.5))) * 1e9)
                    AS BIGINT) AS woe9,
               CAST(round((CAST(c.g AS DOUBLE) / t.ng
                           - CAST(c.b AS DOUBLE) / t.nb)
                          * ln(((c.g + 0.5) / (t.ng + 0.5))
                               / ((c.b + 0.5) / (t.nb + 0.5)))
                          * 1e9) AS BIGINT) AS iv9
        FROM cell c CROSS JOIN tot t
    ),
    total_iv AS (
        SELECT CAST(sum(iv9) AS BIGINT) AS siv FROM woe
    )
    SELECT w.bucket, w.g AS n_good, w.b AS n_bad,
           round(w.woe9 / 1e9, 6) + 0 AS woe,
           round(w.iv9 / 1e9, 6) + 0 AS iv_contribution,
           round(t.siv / 1e9, 6) + 0 AS total_iv
    FROM woe w CROSS JOIN total_iv t
    ORDER BY w.bucket
    """,
)
def q_woe_iv(spark, sf_dir):
    """Weight-of-Evidence / Information-Value scorecard screening — the
    credit-risk feature audit (Basel scorecard tradition, public):
    price deciles vs the urgent/high 'bad' outcome, WoE = ln(%good /
    %bad) per bucket (0.5 Laplace continuity so empty cells don't
    blow up), IV contribution = (%good − %bad)·WoE, and the total IV
    — the number risk teams read against the folk scale (<0.02
    useless, >0.3 strong) before a feature enters a model.  This is
    feature SCREENING, the step before a_logistic_irls fits
    coefficients — same relative-decile bucketing, deliberately.

    One scan builds buckets (exact integer decile arithmetic against
    the corpus max), one groupBy produces the cells; WoE's ln runs on
    the bounded bucket axis snapped to 1e-9 BIGINTs before the IV
    sum.  Monotone-WoE eyeballing falls out of the per-bucket rows.
    """
    orders = load_table(spark, sf_dir, "orders")
    mx = orders.agg(
        F.max(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("maxc")
    )
    base = orders.crossJoin(F.broadcast(mx)).select(
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("bad"),
        F.floor(
            F.round(F.col("o_totalprice") * 100).cast("long")
            * 10
            / (F.col("maxc") + 1)
        )
        .cast("long")
        .alias("bucket"),
    )
    tot = base.agg(
        F.sum("bad").cast("long").alias("nb"),
        F.sum(1 - F.col("bad")).cast("long").alias("ng"),
    )
    cell = base.groupBy("bucket").agg(
        F.sum("bad").cast("long").alias("b"),
        F.sum(1 - F.col("bad")).cast("long").alias("g"),
    )
    woe_expr = F.log(
        ((F.col("g") + 0.5) / (F.col("ng") + 0.5))
        / ((F.col("b") + 0.5) / (F.col("nb") + 0.5))
    )
    woe = cell.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "b",
        "g",
        F.round(woe_expr * 1e9).cast("long").alias("woe9"),
        F.round(
            (
                F.col("g").cast("double") / F.col("ng")
                - F.col("b").cast("double") / F.col("nb")
            )
            * woe_expr
            * 1e9
        )
        .cast("long")
        .alias("iv9"),
    )
    total_iv = woe.agg(F.sum("iv9").cast("long").alias("siv"))
    return (
        woe.crossJoin(F.broadcast(total_iv))
        .select(
            "bucket",
            F.col("g").alias("n_good"),
            F.col("b").alias("n_bad"),
            f6(F.col("woe9") / 1e9).alias("woe"),
            f6(F.col("iv9") / 1e9).alias("iv_contribution"),
            f6(F.col("siv") / 1e9).alias("total_iv"),
        )
        .orderBy("bucket")
    )


@register(
    "q_basket_substitutes",
    """
    WITH baskets AS (
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
          FROM baskets),
    item AS (
        SELECT p_brand, CAST(count(*) AS BIGINT) AS c
        FROM baskets GROUP BY p_brand
    ),
    pair AS (
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
               CAST(count(*) AS BIGINT) AS c_ab
        FROM baskets a JOIN baskets b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        GROUP BY 1, 2
    ),
    grid AS (
        SELECT ia.p_brand AS brand_a, ib.p_brand AS brand_b,
               ia.c AS ca, ib.c AS cb,
               CAST(coalesce(p.c_ab, 0) AS BIGINT) AS c_ab
        FROM item ia
        JOIN item ib ON ia.p_brand < ib.p_brand
        LEFT JOIN pair p
          ON p.brand_a = ia.p_brand AND p.brand_b = ib.p_brand
        WHERE ia.c >= 20 AND ib.c >= 20
    ),
    z AS (
        SELECT g.brand_a, g.brand_b, g.c_ab, g.ca, g.cb,
               (g.c_ab - CAST(g.ca AS DOUBLE) * g.cb / n.n_orders)
               / sqrt((CAST(g.ca AS DOUBLE) * g.cb / n.n_orders)
                      * (1.0 - CAST(g.ca AS DOUBLE) / n.n_orders)
                      * (1.0 - CAST(g.cb AS DOUBLE) / n.n_orders)) AS zv,
               CAST(g.c_ab AS DOUBLE)
               / (CAST(g.ca AS DOUBLE) * g.cb / n.n_orders) AS lift
        FROM grid g CROSS JOIN n
    )
    SELECT brand_a, brand_b, c_ab, ca AS n_a, cb AS n_b,
           round(lift, 6) + 0 AS lift,
           round(zv, 6) + 0 AS z,
           CASE WHEN zv < -1.959964 THEN 1 ELSE 0 END AS substitute_flag
    FROM z
    WHERE zv < -1.0
    ORDER BY z, brand_a, brand_b
    """,
)
def q_basket_substitutes(spark, sf_dir):
    """Substitute detection — the INFERENTIAL negative-association
    complement to q_basket_rules (which surfaces complements via
    lift > 1): two brands are substitution candidates when they
    co-occur significantly LESS than independence predicts (customers
    pick one OR the other), tested with the 2×2 cell z =
    (c_ab − E)/√(E(1−p_a)(1−p_b)) rather than eyeballing lift < 1 —
    low lift on thin support is noise, and the z says so.  Support
    floors (both brands ≥ 20 baskets) plus the shared 1.959964 gate.

    The plan detail that matters: never-co-occurring pairs produce NO
    row in a co-count join, yet they are the STRONGEST substitution
    signal — so candidates come from the bounded brand×brand grid
    (LEFT JOIN the co-counts, coalesce 0), which is exactly the
    right scale shape too: the grid is catalog-bounded while the
    basket self-join stays order-keyed.
    """
    li, part = tables(spark, sf_dir, "lineitem", "part")
    # r17 (guide §2.4/§5): the distinct basket frame fed the order
    # census, the per-brand counts and BOTH pair-join sides uncached —
    # 4 replays of the lineitem⋈part distinct. One row per
    # (order, brand); MEMORY_AND_DISK so it spills at scale.
    baskets = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
        .cache()
    )
    n = baskets.agg(
        F.countDistinct("l_orderkey").cast("long").alias("n_orders")
    )
    # brand-bounded; feeds both support-floor sides
    item = baskets.groupBy("p_brand").agg(
        F.count("*").cast("long").alias("c")
    ).cache()
    a = baskets.select(
        F.col("l_orderkey").alias("ka"), F.col("p_brand").alias("brand_a")
    )
    b = baskets.select(
        F.col("l_orderkey").alias("kb"), F.col("p_brand").alias("brand_b")
    )
    pair = (
        a.join(
            b,
            (F.col("ka") == F.col("kb"))
            & (F.col("brand_a") < F.col("brand_b")),
        )
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").cast("long").alias("c_ab"))
    )
    ia = item.select(
        F.col("p_brand").alias("brand_a"), F.col("c").alias("ca")
    ).where(F.col("ca") >= 20)
    ib = item.select(
        F.col("p_brand").alias("brand_b"), F.col("c").alias("cb")
    ).where(F.col("cb") >= 20)
    grid = (
        ia.join(ib, F.col("brand_a") < F.col("brand_b"))
        .join(pair, ["brand_a", "brand_b"], "left")
        .select(
            "brand_a",
            "brand_b",
            "ca",
            "cb",
            F.coalesce(F.col("c_ab"), F.lit(0)).cast("long").alias("c_ab"),
        )
    )
    e = F.col("ca").cast("double") * F.col("cb") / F.col("n_orders")
    zv = (F.col("c_ab") - e) / F.sqrt(
        e
        * (1.0 - F.col("ca").cast("double") / F.col("n_orders"))
        * (1.0 - F.col("cb").cast("double") / F.col("n_orders"))
    )
    lift = F.col("c_ab").cast("double") / e
    return (
        grid.crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "c_ab",
            F.col("ca").alias("n_a"),
            F.col("cb").alias("n_b"),
            f6(lift).alias("lift"),
            f6(zv).alias("z"),
            F.when(zv < -1.959964, 1).otherwise(0).alias(
                "substitute_flag"
            ),
            zv.alias("_zraw"),
        )
        .where(F.col("_zraw") < -1.0)
        .drop("_zraw")
        .orderBy("z", "brand_a", "brand_b")
    )


_RING_ITER_SQL = """
    l{next} AS (
        SELECT n.k,
               least(n.lbl, coalesce(min(l.lbl), n.lbl)) AS lbl
        FROM l{cur} n
        LEFT JOIN edges e ON e.src = n.k
        LEFT JOIN l{cur} l ON l.k = e.dst
        GROUP BY n.k, n.lbl
    )
"""


@register(
    "q_fraud_rings",
    f"""
    WITH m AS (
        SELECT c_custkey AS k,
               CAST(floor(CAST(round(c_acctbal * 100) AS BIGINT)
                          / 10000.0) AS BIGINT) AS bal100,
               c_custkey % 97 AS dev,
               c_nationkey
        FROM customer
    ),
    ga AS (
        SELECT k, min(k) OVER (PARTITION BY bal100) AS root,
               count(*) OVER (PARTITION BY bal100) AS gs
        FROM m
    ),
    gb AS (
        SELECT k, min(k) OVER (PARTITION BY dev, c_nationkey) AS root,
               count(*) OVER (PARTITION BY dev, c_nationkey) AS gs
        FROM m
    ),
    star AS (
        SELECT k, root FROM ga WHERE gs BETWEEN 2 AND 20 AND k <> root
        UNION
        SELECT k, root FROM gb WHERE gs BETWEEN 2 AND 20 AND k <> root
    ),
    edges AS (
        SELECT k AS src, root AS dst FROM star
        UNION
        SELECT root AS src, k AS dst FROM star
    ),
    l0 AS (SELECT k, k AS lbl FROM m),
    {_RING_ITER_SQL.format(cur=0, next=1)},
    {_RING_ITER_SQL.format(cur=1, next=2)},
    {_RING_ITER_SQL.format(cur=2, next=3)},
    rings AS (
        SELECT l.lbl AS ring_id,
               CAST(count(*) AS BIGINT) AS n_members,
               CAST(count(DISTINCT m.c_nationkey) AS BIGINT) AS n_nations,
               CAST(sum(CAST(round(
                   (SELECT c_acctbal FROM customer c
                    WHERE c.c_custkey = m.k) * 100) AS BIGINT)) AS BIGINT)
                   AS total_cents
        FROM l3 l JOIN m ON m.k = l.k
        GROUP BY l.lbl HAVING count(*) >= 3
    )
    SELECT CAST(ring_id AS BIGINT) AS ring_id, n_members, n_nations,
           round(total_cents / 100.0, 2) + 0.0 AS total_balance_usd
    FROM rings ORDER BY n_members DESC, ring_id
    LIMIT 40
    """,
)
def q_fraud_rings(spark, sf_dir):
    """Fraud-ring detection — multi-attribute ENTITY LINKING: customers
    sharing a $100 balance bucket OR a device fingerprint within the
    same nation (synthetic custkey%97 — the fn_ipv4_cidr license for
    reference data the fixtures lack) link into components; rings of
    ≥3 across ≥1 nation are the investigation queue, with pooled
    balance as the exposure number.  The graph shape is the fraud
    industry's: attributes form STARS (every member links to the
    group's min id — never the quadratic within-group clique), stars
    chain through shared members, and a size cap (≤20) drops service
    accounts that would otherwise weld everything into one blob.

    Components resolve by 3 min-label iterations over the star edges
    (t_dup_clusters' O(diameter) idiom; attribute stars keep diameters
    tiny, and the oracle unrolls the same 3 steps as CTEs).  Group
    stars come from two windows — no self-joins until the bounded edge
    list exists.
    """
    customer = load_table(spark, sf_dir, "customer")
    m = customer.select(
        F.col("c_custkey").alias("k"),
        (F.floor(F.round(F.col("c_acctbal") * 100).cast("long") / 10000))
        .cast("long")
        .alias("bal100"),
        (F.col("c_custkey") % 97).alias("dev"),
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    ).cache()
    wa = Window.partitionBy("bal100")
    wb = Window.partitionBy("dev", "c_nationkey")
    ga = m.select(
        "k",
        F.min("k").over(wa).alias("root"),
        F.count("*").over(wa).alias("gs"),
    )
    gb = m.select(
        "k",
        F.min("k").over(wb).alias("root"),
        F.count("*").over(wb).alias("gs"),
    )
    star = (
        ga.where(
            (F.col("gs") >= 2) & (F.col("gs") <= 20) & (F.col("k") != F.col("root"))
        )
        .select("k", "root")
        .unionByName(
            gb.where(
                (F.col("gs") >= 2)
                & (F.col("gs") <= 20)
                & (F.col("k") != F.col("root"))
            ).select("k", "root")
        )
        .distinct()
    )
    edges = (
        star.select(F.col("k").alias("src"), F.col("root").alias("dst"))
        .unionByName(
            star.select(
                F.col("root").alias("src"), F.col("k").alias("dst")
            )
        )
        .distinct()
        .cache()
    )
    labels = m.select("k", F.col("k").alias("lbl"))
    for _ in range(3):
        nbr = (
            labels.join(edges, labels.k == edges.src)
            .join(
                labels.select(
                    F.col("k").alias("k2"), F.col("lbl").alias("nlbl")
                ),
                F.col("dst") == F.col("k2"),
            )
            .groupBy("src")
            .agg(F.min("nlbl").alias("minn"))
        )
        labels = (
            labels.join(nbr, labels.k == nbr.src, "left")
            .select(
                "k",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("minn"), F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint()
        )
    rings = (
        labels.join(m, "k")
        .groupBy(F.col("lbl").alias("ring_id"))
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.countDistinct("c_nationkey").cast("long").alias("n_nations"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
        .where(F.col("n_members") >= 3)
    )
    return (
        rings.select(
            F.col("ring_id").cast("long"),
            "n_members",
            "n_nations",
            (F.round(F.col("total_cents") / 100.0, 2) + 0.0).alias(
                "total_balance_usd"
            ),
        )
        .orderBy(F.col("n_members").desc(), "ring_id")
        .limit(40)
    )


@register(
    "q_adstock_regression",
    """
    WITH RECURSIVE daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS clicks,
               CAST(sum(CASE WHEN event_type = 'purchase'
                             THEN CAST(round(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS rev,
               CAST(row_number() OVER (ORDER BY CAST(ts AS DATE))
                    AS BIGINT) AS rn
        FROM events GROUP BY 1
    ),
    ad AS (
        SELECT rn, CAST(clicks AS DOUBLE) AS a, rev
        FROM daily WHERE rn = 1
        UNION ALL
        SELECT d.rn, round(d.clicks + 0.5 * ad.a, 6) AS a, d.rev
        FROM ad JOIN daily d ON d.rn = ad.rn + 1
    ),
    pts AS (
        SELECT CAST(round(a * 1e6) AS BIGINT) AS x6,
               CAST(rev AS BIGINT) AS y
        FROM ad
    ),
    fit AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x6) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               sum(CAST(x6 AS HUGEINT) * y) AS sxy,
               sum(CAST(x6 AS HUGEINT) * x6) AS sxx
        FROM pts
    )
    SELECT n AS n_days,
           round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / (n * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * sx) * 1e6 / 100.0, 6) + 0
               AS rev_per_adstock_click_usd,
           round((CAST(sy AS DOUBLE) / n
                  - ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                     / (n * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * sx))
                    * (CAST(sx AS DOUBLE) / n)) / 100.0, 4) + 0.0
               AS baseline_rev_usd
    FROM fit
    """,
)
def q_adstock_regression(spark, sf_dir):
    """Ad-stock regression — the marketing-mix-model PRIMITIVE: raw
    click counts mis-attribute delayed conversions (a_cross_
    correlation shows WHETHER clicks lead; this models HOW MUCH),
    so clicks first transform through geometric carryover a_t = c_t +
    0.5·a_{t−1} (half-life one day, the classic adstock literal) and
    daily revenue regresses on the adstocked series — slope =
    incremental revenue per adstocked click, intercept = baseline
    revenue that marketing can't claim.  This two-step shape
    (transform, then regress) is exactly how MMM decomposes spend.

    The carryover is a recursion → the holt split: daily rollup is
    the data-scale pass, the adstock walks the bounded day axis
    (RECURSIVE CTE / driver replay, 6dp snaps), and the OLS consumes
    1e-6-snapped adstock BIGINTs with HUGEINT cross-moments — closed
    form, reduction-order-free.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            )
            .cast("long")
            .alias("clicks"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("long"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("rev"),
        )
        .orderBy("day")
        .collect()  # bounded day axis
    )
    rows = []
    a = None
    for r in daily:
        a = float(r["clicks"]) if a is None else _rhu(
            r["clicks"] + 0.5 * a, 6
        )
        rows.append((int(round(a * 1e6)), int(r["rev"])))
    pts = spark.createDataFrame(rows, "x6 long, y long")
    fit = pts.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x6").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(
            F.col("x6").cast("decimal(19,0)") * F.col("y").cast("decimal(19,0)")
        ).alias("sxy"),
        F.sum(
            F.col("x6").cast("decimal(19,0)")
            * F.col("x6").cast("decimal(19,0)")
        ).alias("sxx"),
    )
    n = F.col("n")
    slope = (
        n * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        n * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx")
    )
    intercept = (
        F.col("sy").cast("double") / n
        - slope * (F.col("sx").cast("double") / n)
    )
    return fit.select(
        n.alias("n_days"),
        f6(slope * 1e6 / 100.0).alias("rev_per_adstock_click_usd"),
        (F.round(intercept / 100.0, 4) + 0.0).alias("baseline_rev_usd"),
    )


@register(
    "q_erlang_staffing",
    """
    WITH RECURSIVE hourly AS (
        SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    peak AS (SELECT CAST(max(n) AS BIGINT) AS lam FROM hourly),
    load AS (
        SELECT lam, round(CAST(lam AS DOUBLE) / 30.0, 9) AS a FROM peak
    ),
    b AS (
        SELECT 0 AS c, CAST(1.0 AS DOUBLE) AS eb, a, lam FROM load
        UNION ALL
        SELECT c + 1, round(a * eb / (c + 1 + a * eb), 9), a, lam
        FROM b WHERE c < 40
    ),
    cc AS (
        SELECT c, a, lam, eb,
               CASE WHEN c > a
                    THEN round(c * eb / (c - a * (1.0 - eb)), 9)
                    ELSE 1.0 END AS ec
        FROM b WHERE c >= 1
    ),
    feasible AS (
        SELECT *, CASE WHEN c > a AND ec < 0.2 THEN 1 ELSE 0 END AS ok
        FROM cc
    ),
    chosen AS (
        SELECT CAST(min(c) AS BIGINT) AS c_star FROM feasible WHERE ok = 1
    )
    SELECT CAST(f.c AS BIGINT) AS agents, f.lam AS peak_per_hour,
           round(f.a, 6) + 0 AS offered_load,
           round(f.ec, 6) + 0 AS wait_probability,
           CASE WHEN f.c = ch.c_star THEN 1 ELSE 0 END AS chosen_flag
    FROM feasible f CROSS JOIN chosen ch
    WHERE f.c BETWEEN CAST(ceil(f.a) AS INTEGER)
                  AND CAST(ceil(f.a) AS INTEGER) + 5
    ORDER BY agents
    """,
)
def q_erlang_staffing(spark, sf_dir):
    """Erlang-C staffing — QUEUEING THEORY as a query, the capacity
    answer q_peak_concurrency's census stops short of: from the
    window's peak hourly arrival rate and a 30-events/agent/hour
    service literal, walk the Erlang-B recursion B(c) = aB/(c+aB)
    (numerically stable — no factorials), convert to Erlang-C wait
    probability C(c) = cB/(c − a(1−B)), and pick the smallest agent
    count with wait probability < 20% — the 1917-vintage formula
    (public) every call-center and service-mesh autoscaler still
    runs.  The ±5-agent curve around the load is reported so the
    marginal value of one more agent is visible, chosen row flagged.

    The recursion is the holt split: hourly rollup is the only
    data-scale pass; the 40-step walk runs on a bounded axis (DuckDB
    RECURSIVE CTE, Spark driver replay) with 9dp half-away snaps per
    step, so both engines trace identical staffing curves.
    """
    ev = load_table(spark, sf_dir, "events")
    peak = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").cast("long").alias("n"))
        .agg(F.max("n").cast("long").alias("lam"))
        .collect()[0]["lam"]
    )
    a = _rhu(peak / 30.0, 9)
    eb = 1.0
    curve = []
    for c in range(1, 41):
        eb = _rhu(a * eb / (c + a * eb), 9)
        ec = _rhu(c * eb / (c - a * (1.0 - eb)), 9) if c > a else 1.0
        curve.append((c, ec))
    c_star = min(
        (c for c, ec in curve if c > a and ec < 0.2), default=None
    )
    import math

    lo, hi = math.ceil(a), math.ceil(a) + 5
    rows = [
        (
            c,
            int(peak),
            _rhu(a, 6),
            _rhu(ec, 6),
            1 if c == c_star else 0,
        )
        for c, ec in curve
        if lo <= c <= hi
    ]
    return spark.createDataFrame(
        rows,
        "agents long, peak_per_hour long, offered_load double,"
        " wait_probability double, chosen_flag int",
    ).orderBy("agents")


@register(
    "q_simpsons_check",
    """
    WITH li AS (
        SELECT p.p_brand AS brand,
               n.n_regionkey AS seg,
               CAST(l.l_quantity AS BIGINT) AS qty,
               CAST(round(l.l_extendedprice / l.l_quantity) AS BIGINT)
                   AS unit_usd
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
    ),
    mom AS (
        SELECT seg,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(unit_usd) AS BIGINT) AS sx,
               CAST(sum(qty) AS BIGINT) AS sy,
               CAST(sum(unit_usd * qty) AS BIGINT) AS sxy,
               CAST(sum(unit_usd * unit_usd) AS BIGINT) AS sxx
        FROM li GROUP BY seg
    ),
    seg_slope AS (
        SELECT seg, n,
               (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
               / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                   AS slope
        FROM mom
    ),
    pooled AS (
        SELECT (sum(n) * CAST(sum(sxy) AS DOUBLE)
                - CAST(sum(sx) AS DOUBLE) * sum(sy))
               / (sum(n) * CAST(sum(sxx) AS DOUBLE)
                  - CAST(sum(sx) AS DOUBLE) * sum(sx)) AS slope
        FROM mom
    )
    SELECT CAST(s.seg AS BIGINT) AS region_key, s.n AS n_lines,
           round(s.slope, 6) + 0 AS segment_slope,
           round(p.slope, 6) + 0 AS pooled_slope,
           CASE WHEN (s.slope > 0 AND p.slope < 0)
                  OR (s.slope < 0 AND p.slope > 0)
                THEN 1 ELSE 0 END AS reversed_flag
    FROM seg_slope s CROSS JOIN pooled p
    ORDER BY region_key
    """,
)
def q_simpsons_check(spark, sf_dir):
    """Simpson's-paradox detector — the aggregation-reversal audit run
    BEFORE anyone trusts a pooled trend: the price→quantity slope is
    fit per supplier region AND pooled, and any segment whose sign
    disagrees with the pooled sign flags — the one-query version of
    the classic admissions/kidney-stone trap, and the diagnostic that
    says which of a_cmh_test (pool, stratification is nuisance) or
    per-segment reporting (the segments ARE the story) is the honest
    summary.  All five slopes print side by side, so a reversal is
    inspected, not just alarmed.

    One fact-dim join chain produces per-segment EXACT moment BIGINTs
    (unit price as rounded integer dollars keeps Σx² small); both
    slope tiers are closed-form Cramer quotients of those integers —
    the pooled fit reuses the SAME per-segment sums (one scan, no
    second pass).
    """
    li, part, supplier, nation = tables(
        spark, sf_dir, "lineitem", "part", "supplier", "nation"
    )
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("n_regionkey").alias("seg"),
            F.col("l_quantity").cast("long").alias("qty"),
            F.round(F.col("l_extendedprice") / F.col("l_quantity"))
            .cast("long")
            .alias("unit_usd"),
        )
    )
    mom = j.groupBy("seg").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("unit_usd").cast("long").alias("sx"),
        F.sum("qty").cast("long").alias("sy"),
        F.sum(F.col("unit_usd") * F.col("qty")).cast("long").alias("sxy"),
        F.sum(F.col("unit_usd") * F.col("unit_usd"))
        .cast("long")
        .alias("sxx"),
    )
    n = F.col("n")
    seg_slope = mom.select(
        "seg",
        "n",
        (
            (n * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy"))
            / (
                n * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx")
            )
        ).alias("slope"),
    )
    pooled = mom.agg(
        (
            (
                F.sum("n") * F.sum("sxy").cast("double")
                - F.sum("sx").cast("double") * F.sum("sy")
            )
            / (
                F.sum("n") * F.sum("sxx").cast("double")
                - F.sum("sx").cast("double") * F.sum("sx")
            )
        ).alias("pslope")
    )
    return (
        seg_slope.crossJoin(F.broadcast(pooled))
        .select(
            F.col("seg").cast("long").alias("region_key"),
            F.col("n").alias("n_lines"),
            f6(F.col("slope")).alias("segment_slope"),
            f6(F.col("pslope")).alias("pooled_slope"),
            F.when(
                ((F.col("slope") > 0) & (F.col("pslope") < 0))
                | ((F.col("slope") < 0) & (F.col("pslope") > 0)),
                1,
            )
            .otherwise(0)
            .alias("reversed_flag"),
        )
        .orderBy("region_key")
    )


@register(
    "q_threshold_profit",
    """
    WITH mx AS (
        SELECT max(CAST(round(o_totalprice * 100) AS BIGINT)) AS maxc
        FROM orders
    ),
    scored AS (
        SELECT CAST(floor(CAST(round(o_totalprice * 100) AS BIGINT) * 10
                          / (mx.maxc + 1)) AS BIGINT) AS score,
               CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS y
        FROM orders CROSS JOIN mx
    ),
    cell AS (
        SELECT score, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS pos
        FROM scored GROUP BY score
    ),
    sweep AS (
        SELECT t.t AS threshold,
               CAST(sum(CASE WHEN c.score >= t.t THEN c.pos ELSE 0 END)
                    AS BIGINT) AS tp,
               CAST(sum(CASE WHEN c.score >= t.t THEN c.n - c.pos
                             ELSE 0 END) AS BIGINT) AS fp,
               CAST(sum(CASE WHEN c.score < t.t THEN c.pos ELSE 0 END)
                    AS BIGINT) AS fn
        FROM (SELECT unnest(range(0, 11)) AS t) t CROSS JOIN cell c
        GROUP BY t.t
    ),
    profit AS (
        SELECT threshold, tp, fp, fn,
               CAST(30 * tp - 10 * fp - 5 * fn AS BIGINT) AS profit_usd
        FROM sweep
    ),
    best AS (
        SELECT CAST(max_by(threshold, profit_usd
                           * 100 - threshold) AS BIGINT) AS t_star
        FROM profit
    )
    SELECT p.threshold, p.tp, p.fp, p.fn, p.profit_usd,
           CASE WHEN p.threshold = b.t_star THEN 1 ELSE 0 END
               AS chosen_flag
    FROM profit p CROSS JOIN best b
    ORDER BY p.threshold
    """,
)
def q_threshold_profit(spark, sf_dir):
    """Cost-sensitive threshold optimization — the profit curve that
    turns a SCORE into a DECISION: sweeping every cutoff of the
    relative-price-decile score (a_logistic_irls/q_woe_iv's feature)
    against an asymmetric value matrix (true positive +$30, false
    positive −$10, missed positive −$5), report the full
    profit-vs-threshold curve and flag the argmax (deterministic
    max_by with a threshold tiebreak folded into the ordering key).
    Accuracy-maximizing cutoffs are profit-suboptimal whenever costs
    are asymmetric — which is always; this key makes the right cutoff
    a query, the r_epsilon_slate of classification.

    One scan builds the bounded score×outcome cells; the 11-threshold
    sweep is a cross join against those ≤10 cells (never the fact
    table); counts and profit are exact BIGINTs end to end.
    """
    orders = load_table(spark, sf_dir, "orders")
    mx = orders.agg(
        F.max(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "maxc"
        )
    )
    scored = orders.crossJoin(F.broadcast(mx)).select(
        F.floor(
            F.round(F.col("o_totalprice") * 100).cast("long")
            * 10
            / (F.col("maxc") + 1)
        )
        .cast("long")
        .alias("score"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("y"),
    )
    cell = scored.groupBy("score").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    ts = spark.range(0, 11).select(F.col("id").cast("long").alias("threshold"))
    sweep = (
        ts.crossJoin(F.broadcast(cell))
        .groupBy("threshold")
        .agg(
            F.sum(
                F.when(
                    F.col("score") >= F.col("threshold"), F.col("pos")
                ).otherwise(0)
            )
            .cast("long")
            .alias("tp"),
            F.sum(
                F.when(
                    F.col("score") >= F.col("threshold"),
                    F.col("n") - F.col("pos"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("fp"),
            F.sum(
                F.when(
                    F.col("score") < F.col("threshold"), F.col("pos")
                ).otherwise(0)
            )
            .cast("long")
            .alias("fn"),
        )
    )
    profit = sweep.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        (30 * F.col("tp") - 10 * F.col("fp") - 5 * F.col("fn"))
        .cast("long")
        .alias("profit_usd"),
    )
    best = profit.agg(
        F.expr("max_by(threshold, profit_usd * 100 - threshold)")
        .cast("long")
        .alias("t_star")
    )
    return (
        profit.crossJoin(F.broadcast(best))
        .select(
            "threshold",
            "tp",
            "fp",
            "fn",
            "profit_usd",
            F.when(F.col("threshold") == F.col("t_star"), 1)
            .otherwise(0)
            .alias("chosen_flag"),
        )
        .orderBy("threshold")
    )


@register(
    "q_pipe_syntax",
    """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS revenue_cents,
           round(avg(l_quantity), 6) + 0 AS avg_qty
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01'
      AND l_shipdate < DATE '1997-01-01'
    GROUP BY l_returnflag
    ORDER BY revenue_cents DESC, l_returnflag
    """,
)
def q_pipe_syntax(spark, sf_dir):
    """SQL pipe syntax (Spark 4.0's `|>` operator chains, SPARK-49555 —
    the GoogleSQL-inspired linear form): the same shipped-1996 returns
    report every warehouse writes, expressed as FROM |> WHERE |>
    EXTEND |> AGGREGATE ... GROUP BY |> ORDER BY — each stage consumes
    the previous stage's output top-to-bottom, the way the optimizer
    actually sees it. The DuckDB oracle is the equivalent classic
    SELECT, so the key also PROVES pipe syntax is pure sugar: identical
    rows, schema, and hash.

    Catalyst parses pipes into the same logical plan as the classic
    form — one partial+final HashAggregate behind a pushed date filter
    (the per-line revenue snaps to exact BIGINT cents inside EXTEND
    before the sum). Nothing about the plan, and therefore nothing
    about the 100 TB story, changes with the syntax."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "pipe_lineitem"
    )
    return spark.sql(
        """
        FROM pipe_lineitem
        |> WHERE l_shipdate >= DATE '1996-01-01'
           AND l_shipdate < DATE '1997-01-01'
        |> EXTEND CAST(round(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT) AS line_cents
        |> AGGREGATE CAST(count(*) AS BIGINT) AS n_lines,
                     CAST(sum(line_cents) AS BIGINT) AS revenue_cents,
                     round(avg(l_quantity), 6) + 0.0 AS avg_qty
           GROUP BY l_returnflag
        |> SELECT l_returnflag, n_lines, revenue_cents, avg_qty
        |> ORDER BY revenue_cents DESC, l_returnflag
        """
    )


@register(
    "q_join_card_est",
    """
    WITH cl AS (SELECT user_id AS k, count(*) AS c FROM events GROUP BY 1),
    cr AS (SELECT o_custkey AS k, count(*) AS c FROM orders GROUP BY 1),
    sl AS (SELECT sum(c) AS n_l, count(*) AS ndv_l FROM cl),
    sr AS (SELECT sum(c) AS n_r, count(*) AS ndv_r FROM cr),
    actual AS (
        SELECT coalesce(sum(cl.c * cr.c), 0) AS actual_rows
        FROM cl JOIN cr ON cl.k = cr.k
    ),
    ml AS (SELECT k, c FROM cl ORDER BY c DESC, k LIMIT 5),
    mr AS (SELECT k, c FROM cr ORDER BY c DESC, k LIMIT 5),
    matched AS (
        SELECT coalesce(sum(ml.c * mr.c), 0) AS mcv_rows,
               coalesce(sum(ml.c), 0) AS ml_matched,
               coalesce(sum(mr.c), 0) AS mr_matched,
               count(*) AS n_matched
        FROM ml JOIN mr ON ml.k = mr.k
    ),
    est AS (
        SELECT (sl.n_l * sr.n_r)
                   // (CASE WHEN sl.ndv_l > sr.ndv_r
                            THEN sl.ndv_l ELSE sr.ndv_r END)
                   AS est_uniform,
               m.mcv_rows
                   + ((sl.n_l - m.ml_matched) * (sr.n_r - m.mr_matched))
                     // (CASE WHEN sl.ndv_l - m.n_matched
                                   > sr.ndv_r - m.n_matched
                              THEN (CASE WHEN sl.ndv_l - m.n_matched < 1
                                         THEN 1 ELSE sl.ndv_l - m.n_matched
                                    END)
                              ELSE (CASE WHEN sr.ndv_r - m.n_matched < 1
                                         THEN 1 ELSE sr.ndv_r - m.n_matched
                                    END)
                         END)
                   AS est_mcv,
               a.actual_rows
        FROM sl CROSS JOIN sr CROSS JOIN matched m CROSS JOIN actual a
    )
    SELECT est.estimator, est.est_rows, est.actual_rows,
           (est.est_rows * 10000) // est.actual_rows AS err_bp
    FROM (
        SELECT 'uniform' AS estimator, CAST(est_uniform AS BIGINT)
                   AS est_rows, CAST(actual_rows AS BIGINT) AS actual_rows
        FROM est
        UNION ALL
        SELECT 'mcv', CAST(est_mcv AS BIGINT), CAST(actual_rows AS BIGINT)
        FROM est
    ) est
    ORDER BY est.estimator
    """,
)
def q_join_card_est(spark, sf_dir):
    """Join-cardinality estimation audit — the cost-based-optimizer
    arithmetic that picks 100 TB join orders, run against ground truth.
    For events.user_id ⋈ orders.o_custkey (a deliberately
    partial-domain-overlap pair) it computes the textbook uniform
    estimate |L|·|R| / max(ndv_L, ndv_R) and a Postgres-style MCV
    refinement (top-5 most-common values matched exactly, the remainder
    uniform over the residual NDVs), then joins the per-key count frames
    to get the EXACT output cardinality and reports each estimator's
    error in basis points. The audit shape is how you validate CBO stats
    pipelines: if err_bp drifts far from 10000, ANALYZE cadence or MCV
    list length is wrong for the workload.

    Scale design: per-key count frames are the only data-sized work (two
    partial-agg shuffles — the same stats ANALYZE already collects);
    MCVs, scalars, and both estimates run on 1-to-5-row frames stitched
    with broadcast cross joins, never a driver collect. All arithmetic
    is BIGINT with integer division so both engines agree bit-for-bit.
    """
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    # r17 (guide §2.4/§5): each per-key count frame fed its scalar stats,
    # the exact-cardinality join, and the MCV top-5 uncached (3 fact
    # scans per side). Cache both — they are the ANALYZE-stats frames the
    # docstring describes, |distinct keys| rows.
    cl = events.groupBy(F.col("user_id").alias("k")).agg(
        F.count("*").alias("c")
    ).cache()
    cr = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count("*").alias("c")
    ).cache()
    sl = cl.agg(F.sum("c").alias("n_l"), F.count("*").alias("ndv_l"))
    sr = cr.agg(F.sum("c").alias("n_r"), F.count("*").alias("ndv_r"))
    actual = (
        cl.alias("cl")
        .join(cr.alias("cr"), "k")
        .agg(
            F.coalesce(F.sum(F.col("cl.c") * F.col("cr.c")), F.lit(0))
            .alias("actual_rows")
        )
    )

    def mcv(cnt):
        # TakeOrderedAndProject: partial per-partition top-5 then a 5-row
        # merge — never a single-partition global window sort.
        return cnt.orderBy(F.col("c").desc(), "k").limit(5).select("k", "c")

    matched = (
        mcv(cl).alias("ml")
        .join(mcv(cr).alias("mr"), "k")
        .agg(
            F.coalesce(F.sum(F.col("ml.c") * F.col("mr.c")), F.lit(0))
            .alias("mcv_rows"),
            F.coalesce(F.sum("ml.c"), F.lit(0)).alias("ml_matched"),
            F.coalesce(F.sum("mr.c"), F.lit(0)).alias("mr_matched"),
            F.count("*").alias("n_matched"),
        )
    )
    est = (
        sl.crossJoin(F.broadcast(sr))
        .crossJoin(F.broadcast(matched))
        .crossJoin(F.broadcast(actual))
        .select(
            F.expr(
                "(n_l * n_r) div greatest(ndv_l, ndv_r)"
            ).alias("est_uniform"),
            F.expr(
                "mcv_rows + ((n_l - ml_matched) * (n_r - mr_matched))"
                " div greatest(greatest(ndv_l - n_matched, 1),"
                "              greatest(ndv_r - n_matched, 1))"
            ).alias("est_mcv"),
            "actual_rows",
        )
    )
    rows = est.select(
        F.lit("uniform").alias("estimator"),
        F.col("est_uniform").cast("long").alias("est_rows"),
        F.col("actual_rows").cast("long").alias("actual_rows"),
    ).unionByName(
        est.select(
            F.lit("mcv").alias("estimator"),
            F.col("est_mcv").cast("long").alias("est_rows"),
            F.col("actual_rows").cast("long").alias("actual_rows"),
        )
    )
    return rows.select(
        "estimator",
        "est_rows",
        "actual_rows",
        F.expr("(est_rows * 10000) div actual_rows").alias("err_bp"),
    ).orderBy("estimator")


@register(
    "q_sql_scripting",
    """
    WITH RECURSIVE ext AS (
        SELECT max(CAST(round(o_totalprice*100) AS BIGINT)) AS maxc,
               (sum(CAST(round(o_totalprice*100) AS BIGINT))+1)//2 AS half
        FROM orders
    ),
    bi AS (
        SELECT 0 AS i, CAST(0 AS BIGINT) AS lo, e.maxc AS hi, e.half AS half
        FROM ext e
        UNION ALL
        SELECT i+1,
               CASE WHEN below >= half THEN lo ELSE mid END,
               CASE WHEN below >= half THEN mid ELSE hi END,
               half
        FROM (
            SELECT i, lo, hi, half, (lo+hi)//2 AS mid,
                   (SELECT coalesce(sum(CAST(round(o_totalprice*100)
                                             AS BIGINT)), 0)
                    FROM orders
                    WHERE CAST(round(o_totalprice*100) AS BIGINT)
                          <= (lo+hi)//2) AS below
            FROM bi WHERE i < 12
        ) s
    )
    SELECT lo AS lo_cents, hi AS hi_cents, CAST(i AS BIGINT) AS n_iter
    FROM bi WHERE i = 12
    """,
)
def q_sql_scripting(spark, sf_dir):
    """Spark 4 SQL scripting (SPARK-48338 BEGIN/DECLARE/WHILE/IF) driving
    a data-dependent control loop entirely inside the engine: a 12-step
    bisection for the revenue-median price cutoff (the smallest cents
    value P with revenue-at-or-below-P >= half the total). Each loop
    iteration's predicate depends on the previous aggregate — classic
    "needs a driver loop" shape, now expressible as ONE multi-statement
    SQL script with session variables; the DuckDB oracle replays the
    SAME 12 steps as a recursive CTE with a correlated aggregate, so
    the two control-flow dialects are pinned against each other
    bit-for-bit (q_pipe_syntax's treatment applied to scripting).

    Scale: each iteration is one pushed-predicate aggregate scan —
    12 passes total, independent of row count; the production shortcut
    (one pre-aggregated cents histogram, then bisect the 1e4-bucket
    frame) drops it to 1 scan + 12 metadata steps, same script shape.
    The script runs where the data lives; no driver-side loop state.
    """
    from ..session import load_table as _lt

    spark.conf.set("spark.sql.scripting.enabled", "true")
    _lt(spark, sf_dir, "orders").createOrReplaceTempView(
        "npc_script_orders"
    )
    return spark.sql(
        """
        BEGIN
          DECLARE lo BIGINT DEFAULT 0;
          DECLARE hi BIGINT DEFAULT 0;
          DECLARE mid BIGINT DEFAULT 0;
          DECLARE below BIGINT DEFAULT 0;
          DECLARE half BIGINT DEFAULT 0;
          DECLARE i INT DEFAULT 0;
          SET hi = (SELECT max(CAST(round(o_totalprice * 100) AS BIGINT))
                    FROM npc_script_orders);
          SET half = (SELECT (sum(CAST(round(o_totalprice * 100)
                                       AS BIGINT)) + 1) DIV 2
                      FROM npc_script_orders);
          WHILE i < 12 DO
            SET mid = (lo + hi) DIV 2;
            SET below = (SELECT coalesce(sum(CAST(round(o_totalprice * 100)
                                                  AS BIGINT)), 0)
                         FROM npc_script_orders
                         WHERE CAST(round(o_totalprice * 100) AS BIGINT)
                               <= mid);
            IF below >= half THEN
              SET hi = mid;
            ELSE
              SET lo = mid;
            END IF;
            SET i = i + 1;
          END WHILE;
          SELECT lo AS lo_cents, hi AS hi_cents,
                 CAST(i AS BIGINT) AS n_iter;
        END
        """
    )


# q_sql_scripting_hist's cached cents histogram, memoized per
# (app_id, sf_dir) so repeated invocations in one session reuse ONE
# cached frame instead of accumulating orphans (round-14 advice).
_SCRIPT_HIST_SHARED: dict = {}


@register(
    "q_sql_scripting_hist",
    """
    WITH RECURSIVE hist AS (
        SELECT CAST(round(o_totalprice*100) AS BIGINT) AS cents,
               CAST(count(*) AS BIGINT) AS cnt
        FROM orders GROUP BY 1
    ),
    ext AS (
        SELECT max(cents) AS maxc, (sum(cents*cnt)+1)//2 AS half FROM hist
    ),
    bi AS (
        SELECT 0 AS i, CAST(0 AS BIGINT) AS lo, e.maxc AS hi, e.half AS half
        FROM ext e
        UNION ALL
        SELECT i+1,
               CASE WHEN below >= half THEN lo ELSE mid END,
               CASE WHEN below >= half THEN mid ELSE hi END,
               half
        FROM (
            SELECT i, lo, hi, half, (lo+hi)//2 AS mid,
                   (SELECT coalesce(sum(cents*cnt), 0)
                    FROM hist
                    WHERE cents <= (lo+hi)//2) AS below
            FROM bi WHERE i < 12
        ) s
    )
    SELECT lo AS lo_cents, hi AS hi_cents, CAST(i AS BIGINT) AS n_iter
    FROM bi WHERE i = 12
    """,
)
def q_sql_scripting_hist(spark, sf_dir):
    """Production twin of ``q_sql_scripting``: the SAME 12-step
    BEGIN/WHILE bisection script, but against a pre-aggregated cents
    histogram instead of the raw orders table — 1 full scan instead of
    12 at 100 TB. The histogram (``cents -> cnt``) is built once,
    cached, and exposed as a temp view; every WHILE iteration's
    ``below`` aggregate is then a metadata-sized in-memory scan of a
    bounded frame (|distinct cents| <= the price-grid cardinality,
    ~1e4 on TPC-H-shaped prices — an axis that does NOT grow with row
    count). ``sum(cents*cnt)`` over the histogram is bit-identical to
    ``sum(cents)`` over orders, so the bisection trajectory — and the
    final (lo, hi) bracket — equals the 12-scan key's exactly;
    tests/test_round14.py pins the two keys' results against each
    other the way the ``*_capped`` twins pin their audit tiers.

    Scale: this is the plan the 12-scan key's docstring designs. The
    histogram groupBy is the only data-sized shuffle; the 12 script
    iterations cost O(distinct-cents) each against the cached frame,
    independent of table size. At 1000 executors the cached histogram
    is a few KB per core — the control loop becomes driver-latency
    bound, which is the floor for any data-dependent loop.
    """
    from ..session import load_table as _lt

    spark.conf.set("spark.sql.scripting.enabled", "true")
    # Memoized per (app_id, sf_dir) like _LPA_SHARED: re-invocations
    # (bench warm passes, sweep re-runs) must reuse the cached
    # histogram, not cache a NEW frame each call — temp-view
    # replacement does not unpersist the prior frame, so the old
    # pattern accumulated orphaned cache entries (round-14 advice).
    memo_key = (spark.sparkContext.applicationId, sf_dir)
    from ..session import evict_superseded_memo as _evict

    _evict(_SCRIPT_HIST_SHARED, memo_key[0], sf_dir)
    hist = _SCRIPT_HIST_SHARED.get(memo_key)
    if hist is None:
        hist = (
            _lt(spark, sf_dir, "orders")
            .groupBy(
                F.round(F.col("o_totalprice") * 100)
                .cast("long")
                .alias("cents")
            )
            .agg(F.count("*").cast("long").alias("cnt"))
        )
        # tiny bounded frame (price-grid axis): cache so the 12 WHILE
        # iterations hit memory, not the table scan; LRU-evictable.
        hist.cache()
        _SCRIPT_HIST_SHARED[memo_key] = hist
    elif not hist.storageLevel.useMemory:
        hist.cache()
    hist.createOrReplaceTempView("npc_script_hist")
    return spark.sql(
        """
        BEGIN
          DECLARE lo BIGINT DEFAULT 0;
          DECLARE hi BIGINT DEFAULT 0;
          DECLARE mid BIGINT DEFAULT 0;
          DECLARE below BIGINT DEFAULT 0;
          DECLARE half BIGINT DEFAULT 0;
          DECLARE i INT DEFAULT 0;
          SET hi = (SELECT max(cents) FROM npc_script_hist);
          SET half = (SELECT (sum(cents * cnt) + 1) DIV 2
                      FROM npc_script_hist);
          WHILE i < 12 DO
            SET mid = (lo + hi) DIV 2;
            SET below = (SELECT coalesce(sum(cents * cnt), 0)
                         FROM npc_script_hist
                         WHERE cents <= mid);
            IF below >= half THEN
              SET hi = mid;
            ELSE
              SET lo = mid;
            END IF;
            SET i = i + 1;
          END WHILE;
          SELECT lo AS lo_cents, hi AS hi_cents,
                 CAST(i AS BIGINT) AS n_iter;
        END
        """
    )


@register(
    "q_largest_remainder",
    """
    WITH rev AS (
        SELECT n.n_name AS nation,
               sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                        AS BIGINT)) AS cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    ),
    tot AS (SELECT sum(cents) AS t FROM rev),
    quota AS (
        SELECT r.nation, r.cents,
               (r.cents * 10000) // t.t AS bps_floor,
               (r.cents * 10000) % t.t AS rem
        FROM rev r CROSS JOIN tot t
    ),
    short AS (SELECT 10000 - sum(bps_floor) AS k FROM quota),
    ranked AS (
        SELECT nation, cents, bps_floor,
               row_number() OVER (ORDER BY rem DESC, nation) AS rk
        FROM quota
    )
    SELECT r.nation,
           CAST(r.cents AS BIGINT) AS revenue_cents,
           CAST(r.bps_floor AS BIGINT) AS bps_floor,
           CAST(r.bps_floor + CASE WHEN r.rk <= s.k THEN 1 ELSE 0 END
                AS BIGINT) AS bps_final
    FROM ranked r CROSS JOIN short s
    ORDER BY r.nation
    """,
)
def q_largest_remainder(spark, sf_dir):
    """Largest-remainder (Hamilton) apportionment — the exact-integer
    allocation every reporting pipeline eventually needs: divide 10000
    basis points of revenue share across nations so the allocations SUM
    EXACTLY to 10000 (naive per-row rounding drifts by ±n/2 bps and the
    drill-down stops reconciling with the total). Floor quotas by
    integer division, then hand the shortfall out one bp at a time to
    the largest remainders (remainder desc, nation tiebreak) — the same
    algorithm that seats parliaments.

    Scale: the revenue rollup is the only data-sized work (three
    FK joins + one bounded-axis agg); quota math and the remainder rank
    run on the 25-nation frame (a bounded window — at a million-segment
    allocation the rank becomes the range-partitioned top-k shortfall
    selection). Everything is BIGINT; Σbps_final = 10000 is pinned by
    pytest as the metric's defining property.
    """
    li, orders, cust, nation = tables(
        spark, sf_dir, "lineitem", "orders", "customer", "nation"
    )
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            ).alias("cents")
        )
        # r17 (guide §2.4/§5): the 3-join revenue rollup is the only
        # data-sized work and fed total/quota/shortfall/final uncached —
        # cache the 25-nation frame (and the quota math once) so the fact
        # tables scan once.
        .cache()
    )
    tot = rev.agg(F.sum("cents").alias("t"))
    quota = rev.crossJoin(F.broadcast(tot)).select(
        "nation",
        "cents",
        F.expr("(cents * 10000) div t").alias("bps_floor"),
        F.expr("(cents * 10000) % t").alias("rem"),
    ).cache()
    short = quota.agg(
        (F.lit(10000) - F.sum("bps_floor")).alias("k")
    )
    wr = Window.orderBy(F.col("rem").desc(), "nation")
    return (
        quota.withColumn("rk", F.row_number().over(wr))
        .crossJoin(F.broadcast(short))
        .select(
            "nation",
            F.col("cents").cast("long").alias("revenue_cents"),
            F.col("bps_floor").cast("long").alias("bps_floor"),
            (
                F.col("bps_floor")
                + F.when(F.col("rk") <= F.col("k"), 1).otherwise(0)
            ).cast("long").alias("bps_final"),
        )
        .orderBy("nation")
    )


@register(
    "q_attribution_shapley",
    """
    WITH u AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS hv,
               max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS hc,
               max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS hs,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
        FROM events GROUP BY user_id
    ),
    cells AS (
        SELECT hv, hc, hs, CAST(count(*) AS BIGINT) AS nu,
               CAST(sum(conv) AS BIGINT) AS nc
        FROM u WHERE hv + hc + hs > 0 GROUP BY 1, 2, 3
    ),
    v AS (
        SELECT
          sum(CASE WHEN hc = 0 AND hs = 0 THEN nc ELSE 0 END) * 1.0
            / greatest(sum(CASE WHEN hc = 0 AND hs = 0 THEN nu ELSE 0 END), 1)
            AS v_v,
          sum(CASE WHEN hv = 0 AND hs = 0 THEN nc ELSE 0 END) * 1.0
            / greatest(sum(CASE WHEN hv = 0 AND hs = 0 THEN nu ELSE 0 END), 1)
            AS v_c,
          sum(CASE WHEN hv = 0 AND hc = 0 THEN nc ELSE 0 END) * 1.0
            / greatest(sum(CASE WHEN hv = 0 AND hc = 0 THEN nu ELSE 0 END), 1)
            AS v_s,
          sum(CASE WHEN hs = 0 THEN nc ELSE 0 END) * 1.0
            / greatest(sum(CASE WHEN hs = 0 THEN nu ELSE 0 END), 1) AS v_vc,
          sum(CASE WHEN hc = 0 THEN nc ELSE 0 END) * 1.0
            / greatest(sum(CASE WHEN hc = 0 THEN nu ELSE 0 END), 1) AS v_vs,
          sum(CASE WHEN hv = 0 THEN nc ELSE 0 END) * 1.0
            / greatest(sum(CASE WHEN hv = 0 THEN nu ELSE 0 END), 1) AS v_cs,
          sum(nc) * 1.0 / greatest(sum(nu), 1) AS v_vcs
        FROM cells
    )
    SELECT channel,
           round(v_solo, 6) + 0 AS v_solo,
           round(shapley, 6) + 0 AS shapley_credit,
           round(v_vcs, 6) + 0 AS v_grand
    FROM (
        SELECT 'click' AS channel, v_c AS v_solo, v_vcs,
               (2 * v_c + (v_vc - v_v) + (v_cs - v_s)
                + 2 * (v_vcs - v_vs)) / 6.0 AS shapley
        FROM v
        UNION ALL
        SELECT 'signup', v_s, v_vcs,
               (2 * v_s + (v_vs - v_v) + (v_cs - v_c)
                + 2 * (v_vcs - v_vc)) / 6.0
        FROM v
        UNION ALL
        SELECT 'view', v_v, v_vcs,
               (2 * v_v + (v_vc - v_c) + (v_vs - v_s)
                + 2 * (v_vcs - v_cs)) / 6.0
        FROM v
    )
    ORDER BY channel
    """,
)
def q_attribution_shapley(spark, sf_dir):
    """Shapley-value channel attribution — the cooperative-game answer
    to 'which touch deserves the conversion credit', the principled
    alternative to last-touch (q_attribution_last_touch), position
    decay (q_attribution_position), and Markov removal effects
    (q_attribution_markov): the coalition value v(S) is the observed
    conversion rate of users whose touched-channel set is contained in
    S, and each channel's credit is its exact Shapley value over the
    3-channel lattice — weights 2/6, 1/6, 1/6, 2/6 over the marginal
    contributions, spelled out term by term so both engines evaluate
    the identical expression tree.  Efficiency (sum of credits =
    v(grand) − v(empty)) is the accounting identity pytest pins.

    Scale: ONE events scan to per-user flags, one 8-cell subset
    census, then 1-row arithmetic — with c channels the lattice is
    2^c, so exact Shapley is viable to c ~ 15-20 on the SAME census
    plan (beyond that you sample permutations; the census shuffle is
    unchanged).  The expensive thing at 100 TB is the per-user
    groupBy, which is map-side combinable on the 4 flag maxes.
    """
    ev = load_table(spark, sf_dir, "events")
    flag = lambda t: F.max(  # noqa: E731
        F.when(F.col("event_type") == t, 1).otherwise(0)
    )
    u = ev.groupBy("user_id").agg(
        flag("view").alias("hv"),
        flag("click").alias("hc"),
        flag("signup").alias("hs"),
        flag("purchase").alias("conv"),
    )
    cells = (
        u.where(F.col("hv") + F.col("hc") + F.col("hs") > 0)
        .groupBy("hv", "hc", "hs")
        .agg(
            F.count("*").cast("long").alias("nu"),
            F.sum("conv").cast("long").alias("nc"),
        )
    )

    def rate(cond):
        return F.sum(F.when(cond, F.col("nc")).otherwise(0)) * 1.0 / F.greatest(
            F.sum(F.when(cond, F.col("nu")).otherwise(0)), F.lit(1)
        )

    t = F.lit(True)
    v = cells.agg(
        rate((F.col("hc") == 0) & (F.col("hs") == 0)).alias("v_v"),
        rate((F.col("hv") == 0) & (F.col("hs") == 0)).alias("v_c"),
        rate((F.col("hv") == 0) & (F.col("hc") == 0)).alias("v_s"),
        rate(F.col("hs") == 0).alias("v_vc"),
        rate(F.col("hc") == 0).alias("v_vs"),
        rate(F.col("hv") == 0).alias("v_cs"),
        rate(t).alias("v_vcs"),
    )

    def row(channel, solo, shapley_expr):
        return v.select(
            F.lit(channel).alias("channel"),
            f6(F.col(solo)).alias("v_solo"),
            f6(shapley_expr).alias("shapley_credit"),
            f6(F.col("v_vcs")).alias("v_grand"),
        )

    c = F.col
    sh_view = (
        2 * c("v_v") + (c("v_vc") - c("v_c")) + (c("v_vs") - c("v_s"))
        + 2 * (c("v_vcs") - c("v_cs"))
    ) / 6.0
    sh_click = (
        2 * c("v_c") + (c("v_vc") - c("v_v")) + (c("v_cs") - c("v_s"))
        + 2 * (c("v_vcs") - c("v_vs"))
    ) / 6.0
    sh_signup = (
        2 * c("v_s") + (c("v_vs") - c("v_v")) + (c("v_cs") - c("v_c"))
        + 2 * (c("v_vcs") - c("v_vc"))
    ) / 6.0
    return (
        row("click", "v_c", sh_click)
        .unionByName(row("signup", "v_s", sh_signup))
        .unionByName(row("view", "v_v", sh_view))
        .orderBy("channel")
    )


@register(
    "q_panel_fe",
    """
    WITH census AS (
        SELECT n.n_name AS nation,
               (year(o.o_orderdate) * 12 + month(o.o_orderdate)) AS ym,
               CAST(count(*) AS BIGINT) AS x,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) // 100 AS y
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2
    ),
    panel AS (
        SELECT sc.nation, sc.ym,
               coalesce(ce.x, 0) AS x, coalesce(ce.y, 0) AS y
        FROM (SELECT a.nation, b.ym
              FROM (SELECT DISTINCT nation FROM census) a,
                   (SELECT DISTINCT ym FROM census) b) sc
        LEFT JOIN census ce
          ON ce.nation = sc.nation AND ce.ym = sc.ym
    ),
    gm AS (SELECT avg(CAST(x AS DOUBLE)) AS mx, avg(CAST(y AS DOUBLE)) AS my,
                  CAST(count(*) AS BIGINT) AS n_cells
           FROM panel),
    im AS (SELECT nation, avg(CAST(x AS DOUBLE)) AS mxi,
                  avg(CAST(y AS DOUBLE)) AS myi
           FROM panel GROUP BY nation),
    tm AS (SELECT ym, avg(CAST(x AS DOUBLE)) AS mxt,
                  avg(CAST(y AS DOUBLE)) AS myt
           FROM panel GROUP BY ym),
    within AS (
        SELECT p.x - im.mxi - tm.mxt + gm.mx AS xw,
               p.y - im.myi - tm.myt + gm.my AS yw,
               p.x - gm.mx AS xp, p.y - gm.my AS yp,
               gm.n_cells
        FROM panel p
        JOIN im ON im.nation = p.nation
        JOIN tm ON tm.ym = p.ym
        CROSS JOIN gm
    )
    SELECT max(n_cells) AS n_cells,
           round(sum(xp * yp) / sum(xp * xp), 6) + 0 AS beta_pooled,
           round(sum(xw * yw) / sum(xw * xw), 6) + 0 AS beta_within,
           round(sum(xw * yw) * (sum(xw * yw) / sum(xw * xw))
                 / sum(yw * yw), 6) + 0 AS r2_within
    FROM within
    """,
)
def q_panel_fe(spark, sf_dir):
    """Two-way fixed-effects panel regression (the within estimator) of
    monthly revenue on monthly order count over the nation × month
    panel: double-demean both variables (subtract nation mean and
    month mean, add back the grand mean — algebraically identical to
    including nation + month dummies) and fit the single-regressor OLS
    on the demeaned frame, with the POOLED slope printed beside it so
    the bias the fixed effects absorb is visible in one row. This is
    the workhorse causal-panel specification (diff-in-diff's
    a_diff_in_diff is its 2×2 special case; this is the full panel).

    The panel is BALANCED by construction — the nation × month
    scaffold is zero-filled (a month with no orders for a nation is a
    real (0, 0) observation in a count panel) — which is exactly the
    condition under which double-demeaning equals the dummy-variable
    two-way OLS (pytest pins the equality against a numpy lstsq on
    the full dummy design).

    Scale: the panel census (nation × month, ≤25×~80 cells at any
    corpus size) is the only data-sized shuffle; the two margin tables
    are bounded-axis aggregates broadcast back onto the cells, and the
    estimator is one moment pass over the cell frame. Adding fixed
    effects costs two broadcast joins — never a dummy-variable matrix.
    """
    from ..session import load_table as _lt

    orders = _lt(spark, sf_dir, "orders")
    cust = _lt(spark, sf_dir, "customer")
    nat = _lt(spark, sf_dir, "nation")
    census = (
        orders.join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(nat, F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias(
                "ym"
            ),
        )
        .agg(
            F.count("*").cast("long").alias("x"),
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                .cast("long")
                / F.lit(100)
            )
            .cast("long")
            .alias("y"),
        )
        # r17 (guide §2.4/§5): census is the ONLY data-scale computation
        # and it fed 12 uncached consumers (scaffold axes, panel join,
        # then panel's own four consumers) — 36 parquet scan subtrees in
        # the plan. Cache it: bounded at ≤|nations|×|months| cells at any
        # corpus size.
        .cache()
    )
    # balanced scaffold: zero-order months are REAL (0, 0) panel cells
    # in a count panel — and balance is what makes double-demeaning
    # exactly the two-way dummy OLS
    scaffold = census.select("nation").distinct().crossJoin(
        census.select("ym").distinct()
    )
    # cached for the same reason: gm/im/tm/within each rescan the panel;
    # same bounded cell count as census.
    panel = scaffold.join(census, ["nation", "ym"], "left").select(
        "nation",
        "ym",
        F.coalesce(F.col("x"), F.lit(0)).alias("x"),
        F.coalesce(F.col("y"), F.lit(0)).alias("y"),
    ).cache()
    gm = panel.agg(
        F.avg(F.col("x").cast("double")).alias("mx"),
        F.avg(F.col("y").cast("double")).alias("my"),
        F.count("*").cast("long").alias("n_cells"),
    )
    im = panel.groupBy("nation").agg(
        F.avg(F.col("x").cast("double")).alias("mxi"),
        F.avg(F.col("y").cast("double")).alias("myi"),
    )
    tm = panel.groupBy("ym").agg(
        F.avg(F.col("x").cast("double")).alias("mxt"),
        F.avg(F.col("y").cast("double")).alias("myt"),
    )
    within = (
        panel.join(F.broadcast(im), "nation")
        .join(F.broadcast(tm), "ym")
        .crossJoin(F.broadcast(gm))
        .select(
            (
                F.col("x") - F.col("mxi") - F.col("mxt") + F.col("mx")
            ).alias("xw"),
            (
                F.col("y") - F.col("myi") - F.col("myt") + F.col("my")
            ).alias("yw"),
            (F.col("x") - F.col("mx")).alias("xp"),
            (F.col("y") - F.col("my")).alias("yp"),
            "n_cells",
        )
    )
    bw = F.sum(F.col("xw") * F.col("yw")) / F.sum(F.col("xw") * F.col("xw"))
    return within.agg(
        F.max("n_cells").alias("n_cells"),
        f6(
            F.sum(F.col("xp") * F.col("yp"))
            / F.sum(F.col("xp") * F.col("xp"))
        ).alias("beta_pooled"),
        f6(bw).alias("beta_within"),
        f6(
            F.sum(F.col("xw") * F.col("yw"))
            * bw
            / F.sum(F.col("yw") * F.col("yw"))
        ).alias("r2_within"),
    )


@register(
    "q_lift_curve",
    """
    WITH ret AS (
        SELECT l_orderkey,
               max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS y
        FROM lineitem GROUP BY 1
    ),
    g AS (
        SELECT CAST(floor(o_totalprice / 1000) AS BIGINT) AS s,
               CAST(sum(ret.y) AS BIGINT) AS pos,
               CAST(count(*) AS BIGINT) AS tot
        FROM orders JOIN ret ON l_orderkey = o_orderkey
        GROUP BY 1
    ),
    cum AS (
        SELECT s,
               CAST(sum(pos) OVER (ORDER BY s DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS tp,
               CAST(sum(tot) OVER (ORDER BY s DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS k,
               CAST(sum(pos) OVER () AS BIGINT) AS p,
               CAST(sum(tot) OVER () AS BIGINT) AS n
        FROM g
    ),
    dec AS (
        SELECT d.decile,
               min(c.k) AS k, min(c.tp) AS tp0
        FROM (SELECT unnest(range(1, 11)) AS decile) d
        JOIN cum c ON c.k * 10 >= d.decile * c.n
        GROUP BY d.decile
    )
    SELECT d.decile AS decile,
           d.k AS n_cum,
           c2.tp AS tp_cum,
           round(d.k * 1.0 / c2.n, 6) + 0 AS coverage,
           round(c2.tp * 1.0 / c2.p, 6) + 0 AS capture_rate,
           round((c2.tp * 1.0 / c2.p) / (d.k * 1.0 / c2.n), 6) + 0
               AS lift
    FROM dec d JOIN cum c2 ON c2.k = d.k
    ORDER BY decile
    """,
)
def q_lift_curve(spark, sf_dir):
    """Cumulative-gains / lift table for order price as a has-returned
    classifier, sampled at the ten decile thresholds: for each decile
    d, the shortest score-descending band prefix covering ≥ d/10 of
    orders, its capture rate tp/P, and lift = capture/coverage (a
    random scorer's lift is 1.0 everywhere; "decile-1 lift 2×" is the
    number campaign targeting actually acts on). The SCORECARD view of
    the exact ranking a_pr_auc integrates — AP/AUC say how good the
    ranking is overall, the lift table says what you GET at each
    spend level, and q_woe_iv says which attribute drives it.

    Exactness: built on the same $1000-band census as a_pr_auc
    (price-domain-bounded, ~500 rows at any corpus size); decile
    thresholds are exact integer comparisons (k·10 ≥ d·N avoids any
    float coverage), prefixes land on band boundaries (the honest
    grain — sub-band interpolation would invent rows), and every
    count is BIGINT.

    Scale: one map-side-combinable band census + two cumulative
    windows on the census frame + a 10-row threshold join — the
    a_pr_auc plan with a broadcast decile probe on top.
    """
    from ..session import load_table as _lt

    ret = (
        _lt(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.max(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("y")
        )
    )
    orders = _lt(spark, sf_dir, "orders")
    g = (
        orders.join(ret, orders.o_orderkey == ret.l_orderkey)
        .groupBy(
            F.floor(F.col("o_totalprice") / 1000).cast("long").alias("s")
        )
        .agg(
            F.sum("y").cast("long").alias("pos"),
            F.count("*").cast("long").alias("tot"),
        )
    )
    wdesc = Window.orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    cum = g.select(
        "s",
        F.sum("pos").over(wdesc).cast("long").alias("tp"),
        F.sum("tot").over(wdesc).cast("long").alias("k"),
        F.sum("pos").over(wall).cast("long").alias("p"),
        F.sum("tot").over(wall).cast("long").alias("n"),
    )
    deciles = spark.range(1, 11).select(F.col("id").alias("decile"))
    dec = (
        F.broadcast(deciles)
        .join(cum, cum.k * 10 >= F.col("decile") * cum.n)
        .groupBy("decile")
        .agg(F.min("k").alias("k"))
    )
    out = dec.join(cum, "k").select(
        "decile",
        F.col("k").alias("n_cum"),
        F.col("tp").alias("tp_cum"),
        f6(F.col("k") * 1.0 / F.col("n")).alias("coverage"),
        # try_divide: a corpus with NO positive class (p = 0) yields
        # NULL capture/lift like the DuckDB oracle, never an ANSI
        # crash (the a_pr_auc guard, same fixture property).
        f6(F.try_divide(F.col("tp") * 1.0, F.col("p"))).alias(
            "capture_rate"
        ),
        f6(
            F.try_divide(F.col("tp") * 1.0, F.col("p"))
            / (F.col("k") * 1.0 / F.col("n"))
        ).alias("lift"),
    )
    return out.orderBy("decile")


@register(
    "q_littles_law",
    """
    WITH ord AS (
        SELECT o.o_orderkey,
               CAST(o.o_orderdate AS DATE) AS od,
               CAST(max(l.l_shipdate) AS DATE) AS sd
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    ),
    span AS (
        SELECT min(od) AS d0, max(sd) AS d1,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(date_diff('day', od, sd)) AS BIGINT) AS dur
        FROM ord
    ),
    arr AS (SELECT od AS d, CAST(count(*) AS BIGINT) AS a
            FROM ord GROUP BY od),
    dep AS (SELECT sd AS d, CAST(count(*) AS BIGINT) AS c
            FROM ord GROUP BY sd),
    cal AS (
        SELECT unnest(generate_series(s.d0,
                                      s.d1 - INTERVAL 1 DAY,
                                      INTERVAL 1 DAY))::DATE AS d
        FROM span s
    ),
    open_ AS (
        SELECT cal.d,
               CAST(sum(coalesce(arr.a, 0)) OVER (ORDER BY cal.d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - sum(coalesce(dep.c, 0)) OVER (ORDER BY cal.d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS open_eod
        FROM cal LEFT JOIN arr ON arr.d = cal.d
                 LEFT JOIN dep ON dep.d = cal.d
    ),
    l AS (
        SELECT avg(CAST(open_eod AS DOUBLE)) AS l_avg,
               CAST(max(open_eod) AS BIGINT) AS peak_open,
               min(CASE WHEN open_eod = (SELECT max(open_eod) FROM open_)
                        THEN d END) AS peak_day,
               CAST(count(*) AS BIGINT) AS s_days
        FROM open_
    )
    SELECT sp.n AS n_orders, l.s_days AS span_days,
           round(CAST(sp.n AS DOUBLE) / l.s_days, 6) + 0
               AS lambda_per_day,
           round(CAST(sp.dur AS DOUBLE) / sp.n, 6) + 0 AS w_days,
           round(l.l_avg, 6) + 0 AS l_avg_open,
           l.peak_open, l.peak_day,
           round(l.l_avg / ((CAST(sp.n AS DOUBLE) / l.s_days)
                            * (CAST(sp.dur AS DOUBLE) / sp.n)), 6) + 0
               AS littles_ratio
    FROM span sp, l
    """,
)
def q_littles_law(spark, sf_dir):
    """Little's law audit on the order pipeline: L = λ·W, with all
    three measured INDEPENDENTLY — λ = orders/day over the span, W =
    mean order-to-last-ship latency, and L = the time-average
    end-of-day open-order count rebuilt from arrival/departure
    cumulative counters on a dense calendar (an order is open at end
    of day d iff ordered ≤ d < shipped). On a consistent ledger the
    ratio L/(λW) is EXACTLY 1 (Σ open-days ≡ Σ durations — the finite-
    horizon form of the law), so any deviation is a data-quality
    finding: lost departures, ships before orders, horizon clipping.
    The identity is the AUDIT every queueing readout (q_running_
    backlog's WIP series, q_erlang_staffing's λ) silently assumes;
    peak open + peak day print beside it as the capacity numbers.

    Exactness: arrival/departure counts and the cumsum census are
    BIGINT on the dense calendar (sequence-exploded, bounded axis);
    the three ratios are the only floats, and the ratio pins to
    1.000000 on both engines.

    Scale: one (order → last-ship) rollup is the data-sized pass; the
    calendar explode, two cumulative windows, and the averages all
    run on the ~2.4k-day axis regardless of corpus size.
    """
    from ..session import load_table as _lt

    orders = _lt(spark, sf_dir, "orders")
    li = _lt(spark, sf_dir, "lineitem")
    # r17 (guide §2.4/§5): this rollup is the only data-sized pass and it
    # fed SIX uncached consumers through span/arr/dep (14 parquet-scan
    # subtrees in the plan). Cache it — 3 narrow columns per order,
    # MEMORY_AND_DISK by default so it spills rather than OOMs at scale —
    # and the docstring's "one data-sized pass" becomes literally one.
    ord_ = (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            "o_orderkey", F.col("o_orderdate").cast("date").alias("od")
        )
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("sd"))
        .cache()
    )
    span = ord_.agg(
        F.min("od").alias("d0"),
        F.max("sd").alias("d1"),
        F.count("*").cast("long").alias("n"),
        F.sum(F.datediff("sd", "od")).cast("long").alias("dur"),
    )
    arr = ord_.groupBy(F.col("od").alias("d")).agg(
        F.count("*").cast("long").alias("a")
    )
    dep = ord_.groupBy(F.col("sd").alias("d")).agg(
        F.count("*").cast("long").alias("c")
    )
    # Explicit +1 day step, guarded: Spark's two-arg sequence defaults to
    # step -1 when start > stop, so a degenerate corpus where every order
    # ships on its order date (d0 == d1) would yield a DESCENDING 2-row
    # calendar including a pre-span day while DuckDB's generate_series is
    # empty. Matching generate_series: no open-interval days -> no rows.
    cal = span.select(
        F.explode(
            F.when(
                F.col("d1") > F.col("d0"),
                F.expr("sequence(d0, date_sub(d1, 1), interval 1 day)"),
            ).otherwise(F.expr("CAST(array() AS array<date>)"))
        ).alias("d")
    )
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    # day-axis bounded (~2.4k rows); cached because peak and l both scan it
    open_ = (
        cal.join(arr, "d", "left")
        .join(dep, "d", "left")
        .select(
            "d",
            (
                F.sum(F.coalesce(F.col("a"), F.lit(0))).over(wcum)
                - F.sum(F.coalesce(F.col("c"), F.lit(0))).over(wcum)
            )
            .cast("long")
            .alias("open_eod"),
        )
        .cache()
    )
    peak = open_.agg(F.max("open_eod").alias("po"))
    l = (
        open_.crossJoin(F.broadcast(peak))
        .agg(
            F.avg(F.col("open_eod").cast("double")).alias("l_avg"),
            F.max("open_eod").cast("long").alias("peak_open"),
            F.min(
                F.when(F.col("open_eod") == F.col("po"), F.col("d"))
            ).alias("peak_day"),
            F.count("*").cast("long").alias("s_days"),
        )
    )
    # try_divide: on a same-day-ship corpus the open-day calendar is
    # EMPTY (s_days = 0) — NULL rates like DuckDB's /0, no ANSI crash
    lam = F.try_divide(F.col("n").cast("double"), F.col("s_days"))
    w = F.try_divide(F.col("dur").cast("double"), F.col("n"))
    return l.crossJoin(F.broadcast(span)).select(
        F.col("n").alias("n_orders"),
        F.col("s_days").alias("span_days"),
        f6(lam).alias("lambda_per_day"),
        f6(w).alias("w_days"),
        f6(F.col("l_avg")).alias("l_avg_open"),
        "peak_open",
        "peak_day",
        f6(F.try_divide(F.col("l_avg"), lam * w)).alias("littles_ratio"),
    )
