"""§2.7 scalar functions — date/time families.

Known divergences handled in the oracle SQL (SURVEY §2.7):
- Spark dayofweek = 1(Sun)..7  vs DuckDB 0(Sun)..6  -> oracle +1
- Spark datediff(end, start)   vs DuckDB date_diff('day', start, end)
- Spark year()/month()/... return INT vs DuckDB BIGINT -> Spark side cast long
- Spark from_unixtime returns a STRING; we use timestamp_seconds <->
  make_timestamp(us) for a typed round-trip instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register
from ..session import f6, load_table, tables


@register(
    "fn_date_parts",
    """
    SELECT event_id,
           year(ts) AS y, quarter(ts) AS q, month(ts) AS mo,
           day(ts) AS d, weekofyear(ts) AS woy,
           dayofweek(ts) + 1 AS dow,        -- DuckDB 0-based Sunday -> Spark 1-based
           hour(ts) AS h, minute(ts) AS mi
    FROM events
    """,
)
def fn_date_parts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    c = F.col("ts")
    return ev.select(
        "event_id",
        F.year(c).cast("long").alias("y"),
        F.quarter(c).cast("long").alias("q"),
        F.month(c).cast("long").alias("mo"),
        F.dayofmonth(c).cast("long").alias("d"),
        F.weekofyear(c).cast("long").alias("woy"),
        F.dayofweek(c).cast("long").alias("dow"),
        F.hour(c).cast("long").alias("h"),
        F.minute(c).cast("long").alias("mi"),
    )


@register(
    "fn_date_arith",
    """
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           o_orderdate + INTERVAL 30 DAY AS plus30,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           make_date(year(o_orderdate), month(o_orderdate), 1) AS first_of_month
    FROM orders
    """,
)
def fn_date_arith(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.date_trunc("month", d).alias("month_start"),
        F.timestamp_add("DAY", F.lit(30), d).alias("plus30"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("long").alias("days_since"),
        F.last_day(d).alias("month_end"),
        F.make_date(F.year(d), F.month(d), F.lit(1)).alias("first_of_month"),
    )


@register(
    "fn_date_format",
    """
    SELECT event_id,
           strftime(ts, '%Y-%m') AS ym,
           strftime(ts, '%Y-%m-%d %H') AS ymdh,
           CAST(floor(epoch(ts)) AS BIGINT) AS unix_s,
           make_timestamp(CAST(floor(epoch(ts)) AS BIGINT) * 1000000) AS ts_floor
    FROM events
    """,
)
def fn_date_format(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    c = F.col("ts")
    unix_s = F.unix_timestamp(c)
    return ev.select(
        "event_id",
        F.date_format(c, "yyyy-MM").alias("ym"),
        F.date_format(c, "yyyy-MM-dd HH").alias("ymdh"),
        unix_s.alias("unix_s"),
        F.timestamp_seconds(unix_s).alias("ts_floor"),
    )


@register(
    "fn_date_trunc",
    """
    SELECT o_orderkey,
           CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q_start,
           CAST(date_trunc('year', o_orderdate) AS DATE) AS y_start,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
           CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr
    FROM orders
    """,
)
def fn_date_trunc(spark, sf_dir):
    """Calendar bucketing: quarter/year truncation, ISO week number and ISO
    day-of-week (Monday=1) — the grains a reporting rollup actually uses.

    Engine alignment: Spark's `weekofyear` and DuckDB's are both ISO-8601;
    Spark has no isodow(), but `weekday()` (Monday=0) + 1 equals it exactly.
    All map-side codegen; no shuffle.
    """
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.date_trunc("quarter", d).cast("date").alias("q_start"),
        F.date_trunc("year", d).cast("date").alias("y_start"),
        F.weekofyear(d).cast("long").alias("iso_week"),
        (F.weekday(d) + 1).cast("long").alias("iso_dow"),
        F.quarter(d).cast("long").alias("qtr"),
    )


@register(
    "fn_make_datetime",
    """
    SELECT event_id,
           make_date(CAST(year(ts) AS INTEGER), CAST(month(ts) AS INTEGER),
                     CAST(day(ts) AS INTEGER)) AS d,
           CASE WHEN make_timestamp(CAST(year(ts) AS BIGINT),
                                    CAST(month(ts) AS BIGINT),
                                    CAST(day(ts) AS BIGINT),
                                    CAST(hour(ts) AS BIGINT),
                                    CAST(minute(ts) AS BIGINT),
                                    CAST(floor(second(ts)) AS DOUBLE))
                     = date_trunc('second', ts)
                THEN 1 ELSE 0 END AS rebuilt_matches
    FROM events WHERE event_id < 2000
    """,
)
def fn_make_datetime(spark, sf_dir):
    """Constructor surface: make_date / make_timestamp from extracted
    parts, verified by rebuilding each event's second-truncated timestamp
    from its own fields — the datetime-assembly functions ETL uses to
    build keys from split columns (the inverse of fn_date_parts).

    Pure map-side projection (no shuffle at all); the equality check is
    integer-part exact because both engines extract and reassemble the
    same microsecond-aligned values. DuckDB's make_timestamp takes
    seconds as DOUBLE; Spark's takes a DECIMAL — both get the exact
    floor()ed integer second, so no float boundary exists.
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    rebuilt = F.expr(
        "make_timestamp(year(ts), month(ts), day(ts),"
        " hour(ts), minute(ts), CAST(floor(second(ts)) AS DECIMAL(8,6)))"
    )
    return ev.select(
        "event_id",
        F.expr("make_date(year(ts), month(ts), day(ts))").alias("d"),
        F.when(rebuilt == F.date_trunc("second", "ts"), 1)
        .otherwise(0)
        .alias("rebuilt_matches"),
    )


@register(
    "fn_calendar_edges",
    """
    SELECT o_orderkey,
           CAST(last_day(o_orderdate) AS DATE) AS month_end,
           CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start,
           CAST(o_orderdate + ((8 - dayofweek(CAST(o_orderdate AS DATE))) % 7
                               + CASE WHEN (8 - dayofweek(CAST(o_orderdate AS DATE))) % 7 = 0
                                      THEN 7 ELSE 0 END)
                * INTERVAL 1 DAY AS DATE) AS next_monday,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3mo
    FROM orders WHERE o_orderkey <= 300
    ORDER BY o_orderkey
    """,
)
def fn_calendar_edges(spark, sf_dir):
    """Calendar-edge date functions: last_day (month end), quarter
    truncation, next_day('Monday') — strictly-after semantics — and
    add_months — the billing/close-of-period building blocks
    (fn_date_arith covers offsets; these snap to CALENDAR boundaries,
    where 'add 3 months to Jan 31' and 'next Monday from a Monday'
    are exactly the edge cases that silently disagree across engines).

    Spark's next_day returns the NEXT such weekday (strictly after);
    the oracle reproduces it from dayofweek arithmetic since DuckDB
    has no next_day — recorded engine divergence: DuckDB dayofweek is
    0-based Sunday, mirrored with the +1 convention used by
    a_cramers_v. add_months clamps to month length on both engines.
    Zero-shuffle projection, scan pushdown.
    """
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        orders.where(F.col("o_orderkey") <= 300)
        .select(
            "o_orderkey",
            F.last_day(d).alias("month_end"),
            F.date_trunc("quarter", d).cast("date").alias("quarter_start"),
            F.next_day(d, "Monday").alias("next_monday"),
            F.add_months(d, 3).alias("plus_3mo"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "fn_multiformat_ts",
    """
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS parsed_date,
           CAST(1 AS BIGINT) AS parse_ok
    FROM orders WHERE o_orderkey <= 300
    ORDER BY o_orderkey
    """,
)
def fn_multiformat_ts(spark, sf_dir):
    """Multi-format timestamp ingest: the try_to_timestamp fallback
    chain (`coalesce(try fmt1, try fmt2, try fmt3)`) over a column
    where every row arrives in ONE of several formats — the mixed-feed
    reality (US dates, ISO dates, compact dates in the same file) that
    a single to_timestamp() turns into a 2 AM pager. Rows are fanned
    deterministically across three formats by orderkey mod 3, then the
    chain recovers every one.

    try_to_timestamp returns NULL instead of throwing (ANSI-safe), so
    the chain is a pure codegen projection — no UDF, no exception
    control flow; the oracle checks recovered dates equal the
    originals (identity oracle, the fn_aes_roundtrip pattern).
    Unparseable rows would surface as parse_ok=0 — loudly countable,
    never a job-killing exception, which is the operational point.
    """
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    fmt = F.col("o_orderkey") % 3
    mixed = F.when(fmt == 0, F.date_format(d, "yyyy-MM-dd")).when(
        fmt == 1, F.date_format(d, "MM/dd/yyyy")
    ).otherwise(F.date_format(d, "yyyyMMdd"))
    parsed = F.coalesce(
        F.expr("try_to_timestamp(raw, 'yyyy-MM-dd')"),
        F.expr("try_to_timestamp(raw, 'MM/dd/yyyy')"),
        F.expr("try_to_timestamp(raw, 'yyyyMMdd')"),
    )
    return (
        orders.where(F.col("o_orderkey") <= 300)
        .select("o_orderkey", mixed.alias("raw"), d.alias("orig"))
        .select(
            "o_orderkey",
            parsed.cast("date").alias("parsed_date"),
            F.when(parsed.cast("date") == F.col("orig"), 1)
            .otherwise(0)
            .cast("long")
            .alias("parse_ok"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "fn_business_days",
    """
    WITH li AS (
        SELECT CAST(o.o_orderdate AS DATE) AS d1,
               CAST(l.l_shipdate AS DATE) AS d2
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate >= o.o_orderdate
    ),
    b AS (
        SELECT d1, d2,
               d2 - d1 AS cal_days,
               CAST(list_sum(list_transform(
                     range(0, CAST((d2 - d1) % 7 AS INTEGER)),
                     k -> CASE WHEN (dayofweek(d1) + k) % 7 IN (0, 6)
                               THEN 0 ELSE 1 END)) AS BIGINT)
                   AS partial,
               (d2 - d1) % 7 AS rem
        FROM li
    )
    SELECT CAST(CAST((cal_days) // 7 AS BIGINT) * 5
                + CASE WHEN rem = 0 THEN 0 ELSE partial END AS BIGINT)
               AS business_days,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(avg(CAST(cal_days AS DOUBLE)), 6) + 0 AS avg_cal_days
    FROM b GROUP BY 1 ORDER BY business_days
    """,
)
def fn_business_days(spark, sf_dir):
    """Business-day arithmetic — NETWORKDAYS for the lakehouse: SLA
    clocks, settlement windows, and delivery promises count WORKING
    days, and calendar-day latency keys (q_ship_latency) silently
    overstate breaches that span weekends.  Business days between
    order and ship = 5·⌊Δ/7⌋ + (weekday count of the partial week),
    the partial week resolved by a bounded 0..6 lambda walk from the
    start day-of-week — closed-form integer arithmetic, no calendar
    table, no UDF, and (unlike a calendar-table join) no extra
    shuffle: the whole computation rides the join projection.

    Cross-engine care: Spark dayofweek is 1=Sunday..7 while DuckDB's
    is 0=Sunday..6 (the SURVEY §2.7 divergence), so the weekend test
    is (dow0 + k) % 7 ∈ {0,6} with each engine's own offset
    normalized to the 0-based frame.  Output is the distribution of
    business-day latencies with the mean calendar gap alongside — the
    weekend inflation made visible.
    """
    li, orders = tables(spark, sf_dir, "lineitem", "orders")
    b = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            F.to_date("o_orderdate").alias("d1"),
            F.to_date("l_shipdate").alias("d2"),
        )
    )
    diff = F.datediff(F.col("d2"), F.col("d1"))
    dow0 = F.dayofweek("d1") - 1  # normalize Spark 1..7 to 0=Sunday
    partial = F.aggregate(
        F.sequence(F.lit(0), (diff % 7) - 1),
        F.lit(0).cast("long"),
        lambda acc, k: acc
        + F.when(((dow0 + k) % 7).isin(0, 6), 0).otherwise(1),
    )
    bdays = (
        F.floor(diff / 7) * 5
        + F.when(diff % 7 == 0, 0).otherwise(partial)
    ).cast("long")
    return (
        b.select(
            diff.cast("double").alias("cal_days"), bdays.alias("bdays")
        )
        .groupBy(F.col("bdays").alias("business_days"))
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            f6(F.avg("cal_days")).alias("avg_cal_days"),
        )
        .orderBy("business_days")
    )
