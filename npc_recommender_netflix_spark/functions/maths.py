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


@register(
    "fn_round_modes",
    """
    WITH v AS (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey <= 500
    ),
    t AS (
        -- exact tenths ending in 5: x = cents/10 is *.5 in dollars-of-ten
        SELECT o_orderkey, cents,
               cents // 10 AS d10, cents % 10 AS last_digit
        FROM v
    )
    SELECT o_orderkey,
           round(cents / 10.0, 6) + 0 AS tenths,
           CAST(CASE WHEN last_digit >= 5 THEN d10 + 1
                     ELSE d10 END AS BIGINT) AS half_up,
           CAST(CASE WHEN last_digit = 5
                     THEN d10 + (CASE WHEN d10 % 2 = 1 THEN 1 ELSE 0 END)
                     WHEN last_digit > 5 THEN d10 + 1
                     ELSE d10 END AS BIGINT) AS half_even
    FROM t
    ORDER BY o_orderkey
    """,
)
def fn_round_modes(spark, sf_dir):
    """Rounding-mode surface: HALF_UP (`round`) vs HALF_EVEN banker's
    rounding (`bround`) on exact decimal ties — the policy choice that
    moves real money at aggregate scale (HALF_UP biases sums upward by
    ~0.5 unit per tie; banker's rounding is why financial regulators
    specify HALF_EVEN). The ties are constructed exactly: integer
    cents divided by 10 puts the tie digit in a decimal place both
    engines represent exactly.

    Spark computes both modes natively (round/bround); the oracle
    reproduces them with pure integer arithmetic (last-digit
    case analysis — DuckDB has no banker's-rounding builtin, which is
    itself the portability lesson this key records). Zero-shuffle
    projection with scan pushdown.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    v = orders.where(F.col("o_orderkey") <= 500).select(
        "o_orderkey", cents.alias("cents")
    )
    tenths = F.col("cents") / 10.0
    return v.select(
        "o_orderkey",
        (F.round(tenths, 6) + 0.0).alias("tenths"),
        F.round(tenths, 0).cast("long").alias("half_up"),
        F.bround(tenths, 0).cast("long").alias("half_even"),
    ).orderBy("o_orderkey")


@register(
    "fn_haversine",
    """
    WITH pts AS (
        SELECT c_custkey,
               radians(((c_custkey * 48271) % 180) - 90.0
                       + ((c_custkey * 137) % 1000) / 1000.0) AS lat,
               radians(((c_custkey * 69621) % 360) - 180.0
                       + ((c_custkey * 251) % 1000) / 1000.0) AS lon
        FROM customer WHERE c_custkey <= 200
    ),
    hq AS (SELECT radians(47.3769) AS qlat, radians(8.5417) AS qlon)
    SELECT c_custkey,
           round(2 * 6371.0088 * asin(sqrt(
               power(sin((lat - qlat) / 2), 2)
               + cos(qlat) * cos(lat) * power(sin((lon - qlon) / 2), 2)
           )), 6) + 0 AS dist_km
    FROM pts CROSS JOIN hq
    ORDER BY c_custkey
    """,
)
def fn_haversine(spark, sf_dir):
    """Great-circle distance (haversine) from every customer's synthetic
    coordinate to one query point — the geo scalar-function surface
    (radians/sin/cos/asin/sqrt composed in a fixed association order)
    every logistics query needs, and the exact-rescore half of a
    geo-bucketed join (j_grid_knn supplies the candidate generation; at
    scale the two compose: grid-cell equi-join, then THIS formula on
    survivors). Coordinates are deterministic LCG projections of the
    key (the j_grid_knn recipe) — the op is about the math surface, not
    geography.

    Pure map-side codegen over a pruned 2-column scan; the 1-row query
    point broadcasts via cross join. Trig/asin differ by <=1 ulp across
    engines (~1e-16 rad), ~1e-10 km — safely under the 6dp snap.
    """
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 200)
    lat = F.radians(
        ((F.col("c_custkey") * 48271) % 180) - 90.0
        + ((F.col("c_custkey") * 137) % 1000) / 1000.0
    )
    lon = F.radians(
        ((F.col("c_custkey") * 69621) % 360) - 180.0
        + ((F.col("c_custkey") * 251) % 1000) / 1000.0
    )
    qlat = F.radians(F.lit(47.3769))
    qlon = F.radians(F.lit(8.5417))
    hav = (
        F.pow(F.sin((lat - qlat) / 2), 2)
        + F.cos(qlat) * F.cos(lat) * F.pow(F.sin((lon - qlon) / 2), 2)
    )
    return cust.select(
        "c_custkey",
        f6(2 * 6371.0088 * F.asin(F.sqrt(hav))).alias("dist_km"),
    ).orderBy("c_custkey")


@register(
    "fn_ipv4_cidr",
    """
    WITH ips AS (
        SELECT event_id,
               CAST((event_id * 2654435761) % 4294967296 AS BIGINT) AS ip
        FROM events WHERE event_id < 2000
    ),
    fmt AS (
        SELECT event_id, ip,
               CAST(ip // 16777216 AS VARCHAR) || '.'
               || CAST((ip // 65536) % 256 AS VARCHAR) || '.'
               || CAST((ip // 256) % 256 AS VARCHAR) || '.'
               || CAST(ip % 256 AS VARCHAR) AS dotted,
               CASE WHEN ip // 16777216 = 10 THEN 1 ELSE 0 END
                   AS in_10_slash8,
               CASE WHEN ip // 1048576 = CAST(2886729728 AS BIGINT) // 1048576
                    THEN 1 ELSE 0 END AS in_172_16_slash12,
               CASE WHEN ip // 65536 = CAST(3232235520 AS BIGINT) // 65536
                    THEN 1 ELSE 0 END AS in_192_168_slash16
        FROM ips
    )
    SELECT CAST(count(*) AS BIGINT) AS n_ips,
           CAST(sum(in_10_slash8) AS BIGINT) AS n_10_8,
           CAST(sum(in_172_16_slash12) AS BIGINT) AS n_172_16_12,
           CAST(sum(in_192_168_slash16) AS BIGINT) AS n_192_168_16,
           min(CASE WHEN in_10_slash8 = 1 THEN dotted END)
               AS first_private_10
    FROM fmt
    """,
)
def fn_ipv4_cidr(spark, sf_dir):
    """IPv4 address arithmetic — dotted-quad formatting and RFC-1918
    CIDR containment (10/8, 172.16/12, 192.168/16) over synthetic
    Knuth-hash addresses — the network-telemetry scalar surface (flow
    logs, abuse screens, geo-IP joins all start with 'is this IP in
    that block'). CIDR containment is integer prefix arithmetic:
    ip/2^(32-prefix) equals the network's shifted base — written as
    shared integer-division literals because DuckDB lacks 64-bit shift
    operators, and div/mod compiles to the same thing.

    Pure map-side codegen over one pruned column; the census collapses
    to 5 scalars. (The lexicographic min on dotted strings is the
    deterministic first-offender pick; ordering quirks of string IPs
    are exactly why the INTEGER form does the matching.)
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    ip = ((F.col("event_id") * 2654435761) % 4294967296).cast("long")
    base = ev.select(ip.alias("ip"))
    fmt = base.select(
        "ip",
        F.concat_ws(
            ".",
            F.expr("ip div 16777216").cast("string"),
            (F.expr("ip div 65536") % 256).cast("string"),
            (F.expr("ip div 256") % 256).cast("string"),
            (F.col("ip") % 256).cast("string"),
        ).alias("dotted"),
    ).select(
        "ip",
        "dotted",
        F.when(F.expr("ip div 16777216") == 10, 1).otherwise(0).alias("in_10_slash8"),
        F.when(
            F.expr("ip div 1048576") == 2886729728 // 1048576, 1
        ).otherwise(0).alias("in_172_16_slash12"),
        F.when(
            F.expr("ip div 65536") == 3232235520 // 65536, 1
        ).otherwise(0).alias("in_192_168_slash16"),
    )
    return fmt.agg(
        F.count("*").cast("long").alias("n_ips"),
        F.sum("in_10_slash8").cast("long").alias("n_10_8"),
        F.sum("in_172_16_slash12").cast("long").alias("n_172_16_12"),
        F.sum("in_192_168_slash16").cast("long").alias("n_192_168_16"),
        F.min(F.when(F.col("in_10_slash8") == 1, F.col("dotted"))).alias(
            "first_private_10"
        ),
    )


@register(
    "fn_sql_params",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN o_totalprice > 150000.0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_above
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def fn_sql_params(spark, sf_dir):
    """Parameterized SQL (SPARK-41271, Spark 3.4+): `spark.sql(query,
    args={...})` binds NAMED parameter markers server-side — the
    injection-safe templating every SQL-facing service needs (string-
    formatted SQL is both an injection hole and a plan-cache miss;
    bound parameters are literals to the analyzer, so Catalyst
    constant-folds and pushes them down exactly like hand-written
    ones). The oracle inlines the same constants, so the hash proves
    bound-parameter execution ≡ literal execution.

    The threshold predicate and date bound arrive ONLY via args —
    nothing is interpolated into the SQL text. Pushdown behavior is
    unchanged: the date filter reaches the parquet scan as if typed.
    """
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("v_orders_params")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN o_totalprice > :price_floor
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_above
        FROM v_orders_params
        WHERE o_orderdate >= CAST(:min_date AS TIMESTAMP)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        args={"price_floor": 150000.0, "min_date": "1996-01-01"},
    )


def _interleave_terms(col_lat: str, col_lng: str, nbits: int) -> str:
    """Morton/Z-order bit interleave as pure integer arithmetic (no
    shifts — DuckDB lacks 64-bit shift operators; // and % are exact
    in both engines). lat bits land on even positions, lng on odd."""
    terms = []
    for i in range(nbits):
        terms.append(f"(({col_lat} // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({col_lng} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


@register(
    "fn_geohash_encode",
    f"""
    WITH pts AS (
        SELECT c_custkey,
               CAST((c_custkey * 48271) % 4096 AS BIGINT) AS lat_i,
               CAST((c_custkey * 69621) % 4096 AS BIGINT) AS lng_i
        FROM customer
    ),
    coded AS (
        SELECT c_custkey, lat_i, lng_i,
               CAST({_interleave_terms('lat_i', 'lng_i', 12)} AS BIGINT)
                   AS z24
        FROM pts
    )
    SELECT CAST(z24 // 65536 AS BIGINT) AS cell8,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(lat_i) AS BIGINT) AS lat_min,
           CAST(max(lat_i) AS BIGINT) AS lat_max,
           CAST(min(lng_i) AS BIGINT) AS lng_min,
           CAST(max(lng_i) AS BIGINT) AS lng_max
    FROM coded GROUP BY 1 ORDER BY n DESC, cell8 LIMIT 10
    """,
)
def fn_geohash_encode(spark, sf_dir):
    """Z-order (Morton) geohash encoding + prefix-cell census — the
    hierarchical spatial index underneath geohash/S2/H3-style
    bucketing: quantize lat/lng to 12-bit integers (synthetic
    coordinates, the fn_haversine/fn_ipv4_cidr precedent), interleave
    the bits so nearby points share code PREFIXES, and roll up by the
    top-8-bit cell. The min/max coordinate bounds per cell PROVE the
    locality property the index exists for: every member of a prefix
    cell falls in the same 4-bit lat × 4-bit lng box (bounds within
    256 of each other), which is exactly why prefix ranges answer
    radius queries. s_zorder_layout applies the same curve to FILE
    layout; this is the query-side encode. j_grid_knn's flat grid is
    the one-resolution special case — the Z-code gives every
    resolution at once by prefix truncation.

    The interleave is 24 generated integer terms (//, %, ×, + only —
    no shifts, which this container's DuckDB lacks; no floats
    anywhere), fully map-side codegen; the census is one 256-key
    aggregate. At 100 TB the encode is a scan-speed projection and
    range queries become code-range scans on a Z-sorted layout.
    """
    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        ((F.col("c_custkey") * 48271) % 4096).cast("long").alias("lat_i"),
        ((F.col("c_custkey") * 69621) % 4096).cast("long").alias("lng_i"),
    )
    z = None
    for i in range(12):
        lat_bit = (F.col("lat_i") / (1 << i)).cast("long") % 2 * (1 << (2 * i))
        lng_bit = (
            (F.col("lng_i") / (1 << i)).cast("long") % 2 * (1 << (2 * i + 1))
        )
        z = lat_bit + lng_bit if z is None else z + lat_bit + lng_bit
    coded = pts.select(
        "c_custkey", "lat_i", "lng_i", z.cast("long").alias("z24")
    )
    return (
        coded.groupBy(
            (F.col("z24") / 65536).cast("long").alias("cell8")
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("lat_i").cast("long").alias("lat_min"),
            F.max("lat_i").cast("long").alias("lat_max"),
            F.min("lng_i").cast("long").alias("lng_min"),
            F.max("lng_i").cast("long").alias("lng_max"),
        )
        .orderBy(F.col("n").desc(), "cell8")
        .limit(10)
    )


def _luhn_terms(col: str, ndigits: int, double_even: bool) -> str:
    """Σ over digit positions (1 = rightmost) of the Luhn contribution:
    doubled digits reduce by 9 when >9. Pure // and % — identical in
    both engines, no string casts."""
    terms = []
    for i in range(1, ndigits + 1):
        d = f"(({col} // {10 ** (i - 1)}) % 10)"
        if (i % 2 == 0) == double_even:
            terms.append(
                f"(CASE WHEN {d} * 2 > 9 THEN {d} * 2 - 9 ELSE {d} * 2 END)"
            )
        else:
            terms.append(d)
    return "(" + " + ".join(terms) + ")"


@register(
    "fn_luhn_check",
    f"""
    WITH base AS (
        SELECT o_orderkey,
               10000000000 + (o_orderkey * 2654435761) % 90000000000 AS b11
        FROM orders
    ),
    withcheck AS (
        SELECT o_orderkey, b11,
               (10 - {_luhn_terms('b11', 11, False)} % 10) % 10 AS chk
        FROM base
    ),
    nums AS (
        SELECT o_orderkey,
               b11 * 10 + chk
               + CASE WHEN o_orderkey % 13 = 0
                      THEN CASE WHEN chk < 9 THEN 1 ELSE -9 END
                      ELSE 0 END AS acct
        FROM withcheck
    ),
    v AS (
        SELECT o_orderkey, acct,
               CASE WHEN {_luhn_terms('acct', 12, True)} % 10 = 0
                    THEN 1 ELSE 0 END AS ok
        FROM nums
    )
    SELECT CAST(count(*) AS BIGINT) AS n_accounts,
           CAST(sum(ok) AS BIGINT) AS n_valid,
           CAST(count(*) - sum(ok) AS BIGINT) AS n_invalid,
           CAST(min(CASE WHEN ok = 0 THEN o_orderkey END) AS BIGINT)
               AS first_invalid_key
    FROM v
    """,
)
def fn_luhn_check(spark, sf_dir):
    """Luhn mod-10 checksum validation (ISO/IEC 7812, public — card
    numbers, IMEIs, many national IDs) over synthesized 12-digit
    account numbers: a correct check digit is COMPUTED for every
    account, every 13th is then corrupted by one digit, and the
    validator must flag exactly those — so the test exercises both
    halves of the algorithm (generation and validation) against each
    other, and a single broken doubling branch breaks the census.

    Both halves are generated integer expressions (digit extraction by
    // and %, the doubled-digit reduce-by-9 as a CASE — no string
    casts, no shifts), fully map-side codegen in one pass; output is a
    4-number census. The practical shape: this is the cheap structural
    gate a payments ingest runs BEFORE expensive downstream checks,
    at scan speed on any volume.
    """
    orders = load_table(spark, sf_dir, "orders")

    def luhn_sum(col, ndigits, double_even):
        total = None
        for i in range(1, ndigits + 1):
            d = (col / (10 ** (i - 1))).cast("long") % 10
            if (i % 2 == 0) == double_even:
                t = F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)
            else:
                t = d
            total = t if total is None else total + t
        return total

    b11 = (
        F.lit(10000000000)
        + (F.col("o_orderkey") * 2654435761) % 90000000000
    ).alias("b11")
    base = orders.select("o_orderkey", b11)
    chk = (10 - luhn_sum(F.col("b11"), 11, False) % 10) % 10
    nums = base.select(
        "o_orderkey",
        (
            F.col("b11") * 10
            + chk
            + F.when(
                F.col("o_orderkey") % 13 == 0,
                F.when(chk < 9, 1).otherwise(-9),
            ).otherwise(0)
        ).alias("acct"),
    )
    ok = F.when(
        luhn_sum(F.col("acct"), 12, True) % 10 == 0, 1
    ).otherwise(0)
    return nums.select("o_orderkey", ok.alias("ok")).agg(
        F.count("*").cast("long").alias("n_accounts"),
        F.sum("ok").cast("long").alias("n_valid"),
        (F.count("*") - F.sum("ok")).cast("long").alias("n_invalid"),
        F.min(F.when(F.col("ok") == 0, F.col("o_orderkey")))
        .cast("long")
        .alias("first_invalid_key"),
    )
