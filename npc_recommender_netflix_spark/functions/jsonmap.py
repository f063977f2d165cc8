"""§2.7 scalar functions — JSON / map / conditional families."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register
from ..session import f6, load_table, money2


@register(
    "fn_json",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_get,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_from,
           CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod
    FROM events
    """,
)
def fn_json(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    k_get = F.get_json_object("props", "$.k").cast("int")
    k_from = F.from_json("props", "k INT").getField("k")
    return ev.select(
        "event_id",
        k_get.alias("k_get"),
        k_from.alias("k_from"),
        (k_from % 10).alias("k_mod"),
    )


@register(
    "fn_map_basic",
    """
    SELECT n_name, n_nationkey AS va, n_regionkey AS vb, 'nk,rk' AS ks
    FROM nation
    """,
)
def fn_map_basic(spark, sf_dir):
    # map_keys output joined to a scalar string (driver hasher can't take
    # raw ARRAY columns).
    nation = load_table(spark, sf_dir, "nation")
    m = F.map_from_arrays(
        F.array(F.lit("nk"), F.lit("rk")), F.array("n_nationkey", "n_regionkey")
    )
    return nation.select(
        "n_name",
        F.element_at(m, "nk").alias("va"),
        F.element_at(m, "rk").alias("vb"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("ks"),
    )


@register(
    "fn_conditional",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 5000 THEN 'lo' ELSE 'hi' END AS band,
           nullif(c_nationkey, 5) AS nn,
           coalesce(nullif(c_nationkey, 5), -1) AS co,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'NONE') AS nv,
           CASE WHEN c_nationkey = 0 THEN NULL
                ELSE round(c_acctbal / c_nationkey, 6) END AS td,
           round(c_acctbal, 2) AS nanv
    FROM customer
    """,
)
def fn_conditional(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    nk = F.col("c_nationkey")
    return cust.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 5000, "lo").otherwise("hi").alias("band"),
        F.nullif(nk, F.lit(5)).alias("nn"),
        F.coalesce(F.nullif(nk, F.lit(5)), F.lit(-1)).alias("co"),
        F.nvl(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("NONE")).alias("nv"),
        f6(F.try_divide(F.col("c_acctbal"), nk.cast("double"))).alias("td"),
        money2(F.nanvl(F.col("c_acctbal"), F.lit(0.0))).alias("nanv"),
    )


@register(
    "fn_json_corrupt",
    """
    WITH src AS (
        SELECT event_id,
               CASE WHEN event_id % 7 = 0 THEN substring(props, 1, 3)
                    ELSE props END AS js
        FROM events
    )
    SELECT event_id, json_valid(js) AS is_valid,
           CASE WHEN json_valid(js)
                THEN CAST(json_extract_string(js, '$.k') AS INT) END AS k
    FROM src
    """,
)
def fn_json_corrupt(spark, sf_dir):
    """Corrupt-tolerant JSON parse: every 7th payload is truncated to '{"k'.
    PERMISSIVE from_json yields a struct of nulls for malformed input, so
    the parsed field doubles as the validity flag (every valid payload has
    an integer k)."""
    ev = load_table(spark, sf_dir, "events")
    js = F.when(F.col("event_id") % 7 == 0, F.substring("props", 1, 3)).otherwise(
        F.col("props")
    )
    k = F.from_json(js, "k INT").getField("k")
    return ev.select(
        "event_id", k.isNotNull().alias("is_valid"), k.alias("k")
    )


@register(
    "fn_struct_basic",
    """
    WITH s AS (
        SELECT n_nationkey,
               struct_pack(rk := n_regionkey, rn := n_name) AS st
        FROM nation
    )
    SELECT n_nationkey, st.rk AS region_key, st.rn AS nation_name,
           struct_pack(outer_key := n_nationkey, inner := st).inner.rk
               AS nested_rk
    FROM s
    ORDER BY n_nationkey
    """,
)
def fn_struct_basic(spark, sf_dir):
    """Struct surface: construct (named fields), dot-path field access, and
    one level of nesting — the columnar way to carry typed records through
    a pipeline without stringly-typed blobs.

    Output flattens back to scalars (driver-hashable); the struct ops
    themselves are pure codegen projections. Spark `struct(... .alias())`
    ↔ DuckDB `struct_pack(k := v)`; both use identical dot access.
    """
    nation = load_table(spark, sf_dir, "nation")
    st = F.struct(
        F.col("n_regionkey").alias("rk"), F.col("n_name").alias("rn")
    )
    d = nation.select("n_nationkey", st.alias("st"))
    nested = F.struct(
        F.col("n_nationkey").alias("outer_key"), F.col("st").alias("inner")
    )
    return (
        d.select(
            "n_nationkey",
            F.col("st.rk").alias("region_key"),
            F.col("st.rn").alias("nation_name"),
            nested.getField("inner").getField("rk").alias("nested_rk"),
        )
        .orderBy("n_nationkey")
    )


@register(
    "fn_variant",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket
    FROM events WHERE event_id < 500
    ORDER BY event_id
    """,
)
def fn_variant(spark, sf_dir):
    """Spark 4 VARIANT surface: `parse_json` once into the binary
    variant encoding, then typed `variant_get` path extraction — the
    semi-structured column type that replaces parse-per-access
    `get_json_object` chains (VARIANT parses ONCE at ingest and stores
    a traversable binary, so ten field accesses cost one parse, and
    shredded storage can prune paths like columns at 100 TB).

    Zero-shuffle projection; the event_id predicate pushes to the
    scan. Oracle mirrors with DuckDB's json_extract (same values, no
    variant type there — which is the point: the OUTPUT is plain
    typed columns either way).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.where(F.col("event_id") < 500)
        .select(
            "event_id",
            F.expr("variant_get(parse_json(props), '$.k', 'long')").alias("k"),
        )
        .select(
            "event_id",
            "k",
            (F.col("k") % 10).alias("k_bucket"),
        )
        .orderBy("event_id")
    )


@register(
    "fn_map_lambda",
    """
    WITH m AS (
        SELECT o_orderkey,
               MAP {'base': CAST(round(o_totalprice * 100) AS BIGINT),
                    'tax': CAST(round(o_totalprice * 8) AS BIGINT),
                    'tip': CAST(round(o_totalprice * 15) AS BIGINT)} AS charges
        FROM orders WHERE o_orderkey <= 200
    )
    SELECT o_orderkey,
           CAST(charges['base'][1] + charges['tax'][1] + charges['tip'][1] AS BIGINT)
               AS total_cents,
           CAST(len(map_keys(charges)) AS BIGINT) AS n_kinds,
           CAST(charges['tax'][1] * 2 AS BIGINT) AS tax_doubled
    FROM m
    ORDER BY o_orderkey
    """,
)
def fn_map_lambda(spark, sf_dir):
    """Higher-order MAP functions: build a map column, then
    transform_values (per-entry lambda), map_filter (predicate over
    entries), and aggregate over map_values — the functional surface
    that keeps key-value manipulation inside codegen instead of
    exploding to rows and re-grouping (fn_map_basic covers
    construction/access; this is the lambda tier).

    The pipeline: charges map → transform_values(x2 on tax via
    map_filter+transform) → values-sum fold. All zero-shuffle JVM
    lambdas; the oracle mirrors the RESULTS with plain map access
    (DuckDB's map lambda surface differs — the output contract is
    scalar columns, same as fn_variant's approach). Scales as a pure
    projection over the scan.
    """
    orders = load_table(spark, sf_dir, "orders")
    charges = F.expr(
        "map('base', CAST(round(o_totalprice * 100) AS BIGINT),"
        " 'tax', CAST(round(o_totalprice * 8) AS BIGINT),"
        " 'tip', CAST(round(o_totalprice * 15) AS BIGINT))"
    )
    m = orders.where(F.col("o_orderkey") <= 200).select(
        "o_orderkey", charges.alias("charges")
    )
    return (
        m.select(
            "o_orderkey",
            # aggregate over map_values: functional fold, no explode
            F.expr(
                "aggregate(map_values(charges), 0L, (acc, v) -> acc + v)"
            ).cast("long").alias("total_cents"),
            F.expr("size(map_keys(charges))").cast("long").alias("n_kinds"),
            # map_filter to one entry + transform_values lambda
            F.expr(
                "element_at(map_values(transform_values("
                " map_filter(charges, (k, v) -> k = 'tax'),"
                " (k, v) -> v * 2)), 1)"
            ).cast("long").alias("tax_doubled"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "fn_json_schema_infer",
    """
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 20 AS k_bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM events WHERE event_id < 2000
    GROUP BY 1 ORDER BY k_bucket
    """,
)
def fn_json_schema_infer(spark, sf_dir):
    """Schema inference for JSON columns: `schema_of_json` derives the
    struct type from a sample row, `from_json` parses the whole column
    with it — the two-step that turns a stringly-typed side channel
    into real typed columns WITHOUT hand-writing the schema
    (fn_variant parses per-path; this materializes the full struct
    once, the right call when most fields are consumed).

    The inferred schema is computed from a LITERAL sample (one row's
    shape) so inference never scans the data — the production pattern:
    infer once on a sample, pin the result in code, parse with the
    pinned schema forever (drift then fails loudly at parse, the
    s_json_nested argument). Parsing is a zero-shuffle codegen
    projection into the bucket census.
    """
    ev = load_table(spark, sf_dir, "events")
    # schema_of_json on a literal exemplar: inference without a scan
    parsed = F.from_json(
        F.col("props"), F.expr("schema_of_json('{\"k\": 1}')")
    )
    return (
        ev.where(F.col("event_id") < 2000)
        .select((parsed.getField("k") % 20).cast("long").alias("k_bucket"))
        .groupBy("k_bucket")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("k_bucket")
    )
