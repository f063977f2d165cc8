"""§2.1 Scans / sources / sinks.

Scale notes:
- `s_pruned_scan` / `s_pushdown_scan` exist to pin down that column pruning
  and predicate pushdown reach the Parquet scan (asserted in
  tests/test_plans.py via ReadSchema / PushedFilters). At 100 TB these are
  the difference between reading 2 columns' row groups and reading the table.
- `s_partitioned_write` demonstrates hive-style partitioning, the layout
  that enables partition pruning for downstream readers.
- Round-trips write to a per-call temp dir; sinks at scale would target
  object storage with the same API.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table, money2


@register("s_parquet_scan", "SELECT r_regionkey, r_name FROM region")
def s_parquet_scan(spark, sf_dir):
    return load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")


@register("s_pruned_scan", "SELECT l_orderkey, l_quantity FROM lineitem")
def s_pruned_scan(spark, sf_dir):
    # Catalyst ColumnPruning: ReadSchema ends up with exactly these 2 cols.
    return load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")


@register(
    "s_pushdown_scan",
    """
    SELECT l_orderkey, l_linenumber, l_shipdate
    FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    """,
)
def s_pushdown_scan(spark, sf_dir):
    # Predicate reaches the parquet scan (PushedFilters: GreaterThanOrEqual).
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp")).select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )


@register(
    "s_csv_roundtrip",
    """
    SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 2) AS c_acctbal,
           c_mktsegment
    FROM customer
    """,
)
def s_csv_roundtrip(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    tmp = tempfile.mkdtemp(prefix="npc_csv_")
    try:
        path = f"{tmp}/customer_csv"
        cust.write.mode("overwrite").option("header", "true").csv(path)
        schema = "c_custkey BIGINT, c_name STRING, c_nationkey INT, c_acctbal DOUBLE, c_mktsegment STRING"
        back = spark.read.schema(schema).option("header", "true").csv(path)
        out = back.select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            money2(F.col("c_acctbal")).alias("c_acctbal"),
            "c_mktsegment",
        )
        out = spark.createDataFrame(out.collect(), out.schema)  # materialize before tmp cleanup
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "s_json_roundtrip",
    "SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def s_json_roundtrip(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="npc_json_")
    try:
        path = f"{tmp}/nation_json"
        nation.write.mode("overwrite").json(path)
        back = spark.read.schema("n_nationkey INT, n_name STRING, n_regionkey INT").json(path)
        return spark.createDataFrame(back.collect(), back.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "s_partitioned_write",
    "SELECT o_orderstatus, count(*) AS cnt FROM orders GROUP BY o_orderstatus",
)
def s_partitioned_write(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    tmp = tempfile.mkdtemp(prefix="npc_part_")
    try:
        path = f"{tmp}/orders_by_status"
        orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
        back = spark.read.parquet(path)
        out = back.groupBy("o_orderstatus").agg(F.count("*").alias("cnt"))
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register("s_ns_timestamp_read", "SELECT event_id, ts FROM events")
def s_ns_timestamp_read(spark, sf_dir):
    # SURVEY §1.3: nanosAsLong + timestamp_micros(ts DIV 1000), byte-identical
    # to DuckDB's native ns->us read.
    return load_table(spark, sf_dir, "events").select("event_id", "ts")


@register(
    "s_orc_roundtrip",
    "SELECT s_suppkey, s_name, s_nationkey, round(s_acctbal, 2) AS s_acctbal FROM supplier",
)
def s_orc_roundtrip(spark, sf_dir):
    """ORC sink+source (columnar alternative to parquet; same DSv2 path).
    DuckDB cannot read ORC, so the oracle is the roundtrip identity."""
    supp = load_table(spark, sf_dir, "supplier")
    tmp = tempfile.mkdtemp(prefix="npc_orc_")
    try:
        path = f"{tmp}/supplier_orc"
        supp.write.mode("overwrite").orc(path)
        back = spark.read.orc(path)
        out = back.select(
            "s_suppkey", "s_name", "s_nationkey", money2(F.col("s_acctbal")).alias("s_acctbal")
        )
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "s_text_source",
    "SELECT text AS value FROM documents",
)
def s_text_source(spark, sf_dir):
    """Plain-text sink+source (one line per doc; corpus texts contain no
    newlines). The reference's native format is exactly line-oriented text."""
    docs = load_table(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="npc_text_")
    try:
        path = f"{tmp}/docs_txt"
        docs.select(F.col("text").alias("value")).write.mode("overwrite").text(path)
        back = spark.read.text(path)
        return spark.createDataFrame(back.collect(), back.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "s_save_as_table",
    "SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def s_save_as_table(spark, sf_dir):
    """Catalog surface: saveAsTable (external, explicit path) -> spark.table
    read-back -> drop. At scale this is the managed-table path with a real
    metastore; the API is identical."""
    import uuid

    nation = load_table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="npc_tbl_")
    name = "npc_nation_" + uuid.uuid4().hex[:8]
    try:
        nation.write.mode("overwrite").option("path", f"{tmp}/t").saveAsTable(name)
        back = spark.table(name)
        return spark.createDataFrame(back.collect(), back.schema)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "s_bucketed_table",
    "SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey",
)
def s_bucketed_table(spark, sf_dir):
    """Bucketed table write + aggregation on the bucket key. The bucketed
    layout lets the groupBy (and any equi-join on o_custkey against another
    table bucketed the same way) run WITHOUT a shuffle — asserted in
    tests/test_plans.py (no Exchange before the aggregate). This is the
    persisted-layout answer to repeated 100 TB joins on one key."""
    import uuid

    orders = load_table(spark, sf_dir, "orders")
    tmp = tempfile.mkdtemp(prefix="npc_bkt_")
    name = "npc_orders_bkt_" + uuid.uuid4().hex[:8]
    try:
        (
            orders.write.mode("overwrite")
            .option("path", f"{tmp}/t")
            .bucketBy(8, "o_custkey")
            .sortBy("o_custkey")
            .saveAsTable(name)
        )
        back = spark.table(name)
        out = back.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(tmp, ignore_errors=True)
