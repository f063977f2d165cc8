"""Streaming runtime checks: stateful parity with batch, watermark
withholding, late-data behavior on crafted input."""

import os
import tempfile

from pyspark.sql import functions as F

from npc_recommender_netflix_spark import registry
from npc_recommender_netflix_spark.session import load_table
from tests.conftest import SF_SMALL


def test_stateful_running_count_matches_batch(spark):
    stream_counts = {
        r["user_id"]: r["n"]
        for r in registry.QUERIES["st_stateful"](spark, SF_SMALL).collect()
    }
    batch_counts = {
        r["user_id"]: r["n"]
        for r in load_table(spark, SF_SMALL, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert stream_counts == batch_counts


def test_watermark_withholds_tail_windows(spark):
    """Append mode with 1h watermark: windows ending after max(ts)-1h are
    withheld, so append emits strictly fewer window rows than complete."""
    withheld = registry.QUERIES["st_watermark"](spark, SF_SMALL)
    full = registry.QUERIES["st_tumbling"](spark, SF_SMALL)
    n_w, n_f = withheld.count(), full.count()
    assert 0 < n_w < n_f
    ev = load_table(spark, SF_SMALL, "events")
    max_ts = ev.agg(F.max("ts")).first()[0]
    late_cutoff = max_ts.replace(minute=0, second=0, microsecond=0)
    emitted_max = withheld.agg(F.max("wstart")).first()[0]
    assert emitted_max < late_cutoff


def test_streaming_dedup_restores_exact_counts(spark):
    stream = {
        r["event_type"]: r["cnt"]
        for r in registry.QUERIES["st_dedup"](spark, SF_SMALL).collect()
    }
    batch = {
        r["event_type"]: r["cnt"]
        for r in load_table(spark, SF_SMALL, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert stream == batch


def test_late_data_dropped_beyond_watermark(spark):
    """Craft a 2-batch stream where batch 2 contains an event 3 hours older
    than batch 1's max: with a 1h watermark the late row must be dropped."""
    tmp = tempfile.mkdtemp(prefix="npc_late_")
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    on_time = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 12:00:00")], "id LONG, ts STRING"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    late = spark.createDataFrame(
        [(3, "2024-01-01 09:00:00")], "id LONG, ts STRING"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    on_time.write.parquet(os.path.join(src, "b1"))
    late.write.parquet(os.path.join(src, "b2"))
    # FileStreamSource picks files oldest-mtime-first; both writes can land
    # in the same clock tick, so pin b1 strictly older to make the two
    # micro-batches (and thus the watermark advance) deterministic.
    import time as _time

    now = _time.time()
    for root, _, files in os.walk(src):
        for f in files:
            full = os.path.join(root, f)
            os.utime(full, (now - 120, now - 120) if "/b1/" in full or root.endswith("b1") else (now, now))

    stream = (
        spark.readStream.schema("id LONG, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("cnt"))
    )
    q = (
        agg.select(F.col("window.start").alias("ws"), "cnt")
        .writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = {r["ws"].hour: r["cnt"] for r in spark.table("late_test").collect()}
    # watermark after b1 = 12:00-1h = 11:00 -> the 10:00 window closed with
    # only event id=1; the 09:00 late arrival (b2) must NOT appear anywhere.
    assert emitted.get(10) == 1
    assert 9 not in emitted


def test_stateful_funnel_matches_batch(spark):
    """The streaming funnel's per-user depths must aggregate to the batch
    q_event_funnel counts (single availableNow batch = no late data, so
    the approximation is exact here)."""
    from tests.conftest import SF_SMALL

    depths = {
        r["user_id"]: r["depth"]
        for r in registry.QUERIES["st_funnel_stateful"](spark, SF_SMALL).collect()
    }
    batch = registry.QUERIES["q_event_funnel"](spark, SF_SMALL).collect()[0]
    n1 = sum(1 for d in depths.values() if d >= 1)
    n2 = sum(1 for d in depths.values() if d >= 2)
    n3 = sum(1 for d in depths.values() if d >= 3)
    assert (n1, n2, n3) == (
        batch["n_click"], batch["n_click_view"], batch["n_click_view_purchase"]
    )
