"""Round-2 additions: modern relational surface + decontamination +
video pipeline (oracle parity for these keys is covered by tools/check.py;
these tests pin the semantics the oracle can't express)."""

import math

from pyspark.sql import functions as F

from npc_recommender_netflix_spark import registry
from npc_recommender_netflix_spark.session import load_table
from tests.conftest import SF_SMALL


def test_recursive_cte_depth(spark):
    """Chain depth for key k must be floor(log2(k)) + 1 (k>0): halving walk."""
    rows = {
        r.suppkey: r for r in registry.QUERIES["q_recursive_cte"](spark, SF_SMALL).collect()
    }
    assert len(rows) == load_table(spark, SF_SMALL, "supplier").count()
    for k, r in rows.items():
        expected_depth = int(math.floor(math.log2(k))) + 1 if k > 0 else 0
        assert r.depth == expected_depth, (k, r.depth, expected_depth)
        # path sum equals sum of the halving orbit k, k//2, ..., 1, 0
        s, node = 0, k
        while node > 0:
            s += node
            node //= 2
        assert r.path_sum == s


def test_limit_offset_is_rows_11_through_30(spark):
    got = [r.o_orderkey for r in registry.QUERIES["o_limit_offset"](spark, SF_SMALL).collect()]
    full = (
        load_table(spark, SF_SMALL, "orders")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(30)
        .collect()
    )
    want = [r.o_orderkey for r in full[10:30]]
    assert got == want


def test_hll_sketch_merge_error_bound(spark):
    """Merged HLL estimate within 5% of the exact distinct count per group
    (lgK=12 expected error ~1.6%; 5% is a hard stop, not a tuning target)."""
    est = {
        r.o_orderpriority: r.approx_custs
        for r in registry.QUERIES["a_sketch_merge"](spark, SF_SMALL).collect()
    }
    exact = {
        r.o_orderpriority: r.n
        for r in load_table(spark, SF_SMALL, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k in exact:
        assert abs(est[k] - exact[k]) <= max(1, 0.05 * exact[k]), (k, est[k], exact[k])


def test_video_pipeline_arithmetic(spark):
    df = registry.QUERIES["m_video_pipeline"](spark, SF_SMALL)
    rows = df.collect()
    assert len(rows) == 500
    for r in rows[:50]:
        assert r.fps == r.n_bytes % 24 + 6
        assert r.n_frames == r.n_bytes % 97 + 24
        assert r.duration_ms == r.n_frames * 1000 // r.fps
        # 1-fps sampling keeps ceil(n_frames / fps) frames
        assert r.sampled_frames == -(-r.n_frames // r.fps)
        assert 1 <= r.sampled_frames <= r.n_frames


def test_decontaminate_flags_only_train_docs(spark):
    df = registry.QUERIES["t_decontaminate"](spark, SF_SMALL)
    rows = df.collect()
    assert len(rows) > 0  # split/gram tuned so the signal is non-trivial
    for r in rows:
        assert r.doc_id % 7 != 0  # benchmark docs are never flagged
        assert r.n_hits >= 1


def test_corr_regr_matches_numpy(spark):
    import numpy as np

    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    pdf = li.toPandas()
    got = {r.l_returnflag: r for r in registry.QUERIES["a_corr_regr"](spark, SF_SMALL).collect()}
    for flag, grp in pdf.groupby("l_returnflag"):
        x = grp["l_quantity"].to_numpy(float)
        y = grp["l_extendedprice"].to_numpy(float)
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(got[flag].price_qty_corr - np.corrcoef(x, y)[0, 1]) < 1e-5
        assert abs(got[flag].slope - slope) < 0.01
        assert abs(got[flag].intercept - intercept) < 0.01


def test_approx_quantile_near_exact(spark):
    """Sketch percentiles within 1% of exact percentile_cont per group."""
    got = {
        r.l_returnflag: r
        for r in registry.QUERIES["a_approx_quantile"](spark, SF_SMALL).collect()
    }
    exact = {
        r.l_returnflag: r
        for r in load_table(spark, SF_SMALL, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
            F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
        )
        .collect()
    }
    for flag, e in exact.items():
        for q in ("p50", "p90", "p99"):
            assert abs(got[flag][q] - e[q]) <= 0.01 * e[q], (flag, q)


def test_try_arith_null_semantics(spark):
    rows = registry.QUERIES["fn_try_arith"](spark, SF_SMALL).collect()
    assert rows
    saw_null = saw_value = False
    for r in rows:
        assert r.not_a_number is None  # letters never parse
        assert float(str(r.parsed)) == r.parsed  # always parses
        if r.per_excess is None:
            saw_null = True  # qty == 25 -> divide by zero -> NULL, not error
        else:
            saw_value = True
    assert saw_null and saw_value
