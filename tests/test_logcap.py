"""Log-cleanliness tripwire (round-10 verdict item 2).

Spark's "Constructing trivially true equals predicate" warning marks an
ambiguous self-join — the pattern that silently degenerates to a cross
join under refactors. It is JVM-side log output, invisible to Python
asserts, so tools/logcap.py captures it via a programmatic log4j2
appender and tools/check.py fails any registered key that emits it.
These tests keep the detector honest: it must FIRE on a deliberately
ambiguous self-join and must stay SILENT on the round-10 retrieval-stack
keys whose self-joins were aliased in round 11.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from npc_recommender_netflix_spark import registry
from tests.conftest import SF_SMALL
from tools.logcap import WarningCapture


def test_warning_capture_detects_ambiguous_self_join(spark):
    cap = WarningCapture(spark)
    assert cap.active, "log4j2 appender failed to attach: API drift"
    try:
        cap.drain()
        df = spark.range(10).selectExpr("id AS query_id", "id * 2 AS v")
        agg = df.groupBy("query_id").count()
        agg.join(df, agg.query_id == df.query_id)  # ambiguous on purpose
        assert cap.dirty_lines(), (
            "detector missed the trivially-true-equals warning"
        )
    finally:
        cap.close()


def test_retrieval_stack_plans_build_with_clean_logs(spark):
    """v_rerank_mmr carried the warning until round 11 (the rem⋈ms join);
    the graph-ANN walks grew it when qcos became a shared intermediate;
    the first full-sweep run of the tripwire then flushed SIX more latent
    carriers (a_bitmap_overlap, j_asof_tolerance, r_cosine_sim_capped,
    r_slope_one, v_pq_adc, w_gap_fill — every one hash-matched, so the
    warning was the only symptom). All ten must now BUILD their full
    plans without tripping it."""
    cap = WarningCapture(spark)
    assert cap.active
    try:
        cap.drain()
        for key in ("v_nsw_greedy", "v_hnsw_layered", "v_rerank_mmr",
                    "v_matryoshka_topk", "a_bitmap_overlap",
                    "j_asof_tolerance", "r_cosine_sim_capped",
                    "r_slope_one", "v_pq_adc", "w_gap_fill"):
            registry.QUERIES[key](spark, SF_SMALL)
            assert not cap.dirty_lines(), f"{key} builds a dirty plan"
    finally:
        cap.close()
        spark.catalog.clearCache()
