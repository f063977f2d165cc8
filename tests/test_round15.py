"""Round-15 fixes: semantic pins beyond the DuckDB oracle hash.

Covers the round-14 verdict's Katz inner-join exclusion (item 6 — a
high-degree sink node must rank by 0.1·w1, not vanish) and the three
round-14 ADVICE items (LPA round-1 unpersist timing, the script-hist
cache memo, message-scoped DAGScheduler filtering).
"""

import pyspark.sql.functions as F

from npc_recommender_netflix_spark import registry
from npc_recommender_netflix_spark.recommender.graph import _katz_truncated
from tests.conftest import SF_SMALL


def test_katz_sink_node_ranks_instead_of_vanishing(spark):
    """r14 verdict item 6: on a directed graph where node 1's only
    out-neighbor (node 9) has no out-edges, node 1 has w1 > 0 but zero
    2- and 3-step walks. The old INNER w1⋈w2⋈w3 assembly dropped it
    from the ranking; LEFT + coalesce must keep it at katz = 0.1·w1."""
    edges = spark.createDataFrame(
        # star into sink 9 (9 itself never a src), plus a 2-chain 5→6→7
        [(1, 9), (2, 9), (3, 9), (5, 6), (6, 7)],
        "src long, dst long",
    )
    rows = {r["node"]: r for r in _katz_truncated(edges).collect()}
    # every src-bearing node is present — nothing vanished
    assert set(rows) == {1, 2, 3, 5, 6}
    # node 1: one out-edge to a sink => zero 2-/3-step walks, katz 0.1
    assert rows[1]["walks1"] == 1
    assert rows[1]["walks2"] == 0
    assert rows[1]["walks3"] == 0
    assert abs(rows[1]["katz"] - 0.1) < 1e-9
    # node 5: 5→6→7 gives one 2-step walk ending at 7, but from 5's own
    # perspective w2(5) counts walks ENDING at 5 — none. Still ranked.
    assert rows[5]["walks2"] == 0
    # node 6: one 2-step walk ends at 7, 6 has w1=1 and w2(6)=w1(5)=1
    assert rows[6]["walks1"] == 1 and rows[6]["walks2"] == 1


def test_katz_fixture_hash_unchanged_by_left_join(spark, duck):
    """The LEFT-join fix must be hash-neutral on the symmetric
    co-purchase fixture (every edge-bearing node has 2-step walks):
    Spark and the updated oracle still agree row-for-row."""
    sdf = registry.QUERIES["r_katz_centrality"](spark, SF_SMALL)
    srows = sorted(tuple(r) for r in sdf.collect())
    orows = sorted(
        tuple(r) for r in duck.sql(registry.ORACLE["r_katz_centrality"]).fetchall()
    )
    assert len(srows) == 20
    assert [r[:4] for r in srows] == [r[:4] for r in orows]
    for s, o in zip(srows, orows):
        assert abs(s[4] - o[4]) < 1e-9


def test_lpa_round1_cache_survives_until_final_materialization(spark):
    """r14 ADVICE (medium): prev.unpersist() at rnd==2 fired before any
    action populated the round-1 cache, so the final frame's first
    materialization re-derived the round-1 subplan per reference. The
    fix materializes the final frame inside _lpa_labels, then releases
    round 1 — so by the time the memo is handed out, the FINAL frame is
    already cached AND materialized (cachedRowCount present)."""
    from npc_recommender_netflix_spark.recommender import graph as G

    G._LPA_SHARED.clear()
    lab = G._lpa_labels(spark, SF_SMALL)
    assert lab.storageLevel.useMemory
    # materialized eagerly inside the builder: a recount is served from
    # cache; and the memo returns the SAME frame on re-entry
    assert lab.count() > 0
    assert G._lpa_labels(spark, SF_SMALL) is lab


def test_script_hist_reinvocation_reuses_one_cached_frame(spark):
    """r14 ADVICE (low): each q_sql_scripting_hist call cached a NEW
    histogram frame; repeated bench/sweep runs accumulated orphaned
    cache entries. The memo must hand back the same cached frame."""
    from npc_recommender_netflix_spark.operators import modern as M

    M._SCRIPT_HIST_SHARED.clear()
    registry.QUERIES["q_sql_scripting_hist"](spark, SF_SMALL).collect()
    assert len(M._SCRIPT_HIST_SHARED) == 1
    frame1 = next(iter(M._SCRIPT_HIST_SHARED.values()))
    registry.QUERIES["q_sql_scripting_hist"](spark, SF_SMALL).collect()
    assert len(M._SCRIPT_HIST_SHARED) == 1
    assert next(iter(M._SCRIPT_HIST_SHARED.values())) is frame1
    assert frame1.storageLevel.useMemory


def test_dagscheduler_not_level_suppressed_in_sweep():
    """r14 ADVICE (low): the sweep must not raise the whole DAGScheduler
    logger to ERROR (that hides lost-task/stage-retry warnings); only
    the task-binary-size advisory is denied, message-scoped."""
    from tools import check as C

    assert not any("DAGScheduler" in name for name in C._QUIET_LOGGERS)
    assert any(
        "Broadcasting large task binary" in p for p in C._DENY_MESSAGE_REGEXES
    )


def test_script_scalar_sum_matches_raw_orders(spark):
    """The memoized histogram's sum(cents*cnt) must stay bit-equal to
    sum(cents) over raw orders — the invariant the bisection trajectory
    equality rests on — even when served from the memo."""
    from npc_recommender_netflix_spark.session import load_table

    hist = spark.table("npc_script_hist")
    h = hist.select(
        F.sum(F.col("cents") * F.col("cnt")).cast("long").alias("s")
    ).collect()[0]["s"]
    raw = (
        load_table(spark, SF_SMALL, "orders")
        .select(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("s")
        )
        .collect()[0]["s"]
    )
    assert h == raw
