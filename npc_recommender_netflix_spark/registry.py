"""Query registry: every operator module registers (key -> callable, key -> oracle SQL).

The driver contract (``__spark_entry__.py``) aggregates these. Each callable
has signature ``(spark, sf_dir) -> DataFrame``; each oracle is ANSI SQL that
DuckDB 1.0 runs over the same parquet tables (pre-registered views).

Conventions enforced here (SURVEY.md §2 header):
- every float output rounded (6dp; money 2dp) on BOTH sides;
- every computed integral output cast to BIGINT on BOTH sides (Spark's
  row_number/size/year/... return INT while DuckDB returns BIGINT);
- every ordering ends in a unique tiebreak key;
- aliases identical between the Spark plan and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(key: str, oracle: str | None = None):
    """Decorator: register a query callable and (optionally) its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLE[key] = oracle
        return fn

    return deco


# Keys whose rows+schema+hash all passed the driver oracle in round 1
# (CORRECTNESS_r01.json; includes a_approx_distinct's rows-only pass). The
# driver's per-round sweep caps at the FIRST 50 registration-order keys, so
# these banked keys are pushed to the BACK of the registry to let
# not-yet-verified keys into the window. Keep appending each round's newly
# verified keys here.
DRIVER_VERIFIED = (
    "s_parquet_scan", "s_pruned_scan", "s_pushdown_scan", "s_csv_roundtrip",
    "s_json_roundtrip", "s_partitioned_write", "s_ns_timestamp_read",
    "s_orc_roundtrip", "s_text_source", "s_save_as_table", "s_bucketed_table",
    "p_select_alias", "p_computed_expr", "p_case_when", "f_where_and_or",
    "f_in_list", "f_between", "f_like", "f_null_checks", "j_inner_equi",
    "j_broadcast", "j_sortmerge", "j_left_outer", "j_right_outer",
    "j_full_outer", "j_left_semi", "j_left_anti", "j_cross", "j_theta_range",
    "j_asof", "j_multiway", "j_self_pairs", "a_global", "a_groupby",
    "a_count_distinct", "a_multi_distinct", "a_having", "a_stats", "a_median",
    "a_grouping_sets", "a_rollup", "a_cube", "a_approx_distinct", "a_argmax",
    "a_string_agg", "a_bool_agg", "w_row_number", "w_rank_dense",
)

# Round-2 oracle window: exactly the 50 keys the driver will check this
# round, ordered first. Composition: the two round-1 hash-shape fixes
# (p_cast, a_collect_sorted), the new scale keys, then the highest-value
# driver-unverified families (LLM text/vector/multimodal, recommender,
# windows, sort/pivot) — all oracle-backed so each yields a hard hash
# signal. Rows-only keys are deliberately excluded from the window (their
# driver signal is weak); they ride in the round-3 remainder instead.
ORACLE_WINDOW = (
    # round-1 driver failures, re-shaped for the driver hasher
    "p_cast", "a_collect_sorted",
    # new round-2 scale keys (llm/dedup.py, llm/text.py)
    "t_exact_dedup_digest", "t_simhash_pairs", "t_jaccard_neardup_capped",
    # LLM text / dedup pipeline
    "t_exact_dedup", "t_tokenize_wc", "t_doc_stats", "t_tfidf",
    "t_ngram_bigram", "t_lang_id", "t_quality_score", "t_token_count",
    "t_canonical_dedup", "t_jaccard_neardup", "t_simhash", "t_fingerprint",
    "t_pipeline_e2e",
    # vectors
    "v_norm", "v_cosine_topk", "v_knn_label", "v_centroid",
    "v_embed_neardup", "v_ann_ivf",
    # multimodal
    "m_multimodal_join", "m_binary_meta", "m_image_pipeline",
    # recommender (oracle-backed subset)
    "r_ratings_matrix", "r_events_matrix", "r_item_stats", "r_mean_center",
    "r_cooccurrence", "r_cosine_sim", "r_topk_neighbors", "r_predict",
    "r_topn_recs", "r_rmse", "r_rdd_mapreduce",
    # windows
    "w_ntile", "w_lag_lead", "w_running_sum", "w_moving_avg",
    "w_range_frame", "w_first_last", "w_pct_rank", "w_topk_group",
    # sort/limit + pivot
    "o_topk", "o_sort_nulls", "a_pivot", "a_unpivot",
)


def _apply_order() -> None:
    """Reorder QUERIES/ORACLE: window first, unverified remainder, banked last."""
    window = [k for k in ORACLE_WINDOW if k in QUERIES]
    banked = set(DRIVER_VERIFIED)
    placed = set(window)
    remainder = [k for k in QUERIES if k not in placed and k not in banked]
    tail = [k for k in QUERIES if k in banked and k not in placed]
    order = window + remainder + tail
    for d in (QUERIES, ORACLE):
        snapshot = dict(d)
        d.clear()
        d.update({k: snapshot[k] for k in order if k in snapshot})


def load_all() -> None:
    """Import every operator module so registration side effects run."""
    from .sources import scans  # noqa: F401
    from .operators import filters, joins, aggregates, windows, setops, advanced, tpch, modern  # noqa: F401
    from .functions import strings, dates, maths, arrays, jsonmap  # noqa: F401
    from .recommender import core, als, rdd_mr, graph  # noqa: F401
    from .llm import text, vectors, dedup, multimodal, contamination, pipeline  # noqa: F401
    from .streaming import stream_windows, stateful  # noqa: F401
    from .udfs import surface  # noqa: F401

    _apply_order()
