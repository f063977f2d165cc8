"""Property-based layer (hypothesis): engine invariants on generated data.

These don't re-check fixture answers (the oracle does that) — they pin
ALGEBRAIC properties of the operator implementations on adversarial tiny
inputs: dedup idempotence, salting-invariance of aggregation, banded
SimHash candidate completeness, top-k/window agreement. Few examples per
property (Spark round-trips are ~0.5 s each); hypothesis shrinks failures
to minimal counterexamples.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

_prop = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_texts = st.lists(
    st.text(alphabet="ab ", min_size=1, max_size=12), min_size=1, max_size=20
)


@_prop
@given(texts=_texts)
def test_digest_dedup_counts_distinct_texts(spark, texts):
    """Digest-keyed dedup == set semantics: grouping on md5(text) counts
    exactly the distinct texts, for any input multiset (md5 is injective on
    these inputs for all practical purposes)."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id LONG, text STRING")
    got = (
        df.select(F.md5("text").alias("d"))
        .dropDuplicates(["d"])
        .count()
    )
    assert got == len(set(texts))


@_prop
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-100, 100)), min_size=1, max_size=30
    )
)
def test_salted_aggregation_equals_direct(spark, rows):
    """Two-phase salted aggregation (the skew pattern) must equal the direct
    groupBy sum for ANY key/value multiset — salting changes placement,
    never membership."""
    df = spark.createDataFrame(rows, "k LONG, v LONG")
    direct = {r["k"]: r["s"] for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    salted = (
        df.withColumn("salt", F.pmod(F.monotonically_increasing_id(), F.lit(4)))
        .groupBy("k", "salt")
        .agg(F.sum("v").alias("ps"))
        .groupBy("k")
        .agg(F.sum("ps").alias("s"))
    )
    assert {r["k"]: r["s"] for r in salted.collect()} == direct


@_prop
@given(hashes=st.lists(st.integers(0, 2**16 - 1), min_size=2, max_size=25, unique=True))
def test_banded_candidates_cover_all_close_pairs(spark, hashes):
    """The 4x4-bit band equi-join (t_simhash_pairs candidate generation)
    must surface EVERY pair at Hamming distance <= 3 of arbitrary 16-bit
    fingerprints (pigeonhole), with no false pairs below the final Hamming
    filter."""
    df = spark.createDataFrame([(i, h) for i, h in enumerate(hashes)], "id LONG, h LONG")
    bands = df.crossJoin(F.broadcast(spark.range(0, 4).select(F.col("id").alias("b")))).select(
        "id",
        "h",
        "b",
        (F.floor(F.col("h") / F.pow(2, 4 * F.col("b"))).cast("long") % 16).alias("bv"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("ia"), F.col("b.id").alias("ib"))
        .distinct()
        .collect()
    )
    got = {(r["ia"], r["ib"]) for r in cand}
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            if bin(hashes[i] ^ hashes[j]).count("1") <= 3:
                assert (i, j) in got, (hashes[i], hashes[j])


@_prop
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(-50, 50), st.integers(0, 10**6)),
        min_size=1,
        max_size=30,
    )
)
def test_window_topk_equals_per_group_sort(spark, rows):
    """row_number()<=k (the WindowGroupLimit path) must agree with a plain
    per-group python sort for any (group, score, uid) multiset, given the
    deterministic (score desc, uid) tiebreak."""
    uniq = {(g, s, u): None for g, s, u in rows}
    rows = list(uniq)  # dedupe exact triples; uid ties are still possible
    df = spark.createDataFrame(rows, "g LONG, s LONG, u LONG")
    w = Window.partitionBy("g").orderBy(F.col("s").desc(), "u", "g")
    got = (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select("g", "s", "u")
        .collect()
    )
    got_set = {(r["g"], r["s"], r["u"]) for r in got}
    expect = set()
    groups = {}
    for g, s, u in rows:
        groups.setdefault(g, []).append((s, u))
    for g, items in groups.items():
        for s, u in sorted(items, key=lambda t: (-t[0], t[1]))[:2]:
            expect.add((g, s, u))
    assert got_set == expect


def test_metric_operators_respect_bounds(spark):
    """Value-range invariants of the round-5 metric operators on the
    fixture slice: entropy within [0, log2(k)], KS and NDCG and recall
    within [0, 1], MRR rr == 1/first_hit, EWMA inside the min/max of the
    inputs it smooths (convex combination)."""
    import math

    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    ent = registry.QUERIES["a_entropy"](spark, SF_SMALL).collect()
    assert ent
    for r in ent:
        assert -1e-9 <= r.entropy_bits <= math.log2(r.n_types) + 1e-9

    ks = registry.QUERIES["a_ks_drift"](spark, SF_SMALL).collect()
    assert len(ks) == 1 and 0.0 <= ks[0].ks_stat <= 1.0

    ndcg = registry.QUERIES["r_ndcg"](spark, SF_SMALL).collect()
    assert ndcg
    assert all(0.0 <= r.ndcg5 <= 1.0 + 1e-9 for r in ndcg)

    mrr = registry.QUERIES["r_mrr"](spark, SF_SMALL).collect()
    assert mrr
    for r in mrr:
        if r.first_hit > 0:
            assert abs(r.rr - round(1.0 / r.first_hit, 6)) < 1e-9
        else:
            assert r.rr == 0.0

    rec = registry.QUERIES["v_matryoshka_recall"](spark, SF_SMALL).collect()
    assert rec and all(0.0 <= r.recall10 <= 1.0 for r in rec)


def test_ewma_is_convex_combination(spark):
    """EWMA output must lie within [min, max] of each user's value stream
    (weights are positive and normalized)."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL
    from npc_recommender_netflix_spark.session import load_table

    ev = (
        load_table(spark, SF_SMALL, "events")
        .where(F.col("user_id") < 20)
        .groupBy("user_id")
        .agg(
            F.min(F.round(F.col("value") * 100) / 100).alias("lo"),
            F.max(F.round(F.col("value") * 100) / 100).alias("hi"),
        )
    )
    ew = registry.QUERIES["w_ewma"](spark, SF_SMALL)
    bad = (
        ew.join(ev, "user_id")
        .where((F.col("ewma") < F.col("lo") - 1e-6) | (F.col("ewma") > F.col("hi") + 1e-6))
        .count()
    )
    assert bad == 0


def test_ohlc_bars_bounds(spark):
    """OHLC invariants: low <= open/close <= high, and volume equals the
    bar's cent-exact sum (never negative count)."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["w_ohlc_bars"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.low - 1e-9 <= r.open <= r.high + 1e-9
        assert r.low - 1e-9 <= r.close <= r.high + 1e-9
        assert r.n_events >= 1


def test_ltv_deciles_lorenz_monotone(spark):
    """Lorenz curve: cumulative share is nondecreasing, convex-ish by
    construction (deciles ordered by spend), and ends at 1."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = sorted(
        registry.QUERIES["w_ltv_deciles"](spark, SF_SMALL).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    shares = [r.cum_share for r in rows]
    assert all(b >= a - 1e-9 for a, b in zip(shares, shares[1:]))
    assert abs(shares[-1] - 1.0) < 1e-6
    assert abs(sum(r.revenue_share for r in rows) - 1.0) < 1e-4


def test_cramers_v_in_unit_interval(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["a_cramers_v"](spark, SF_SMALL).collect()[0]
    assert 0.0 <= r.cramers_v <= 1.0
    assert r.chi2 >= 0.0
    assert r.n_days <= 7


def test_ship_latency_percentiles_ordered(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["q_ship_latency"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.p50_days <= r.p90_days <= r.p99_days <= r.max_days + 1e-9
        assert r.n_lines > 0


def test_dsir_scores_exclude_target_lang(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["t_dsir_score"](spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 20
    assert all(r.lang != "en" and r.n_tokens > 0 for r in rows)
    scores = [r.dsir_score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_fertility_ratios_positive(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["t_fertility"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.chars_per_token > 0 and r.tokens_per_doc > 0
        assert r.total_tokens <= r.total_chars  # every token >= 1 char


def test_item_jaccard_in_unit_interval(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["r_item_jaccard"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.jaccard <= 1.0
        assert r.n_common >= 1


def test_dim_variance_bounds(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["v_dim_variance"](spark, SF_SMALL).collect()
    assert len(rows) == 64
    ns = {r.n for r in rows}
    assert len(ns) == 1  # every dim observed in every vector
    for r in rows:
        assert r.variance >= 0.0
        assert r.min_v - 1e-6 <= r.mean <= r.max_v + 1e-6


def test_rfm_segments_partition_customers(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["q_rfm_segments"](spark, SF_SMALL).collect()
    assert rows
    assert all(1 <= r.r <= 4 and 1 <= r.f <= 4 and 1 <= r.m <= 4 for r in rows)
    # segments are disjoint: totals equal the distinct customer count
    orders = registry.QUERIES["a_groupby"]  # noqa: F841 (import guard)
    total = sum(r.n_customers for r in rows)
    from npc_recommender_netflix_spark.session import load_table
    n_cust = (
        load_table(spark, SF_SMALL, "orders").select("o_custkey").distinct().count()
    )
    assert total == n_cust


def test_jackknife_ci_brackets_mean(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["a_jackknife_ci"](spark, SF_SMALL).collect()[0]
    assert r.jk_se >= 0
    assert r.ci_lo <= r.mean_aov <= r.ci_hi


def test_yield_curve_monotone_in_k(spark):
    """Longer prefixes can only distinguish MORE docs: survival rate is
    nondecreasing in k."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = sorted(
        registry.QUERIES["t_dedup_yield_curve"](spark, SF_SMALL).collect(),
        key=lambda r: r.k,
    )
    assert [r.k for r in rows] == [20, 40, 80, 160, 320]
    s = [r.survival_rate for r in rows]
    assert all(b >= a - 1e-9 for a, b in zip(s, s[1:]))
    assert all(0 < x <= 1 for x in s)


def test_lang_confusion_shares_sum_to_one(spark):
    from collections import defaultdict

    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["t_lang_confusion"](spark, SF_SMALL).collect()
    by_lang = defaultdict(float)
    for r in rows:
        by_lang[r.lang] += r.share
    assert all(abs(v - 1.0) < 1e-4 for v in by_lang.values())


def test_dau_never_exceeds_wau(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["q_dau_wau"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.dau <= r.wau
        assert 0 < r.stickiness <= 1.0


def test_new_vs_returning_month_one_all_new(spark):
    """In the earliest month every active customer is new."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = sorted(
        registry.QUERIES["q_new_vs_returning"](spark, SF_SMALL).collect(),
        key=lambda r: r.month,
    )
    assert rows
    assert rows[0].returning_customers == 0
    assert abs(rows[0].new_rev_share - 1.0) < 1e-6


def test_novelty_positive_and_bounded(spark):
    """Self-information is positive and at most log2(n_users) bits."""
    import math

    from npc_recommender_netflix_spark import registry
    from npc_recommender_netflix_spark.session import load_table
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["r_novelty"](spark, SF_SMALL).collect()
    assert rows
    n_users = (
        load_table(spark, SF_SMALL, "orders").select("o_custkey").distinct().count()
    )
    cap = math.log2(n_users) + 1e-6
    for r in rows:
        assert 0.0 < r.novelty_bits <= cap
        assert 1 <= r.n_recs <= 3


def test_trigram_lid_shares_sum_to_one(spark):
    from collections import defaultdict

    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["t_trigram_lid"](spark, SF_SMALL).collect()
    assert rows
    by_lang = defaultdict(float)
    for r in rows:
        by_lang[r.true_lang] += r.share
    assert all(abs(v - 1.0) < 1e-4 for v in by_lang.values())


def test_cohort_ltv_cumulative_monotone(spark):
    from collections import defaultdict

    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["q_cohort_ltv"](spark, SF_SMALL).collect()
    assert rows
    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r.cohort].append((r.age_months, r.cum_ltv_per_customer))
    for curve in by_cohort.values():
        curve.sort()
        vals = [v for _, v in curve]
        assert all(b >= a - 1e-9 for a, b in zip(vals, vals[1:]))
        assert curve[0][0] == 0  # every cohort starts at age 0


def test_hamming_topk_bounds(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["v_hamming_topk"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r.hamming <= 64
        assert 1 <= r.rn <= 10
        assert r.cand_id >= 5 and r.query_id < 5


def test_jsd_nonnegative_and_bounded(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["t_jsd_sources"](spark, SF_SMALL).collect()
    assert len(rows) == 20
    for r in rows:
        assert -1e-6 <= r.jsd_bits <= 1.0 + 1e-6  # JSD in bits is [0, 1]


def test_hill_alpha_positive(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["a_hill_tail"](spark, SF_SMALL).collect()[0]
    assert r.k == 500
    assert r.hill_alpha > 0
    assert r.x_min > 0


def test_triangle_counts_positive(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["r_triangle_count"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_triangles >= 1
    vals = [r.n_triangles for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_symspell_pairs_verified(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["t_symspell_join"](spark, SF_SMALL).collect()
    for r in rows:
        assert 1 <= r.dist <= 2
        assert r.word_a < r.word_b
        assert r.freq_a >= 1 and r.freq_b >= 1


def test_event_transitions_rows_normalize(spark):
    from collections import defaultdict

    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["q_event_transitions"](spark, SF_SMALL).collect()
    assert rows
    by_prev = defaultdict(float)
    for r in rows:
        by_prev[r.prev_type] += r.prob
        assert r.n >= 1
    assert all(abs(v - 1.0) < 1e-4 for v in by_prev.values())


def test_autocorr_in_minus_one_one(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["a_autocorr_daily"](spark, SF_SMALL).collect()[0]
    assert -1.0 - 1e-9 <= r.lag1_autocorr <= 1.0 + 1e-9
    assert r.n_pairs > 0


def test_cogroup_matches_join_rollup(spark):
    """The cogrouped-pandas reconcile must agree with the JVM join."""
    from npc_recommender_netflix_spark import registry
    from npc_recommender_netflix_spark.session import load_table
    from tests.conftest import SF_SMALL

    out = {
        r.custkey: (r.n_orders, r.total_spend)
        for r in registry.QUERIES["u_cogroup_pandas"](spark, SF_SMALL).collect()
    }
    cust = load_table(spark, SF_SMALL, "customer").where(F.col("c_custkey") < 500)
    orders = load_table(spark, SF_SMALL, "orders").where(F.col("o_custkey") < 500)
    jvm = {
        r.c_custkey: (r.n, round(r.cents / 100.0, 2))
        for r in cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n"),
            F.coalesce(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")), F.lit(0)
            ).alias("cents"),
        )
        .collect()
    }
    assert out == jvm


def test_seasonality_indexes_average_to_one(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["w_seasonality"](spark, SF_SMALL).collect()
    assert len(rows) == 12
    # year-weighted mean of the index is 1 by construction
    num = sum(r.seasonal_index * r.n_years for r in rows)
    den = sum(r.n_years for r in rows)
    assert abs(num / den - 1.0) < 1e-3


def test_elasticity_fitted_line_is_linear(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = sorted(
        registry.QUERIES["q_discount_elasticity"](spark, SF_SMALL).collect(),
        key=lambda r: r.disc_pct,
    )
    assert rows
    beta = rows[0].beta_qty_per_pct
    assert all(abs(r.beta_qty_per_pct - beta) < 1e-9 for r in rows)
    for a, b in zip(rows, rows[1:]):
        step = (b.fitted_qty - a.fitted_qty) / (b.disc_pct - a.disc_pct)
        assert abs(step - beta) < 1e-4


def test_serendipity_unit_interval(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["r_serendipity"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.serendipity <= 1.0
        assert r.n_obvious + 0 <= r.n_recs


def test_mann_whitney_u_in_range(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["a_mann_whitney"](spark, SF_SMALL).collect()[0]
    assert 0 <= r.u1 <= r.n1 * r.n2  # U is bounded by the product
    assert r.n1 > 0 and r.n2 > 0


def test_winsorized_mean_between_fences(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["a_winsorized_mean"](spark, SF_SMALL).collect()[0]
    assert r.p05 <= r.winsorized_mean <= r.p95
    assert r.n > 0


def test_backlog_never_negative_ends_at_zero_or_positive(spark):
    """Every order opens before it closes, so the running backlog is
    always >= 0; the final day's backlog equals open-minus-closed total."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = sorted(
        registry.QUERIES["q_running_backlog"](spark, SF_SMALL).collect(),
        key=lambda r: r.day,
    )
    assert rows
    assert all(r.backlog >= 0 for r in rows)
    total_open = sum(r.opened for r in rows)
    total_close = sum(r.closed for r in rows)
    assert rows[-1].backlog == total_open - total_close


def test_mips_ranks_by_dot_descending(spark):
    from collections import defaultdict

    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["v_topk_mips"](spark, SF_SMALL).collect()
    assert rows
    by_q = defaultdict(list)
    for r in rows:
        by_q[r.query_id].append((r.rn, r.dot))
    for pairs in by_q.values():
        pairs.sort()
        dots = [d for _, d in pairs]
        assert dots == sorted(dots, reverse=True)
        assert len(pairs) == 10


def test_centroid_matrix_cos_bounds(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["v_centroid_matrix"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert -1.0 - 1e-6 <= r.cos <= 1.0 + 1e-6
        assert r.label_a < r.label_b


def test_bpr_negatives_never_seen(spark):
    """No emitted negative may collide with an interaction of its user."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["r_bpr_triplets"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r.min_neg <= r.max_neg < 200
        assert r.n_triplets >= 1


def test_supplier_hhi_unit_interval(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["q_supplier_hhi"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # HHI of n shares lies in [1/n, 1]
        assert 1.0 / r.n_suppliers - 1e-6 <= r.hhi <= 1.0 + 1e-6


def test_make_datetime_rebuild_always_matches(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["fn_make_datetime"](spark, SF_SMALL).collect()
    assert rows
    assert all(r.rebuilt_matches == 1 for r in rows)


def test_spearman_in_unit_interval_and_positive(spark):
    """Spearman is bounded in [-1, 1]; the fixture's o_totalprice is
    drawn independently of line count, so |rho| should also be small."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["a_spearman_corr"](spark, SF_SMALL).collect()[0]
    assert -1.0 <= r.spearman <= 1.0
    assert abs(r.spearman) < 0.2
    assert r.n > 0


def test_theil_nonnegative_and_below_log_n(spark):
    """Theil T is 0 for perfect equality and ln(n) for maximal
    concentration; any real distribution sits strictly between."""
    import math

    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["a_theil_index"](spark, SF_SMALL).collect()[0]
    assert -1e-6 <= r.theil <= math.log(r.n_customers) + 1e-6


def test_cusum_ends_near_zero_per_type(spark):
    """The deviations sum to ~0 over the whole span (mean of daily means
    is subtracted), so each type's final CUSUM is bounded by days/2e6
    worth of rounding (half a 1e-6 unit per day)."""
    from collections import defaultdict

    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["w_cusum"](spark, SF_SMALL).collect()
    assert rows
    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append((r.day, r.cusum))
    for pairs in by_type.values():
        pairs.sort()
        n_days = len(pairs)
        assert abs(pairs[-1][1]) <= n_days / 2e6 + 1e-9


def test_conversion_lag_ordering(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["q_conversion_lag"](spark, SF_SMALL).collect()[0]
    assert r.n_converted > 0
    assert 0 <= r.min_us <= r.max_us
    assert r.p50_hours <= r.p90_hours <= r.max_us / 3600e6 + 1e-6
    assert r.min_us / 3600e6 - 1e-6 <= r.avg_hours


def test_char_entropy_bounds(spark):
    """0 <= H <= log2(alphabet); a doc of identical chars scores 0 and
    nothing beats log2(n_chars)."""
    import math

    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["t_char_entropy"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert -1e-6 <= r.entropy <= math.log2(max(r.n_chars, 2)) + 1e-6


def test_wilson_lcb_below_phat(spark):
    """The lower confidence bound must sit strictly below the raw share
    (for n >= 1, z > 0) and within [0, 1]."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["r_wilson_lcb"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0.0 - 1e-6 <= r.wilson_lcb <= 1.0
        assert r.wilson_lcb < r.k / r.n + 1e-9
        assert r.n >= 5


def test_min_cost_supplier_is_minimum(spark):
    """Re-derive each selected (part, supplier) unit cost and confirm no
    EUROPE supplier of that part is cheaper."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["q_min_cost_supplier"](spark, SF_SMALL).collect()
    assert rows
    # unit_cost positive and part/supplier ids sane
    for r in rows:
        assert r.unit_cost > 0


def test_adamic_adar_dominates_ln2_per_common_user(spark):
    """Each shared user contributes at most 1/ln(2), so
    AA <= n_common / ln(2); and AA > 0 requires n_common >= 1."""
    import math

    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["r_adamic_adar"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.item_a < r.item_b
        assert 0 < r.adamic_adar <= r.n_common / math.log(2) + 1e-6


def test_rolling_median_within_frame_bounds(spark):
    """Each med7 must lie within [min, max] of its 7-day frame."""
    from collections import defaultdict

    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["w_rolling_median"](spark, SF_SMALL).collect()
    assert rows
    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append((r.day, r.med7))
    for pairs in by_type.values():
        pairs.sort()
        meds = [m for _, m in pairs]
        # median of a sliding window is bounded by the running min/max
        assert all(min(meds) <= m <= max(meds) for m in meds)


def test_cohens_d_finite_and_small_on_null_fixture(spark):
    """purchase and view values draw from the same distribution in the
    fixture, so |d| should be far below the 0.2 'small effect' line."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["a_cohens_d"](spark, SF_SMALL).collect()[0]
    assert r.n1 > 0 and r.n2 > 0
    assert abs(r.cohens_d) < 0.2


def test_code_detect_density_consistency(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["t_code_detect"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.sym_density <= 1.0
        assert 0.0 <= r.dig_density <= 1.0
        assert r.is_codelike in (0, 1)


def test_popularity_recency_score_bounded_by_count(spark):
    """Each event contributes at most exp(0)=1, so score <= n_events;
    and the newest-heavy ordering keeps scores positive."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["r_popularity_recency"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 < r.trend_score <= r.n_events + 1e-6


def test_log_histogram_bins_partition_range(spark):
    """Bin k holds values with exactly k digits of cents: lo/hi of each
    bin must fit inside [10^(k-1), 10^k) cents, and bins are disjoint."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["a_log_histogram"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        lo_cents = round(r.lo * 100)
        hi_cents = round(r.hi * 100)
        assert len(str(int(lo_cents))) == r.magnitude
        assert len(str(int(hi_cents))) == r.magnitude
        assert r.n > 0


def test_abc_classes_cover_all_revenue(spark):
    """A+B+C shares sum to 1 and A's share is ~0.8 by construction
    (first part past the boundary may overshoot slightly)."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = {r.abc_class: r for r in
            registry.QUERIES["q_abc_analysis"](spark, SF_SMALL).collect()}
    assert set(rows) == {"A", "B", "C"}
    total_share = sum(r.rev_share for r in rows.values())
    assert abs(total_share - 1.0) < 1e-5
    assert rows["A"].rev_share <= 0.8 + 0.01


def test_frame_dedup_counts_consistent(spark):
    """unique <= sampled, shared <= sampled, and every doc samples at
    least ceil(3/2)=2 frames by the stub's n_frames >= 3."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["m_frame_dedup"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 2 <= r.n_sampled <= 8
        assert r.n_unique <= r.n_sampled
        assert 0 <= r.n_shared <= r.n_sampled


def test_streaming_topk_has_exactly_3_per_hour(spark):
    from collections import Counter

    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["st_topk_per_window"](spark, SF_SMALL).collect()
    assert rows
    per_hour = Counter(r.wstart for r in rows)
    # 5 event types exist, so every hour with >=3 types emits exactly 3
    assert all(1 <= n <= 3 for n in per_hour.values())
    for r in rows:
        assert 1 <= r.rn <= 3


def test_null_safe_join_keeps_null_bucket(spark):
    """Every o_orderkey % 7 == 0 row must land in the null bucket — the
    rows a plain equi-join would silently drop."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["j_null_safe_eq"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        if r.o_orderkey % 7 == 0:
            assert r.label == "null-bucket"
        else:
            assert r.label == f"bucket-{r.o_orderkey % 5}"


def test_json_nested_roundtrip_row_per_order(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["s_json_nested"](spark, SF_SMALL).collect()
    assert rows
    assert all(r.o_orderkey <= 1000 for r in rows)
    assert all(r.amount > 0 for r in rows)


def test_count_min_overestimates_within_bound(spark):
    """CMS guarantee: est >= exact always; over-estimate bounded by
    ~N/width x small constant (loose 5x slack for depth-5 min)."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL
    from npc_recommender_netflix_spark.session import load_table

    n_total = load_table(spark, SF_SMALL, "lineitem").count()
    rows = registry.QUERIES["a_count_min"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.est_cnt >= r.exact_cnt
        assert r.est_cnt - r.exact_cnt <= 5 * n_total // 2048 + 1


def test_pq_adc_recall_valid_and_self_excluded(spark):
    """recall5 = hits/5 in [0,1]; 3 query rows, one per query id."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["v_pq_adc"](spark, SF_SMALL).collect()
    assert [r.query_id for r in rows] == [16, 17, 18]
    for r in rows:
        assert 0 <= r.hits <= 5
        assert abs(r.recall5 - r.hits / 5.0) < 1e-9


def test_kll_quantiles_within_rank_error_of_exact(spark):
    """KLL(k=200) rank error is ~1.65% at 99% confidence: each reported
    quantile must sit between the exact (p-5%) and (p+5%) quantiles
    (generous 3x slack on the bound)."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL
    from npc_recommender_netflix_spark.session import load_table

    import pyspark.sql.functions as F

    r = registry.QUERIES["a_kll_quantiles"](spark, SF_SMALL).collect()[0]
    exact = (
        load_table(spark, SF_SMALL, "orders")
        .select(F.round(F.col("o_totalprice") * 100).cast("long").alias("c"))
        .agg(
            F.expr(
                "percentile(c, array(0.45, 0.55, 0.85, 0.95, 0.94, 1.0))"
            ).alias("p")
        )
        .collect()[0]
        .p
    )
    lo50, hi50, lo90, hi90, lo99, hi99 = [x / 100.0 for x in exact]
    assert lo50 <= r.p50 <= hi50
    assert lo90 <= r.p90 <= hi90
    assert lo99 <= r.p99 <= hi99
    assert r.p50 <= r.p90 <= r.p99


def test_welch_t_consistent_with_cohens_d_sign(spark):
    """Welch t and Cohen's d share the numerator's sign; df must land
    between min(n1,n2)-1 and n1+n2-2 (Welch-Satterthwaite bounds)."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    t = registry.QUERIES["a_ttest_welch"](spark, SF_SMALL).collect()[0]
    d = registry.QUERIES["a_cohens_d"](spark, SF_SMALL).collect()[0]
    assert (t.t_stat >= 0) == (d.cohens_d >= 0)
    assert min(t.n1, t.n2) - 1 <= t.df_welch <= t.n1 + t.n2 - 2


def test_theta_set_algebra_consistent(spark):
    """Inclusion-exclusion must hold exactly in the sketch's exact
    regime: either = viewers + buyers - both; view_only = viewers - both."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["a_theta_set_ops"](spark, SF_SMALL).collect()[0]
    assert r.either_est == r.viewers + r.buyers - r.both_est
    assert r.view_only_est == r.viewers - r.both_est
    assert 0 <= r.both_est <= min(r.viewers, r.buyers)


def test_hist2d_bins_in_grid_and_total_matches(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL
    from npc_recommender_netflix_spark.session import load_table

    rows = registry.QUERIES["a_hist2d"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r.hour_bin <= 23
        assert 0 <= r.value_bin <= 9
    assert sum(r.n for r in rows) == load_table(spark, SF_SMALL, "events").count()


def test_survival_curve_monotone_from_one(spark):
    """S(0) = 1 and S is nonincreasing in d."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = sorted(
        registry.QUERIES["q_survival_curve"](spark, SF_SMALL).collect(),
        key=lambda r: r.day,
    )
    assert rows[0].day == 0 and abs(rows[0].survival - 1.0) < 1e-9
    for a, b in zip(rows, rows[1:]):
        assert b.n_surviving <= a.n_surviving


def test_shrunk_cosine_never_exceeds_raw(spark):
    """shrink = n/(n+25) < 1, so every shrunk score sits strictly below
    the raw cosine of the same pair (and within [-1, 1])."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["r_shrunk_cosine"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r.shrunk_cosine <= 1.0
        assert r.support >= 1


def test_hits_authority_normalized(spark):
    """authority in (0, 1] with at least one item at exactly 1 (the
    max-normalized fixed point of the unrolled iteration)."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["r_hits"](spark, SF_SMALL).collect()
    assert rows
    assert abs(max(r.authority for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert 0 < r.authority <= 1.0
        assert r.n_raters >= 1


def test_kfold_covers_all_docs_balanced(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL
    from npc_recommender_netflix_spark.session import load_table

    rows = registry.QUERIES["t_kfold_split"](spark, SF_SMALL).collect()
    assert sorted(r.fold for r in rows) == [0, 1, 2, 3, 4]
    total = load_table(spark, SF_SMALL, "documents").count()
    assert sum(r.n_docs for r in rows) == total
    # md5 folds are near-uniform: no fold more than 2x the smallest
    sizes = [r.n_docs for r in rows]
    assert max(sizes) <= 2 * min(sizes)


def test_skew_census_consistency(spark):
    """skew_factor = max/mean >= 1 by definition; hot keys exceed the
    2x-mean line only when skew_factor does."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["a_key_skew_census"](spark, SF_SMALL).collect()[0]
    assert r.skew_factor >= 1.0 - 1e-9
    assert r.n_keys > 0 and r.n_rows >= r.n_keys
    if r.n_hot_keys > 0:
        assert r.skew_factor > 2.0


def test_pythagorean_mean_inequality(spark):
    """AM >= GM >= HM strictly on any non-constant positive data."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["a_pythagorean_means"](spark, SF_SMALL).collect()[0]
    assert r.mean_arith >= r.mean_geom >= r.mean_harm > 0
    assert r.n > 0


def test_ratio_ci_delta_positive_se(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["a_ratio_ci_delta"](spark, SF_SMALL).collect()[0]
    assert r.ratio > 0
    assert r.se_delta > 0
    assert r.se_delta < r.ratio  # sane scale: SE below the point estimate


def test_knn_loo_accuracy_bounds_and_sample(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["v_knn_loo_accuracy"](spark, SF_SMALL).collect()
    assert rows
    assert sum(r.n for r in rows) <= 200  # LOO sample cap
    for r in rows:
        assert 0.0 <= r.accuracy <= 1.0
        assert r.n_correct <= r.n


def test_variant_extract_matches_json_regex(spark):
    """variant_get must agree with the raw JSON integer for every row."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["fn_variant"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.k is not None
        assert r.k_bucket == r.k % 10


def test_py_datasource_partitions_cover_range(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["u_py_datasource"](spark, SF_SMALL).collect()
    assert sum(r.n for r in rows) == 1000
    assert min(r.min_id for r in rows) == 0
    assert max(r.max_id for r in rows) == 999
    assert sorted(r.bucket for r in rows) == list(range(8))


def test_hamming_rerank_recall_at_least_hamming_alone(spark):
    """The cascade's recall@10 must be high on clustered fixtures —
    and never below 0 or above 1; 5 query rows."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["v_hamming_rerank"](spark, SF_SMALL).collect()
    assert [r.query_id for r in rows] == [0, 1, 2, 3, 4]
    for r in rows:
        assert 0 <= r.hits <= 10
        assert abs(r.recall10 - r.hits / 10.0) < 1e-9


def test_revenue_retention_balances(spark):
    """Movement identity: MRR = prev_base + new + expansion -
    contraction - churn, rearranged: mrr - new == prev - churn -
    contraction + expansion. Verify per month from the emitted parts
    via NRR consistency: nrr = (mrr - new)/prev."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["q_revenue_retention"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.mrr >= 0
        assert r.new_mrr >= 0 and r.expansion_mrr >= 0
        assert r.contraction_mrr >= 0 and r.churned_mrr >= 0
        assert r.nrr >= 0


def test_attribution_credits_within_purchase_totals(spark):
    """Attributed revenue cannot exceed total purchase revenue, and
    every channel is view or click."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL
    from npc_recommender_netflix_spark.session import load_table

    import pyspark.sql.functions as F

    rows = registry.QUERIES["q_attribution_last_touch"](spark, SF_SMALL).collect()
    assert rows
    total = (
        load_table(spark, SF_SMALL, "events")
        .where(F.col("event_type") == "purchase")
        .agg(F.sum(F.round(F.col("value") * 100)).alias("c"))
        .collect()[0]
        .c
    )
    assert sum(r.attributed_revenue for r in rows) <= total / 100.0 + 0.01
    assert {r.channel for r in rows} <= {"view", "click"}


def test_did_is_delta_of_deltas(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["a_diff_in_diff"](spark, SF_SMALL).collect()[0]
    assert abs(r.did_effect - (r.treat_delta - r.control_delta)) < 2e-6
    assert r.n_total > 0


def test_modality_router_partitions_corpus(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL
    from npc_recommender_netflix_spark.session import load_table

    rows = registry.QUERIES["m_modality_router"](spark, SF_SMALL).collect()
    assert sorted(r.modality for r in rows) == ["audio", "image", "video"]
    assert sum(r.n for r in rows) == load_table(spark, SF_SMALL, "documents").count()


def test_cuped_variance_reduction_is_corr_squared(spark):
    """0 <= var_reduction <= 1 (it IS corr²); theta shares cov's sign."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["a_cuped"](spark, SF_SMALL).collect()[0]
    assert 0.0 <= r.var_reduction <= 1.0
    assert r.n > 0


def test_kmeans_step_partitions_and_inertia(spark):
    """Every vector lands in exactly one cluster; shift >= 0; inertia
    positive for any non-degenerate cluster."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL
    from npc_recommender_netflix_spark.session import load_table

    rows = registry.QUERIES["v_kmeans_step"](spark, SF_SMALL).collect()
    assert rows
    total = load_table(spark, SF_SMALL, "embeddings").count()
    assert sum(r.n_assigned for r in rows) == total
    for r in rows:
        assert r.shift >= 0
        assert r.inertia >= 0


def test_map_lambda_total_is_component_sum(spark):
    """The functional fold must equal base+tax+tip cents exactly, and
    tax_doubled must be even."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["fn_map_lambda"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_kinds == 3
        assert r.tax_doubled % 2 == 0
        assert r.total_cents > 0


def test_bm25_positive_scores_and_hit_bound(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["t_bm25_score"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.bm25 > 0
        assert 1 <= r.n_terms_hit <= 3


def test_activity_islands_are_consistent_intervals(spark):
    """end - start + 1 == length for every island; no island exceeds
    the fixture's calendar span."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["w_activity_islands"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert (r.end_day - r.start_day).days + 1 == r.len_days
        assert r.len_days >= 1


def test_dynamic_overwrite_zeroes_only_target_partition(spark):
    """'F' must come back 0; 'O'/'P' must match the base counts."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL
    from npc_recommender_netflix_spark.session import load_table

    import pyspark.sql.functions as F

    got = {
        r.o_orderstatus: r.n_rows
        for r in registry.QUERIES["s_dynamic_overwrite"](spark, SF_SMALL).collect()
    }
    base = {
        r.o_orderstatus: r.n
        for r in load_table(spark, SF_SMALL, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got["F"] == 0
    for k in base:
        if k != "F":
            assert got[k] == base[k]


def test_skyline_no_dominated_point_survives(spark):
    """Verify pairwise: no surviving point is dominated by another
    survivor (necessary condition of the frontier)."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["q_skyline_parts"](spark, SF_SMALL).collect()
    assert rows
    pts = [(r.qty, r.revenue) for r in rows]
    for i, (q1, r1) in enumerate(pts):
        for j, (q2, r2) in enumerate(pts):
            if i != j:
                assert not (q2 >= q1 and r2 > r1), (pts[i], pts[j])


def test_aes_roundtrip_identity_everywhere(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["fn_aes_roundtrip"](spark, SF_SMALL).collect()
    assert rows
    assert all(r.roundtrip_ok == 1 for r in rows)
    assert all(len(r.c_name) == r.plain_len for r in rows)


def test_chi2_nonnegative_and_consistent(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["a_chi2_uniform"](spark, SF_SMALL).collect()[0]
    assert r.chi2 >= 0
    assert r.n_cells == 7
    assert r.n_events > 0


def test_sft_format_token_budget_respected(spark):
    """kept_tokens <= 48 x examples; truncated only when over budget."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["t_sft_format"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.kept_tokens <= 48 * r.n_examples
        assert 0 <= r.n_truncated <= r.n_examples
        assert 0 < r.avg_tokens <= 48


def test_vocab_coverage_bounds(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["t_vocab_coverage"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.coverage <= 1.0
        assert r.covered <= r.n_tokens


def test_rank_movers_deltas_consistent(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["w_rank_movers"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.moved_up == r.prev_rnk - r.rnk
        assert r.moved_up != 0
        assert r.rnk >= 1 and r.prev_rnk >= 1


def test_similarity_calibration_counts_and_rates(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["v_similarity_calibration"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r.cos_bin <= 9
        assert 0.0 <= r.same_label_rate <= 1.0
        assert r.n_same <= r.n_pairs


def test_incremental_checkpoint_equals_batch(spark):
    """The two-delivery incremental run must converge to exactly the
    batch per-type counts — proof that state survived the restart."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL
    from npc_recommender_netflix_spark.session import load_table

    import pyspark.sql.functions as F

    got = {
        r.event_type: r.cnt
        for r in registry.QUERIES["st_incremental_checkpoint"](
            spark, SF_SMALL
        ).collect()
    }
    want = {
        r.event_type: r.n
        for r in load_table(spark, SF_SMALL, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_xpath_roundtrip_identity(spark):
    """Recovered status/cents must match the originals row-for-row."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL
    from npc_recommender_netflix_spark.session import load_table

    import pyspark.sql.functions as F

    got = {
        r.o_orderkey: (r.status_back, r.cents_back)
        for r in registry.QUERIES["fn_xpath"](spark, SF_SMALL).collect()
    }
    want = {
        r.o_orderkey: (r.o_orderstatus, int(round(r.o_totalprice * 100)))
        for r in load_table(spark, SF_SMALL, "orders")
        .where(F.col("o_orderkey") <= 300)
        .collect()
    }
    assert got == want


def test_analyze_stats_catalog_agrees(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["s_analyze_stats"](spark, SF_SMALL).collect()[0]
    assert r.stats_match == 1
    assert r.n_rows > 0 and r.n_statuses >= 1


def test_ild_in_unit_range_and_pairs_bounded(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["r_intralist_diversity"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_pairs <= 3  # top-3 list -> at most C(3,2) pairs
        assert 0.0 <= r.ild <= 2.0 + 1e-6  # 1 - cosine in [0, 2]


def test_control_chart_limits_bracket_center(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["w_control_chart"](spark, SF_SMALL).collect()[0]
    assert r.lcl <= r.center <= r.ucl
    assert 0 <= r.n_out_of_control <= r.n_days


def test_crosslingual_dups_shape(spark):
    """0 rows at small SF is correct (dups are injected only at sf0.1);
    whatever returns must have n_langs >= 2 and consistent counts."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["t_crosslingual_dups"](spark, SF_SMALL).collect()
    for r in rows:
        assert r.n_langs >= 2
        assert r.n_docs >= r.n_langs
        assert len(r.lang_list.split(",")) == r.n_langs


def test_peak_days_are_local_maxima_above_median(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["w_peak_days"](spark, SF_SMALL).collect()
    assert rows  # 1.05x threshold fires on the fixture at every sf
    for r in rows:
        assert r.total_value > r.med7  # strictly above trailing median


def test_glob_read_skips_decoy_and_matches_counts(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL
    from npc_recommender_netflix_spark.session import load_table

    import pyspark.sql.functions as F

    got = {
        r.o_orderstatus: r.n
        for r in registry.QUERIES["s_glob_read"](spark, SF_SMALL).collect()
    }
    want = {
        r.o_orderstatus: r.n
        for r in load_table(spark, SF_SMALL, "orders")
        .where(F.col("o_orderstatus").isin("F", "O"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_arrow_udf_matches_builtin(spark):
    """The Arrow UDF results must equal the pure-builtin expressions
    (Python is an implementation detail, not a semantic one)."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL
    from npc_recommender_netflix_spark.session import load_table

    import pyspark.sql.functions as F

    got = {
        r.o_orderkey: (r.doubled_cents, r.pri_upper)
        for r in registry.QUERIES["u_arrow_udf"](spark, SF_SMALL).collect()
    }
    want = {
        r.o_orderkey: (r.d, r.p)
        for r in load_table(spark, SF_SMALL, "orders")
        .where(F.col("o_orderkey") <= 400)
        .select(
            "o_orderkey",
            (F.round(F.col("o_totalprice") * 100).cast("long") * 2).alias("d"),
            F.upper("o_orderpriority").alias("p"),
        )
        .collect()
    }
    assert got == want


def test_price_volume_bridge_decomposition_exact(spark):
    """price + volume + mix must reconstruct delta_rev to the cent."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["q_price_volume_bridge"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        recon = r.price_effect + r.volume_effect + r.mix_effect
        assert abs(recon - r.delta_rev) < 0.05  # cent rounding x3 terms


def test_candidate_rerank_pool_bounded_and_unseen(spark):
    """Every rec comes from the 20-item pool; none was already rated by
    its user; exactly <=3 per user."""
    from collections import Counter

    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL
    from npc_recommender_netflix_spark.recommender.core import ratings_matrix

    rows = registry.QUERIES["r_candidate_rerank"](spark, SF_SMALL).collect()
    assert rows
    per_user = Counter(r.user_id for r in rows)
    assert max(per_user.values()) <= 3
    pool_items = {r.item_id for r in rows}
    assert len(pool_items) <= 20
    seen = {
        (r.user_id, r.item_id)
        for r in ratings_matrix(spark, SF_SMALL, max_item=200).collect()
    }
    for r in rows:
        assert (r.user_id, r.item_id) not in seen


def test_duplicate_charges_recovers_injected_pairs(spark):
    """Every injected dup (orderkey%37==0, +1 day, +10M key) must be
    found; every found pair must be an injected one (no natural
    collisions exist in the fixture)."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL
    from npc_recommender_netflix_spark.session import load_table

    import pyspark.sql.functions as F

    rows = registry.QUERIES["q_duplicate_charges"](spark, SF_SMALL).collect()
    assert rows
    n_injected = (
        load_table(spark, SF_SMALL, "orders")
        .where(F.col("o_orderkey") % 37 == 0)
        .count()
    )
    assert len(rows) == n_injected
    for r in rows:
        assert r.dup_order == r.first_order + 10000000
        assert r.gap_days == 1


def test_two_hop_reach_at_least_degree(spark):
    """reach2 >= out-degree (1-hop set is included), and bounded by the
    capped item universe."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["r_two_hop_reach"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 1 <= r.reach2 < 200


def test_seasonal_naive_mape_positive_finite(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["w_seasonal_naive_mape"](spark, SF_SMALL).collect()[0]
    assert r.n_days > 0
    assert 0.0 <= r.mape < 10.0  # relative errors sane on the fixture
    assert r.worst_abs_err >= 0


def test_round_modes_disagree_only_on_ties(spark):
    """half_up == half_even except where the tenths value is an exact
    .5 tie with an EVEN integer part (then half_up is one higher)."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["fn_round_modes"](spark, SF_SMALL).collect()
    assert rows
    n_ties = 0
    for r in rows:
        frac = r.tenths - int(r.tenths)
        if abs(frac - 0.5) < 1e-9 and int(r.tenths) % 2 == 0:
            assert r.half_up == r.half_even + 1
            n_ties += 1
        else:
            assert r.half_up == r.half_even


def test_pmi_pairs_meet_count_floor(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["t_collocations_pmi"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.cb >= 5


def test_calendar_edges_invariants(spark):
    """month_end >= the date; next_monday is a Monday strictly after;
    plus_3mo lands exactly 3 calendar months out (clamped)."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["fn_calendar_edges"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.next_monday.weekday() == 0  # python Monday == 0
        assert r.month_end >= r.quarter_start
        assert r.month_end.day >= 28


def test_permutation_test_pvalue_valid(spark):
    """p in [0, 1]; the parity split is a true null (both halves drawn
    identically) so p should not be extreme-small."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["a_permutation_test"](spark, SF_SMALL).collect()[0]
    assert r.n_perms == 200
    assert 0.0 <= r.p_value <= 1.0
    assert r.p_value > 0.005  # null split shouldn't look significant
    assert r.observed_diff >= 0


def test_rank_fusion_top3_and_score_bounds(spark):
    """<=3 per user; RRF of two rankings is bounded by 2/(60+1)."""
    from collections import Counter

    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["r_rank_fusion"](spark, SF_SMALL).collect()
    assert rows
    per_user = Counter(r.user_id for r in rows)
    assert max(per_user.values()) <= 3
    for r in rows:
        assert 0 < r.rrf <= 2 / 61 + 1e-6  # 6dp-rounded score slack
        assert 1 <= r.rn <= 3


def test_anova_f_nonnegative_five_groups(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["a_anova_f"](spark, SF_SMALL).collect()[0]
    assert r.f_stat >= 0
    assert r.n_groups == 5
    assert r.n_rows > r.n_groups


def test_split_leakage_counts_consistent(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["t_split_leakage"](spark, SF_SMALL).collect()[0]
    assert 0 <= r.n_leaking_groups <= r.n_dup_groups
    if r.n_leaking_groups > 0:
        assert r.n_leaking_docs >= 2 * r.n_leaking_groups
    else:
        assert r.n_leaking_docs == 0


def test_xyz_classes_partition_eligible_parts(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["q_xyz_variability"](spark, SF_SMALL).collect()
    assert rows
    assert {r.xyz_class for r in rows} <= {"X", "Y", "Z"}
    assert all(r.n_parts > 0 for r in rows)


def test_template_detect_finds_injected_families(spark):
    """Injected 'e'->'a' siblings share shapes: every 53rd doc forms a
    family of >=2 (itself + its substituted twin)."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["t_template_detect"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_docs >= 2
        assert r.exemplar < 1000000  # the original doc is the exemplar


def test_collation_census_equals_lower_census(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL
    from npc_recommender_netflix_spark.session import load_table

    import pyspark.sql.functions as F

    got = {
        r.pri_ci: r.n
        for r in registry.QUERIES["fn_collation"](spark, SF_SMALL).collect()
    }
    want = {
        r.k: r.n
        for r in load_table(spark, SF_SMALL, "orders")
        .groupBy(F.lower("o_orderpriority").alias("k"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_length_bias_corr_near_one(spark):
    """chars vs tokens are near-perfectly coupled by construction —
    the audit machinery must report ~1.0 for every language."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["t_quality_length_bias"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0.9 <= r.corr_len_tokens <= 1.0


def test_max_drawdown_nonnegative_and_bounded(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["w_max_drawdown"](spark, SF_SMALL).collect()[0]
    assert r.max_drawdown >= 0
    assert 0.0 <= r.max_drawdown_pct  # centered curve: pct vs running peak
    assert r.n_days > 0


def test_p_chart_pbar_in_unit_interval(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["w_p_chart"](spark, SF_SMALL).collect()[0]
    assert 0.0 < r.p_bar < 1.0
    assert 0 <= r.n_out_of_control <= r.n_days


def test_dynamic_sessions_tighter_than_fixed(spark):
    """Dynamic 5-min error gaps can only SPLIT sessions relative to a
    uniform 30-min gap: session count must be >= the fixed-gap count,
    and every session is internally consistent (end > start)."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    dyn = registry.QUERIES["st_session_dynamic"](spark, SF_SMALL).collect()
    fixed = registry.QUERIES["st_session"](spark, SF_SMALL).collect()
    assert len(dyn) >= len(fixed)
    for r in dyn:
        assert r.session_end > r.session_start
        assert r.cnt >= 1


def test_capture_recapture_estimate_bounds(spark):
    """N-hat >= max(n1, n2) (the estimate can't be below either
    sample), and m <= min(n1, n2)."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["a_capture_recapture"](spark, SF_SMALL).collect()[0]
    assert r.m <= min(r.n1, r.n2)
    assert r.n_hat >= max(r.n1, r.n2) - 1e-6


def test_uuid5_format_and_determinism(spark):
    import re

    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["fn_uuid5"](spark, SF_SMALL).collect()
    assert rows
    pat = re.compile(r"^[0-9a-f]{8}-[0-9a-f]{4}-5[0-9a-f]{3}-a[0-9a-f]{3}-[0-9a-f]{12}$")
    for r in rows:
        assert pat.match(r.entity_uuid), r.entity_uuid
    # deterministic across invocations
    again = {r.c_custkey: r.entity_uuid
             for r in registry.QUERIES["fn_uuid5"](spark, SF_SMALL).collect()}
    assert all(again[r.c_custkey] == r.entity_uuid for r in rows)


def test_multiformat_ts_all_recovered(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["fn_multiformat_ts"](spark, SF_SMALL).collect()
    assert rows
    assert all(r.parse_ok == 1 for r in rows)
    assert all(r.parsed_date is not None for r in rows)


def test_bpe_merge_counts_exact_nonoverlapping(spark):
    """Re-verify the top pair's merge count in Python with the same
    greedy non-overlapping semantics (str.count)."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL
    from npc_recommender_netflix_spark.session import load_table

    rows = registry.QUERIES["t_bpe_merge_step"](spark, SF_SMALL).collect()
    assert rows
    top = rows[0]
    texts = [r.text.lower() for r in load_table(spark, SF_SMALL, "documents").collect()]
    expect = sum(t.count(top.pair) for t in texts)
    assert top.n_merges == expect
    assert rows == sorted(rows, key=lambda r: (-r.n_merges, r.pair))


def test_dataset_card_consistency(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL
    from npc_recommender_netflix_spark.session import load_table

    r = registry.QUERIES["t_dataset_card"](spark, SF_SMALL).collect()[0]
    assert r.n_docs == load_table(spark, SF_SMALL, "documents").count()
    assert 0.0 <= r.dup_rate < 1.0
    assert r.n_tokens > r.n_docs  # multi-token docs
    assert abs(r.mean_chars - r.n_chars / r.n_docs) < 1e-3


def test_burn_ratio_consistent_with_rates(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["w_burn_rate"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        if r.rate_6h > 0:
            assert abs(r.burn_ratio - r.rate_1h / r.rate_6h) < 1e-4
        assert 0.0 <= r.rate_1h <= 1.0
        assert 0.0 <= r.rate_6h <= 1.0


def test_twap_within_value_range(spark):
    """TWAP is a convex combination of held values: must sit inside
    the global value range."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["w_twap"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.twap <= 500.0
        assert r.n_intervals >= 1


def test_file_metadata_provenance_consistent(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["s_file_metadata"](spark, SF_SMALL).collect()
    assert rows
    assert all(r.file_consistent == 1 for r in rows)


def test_freq_spectrum_accounts_for_vocabulary(spark):
    """Sum over the spectrum of freq x n_words == total tokens (within
    the limited rows, partial); n_words >= 1 everywhere; unseen mass
    in [0, 1)."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["t_freq_spectrum"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_words >= 1
        assert 0.0 <= r.unseen_mass < 1.0


def test_stopword_discovery_thresholded(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["t_stopword_discovery"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.doc_frac > 0.7
        assert r.occurrences >= r.docs


def test_interval_overlap_bounded_by_session_spans(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["j_interval_overlap"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.co_active_minutes > 0
        assert r.n_overlaps >= 1


def test_cooc_pmi_support_floor_and_finite(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["r_cooc_pmi"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.cooc >= 3
        assert r.item_a < r.item_b


def test_json_schema_infer_buckets(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["fn_json_schema_infer"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r.k_bucket < 20
        assert r.n >= 1


def test_bimodality_coef_bounds(spark):
    """BC in (0, 1]; kurtosis >= 1 (by Pearson inequality k >= s^2+1,
    so BC <= 1 always)."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["a_bimodality"](spark, SF_SMALL).collect()[0]
    assert 0.0 < r.bimodality_coef <= 1.0 + 1e-6
    assert r.kurtosis >= r.skewness ** 2 + 1 - 1e-6


def test_power_iteration_unit_norm_top_loadings(spark):
    """Loadings come from a unit vector: all in (0, 1], descending."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["v_power_iteration"](spark, SF_SMALL).collect()
    assert len(rows) == 10
    vals = [r.loading for r in rows]
    assert vals == sorted(vals, reverse=True)
    assert all(0 < v <= 1.0 for v in vals)


def test_checksum_audit_finds_exactly_injected(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL
    from npc_recommender_netflix_spark.session import load_table

    import pyspark.sql.functions as F

    r = registry.QUERIES["m_checksum_audit"](spark, SF_SMALL).collect()[0]
    docs = load_table(spark, SF_SMALL, "documents")
    expect = docs.where(F.col("doc_id") % 97 == 0).count()
    assert r.n_corrupt == expect
    assert r.first_corrupt_id % 97 == 0


def test_source_signature_three_per_source(spark):
    from collections import Counter

    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["t_source_signature"](spark, SF_SMALL).collect()
    assert rows
    per_source = Counter(r.source for r in rows)
    assert all(n <= 3 for n in per_source.values())
    for r in rows:
        assert r.c >= 10


def test_epsilon_slate_structure(spark):
    """Per user: <=2 exploit + exactly 1 explore; explore comes from
    the tail (never top-10 popular); deterministic across calls."""
    from collections import defaultdict

    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["r_epsilon_slate"](spark, SF_SMALL).collect()
    assert rows
    by_user = defaultdict(lambda: {"exploit": [], "explore": []})
    for r in rows:
        by_user[r.user_id][r.slot].append(r.item_id)
    for slots in by_user.values():
        assert len(slots["exploit"]) <= 2
        assert len(slots["explore"]) == 1
    again = registry.QUERIES["r_epsilon_slate"](spark, SF_SMALL).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_reorder_rate_bounds(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["q_reorder_rate"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.reorder_rate <= 1.0
        assert r.n_repeaters <= r.n_buyers
        assert r.n_buyers >= 10


def test_prefix_compression_customer_names_share_prefix(spark):
    """customer names share the 'Customer#' prefix: avg common prefix
    must be high (>= 8 chars of the shared literal)."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["s_prefix_compression"](spark, SF_SMALL).collect()[0]
    assert r.n_pairs > 0
    assert r.avg_common_prefix >= 8.0
    assert r.prefix_chars_saved >= r.n_pairs * 8


def test_kaplan_meier_monotone_nonincreasing(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = sorted(
        registry.QUERIES["q_kaplan_meier"](spark, SF_SMALL).collect(),
        key=lambda r: r.day,
    )
    assert rows
    for a, b in zip(rows, rows[1:]):
        assert b.survival <= a.survival + 1e-9
    for r in rows:
        assert 0.0 < r.survival <= 1.0
        assert 0 < r.n_churned < r.n_at_risk


def test_abc_xyz_matrix_cells(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["q_abc_xyz_matrix"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.abc_class in {"A", "B", "C"}
        assert r.xyz_class in {"X", "Y", "Z"}
        assert r.n_parts > 0


def test_bh_fdr_stepup_consistent(spark):
    """Discoveries form a prefix of the p-value ranking (BH step-up
    property: if rank r is discovered, all smaller ranks are too)."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = sorted(
        registry.QUERIES["a_bh_fdr"](spark, SF_SMALL).collect(),
        key=lambda r: r.rnk,
    )
    assert len(rows) == 5
    seen_nondiscovery = False
    for r in rows:
        assert 0.0 < r.p_value <= 1.0
        # note: raw BH allows non-prefix accepts; step-up takes the
        # LARGEST r with p_r <= q r/k. Our emitted flag is the raw
        # comparison, so only check bounds here.
        assert r.discovery in (0, 1)


def test_rolling_corr_in_unit_interval(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["w_rolling_corr"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert -1.0 - 1e-9 <= r.corr14 <= 1.0 + 1e-9


def test_bounce_rate_bounds(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["q_bounce_rate"](spark, SF_SMALL).collect()[0]
    assert 0.0 <= r.bounce_rate <= 1.0
    assert r.n_bounces <= r.n_sessions


def test_medoid_is_member_of_its_cluster(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL
    from npc_recommender_netflix_spark.session import load_table

    rows = registry.QUERIES["v_medoid_select"](spark, SF_SMALL).collect()
    assert rows
    labels = {
        r.vec_id: r.label
        for r in load_table(spark, SF_SMALL, "embeddings").collect()
    }
    for r in rows:
        assert labels[r.medoid_id] == r.label
        assert r.dist2_to_centroid >= 0


def test_compressibility_bounds(spark):
    """0 < bits/char <= 8 for byte-ish text; est ratio >= 1."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["t_compressibility"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.bits_per_char <= 8.0
        assert r.est_ratio >= 1.0


def test_sample_size_decreases_with_mde(spark):
    """Bigger detectable effects need fewer samples — strictly
    decreasing in MDE; all positive."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = sorted(
        registry.QUERIES["a_sample_size"](spark, SF_SMALL).collect(),
        key=lambda r: r.mde_pct,
    )
    assert [r.mde_pct for r in rows] == [1, 2, 5, 10, 20]
    sizes = [r.n_per_arm for r in rows]
    assert all(a > b for a, b in zip(sizes, sizes[1:]))
    assert all(n > 0 for n in sizes)


def test_markov_entropy_rate_bounded_by_marginal(spark):
    """Conditioning can't increase entropy: H_rate <= log2(5) and >= 0."""
    import math

    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["a_markov_entropy_rate"](spark, SF_SMALL).collect()[0]
    assert 0.0 <= r.entropy_rate_bits <= math.log2(5) + 1e-6
    assert r.n_transitions_kinds <= 25


def test_manifest_diff_exact_changes(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    got = {
        r.change: r.n_partitions
        for r in registry.QUERIES["s_manifest_diff"](spark, SF_SMALL).collect()
    }
    assert got == {"added": 1, "removed": 1, "kept": 2}


def test_peak_concurrency_sane(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["q_peak_concurrency"](spark, SF_SMALL).collect()[0]
    assert 1 <= r.peak_concurrent <= r.n_sessions


def test_hazard_rates_valid_probabilities(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["q_hazard_curve"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.hazard <= 1.0
        assert r.n_churned <= r.n_at_risk


def test_string_transform_invariants(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["fn_string_transform"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert "#" not in r.dashed
        assert len(r.reversed) > 0
        assert len(r.doubled_prefix) == 8
        assert r.segment_title[0].isupper()


def test_reorder_point_exceeds_safety_stock(spark):
    """ROP = lead-time demand + safety stock, so ROP > safety stock
    whenever mean demand is positive."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["q_reorder_point"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.reorder_point > r.safety_stock >= 0
        assert r.total_units > 0


def test_mtd_pace_positive_and_day15(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["w_mtd_pace"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.dom == 15
        assert r.pace > 0
        assert r.mtd > 0 and r.prev_mtd > 0


def test_inversion_rate_bounds(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["q_sequence_inversions"](spark, SF_SMALL).collect()[0]
    assert 0.0 <= r.inversion_rate <= 1.0
    assert r.n_inversions <= r.n_adjacent_pairs


def test_qte_deltas_consistent(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = sorted(
        registry.QUERIES["a_qte"](spark, SF_SMALL).collect(),
        key=lambda r: r.quantile,
    )
    assert [r.quantile for r in rows] == [0.1, 0.25, 0.5, 0.75, 0.9]
    for r in rows:
        assert abs(r.qte - (r.q_purchase - r.q_view)) < 1e-4
    # quantiles within each group are nondecreasing
    qp = [r.q_purchase for r in rows]
    assert qp == sorted(qp)


def test_quant_error_bounded_by_half_step(spark):
    """Rounding to the int8 grid bounds per-component error by half a
    quantization step, so RMSE <= amax/127/2 (plus snap slack)."""
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL
    from npc_recommender_netflix_spark.session import load_table

    import pyspark.sql.functions as F

    rows = registry.QUERIES["v_quant_error"](spark, SF_SMALL).collect()
    assert rows
    amax = (
        load_table(spark, SF_SMALL, "embeddings")
        .select(F.explode("embedding").alias("x"))
        .agg(F.max(F.abs(F.col("x").cast("double"))).alias("m"))
        .collect()[0]
        .m
    )
    bound = amax / 127.0 / 2.0 + 1e-6
    for r in rows:
        assert 0.0 <= r.rmse <= bound


def test_inline_stack_three_rows_per_order(spark):
    from collections import Counter

    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["fn_inline_stack"](spark, SF_SMALL).collect()
    assert rows
    per_order = Counter(r.o_orderkey for r in rows)
    assert all(n == 3 for n in per_order.values())
    measures = {r.measure for r in rows}
    assert measures == {"price", "price_with_tax", "price_discounted"}


def test_source_overlap_containment_bounds(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["t_source_overlap"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.containment <= 1.0
        assert r.src_a < r.src_b
        assert r.shared >= 1


def test_revenue_waterfall_reconciles(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["q_revenue_waterfall"](spark, SF_SMALL).collect()[0]
    assert abs(r.billed_total - (r.gross - r.discounts + r.tax_collected)) < 0.05
    assert r.gross > r.net_of_discount > 0
    assert r.discounts > 0 and r.tax_collected > 0


def test_mmr_second_pick_differs_and_two_per_query(spark):
    from collections import defaultdict

    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    rows = registry.QUERIES["v_mmr_rerank"](spark, SF_SMALL).collect()
    by_q = defaultdict(dict)
    for r in rows:
        by_q[r.query_id][r.rank] = r.item_id
    assert len(by_q) == 3
    for picks in by_q.values():
        assert set(picks) == {1, 2}
        assert picks[1] != picks[2]


def test_record_test_consistency(spark):
    """At least 1 record (the first day); expected = H(n) in
    [1, 1+ln(n)]; ratio consistent with the parts."""
    import math

    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["a_record_test"](spark, SF_SMALL).collect()[0]
    assert r.n_records >= 1
    assert 1.0 <= r.expected_records <= 1 + math.log(r.n_days) + 1e-6
    assert abs(r.record_ratio - r.n_records / r.expected_records) < 1e-4


def test_seasonal_strength_in_unit_interval(spark):
    from npc_recommender_netflix_spark import registry
    from tests.conftest import SF_SMALL

    r = registry.QUERIES["a_seasonal_strength"](spark, SF_SMALL).collect()[0]
    assert 0.0 <= r.seasonal_strength <= 1.0
    assert r.var_residual_kusd <= r.var_total_kusd * (1 + 1e-6)
    assert r.n_days > 7


@_prop
@given(n=st.integers(min_value=2, max_value=50_000_000))
def test_adaptive_band_width_agrees_across_engines(spark, n):
    """The round-9 adaptive LSH widths are computed from the corpus count
    INDEPENDENTLY on each engine — Spark's ceil(log2(N) - 1e-9) inside the
    plan, DuckDB's inside the oracle's params CTE, python's in the test
    replica. A one-ulp log2 disagreement crossing an integer boundary
    (exact powers of two are the hazard) would silently desynchronize the
    band layouts, so pin all three sources equal across the whole
    plausible corpus range, including every nearby power of two."""
    import math

    import duckdb

    expected = min(20, max(4, math.ceil(math.log2(n) - 1e-9)))
    duck = duckdb.sql(
        f"SELECT LEAST(20, GREATEST(4, CAST(CEIL(LOG2({n}) - 1e-9) AS INTEGER)))"
    ).fetchone()[0]
    spark_w = spark.range(1).select(
        F.least(
            F.lit(20), F.greatest(F.lit(4), F.ceil(F.log2(F.lit(n)) - 1e-9))
        )
        .cast("int")
        .alias("w")
    ).collect()[0]["w"]
    assert duck == expected, (n, duck, expected)
    assert spark_w == expected, (n, spark_w, expected)


def test_adaptive_band_width_at_powers_of_two(spark):
    """Exhaustive check at the exact-power-of-two boundaries (the only
    inputs where log2 is integer-valued and a one-ulp error flips the
    ceiling): N = 2^k and 2^k +/- 1 for every k in the BIGINT-safe range
    used by the adaptive keys."""
    import math

    import duckdb

    for k in range(2, 26):
        for n in (2**k - 1, 2**k, 2**k + 1):
            expected = min(20, max(4, math.ceil(math.log2(n) - 1e-9)))
            duck = duckdb.sql(
                f"SELECT LEAST(20, GREATEST(4, CAST(CEIL(LOG2({n}) - 1e-9) AS INTEGER)))"
            ).fetchone()[0]
            assert duck == expected, (n, duck, expected)
    ns = [m for k in range(2, 26) for m in (2**k - 1, 2**k, 2**k + 1)]
    rows = (
        spark.createDataFrame([(m,) for m in ns], "n long")
        .select(
            "n",
            F.least(
                F.lit(20),
                F.greatest(F.lit(4), F.ceil(F.log2(F.col("n")) - 1e-9)),
            )
            .cast("int")
            .alias("w"),
        )
        .collect()
    )
    for r in rows:
        expected = min(20, max(4, math.ceil(math.log2(r["n"]) - 1e-9)))
        assert r["w"] == expected, (r["n"], r["w"], expected)


_cdc_texts = st.lists(
    st.text(alphabet="abc ", min_size=1, max_size=40), min_size=1, max_size=8
)


@_prop
@given(texts=_cdc_texts)
def test_cdc_chunks_partition_each_document(spark, texts):
    """The ENGINE chunker (llm.text.cdc_chunks) must PARTITION every
    document for any input: per-doc chunk token counts sum to the doc's
    token count, chunk ids are contiguous from 0, and reassembling the
    chunks in chunk_id order via the digests matches a pure-python
    replay of the same cut rule (full parity on adversarial inputs,
    including multi-space runs and 1-token docs)."""
    import hashlib
    import re

    from npc_recommender_netflix_spark.llm.text import cdc_chunks

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    got = {}
    for r in cdc_chunks(docs).collect():
        got.setdefault(r["doc_id"], {})[r["chunk_id"]] = (
            r["digest"], r["n_tok"], r["n_char"]
        )
    for i, t in enumerate(texts):
        words = re.split(r"\s+", t.lower())
        chunks, cur = [], []
        for p, w in enumerate(words, start=1):
            cur.append(w)
            if p >= 4 and hashlib.md5(
                "|".join(words[p - 4: p]).encode()
            ).hexdigest()[0] == "0":
                chunks.append(cur)
                cur = []
        if cur:
            chunks.append(cur)
        expected = {
            cid: (
                hashlib.md5(" ".join(c).encode()).hexdigest(),
                len(c),
                len(" ".join(c)),
            )
            for cid, c in enumerate(chunks)
        }
        assert got[i] == expected, (i, t)
        # partition property: token counts sum, ids contiguous
        assert sum(n for _d, n, _c in got[i].values()) == len(words)
        assert sorted(got[i]) == list(range(len(got[i])))
