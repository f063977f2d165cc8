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


def test_covisit_time_decay_matches_pure_python(spark):
    """Full pure-Python replay of the decayed covisit pipeline over the
    same events: distinct (user, day, item), md5-ranked <=16 cap per
    user-day, temporally-oriented pairs within the 7-day horizon,
    BIGINT-snapped harmonic weights, top-50 with the (weight desc,
    item_a, item_b) tie-break — plus the [n/8, n] weight bounds."""
    rows = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .select(
            "user_id",
            F.to_date(F.date_trunc("day", "ts")).alias("d"),
            F.get_json_object("props", "$.k").cast("long").alias("item"),
        )
        .where(F.col("item").isNotNull())
        .collect()
    )
    ui = {(r["user_id"], r["d"], r["item"]) for r in rows}
    by_ud = {}
    for u, d, i in ui:
        by_ud.setdefault((u, d), []).append(i)
    capped = {}
    for (u, d), items in by_ud.items():
        items.sort(key=lambda i: _md5(f"{u}:{i}"))
        capped[(u, d)] = items[:16]
    by_user = {}
    for (u, d), items in capped.items():
        by_user.setdefault(u, []).append((d, items))
    agg = {}
    for u, dayitems in by_user.items():
        for da, items_a in dayitems:
            for db, items_b in dayitems:
                dd = (db - da).days
                if not 0 <= dd <= 7:
                    continue
                for ia in items_a:
                    for ib in items_b:
                        if ia == ib:
                            continue
                        if da == db and not ia < ib:
                            continue
                        w12, n = agg.get((ia, ib), (0, 0))
                        agg[(ia, ib)] = (w12 + round(1e12 / (1 + dd)), n + 1)
    expected = sorted(
        (
            (ia, ib, round(w12 / 1e12, 6), n)
            for (ia, ib), (w12, n) in agg.items()
        ),
        key=lambda t: (-t[2], t[0], t[1]),
    )[:50]
    got = registry.QUERIES["r_covisit_time_decay"](spark, SF_SMALL).collect()
    assert got, "expected covisit pairs on sf0.001"
    assert [
        (r["item_a"], r["item_b"], r["decayed_weight"], r["n_covisits"])
        for r in got
    ] == expected
    for r in got:
        w12 = round(r["decayed_weight"] * 1e12)
        n = r["n_covisits"]
        # 6dp display snap can shave up to 5e5 of the 1e12-units value
        assert n * round(1e12 / 8) - 10**6 <= w12 <= n * 10**12 + 10**6
