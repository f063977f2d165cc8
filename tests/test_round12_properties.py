"""Property-based checks for round-12 invariants (pure Python, no Spark).

These pin the MATH the round-12 operators rely on, independent of any
corpus: HLL register-merge associativity (a_hll_manual /
a_hll_window_merge), the del2-multiplicity bound behind
t_symspell_join's exact top-K pushdown, and the no-.5-boundary claim
behind the round(1e12/(1+c)) BIGINT snap used by r_swing_capped and
r_covisit_time_decay.
"""

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st


def _sketch(users):
    regs = [0] * 64
    for u in users:
        h = hashlib.md5(str(u).encode()).hexdigest()
        b = int(h[:2], 16) % 64
        w = int(h[2:14], 16)
        rank = 49 if w == 0 else 49 - w.bit_length()
        regs[b] = max(regs[b], rank)
    return regs


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**9), max_size=200),
    st.lists(st.integers(min_value=0, max_value=10**9), max_size=200),
)
def test_hll_register_merge_is_union(xs, ys):
    """sketch(xs ∪ ys) == register-wise max(sketch(xs), sketch(ys)) for
    ARBITRARY splits — the property that makes per-day / per-split HLL
    registers mergeable at query time (a_hll_window_merge's engine)."""
    merged = [max(a, b) for a, b in zip(_sketch(xs), _sketch(ys))]
    assert merged == _sketch(xs + ys)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**9), max_size=300))
def test_hll_sketch_is_insertion_order_and_dup_invariant(xs):
    """Registers are max-folds, so duplicates and order cannot change
    them — the reason the Spark side needs NO distinct before the
    register aggregate."""
    assert _sketch(xs) == _sketch(sorted(xs)) == _sketch(xs + xs)


def _del2(word: str) -> set[str]:
    d1 = {word} | {word[:i] + word[i + 1:] for i in range(len(word))}
    return d1 | {v[:j] + v[j + 1:] for v in d1 for j in range(len(v))}


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="ab01", min_size=4, max_size=12))
def test_del2_neighborhood_bound(w):
    """|del2(w)| <= 1 + L + C(L, 2) — the per-pair multiplicity bound
    that makes t_symspell_join's TakeOrdered(50 * bound) before the
    pair dedup EXACT. Worst-case alphabet (2 symbols) maximizes
    duplicate variants, so the inequality direction is what matters."""
    L = len(w)
    assert len(_del2(w)) <= 1 + L + L * (L - 1) // 2


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet="ab01", min_size=4, max_size=10),
    st.text(alphabet="ab01", min_size=4, max_size=10),
)
def test_del2_shared_variant_count_bounded_and_complete(a, b):
    """Shared del2 variants are bounded by either side's neighborhood
    (the join-multiplicity bound), and — completeness, the symspell
    candidate-generation theorem — every pair within Levenshtein
    distance 2 shares at least one del2 variant."""
    shared = _del2(a) & _del2(b)
    L = max(len(a), len(b))
    assert len(shared) <= 1 + L + L * (L - 1) // 2

    def lev(x, y):
        prev = list(range(len(y) + 1))
        for i, cx in enumerate(x, 1):
            cur = [i]
            for j, cy in enumerate(y, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (cx != cy))
                )
            prev = cur
        return prev[-1]

    if lev(a, b) <= 2:
        assert shared, f"dist<=2 pair {a!r},{b!r} shares no del2 variant"


def test_harmonic_snap_has_no_half_boundary():
    """round(1e12/(1+c)) never lands on an exact .5 for the divisors the
    swing/covisit caps allow (1+c in 1..33 and 1..8): 1e12 = 2^12 * 5^12
    only yields .5 when 2*(1+c) divides 2e12 without (1+c) dividing
    1e12 — enumerate and prove the snap is rounding-mode-independent."""
    for d in range(1, 34):
        rem2 = (2 * 10**12) % d
        exact_half = rem2 == 0 and (10**12 % d) * 2 == d
        assert not exact_half, f"divisor {d} lands on .5"
