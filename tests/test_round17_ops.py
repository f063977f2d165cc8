"""Round-17 optimization-round focused tests.

Each test pins an operator whose INTERNALS changed during the optimization
round against a pure-Python replay of its defining computation, so the
restructured plan cannot silently drift from the declared semantics.
"""

import hashlib
from collections import defaultdict

from npc_recommender_netflix_spark import registry
from tests.conftest import SF_SMALL


def test_node_features_triangles_match_bruteforce(spark):
    """r_node_features switched from the symmetric 3-way triangle join to
    the oriented x<y<z enumeration (credit 2 per corner). Replay the
    per-node triangle counts and clustering coefficient from the raw
    edge list in pure Python — adjacency-set intersection, no joins."""
    from npc_recommender_netflix_spark.recommender.graph import (
        _copurchase_edges,
    )

    edges = [
        (r.src, r.dst)
        for r in _copurchase_edges(spark, SF_SMALL).collect()
    ]
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    # symmetry invariant the oriented rewrite depends on
    for s, ds in adj.items():
        for d in ds:
            assert s in adj[d], "edge list must be symmetric"

    rows = registry.QUERIES["r_node_features"](spark, SF_SMALL).collect()
    assert rows, "feature table must be non-empty"
    got = {r.node: r for r in rows}
    assert set(got) == set(adj), "one feature row per graph node"

    for node, nbrs in adj.items():
        d = len(nbrs)
        tri = sum(
            1
            for a in nbrs
            for b in nbrs
            if a < b and b in adj[a]
        )
        r = got[node]
        assert r.degree == d
        assert r.n_triangles == tri, f"node {node}: {r.n_triangles} != {tri}"
        denom = max(d * (d - 1), 1)
        expect_cc = round(2 * tri / denom, 6) + 0.0
        assert abs(r.clustering_coef - expect_cc) < 1e-9
        expect_and = round(sum(len(adj[n]) for n in nbrs) / d, 6) + 0.0
        assert abs(r.avg_nbr_degree - expect_and) < 1e-9


def test_ab_srm_arm_counts_match_md5_replay(spark):
    """a_ab_srm_check now dedups user_id BEFORE deriving the md5 arm
    (arm is a pure function of user_id). Replay the arm census in pure
    Python md5 over the distinct user set."""
    from npc_recommender_netflix_spark.session import load_table

    users = {
        r.user_id
        for r in load_table(spark, SF_SMALL, "events")
        .select("user_id")
        .distinct()
        .collect()
    }
    na = nb = 0
    for u in users:
        h = int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16)
        if h % 2 == 0:
            na += 1
        else:
            nb += 1

    r = registry.QUERIES["a_ab_srm_check"](spark, SF_SMALL).collect()[0]
    assert (r.na, r.nb) == (na, nb)
    exp = (na + nb) / 2.0
    chi2 = (na - exp) ** 2 / exp + (nb - exp) ** 2 / exp
    assert abs(r.chi2 - (round(chi2, 6) + 0.0)) < 1e-9
    assert r.srm_flag == (1 if chi2 > 3.841459 else 0)
