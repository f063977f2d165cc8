"""Round-13 fixes: semantic pins beyond the DuckDB oracle hash."""

import duckdb
import pytest

from npc_recommender_netflix_spark import registry


def _write_tiny_embeddings(spark, tmpdir: str, n_vectors: int) -> str:
    """A tiny sf dir with only embeddings.parquet: vec_ids 0..n-1, 4-dim
    deterministic non-degenerate vectors (distinct pairwise cosines)."""
    rows = [
        (i, [float(1 + ((i + 1) * (d + 1)) % 7), float((i * d) % 5), 1.0, float(d)], i % 3)
        for i in range(n_vectors)
        for d in [0]
    ]
    # expand to 4 dims explicitly (the list above is already 4 floats)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/embeddings.parquet")
    return tmpdir


def _oracle_rows(sql: str, sf_dir: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet/*.parquet')"
    )
    rel = con.sql(sql)
    return rel.columns, rel.fetchall()


@pytest.mark.parametrize("n_vectors", [2, 3, 4])
def test_rerank_mmr_degrades_with_oracle_on_small_candidate_sets(
    spark, tmp_path, n_vectors
):
    """v_rerank_mmr with < 5 total vectors: each query has 1-3 candidates,
    so the greedy loop must emit FEWER than 4 positions per query —
    matching the oracle's pk CTEs going empty — instead of raising on an
    exhausted candidate pool or silently dropping 1-candidate queries
    (round-12 advice item 1: best=None TypeError / missing pos-1 row)."""
    sf_dir = _write_tiny_embeddings(spark, str(tmp_path), n_vectors)
    got = registry.QUERIES["v_rerank_mmr"](spark, sf_dir).collect()
    cols, want = _oracle_rows(registry.ORACLE["v_rerank_mmr"], sf_dir)
    got_t = sorted((r["query_id"], r["pos"], r["cand_id"], r["rel6"], r["score7"]) for r in got)
    idx = {c: i for i, c in enumerate(cols)}
    want_t = sorted(
        (r[idx["query_id"]], r[idx["pos"]], r[idx["cand_id"]], r[idx["rel6"]], r[idx["score7"]])
        for r in want
    )
    assert got_t == want_t
    # structure: queries present are min(n_vectors, 3) of {0,1,2}; each
    # emits exactly min(n_candidates, 4) = min(n_vectors - 1, 4) positions
    n_queries = min(n_vectors, 3)
    per_q = min(n_vectors - 1, 4)
    assert len(got_t) == n_queries * per_q
    for q in range(n_queries):
        poss = [t[1] for t in got_t if t[0] == q]
        assert poss == list(range(1, per_q + 1))


def test_covisit_time_decay_null_item_does_not_consume_cap_slot(spark):
    """A NULL $.k event row must be filtered BEFORE the 16-per-user-day
    md5 cap (round-12 advice item 2): NULL md5 sorts NULLS FIRST in Spark
    but NULLS LAST in DuckDB, so a NULL surviving into the cap would crowd
    out a different real item in each engine. Pin: the registered Spark
    frame over a corpus WITH an injected NULL-item user-day equals the
    same frame over the corpus with the NULL rows dropped."""
    import pyspark.sql.functions as F

    from tests.conftest import SF_SMALL

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    # Inject: duplicate one user's busiest day rows with props lacking $.k
    some = ev.limit(20).withColumn("props", F.lit('{"other": 1}'))
    with_null = ev.unionByName(some)

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        with_null.write.mode("overwrite").parquet(f"{td}/events.parquet")
        got = registry.QUERIES["r_covisit_time_decay"](spark, td).collect()
    base = registry.QUERIES["r_covisit_time_decay"](spark, SF_SMALL).collect()
    key = lambda r: (r["item_a"], r["item_b"], r["decayed_weight"], r["n_covisits"])  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, base))
