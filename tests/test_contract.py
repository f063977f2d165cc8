"""Contract-shape tests + a representative oracle spot-check at sf0.001.

The full 120-key oracle sweep is tools/check.py (and the driver's t2);
here we keep pytest fast with one key per operator family.
"""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from npc_recommender_netflix_spark import registry
from tests.conftest import SF_SMALL
from tools.check import normalize_rows

REPRESENTATIVE = [
    "s_pushdown_scan",
    "p_cast",
    "j_asof",
    "j_multiway",
    "a_groupby",
    "a_grouping_sets",
    "w_topk_group",
    "set_except_all",
    "fn_date_parts",
    "fn_array_lambda",
    "r_cosine_sim",
    "r_topn_recs",
    "t_tfidf",
    "t_simhash",
    "v_cosine_topk",
    "m_image_pipeline",
    "u_apply_in_pandas",
]


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_contract_shape():
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    assert len(qs) >= 110
    assert set(osql) <= set(qs)
    # declared rows-only set stays tight and intentional
    rows_only = set(qs) - set(osql)
    assert rows_only == {
        "a_approx_distinct",
        "a_approx_quantile",
        "a_kll_quantiles",
        "a_sketch_merge",
        "r_als",
        "r_als_cv",
        "r_mllib_logreg",
        "r_als_foldin",
        "r_ease",
        "r_als_recs",
        "r_kmeans",
        "r_pca",
        "t_minhash_dedup",
        "st_watermark",
        "st_stateful",
        "st_funnel_stateful",
        "st_page_hinkley",
        "v_ann_ivf_kmeans",
        "v_lsh_neardup",
        "st_hll_distinct",
        "st_reservoir_sample",
    }


def _check_one(spark, duck, key):
    sdf = registry.QUERIES[key](spark, SF_SMALL)
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(registry.ORACLE[key])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(sdf.columns) == sorted(ocols), key
    assert len(srows) == len(orows), key
    assert normalize_rows(sdf.columns, srows) == normalize_rows(ocols, orows), key


def test_representative_oracle_match(spark, duck):
    for key in REPRESENTATIVE:
        _check_one(spark, duck, key)


def test_oracle_output_dtypes_driver_hashable(duck):
    """Registry-wide tripwire for the round-7 driver-red class: a bare
    sum(BIGINT) in an oracle types as HUGEINT (int128) in DuckDB, which the
    driver's pandas hasher canonicalizes differently than Spark's BIGINT —
    hash_match fails with identical values. Planning a relation is cheap
    (no execution), so audit every oracle's output schema."""
    from tools.check import oracle_dtype_problems

    offenders = {}
    for key, sql in sorted(registry.ORACLE.items()):
        bad = oracle_dtype_problems(duck.sql(sql))
        if bad:
            offenders[key] = bad
    assert not offenders, offenders


def test_never_banked_first_refronts_failed_keys(tmp_path):
    """The driver-sample ordering must treat a key whose LATEST record is
    a FAIL as unbanked (front of queue), count rows-only records
    (err='no_oracle' with a spark row count) as passes, prefer the most
    recent round's verdict, and front the LARGEST unbanked family
    (dynamic since round 12 — the per-round hand-picked prefix policy
    made self-executing; ties break alphabetically) — the re-banking
    mechanism (__spark_entry__._never_banked_first)."""
    import json

    import __spark_entry__ as mod

    rec_pass = {"rows_match": True, "schema_match": True, "hash_match": True,
                "spark_rows": 1, "oracle_rows": 1, "err": None}
    rec_fail = {"rows_match": True, "schema_match": True, "hash_match": False,
                "spark_rows": 1, "oracle_rows": 1, "err": None}
    rec_rows_only = {"rows_match": None, "schema_match": None,
                     "hash_match": None, "spark_rows": 5, "oracle_rows": None,
                     "err": "no_oracle"}
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"a_pass": rec_pass, "b_flipper": rec_pass})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"c_fail": rec_fail, "d_rows_only": rec_rows_only,
                    "b_flipper": rec_fail})
    )
    keys = ["a_pass", "b_flipper", "c_fail", "d_rows_only",
            "v_never_one", "v_never_two", "z_never"]
    got = mod._never_banked_first(keys, artifacts_dir=str(tmp_path))
    # unbanked: b_flipper (latest record r02 = FAIL overrides r01 pass),
    # c_fail, v_never_one, v_never_two, z_never -> largest unbanked
    # family is v_ (2 keys), so it fronts; the rest alphabetical;
    # banked last: a_pass (hash pass), d_rows_only (rows-only pass)
    assert got == ["v_never_one", "v_never_two", "b_flipper", "c_fail",
                   "z_never", "a_pass", "d_rows_only"]

    # singleton-family tie breaks alphabetically (b_ fronts)
    got2 = mod._never_banked_first(
        ["a_pass", "c_fail", "b_flipper"], artifacts_dir=str(tmp_path)
    )
    assert got2 == ["b_flipper", "c_fail", "a_pass"]
