"""Schema-drift tripwire (VERDICT r4 item 6): the events.ts dtype drift
silently broke 30 keys and two consecutive benches before anything loud
failed. This file makes fixture-schema drift impossible to miss in the
first minute of a round: pure analysis (no Spark jobs), <30 s, every
table x every sf dir.

If a test here fails, fix `session.load_table`'s adaptation logic FIRST —
everything else downstream (oracle failures, bench rc=1) is a symptom.
"""

import glob

import pytest

from npc_recommender_netflix_spark.session import TABLES, load_table

SF_DIRS = sorted(glob.glob("/root/testdata/sf*"))

# Column -> required Spark dtype(s) after load_table's adaptation. Only
# the columns operators actually depend on are pinned; extra columns are
# fine. Integer keys accept any width (the fixtures store int32 or int64
# per dir/generator version; every operator CASTs computed integer
# outputs to BIGINT itself, so width drift is harmless — TYPE-CLASS
# drift like the events.ts long->timestamp flip is what must trip).
EXPECTED = {
    "region": {"r_regionkey": ("int", "bigint"), "r_name": "string"},
    "nation": {"n_nationkey": ("int", "bigint"), "n_name": "string", "n_regionkey": ("int", "bigint")},
    "customer": {
        "c_custkey": ("int", "bigint"),
        "c_name": "string",
        "c_nationkey": ("int", "bigint"),
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": ("int", "bigint"),
        "s_name": "string",
        "s_nationkey": ("int", "bigint"),
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": ("int", "bigint"),
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": ("int", "bigint"),
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": ("int", "bigint"),
        "o_custkey": ("int", "bigint"),
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": ("int", "bigint"),
        "l_partkey": ("int", "bigint"),
        "l_suppkey": ("int", "bigint"),
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_returnflag": "string",
        "l_shipdate": "timestamp_ntz",
    },
    # events.ts is THE historically drifting column: load_table must
    # surface a session-TZ TIMESTAMP regardless of the parquet physical
    # type (nanos-as-long or timestamp[us]/[ns]).
    "events": {
        "event_id": ("int", "bigint"),
        "ts": "timestamp",
        "user_id": ("int", "bigint"),
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": ("int", "bigint"),
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": ("int", "bigint"),
    },
    "embeddings": {
        "vec_id": ("int", "bigint"),
        "embedding": "array<float>",
        "label": ("int", "bigint"),
    },
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table", TABLES)
def test_load_table_schema(spark, sf_dir, table):
    df = load_table(spark, sf_dir, table)  # analysis only, no job
    dtypes = dict(df.dtypes)
    for col, want in EXPECTED[table].items():
        allowed = want if isinstance(want, tuple) else (want,)
        assert col in dtypes, f"{sf_dir}/{table}: missing column {col}"
        assert dtypes[col] in allowed, (
            f"{sf_dir}/{table}.{col}: dtype {dtypes[col]!r} != expected {allowed!r}"
            " — fixture schema drifted; adapt session.load_table first"
        )


def test_orderdate_and_ts_are_queryable(spark):
    """The two timestamp recipes must survive an actual expression build
    (the r3/r4 failure was an AnalysisException at expression time)."""
    from pyspark.sql import functions as F

    for sf_dir in SF_DIRS:
        ev = load_table(spark, sf_dir, "events")
        ev.select(F.unix_micros("ts"), F.window("ts", "1 hour")).schema
        orders = load_table(spark, sf_dir, "orders")
        orders.select(F.year("o_orderdate"), F.date_trunc("month", "o_orderdate")).schema
