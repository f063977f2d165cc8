"""§2.11 UDF / UDAF / UDTF surface.

The escalation ladder, in preference order at 100 TB:
1. built-in functions (everything else in this repo) — JVM codegen;
2. pandas UDF / grouped-agg pandas UDF / applyInPandas — Arrow-batched,
   ~10-100x faster than row-at-a-time Python (SNIPPETS.md patterns);
3. row-at-a-time Python UDF (u_py_udf) — kept as the explicit anti-pattern
   demonstration: one Py4J/pickle round-trip per row.
Each key's oracle proves the Python path agrees with the pure-SQL result.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf

from ..registry import register
from ..session import f6, load_table


@register(
    "u_py_udf",
    "SELECT p_partkey, lower(trim(p_type)) AS norm_type FROM part",
)
def u_py_udf(spark, sf_dir):
    """Row-at-a-time Python UDF (the slow path, on purpose)."""
    part = load_table(spark, sf_dir, "part")
    norm = udf(lambda s: s.strip().lower(), "string")
    return part.select("p_partkey", norm("p_type").alias("norm_type"))


@register(
    "u_pandas_udf",
    """
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 6) AS discounted
    FROM lineitem
    """,
)
def u_pandas_udf(spark, sf_dir):
    """Vectorized Series->Series pandas UDF over Arrow batches."""
    li = load_table(spark, sf_dir, "lineitem")

    @pandas_udf("double")
    def discounted(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1.0 - disc)

    return li.select(
        "l_orderkey",
        "l_linenumber",
        f6(discounted("l_extendedprice", "l_discount")).alias("discounted"),
    )


@register(
    "u_grouped_agg",
    """
    SELECT o_orderstatus, round(exp(avg(ln(o_totalprice))), 4) AS geo_mean
    FROM orders GROUP BY o_orderstatus
    """,
)
def u_grouped_agg(spark, sf_dir):
    """Grouped-agg pandas UDF (UDAF): geometric mean of order value."""
    orders = load_table(spark, sf_dir, "orders")

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        import numpy as np

        return float(math.exp(np.log(v.to_numpy()).mean()))

    # 4dp, not 6: exp() amplifies the pandas-vs-SQL summation-order noise in
    # avg(ln(x)) to ~1e-7 absolute on a ~1e5 value — too close to a 6dp tie.
    return orders.groupBy("o_orderstatus").agg(
        (F.round(geo_mean("o_totalprice"), 4) + 0.0).alias("geo_mean")
    )


@register(
    "u_apply_in_pandas",
    """
    SELECT event_id,
           round((value - avg(value) OVER (PARTITION BY user_id))
                 / stddev_samp(value) OVER (PARTITION BY user_id), 6) + 0 AS zscore
    FROM events
    """,
)
def u_apply_in_pandas(spark, sf_dir):
    """Per-group transform via applyInPandas: z-score of value per user.

    Only (user_id, event_id, value) cross the JVM->Python boundary:
    applyInPandas ships every column of its input to the workers (Spark
    cannot see which ones the function touches), so the explicit select
    keeps the wide props/ts columns out of the groupBy exchange AND the
    Arrow transfer, and lets column pruning reach the parquet scan.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value"
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "z": (v - v.mean()) / v.std(ddof=1)}
        )

    out = ev.groupBy("user_id").applyInPandas(zscore, schema="event_id long, z double")
    return out.select("event_id", f6(F.col("z")).alias("zscore"))


@register(
    "u_udtf",
    r"""
    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS token
    FROM documents WHERE doc_id < 20
    """,
)
def u_udtf(spark, sf_dir):
    # Class defined inside the fn: pickled by value for executor workers.
    @udtf(returnType="doc_id: bigint, token: string")
    class SplitTokens:
        """Python UDTF (Spark 4): one input row -> N token rows."""

        def eval(self, doc_id: int, text: str):
            for tok in text.lower().split():
                yield doc_id, tok

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    docs.createOrReplaceTempView("v_docs_udtf")
    spark.udtf.register("split_tokens", SplitTokens)
    return spark.sql(
        "SELECT t.doc_id, t.token FROM v_docs_udtf, "
        "LATERAL split_tokens(doc_id, text) t"
    )


@register(
    "u_cogroup_pandas",
    """
    SELECT c.c_custkey AS custkey,
           CAST(c.c_nationkey AS BIGINT) AS nationkey,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           round(coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0)
                 / 100.0, 2) AS total_spend
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey < 500
    GROUP BY c.c_custkey, c.c_nationkey
    """,
)
def u_cogroup_pandas(spark, sf_dir):
    """Cogrouped-map surface (Spark 3.0+): `groupBy(...).cogroup(...)
    .applyInPandas` merges the per-key slices of TWO DataFrames in one
    Arrow-batched Python function — the API for custom two-sided
    per-entity logic (as-of merges, per-key reconciliation) that a plain
    join can't express. Here it reconciles each customer with their
    orders; the oracle is the equivalent LEFT JOIN rollup.

    Both sides shuffle once on the cogroup key; per-key state is one
    customer's slice (bounded). Money folds as exact integer cents inside
    pandas so the Python path is reduction-order-safe like the JVM one.
    """
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < 500)
        .select("c_custkey", "c_nationkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_custkey") < 500)
        .select("o_custkey", "o_totalprice")
    )

    def reconcile(key, cpdf: pd.DataFrame, opdf: pd.DataFrame) -> pd.DataFrame:
        if cpdf.empty:  # order rows whose customer slice is absent: skip
            return pd.DataFrame(
                columns=["custkey", "nationkey", "n_orders", "total_spend"]
            )
        cents = (opdf["o_totalprice"] * 100).round().astype("int64").sum()
        return pd.DataFrame(
            {
                "custkey": [int(key[0])],
                "nationkey": [int(cpdf["c_nationkey"].iloc[0])],
                "n_orders": [len(opdf)],
                "total_spend": [round(int(cents) / 100.0, 2)],
            }
        )

    out = (
        cust.groupBy("c_custkey")
        .cogroup(orders.groupBy("o_custkey"))
        .applyInPandas(
            reconcile,
            schema="custkey long, nationkey long, n_orders long, total_spend double",
        )
    )
    return out


@register(
    "u_arrow_udf",
    """
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) * 2 AS doubled_cents,
           upper(o_orderpriority) AS pri_upper
    FROM orders WHERE o_orderkey <= 400
    ORDER BY o_orderkey
    """,
)
def u_arrow_udf(spark, sf_dir):
    """Arrow-optimized Python UDF (`@udf(useArrow=True)`, SPARK-40307):
    same scalar-function authoring model as the legacy pickled UDF
    (u_py_udf — kept as the labeled anti-pattern) but the data crosses
    in Arrow record batches instead of per-row pickles — typically
    ~2-10× on scalar work, without rewriting to the pandas_udf
    Series API. The middle rung of the Python ladder: row-pickle UDF →
    Arrow UDF → pandas UDF → built-in.

    Still Python-per-VALUE semantics (the lambda sees scalars), so the
    built-in column expressions stay the real answer in hot paths —
    the oracle mirrors with pure SQL precisely to show these are
    expressible without Python at all.
    """
    from pyspark.sql.functions import udf as _udf

    # Defined inside the query fn: cloudpickle ships them by value.
    @_udf("long", useArrow=True)
    def double_cents(p: float) -> int:
        return int(round(p * 100)) * 2

    @_udf("string", useArrow=True)
    def shout(s: str) -> str:
        return s.upper()

    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.where(F.col("o_orderkey") <= 400)
        .select(
            "o_orderkey",
            double_cents("o_totalprice").alias("doubled_cents"),
            shout("o_orderpriority").alias("pri_upper"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "u_udtf_analyze",
    """
    WITH src AS (SELECT doc_id, lang, n_chars FROM documents
                 WHERE doc_id < 40)
    SELECT doc_id,
           CAST(n_chars AS BIGINT) AS n_chars,
           upper(lang) AS lang_upper,
           CAST(n_chars % 10 AS BIGINT) AS bucket
    FROM src ORDER BY doc_id
    """,
)
def u_udtf_analyze(spark, sf_dir):
    """POLYMORPHIC Python UDTF (Spark 4): the output schema is decided at
    PLAN time by a static `analyze(...)` method inspecting the call's
    argument types — the table-function twin of DataFrame.transform
    generics, and the API surface that lets one UDTF serve any input
    table (u_udtf's schema is frozen in the decorator; this one derives
    per-call columns — here it emits one projected column per inbound
    argument plus a computed bucket). Catalyst sees the resolved schema
    before execution, so downstream pruning/pushdown work exactly as
    for a built-in table function.

    The eval body is a pure per-row generator (no state), executed
    Arrow-batched on executors; the oracle reproduces the same
    projection relationally. The analyze/eval split is the entire
    point: schema logic runs ONCE on the driver, row logic scales out.
    """
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import LongType, StringType, StructType
    from pyspark.sql.udtf import AnalyzeResult

    @udtf
    class ProjectWithBucket:
        @staticmethod
        def analyze(doc_id, n_chars, lang):
            schema = StructType()
            schema = schema.add("doc_id", LongType())
            schema = schema.add("n_chars", LongType())
            schema = schema.add("lang_upper", StringType())
            schema = schema.add("bucket", LongType())
            return AnalyzeResult(schema=schema)

        def eval(self, doc_id: int, n_chars: int, lang: str):
            yield doc_id, n_chars, lang.upper(), n_chars % 10

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    docs.createOrReplaceTempView("v_docs_udtf_poly")
    spark.udtf.register("project_bucket", ProjectWithBucket)
    return spark.sql(
        "SELECT t.* FROM v_docs_udtf_poly, "
        "LATERAL project_bucket(doc_id, n_chars, lang) t ORDER BY doc_id"
    )


@register(
    "u_rolling_median",
    """
    WITH x AS (
        SELECT user_id, ts, event_id,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE user_id < 40
    )
    SELECT event_id,
           median(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               + 0.0 AS med_cents
    FROM x
    """,
)
def u_rolling_median(spark, sf_dir):
    """Exact 7-row rolling median per user — the operator that
    JUSTIFIES a grouped pandas UDF: Spark has NO exact median window
    function (percentile over a moving frame re-sorts the frame per
    row in WindowExec; approx_percentile trades exactness), while
    pandas' rolling(7).median() maintains a sliding multiset in C.
    One applyInPandas group per user runs the whole series in a
    single Arrow batch — the repo's documented escalation path:
    built-ins first, Arrow-batched Python only where the JVM has no
    operator for the semantics.

    Exactness: medians run over integral cents, so every result is
    an integer or an exact .5 — no interpolation ambiguity between
    pandas and DuckDB's windowed median. Partial frames (first 6
    rows per user) use min_periods=1, matching the SQL frame
    semantics. Scale: ONE user_id exchange (the same shuffle every
    per-user window op pays), series length bounded per user; the
    user_id<40 slice keeps the driver-compare small — the plan is
    population-independent.
    """
    ev = load_table(spark, sf_dir, "events")
    x = ev.where(F.col("user_id") < 40).select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )

    def roll(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        med = pdf["cents"].rolling(7, min_periods=1).median()
        return pd.DataFrame({"event_id": pdf["event_id"], "med_cents": med})

    return x.groupBy("user_id").applyInPandas(
        roll, schema="event_id long, med_cents double"
    )


@register(
    "u_observe_metrics",
    """
    WITH m AS (
        SELECT CAST(count(*) AS BIGINT) AS rows_scanned,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS cents_scanned,
               CAST(max(l_orderkey) AS BIGINT) AS max_key
        FROM lineitem
    ),
    kept AS (
        SELECT CAST(count(*) AS BIGINT) AS rows_kept
        FROM lineitem WHERE l_quantity >= 25
    )
    SELECT m.rows_scanned, m.cents_scanned, m.max_key, kept.rows_kept,
           round(kept.rows_kept * 1.0 / m.rows_scanned, 6) + 0
               AS keep_rate
    FROM m CROSS JOIN kept
    """,
)
def u_observe_metrics(spark, sf_dir):
    """Pipeline telemetry via the Observation API (SPARK-34806):
    df.observe() attaches named aggregate metrics to a point IN the
    plan, collected as a side effect of the job that runs anyway — the
    production answer to 'how many rows passed this filter' that does
    NOT cost a second scan (the naive count() + write pattern reads
    the source twice; an observed metric rides the same pass, exactly
    like Delta/DLT expectations report row counts).

    Here one job materializes the filtered count while observations on
    the PRE-filter node capture rows/cents/max-key scanned; the
    operator then returns the metrics row itself (the driver holds
    observation results after the action — this is the one API whose
    OUTPUT is driver-side by design, like a streaming query's
    progress). The oracle recomputes the same aggregates relationally,
    so the hash verifies observe() reports exactly what a second scan
    would have found. At 100 TB the saved scan is the whole point.
    """
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("scan_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows_scanned"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("cents_scanned"),
        F.max("l_orderkey").cast("long").alias("max_key"),
    )
    rows_kept = observed.where(F.col("l_quantity") >= 25).count()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                int(m["rows_scanned"]),
                int(m["cents_scanned"]),
                int(m["max_key"]),
                int(rows_kept),
            )
        ],
        "rows_scanned long, cents_scanned long, max_key long, rows_kept long",
    ).select(
        "rows_scanned",
        "cents_scanned",
        "max_key",
        "rows_kept",
        f6(F.col("rows_kept") * 1.0 / F.col("rows_scanned")).alias("keep_rate"),
    )


@register(
    "u_model_scoring",
    """
    WITH scored AS (
        SELECT l_orderkey,
               round(0.31 * l_quantity + 0.047 * (l_extendedprice / 100.0)
                     - 2.2 * l_discount + 0.5, 6) AS score
        FROM lineitem WHERE l_linenumber = 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_scored,
           round(avg(score), 6) + 0 AS mean_score,
           CAST(sum(CASE WHEN score > 10.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_above_threshold
    FROM scored
    """,
)
def u_model_scoring(spark, sf_dir):
    """Batch model inference via a vectorized pandas UDF — THE serving
    pattern for scoring a table with a trained model: weights ship to
    executors once (broadcast, here a deterministic 3-feature linear
    model standing in for any pickled sklearn/xgboost artifact), each
    Arrow batch scores as ONE numpy matrix-vector product, and no row
    ever crosses to Python individually. This is the shape every
    'score 100 TB with the fraud model' job takes: the model is
    closure state, the data never leaves the scan task, and
    throughput is BLAS-bound, not interpreter-bound (the 10-100x gap
    over row-Python that u_py_udf exists to demonstrate).

    The stand-in model is linear so the DuckDB oracle can mirror the
    arithmetic exactly (6dp snap per score before the census) — with
    a real artifact the oracle disappears but the plumbing is
    unchanged. Output: scored-row census + mean + threshold count.
    """
    import numpy as np

    w = spark.sparkContext.broadcast(np.array([0.31, 0.047, -2.2, 0.5]))

    @pandas_udf("double")
    def score(qty: pd.Series, price: pd.Series, disc: pd.Series) -> pd.Series:
        X = np.column_stack(
            [qty.to_numpy(), price.to_numpy() / 100.0, disc.to_numpy()]
        )
        coefs = w.value
        v = X @ coefs[:3] + coefs[3]
        # half-AWAY rounding to match SQL round() — np.round is banker's
        # (half-to-even), the cross-engine trap _rhu documents; scores
        # here are positive, so floor(v*1e6 + 0.5) is exact half-away
        return pd.Series(np.floor(v * 1e6 + 0.5) / 1e6)

    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_linenumber") == 1)
    scored = li.select(
        score(
            F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")
        ).alias("score")
    )
    return scored.agg(
        F.count("*").cast("long").alias("n_scored"),
        f6(F.avg("score")).alias("mean_score"),
        F.sum(F.when(F.col("score") > 10.0, 1).otherwise(0))
        .cast("long")
        .alias("n_above_threshold"),
    )


@register(
    "u_iter_pandas_udf",
    """
    SELECT o_orderkey,
           CAST((CAST(round(o_totalprice * 100) AS BIGINT) % 1000)
                * (CAST(round(o_totalprice * 100) AS BIGINT) % 1000)
                % 997 AS BIGINT) AS risk_bucket
    FROM orders ORDER BY o_orderkey
    """,
)
def u_iter_pandas_udf(spark, sf_dir):
    """Iterator-form pandas UDF (Iterator[pd.Series] -> Iterator[pd.
    Series], SPARK-26412) — the §2.11 rung between u_pandas_udf (one
    Series per call) and u_apply_in_pandas (grouped): the function is
    entered ONCE PER TASK and loops over that task's Arrow batches, so
    expensive one-time setup (model weights, a lookup table, a
    tokenizer) amortizes across every batch the task processes instead
    of re-running per batch — THE production pattern for batch
    inference.  Here the 'model' is a 1000-entry precomputed table
    built before the batch loop; the oracle recomputes the same
    arithmetic relationally, proving the init-once path changes
    nothing semantically.

    Scale: same Arrow transfer as any pandas UDF; the win is driver/
    executor-side constant-factor (init per task, not per batch), and
    memory stays bounded because batches stream through the iterator
    — the function never sees the whole partition at once.
    """
    orders = load_table(spark, sf_dir, "orders")

    @pandas_udf("long")
    def risk_bucket(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as np

        # expensive init, ONCE per task: a precomputed score table
        table = np.array([(v * v) % 997 for v in range(1000)], dtype="int64")
        for cents in batches:
            idx = (cents % 1000).astype("int64")
            yield pd.Series(table[idx.to_numpy()])

    return (
        orders.select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100)
            .cast("long")
            .alias("cents"),
        )
        .select(
            "o_orderkey",
            risk_bucket("cents").alias("risk_bucket"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "u_grouped_model_fit",
    """
    WITH monthly AS (
        SELECT n.n_name AS nation,
               year(o.o_orderdate) * 12 + month(o.o_orderdate)
                   - (SELECT min(year(o_orderdate) * 12
                                 + month(o_orderdate)) FROM orders) AS t,
               sum(o.o_totalprice) AS rev
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2
    )
    SELECT nation,
           CAST(count(*) AS BIGINT) AS n_months,
           round(regr_slope(rev, t), 4) + 0 AS slope,
           round(regr_intercept(rev, t), 4) + 0 AS intercept,
           round(regr_r2(rev, t), 6) + 0 AS r2
    FROM monthly
    GROUP BY nation
    ORDER BY nation
    """,
)
def u_grouped_model_fit(spark, sf_dir):
    """Model-per-group training — the scikit-per-key idiom every
    feature-engineering pipeline eventually needs, done the Spark way:
    groupBy(nation).applyInPandas ships each nation's monthly-revenue
    series to ONE Arrow batch where a closed-form OLS (slope,
    intercept, R^2) is fitted in numpy.  The oracle is the SQL
    regression aggregate family (regr_slope/intercept/r2), which pins
    the UDF's math exactly — the point of the key: per-group Python
    training composes with Spark's shuffle like any aggregation, and
    when the per-group model IS closed-form you can (and should) audit
    it against the relational equivalent.

    Scale: the data-sized work is the monthly rollup (one shuffle,
    map-side combinable); the applyInPandas stage then sees one
    Arrow batch per nation of ~tens of rows.  Real per-group fits
    (gradient-boosted, sklearn) follow this exact shape — group sizes
    bounded by construction (months x nation), model state never on
    the driver.  Python floats == SQL doubles: both sides do the same
    two-pass mean-centered sums, and the 4dp/6dp snaps absorb the
    association noise.
    """
    import numpy as np

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    t0 = orders.agg(
        F.min(F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("t0")
    )
    monthly = (
        orders.join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(nat, F.col("n_nationkey") == F.col("c_nationkey"))
        .crossJoin(F.broadcast(t0))
        .groupBy(
            F.col("n_name").alias("nation"),
            (
                F.year("o_orderdate") * 12 + F.month("o_orderdate")
                - F.col("t0")
            ).alias("t"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        t = pdf["t"].to_numpy(dtype="float64")
        y = pdf["rev"].to_numpy(dtype="float64")
        tm, ym = t.mean(), y.mean()
        sxx = ((t - tm) ** 2).sum()
        sxy = ((t - tm) * (y - ym)).sum()
        syy = ((y - ym) ** 2).sum()
        # degenerate groups follow SQL regression-aggregate NULL
        # semantics (regr_slope/regr_r2): a single-month nation
        # (sxx == 0) has no slope; constant revenue (syy == 0) has no
        # r2 — None here, never inf/nan, matching the DuckDB oracle
        slope = sxy / sxx if sxx > 0.0 else None
        intercept = ym - slope * tm if slope is not None else None
        r2 = (
            (sxy * sxy) / (sxx * syy)
            if sxx > 0.0 and syy > 0.0
            else None
        )
        return pd.DataFrame(
            {
                "nation": [pdf["nation"].iloc[0]],
                "n_months": [len(pdf)],
                "slope": [slope],
                "intercept": [intercept],
                "r2": [r2],
            }
        )

    out = monthly.groupBy("nation").applyInPandas(
        fit,
        schema="nation string, n_months long, slope double, "
        "intercept double, r2 double",
    )
    return out.select(
        "nation",
        "n_months",
        (F.round("slope", 4) + 0).alias("slope"),
        (F.round("intercept", 4) + 0).alias("intercept"),
        f6(F.col("r2")).alias("r2"),
    ).orderBy("nation")
