"""Training-set decontamination (SURVEY.md §2.12 extension).

Standard LLM-pipeline hygiene: before training, drop (or flag) training
documents that share long word n-grams with any evaluation/benchmark
document, so benchmark answers do not leak into the training corpus
(the n-gram-overlap decontamination procedure described in the GPT-3 and
PaLM papers, re-expressed as a Spark plan).

Here the "benchmark" split is deterministic — doc_id % 7 == 0 — and the
overlap unit is the word 8-gram, carried as an md5 digest end-to-end:

- 8-gram construction is a map-side array transform + explode (no shuffle);
- digests (32 chars) are what gets shuffled/joined, never the gram text —
  the same shuffle-shape argument as t_exact_dedup_digest;
- the benchmark gram set is bounded by the benchmark size (fixed, small at
  any corpus scale), so it is broadcast: the contamination check costs one
  map-side hash-join over the training grams plus one aggregation.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import register
from ..session import f6, load_table

# word 8-grams per doc as md5 digests, distinct per doc
_GRAMS_SQL = r"""
    SELECT DISTINCT doc_id, lang,
           md5(array_to_string(w[i:i + 7], ' ')) AS g
    FROM (SELECT doc_id, lang, w, unnest(range(1, len(w) - 6)) AS i
          FROM (SELECT doc_id, lang, string_split_regex(lower(text), '\s+') AS w
                FROM documents))
"""


def _grams(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", "lang", F.split(F.lower("text"), r"\s+").alias("w")
        )
        .select(
            "doc_id",
            "lang",
            F.explode(
                # sequence(0, n) flips direction when n < 0, so guard short docs
                F.expr(
                    "CASE WHEN size(w) >= 8 THEN "
                    "transform(sequence(0, size(w) - 8),"
                    " i -> md5(concat_ws(' ', slice(w, i + 1, 8)))) "
                    "ELSE array() END"
                )
            ).alias("g"),
        )
        .distinct()
    )


@register(
    "t_decontaminate",
    f"""
    WITH grams AS ({_GRAMS_SQL}),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 7 = 0),
    train AS (SELECT * FROM grams WHERE doc_id % 7 <> 0)
    SELECT t.doc_id, t.lang, CAST(count(DISTINCT t.g) AS BIGINT) AS n_hits
    FROM train t JOIN bench b ON t.g = b.g
    GROUP BY t.doc_id, t.lang
    """,
)
def t_decontaminate(spark, sf_dir):
    """Flag training docs sharing any word 8-gram with the benchmark split
    (doc_id % 7 == 0); emit per-doc distinct-hit counts."""
    grams = _grams(spark, sf_dir)
    bench = (
        grams.where(F.col("doc_id") % 7 == 0).select("g").distinct()
    )
    train = grams.where(F.col("doc_id") % 7 != 0)
    # benchmark gram set is fixed-size at any corpus scale -> broadcast
    hits = train.join(F.broadcast(bench), "g")
    return hits.groupBy("doc_id", "lang").agg(
        F.count_distinct("g").cast("long").alias("n_hits")
    )


@register(
    "t_source_overlap",
    r"""
    WITH tok AS (
        SELECT source, doc_id,
               unnest(string_split_regex(lower(text), '\s+')) AS word,
               generate_subscripts(
                   string_split_regex(lower(text), '\s+'), 1) AS pos
        FROM documents
    ),
    grams AS (
        SELECT DISTINCT source,
               md5(word || ' ' ||
                   lead(word, 1) OVER (PARTITION BY source, doc_id
                                       ORDER BY pos) || ' ' ||
                   lead(word, 2) OVER (PARTITION BY source, doc_id
                                       ORDER BY pos) || ' ' ||
                   lead(word, 3) OVER (PARTITION BY source, doc_id
                                       ORDER BY pos) || ' ' ||
                   lead(word, 4) OVER (PARTITION BY source, doc_id
                                       ORDER BY pos)) AS g
        FROM tok
        QUALIFY lead(word, 4) OVER (PARTITION BY source, doc_id
                                    ORDER BY pos) IS NOT NULL
    ),
    sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM grams
              GROUP BY source),
    ov AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(count(*) AS BIGINT) AS shared
        FROM grams a JOIN grams b
          ON a.g = b.g AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT o.src_a, o.src_b, o.shared,
           round(o.shared * 1.0 / least(sa.n, sb.n), 6) + 0 AS containment
    FROM ov o
    JOIN sizes sa ON sa.source = o.src_a
    JOIN sizes sb ON sb.source = o.src_b
    ORDER BY containment DESC, o.src_a, o.src_b
    LIMIT 20
    """,
)
def t_source_overlap(spark, sf_dir):
    """Cross-source 5-gram containment matrix: for each source pair,
    shared distinct 5-grams over the SMALLER source's gram count — the
    'is feed B a scrape of feed A' provenance question
    (t_decontaminate checks a corpus against one benchmark;
    t_jsd_sources compares unigram DISTRIBUTIONS — containment of
    exact 5-grams catches verbatim copying that distribution
    similarity misses entirely). Top-20 most-contained pairs.

    5-grams build from positional leads inside one (source, doc)
    clustering and dedup to 32-char digests per source (text never
    joins); the pair overlap is a gram-keyed equi-join of digest sets
    with a<b canonicalization, and containment divides exact counts
    against the broadcast size table. Work scales with shared-gram
    postings, not source-pair count.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "source",
        "doc_id",
        F.posexplode(F.split(F.lower("text"), r"\s+")).alias("pos", "word"),
    )
    w = Window.partitionBy("source", "doc_id").orderBy("pos")
    gram = F.md5(
        F.concat_ws(
            " ",
            F.col("word"),
            F.lead("word", 1).over(w),
            F.lead("word", 2).over(w),
            F.lead("word", 3).over(w),
            F.lead("word", 4).over(w),
        )
    )
    grams = (
        words.select(
            "source",
            gram.alias("g"),
            F.lead("word", 4).over(w).alias("w4"),
        )  # gram + filter column in ONE window stage: filtering first
        # would re-evaluate the leads over the shrunken partition and
        # fabricate short grams at each doc's tail
        .where(F.col("w4").isNotNull())
        .select("source", "g")
        .distinct()
    )
    sizes = grams.groupBy("source").agg(F.count("*").cast("long").alias("n"))
    a = grams.alias("ga")
    b = grams.alias("gb")
    ov = (
        a.join(
            b,
            (F.col("ga.g") == F.col("gb.g"))
            & (F.col("ga.source") < F.col("gb.source")),
        )
        .groupBy(
            F.col("ga.source").alias("src_a"), F.col("gb.source").alias("src_b")
        )
        .agg(F.count("*").cast("long").alias("shared"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    return (
        ov.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "shared",
            f6(F.col("shared") * 1.0 / F.least(F.col("na"), F.col("nb"))).alias(
                "containment"
            ),
        )
        .orderBy(F.col("containment").desc(), "src_a", "src_b")
        .limit(20)
    )


@register(
    "t_decontaminate_fuzzy",
    f"""
    WITH grams AS ({_GRAMS_SQL}),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 7 = 0),
    train AS (SELECT * FROM grams WHERE doc_id % 7 <> 0),
    per_doc AS (
        SELECT t.doc_id, t.lang,
               CAST(count(*) AS BIGINT) AS n_grams,
               CAST(count(b.g) AS BIGINT) AS n_hits
        FROM train t LEFT JOIN bench b ON t.g = b.g
        GROUP BY t.doc_id, t.lang
    )
    SELECT doc_id, lang, n_grams, n_hits,
           round(n_hits * 1.0 / n_grams, 6) + 0 AS overlap_frac,
           CAST(CASE WHEN n_hits * 10 >= n_grams THEN 1 ELSE 0 END AS BIGINT)
               AS contaminated
    FROM per_doc
    WHERE n_hits > 0
    """,
)
def t_decontaminate_fuzzy(spark, sf_dir):
    """Threshold decontamination — the production refinement of
    t_decontaminate's any-hit rule: a training doc is contaminated only
    when >= 10% of its DISTINCT 8-grams appear in the benchmark split.
    The any-hit rule false-positives on boilerplate (one shared
    license-header gram kills an innocent doc); the PaLM/Llama-style
    fraction threshold keeps those and still catches real leaks, and
    emitting the fraction lets the pipeline tune the cut offline.

    Same shuffle discipline as t_decontaminate: grams travel as 32-char
    digests; the benchmark gram set is bounded by the (fixed) benchmark
    size so it broadcasts, making the screen one map-side hash probe per
    training gram + a per-doc fold. The fraction compares as integer
    cross-multiplication (n_hits*10 >= n_grams) — no float threshold
    boundary to disagree across engines.
    """
    grams = _grams(spark, sf_dir)
    bench = (
        grams.where(F.col("doc_id") % 7 == 0)
        .select("g")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = grams.where(F.col("doc_id") % 7 != 0)
    per_doc = (
        train.join(F.broadcast(bench), "g", "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.count("hit").cast("long").alias("n_hits"),
        )
    )
    return per_doc.where(F.col("n_hits") > 0).select(
        "doc_id",
        "lang",
        "n_grams",
        "n_hits",
        f6(F.col("n_hits") * 1.0 / F.col("n_grams")).alias("overlap_frac"),
        F.when(F.col("n_hits") * 10 >= F.col("n_grams"), 1)
        .otherwise(0)
        .cast("long")
        .alias("contaminated"),
    )
