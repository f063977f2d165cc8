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

from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table

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
