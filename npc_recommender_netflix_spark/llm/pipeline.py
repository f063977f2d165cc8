r"""Training-data pipeline assembly operators: sequence packing, deterministic
global shuffle/sharding, domain-mixture sampling, Gopher-style quality rules,
and int8 embedding quantization.

These are the "turn a cleaned corpus into trainable shards" steps that sit
after dedup/quality filtering (llm/text.py, llm/dedup.py) in a pretraining
data pipeline. Everything is expressed as exact integer / md5-derived
arithmetic shared by Spark and DuckDB, so every key carries a full SQL
oracle despite the ops being "ML plumbing".

Scale notes (100 TB):
- Packing is one window cumsum + one rollup sharing a single `lang`
  shuffle; state per task is O(1).
- Shard assignment is pure map-side hash math; the per-shard ordinal is a
  window over the shard key — at 100 TB you'd write `repartition(shard)`
  + `sortWithinPartitions` instead of materializing ordinals globally,
  but the hash→shard mapping is identical.
- Domain mixing broadcasts a per-source rate table (# sources ≪ # docs).
- Quality rules are single-pass codegen projections (no shuffle at all).
- int8 quantization is elementwise array math (no shuffle); 4× memory
  reduction before an ANN index build.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..session import f6, load_table, money2

# md5 first-8-hex -> uint32 via positional hex math (DuckDB has no conv();
# same recipe as llm/dedup.py's SimHash — both engines share the arithmetic).
_DUCK_H32 = """
    CAST(list_sum(list_transform(range(1, 9),
        j -> (strpos('0123456789abcdef', substring(md5({s}), j, 1)) - 1)
             * 16 ** (8 - j))) AS BIGINT)
"""

_CTX = 4096  # pack budget, tokens


@register(
    "t_pack_sequences",
    rf"""
    WITH toks AS (
        SELECT doc_id, lang,
               CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS toks
        FROM documents
    ),
    cum AS (
        SELECT doc_id, lang, toks,
               coalesce(sum(toks) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        FROM toks
    )
    SELECT lang, CAST(floor(cum_before / {_CTX}) AS BIGINT) AS pack_id,
           count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS pack_tokens
    FROM cum
    GROUP BY lang, pack_id
    ORDER BY lang, pack_id
    """,
)
def t_pack_sequences(spark, sf_dir):
    """Sequence packing: append each language's doc stream (doc_id order)
    into fixed 4096-token context bins; a document lands in the bin its
    start offset falls in (boundary bins may overflow by one doc — the
    streaming-packer semantic; a splitting packer would truncate instead).

    Plan shape: the window cumsum and the (lang, pack_id) rollup share ONE
    hashpartitioning(lang) exchange; token counts are exact integers so
    bin assignment is engine-exact. At 100 TB pack_id inherits doc_id
    ordering per language — deterministic regardless of cluster layout.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang",
        F.size(F.split(F.lower("text"), r"\s+")).cast("long").alias("toks"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = toks.withColumn("cum_before", F.coalesce(F.sum("toks").over(w), F.lit(0)))
    return (
        cum.groupBy("lang", F.floor(F.col("cum_before") / _CTX).alias("pack_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").cast("long").alias("pack_tokens"),
        )
        .orderBy("lang", "pack_id")
    )


@register(
    "t_shuffle_shard",
    f"""
    WITH h AS (
        SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hkey,
               {_DUCK_H32.format(s="CAST(doc_id AS VARCHAR)")} % 16 AS shard
        FROM documents
    )
    SELECT doc_id, CAST(shard AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY hkey, doc_id)
                AS BIGINT) AS pos
    FROM h
    ORDER BY shard, pos
    """,
)
def t_shuffle_shard(spark, sf_dir):
    """Deterministic global shuffle + shard assignment: md5(doc_id) drives
    both the shard choice (uint32 % 16) and the within-shard order — the
    same (shard, pos) on any engine, any partitioning, any cluster size,
    which is what makes a training run reproducible and resumable.

    Plan shape: shard math is pure map-side projection; the within-shard
    ordinal is one window over hashpartitioning(shard). At 100 TB you
    write `df.repartition(N, shard).sortWithinPartitions(hkey)` and skip
    global ordinals — the hash→shard mapping here is that exact layout.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("hkey"),
        (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
         .cast("long") % 16).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("hkey", "doc_id")
    return (
        h.select(
            "doc_id",
            F.col("shard").cast("long").alias("shard"),
            F.row_number().over(w).cast("long").alias("pos"),
        )
        .orderBy("shard", "pos")
    )


@register(
    "t_domain_mix",
    f"""
    WITH cnt AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
    m AS (SELECT min(n_docs) AS m FROM cnt),
    rate AS (SELECT source, n_docs,
                    CAST((SELECT m FROM m) AS DOUBLE) / n_docs AS rate
             FROM cnt),
    keep AS (
        SELECT d.source,
               CASE WHEN {_DUCK_H32.format(s="d.source || ':' || CAST(d.doc_id AS VARCHAR)")}
                         / 4294967296.0 < r.rate
                    THEN 1 ELSE 0 END AS kept
        FROM documents d JOIN rate r ON d.source = r.source
    )
    SELECT k.source, r.n_docs, CAST(sum(k.kept) AS BIGINT) AS n_kept,
           round(r.rate, 6) AS rate
    FROM keep k JOIN rate r ON k.source = r.source
    GROUP BY k.source, r.n_docs, r.rate
    ORDER BY k.source
    """,
)
def t_domain_mix(spark, sf_dir):
    """Domain-mixture rebalancing: downsample every source to the size of
    the smallest one (uniform target mix) with a deterministic md5-uniform
    keep decision — the reproducible version of per-domain sampling
    weights in pretraining mixes.

    Plan shape: the per-source count table and the global min are tiny and
    broadcast back onto the corpus scan; the keep decision is map-side
    hash math (md5 → uint32 / 2^32 < rate). The rate is one deterministic
    double division of exact integers, so no boundary row can flip between
    engines. At 100 TB swapping the uniform target for arbitrary mixture
    weights is a one-line change to the rate expression.
    """
    docs = load_table(spark, sf_dir, "documents")
    cnt = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    m = cnt.agg(F.min("n_docs").alias("m"))
    rate = cnt.join(F.broadcast(m)).select(
        "source", "n_docs", (F.col("m").cast("double") / F.col("n_docs")).alias("rate")
    )
    skey = F.concat(F.col("source"), F.lit(":"), F.col("doc_id").cast("string"))
    u = F.conv(F.substring(F.md5(skey), 1, 8), 16, 10).cast("long") / F.lit(4294967296.0)
    keep = (
        docs.join(F.broadcast(rate), "source")
        .select("source", "n_docs", "rate", F.when(u < F.col("rate"), 1).otherwise(0).alias("kept"))
    )
    return (
        keep.groupBy("source", "n_docs", "rate")
        .agg(F.sum("kept").cast("long").alias("n_kept"))
        .select("source", "n_docs", "n_kept", f6(F.col("rate")).alias("rate"))
        .orderBy("source")
    )


@register(
    "t_gopher_quality",
    r"""
    WITH s AS (
        SELECT doc_id,
               CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS n_tokens,
               CAST(len(regexp_extract_all(lower(text), '[^a-z0-9\s]')) AS BIGINT)
                   AS n_symbols,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len(list_distinct(string_split_regex(lower(text), '\s+')))
                    AS BIGINT) AS n_distinct,
               CAST(list_sum(list_transform(string_split_regex(lower(text), '\s+'),
                                            x -> length(x))) AS BIGINT) AS wordlen_sum
        FROM documents
    )
    SELECT doc_id,
           n_tokens,
           round(CAST(wordlen_sum AS DOUBLE) / n_tokens, 6) AS mean_word_len,
           round(CAST(n_symbols AS DOUBLE) / n_chars, 6) AS symbol_ratio,
           round(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS distinct_ratio,
           (n_tokens BETWEEN 10 AND 5000) AS f_len,
           (CAST(wordlen_sum AS DOUBLE) / n_tokens BETWEEN 2.0 AND 12.0) AS f_mwl,
           (CAST(n_symbols AS DOUBLE) / n_chars < 0.3) AS f_sym,
           (CAST(n_distinct AS DOUBLE) / n_tokens > 0.2) AS f_distinct,
           ((n_tokens BETWEEN 10 AND 5000)
            AND (CAST(wordlen_sum AS DOUBLE) / n_tokens BETWEEN 2.0 AND 12.0)
            AND (CAST(n_symbols AS DOUBLE) / n_chars < 0.3)
            AND (CAST(n_distinct AS DOUBLE) / n_tokens > 0.2)) AS keep
    FROM s
    """,
)
def t_gopher_quality(spark, sf_dir):
    """Gopher-style rule-based quality filter: document length, mean word
    length, symbol-to-char ratio, and lexical diversity, each as a named
    boolean rule plus the conjunction — the standard pretraining heuristic
    battery (bullet/ellipsis rules omitted: the synthetic corpus has none).

    Plan shape: single-pass codegen projection over the documents scan —
    no shuffle, no UDF. The rule comparisons run on the RAW quotients of
    exact integers (identical doubles on both engines); rounding is only
    applied to the emitted ratio columns.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.lower("text"), r"\s+")
    d = docs.select(
        "doc_id",
        F.size(w).cast("long").alias("n_tokens"),
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit(r"[^a-z0-9\s]"), F.lit(0))
        ).cast("long").alias("n_symbols"),
        F.length("text").cast("long").alias("n_chars"),
        F.size(F.array_distinct(w)).cast("long").alias("n_distinct"),
        F.expr(
            r"aggregate(split(lower(text), '\\s+'), CAST(0 AS BIGINT),"
            r" (acc, x) -> acc + length(x))"
        ).alias("wordlen_sum"),
    )
    mwl = F.col("wordlen_sum").cast("double") / F.col("n_tokens")
    sym = F.col("n_symbols").cast("double") / F.col("n_chars")
    dr = F.col("n_distinct").cast("double") / F.col("n_tokens")
    f_len = F.col("n_tokens").between(10, 5000)
    f_mwl = (mwl >= 2.0) & (mwl <= 12.0)
    f_sym = sym < 0.3
    f_distinct = dr > 0.2
    return d.select(
        "doc_id",
        "n_tokens",
        f6(mwl).alias("mean_word_len"),
        f6(sym).alias("symbol_ratio"),
        f6(dr).alias("distinct_ratio"),
        f_len.alias("f_len"),
        f_mwl.alias("f_mwl"),
        f_sym.alias("f_sym"),
        f_distinct.alias("f_distinct"),
        (f_len & f_mwl & f_sym & f_distinct).alias("keep"),
    )


@register(
    "v_int8_quantize",
    """
    WITH q AS (
        SELECT vec_id,
               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
                   AS maxabs,
               embedding
        FROM embeddings
    ),
    c AS (
        SELECT vec_id, maxabs,
               list_transform(embedding,
                   x -> CAST(floor((CAST(x AS DOUBLE) * 127.0) / maxabs)
                             AS BIGINT)) AS codes,
               embedding
        FROM q
    )
    SELECT vec_id,
           round(maxabs, 6) AS maxabs,
           array_to_string(codes, ',') AS codes,
           round(list_sum(list_transform(range(1, len(embedding) + 1),
                 i -> (CAST(embedding[i] AS DOUBLE)
                       - (CAST(codes[i] AS DOUBLE) * maxabs) / 127.0)
                      * (CAST(embedding[i] AS DOUBLE)
                         - (CAST(codes[i] AS DOUBLE) * maxabs) / 127.0)))
                 / len(embedding), 9) AS mse
    FROM c
    ORDER BY vec_id
    """,
)
def v_int8_quantize(spark, sf_dir):
    """int8 embedding quantization: symmetric per-vector scale (127/max|x|),
    floor codes, plus the reconstruction MSE — the standard 4× memory
    reduction applied before building a large ANN index.

    Plan shape: pure elementwise array math in one codegen projection (no
    shuffle, no UDF). floor() avoids the round-half tie divergence between
    engines; the scale product/division uses one association —
    (x * 127.0) / maxabs — on both sides, and the MSE folds the 64
    elements in list order on both engines. Codes serialize via
    array_join (driver-hashable scalar).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id", "embedding",
        F.expr(
            "array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"
        ).alias("maxabs"),
    )
    c = q.withColumn(
        "codes",
        F.expr(
            "transform(embedding,"
            " x -> CAST(floor((CAST(x AS DOUBLE) * 127.0) / maxabs) AS BIGINT))"
        ),
    )
    mse = F.expr(
        "aggregate(zip_with(embedding, codes,"
        " (x, k) -> (CAST(x AS DOUBLE) - (CAST(k AS DOUBLE) * maxabs) / 127.0)"
        "          * (CAST(x AS DOUBLE) - (CAST(k AS DOUBLE) * maxabs) / 127.0)),"
        " CAST(0 AS DOUBLE), (acc, v) -> acc + v) / size(embedding)"
    )
    return (
        c.select(
            "vec_id",
            f6(F.col("maxabs")).alias("maxabs"),
            F.array_join(F.col("codes"), ",").alias("codes"),
            (F.round(mse, 9) + 0.0).alias("mse"),
        )
        .orderBy("vec_id")
    )


@register(
    "t_kfold_split",
    f"""
    WITH f AS (
        SELECT doc_id, lang,
               {_DUCK_H32.format(s="'fold:' || CAST(doc_id AS VARCHAR)")} % 5
                   AS fold
        FROM documents
    )
    SELECT fold, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM f GROUP BY fold ORDER BY fold
    """,
)
def t_kfold_split(spark, sf_dir):
    """Deterministic 5-fold cross-validation assignment: fold =
    md5('fold:'||doc_id) mod 5 — the split that is (a) reproducible
    across engines, runs, and cluster sizes (randomSplit is none of
    those: it's partition-order-dependent), (b) stable under corpus
    growth (a doc never changes folds when new docs arrive), and
    (c) joinable: any other table keyed by doc_id computes the SAME
    fold locally, no split table to ship.

    Pure map-side hash math (the t_domain_mix keep-hash convention)
    + one count-sized agg over 5 fold cells. Per-fold lang coverage
    comes along in the same aggregate as the balance sanity check.
    """
    docs = load_table(spark, sf_dir, "documents")
    fold = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("fold:"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 5
    )
    return (
        docs.select("doc_id", "lang", fold.alias("fold"))
        .groupBy("fold")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
        .orderBy("fold")
    )


@register(
    "t_sft_format",
    f"""
    WITH tok AS (
        SELECT doc_id, lang,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                   AS n_tokens
        FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_examples,
           CAST(sum(CASE WHEN n_tokens > 48 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_truncated,
           CAST(sum(least(n_tokens, 48)) AS BIGINT) AS kept_tokens,
           round(avg(least(n_tokens, 48) * 1.0), 6) + 0 AS avg_tokens
    FROM tok GROUP BY lang ORDER BY lang
    """,
)
def t_sft_format(spark, sf_dir):
    """Instruction-tuning formatter: wrap each document into a chat
    template (`{{"messages": [{{"role": "user", ...}}]}}` via
    to_json(struct(...))), truncate at a 48-token budget, and report
    per-language example/truncation/token stats — the last step before
    an SFT corpus ships to the trainer, where silent over-budget
    examples either OOM the collator or silently clip the labels.

    The JSON build is a zero-shuffle codegen projection
    (to_json(named_struct(...)) — no Python string formatting); the
    token estimate is the whitespace tokenizer shared with
    t_token_count; truncation is deterministic least(). The stats
    rollup is the only shuffle (per-lang cells). The oracle checks the
    STATS (the JSON blob itself is formatting, asserted non-null in
    pytest); at 100 TB the formatted JSONL writes straight out of the
    projection.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    kept = F.least(n_tokens, F.lit(48))
    formatted = docs.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        kept.alias("kept_tokens"),
        F.to_json(
            F.struct(
                F.array(
                    F.struct(
                        F.lit("user").alias("role"),
                        F.concat(
                            F.lit("Summarize: "),
                            F.array_join(
                                F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 48),
                                " ",
                            ),
                        ).alias("content"),
                    )
                ).alias("messages")
            )
        ).alias("sft_json"),
    )
    return (
        formatted.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_examples"),
            F.sum(F.when(F.col("n_tokens") > 48, 1).otherwise(0))
            .cast("long")
            .alias("n_truncated"),
            F.sum("kept_tokens").cast("long").alias("kept_tokens"),
            f6(F.avg(F.col("kept_tokens") * 1.0)).alias("avg_tokens"),
        )
        .orderBy("lang")
    )


from .text import TOKENS_SQL as _TOKENS_SQL  # noqa: E402 (shared tokenizer)


@register(
    "t_vocab_coverage",
    f"""
    WITH tok AS ({_TOKENS_SQL}),
    vocab AS (
        SELECT word FROM (
            SELECT word, count(*) AS c,
                   row_number() OVER (ORDER BY count(*) DESC, word) AS rn
            FROM tok GROUP BY word
        ) WHERE rn <= 1000
    )
    SELECT t.lang,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.word IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS covered,
           round(sum(CASE WHEN v.word IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) + 0 AS coverage
    FROM tok t LEFT JOIN vocab v ON v.word = t.word
    GROUP BY t.lang ORDER BY t.lang
    """,
)
def t_vocab_coverage(spark, sf_dir):
    """Vocabulary coverage / OOV-rate: fraction of the token stream
    covered by the corpus's top-1000 words, per language — the
    tokenizer-design number that decides vocab size (coverage rising
    slowly past 1k says long-tail morphology; t_fertility measures
    subword cost, this measures word-level coverage).

    The vocab is a rank-limited aggregate (WindowGroupLimit over the
    word-count fold — vocabulary-sized, corpus-sublinear) that
    BROADCASTS back onto the token stream as a LEFT join; coverage is
    a conditional count per lang. At 100 TB: one (word) agg shuffle +
    one broadcast probe pass — the token stream itself never re-keys.
    """
    from .text import tokens

    tok = tokens(spark, sf_dir)
    counts = tok.groupBy("word").agg(F.count("*").alias("c"))
    vocab = (
        counts.withColumn(
            "rn",
            F.row_number().over(Window.orderBy(F.col("c").desc(), "word")),
        )
        .where(F.col("rn") <= 1000)
        .select("word")
    )
    return (
        tok.join(F.broadcast(vocab.withColumn("in_v", F.lit(1))), "word", "left")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("in_v") == 1, 1).otherwise(0))
            .cast("long")
            .alias("covered"),
        )
        .select(
            "lang",
            "n_tokens",
            "covered",
            f6(F.col("covered") * 1.0 / F.col("n_tokens")).alias("coverage"),
        )
        .orderBy("lang")
    )


@register(
    "t_mix_temperature",
    """
    WITH src AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents
        GROUP BY source
    ),
    w AS (
        SELECT source, n, power(n, 0.7) AS wt FROM src
    )
    SELECT source, n,
           round(wt / sum(wt) OVER (), 6) + 0 AS mix_share,
           round(wt / sum(wt) OVER () * (SELECT sum(n) FROM src), 2) + 0
               AS expected_docs,
           round((wt / sum(wt) OVER ())
                 / (n * 1.0 / (SELECT sum(n) FROM src)), 6) + 0
               AS upsample_factor
    FROM w ORDER BY source
    """,
)
def t_mix_temperature(spark, sf_dir):
    """Temperature-scaled data mixing (the multilingual/multi-source
    sampling rule from the mBERT/XLM-R/PaLM lineage, public): sample
    source s with probability ∝ n_s^τ, τ=0.7 — flattening the natural
    distribution so long-tail sources are upsampled (factor > 1) and
    dominant ones downsampled, WITHOUT the hard equalization that
    starves head sources. Emits per-source share, expected docs per
    epoch, and the upsample factor a sampler (t_shuffle_shard /
    t_stratified_sample) would consume.

    One partial+final count per source; everything after is O(sources)
    scalar math over the aggregated axis with a single unbounded-window
    normalizer — the same bounded-axis discipline as t_domain_mix.
    power() with shared literal τ agrees across engines under the
    snaps.
    """
    docs = load_table(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(F.count("*").cast("long").alias("n"))
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wt = F.pow(F.col("n"), 0.7)
    share = wt / F.sum(wt).over(w_all)
    total_n = F.sum("n").over(w_all)
    return (
        src.select(
            "source",
            "n",
            f6(share).alias("mix_share"),
            money2(share * total_n).alias("expected_docs"),
            f6(share / (F.col("n") * 1.0 / total_n)).alias("upsample_factor"),
        )
        .orderBy("source")
    )


@register(
    "t_preference_pairs",
    r"""
    WITH scored AS (
        SELECT doc_id, source, text,
               CAST(len(list_distinct(string_split_regex(lower(text), '\s+')))
                    AS BIGINT) * 1000000
               // CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT)
                   AS q6
        FROM documents
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY source
                                  ORDER BY q6 DESC, doc_id) AS rb,
               row_number() OVER (PARTITION BY source
                                  ORDER BY q6 ASC, doc_id) AS rw
        FROM scored
    ),
    best AS (SELECT source, doc_id AS chosen_id, q6 AS chosen_q6
             FROM ranked WHERE rb = 1),
    worst AS (SELECT source, doc_id AS rejected_id, q6 AS rejected_q6
              FROM ranked WHERE rw = 1)
    SELECT b.source, b.chosen_id, w.rejected_id,
           b.chosen_q6, w.rejected_q6,
           CAST(b.chosen_q6 - w.rejected_q6 AS BIGINT) AS margin_q6
    FROM best b JOIN worst w ON w.source = b.source
    WHERE b.chosen_id <> w.rejected_id
    ORDER BY b.source
    """,
)
def t_preference_pairs(spark, sf_dir):
    """Preference-pair construction for reward-model / DPO training: per
    prompt group (source stands in for the prompt), pair the
    highest-quality response with the lowest as (chosen, rejected),
    with the score margin the trainer can weight by — the
    RLHF-data-prep operator downstream of quality scoring
    (t_quality_score) and upstream of t_sft_format's serialization.
    Degenerate groups where best == worst (a single doc) emit nothing:
    a pair needs two distinct members.

    Quality is the integer fixed-point distinct-token ratio (shared
    with t_dedup_best_survivor — no float ratios cross engines); both
    extremes come from ONE window pass over the source-partitioned axis
    (two row_numbers share the exchange, opposite orders), and the pair
    join is per-group 1x1. At 100 TB: groups are prompts (millions),
    the pairing stays |groups|-sized, and the heavy text column rides
    only until the score projection.
    """
    docs = load_table(spark, sf_dir, "documents")
    wtok = F.split(F.lower("text"), r"\s+")
    scored = docs.select(
        "doc_id",
        "source",
        F.expr(
            "(size(array_distinct(split(lower(text), '\\\\s+'))) * 1000000)"
            " div size(split(lower(text), '\\\\s+'))"
        ).alias("q6"),
    )
    wb = Window.partitionBy("source").orderBy(F.col("q6").desc(), "doc_id")
    ww = Window.partitionBy("source").orderBy(F.col("q6").asc(), "doc_id")
    ranked = scored.select(
        "doc_id", "source", "q6",
        F.row_number().over(wb).alias("rb"),
        F.row_number().over(ww).alias("rw"),
    )
    best = ranked.where(F.col("rb") == 1).select(
        "source",
        F.col("doc_id").alias("chosen_id"),
        F.col("q6").alias("chosen_q6"),
    )
    worst = ranked.where(F.col("rw") == 1).select(
        "source",
        F.col("doc_id").alias("rejected_id"),
        F.col("q6").alias("rejected_q6"),
    )
    return (
        best.join(worst, "source")
        .where(F.col("chosen_id") != F.col("rejected_id"))
        .select(
            "source",
            "chosen_id",
            "rejected_id",
            "chosen_q6",
            "rejected_q6",
            (F.col("chosen_q6") - F.col("rejected_q6")).cast("long").alias("margin_q6"),
        )
        .orderBy("source")
    )


@register(
    "t_shard_stability",
    """
    WITH h AS (
        SELECT doc_id,
               CAST(list_sum(list_transform(range(1, 9),
                    j -> (strpos('0123456789abcdef',
                          substring(md5(CAST(doc_id AS VARCHAR)), j, 1)) - 1)
                         * 16 ** (8 - j))) AS BIGINT) AS h32
        FROM documents
    ),
    assign AS (
        SELECT doc_id,
               h32 % 8 AS mod8, h32 % 10 AS mod10,
               h32 // 536870912 AS ring8,
               CASE WHEN h32 // 536870912 IN (0, 1)
                    THEN h32 // 214748365 END AS ring10_split
        FROM h
    ),
    moves AS (
        SELECT 'mod' AS strategy,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN mod8 <> mod10 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_moved
        FROM assign
        UNION ALL
        SELECT 'ring' AS strategy,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN ring10_split IS NOT NULL
                              AND ring10_split <> ring8
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
        FROM assign
    )
    SELECT strategy, n_docs, n_moved,
           round(n_moved * 1.0 / n_docs, 6) + 0 AS moved_frac
    FROM moves ORDER BY strategy
    """,
)
def t_shard_stability(spark, sf_dir):
    """Resharding stability, mod-hash vs range-ring, measured: grow a
    corpus's shard count 8 -> 10 and count documents that MOVE shards.
    Naive `hash % n` reassigns ~(1 - 1/lcm-ish) ≈ 90% of documents —
    every downstream cache, dedup-state partition, and co-located join
    rebuilt — while a range ring (shard = hash-space interval; growing
    splits two intervals) moves only docs inside the split intervals,
    ~2/10. This is why every production dedup/state layer (and Spark's
    own range partitioner) shards by hash RANGE, not modulus, when the
    shard count must evolve.

    Both assignments are pure integer arithmetic on the same md5-uint32
    (536870912 = 2^32/8; the split sends intervals {0,1} to fifths of
    their span via 2^32/20): one scan, O(1) census state, identical
    literals in both engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    h32 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    assign = docs.select(
        h32.alias("h32"),
        (h32 % 8).alias("mod8"),
        (h32 % 10).alias("mod10"),
    ).select(
        "mod8",
        "mod10",
        F.expr("h32 div 536870912").alias("ring8"),
        F.when(
            F.expr("h32 div 536870912").isin(0, 1),
            F.expr("h32 div 214748365"),
        ).alias("ring10_split"),
    )
    mod_row = assign.agg(
        F.lit("mod").alias("strategy"),
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("mod8") != F.col("mod10"), 1).otherwise(0))
        .cast("long")
        .alias("n_moved"),
    )
    ring_row = assign.agg(
        F.lit("ring").alias("strategy"),
        F.count("*").cast("long").alias("n_docs"),
        F.sum(
            F.when(
                F.col("ring10_split").isNotNull()
                & (F.col("ring10_split") != F.col("ring8")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_moved"),
    )
    return (
        mod_row.unionByName(ring_row)
        .select(
            "strategy",
            "n_docs",
            "n_moved",
            f6(F.col("n_moved") * 1.0 / F.col("n_docs")).alias("moved_frac"),
        )
        .orderBy("strategy")
    )


@register(
    "t_epoch_schedule",
    r"""
    WITH toks AS (
        SELECT lang,
               CAST(sum(len(string_split_regex(lower(text), '\s+')))
                    AS BIGINT) AS available_tokens
        FROM documents GROUP BY lang
    ),
    tot AS (SELECT CAST(3 * sum(available_tokens) AS BIGINT) AS budget
            FROM toks),
    shares(lang, ppm) AS (
        VALUES ('en', 400000), ('zh', 200000), ('de', 150000),
               ('es', 150000), ('fr', 100000)
    ),
    plan AS (
        SELECT t.lang, t.available_tokens,
               CAST((tot.budget * s.ppm) // 1000000 AS BIGINT)
                   AS target_tokens
        FROM toks t JOIN shares s ON s.lang = t.lang CROSS JOIN tot
    )
    SELECT lang, available_tokens, target_tokens,
           CAST((target_tokens + available_tokens - 1)
                // available_tokens AS BIGINT) AS epochs,
           CAST(greatest(0, target_tokens - available_tokens) AS BIGINT)
               AS repeated_tokens,
           CAST(least(1000000,
                      (available_tokens * 1000000) // target_tokens)
                AS BIGINT) AS unique_frac_ppm
    FROM plan
    """,
)
def t_epoch_schedule(spark, sf_dir):
    """Data-constrained epoch planning: how many times each domain must
    repeat to fill its slice of a token budget (the repetition schedule
    from data-constrained scaling analyses, e.g. Muennighoff et al. 2023,
    public). Inputs: measured available tokens per language and a target
    mixture (ppm shares) over a budget of 3x the corpus — so
    under-represented domains are forced into multiple epochs. Per
    domain: available tokens, target tokens, epochs = ceil(target /
    available), tokens that are repeats, and the unique fraction (ppm) —
    the number that says how much of a domain's slice is fresh data vs
    re-reads, which is what decides whether to buy more data or accept
    the repetition penalty.

    Scale design: ONE map-side-combinable token-count aggregation over
    the corpus (the t_token_count shuffle shape: per-lang partials, text
    never shuffles); everything downstream is exact integer arithmetic
    on a 5-row axis joined against a broadcast literal share table. The
    budget multiplier and shares are the tunable policy; the integer DIV
    / ceil forms make every engine agree to the token.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.groupBy("lang").agg(
        F.sum(F.size(F.split(F.lower("text"), r"\s+")).cast("long"))
        .cast("long")
        .alias("available_tokens")
    )
    tot = toks.agg(
        (3 * F.sum("available_tokens")).cast("long").alias("budget")
    )
    shares = spark.createDataFrame(
        [("en", 400000), ("zh", 200000), ("de", 150000),
         ("es", 150000), ("fr", 100000)],
        "lang string, ppm long",
    )
    plan = (
        toks.join(F.broadcast(shares), "lang")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "available_tokens",
            F.expr("(budget * ppm) DIV 1000000").alias("target_tokens"),
        )
    )
    return plan.select(
        "lang",
        "available_tokens",
        "target_tokens",
        F.expr(
            "(target_tokens + available_tokens - 1) DIV available_tokens"
        ).alias("epochs"),
        F.greatest(
            F.lit(0).cast("long"),
            F.col("target_tokens") - F.col("available_tokens"),
        ).alias("repeated_tokens"),
        F.least(
            F.lit(1000000).cast("long"),
            F.expr("(available_tokens * 1000000) DIV target_tokens"),
        ).alias("unique_frac_ppm"),
    )


@register(
    "t_dedup_mix_shift",
    """
    WITH d AS (
        SELECT doc_id, source, md5(text) AS digest FROM documents
    ),
    keep AS (
        SELECT digest, min(doc_id) AS keep_id FROM d GROUP BY digest
    ),
    per AS (
        SELECT d.source,
               count(*) AS docs_before,
               sum(CASE WHEN d.doc_id = k.keep_id THEN 1 ELSE 0 END)
                   AS docs_after
        FROM d JOIN keep k ON d.digest = k.digest
        GROUP BY d.source
    ),
    tot AS (
        SELECT sum(docs_before) AS tb, sum(docs_after) AS ta FROM per
    )
    SELECT p.source,
           CAST(p.docs_before AS BIGINT) AS docs_before,
           CAST(p.docs_after AS BIGINT) AS docs_after,
           CAST((p.docs_before - p.docs_after) * 1000000
                    // p.docs_before AS BIGINT) AS dup_rate_ppm,
           CAST(p.docs_before * 1000000 // t.tb AS BIGINT)
               AS share_before_ppm,
           CAST(p.docs_after * 1000000 // t.ta AS BIGINT)
               AS share_after_ppm,
           CAST(p.docs_after * 1000000 // t.ta
                - p.docs_before * 1000000 // t.tb AS BIGINT) AS shift_ppm
    FROM per p CROSS JOIN tot t
    ORDER BY p.source
    """,
)
def t_dedup_mix_shift(spark, sf_dir):
    """Dedup-induced mixture shift — the governance metric pretraining
    pipelines publish next to every dedup run: exact dedup (md5 digest,
    keep the min doc_id) removes MORE from some sources than others
    (mirror-heavy web snapshots lose most, curated corpora lose little),
    so the post-dedup domain mix silently drifts from the one the data
    card promised. Per source: docs before/after, the per-source dup
    rate, and the mix share before/after in exact ppm — shift_ppm is the
    number a mixture-rebalancing stage (t_domain_mix) must correct AFTER
    dedup, not before.

    Scale: digest groupBy is the standard exact-dedup shuffle (32-char
    keys); the survivor check joins back on digest (co-partitioned by
    the same key, no extra shuffle under AQE); shares are a 20-row per
    frame crossed with a 1-row broadcast total. Integer ppm division on
    both engines, unique source ordering.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", "source", F.md5("text").alias("digest"))
    keep = d.groupBy("digest").agg(F.min("doc_id").alias("keep_id"))
    per = (
        d.join(keep, "digest")
        .groupBy("source")
        .agg(
            F.count("*").alias("docs_before"),
            F.sum(
                F.when(F.col("doc_id") == F.col("keep_id"), 1).otherwise(0)
            ).alias("docs_after"),
        )
    )
    tot = per.agg(
        F.sum("docs_before").alias("tb"), F.sum("docs_after").alias("ta")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("docs_before").cast("long").alias("docs_before"),
            F.col("docs_after").cast("long").alias("docs_after"),
            F.expr(
                "(docs_before - docs_after) * 1000000 div docs_before"
            ).cast("long").alias("dup_rate_ppm"),
            F.expr("docs_before * 1000000 div tb").cast("long")
            .alias("share_before_ppm"),
            F.expr("docs_after * 1000000 div ta").cast("long")
            .alias("share_after_ppm"),
            F.expr(
                "docs_after * 1000000 div ta"
                " - docs_before * 1000000 div tb"
            ).cast("long").alias("shift_ppm"),
        )
        .orderBy("source")
    )
