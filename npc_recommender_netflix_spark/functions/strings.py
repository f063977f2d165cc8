"""§2.7 scalar functions — string families.

One query per family; each projects every covered function over a real
table so the oracle hash covers all of them. All JVM built-ins → stay
inside whole-stage codegen at scale (no Python boundary).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table


@register(
    "fn_string_basic",
    """
    SELECT p_partkey,
           upper(p_name) AS up, lower(p_type) AS lo,
           CAST(length(p_name) AS BIGINT) AS ln,
           trim(concat(' ', p_name, ' ')) AS tr,
           ltrim(concat('  ', p_name)) AS ltr,
           rtrim(concat(p_name, '  ')) AS rtr,
           lpad(p_brand, 12, '*') AS lp, rpad(p_brand, 12, '*') AS rp,
           reverse(p_name) AS rev,
           concat_ws('-', p_brand, p_type) AS cw,
           left(p_name, 4) AS l4, right(p_name, 3) AS r3,
           substring(p_name, 2, 5) AS sub
    FROM part
    """,
)
def fn_string_basic(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_type").alias("lo"),
        F.length("p_name").cast("long").alias("ln"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("tr"),
        F.ltrim(F.concat(F.lit("  "), F.col("p_name"))).alias("ltr"),
        F.rtrim(F.concat(F.col("p_name"), F.lit("  "))).alias("rtr"),
        F.lpad("p_brand", 12, "*").alias("lp"),
        F.rpad("p_brand", 12, "*").alias("rp"),
        F.reverse("p_name").alias("rev"),
        F.concat_ws("-", "p_brand", "p_type").alias("cw"),
        F.expr("left(p_name, 4)").alias("l4"),
        F.expr("right(p_name, 3)").alias("r3"),
        F.substring("p_name", 2, 5).alias("sub"),
    )


@register(
    "fn_string_regex",
    """
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word,
           regexp_matches(p_name, 'g.*r') AS has_gr,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
           array_to_string(string_split(p_name, ' '), '|') AS words
    FROM part
    """,
)
def fn_string_regex(spark, sf_dir):
    # split() is the operator under test; output joined with '|' because raw
    # ARRAY columns crash the driver harness's pandas canonicalization.
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+) ([a-z]+)", 2).alias("second_word"),
        F.col("p_name").rlike("g.*r").alias("has_gr"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devowel"),
        F.array_join(F.split("p_name", " "), "|").alias("words"),
    )


@register(
    "fn_string_search",
    """
    SELECT p_partkey,
           CAST(strpos(p_name, 'e') AS BIGINT) AS pos_e,
           contains(p_name, 'ring') AS has_ring,
           starts_with(p_name, 'red') AS is_red,
           ends_with(p_name, 'bolt') AS is_bolt,
           translate(p_name, 'aeiou', 'AEIOU') AS tlate,
           repeat(left(p_name, 2), 3) AS rep
    FROM part
    """,
)
def fn_string_search(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.instr("p_name", "e").cast("long").alias("pos_e"),
        F.col("p_name").contains("ring").alias("has_ring"),
        F.col("p_name").startswith("red").alias("is_red"),
        F.col("p_name").endswith("bolt").alias("is_bolt"),
        F.translate("p_name", "aeiou", "AEIOU").alias("tlate"),
        F.repeat(F.expr("left(p_name, 2)"), 3).alias("rep"),
    )


@register(
    "fn_fuzzy",
    """
    SELECT p_partkey,
           CAST(levenshtein(p_name, 'red widget') AS BIGINT) AS dist_red,
           CAST(levenshtein(p_brand, 'Brand#1') AS BIGINT) AS dist_brand
    FROM part
    """,
)
def fn_fuzzy(spark, sf_dir):
    """Fuzzy matching: edit distance (both engines implement classic
    Levenshtein). The dedup ladder's last-resort comparator for short keys."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.levenshtein("p_name", F.lit("red widget")).cast("long").alias("dist_red"),
        F.levenshtein("p_brand", F.lit("Brand#1")).cast("long").alias("dist_brand"),
    )


@register(
    "fn_aes_roundtrip",
    """
    SELECT c_custkey, c_name,
           CAST(1 AS BIGINT) AS roundtrip_ok,
           CAST(length(c_name) AS BIGINT) AS plain_len
    FROM customer WHERE c_custkey <= 100
    ORDER BY c_custkey
    """,
)
def fn_aes_roundtrip(spark, sf_dir):
    """Column-level encryption surface: `aes_encrypt`/`aes_decrypt`
    round-trip on customer names (ECB mode for deterministic output —
    production would use GCM, whose random IV makes ciphertext
    non-reproducible by design; determinism is exactly what this
    oracle-checked key needs). The at-rest-PII primitive next to
    t_scrub_pii's redaction: scrubbing destroys, encryption preserves
    reversibly for the keyholder.

    Both crypto ops are JVM codegen expressions — zero shuffle, no
    Python; the oracle checks the INVARIANT (decrypt∘encrypt =
    identity, emitted as roundtrip_ok + the recovered plaintext)
    rather than ciphertext bytes, so the contract survives algorithm
    upgrades. At 100 TB this is a map-side projection on the scan.
    """
    cust = load_table(spark, sf_dir, "customer")
    dec = F.expr(
        "CAST(aes_decrypt(aes_encrypt(c_name, '0123456789abcdef', 'ECB'),"
        " '0123456789abcdef', 'ECB') AS STRING)"
    )
    return (
        cust.where(F.col("c_custkey") <= 100)
        .select(
            "c_custkey",
            dec.alias("c_name"),
            F.when(dec == F.col("c_name"), 1).otherwise(0).cast("long").alias(
                "roundtrip_ok"
            ),
            F.length("c_name").cast("long").alias("plain_len"),
        )
        .orderBy("c_custkey")
    )


@register(
    "fn_xpath",
    """
    SELECT o_orderkey,
           o_orderstatus AS status_back,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents_back
    FROM orders WHERE o_orderkey <= 300
    ORDER BY o_orderkey
    """,
)
def fn_xpath(spark, sf_dir):
    """XPath extraction surface (`xpath_string` / `xpath_long`) over an
    XML column — the legacy-feed ingest path (B2B EDI, config exports)
    that still lands in every warehouse. The XML is built from order
    fields and parsed back, so the oracle checks the round-trip
    identity on the recovered typed columns (the fn_aes_roundtrip
    pattern — invariants, not serialized bytes).

    Both the build (concat) and the parse (xpath_*) are codegen
    expressions — zero shuffle, no Python XML library anywhere; the
    orderkey predicate pushes to the scan. At 100 TB: a map-side
    projection, with the XML column dropped immediately after
    extraction so it never reaches a shuffle.
    """
    orders = load_table(spark, sf_dir, "orders")
    xml = F.concat(
        F.lit("<o><k>"),
        F.col("o_orderkey").cast("string"),
        F.lit("</k><s>"),
        F.col("o_orderstatus"),
        F.lit("</s><c>"),
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
        F.lit("</c></o>"),
    )
    return (
        orders.where(F.col("o_orderkey") <= 300)
        .select("o_orderkey", xml.alias("xml"))
        .select(
            "o_orderkey",
            F.expr("xpath_string(xml, '/o/s')").alias("status_back"),
            F.expr("xpath_long(xml, '/o/c')").alias("cents_back"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "fn_collation",
    """
    SELECT lower(o_orderpriority) AS pri_ci,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    GROUP BY lower(o_orderpriority)
    ORDER BY pri_ci
    """,
)
def fn_collation(spark, sf_dir):
    """Spark 4 collation surface: grouping under the UTF8_LCASE
    collation — case-insensitive semantics declared on the COMPARISON
    (the column type / collate() call) instead of smeared through the
    query as lower() wrappers. One declaration fixes every =, GROUP
    BY, DISTINCT, and join on the column, which is the maintainability
    point; the oracle proves the equivalence by computing the same
    census with explicit lower() — identical buckets by construction.

    Collation-aware comparisons run inside codegen (no UDF); at 100 TB
    the practical win is on joins: a collated key hash-partitions
    case-insensitively without materializing a normalized copy of the
    column.
    """
    orders = load_table(spark, sf_dir, "orders")
    ci = F.expr("collate(o_orderpriority, 'UTF8_LCASE')")
    return (
        orders.groupBy(ci.alias("pri_key"))
        .agg(F.count("*").cast("long").alias("n"))
        .select(F.lower("pri_key").alias("pri_ci"), "n")
        .orderBy("pri_ci")
    )


@register(
    "fn_uuid5",
    """
    WITH h AS (
        SELECT c_custkey,
               md5('npc:customer:' || CAST(c_custkey AS VARCHAR)) AS hx
        FROM customer WHERE c_custkey <= 200
    )
    SELECT c_custkey,
           substring(hx, 1, 8) || '-' || substring(hx, 9, 4) || '-5'
           || substring(hx, 14, 3) || '-' || 'a' || substring(hx, 18, 3)
           || '-' || substring(hx, 21, 12) AS entity_uuid
    FROM h ORDER BY c_custkey
    """,
)
def fn_uuid5(spark, sf_dir):
    """Deterministic namespaced entity UUIDs (v5-style): mint a stable
    UUID for each customer from md5('namespace:key'), with version/
    variant nibbles pinned — the identity-minting step every
    entity-resolution pipeline needs, where `uuid()` (random, per-row,
    per-run) would break joins across runs, engines, and retries. The
    same (namespace, key) yields the same UUID forever, anywhere.

    Pure codegen string slicing over one md5 per row — zero shuffle,
    and the determinism is the entire point: the oracle mints the
    SAME UUIDs from the same recipe. (True RFC-4122 v5 uses SHA-1
    with binary namespaces; the md5-hex composition here keeps the
    cross-engine recipe auditable — the version nibble is pinned to
    '5' and variant to 'a' the same way.)
    """
    cust = load_table(spark, sf_dir, "customer")
    hx = F.md5(F.concat(F.lit("npc:customer:"), F.col("c_custkey").cast("string")))
    h = cust.where(F.col("c_custkey") <= 200).select(
        "c_custkey", hx.alias("hx")
    )
    uuid5 = F.concat(
        F.substring("hx", 1, 8), F.lit("-"),
        F.substring("hx", 9, 4), F.lit("-5"),
        F.substring("hx", 14, 3), F.lit("-a"),
        F.substring("hx", 18, 3), F.lit("-"),
        F.substring("hx", 21, 12),
    )
    return h.select("c_custkey", uuid5.alias("entity_uuid")).orderBy("c_custkey")


@register(
    "fn_string_transform",
    """
    SELECT c_custkey,
           translate(c_name, '#', '-') AS dashed,
           reverse(c_name) AS reversed,
           repeat(substring(c_name, 1, 4), 2) AS doubled_prefix,
           upper(substring(c_mktsegment, 1, 1))
               || lower(substring(c_mktsegment, 2)) AS segment_title
    FROM customer WHERE c_custkey <= 200
    ORDER BY c_custkey
    """,
)
def fn_string_transform(spark, sf_dir):
    """Remaining string-transform surface: `translate` (per-char
    mapping — THE sanitizer for separator normalization, orders of
    magnitude cheaper than regex), `reverse` (suffix-indexing trick:
    reverse + prefix-sort = suffix locality, see s_prefix_compression),
    `repeat`, and title-casing via initcap (fn_string_basic covers
    trim/pad/case; these are the structural transforms).

    initcap has no DuckDB counterpart, so the oracle composes it from
    upper/lower/substring — a recorded engine-surface divergence (the
    fn_round_modes pattern: the portability note IS part of the key's
    documentation). All are zero-shuffle codegen with scan pushdown.
    """
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.where(F.col("c_custkey") <= 200)
        .select(
            "c_custkey",
            F.translate("c_name", "#", "-").alias("dashed"),
            F.reverse("c_name").alias("reversed"),
            F.repeat(F.substring("c_name", 1, 4), 2).alias("doubled_prefix"),
            F.initcap(F.lower("c_mktsegment")).alias("segment_title"),
        )
        .orderBy("c_custkey")
    )
