"""PII redaction, URL parsing, markup stripping, and sentence
segmentation — the normalization passes a crawl→training-data
pipeline runs BEFORE quality filtering and dedup (SURVEY.md §2.11b
extends; complements textpipe.py's scoring ops).

The test corpus is synthetic word-salad with no real PII/markup/URLs,
so each op first CONSTRUCTS its haystack deterministically from table
columns (emails from customer keys, URLs from document metadata, tags
wrapped around document text) and then runs the real extraction
machinery — regexp_extract_all / parse_url / regexp_replace — on it.
Both engines build the identical haystack, so the oracle checks the
extraction itself, not the synthesis. Regex patterns are restricted
to the Java-regex ∩ RE2 common subset (no lookaround, no backrefs):
character classes, bounded repetition, alternation, anchors.

Scale notes (100 TB):
- All four ops are narrow per-row maps (regex over one string column)
  followed by one hash aggregation on a low-cardinality key — the
  shuffle carries only the per-group partials. Regex evaluation stays
  inside whole-stage codegen (Java regex on the JVM), no Python.
- Redaction at real scale is the same shape: per-row regexes are
  embarrassingly parallel; the only shuffle is whatever grouping the
  report needs. Pattern lists longer than a handful of regexes should
  be combined into one alternation per pass (one automaton scan per
  row, not one per pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load
from .common import h60, o_h60

CAT = "textclean"

_P = 1_000_000_007  # checksum modulus: keeps SUM(h60 % _P) < 2^63 at any sf

# Java-regex ∩ RE2 portable patterns
_RE_EMAIL = "[A-Za-z0-9._]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_RE_IP = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
_RE_PHONE = "\\b555-\\d{4}\\b"
_RE_TAG = "<[^>]+>"


@register(
    "q_pii_redact",
    oracle=f"""
        WITH raw AS (
            SELECT c_mktsegment,
                   'reach user' || c_custkey || '@'
                     || lower(replace(c_mktsegment, ' ', '')) || '.example.com'
                     || ' or call 555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
                     || ' from 10.' || (c_nationkey % 25) || '.'
                     || (c_custkey % 256) || '.7 re ' || c_name AS msg
            FROM customer
        ), red AS (
            SELECT c_mktsegment,
                   len(regexp_extract_all(msg, '{_RE_EMAIL}'))  AS n_email,
                   len(regexp_extract_all(msg, '{_RE_IP}'))     AS n_ip,
                   len(regexp_extract_all(msg, '{_RE_PHONE}'))  AS n_phone,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(msg, '{_RE_EMAIL}', '[EMAIL]', 'g'),
                       '{_RE_IP}', '[IP]', 'g'),
                     '{_RE_PHONE}', '[PHONE]', 'g') AS redacted
            FROM raw
        )
        SELECT c_mktsegment,
               COUNT(*) AS n_msgs,
               CAST(SUM(n_email) AS BIGINT) AS emails_found,
               CAST(SUM(n_ip) AS BIGINT) AS ips_found,
               CAST(SUM(n_phone) AS BIGINT) AS phones_found,
               CAST(SUM({o_h60('redacted')} % {_P}) AS BIGINT) AS redacted_checksum
        FROM red
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    category=CAT,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PI1: PII detection + masking. Synthesizes a contact blurb per
    customer (email, phone, IPv4 embedded in prose), then counts and
    masks each PII class with portable regexes, reporting per-segment
    detection counts and a checksum of the redacted text.

    The checksum is the oracle's teeth: a mask that eats a character
    too many/few, or a regex that matches a different span in either
    engine, shifts h60(redacted) and fails the value hash.

    Scale: pure narrow map + one small-key hash agg. The three
    sequential regexp_replace passes are how real redactors chain
    pattern classes; at 100 TB each pass is a codegen'd automaton
    scan, no shuffle until the final per-segment partials.
    """
    c = load(spark, sf_dir, "customer")
    msg = F.concat(
        F.lit("reach user"),
        F.col("c_custkey").cast("string"),
        F.lit("@"),
        F.lower(F.regexp_replace("c_mktsegment", " ", "")),
        F.lit(".example.com or call 555-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."),
        (F.col("c_nationkey") % 25).cast("string"),
        F.lit("."),
        (F.col("c_custkey") % 256).cast("string"),
        F.lit(".7 re "),
        F.col("c_name"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("msg"), _RE_EMAIL, "[EMAIL]"),
            _RE_IP,
            "[IP]",
        ),
        _RE_PHONE,
        "[PHONE]",
    )
    red = c.select(
        "c_mktsegment",
        F.size(F.regexp_extract_all(msg, F.lit(_RE_EMAIL), F.lit(0))).alias("n_email"),
        F.size(F.regexp_extract_all(msg, F.lit(_RE_IP), F.lit(0))).alias("n_ip"),
        F.size(F.regexp_extract_all(msg, F.lit(_RE_PHONE), F.lit(0))).alias("n_phone"),
        msg.alias("msg"),
    ).withColumn("redacted", redacted)
    return (
        red.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_msgs"),
            F.sum("n_email").cast("long").alias("emails_found"),
            F.sum("n_ip").cast("long").alias("ips_found"),
            F.sum("n_phone").cast("long").alias("phones_found"),
            F.sum(h60("redacted") % _P).cast("long").alias("redacted_checksum"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q_url_parse",
    oracle="""
        WITH u AS (
            SELECT doc_id, lang, source,
                   'https://' || source || '.example.com/' || lang
                     || '/doc' || doc_id || '?ref=' || source
                     || '&page=' || (doc_id % 7) AS url
            FROM documents
        ), parsed AS (
            SELECT regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
                   regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1) AS path,
                   regexp_extract(url, '[?&]page=(\\d+)', 1) AS page
            FROM u
        )
        SELECT host,
               COUNT(*) AS n_urls,
               COUNT(DISTINCT path) AS n_paths,
               CAST(SUM(CAST(page AS BIGINT)) AS BIGINT) AS page_sum
        FROM parsed
        GROUP BY host
        ORDER BY host
    """,
    category=CAT,
)
def q_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PI2: URL decomposition — host / path / query-param extraction,
    then a per-host rollup (the crawl-pipeline "domain table" that
    feeds q_domain_quota's quotas). Spark side uses the REAL
    `parse_url` built-in (HOST / PATH / QUERY:key); the oracle states
    the same decomposition as portable regexes — so this also pins
    parse_url's semantics against an independent spec.

    Scale: narrow map + agg on host (bounded cardinality ≈ #domains).
    At 100 TB hosts are Zipf-skewed; the COUNT/SUM partials combine
    map-side so the skew never concentrates rows, only partials.
    """
    d = load(spark, sf_dir, "documents")
    u = d.select(
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/"),
            F.col("lang"),
            F.lit("/doc"),
            F.col("doc_id").cast("string"),
            F.lit("?ref="),
            F.col("source"),
            F.lit("&page="),
            (F.col("doc_id") % 7).cast("string"),
        ).alias("url")
    )
    parsed = u.select(
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("page")).alias("page"),
    )
    return (
        parsed.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("path").alias("n_paths"),
            F.sum(F.col("page").cast("long")).cast("long").alias("page_sum"),
        )
        .orderBy("host")
    )


@register(
    "q_html_strip",
    oracle=f"""
        WITH m AS (
            SELECT doc_id, lang, text,
                   '<html><body><p id="d' || doc_id || '">'
                     || replace(text, ' data ', ' <b>data</b> ')
                     || '</p><br/></body></html>' AS markup
            FROM documents
        ), s AS (
            SELECT lang, text,
                   len(regexp_extract_all(markup, '{_RE_TAG}')) AS n_tags,
                   regexp_replace(markup, '{_RE_TAG}', '', 'g') AS stripped
            FROM m
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tags) AS BIGINT) AS tags_removed,
               CAST(SUM(CASE WHEN stripped = text THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_lossless,
               CAST(SUM({o_h60('stripped')} % {_P}) AS BIGINT) AS stripped_checksum
        FROM s
        GROUP BY lang
        ORDER BY lang
    """,
    category=CAT,
)
def q_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PI3: markup stripping — wrap each document in deterministic
    HTML (outer scaffold + inline <b> tags around a frequent word),
    strip every tag with the classic `<[^>]+>` pass, and verify
    losslessness: stripping must reproduce the original text EXACTLY
    (`n_lossless == n_docs`), because tags were all that was added.

    That reconstruction check is what real boilerplate strippers want
    and rarely test: the strip must remove markup and ONLY markup.

    Scale: narrow map; the only shuffle is the 5-key lang rollup.
    """
    d = load(spark, sf_dir, "documents")
    m = d.select(
        "lang",
        "text",
        F.concat(
            F.lit('<html><body><p id="d'),
            F.col("doc_id").cast("string"),
            F.lit('">'),
            F.regexp_replace("text", " data ", " <b>data</b> "),
            F.lit("</p><br/></body></html>"),
        ).alias("markup"),
    )
    s = m.select(
        "lang",
        "text",
        F.size(F.regexp_extract_all("markup", F.lit(_RE_TAG), F.lit(0))).alias(
            "n_tags"
        ),
        F.regexp_replace("markup", _RE_TAG, "").alias("stripped"),
    )
    return (
        s.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tags").cast("long").alias("tags_removed"),
            F.sum(F.when(F.col("stripped") == F.col("text"), 1).otherwise(0))
            .cast("long")
            .alias("n_lossless"),
            F.sum(h60("stripped") % _P).cast("long").alias("stripped_checksum"),
        )
        .orderBy("lang")
    )


@register(
    "q_sentence_stats",
    oracle=f"""
        WITH p AS (
            SELECT doc_id, lang,
                   replace(text, ' table ', '. ') AS paragraph
            FROM documents
        ), s AS (
            SELECT lang,
                   string_split_regex(paragraph, '\\. ') AS sentences
            FROM p
        ), f AS (
            SELECT lang,
                   len(sentences) AS n_sentences,
                   len(string_split(sentences[1], ' ')) AS first_words,
                   sentences[1] AS first_sentence
            FROM s
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_sentences) AS BIGINT) AS total_sentences,
               CAST(SUM(first_words) AS BIGINT) AS total_first_words,
               CAST(SUM({o_h60('first_sentence')} % {_P}) AS BIGINT)
                 AS first_checksum
        FROM f
        GROUP BY lang
        ORDER BY lang
    """,
    category=CAT,
)
def q_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PI4: sentence segmentation — derive sentence boundaries (a
    deterministic '. ' injection stands in for real punctuation, since
    the corpus is unpunctuated word-salad), split on the boundary
    regex, and profile per-language sentence counts, first-sentence
    length, and a first-sentence checksum.

    Exercises regex-split parity: Spark `split` (Java regex) vs
    DuckDB `string_split_regex` (RE2) must fragment identically —
    including the no-trailing-separator edge.

    Scale: narrow map (split allocates per-row arrays but they die
    within the stage — only 4 small aggregates reach the shuffle).
    """
    d = load(spark, sf_dir, "documents")
    p = d.select(
        "lang", F.regexp_replace("text", " table ", ". ").alias("paragraph")
    )
    # NB regexp_replace with a literal-safe pattern: ' table ' has no
    # metacharacters, so it equals DuckDB's literal replace().
    s = p.select("lang", F.split("paragraph", "\\. ").alias("sentences"))
    f = s.select(
        "lang",
        F.size("sentences").alias("n_sentences"),
        F.size(F.split(F.col("sentences")[0], " ")).alias("first_words"),
        F.col("sentences")[0].alias("first_sentence"),
    )
    return (
        f.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_sentences").cast("long").alias("total_sentences"),
            F.sum("first_words").cast("long").alias("total_first_words"),
            F.sum(h60("first_sentence") % _P).cast("long").alias("first_checksum"),
        )
        .orderBy("lang")
    )


@register(
    "q_url_dedup",
    oracle=f"""
        WITH u AS (
            SELECT doc_id, source,
                   CASE WHEN doc_id % 3 = 0
                        THEN 'https://' || upper(source)
                             || '.EXAMPLE.com:443/' || lang || '/doc'
                             || doc_id || '?utm_source=feed&ref=' || source
                        ELSE 'https://' || source || '.example.com/'
                             || lang || '/doc' || doc_id END AS url
            FROM documents
        ),
        canon AS (
            SELECT doc_id, source,
                   lower(regexp_extract(url, '^https?://([^/?#]+?)(:\\d+)?/',
                                        1))
                     || regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1)
                     AS curl
            FROM u
        ),
        dedup AS (
            SELECT curl, COUNT(*) AS n_variants, MIN(doc_id) AS keep_doc
            FROM canon GROUP BY curl
        )
        SELECT c.source,
               CAST(COUNT(*) AS BIGINT) AS n_urls,
               CAST(COUNT(DISTINCT c.curl) AS BIGINT) AS n_canonical,
               CAST(SUM({o_h60('c.curl')} % {_P}) AS BIGINT) AS canon_checksum
        FROM canon c
        GROUP BY c.source
        ORDER BY c.source
    """,
    category=CAT,
)
def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PI5: URL canonicalization dedup — the crawl-frontier dedup step.
    A third of the synthesized URLs carry the classic noise (uppercase
    host, explicit :443 port, tracking query params); canonicalization
    lowercases the host, strips the port and drops the query, so noisy
    variants collapse onto their clean twins. Reports per-source raw
    vs canonical counts and a canonical-form checksum.

    Determinism: pure regex + lowercase string algebra, identical
    Java-regex/RE2 patterns; checksum pins the exact canonical
    strings, not just the counts.

    Scale: canonicalization is scan-side; the dedup count is one
    map-side-combined agg on the canonical key. A real frontier keeps
    (canonical_url → min crawl date) exactly like the keep_doc pick
    here — same shuffle, hash-partitioned on the canonical hash.
    """
    d = load(spark, sf_dir, "documents")
    noisy = F.concat(
        F.lit("https://"),
        F.upper("source"),
        F.lit(".EXAMPLE.com:443/"),
        F.col("lang"),
        F.lit("/doc"),
        F.col("doc_id").cast("string"),
        F.lit("?utm_source=feed&ref="),
        F.col("source"),
    )
    clean = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/doc"),
        F.col("doc_id").cast("string"),
    )
    u = d.select(
        "doc_id",
        "source",
        F.when(F.col("doc_id") % 3 == 0, noisy).otherwise(clean).alias("url"),
    )
    curl = F.concat(
        F.lower(
            F.regexp_extract("url", "^https?://([^/?#]+?)(:\\d+)?/", 1)
        ),
        F.regexp_extract("url", "^https?://[^/?#]+([^?#]*)", 1),
    )
    canon = u.select("doc_id", "source", curl.alias("curl"))
    return (
        canon.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("curl").alias("n_canonical"),
            F.sum(h60("curl") % _P).cast("long").alias("canon_checksum"),
        )
        .orderBy("source")
    )


@register(
    "q_gdpr_erasure",
    oracle="""
        WITH del AS (
            SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0
        ),
        cust_after AS (
            SELECT c.* FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM del d
                              WHERE d.c_custkey = c.c_custkey)
        ),
        ord_after AS (
            SELECT o.* FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM del d
                              WHERE d.c_custkey = o.o_custkey)
        ),
        li_after AS (
            SELECT l.* FROM lineitem l
            WHERE EXISTS (SELECT 1 FROM ord_after o
                          WHERE o.o_orderkey = l.l_orderkey)
        ),
        orphans AS (
            SELECT COUNT(*) AS n FROM ord_after o
            WHERE NOT EXISTS (SELECT 1 FROM cust_after c
                              WHERE c.c_custkey = o.o_custkey)
        )
        SELECT CAST((SELECT COUNT(*) FROM del) AS BIGINT) AS n_subjects,
               CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS cust_before,
               CAST((SELECT COUNT(*) FROM cust_after) AS BIGINT) AS cust_after,
               CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS orders_before,
               CAST((SELECT COUNT(*) FROM ord_after) AS BIGINT) AS orders_after,
               CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS lines_before,
               CAST((SELECT COUNT(*) FROM li_after) AS BIGINT) AS lines_after,
               CAST((SELECT n FROM orphans) AS BIGINT) AS n_orphans
    """,
    category=CAT,
)
def q_gdpr_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PI6: right-to-be-forgotten propagation — given a deletion list
    of data subjects, erase them from the entity table and CASCADE
    through every fact referencing them (orders by custkey, line items
    by orderkey), then PROVE referential cleanliness: zero surviving
    facts reference a deleted subject (n_orphans must be 0). The
    before/after census per table is the audit artifact a DPO files.

    Scale: each cascade level is one LEFT ANTI (or LEFT SEMI) join —
    the deletion list is tiny and broadcasts; the facts never shuffle.
    Deeper reference chains are just more semi-join levels. In a
    lakehouse the anti-join feeds a partition rewrite of only the
    touched partitions (q_dynamic_overwrite's move).
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    dele = c.filter(F.col("c_custkey") % 97 == 0).select("c_custkey")
    cust_after = c.join(F.broadcast(dele), "c_custkey", "left_anti")
    ord_after = o.join(
        F.broadcast(dele),
        o.o_custkey == dele.c_custkey,
        "left_anti",
    )
    li_after = li.join(
        ord_after.select("o_orderkey"),
        li.l_orderkey == F.col("o_orderkey"),
        "left_semi",
    )
    orphans = ord_after.join(
        cust_after.select("c_custkey"),
        ord_after.o_custkey == F.col("c_custkey"),
        "left_anti",
    )
    counts = [
        dele.agg(F.count(F.lit(1)).alias("n_subjects")),
        c.agg(F.count(F.lit(1)).alias("cust_before")),
        cust_after.agg(F.count(F.lit(1)).alias("cust_after")),
        o.agg(F.count(F.lit(1)).alias("orders_before")),
        ord_after.agg(F.count(F.lit(1)).alias("orders_after")),
        li.agg(F.count(F.lit(1)).alias("lines_before")),
        li_after.agg(F.count(F.lit(1)).alias("lines_after")),
        orphans.agg(F.count(F.lit(1)).alias("n_orphans")),
    ]
    out = counts[0]
    for x in counts[1:]:
        out = out.crossJoin(x)
    return out


@register(
    "q_k_anonymity",
    oracle="""
        WITH qi AS (
            SELECT c_mktsegment,
                   CAST(c_nationkey // 5 AS BIGINT) AS region_bucket,
                   CAST(LEAST(floor((c_acctbal + 1000) / 2000), 5) AS BIGINT)
                       AS balance_band,
                   COUNT(*) AS grp_n
            FROM customer
            GROUP BY 1, 2, 3
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(CASE WHEN grp_n < 5 THEN 1 ELSE 0 END) AS BIGINT)
                   AS groups_below_k,
               CAST(SUM(CASE WHEN grp_n < 5 THEN grp_n ELSE 0 END) AS BIGINT)
                   AS rows_at_risk,
               CAST(MIN(grp_n) AS BIGINT) AS min_group,
               round(CAST(SUM(CASE WHEN grp_n < 5 THEN grp_n ELSE 0 END)
                          AS DOUBLE) / SUM(grp_n), 6) AS risk_fraction
        FROM qi
    """,
    category=CAT,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PI7: k-anonymity audit (k=5) over the quasi-identifier tuple
    (segment, region bucket, balance band) — counts equivalence
    classes smaller than k and the rows they expose. The release gate
    for any dataset with indirect identifiers: rows_at_risk > 0 means
    generalize the bands further or suppress those rows before
    publishing (Sweeney 2002).

    Scale: one map-side-combined group-by on the quasi-identifier
    tuple, then algebra on the bounded class frame. The audit of a
    100 TB table costs one scan regardless of k or the QI arity.
    """
    c = load(spark, sf_dir, "customer")
    qi = c.groupBy(
        "c_mktsegment",
        F.expr("c_nationkey div 5").cast("long").alias("region_bucket"),
        F.least(F.floor((F.col("c_acctbal") + 1000) / 2000), F.lit(5))
        .cast("long")
        .alias("balance_band"),
    ).agg(F.count(F.lit(1)).alias("grp_n"))
    return qi.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("grp_n") < 5, 1).otherwise(0))
        .cast("long")
        .alias("groups_below_k"),
        F.sum(F.when(F.col("grp_n") < 5, F.col("grp_n")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
        F.min("grp_n").cast("long").alias("min_group"),
        F.round(
            F.sum(F.when(F.col("grp_n") < 5, F.col("grp_n")).otherwise(0)).cast(
                "double"
            )
            / F.sum("grp_n"),
            6,
        ).alias("risk_fraction"),
    )


@register(
    "q_cidr_lookup",
    oracle="""
        WITH ips AS (
            SELECT c_custkey,
                   CAST(10 * 16777216 + (c_nationkey % 25) * 65536
                        + (c_custkey % 256) * 256 + 7 AS BIGINT) AS ip_int,
                   c_nationkey % 25 AS nat
            FROM customer
        ),
        blocks AS (
            SELECT 'block_' || r AS block,
                   CAST(10 * 16777216 + (5 * r) * 65536 AS BIGINT) AS lo,
                   CAST(10 * 16777216
                        + (5 * r + CASE WHEN r = 4 THEN 4 ELSE 5 END) * 65536
                        - 1 AS BIGINT) AS hi
            FROM (SELECT unnest(generate_series(0, 4)) AS r)
        )
        SELECT COALESCE(b.block, 'unallocated') AS block,
               CAST(COUNT(*) AS BIGINT) AS n_ips,
               CAST(COUNT(DISTINCT i.nat) AS BIGINT) AS n_nations,
               CAST(MIN(i.ip_int) AS BIGINT) AS min_ip,
               CAST(MAX(i.ip_int) AS BIGINT) AS max_ip
        FROM ips i LEFT JOIN blocks b
          ON i.ip_int BETWEEN b.lo AND b.hi
        GROUP BY 1
        ORDER BY 1
    """,
    category=CAT,
)
def q_cidr_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PI8: CIDR-block enrichment — the IP-geolocation join: numeric
    IPs matched into address blocks by RANGE containment (ip BETWEEN
    block start AND end), left-outer so unallocated space surfaces
    explicitly (the last block is deliberately one /16 short, so
    nation-24 IPs land in 'unallocated'). The enrichment-join shape
    behind every geo/ASN/threat-intel lookup.

    Scale: the block table is small and broadcasts — the range
    predicate rides a broadcast nested-loop that never shuffles the
    fact. Million-block tables (full GeoIP) get bucketed by high
    octets first (equi-join on the bucket + range refine) — the
    standard interval-bucketing trick, same one q_join_interval
    documents.
    """
    c = load(spark, sf_dir, "customer")
    ips = c.select(
        "c_custkey",
        (
            F.lit(10 * 16777216)
            + (F.col("c_nationkey") % 25) * 65536
            + (F.col("c_custkey") % 256) * 256
            + 7
        )
        .cast("long")
        .alias("ip_int"),
        (F.col("c_nationkey") % 25).alias("nat"),
    )
    r = spark.range(5).select(F.col("id").cast("int").alias("r"))
    blocks = r.select(
        F.concat(F.lit("block_"), F.col("r").cast("string")).alias("block"),
        (F.lit(10 * 16777216) + (5 * F.col("r")) * 65536)
        .cast("long")
        .alias("lo"),
        (
            F.lit(10 * 16777216)
            + (5 * F.col("r") + F.when(F.col("r") == 4, 4).otherwise(5))
            * 65536
            - 1
        )
        .cast("long")
        .alias("hi"),
    )
    j = ips.join(
        F.broadcast(blocks),
        (F.col("ip_int") >= F.col("lo")) & (F.col("ip_int") <= F.col("hi")),
        "left",
    )
    return (
        j.groupBy(F.coalesce("block", F.lit("unallocated")).alias("block"))
        .agg(
            F.count(F.lit(1)).alias("n_ips"),
            F.countDistinct("nat").alias("n_nations"),
            F.min("ip_int").cast("long").alias("min_ip"),
            F.max("ip_int").cast("long").alias("max_ip"),
        )
        .orderBy("block")
    )


@register(
    "q_l_diversity",
    oracle="""
        WITH qi AS (
            SELECT o.o_orderkey, o.o_orderpriority,
                   c.c_mktsegment,
                   CAST(c.c_nationkey // 5 AS BIGINT) AS region_bucket,
                   CAST(LEAST(floor((c.c_acctbal + 1000) / 2000), 5) AS BIGINT)
                       AS balance_band
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ), classes AS (
            SELECT c_mktsegment, region_bucket, balance_band,
                   COUNT(*) AS class_rows,
                   COUNT(DISTINCT o_orderpriority) AS l
            FROM qi GROUP BY 1, 2, 3
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(MIN(l) AS BIGINT) AS min_l,
               CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
                   AS classes_below_l,
               CAST(SUM(CASE WHEN l < 3 THEN class_rows ELSE 0 END) AS BIGINT)
                   AS rows_at_risk,
               round(CAST(SUM(l * class_rows) AS DOUBLE) / SUM(class_rows), 6)
                   AS weighted_mean_l
        FROM classes
    """,
    category=CAT,
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PI9: l-diversity audit (l=3) — the companion gate to PI7's
    k-anonymity (Machanavajjhala 2007): a class can be k-anonymous
    yet leak its sensitive value when every member shares it. Using
    PI7's quasi-identifier tuple and order priority as the sensitive
    attribute, count equivalence classes whose sensitive-value
    diversity falls below l and the fact rows they expose.

    Scale: one fact⋈dimension join (customer broadcasts or co-keys
    on custkey), then a two-level aggregate — class grain first
    (COUNT DISTINCT shuffles on class+value with map-side dedup),
    then algebra on the bounded class frame. Same one-scan audit
    cost shape as PI7 regardless of table size.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    qi = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderpriority",
        "c_mktsegment",
        F.expr("c_nationkey div 5").cast("long").alias("region_bucket"),
        F.least(F.floor((F.col("c_acctbal") + 1000) / 2000), F.lit(5))
        .cast("long")
        .alias("balance_band"),
    )
    classes = qi.groupBy("c_mktsegment", "region_bucket", "balance_band").agg(
        F.count(F.lit(1)).alias("class_rows"),
        F.countDistinct("o_orderpriority").alias("l"),
    )
    return classes.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.min("l").cast("long").alias("min_l"),
        F.sum(F.when(F.col("l") < 3, 1).otherwise(0))
        .cast("long")
        .alias("classes_below_l"),
        F.sum(F.when(F.col("l") < 3, F.col("class_rows")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
        F.round(
            F.sum(F.col("l") * F.col("class_rows")).cast("double")
            / F.sum("class_rows"),
            6,
        ).alias("weighted_mean_l"),
    )


# --- round-7 addition: differentially-private release counts ----------------

# Two-sided geometric (discrete Laplace) mechanism, alpha = 1/2
# (epsilon = ln 2 for sensitivity-1 counts), truncated at |k| <= 8 and
# renormalized. The inverse CDF is pre-quantized to 20-bit integer
# thresholds computed EXACTLY (fractions) at import — both engines
# evaluate the identical integer CASE chain, so the mechanism is
# bit-portable with no transcendental math in either plan.
def _geom_thresholds() -> list[tuple[int, int]]:
    from fractions import Fraction

    half = Fraction(1, 2)
    mass = {k: half ** abs(k) for k in range(-8, 9)}
    total = sum(mass.values())
    acc = Fraction(0)
    out = []
    for k in range(-8, 9):
        acc += mass[k] / total
        out.append((k, round(acc * (1 << 20))))
    return out


_GEOM = _geom_thresholds()
DP_MOD = 1 << 20
# DEFAULT seed prefix for the per-cell noise draw. q_dp_counts reads
# the effective seed from ``spark.conf`` (key DP_SEED_CONF, VERDICT
# r08 #6) so a deployment can inject a per-release SECRET without a
# code edit — the release is private IFF that seed is secret. With
# the default (this PUBLIC constant, what the driver harness sees),
# the noise is recomputable from the released cell keys and the
# release is NOT private; it is, however, reproducible and
# oracle-checkable, which is what the parity gate needs.
DP_SEED = "pi10-public-demo-seed"
DP_SEED_CONF = "spark.data_pipeline_standalone_scripts.dp.seed"


def _dp_noise_spark(u):  # u: int64 Column in [0, 2^20)
    expr = F.lit(_GEOM[-1][0])
    for k, t in reversed(_GEOM[:-1]):
        expr = F.when(u < t, k).otherwise(expr)
    return expr


_DP_NOISE_SQL_CASE = (
    "CASE "
    + " ".join(f"WHEN u < {t} THEN ({k})" for k, t in _GEOM[:-1])
    + f" ELSE ({_GEOM[-1][0]}) END"
)


@register(
    "q_dp_counts",
    oracle=f"""
        WITH cells AS (
            SELECT event_type,
                   strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ), noised AS (
            SELECT event_type, day, n,
                   {o_h60(f"'{DP_SEED}' || '|' || event_type || '|' || day")}
                       % {DP_MOD} AS u
            FROM cells
        )
        SELECT event_type, day,
               CAST(GREATEST(0, n + {_DP_NOISE_SQL_CASE}) AS BIGINT)
                   AS noisy_n
        FROM noised
    """,
    category=CAT,
)
def q_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PI10: DP-count-release MECHANISM (private IFF the configured
    seed is secret; the default is public — see below) — daily event-type
    counts protected by the two-sided geometric (discrete Laplace)
    mechanism at epsilon = ln 2, the integer-valued mechanism actually
    deployed for count queries (Ghosh–Roughgarden–Sundararajan: it is
    universally utility-optimal for counts, and it never emits the
    impossible fractional counts continuous Laplace would). Noise is
    drawn per released cell, truncated at ±8 (the tail beyond is
    < 2^-8 mass) and clamped at zero.

    PRIVATE IFF THE SEED IS SECRET: the "draw" is a deterministic
    20-bit hash of seed || cell key fed through the EXACT quantized
    inverse CDF (integer thresholds computed with rational arithmetic
    at import, identical CASE chain in both engines). The seed is
    read from ``spark.conf`` under DP_SEED_CONF (r9, VERDICT r08 #6)
    so a deployment injects a per-release SECRET via configuration —
    turning the hash into a keyed PRF over the same thresholds,
    exactly how seeded DP releases are implemented. The DEFAULT is
    the PUBLIC module constant DP_SEED (what the parity harness
    runs), under which the noise is recomputable and the release is
    NOT private — but reproducible and oracle-checkable.

    Scale: one map-combinable aggregation over the fact table, then a
    per-cell scalar transform — the noise CASE is codegen, no Python,
    no second pass. Output is |event_type| x |days| cells.
    """
    seed = spark.conf.get(DP_SEED_CONF, DP_SEED)
    e = load(spark, sf_dir, "events")
    cells = e.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    # u is materialized in its own projection so the md5 evaluates
    # once, not once per CASE branch (CSE-independent).
    noised = cells.withColumn(
        "u",
        F.pmod(
            h60(F.concat_ws("|", F.lit(seed), F.col("event_type"), F.col("day"))),
            F.lit(DP_MOD),
        ),
    )
    return noised.select(
        "event_type",
        "day",
        F.greatest(F.lit(0), F.col("n") + _dp_noise_spark(F.col("u")))
        .cast("long")
        .alias("noisy_n"),
    )
