"""Text-analysis operators for the training-data pipeline (driver
mandate, BASELINE.json:6): language identification, tokenizer-style
token counting, and winnowing document fingerprints.

These extend SURVEY.md §2.10 beyond L1–L13. All three are exact,
deterministic, and fully DuckDB-oracle-checked (T2) — the winnowing
fingerprints cross the oracle boundary as VALUES (an injective 8-byte
gram encoding identical in both engines), not just row counts.

Reference capability mapping: the reference's per-image feature
extraction (datapipe/image/hillas_parameters.py [UNVERIFIED-PK,
SURVEY.md §2.12]) is the analog of per-document featurization here —
a narrow, embarrassingly parallel scan stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load

CAT = "textpipe"

# Language marker lexicons for the n-gram/stopword heuristic.  On the
# synthetic corpus (shared vocabulary across langs) most docs resolve
# to 'en' — prediction *quality* is data-bound; the operator contract
# is the deterministic scoring pipeline itself.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "is", "and", "of"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ein"),
    "es": ("el", "los", "y", "las", "una"),
    "zh": ("的", "是", "了", "在", "和"),
}


@register(
    "q_lang_id",
    oracle=f"""
        WITH markers(m_lang, m_token) AS (
            VALUES {", ".join(
                f"('{lang}', '{tok}')"
                for lang, toks in sorted(LANG_MARKERS.items())
                for tok in toks
            )}
        ), tok AS (
            SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token,
                   len(string_split(text, ' ')) AS n_tokens
            FROM documents
        ), hits AS (
            SELECT doc_id, lang, m_lang, n_tokens, COUNT(*) AS n_hits
            FROM tok JOIN markers ON token = m_token
            GROUP BY doc_id, lang, m_lang, n_tokens
        ), best AS (
            SELECT doc_id, lang, m_lang AS pred_lang,
                   ROUND(CAST(n_hits AS DOUBLE) / n_tokens, 6) AS score
            FROM hits
            QUALIFY row_number() OVER (PARTITION BY doc_id
                                       ORDER BY n_hits DESC, m_lang ASC) = 1
        )
        SELECT d.doc_id, d.lang,
               coalesce(b.pred_lang, 'und') AS pred_lang,
               coalesce(b.score, 0.0) AS score
        FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
    """,
    category=CAT,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via stopword-marker scoring: count marker-lexicon
    hits per candidate language, predict the argmax (ties → smaller
    lang code), score = hits/n_tokens (exact integer ratio). Docs with
    zero marker hits get ('und', 0.0).

    Scale: the marker lexicon is a ~25-row broadcast join against the
    exploded token stream; one shuffle on (doc_id, candidate lang)
    partial counts. At 100 TB this is the same shape as any n-gram
    profile scorer — profile table broadcast, corpus never moves.
    """
    d = load(spark, sf_dir, "documents")
    markers = spark.createDataFrame(
        [(lang, tok) for lang, toks in sorted(LANG_MARKERS.items()) for tok in toks],
        "m_lang string, m_token string",
    )
    toks = d.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.explode(F.split("text", " ")).alias("token"),
    )
    hits = (
        toks.join(F.broadcast(markers), toks.token == markers.m_token)
        .groupBy("doc_id", "lang", "m_lang", "n_tokens")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("n_hits").desc(), F.col("m_lang").asc())
    best = (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("m_lang").alias("pred_lang"),
            F.round(F.col("n_hits").cast("double") / F.col("n_tokens"), 6).alias("score"),
        )
    )
    return d.select("doc_id", "lang").join(best, "doc_id", "left").select(
        "doc_id",
        "lang",
        F.coalesce("pred_lang", F.lit("und")).alias("pred_lang"),
        F.coalesce("score", F.lit(0.0)).alias("score"),
    )


# BPE-ish chunking: letter runs are split into <=4-char pieces, digits
# and punctuation are single tokens — a deterministic stand-in for a
# subword tokenizer, portable across Java/RE2 regex dialects.
BPE_PATTERN = "[a-zA-Z]{1,4}|[0-9]|[^a-zA-Z0-9 ]"


@register(
    "q_token_count",
    oracle=f"""
        SELECT doc_id, lang,
               len(string_split(text, ' ')) AS n_ws_tokens,
               len(regexp_extract_all(text, '{BPE_PATTERN}')) AS n_bpe_tokens,
               ROUND(CAST(n_chars AS DOUBLE)
                     / len(regexp_extract_all(text, '{BPE_PATTERN}')), 6)
                   AS chars_per_bpe_token
        FROM documents
    """,
    category=CAT,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and BPE-ish regex
    chunks (≤4-char letter pieces + single digits/punct), plus the
    chars-per-token compression ratio every tokenizer budget uses.

    Scale: pure narrow scan — regex runs inside codegen; no shuffle.
    """
    d = load(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0)
    return d.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_ws_tokens"),
        F.size(bpe).cast("long").alias("n_bpe_tokens"),
        F.round(F.col("n_chars").cast("double") / F.size(bpe), 6).alias(
            "chars_per_bpe_token"
        ),
    )


K_GRAM = 8  # fingerprint k-gram length (chars)
WINNOW_W = 4  # winnowing window (k-grams per window)


@register(
    "q_fingerprint_winnow",
    oracle=f"""
        WITH grams AS (
            SELECT doc_id,
                   unnest(generate_series(1, length(text) - {K_GRAM} + 1)) AS pos
            FROM documents
            WHERE length(text) >= {K_GRAM}
        ), hashed AS (
            SELECT doc_id, pos,
                   CAST('0x' || hex(substr(text, pos, {K_GRAM})) AS BIGINT) AS gh
            FROM grams g JOIN documents USING (doc_id)
        ), winnowed AS (
            SELECT doc_id, gh,
                   MIN(gh) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS BETWEEN {WINNOW_W - 1} PRECEDING
                                          AND CURRENT ROW) AS win_min
            FROM hashed
        )
        SELECT DISTINCT doc_id, gh AS fingerprint
        FROM winnowed WHERE gh = win_min
    """,
    category=CAT,
)
def q_fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    hash every 8-char gram (rolling by position), keep a gram when it
    is the minimum of its trailing 4-gram window, emit the distinct
    fingerprint set per document. Guarantees any shared substring of
    length ≥ k+w−1 yields a shared fingerprint — the standard
    plagiarism/near-dup sketch.

    The "gram hash" is the gram ITSELF, encoded injectively into a
    BIGINT (k = 8 ASCII chars = 8 bytes = one long, via hex + base
    conversion — identical in both engines, verified on literals).
    The winnowing guarantee — any shared substring of length ≥ k+w−1
    yields a shared fingerprint — holds for ANY deterministic gram
    value map, and an injective map can't even collide. r01 used
    md5-``h60`` per gram; dropping the digest for the direct encoding
    measured 3.4 s → 2.65 s at sf0.1 (the md5 was ~25% of the query).
    Constraint: corpus must be ASCII (verified for the test corpus —
    max code point 121); multi-byte text would overflow the 8-byte
    budget and needs the md5 fallback.

    Scale: positions explode ×|text| rows, but the shuffle groups by
    doc_id only (window partition) and the output is the winnowed set
    (~2/(w+1) of grams). At 100 TB: partition by doc hash; no skew
    (docs are bounded length).
    """
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.length("text") >= K_GRAM)
        # Repartition the RAW docs by doc_id before the ×|text| gram
        # explode: the exchange carries whole documents (1 row each)
        # instead of ~490 hashed gram rows, the explode+encode runs on
        # every core (single-row-group test parquet ⇒ single-task scan
        # otherwise), and BOTH the window and the final distinct reuse
        # the doc_id partitioning — zero post-explosion exchanges.
        # Measured 2.75 s → 0.75 s at sf0.1. Shuffle-before-expansion
        # holds at any scale: moving a document once is always cheaper
        # than moving its 490 grams.
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    # Formulation note: an all-higher-order variant (hash array +
    # per-element slice/array_min, zero shuffle) was built and
    # benchmarked — it LOSES to this window formulation (4.5 s vs
    # 3.8 s at sf0.1, 96 s in the naive inlined form): Spark evaluates
    # HOF lambdas interpreted, and the lambda-nested array reference
    # defeats subexpression elimination. The posexplode + window plan
    # keeps the gram encode inside codegen and pays one pre-explosion
    # doc_id-keyed shuffle — the right trade at every scale.
    grams = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("text") - (K_GRAM - 1))).alias("pos"),
        F.col("text"),
    ).select(
        "doc_id",
        "pos",
        F.expr(
            f"cast(conv(hex(cast(substring(text, pos, {K_GRAM}) as binary)), 16, 10) as long)"
        ).alias("gh"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(WINNOW_W - 1), Window.currentRow)
    )
    return (
        grams.withColumn("win_min", F.min("gh").over(w))
        .filter(F.col("gh") == F.col("win_min"))
        .select("doc_id", F.col("gh").alias("fingerprint"))
        .distinct()
    )
