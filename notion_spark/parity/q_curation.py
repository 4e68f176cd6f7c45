"""Training-data curation (decontamination, PII, sampling) + entry_query.

Split from parity.py (r11); oracle text moved byte-identical.
"""

from notion_spark.parity._base import *  # noqa: F401,F403

# =====================================================================
# Training-data curation (decontamination, PII, sampling, repetition)
# =====================================================================


@register(
    "curation_decontam",
    r"""
    WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                  FROM documents WHERE text IS NOT NULL),
    gr AS (SELECT doc_id,
                  unnest(list_distinct([concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4])
                                        for i in range(1, greatest(len(t) - 4, 0) + 1)])) AS gram
           FROM toks)
    SELECT c.doc_id, COUNT(*) AS shared_grams
    FROM (SELECT * FROM gr WHERE doc_id >= 20) c
    JOIN (SELECT DISTINCT gram FROM gr WHERE doc_id < 20) b USING (gram)
    GROUP BY c.doc_id
    """,
)
def curation_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing any 5-gram with the
    'benchmark' slice (doc_id < 20 stands in for a held-out eval set).
    The real-scale shape broadcasts the tiny benchmark gram set; the
    corpus is never pairwise-joined (pipeline/curation.py)."""
    from notion_spark.pipeline import curation as CU

    d = read_table(spark, sf_dir, "documents")
    return CU.contaminated_ids(
        d.filter(F.col("doc_id") >= 20), d.filter(F.col("doc_id") < 20), n=5
    )


_PII_INJECT = (
    " contact user{id}@example.com or 123-45-6789 call 555-123-4567 via 10.0.0.7 done"
)


@register(
    "curation_pii_redact",
    r"""
    WITH inj AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or 123-45-6789 call 555-123-4567 via 10.0.0.7 done' AS x
        FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(x, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
               '\b[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}\b', '<PHONE>', 'g'),
             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS redacted,
           CAST(len(regexp_extract_all(x, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
           CAST(len(regexp_extract_all(x, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS INT) AS n_ssn
    FROM inj
    """,
)
def curation_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails/SSN/phone/IPv4 -> typed tokens) over text
    with deterministically injected PII (the synthetic corpus carries
    none, so the query plants one of each per row — both engines inject
    identically). Patterns are RE2-compatible so Spark's Java regex and
    DuckDB's RE2 agree byte-for-byte (pipeline/curation.py PII_PATTERNS)."""
    from notion_spark.pipeline import curation as CU

    d = read_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    injected = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 123-45-6789 call 555-123-4567 via 10.0.0.7 done"),
    )
    hits = CU.pii_hits(injected)
    return d.select(
        "doc_id",
        CU.redact_pii(injected).alias("redacted"),
        hits["email"].alias("n_email"),
        hits["ssn"].alias("n_ssn"),
    )


@register(
    "curation_stratified_sample",
    """
    SELECT doc_id, lang, source FROM documents
    WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000
          < CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 10000 WHEN 'zh' THEN 1000 ELSE 0 END
    """,
)
def curation_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum (domain-mixture) sampling: keep 50% of
    en, all of de, 10% of zh, drop the rest — reproducible row-exact via
    the engine-neutral md5 hash bucket, zero shuffle, no RNG state
    (pipeline/curation.py stratified_sample)."""
    from notion_spark.pipeline import curation as CU

    d = read_table(spark, sf_dir, "documents")
    return CU.stratified_sample(
        d, "lang", {"en": 0.5, "de": 1.0, "zh": 0.1}, key_col="doc_id"
    ).select("doc_id", "lang", "source")


@register(
    "curation_quality_rules",
    r"""
    WITH toks AS (
        SELECT doc_id, text,
               list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               CAST(len(t) AS INT) AS n_words,
               round(CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
                     / greatest(len(t), 1), 6) AS mean_word_len,
               round((CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE)
                      + CAST(length(text) - length(replace(text, '...', '')) AS DOUBLE) / 3)
                     / greatest(len(t), 1), 6) AS symbol_ratio,
               CAST(len(list_filter(t, x -> x IN ('the','be','to','of','and','that','have','with')))
                    AS INT) AS n_stopwords
        FROM toks
    )
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, n_stopwords,
           n_words BETWEEN 50 AND 100000 AS rule_word_count,
           mean_word_len BETWEEN 3.0 AND 10.0 AS rule_mean_word_len,
           symbol_ratio < 0.1 AS rule_symbol_ratio,
           n_stopwords >= 2 AS rule_stopwords,
           (n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
             AND symbol_ratio < 0.1 AND n_stopwords >= 2 AS keep
    FROM m
    """,
)
def curation_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style per-document quality-rule audit (word-count and
    mean-word-length bounds, symbol ratio, stopword floor) with per-rule
    boolean columns and the AND'd keep flag — one codegen'd projection,
    no shuffle (pipeline/curation.py quality_rules)."""
    from notion_spark.pipeline import curation as CU

    d = read_table(spark, sf_dir, "documents")
    return CU.quality_rules(d).withColumn("n_words", F.col("n_words").cast("int")).withColumn(
        "n_stopwords", F.col("n_stopwords").cast("int")
    )


@register(
    "curation_ngram_coverage",
    r"""
    WITH toks AS (
        SELECT doc_id,
               string_split_regex(trim(text), '\s+') AS t
        FROM documents WHERE text IS NOT NULL
    ),
    g AS (
        SELECT DISTINCT doc_id,
               unnest([concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3],
                                 t[i+4], t[i+5], t[i+6], t[i+7])
                       for i in range(1, greatest(len(t) - 7, 0) + 1)]) AS gram
        FROM toks
    ),
    own AS (SELECT gram, MIN(doc_id) AS first_id FROM g GROUP BY gram)
    SELECT g.doc_id,
           COUNT(*) AS n_grams,
           CAST(COALESCE(SUM(CASE WHEN first_id < g.doc_id THEN 1 END), 0) AS BIGINT) AS n_seen,
           round(CAST(COALESCE(SUM(CASE WHEN first_id < g.doc_id THEN 1 END), 0) AS DOUBLE)
                 / COUNT(*), 6) AS coverage,
           COALESCE(SUM(CASE WHEN first_id < g.doc_id THEN 1 END), 0)
             >= 0.8 * COUNT(*) AS is_dup
    FROM g JOIN own USING (gram)
    GROUP BY g.doc_id
    """,
)
def curation_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-containment dedup: per doc, the fraction of its
    distinct 8-grams first seen in an EARLIER doc (min-doc-id owner).
    The oracle groups by the gram STRING where Spark groups by its
    xxhash64 — counts agree because the hash is injective in practice
    (collision odds ~|grams|²/2⁶⁵), the same trick the decontamination
    oracle uses (pipeline/curation.py ngram_coverage)."""
    from notion_spark.pipeline import curation as CU

    d = read_table(spark, sf_dir, "documents")
    return CU.ngram_coverage(d, n=8)


@register(
    "curation_source_rebalance",
    """
    WITH per AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    tot AS (SELECT SUM(n_docs) AS total FROM per)
    SELECT source, n_docs,
           CAST(floor(CAST(total AS DECIMAL(20,0)) * CAST(0.3 AS DECIMAL(4,3))) AS BIGINT) AS cap_docs,
           LEAST(n_docs,
                 CAST(floor(CAST(total AS DECIMAL(20,0)) * CAST(0.3 AS DECIMAL(4,3))) AS BIGINT)) AS kept,
           round(LEAST(1.0,
                 CAST(floor(CAST(total AS DECIMAL(20,0)) * CAST(0.3 AS DECIMAL(4,3))) AS BIGINT)
                   / CAST(n_docs AS DOUBLE)), 6) AS keep_rate
    FROM per, tot
    """,
)
def curation_source_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture capping plan: per-source deterministic keep rates
    that cap any source at 30% of the corpus. cap = floor(share*total)
    in exact decimal so the boundary LEAST() is engine-exact; the only
    double op is the final display division (pipeline/curation.py
    source_rebalance_plan)."""
    from notion_spark.pipeline import curation as CU

    d = read_table(spark, sf_dir, "documents")
    return CU.source_rebalance_plan(d, max_share=0.3)


@register(
    "text_repetition_stats",
    r"""
    WITH lined AS (
        SELECT doc_id, regexp_replace(text, '\. ', '.' || chr(10), 'g') AS txt
        FROM documents WHERE text IS NOT NULL
    ),
    line_m AS (
        SELECT doc_id,
               CAST(len(ls) AS INT) AS n_lines,
               CAST(floor((CAST(len(ls) - len(list_distinct(ls)) AS BIGINT) * 2000000
                           + greatest(len(ls), 1))
                          / (greatest(len(ls), 1) * 2)) AS BIGINT) / 1000000.0
                 AS dup_line_frac
        FROM (SELECT doc_id,
                     list_filter([trim(x) for x in string_split(txt, chr(10))],
                                 x -> x <> '') AS ls
              FROM lined)
    ),
    grams AS (
        SELECT doc_id, (u) AS g
        FROM (SELECT doc_id,
                     unnest([concat_ws(' ', t[i], t[i+1])
                             for i in range(1, greatest(len(t) - 1, 0) + 1)]) AS u
              FROM (SELECT doc_id, string_split_regex(trim(txt), '\s+') AS t FROM lined))
    ),
    big_m AS (
        -- CASTs pin pandas dtypes to Spark's (int32 n_lines above, int64
        -- here): DuckDB SUM(BIGINT) returns HUGEINT, which .df() turns
        -- into float64 — the driver's frame compare is dtype-sensitive,
        -- so int64 5 vs float64 5.0 hash-fails even with equal values
        -- (the actual r3 failure; the floats were already bit-identical)
        SELECT doc_id, MAX(c) AS top_bigram_count, CAST(SUM(c) AS BIGINT) AS n_bigrams
        FROM (SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g)
        GROUP BY doc_id
    )
    SELECT l.doc_id, l.n_lines, l.dup_line_frac,
           COALESCE(b.top_bigram_count, 0) AS top_bigram_count,
           COALESCE(b.n_bigrams, 0) AS n_bigrams,
           CAST(floor((CAST(COALESCE(b.top_bigram_count, 0) AS BIGINT) * 2000000
                       + greatest(COALESCE(b.n_bigrams, 0), 1))
                      / (greatest(COALESCE(b.n_bigrams, 0), 1) * 2)) AS BIGINT)
             / 1000000.0 AS top_bigram_frac
    FROM line_m l LEFT JOIN big_m b USING (doc_id)
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (duplicate-line fraction, top
    2-gram fraction) over sentence-split text (the synthetic docs are
    single-line, so both engines split sentences to lines identically
    first). Line metrics are shuffle-free array ops; the bigram mode is
    explode + two map-side-combined aggregations
    (pipeline/text_analysis.repetition_stats). Fractions are integer
    micro-unit half-up divisions — identical integers through identical
    IEEE ops on both engines, bit-exact under the driver's raw-double
    hash (the r3 failure was engine round(double, 6) last-bit skew)."""
    d = read_table(spark, sf_dir, "documents")
    lined = d.withColumn("text", F.regexp_replace("text", r"\. ", ".\n"))
    return TA.repetition_stats(lined)


def _doc_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic assets frame for the multimodal parity queries:
    payload = UTF-8 bytes of the document text (both engines can sha256
    the identical byte stream)."""
    d = read_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return d.select(
        F.concat(F.lit("img-"), F.col("doc_id").cast("string")).alias("asset_id"),
        F.lit("image").alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("image/png").alias("mime"),
        F.create_map(F.lit("src"), F.col("source")).alias("meta"),
    )


def _serialize_features(df: DataFrame) -> DataFrame:
    """Parity-only projection: the ArrayType feature vector -> one
    comma-joined string of DECIMAL(9,6) renderings. The driver's pandas
    canonicalizer cannot sort/hash list cells (r3: both multimodal rows
    ERR'ed `unhashable type: 'list'`), so parity rows must be atomic.
    DECIMAL(9,6) re-rounds each ~6-decimal double to the SAME 6-digit
    decimal on both engines (absorbing any last-bit skew), and decimal ->
    string keeps the full scale on both, so the strings are identical."""
    return df.withColumn(
        "features",
        F.concat_ws(
            ",", F.transform("features", lambda x: x.cast("decimal(9,6)").cast("string"))
        ),
    )


@register(
    "multimodal_image_features",
    """
    SELECT concat('img-', CAST(doc_id AS VARCHAR)) AS asset_id,
           'image' AS modality,
           64 + CAST(concat('0x', substr(h, 1, 2)) AS INT) AS width,
           64 + CAST(concat('0x', substr(h, 3, 2)) AS INT) AS height,
           array_to_string(
               [CAST(CAST(round(CAST(concat('0x', substr(h, 2*i - 1, 2)) AS INT)
                                / 255.0, 6) AS DECIMAL(9,6)) AS VARCHAR)
                for i in range(1, 17)], ',') AS features
    FROM (SELECT doc_id, sha256(text) AS h FROM documents WHERE text IS NOT NULL)
    """,
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode+featurize plumbing, hash-checked end to end: the
    mapInPandas Arrow batches run the deterministic FakeCodec (sha256 of
    the payload -> dims + feature vector) and DuckDB recomputes the same
    arithmetic in SQL — so batch shape, schema, and codec determinism are
    all driver-verified, not just unit-tested
    (pipeline/multimodal.extract_image_features). The vector rides as a
    serialized DECIMAL(9,6) string (see _serialize_features)."""
    from notion_spark.pipeline.multimodal import FakeCodec, extract_image_features

    return _serialize_features(
        extract_image_features(_doc_assets(spark, sf_dir), codec=FakeCodec())
    )


@register(
    "multimodal_audio_features",
    """
    SELECT concat('img-', CAST(doc_id AS VARCHAR)) AS asset_id,
           1000 + CAST(concat('0x', substr(h, 5, 2)) AS INT) * 100 AS duration_ms,
           8000 + CAST(concat('0x', substr(h, 7, 2)) AS INT) * 128 AS sample_rate,
           array_to_string(
               [CAST(CAST(round(CAST(concat('0x', substr(h, 2*i - 1, 2)) AS INT)
                                / 255.0, 6) AS DECIMAL(9,6)) AS VARCHAR)
                for i in range(17, 33)], ',') AS features
    FROM (SELECT doc_id, sha256(text) AS h FROM documents WHERE text IS NOT NULL)
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio twin of the image parity row (duration/sample-rate/features
    from sha256 bytes 2,3,16..31), exercising the second mapInPandas
    schema (pipeline/multimodal.extract_audio_features). Features
    serialized for the driver like the image row (_serialize_features)."""
    from notion_spark.pipeline.multimodal import extract_audio_features

    return _serialize_features(extract_audio_features(_doc_assets(spark, sf_dir)))


@register(
    "text_tfidf_top_terms",
    r"""
    WITH toks AS (SELECT doc_id AS id, string_split_regex(trim(text), '\s+') AS t
                  FROM documents WHERE text IS NOT NULL),
    terms AS (SELECT id, unnest(t) AS term FROM toks),
    tf AS (SELECT id, term, COUNT(*) AS tf FROM terms WHERE term <> '' GROUP BY id, term),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM toks)
    SELECT id AS doc_id, tf.term AS term,
           round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf,
           CAST(row_number() OVER (
                PARTITION BY id
                ORDER BY round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) DESC,
                         tf.term ASC) AS INT) AS rank
    FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
    QUALIFY rank <= 3
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document: the canonical corpus-statistics
    composition (per-doc TF + corpus-wide DF + scalar N broadcast + rank
    window with WindowGroupLimit partial top-k). Deterministic (score
    desc, term asc) ordering on the ROUNDED score so both engines rank
    identically (pipeline/text_analysis.tfidf_top_terms)."""
    d = read_table(spark, sf_dir, "documents")
    return TA.tfidf_top_terms(d, k=3)


# ---------------------------------------------------------------------
def entry_query(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """Flagship for the driver smoke check."""
    # cross-module after the r11 package split (q1 lives in q_agg)
    from notion_spark.parity.q_agg import q1_pricing_summary

    return q1_pricing_summary(spark, sf_dir)


