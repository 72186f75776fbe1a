"""Corpus-curation operators for LLM training-data pipelines (brief:
dedup / quality / contamination beyond SURVEY.md §2.10): Gopher-style
repetition filters, PII redaction, benchmark-contamination detection,
and domain-level (source-level) quality rollups.

Scale design notes:
- repetition stats shuffle on (doc_id, gram) — the gram string is short
  (two vocabulary tokens) and doc_id pre-groups, so partial aggregation
  absorbs most of the volume map-side;
- contamination joins the corpus' shingle hashes against the benchmark
  set; the benchmark side is tiny by construction (an eval suite, not a
  corpus) and broadcast, so the corpus never shuffles;
- PII redaction is pure row-level regexp work, embarrassingly parallel;
- the domain rollup aggregates to |domains| rows — the decision table a
  RefinedWeb-style curation run feeds back into the document filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text_funcs import SHINGLE5_MD5_SQL, shingle_md5s, tokens
from ..registry import register
from ..sources.io import load_table


@register(
    "repetition_stats",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), g AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             1.0 - len(list_distinct(toks)) * 1.0 / len(toks) AS dup_word_frac,
             unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i + 1])) AS gram
      FROM t WHERE len(toks) >= 2
    ), c AS (
      SELECT doc_id, n_tokens, dup_word_frac, gram, count(*) AS cnt
      FROM g GROUP BY 1, 2, 3, 4
    )
    SELECT doc_id, n_tokens, dup_word_frac,
           max(cnt) * 1.0 / sum(cnt) AS top_bigram_frac,
           dup_word_frac <= 0.8 AND max(cnt) * 1.0 / sum(cnt) <= 0.2 AS keep
    FROM c GROUP BY 1, 2, 3
    """,
    survey_rows="L8,L5,F5,A1",
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: duplicate-
    word fraction (1 - distinct/total) and the most-frequent-bigram share
    of all bigrams, plus the keep/drop verdict a curation pipeline acts
    on. High values flag boilerplate / degenerate repetition.

    Plan shape: explode bigrams -> two-level agg ((doc_id, gram) then
    doc_id). Both aggs partial-agg map-side; the row-level ratios ride
    along as group keys (bit-identical doubles, never rounded).
    Thresholds (0.8 / 0.2) are tuned so the 31-word synthetic vocabulary
    exercises both branches; real-corpus values are Gopher's 0.3-ish."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
    )
    exploded = (
        d.filter(F.size(toks) >= 2)
        .select(
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            (1.0 - F.size(F.array_distinct(toks)) * F.lit(1.0) / F.size(toks)).alias(
                "dup_word_frac"
            ),
            F.explode(grams).alias("gram"),
        )
    )
    per_gram = exploded.groupBy("doc_id", "n_tokens", "dup_word_frac", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    top_frac = F.max("cnt") * F.lit(1.0) / F.sum("cnt")
    return per_gram.groupBy("doc_id", "n_tokens", "dup_word_frac").agg(
        top_frac.alias("top_bigram_frac"),
        ((F.col("dup_word_frac") <= 0.8) & (top_frac <= 0.2)).alias("keep"),
    )


@register(
    "pii_redact",
    r"""
    WITH t AS (
      SELECT doc_id,
             text || ' contact user' || doc_id::VARCHAR || '@example.com call 555-'
                  || lpad((doc_id % 10000)::VARCHAR, 4, '0') AS full_text
      FROM documents
    ), r AS (
      SELECT doc_id, full_text,
             regexp_replace(regexp_replace(full_text,
                 '[a-z0-9]+@[a-z]+\.[a-z]+', '<EMAIL>', 'g'),
                 '555-[0-9]{4}', '<PHONE>', 'g') AS redacted
      FROM t
    )
    SELECT doc_id,
           right(redacted, 40) AS tail_40,
           len(regexp_extract_all(full_text, '[a-z0-9]+@[a-z]+\.[a-z]+'))
             AS n_emails,
           len(regexp_extract_all(full_text, '555-[0-9]{4}')) AS n_phones,
           strpos(redacted, '@') = 0 AS clean
    FROM r
    """,
    survey_rows="L9,L5,F1",
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for a pretraining corpus: regexp-redact emails and
    phone numbers to typed placeholders, with per-doc match counts and a
    residual check. The synthetic corpus contains no PII, so the query
    plants a deterministic email+phone per document first — the redaction
    path (the part that matters) then provably removes all of it.

    Row-level regexp only: JVM regex in one codegen stage, no shuffle,
    linear scan at any corpus size. Patterns stay in the RE2-compatible
    subset so Spark (java.util.regex) and DuckDB (RE2) agree."""
    d = load_table(spark, sf_dir, "documents")
    email = r"[a-z0-9]+@[a-z]+\.[a-z]+"
    phone = r"555-[0-9]{4}"
    full = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    red = F.regexp_replace(
        F.regexp_replace(full, email, "<EMAIL>"), phone, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.substring(red, -40, 40).alias("tail_40"),
        F.size(F.regexp_extract_all(full, F.lit(email), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(full, F.lit(phone), F.lit(0))).alias("n_phones"),
        (F.instr(red, "@") == 0).alias("clean"),
    )


@register(
    "benchmark_contamination",
    f"""
    WITH t AS (
      SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
    ), x AS (
      SELECT doc_id, source, unnest({SHINGLE5_MD5_SQL}) AS h
      FROM t WHERE len(toks) >= 5
    ), ev AS (
      SELECT DISTINCT h FROM x WHERE source = 'src0'
    ), dg AS (
      SELECT DISTINCT doc_id, h FROM x WHERE source <> 'src0'
    )
    SELECT dg.doc_id,
           count(*) AS n_grams,
           count(ev.h) AS n_hits,
           count(ev.h) * 1.0 / count(*) AS contamination
    FROM dg LEFT JOIN ev ON dg.h = ev.h
    GROUP BY dg.doc_id
    """,
    survey_rows="L10,L2,J2",
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: fraction of each training
    document's distinct 5-token shingles that also occur in the held-out
    eval slice (source='src0' stands in for the benchmark suite). The
    standard pre-training hygiene check (n-gram overlap a la GPT-3/PaLM
    decontamination).

    Scale shape: the benchmark side is tiny relative to the corpus, so
    its distinct shingle hashes are BROADCAST — the 100 TB corpus side
    never shuffles; per-doc dedup of shingles partial-aggregates map-side.
    md5 (hex-stable across engines here) stands in for the 8-byte
    xxhash64 a production run would key on."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    grams = F.explode(shingle_md5s("text")).alias("h")
    long_enough = d.filter(F.size(toks) >= 5)
    ev = (
        long_enough.filter(F.col("source") == "src0")
        .select(grams)
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    dg = (
        long_enough.filter(F.col("source") != "src0")
        .select("doc_id", grams)
        .distinct()
    )
    return (
        dg.join(F.broadcast(ev), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("hit").alias("n_hits"),
            (F.count("hit") * F.lit(1.0) / F.count(F.lit(1))).alias("contamination"),
        )
    )


@register(
    "source_quality_rollup",
    """
    WITH t AS (
      SELECT source, lang, string_split(text, ' ') AS toks, n_chars
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           round(avg(len(toks)), 4) AS avg_tokens,
           round(avg(CASE WHEN len(toks) >= 30 THEN 1.0 ELSE 0.0 END), 6)
             AS long_share,
           round(avg(n_chars * 1.0 / len(toks)), 6) AS avg_token_len,
           count(DISTINCT lang) AS n_langs,
           round(avg(CASE WHEN len(toks) >= 30 THEN 1.0 ELSE 0.0 END), 6) >= 0.4
             AS keep_source
    FROM t GROUP BY source
    """,
    survey_rows="L11,A1,A2",
)
def source_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level curation decision table (RefinedWeb/C4-style): roll
    per-document quality signals up to the source (domain) and emit the
    keep/drop verdict the document-level filter joins back against.
    |sources| rows out — a broadcast-sized table no matter the corpus
    size; one partial-agg shuffle on source."""
    d = load_table(spark, sf_dir, "documents")
    n_toks = F.size(tokens("text"))
    long_share = F.round(
        F.avg(F.when(n_toks >= 30, F.lit(1.0)).otherwise(F.lit(0.0))), 6
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(n_toks), 4).alias("avg_tokens"),
        long_share.alias("long_share"),
        F.round(F.avg(F.col("n_chars") * 1.0 / n_toks), 6).alias("avg_token_len"),
        F.count_distinct(F.col("lang")).alias("n_langs"),
        (long_share >= 0.4).alias("keep_source"),
    )
