"""Text analysis over the documents table (SURVEY.md §2.10 L5): corpus
stats, token frequencies, TF-IDF, language-ID heuristic, quality scoring,
document fingerprinting.

All tokenization is JVM-side (`split` + array HOFs) — a 100 TB corpus
never ships a row into Python. Per-document work is embarrassingly
parallel; corpus-level stats (df, vocab) are small aggregates broadcast
back for joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text_funcs import bound, tokens
from ..registry import register
from ..sources.io import load_table, widen

# Stopword list for quality scoring / lang-id (the corpus vocabulary is
# 31 English-ish tokens; see FIXTURES.md).
_STOPWORDS = ("the", "a")


@register(
    "text_stats_by_lang",
    """
    SELECT lang,
           count(*)                                        AS n_docs,
           round(avg(n_chars), 6)                          AS avg_chars,
           round(avg(len(string_split(text, ' '))), 6)     AS avg_tokens,
           count(DISTINCT source)                          AS n_sources
    FROM documents GROUP BY lang
    """,
    survey_rows="L5,F1,A1,A2",
)
def text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: per-language corpus stats (doc counts, length moments)."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.round(F.avg(F.size(tokens("text"))), 6).alias("avg_tokens"),
        F.countDistinct("source").alias("n_sources"),
    )


@register(
    "token_counts",
    """
    SELECT token, count(*) AS cnt FROM (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ) GROUP BY token
    """,
    survey_rows="L5,F1,X4",
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: global token frequency via explode (the UDTF-shaped row→rows
    expansion, X4). Map-side partial agg keeps the shuffle at vocab size,
    not corpus size."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents WHERE doc_id < 50
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
    ), df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
      ) GROUP BY 1
    ), n AS (SELECT count(*) AS n FROM documents)
    SELECT doc_id, term, score FROM (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(n.n * 1.0 / df.df), 6) AS score,
             row_number() OVER (PARTITION BY tf.doc_id
                 ORDER BY round(tf.tf * ln(n.n * 1.0 / df.df), 6) DESC, tf.term) AS rn
      FROM tf JOIN df USING (term) CROSS JOIN n)
    WHERE rn <= 3
    """,
    survey_rows="L5,A1,W4,F3",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: TF-IDF-lite — tf per (doc, term), idf = ln(N/df) from a
    broadcast document-frequency table, top-3 terms per doc (docs 0-49).

    Scale: df and N are vocab-sized aggregates (31 rows here) broadcast to
    the tf side; no corpus-sized shuffle beyond the tf groupBy."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = (
        toks.filter(F.col("doc_id") < 50)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.log(F.col("n") * 1.0 / F.col("df")), 6).alias(
                "score"
            ),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


def with_quality(d: DataFrame) -> DataFrame:
    """Append the quality-signal columns to any documents-shaped frame
    (batch or streaming — pure row-level expressions, so the same code
    runs under Structured Streaming unchanged)."""
    toks = tokens("text")
    n_tokens = F.size(toks).cast("long")
    stop_ratio = (
        F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS))) * F.lit(1.0) / n_tokens
    )
    return d.select(
        "*",
        n_tokens.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(F.col("n_chars") * 1.0 / n_tokens, 6).alias("avg_token_len"),
        F.round(
            F.least(n_tokens / 50.0, F.lit(1.0)) * 0.6 + (1 - stop_ratio) * 0.4, 6
        ).alias("quality"),
    )


@register(
    "doc_quality_score",
    """
    WITH t AS (
      SELECT doc_id, lang, n_chars, string_split(text, ' ') AS toks
      FROM documents
    )
    SELECT doc_id, lang,
           len(toks) AS n_tokens,
           round(len(list_filter(toks, x -> x IN ('the', 'a'))) * 1.0
                 / len(toks), 6) AS stopword_ratio,
           round(n_chars * 1.0 / len(toks), 6) AS avg_token_len,
           round(least(len(toks) / 50.0, 1.0) * 0.6
                 + (1 - len(list_filter(toks, x -> x IN ('the', 'a'))) * 1.0
                    / len(toks)) * 0.4, 6) AS quality
    FROM t
    """,
    survey_rows="L5,F5,F3",
)
def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: heuristic quality score — length saturation + (1 - stopword
    ratio), the shape of a pretraining-corpus quality filter. Pure
    row-level HOFs; trivially parallel at any scale."""
    d = load_table(spark, sf_dir, "documents")
    return with_quality(d).select(
        "doc_id",
        "lang",
        "n_tokens",
        "stopword_ratio",
        "avg_token_len",
        "quality",
    )


@register(
    "lang_id_agreement",
    """
    WITH pred AS (
      SELECT lang,
             CASE WHEN len(list_filter(string_split(text, ' '),
                           x -> x IN ('the', 'a'))) >= 1
                  THEN 'en' ELSE 'unknown' END AS predicted
      FROM documents
    )
    SELECT lang, predicted, count(*) AS n FROM pred GROUP BY 1, 2
    """,
    survey_rows="L5",
)
def lang_id_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: stopword-hit language-ID heuristic vs the labeled lang column.
    (The corpus shares one English-ish vocabulary across lang labels, so
    the detector degenerates to en/unknown — the machinery, a real n-gram
    profile table join, is what this exercises.)"""
    d = load_table(spark, sf_dir, "documents")
    hits = F.size(F.filter(tokens("text"), lambda x: x.isin(*_STOPWORDS)))
    pred = F.when(hits >= 1, "en").otherwise("unknown")
    return d.select("lang", pred.alias("predicted")).groupBy(
        "lang", "predicted"
    ).agg(F.count(F.lit(1)).alias("n"))


@register(
    "doc_fingerprint",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    )
    SELECT doc_id,
           list_min(list_transform(range(1, len(toks) - 3),
                    i -> md5(array_to_string(toks[i:i+4], ' ')))) AS fingerprint
    FROM t WHERE len(toks) >= 5
    """,
    survey_rows="L5,F7,F5",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: content fingerprint = min(md5) over 5-token shingles (the
    1-hash core of winnowing/MinHash). md5 hex matches across engines;
    docs shorter than one shingle are excluded on both sides."""
    # widen: per-doc shingle md5 chain off the one-partition scan
    # (round-14; array_min — order-insensitive)
    d = widen(load_table(spark, sf_dir, "documents"))
    toks = tokens("text")
    # Round-14 (guide §1.2 step 2): bind the split array once — the
    # in-lambda `toks` reference re-split the text per element (see
    # functions.text_funcs.bound).
    fp = F.array_min(
        bound(
            toks,
            lambda t: F.transform(
                F.sequence(F.lit(1), F.size(t) - 4),
                lambda i: F.md5(F.concat_ws(" ", F.slice(t, i, 5))),
            ),
        )
    )
    return (
        d.filter(F.size(toks) >= 5)
        .select("doc_id", fp.alias("fingerprint"))
    )


@register(
    "winnowing_fingerprints",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      WHERE len(string_split(text, ' ')) >= 8
    ), g AS (
      SELECT doc_id,
             unnest(range(1, len(toks) - 3)) AS pos,
             len(toks) - 4 AS n_grams,
             toks
      FROM t
    ), h AS (
      SELECT doc_id, pos, n_grams,
             md5(array_to_string(toks[pos:pos+4], ' '))
               || ':' || lpad(CAST(pos AS VARCHAR), 6, '0') AS key
      FROM g
    ), sel AS (
      SELECT doc_id, pos, n_grams,
             min(key) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wkey
      FROM h
    )
    SELECT doc_id, n_grams,
           CAST(len(list_distinct(list(wkey))) AS BIGINT) AS n_fps,
           md5(array_to_string(list_sort(list_distinct(list(wkey))), ','))
             AS fp_digest
    FROM sel WHERE pos <= n_grams - 3
    GROUP BY doc_id, n_grams
    """,
    survey_rows="L5,F7,F5,W3",
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting",
    SIGMOD'03 — the MOSS algorithm): hash every 5-token shingle, slide a
    w=4 window over the hash sequence, keep each window's minimum
    (ties → leftmost position, encoded in the key suffix). Guarantees:
    any shared run of ≥ w+k-1 tokens yields a shared fingerprint
    (no-miss detection), expected density 2/(w+1) — the fingerprint set
    is ~40% of grams here, tunable to any budget by w.

    Output per doc: gram count, fingerprint count, and an md5 digest of
    the sorted fingerprint set, so the DuckDB oracle hash-checks the
    ENTIRE selected set, not a summary.

    Scale shape: posexplode is linear in corpus tokens; the windowed min
    and the per-doc set aggregation share ONE shuffle key (doc_id) — a
    single exchange end-to-end, no self-joins; cross-doc fingerprint
    matching downstream is an equi-join on fingerprint (the same
    bucketed shape as every dedup family here, never pairwise)."""
    # widen: round-14, same rationale as doc_fingerprint
    return winnow_fingerprints_df(widen(load_table(spark, sf_dir, "documents")))


def _winnow_sel(d: DataFrame) -> DataFrame:
    """Selected winnowing keys per doc: (doc_id, n_grams, wkey) where
    wkey = gram-md5 ':' zero-padded position (position suffix makes the
    per-window min tie-break deterministic on both engines)."""
    toks = tokens("text")
    n_grams = (F.size(toks) - 4).cast("long")
    # Round-14: bound() — split once per row, not per gram
    grams = bound(
        toks,
        lambda t: F.transform(
            F.sequence(F.lit(1), F.size(t) - 4),
            lambda i: F.md5(F.concat_ws(" ", F.slice(t, i, 5))),
        ),
    )
    rows = (
        d.filter(F.size(toks) >= 8)
        .select(
            "doc_id",
            n_grams.alias("n_grams"),
            F.posexplode(grams).alias("p", "h"),
        )
        .select(
            "doc_id",
            "n_grams",
            (F.col("p") + 1).alias("pos"),
            F.concat(
                F.col("h"),
                F.lit(":"),
                F.lpad((F.col("p") + 1).cast("string"), 6, "0"),
            ).alias("key"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    return (
        rows.select(
            "doc_id", "n_grams", "pos", F.min("key").over(w).alias("wkey")
        )
        .filter(F.col("pos") <= F.col("n_grams") - 3)
        .select("doc_id", "n_grams", "wkey")
    )


def winnow_fingerprints_df(d: DataFrame) -> DataFrame:
    """Winnowing core over any (doc_id, text) DataFrame — see
    winnowing_fingerprints for the algorithm; split out so the no-miss
    guarantee is property-testable on hand-built documents."""
    fps = F.sort_array(F.array_distinct(F.collect_list("wkey")))
    # group on doc_id ALONE (n_grams is functionally dependent but
    # Catalyst can't know that — grouping on both would re-shuffle on
    # the composite key; doc_id alone reuses the window's partitioning,
    # so the whole operator is one exchange)
    return (
        _winnow_sel(d)
        .groupBy("doc_id")
        .agg(
            F.first("n_grams").alias("n_grams"),
            F.size(fps).cast("long").alias("n_fps"),
            F.md5(F.concat_ws(",", fps)).alias("fp_digest"),
        )
    )


def winnow_selected_hashes(d: DataFrame) -> DataFrame:
    """(doc_id, fp): the distinct selected gram HASHES (position suffix
    stripped) — the join key for cross-doc match detection: two docs
    sharing a run of ≥ w+k-1 = 8 tokens are guaranteed ≥1 common fp."""
    return (
        _winnow_sel(d)
        .select("doc_id", F.substring("wkey", 1, 32).alias("fp"))
        .distinct()
    )


@register(
    "token_counts_regex",
    """
    SELECT token, count(*) AS cnt FROM (
      SELECT unnest(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS token
      FROM documents
    ) GROUP BY token
    """,
    survey_rows="L5,F1",
)
def token_counts_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: regex-based tokenization (the BPE-ish pre-tokenizer shape:
    letter runs / digit runs as atoms) — the tokenizer to swap in for
    corpora that aren't whitespace-clean. Pattern kept to a dialect-safe
    subset so Java regex (Spark) and RE2 (DuckDB) agree."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+"), 0)
    return (
        d.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "normalized_dedup_key",
    """
    SELECT count(*) AS n_docs,
           count(DISTINCT md5(text)) AS n_raw_distinct,
           count(DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))))
             AS n_norm_distinct,
           count(DISTINCT md5(text))
             - count(DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))))
             AS n_case_ws_dups
    FROM documents
    """,
    survey_rows="L1,F1,F7",
)
def normalized_dedup_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization-aware exact dedup: documents equal after
    lowercasing + whitespace collapse + trim share a normalized content
    key — catching the case/whitespace near-dups raw-hash dedup misses
    without paying for MinHash. Emits the raw-vs-normalized distinct-key
    delta (0 on this already-normalized corpus — the query is the
    instrument; on a scraped corpus the delta is the cheap dedup win).
    Same scale shape as L1: the shuffle carries 16-byte keys,
    normalization is scan-side JVM regex. (Unicode NFC/confusable folding
    is the production extension; this corpus is ASCII so the portable
    regex family is exact.)"""
    d = load_table(spark, sf_dir, "documents")
    norm_h = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    )
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_raw_distinct"),
        F.countDistinct(norm_h).alias("n_norm_distinct"),
        (F.countDistinct(F.md5("text")) - F.countDistinct(norm_h)).alias(
            "n_case_ws_dups"
        ),
    )
