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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text_funcs import (
    SHINGLE5_MD5_SQL,
    bound,
    shingle_md5s,
    tokens,
)
from ..registry import register
from ..sources.io import load_table, widen


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
    # widen: one-partition scan serialized the tokenize/bigram HOFs
    # (round-14; all aggregates integer counts — order-insensitive)
    d = widen(load_table(spark, sf_dir, "documents"))
    toks = tokens("text")
    # Round-14: bound() — split once per row, not per bigram
    grams = bound(
        toks,
        lambda t: F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(" ", F.slice(t, i, 2)),
        ),
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


@register(
    "lm_quality_score",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents),
    vocab AS (
      SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    total AS (SELECT sum(c) AS n FROM vocab)
    SELECT doc_id,
           count(*) AS n_tokens,
           round(avg(ln(c / n)), 6) AS avg_logprob
    FROM toks JOIN vocab USING (tok) CROSS JOIN total
    GROUP BY doc_id
    """,
    survey_rows="L17,A1,F3",
)
def lm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM perplexity scoring (the CCNet/KenLM quality-filter
    shape): score every document by its average token log-probability
    under the corpus' own unigram distribution — gibberish and
    boilerplate score far from the mode. Two passes over the exploded
    tokens: one to build the LM (vocab counts — tiny, broadcast back),
    one to score; at 100 TB the LM is trained on a sample but applied
    the same way, and the explode → broadcast-join → re-agg never
    shuffles the corpus itself. avg(ln p) is a float agg → 6dp."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("n"))
    return (
        toks.join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(F.log(F.col("c") / F.col("n"))), 6).alias(
                "avg_logprob"
            ),
        )
    )


@register(
    "train_val_test_split",
    """
    WITH assigned AS (
      SELECT lang,
             CASE WHEN substr(md5(doc_id::VARCHAR), 1, 4) < 'cccc'
                    THEN 'train'
                  WHEN substr(md5(doc_id::VARCHAR), 1, 4) < 'e666'
                    THEN 'val'
                  ELSE 'test' END AS split,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents)
    SELECT lang, split, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM assigned GROUP BY lang, split
    """,
    survey_rows="L15,P2,A1",
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split: the first 4 hex
    digits of md5(doc_id) partition the hash space at 0xcccc (80%) and
    0xe666 (90%) — a pure string comparison, so the assignment is
    identical in any engine, stable under re-runs, cluster size, and
    data order, and a document can never leak between splits. Per
    (lang, split) rollup proves balance. At 100 TB this is a scan-time
    predicate: no shuffle, no state, no RNG seed to version."""
    d = load_table(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    split = (
        F.when(h < "cccc", "train").when(h < "e666", "val").otherwise("test")
    )
    return (
        d.select(
            "lang",
            split.alias("split"),
            F.size(F.split("text", " ")).alias("n_tokens"),
        )
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
    )


@register(
    "mixture_sample",
    """
    WITH budgets AS (
      SELECT source, n_tokens, doc_id, hkey,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY hkey, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum,
             CASE WHEN CAST(substr(source, 4) AS INT) < 10
                  THEN 500 ELSE 250 END AS budget
      FROM (SELECT source, doc_id, md5(doc_id::VARCHAR) AS hkey,
                   len(string_split(text, ' ')) AS n_tokens
            FROM documents))
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS sampled_tokens,
           CAST(max(budget) AS BIGINT) AS budget
    FROM budgets WHERE cum - n_tokens < budget
    GROUP BY source
    """,
    survey_rows="L16,W3,A1",
)
def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture sampling: draw a per-source token budget (the
    domain-weighting step of corpus assembly — e.g. upweight curated
    sources, downweight crawl) by walking each source's documents in
    md5-hash order and keeping documents until the budget is crossed.
    Hash order makes the draw a deterministic uniform sample without an
    RNG; the take-while is the same streaming-pack cumsum idiom as
    pack_sequences (a doc straddling the budget line is kept — bounded
    overflow). One shuffle (per-source window); budgets here are a CASE
    over the source id standing in for a real mixture spec table, which
    would broadcast-join instead. Token counts are integers — exact."""
    d = load_table(spark, sf_dir, "documents")
    d = d.select(
        "source",
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("hkey"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    budget = F.when(
        F.substring("source", 4, 10).cast("int") < 10, 500
    ).otherwise(250)
    w = (
        Window.partitionBy("source")
        .orderBy("hkey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept = d.withColumn("cum", F.sum("n_tokens").over(w)).filter(
        F.col("cum") - F.col("n_tokens") < budget
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sampled_tokens"),
        F.max(budget).cast("long").alias("budget"),
    )


@register(
    "psi_corpus_drift",
    """
    WITH b AS (
      SELECT doc_id % 2 AS half, 'source' AS feature, source AS bin
      FROM documents
      UNION ALL
      SELECT doc_id % 2, 'n_chars_bin',
             CAST(least(5, n_chars // 100) AS VARCHAR)
      FROM documents
    ), c AS (
      SELECT feature, bin,
             count(*) FILTER (WHERE half = 0) AS n_ref,
             count(*) FILTER (WHERE half = 1) AS n_cur
      FROM b GROUP BY 1, 2
    ), t AS (
      SELECT feature, bin, n_ref, n_cur,
             sum(n_ref) OVER (PARTITION BY feature) AS tot_ref,
             sum(n_cur) OVER (PARTITION BY feature) AS tot_cur,
             count(*)   OVER (PARTITION BY feature) AS k
      FROM c
    )
    SELECT feature, bin, n_ref, n_cur,
           round(((n_ref + 0.5) / (tot_ref + 0.5 * k)
                  - (n_cur + 0.5) / (tot_cur + 0.5 * k))
                 * ln(((n_ref + 0.5) / (tot_ref + 0.5 * k))
                      / ((n_cur + 0.5) / (tot_cur + 0.5 * k))), 6)
             AS psi_term
    FROM t
    """,
    survey_rows="A9,A1,W3,stats",
)
def psi_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between two corpus snapshots via Population
    Stability Index — the monitoring gate a training-data pipeline runs
    before accepting a new crawl: for each monitored feature, compare
    the reference snapshot's bin distribution against the candidate's;
    PSI = sum over bins of (p_ref - p_cur) * ln(p_ref / p_cur). Here the
    two "snapshots" are the doc_id-parity halves of the corpus (a
    deterministic A/A split, so expected drift ~ 0 — the null-calibrated
    baseline a real deployment alarms against). Two features are
    monitored at once: the categorical `source` distribution and
    fixed-width `n_chars` buckets; per-bin PSI terms are emitted so the
    alarm can name WHICH bin moved, with Laplace smoothing (+0.5) so an
    empty bin on either side stays finite.

    Shape: one scan of the corpus produces both feature binnings via
    UNION (scan reuse), one partial-aggregated groupBy to |features|x
    |bins| rows (~11 here, bounded by design), then window totals over
    that metadata-scale table. At 100 TB: identical plan — the corpus
    is read once, never shuffled at row scale; only bin counts move.

    Numerics: all ratios are computed from exact integer counts in
    identical double expressions on both engines, so psi_term is
    bit-identical before the 6dp round."""
    d = load_table(spark, sf_dir, "documents")
    half = (F.col("doc_id") % 2).alias("half")
    b = d.select(
        half, F.lit("source").alias("feature"), F.col("source").alias("bin")
    ).unionAll(
        d.select(
            half,
            F.lit("n_chars_bin").alias("feature"),
            F.least(F.lit(5), F.expr("n_chars div 100"))
            .cast("string")
            .alias("bin"),
        )
    )
    c = b.groupBy("feature", "bin").agg(
        F.count(F.when(F.col("half") == 0, 1)).alias("n_ref"),
        F.count(F.when(F.col("half") == 1, 1)).alias("n_cur"),
    )
    wf = Window.partitionBy("feature")
    t = c.select(
        "feature",
        "bin",
        "n_ref",
        "n_cur",
        F.sum("n_ref").over(wf).alias("tot_ref"),
        F.sum("n_cur").over(wf).alias("tot_cur"),
        F.count(F.lit(1)).over(wf).alias("k"),
    )
    p_ref = (F.col("n_ref") + 0.5) / (F.col("tot_ref") + 0.5 * F.col("k"))
    p_cur = (F.col("n_cur") + 0.5) / (F.col("tot_cur") + 0.5 * F.col("k"))
    return t.select(
        "feature",
        "bin",
        "n_ref",
        "n_cur",
        F.round((p_ref - p_cur) * F.log(p_ref / p_cur), 6).alias(
            "psi_term"
        ),
    )


@register(
    "mixture_weights_uniform",
    """
    WITH t AS (
      SELECT lang,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ), tot AS (
      SELECT sum(n_tokens) AS total, count(*) AS n_langs FROM t
    )
    SELECT lang, n_tokens,
           round(n_tokens * 1.0 / total, 6) AS actual_share,
           round(least(1.0, (total * 1.0 / n_langs) / n_tokens), 6)
             AS sample_weight,
           round(n_tokens * least(1.0, (total * 1.0 / n_langs) / n_tokens),
                 1) AS sampled_tokens
    FROM t CROSS JOIN tot
    """,
    survey_rows="L16,A1,A5",
)
def mixture_weights_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-weight SOLVING for a uniform language target: given each
    language's token mass, compute the per-language downsampling weight
    w = min(1, target_share / actual_share) that equalizes the mixture
    without upsampling — the planning step whose output feeds
    `mixture_sample` (which applies weights) and `stratified_sample`.
    Languages below target keep weight 1 (never duplicate data to hit a
    quota — upsampling repeats documents, which the dedup stage exists
    to prevent); the report shows exactly how many tokens each language
    contributes after weighting, so the budget shortfall from capped
    languages is visible rather than silently redistributed.

    Shape: one corpus scan to |langs| token sums (two-phase, the token
    count is a scan-side split+size), a 1-row total broadcast back —
    at 100 TB nothing but the first rollup touches data scale. The
    closed-form min(1, t/a) solver is exact for the no-upsampling
    constraint; iterative water-filling (redistributing capped mass) is
    the documented extension and runs on the |langs| table."""
    d = load_table(spark, sf_dir, "documents")
    t = d.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " ")))
        .cast("long")
        .alias("n_tokens")
    )
    tot = t.agg(
        F.sum("n_tokens").alias("total"),
        F.count(F.lit(1)).alias("n_langs"),
    )
    w = F.least(
        F.lit(1.0),
        (F.col("total") * 1.0 / F.col("n_langs")) / F.col("n_tokens"),
    )
    return t.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_tokens",
        F.round(F.col("n_tokens") * 1.0 / F.col("total"), 6).alias(
            "actual_share"
        ),
        F.round(w, 6).alias("sample_weight"),
        F.round(F.col("n_tokens") * w, 1).alias("sampled_tokens"),
    )


@register(
    "temporal_split_events",
    """
    WITH bounds AS (
      SELECT quantile_disc(epoch_us(ts), 0.8) AS q80,
             quantile_disc(epoch_us(ts), 0.9) AS q90
      FROM events
    ),
    assigned AS (
      SELECT e.event_type,
             CASE WHEN epoch_us(e.ts) <= b.q80 THEN 'train'
                  WHEN epoch_us(e.ts) <= b.q90 THEN 'val'
                  ELSE 'test' END AS split,
             e.value
      FROM events e, bounds b
    )
    SELECT event_type, split,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM assigned GROUP BY 1, 2
    """,
    survey_rows="L15,A8,P2,F2",
)
def temporal_split_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPORAL train/val/test split (80/10/10 by event-time quantile
    boundaries) — the leakage-safe complement of the hash split
    (`train_val_test_split`): for forecasting tasks a random split
    leaks the future into training, so the split key must be TIME,
    with val and test strictly after train. DISCRETE quantiles of the
    timestamp give deterministic boundaries on both engines
    (percentile_disc / quantile_disc pick an ACTUAL data value — no
    interpolation float to drift); the 1-row boundary pair broadcasts
    and the assignment is a scan-side CASE.

    Scale: one percentile aggregate + one partial-agg pass, no global
    window. At 100 TB the exact percentile becomes the KLL sketch
    boundary (kll_quantile_rollup) — split semantics unchanged, only
    the boundary estimator swaps."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    bounds = e.agg(
        F.expr(
            "percentile_disc(0.8) WITHIN GROUP (ORDER BY unix_micros(ts))"
        ).alias("q80"),
        F.expr(
            "percentile_disc(0.9) WITHIN GROUP (ORDER BY unix_micros(ts))"
        ).alias("q90"),
    )
    return (
        e.select("event_type", "value", us.alias("_us"))
        .join(F.broadcast(bounds))
        .select(
            "event_type",
            "value",
            F.when(F.col("_us") <= F.col("q80"), F.lit("train"))
            .when(F.col("_us") <= F.col("q90"), F.lit("val"))
            .otherwise(F.lit("test"))
            .alias("split"),
        )
        .groupBy("event_type", "split")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "stratified_sample_exact",
    """
    WITH counts AS (
      SELECT o_orderpriority, count(*) AS n_h FROM orders GROUP BY 1
    ), tot AS (
      SELECT sum(n_h) AS n FROM counts
    ), quota AS (
      SELECT o_orderpriority, n_h,
             CAST(floor((1000.0 * n_h) / n) AS BIGINT) AS base,
             (1000 * n_h) % n AS rem,
             n
      FROM counts, tot
    ), alloc AS (
      SELECT o_orderpriority, n_h,
             base + CASE WHEN rank() OVER (ORDER BY rem DESC,
                                           o_orderpriority)
                         <= 1000 - (SELECT sum(base) FROM quota)
                    THEN 1 ELSE 0 END AS n_take
      FROM quota
    ), ranked AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY md5(CAST(o_orderkey AS VARCHAR)),
                                         o_orderkey) AS rn
      FROM orders
    )
    SELECT r.o_orderpriority,
           count(*) AS n_sampled,
           a.n_h AS n_stratum,
           round(sum(CAST(r.o_totalprice AS DECIMAL(18,2))), 2)
             AS sampled_price
    FROM ranked r JOIN alloc a USING (o_orderpriority)
    WHERE r.rn <= a.n_take
    GROUP BY 1, 3
    """,
    survey_rows="L16,A1,W1,sampling",
)
def stratified_sample_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT proportional stratified sampling with largest-remainder
    allocation — the deterministic twin of sampleBy (which is Bernoulli
    per stratum and only hits quotas in expectation). A 1000-row budget
    splits across order-priority strata as floor(B*n_h/N) plus one
    extra for the largest remainders (integer arithmetic throughout, so
    the allocation is exact and identical on both engines); within each
    stratum the sample is the first n_take rows ordered by
    md5(key) — the same portable deterministic-draw idiom as the PPS
    sampler, so the SAMPLE SET itself (not just its size) is
    reproducible anywhere, which is what a training-data pipeline needs
    to re-derive a split.

    Scale shape: one partial-agg pass for strata counts (grid-sized),
    one window rank per stratum partition (the single data-sized
    shuffle), broadcast of the 5-row allocation — at 100 TB the hash
    rank replaces an ORDER BY over the corpus; sampling never sorts
    globally. Sum is DECIMAL-exact (float-hash rules); the verified
    output is the per-stratum sample aggregate, with quota arithmetic
    hash-proven by n_sampled == n_take."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    counts = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_h")
    )
    tot = counts.agg(F.sum("n_h").alias("n"))
    quota = counts.crossJoin(F.broadcast(tot)).select(
        "o_orderpriority",
        "n_h",
        F.floor(
            (F.lit(1000.0) * F.col("n_h")) / F.col("n")
        ).cast("bigint").alias("base"),
        ((F.lit(1000) * F.col("n_h")) % F.col("n")).alias("rem"),
    )
    leftover = quota.agg(
        (F.lit(1000) - F.sum("base")).alias("leftover")
    )
    wrem = Window.orderBy(F.desc("rem"), F.asc("o_orderpriority"))
    alloc = (
        quota.crossJoin(F.broadcast(leftover))
        .withColumn("rk", F.rank().over(wrem))
        .select(
            "o_orderpriority",
            "n_h",
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            ).alias("n_take"),
        )
    )
    wsel = Window.partitionBy("o_orderpriority").orderBy(
        F.md5(F.col("o_orderkey").cast("string")), F.col("o_orderkey")
    )
    ranked = o.withColumn("rn", F.row_number().over(wsel))
    return (
        ranked.join(F.broadcast(alloc), "o_orderpriority")
        .filter(F.col("rn") <= F.col("n_take"))
        .groupBy("o_orderpriority", F.col("n_h").alias("n_stratum"))
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2
            ).alias("sampled_price"),
        )
        .select(
            "o_orderpriority", "n_sampled", "n_stratum", "sampled_price"
        )
    )
