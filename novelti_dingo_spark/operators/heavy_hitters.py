"""Heavy hitters / frequent items over the document corpus.

The 100 TB design point: heavy-hitter detection is a two-phase partial
aggregation whose OUTPUT is bounded by 1/threshold regardless of corpus
size — but the intermediate (the full term-frequency table) is
vocab-sized, and on a web corpus the vocabulary is billions of n-grams.
The `heavy_hitters_sampled_verify` variant is the standard distributed
answer: a cheap candidate pass over a deterministic hash-sample of the
corpus (at half the target threshold, so true heavy hitters survive
sampling noise), then an exact recount restricted to the candidate set —
the full-corpus shuffle carries only candidate terms, a vanishing
fraction of the vocabulary.

Corpus note (FIXTURES.md): the synthetic bigram distribution is
near-uniform (916 bigrams, share ≈ 1091 ppm each), so the thresholds sit
just above the uniform share to split the tail deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text_funcs import token_bigrams
from ..registry import register
from ..sources.io import load_table

# heavy hitter = bigram with corpus share > 1600 ppm (0.16%); the
# candidate pass uses half that so sampling noise cannot drop a true
# heavy hitter (Chernoff margin is ample at these counts).
PPM_THRESHOLD = 1600

_BIGRAMS_SQL = """
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i+1])) AS bg
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
"""


@register(
    "heavy_hitter_bigrams",
    f"""
    WITH big AS ({_BIGRAMS_SQL}),
    n AS (SELECT count(*) AS total FROM big),
    f AS (SELECT bg, count(*) AS cnt FROM big GROUP BY bg)
    SELECT bg, cnt,
           CAST(cnt * 1000000 // total AS BIGINT) AS ppm
    FROM f CROSS JOIN n
    WHERE cnt * 1000000 > {PPM_THRESHOLD} * total
    """,
    survey_rows="L21,A1,F1",
)
def heavy_hitter_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: bigrams whose corpus share exceeds
    PPM_THRESHOLD. One explode + two-phase partial agg (map-side combine
    collapses each partition to its local vocab before the shuffle); the
    |vocab|-row frequency table then filters to <= 1/threshold rows. The
    total-count side is a 1-row broadcast. Integer ppm arithmetic — no
    float in the predicate, so the cut is engine-exact."""
    # round-14: widen() measured a LOSS here (0.48 s → 0.62 s A/B —
    # the independent total/frequency corpus passes already overlap
    # across cores, and each re-pays the repartition); left narrow
    d = load_table(spark, sf_dir, "documents")
    big = d.select("doc_id", F.explode(token_bigrams("text")).alias("bg"))
    # Round-14: measured and deliberately left alone. Two restructures
    # were tried and both LOST on the measured warm median: deriving
    # total from the frequency table (Σ cnt, hoping for ReusedExchange:
    # 815 ms) and a tokenize-only Σ size(bigrams) scan (465 ms) vs
    # 428 ms for this shape — exchange reuse does not fire across the
    # broadcast boundary, and chaining the total into the broadcast
    # build serializes stages that here overlap across cores. The
    # bound() fix (functions/text_funcs) already took this query
    # 2.59 s → 0.43 s; the remaining 2 corpus passes are independent
    # subtrees the scheduler runs concurrently.
    n = big.agg(F.count(F.lit(1)).alias("total"))
    f = big.groupBy("bg").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        f.crossJoin(F.broadcast(n))
        .filter(F.col("cnt") * 1_000_000 > PPM_THRESHOLD * F.col("total"))
        .select(
            "bg",
            "cnt",
            F.expr("cnt * 1000000L div total").alias("ppm"),
        )
    )


@register(
    "heavy_hitters_sampled_verify",
    f"""
    WITH big AS ({_BIGRAMS_SQL}),
    n AS (SELECT count(*) AS total FROM big),
    samp AS (
      SELECT bg, count(*) AS scnt FROM big
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2','3')
      GROUP BY bg
    ),
    sn AS (
      SELECT count(*) AS stotal FROM big
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2','3')
    ),
    cand AS (
      SELECT bg FROM samp CROSS JOIN sn
      WHERE scnt * 2000000 > {PPM_THRESHOLD} * stotal
    ),
    f AS (
      SELECT bg, count(*) AS cnt FROM big
      WHERE bg IN (SELECT bg FROM cand) GROUP BY bg
    )
    SELECT bg, cnt,
           CAST(cnt * 1000000 // total AS BIGINT) AS ppm
    FROM f CROSS JOIN n
    WHERE cnt * 1000000 > {PPM_THRESHOLD} * total
    """,
    survey_rows="L21,A1,J3,F7",
)
def heavy_hitters_sampled_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-then-verify heavy hitters — the shape that scales past
    vocab-sized intermediates. Pass 1 aggregates only the ~25% hash-sample
    (md5(doc_id) first hex digit in 0..3 — deterministic, engine-portable,
    re-run-stable) at HALF the target threshold; pass 2 recounts exactly,
    but only for candidate bigrams (left-semi join prunes before the
    shuffle), then applies the real threshold. On a near-uniform corpus
    the candidate set is ~the heavy tail itself; on a skewed web corpus it
    is orders of magnitude smaller than the vocabulary.

    tests/test_quality.py asserts this equals `heavy_hitter_bigrams`
    row-for-row on this corpus (no heavy hitter lost to sampling)."""
    # round-14: widen() measured a LOSS here (0.48 s → 0.62 s A/B —
    # the independent total/frequency corpus passes already overlap
    # across cores, and each re-pays the repartition); left narrow
    d = load_table(spark, sf_dir, "documents")
    big = d.select("doc_id", F.explode(token_bigrams("text")).alias("bg"))
    in_sample = F.substring(
        F.md5(F.col("doc_id").cast("string")), 1, 1
    ).isin("0", "1", "2", "3")
    samp = big.filter(in_sample)
    sn = samp.agg(F.count(F.lit(1)).alias("stotal"))
    cand = (
        samp.groupBy("bg")
        .agg(F.count(F.lit(1)).alias("scnt"))
        .crossJoin(F.broadcast(sn))
        .filter(F.col("scnt") * 2_000_000 > PPM_THRESHOLD * F.col("stotal"))
        .select("bg")
    )
    n = big.agg(F.count(F.lit(1)).alias("total"))
    f = (
        big.join(F.broadcast(cand), "bg", "left_semi")
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        f.crossJoin(F.broadcast(n))
        .filter(F.col("cnt") * 1_000_000 > PPM_THRESHOLD * F.col("total"))
        .select(
            "bg",
            "cnt",
            F.expr("cnt * 1000000L div total").alias("ppm"),
        )
    )
