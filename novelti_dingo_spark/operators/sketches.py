"""Count-min sketch frequency estimation — fixed-size, mergeable.

The 100 TB design point: L21's exact heavy-hitter pass materializes the
|vocab|-row frequency table — billions of n-grams on a web corpus — and
its sampled variant still recounts every candidate against the full
corpus. A count-min sketch (Cormode & Muthukrishnan, J.Algorithms 2005)
replaces the vocab-sized intermediate with a FIXED D×W counter grid
(here 4×4096 = 16k longs, 128 KB) that (a) never underestimates — for
every term, min over the D cells >= its true count — and (b) merges by
cellwise addition, so per-partition / per-micro-batch sketches combine
without re-reading data: the natural shape for streaming frequency
tracking and for pre-aggregation pushed to map tasks.

Both guarantees carry the pipeline below:
- sample pass (L21 idiom): candidate terms = the VOCABULARY of a
  deterministic 25% md5 doc-sample — no count threshold, so a true
  heavy hitter is missed only if the sample contains zero of its
  occurrences (impossible above ppm ~ 4/|docs| unless every carrier
  doc is excluded; this corpus concentrates some bigrams in few docs,
  which is exactly why a thresholded sample cut would be unsound);
  the candidate list is tail-heavy — that's the CMS's job to fix;
- CMS prune: drop candidates whose ESTIMATE is already below the exact
  threshold. Sound because estimate >= true count: a dropped candidate
  provably isn't a heavy hitter. This shrinks the exact-recount set
  using 128 KB of state instead of a corpus rescan;
- exact recount of the CMS survivors only (broadcast semi-join; the
  full-corpus shuffle carries survivor terms, not the vocabulary).

The final predicate is exact, so the oracle is the plain exact SQL —
the hash match certifies that neither the sample nor the sketch dropped
a true heavy hitter. Overestimate + merge laws are property-tested in
tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text_funcs import token_bigrams
from ..registry import register
from ..sources.io import load_table

CMS_DEPTH = 4
CMS_WIDTH = 4096
# threshold differs from heavy_hitters.PPM_THRESHOLD so the two operator
# families produce distinct registered outputs
PPM_THRESHOLD = 1400

_BIGRAMS_SQL = """
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i+1])) AS bg
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
"""


def _cms_cells(term: Column) -> Column:
    """Array of D (row, col) structs for a term — one counter per hash
    row, xxhash64 seeded by the row index."""
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(F.xxhash64(term, F.lit(d)), F.lit(CMS_WIDTH)).alias("col"),
            )
            for d in range(CMS_DEPTH)
        ]
    )


def cms_build(terms: DataFrame, term_col: str) -> DataFrame:
    """Build the sketch from a term stream: DataFrame of (d, col, cnt),
    <= D*W rows regardless of input size. Two-phase count agg — each map
    task collapses to its local grid before the shuffle, so the exchange
    is O(D*W × partitions). Merging two sketches = unionAll + re-agg
    (cellwise addition), which is how per-micro-batch sketches combine."""
    return (
        terms.select(F.explode(_cms_cells(F.col(term_col))).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(candidates: DataFrame, term_col: str, cms: DataFrame) -> DataFrame:
    """Point-query the sketch for each candidate term: explode the D
    cells, broadcast-join the <=16k-row grid, min over rows. Returns the
    candidates plus an `est` column with est >= true count."""
    cells = candidates.select(
        term_col, F.explode(_cms_cells(F.col(term_col))).alias("c")
    ).select(term_col, F.col("c.d").alias("d"), F.col("c.col").alias("col"))
    return (
        cells.join(F.broadcast(cms), ["d", "col"], "inner")
        .groupBy(term_col)
        .agg(F.min("cnt").alias("est"))
    )


@register(
    "cms_heavy_hitters",
    f"""
    WITH big AS ({_BIGRAMS_SQL}),
    n AS (SELECT count(*) AS total FROM big),
    f AS (SELECT bg, count(*) AS cnt FROM big GROUP BY bg)
    SELECT bg, cnt,
           CAST(cnt * 1000000 // total AS BIGINT) AS ppm
    FROM f CROSS JOIN n
    WHERE cnt * 1000000 > {PPM_THRESHOLD} * total
    """,
    survey_rows="L21,A3,ST6",
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter bigrams via sample-candidates -> CMS prune -> exact
    recount of survivors. Every stage's state is bounded (sample vocab,
    128 KB grid, survivor list); only the candidate generation and the
    final recount touch the corpus, and the recount shuffle carries
    survivor terms only. Output is exact — same rows as the plain
    vocab-sized groupBy at this threshold."""
    d = load_table(spark, sf_dir, "documents")
    big = d.select("doc_id", F.explode(token_bigrams("text")).alias("bg"))
    n = big.agg(F.count(F.lit(1)).alias("total"))

    # candidate pass: vocabulary of the deterministic 25% doc-sample
    # (threshold-free — see module docstring for why a count cut on a
    # doc-sample is unsound when terms concentrate in few docs)
    cand = (
        big.filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
                "0", "1", "2", "3"
            )
        )
        .select("bg")
        .distinct()
    )

    # CMS prune: estimate >= true, so est*1e6 <= tau*total proves not-HH.
    # `kept` carries `total` along (constant across rows) so the final
    # filter needs no second instantiation of the n subtree — the
    # recount stage joins the survivor list once and has everything.
    cms = cms_build(big, "bg")
    kept = (
        cms_estimate(cand, "bg", cms)
        .crossJoin(F.broadcast(n))
        .filter(F.col("est") * 1_000_000 > PPM_THRESHOLD * F.col("total"))
        .select("bg", "total")
    )

    # exact recount of survivors only: `kept` is distinct by bg (a
    # groupBy output), so the broadcast inner join is the same row set
    # the left_semi + second crossJoin produced, with total attached
    return (
        big.join(F.broadcast(kept), "bg")
        .groupBy("bg", "total")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * 1_000_000 > PPM_THRESHOLD * F.col("total"))
        .select("bg", "cnt", F.expr("cnt * 1000000L div total").alias("ppm"))
    )
