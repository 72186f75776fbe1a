"""Frequent-itemset mining over order baskets (market-basket analysis
beyond the pairwise lift in `basket_part_lift`).

Design (Apriori + SON local candidate generation, Spark-first):

- A basket is the DISTINCT set of part brands in one order (brand is the
  right granularity: |brands| = 25, so baskets are small sets over a
  small alphabet — parts themselves almost never repeat across orders).
- Frequent SINGLETONS are computed first and semi-joined onto the
  baskets (Apriori monotonicity: every brand of a frequent triple is
  itself frequent, so the pruning can never change the answer — it only
  shrinks the candidate space). At 100 TB the broadcast of the frequent
  alphabet is what keeps candidate generation local.
- 3-combinations are generated LOCALLY per basket with nested array
  `transform`s (SON-style: each basket emits its own candidates, all
  JVM-side codegen, no self-join) and counted with one partial-agg
  shuffle on the (b1,b2,b3) key. The naive alternative — the 3-way
  self-join the DuckDB oracle runs — shuffles the basket relation three
  times and explodes quadratically on hot orders; per-basket generation
  is O(C(|basket|,3)) with |basket| <= |alphabet|, and bounded baskets
  are exactly the retail/telemetry shape.
- The support threshold is RELATIVE (0.1% of baskets) so the query is
  scale-invariant across SFs; the 1-row basket total rides a broadcast
  cross join, not a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..barrier import barrier
from ..registry import register
from ..sources.io import load_table

# relative minimum support: a triple must appear in >= this fraction of
# all baskets. Literal on both sides of the oracle comparison.
MIN_SUPPORT_FRAC = 0.001


@register(
    "frequent_brand_triples",
    f"""
    WITH b AS (
      SELECT DISTINCT l_orderkey AS ok, p_brand AS br
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    tot AS (SELECT count(DISTINCT ok) AS n FROM b),
    t AS (
      SELECT a.br AS brand1, b2.br AS brand2, c.br AS brand3,
             count(*) AS support
      FROM b a
      JOIN b b2 ON a.ok = b2.ok AND a.br < b2.br
      JOIN b c  ON b2.ok = c.ok AND b2.br < c.br
      GROUP BY 1, 2, 3
    )
    SELECT brand1, brand2, brand3, support,
           round(CAST(support AS DOUBLE) / n, 6) AS support_ratio
    FROM t, tot
    WHERE CAST(support AS DOUBLE) >= {MIN_SUPPORT_FRAC} * n
    ORDER BY support DESC, brand1, brand2, brand3
    LIMIT 20
    """,
    survey_rows="A1,J4,F5,itemsets",
)
def frequent_brand_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 frequent brand TRIPLES by support (>= 0.1% of baskets).

    The oracle mines the same triples with the textbook naive 3-way
    self-join; this side generates candidates locally per basket
    (nested `transform` over the sorted brand set — SON's map phase)
    after Apriori frequent-singleton pruning, so the hash match proves
    the pruned local-generation plan computes exactly the naive
    semantics. One shuffle for baskets, one for the triple counts; the
    part dim rides a broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    # Round-14 (guide §3.3/§5): the basket relation feeds the total
    # count, the Apriori singleton pass AND the pruned candidate
    # generation — materialize the distinct once per invocation
    # instead of replaying the join+distinct three times
    baskets = barrier(
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("br"))
        .distinct()
    )
    total = baskets.agg(F.count_distinct("ok").alias("n"))
    # Apriori prune: keep only brands that are themselves frequent.
    freq1 = (
        baskets.groupBy("br")
        .agg(F.count(F.lit(1)).alias("c"))
        .join(F.broadcast(total), F.col("c") >= MIN_SUPPORT_FRAC * F.col("n"))
        .select("br")
    )
    pruned = baskets.join(F.broadcast(freq1), "br", "left_semi")
    # SON map phase: per-basket local 3-combination generation (sorted,
    # so each triple is emitted in canonical order exactly once).
    combos = (
        pruned.groupBy("ok")
        .agg(F.sort_array(F.collect_set("br")).alias("arr"))
        .select(
            F.explode(
                F.expr(
                    """flatten(flatten(transform(arr, (a, i) ->
                         transform(slice(arr, i + 2, size(arr)), (b, j) ->
                           transform(slice(arr, i + j + 3, size(arr)), c ->
                             struct(a AS brand1, b AS brand2,
                                    c AS brand3))))))"""
                )
            ).alias("t")
        )
        .select("t.brand1", "t.brand2", "t.brand3")
    )
    counted = combos.groupBy("brand1", "brand2", "brand3").agg(
        F.count(F.lit(1)).alias("support")
    )
    return (
        counted.join(F.broadcast(total))
        .filter(
            F.col("support").cast("double")
            >= F.lit(MIN_SUPPORT_FRAC) * F.col("n")
        )
        .select(
            "brand1",
            "brand2",
            "brand3",
            "support",
            F.round(F.col("support").cast("double") / F.col("n"), 6).alias(
                "support_ratio"
            ),
        )
        .orderBy(
            F.col("support").desc(), "brand1", "brand2", "brand3"
        )
        .limit(20)
    )
