"""Distributed global rank — consecutive row numbers under a total
order WITHOUT a single-partition sort.

The naive `row_number().over(Window.orderBy(...))` funnels the whole
dataset through ONE task (Spark plans `Exchange SinglePartition` +
`WindowExec`) — the canonical local-mode-works / cluster-dies trap. The
scale-correct recipe, implemented here entirely with JVM-side builtins:

1. `repartitionByRange(N, keys)` — the same range shuffle any global
   sort (or Z-order write) pays; partition p's keys all sort before
   partition p+1's.
2. `sortWithinPartitions(keys)` — map-side sort, no extra shuffle.
3. local row number from `monotonically_increasing_id()`: the id is
   (partition_index << 33) + row_index-in-partition (documented layout),
   computed AFTER the sort, so `id - (spark_partition_id() << 33) + 1`
   is the 1-based rank within the partition. Nondeterministic-expression
   fencing stops Catalyst from reordering it across the sort.
4. per-partition counts (a two-phase aggregate down to N rows) →
   cumulative offsets via a window over those N rows (bounded by the
   partition count, never by data — the exact "post-aggregation spine"
   pattern) → broadcast-joined back on the partition id.

Cost at 100 TB: one range shuffle of the projected columns + one
broadcast of N offset rows. No stage sees more than |data|/N rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# monotonically_increasing_id packs the partition index above bit 33
_MID_PARTITION_SHIFT = 33


def with_global_rank(
    df: DataFrame,
    order_cols: list[str | Column],
    rank_col: str = "rn",
    num_ranges: int | None = None,
) -> DataFrame:
    """Add `rank_col` = 1-based consecutive global rank of each row under
    `order_cols` (which must be a total order — include a unique
    tiebreaker, or ties get an arbitrary but deterministic order within
    their range partition)."""
    spark = df.sparkSession
    n = num_ranges or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    parted = df.repartitionByRange(n, *order_cols).sortWithinPartitions(
        *order_cols
    )
    tagged = (
        parted.withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_lrn",
            F.monotonically_increasing_id()
            - F.shiftleft(F.col("_pid").cast("long"), _MID_PARTITION_SHIFT)
            + F.lit(1),
        )
    )
    counts = tagged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    # cumulative offsets over |partitions| rows — bounded by cluster
    # fan-out, not by data size; this is the only unpartitioned window
    # and its input is post-aggregation
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_cnt").over(woff), F.lit(0)).alias("_off")
    )
    return (
        tagged.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.col("_lrn") + F.col("_off")).cast("long"))
        .drop("_pid", "_lrn", "_off")
    )

