"""One-off verification probe: untouched partitions must be byte-identical
after upsert_by_partition (dynamic overwrite really is surgical)."""

import hashlib
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from novelti_dingo_spark.pipelines import upsert_by_partition
from novelti_dingo_spark.session import get_spark
from novelti_dingo_spark.sources import load_table


def main():
    s = get_spark("upsert-probe")
    s.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp() + "/target"
    orders = load_table(s, "/root/testdata/sf0.001", "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    orders.write.partitionBy("order_year").parquet(d)

    def digest(year):
        h = hashlib.sha256()
        for f in sorted(pathlib.Path(f"{d}/order_year={year}").glob("*.parquet")):
            h.update(f.read_bytes())
        return h.hexdigest()[:12]

    years = (1995, 1997, 2000)
    before = {y: digest(y) for y in years}
    updates = (
        orders.filter(F.col("order_year") == 1996)
        .limit(5)
        .withColumn("o_orderpriority", F.lit("X"))
    )
    upsert_by_partition(s, d, updates, key="o_orderkey", partition_col="order_year")
    after = {y: digest(y) for y in years}
    print("untouched partitions byte-identical:", before == after)
    n = s.read.parquet(d).filter(F.col("o_orderpriority") == "X").count()
    print("updated rows visible:", n)


if __name__ == "__main__":
    main()
