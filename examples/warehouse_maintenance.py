#!/usr/bin/env python3
"""Lakehouse table-maintenance walkthrough — the operational side of
running this engine against a growing 100 TB warehouse:

    orders parquet
      -> table_profile        (ANALYZE: null rates, distincts, min/max)
      -> key_skew_report      (is o_custkey safe to join/partition on?)
      -> write_zordered       (cluster on (custkey, orderdate) so both
                               predicates prune row groups)
      -> compact_parquet      (bin-pack the small files a streaming
                               writer leaves behind)
      -> merge_upsert         (apply a CDC change batch)
      -> scd2_build           (dimension history for priority changes)

Run:  python examples/warehouse_maintenance.py [sf_dir] [work_dir]
(defaults: /root/testdata/sf0.001 -> /tmp/warehouse_demo)
"""

from __future__ import annotations

import os
import shutil
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xml_to_sqlite3_spark.operators.curation import (  # noqa: E402
    merge_upsert,
    scd2_build,
    table_profile,
)
from xml_to_sqlite3_spark.operators.skew import skew_report  # noqa: E402
from xml_to_sqlite3_spark.session import get_spark  # noqa: E402
from xml_to_sqlite3_spark.sinks.parquet_sink import (  # noqa: E402
    compact_parquet,
    write_zordered,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/warehouse_demo"
    shutil.rmtree(work, ignore_errors=True)
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))

    print("== 1. profile (ANALYZE)")
    table_profile(orders, ["o_orderkey", "o_custkey", "o_orderpriority"]).show(
        truncate=False
    )

    print("== 2. join-key skew check")
    skew_report(orders, "o_custkey", top=5).show()

    print("== 3. z-ordered rewrite on (o_custkey, o_orderdate)")
    zpath = os.path.join(work, "orders_z")
    write_zordered(
        orders.withColumn("o_custkey_d", F.col("o_custkey").cast("double"))
        .withColumn("o_date_d", F.unix_timestamp("o_orderdate").cast("double")),
        zpath,
        ["o_custkey_d", "o_date_d"],
        n_files=8,
    )
    print("   wrote", len(os.listdir(zpath)), "files")

    print("== 4. compact a shattered copy")
    shattered = os.path.join(work, "orders_small_files")
    orders.repartition(64).write.parquet(shattered)
    n = compact_parquet(spark, shattered, os.path.join(work, "orders_compacted"),
                        target_file_bytes=1 << 20)
    print(f"   64 files -> {n}")

    print("== 5. CDC merge (cancel every 100th order, bump priority on every 101st)")
    changes = orders.filter(F.col("o_orderkey") % 100 <= 1).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        F.when(F.col("o_orderkey") % 100 == 1, F.lit("1-URGENT"))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
        F.when(F.col("o_orderkey") % 100 == 0, F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
    )
    merged = merge_upsert(orders, changes, key_col="o_orderkey")
    print("   rows:", orders.count(), "->", merged.count())

    print("== 6. SCD2 history of per-customer priority changes")
    log = orders.select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderpriority").alias("value"),
    )
    scd2_build(log).filter(F.col("is_current")).groupBy("value").count().show()

    spark.stop()


if __name__ == "__main__":
    main()
