"""Z-ordered parquet layout: row-group min/max statistics must serve
predicates on EVERY z-ordered dimension, not just a leading sort key.

The test measures actual prunability from the written files' parquet
footers (pyarrow): for a small 2-D box predicate, the fraction of row
groups whose [min, max] ranges overlap the box — what Spark's scan
would have to read — must be far smaller under the Z layout than
under a layout sorted on one column only.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from xml_to_sqlite3_spark.sinks.parquet_sink import write_zordered


def _overlap_fraction(path: str, x_rng, y_rng) -> float:
    """Fraction of row groups whose (x, y) stat ranges intersect the
    query box — the lower bound on what any stats-based reader scans."""
    hit = total = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            sx = g.column(names["x"]).statistics
            sy = g.column(names["y"]).statistics
            total += 1
            if (
                sx.min <= x_rng[1]
                and sx.max >= x_rng[0]
                and sy.min <= y_rng[1]
                and sy.max >= y_rng[0]
            ):
                hit += 1
    assert total >= 6, f"need enough row groups to measure, got {total}"
    return hit / total


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    # two independent pseudo-shuffled dimensions over [0, 1000)
    df = (
        spark.range(200_000)
        .select(
            F.col("id"),
            (F.col("id") % 1000).alias("x"),
            ((F.col("id") * 7919) % 1000).alias("y"),
        )
    )
    plain = str(tmp_path / "plain")
    zpath = str(tmp_path / "zordered")
    # baseline: sorted on x only — serves x, blind on y
    (
        df.repartitionByRange(8, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(plain)
    )
    write_zordered(df, zpath, ["x", "y"], n_files=8)

    # The sharp, deterministic property: the x-sorted layout is
    # completely BLIND on y — every row group spans all of y, so a
    # y-only predicate prunes nothing (fraction exactly 1.0) — while
    # the Z layout fixes y's high bits per z-range and prunes most
    # groups. A 2-D-box comparison at 8-row-group granularity is a
    # coin flip on range-partitioner boundary placement (both
    # layouts quantize to multiples of 1/8 and measured equal in
    # shared-suite runs), so assert the y-only property instead.
    y_only = ((0, 1000), (100, 150))  # x unconstrained, y selective
    plain_frac = _overlap_fraction(plain, *y_only)
    z_frac = _overlap_fraction(zpath, *y_only)
    assert plain_frac == 1.0, plain_frac
    # y buckets 25..38 pin y7=y6=0; any contiguous 1/8 z-range fixes
    # (y7, x7, y6) -> 2 of 8 partitions ideally, <=0.5 with a
    # sampling-shifted boundary adding one group.
    assert z_frac <= 0.5, (z_frac, plain_frac)

    # and the 2-D box never does WORSE under z than under x-sort
    box = ((100, 150), (100, 150))  # ~0.25% of the 2-D space
    assert _overlap_fraction(zpath, *box) <= _overlap_fraction(plain, *box)

    # and the data itself round-trips
    back = spark.read.parquet(zpath)
    assert back.count() == 200_000
    assert back.filter((F.col("x") == 123) & (F.col("y") == 437)).count() == (
        df.filter((F.col("x") == 123) & (F.col("y") == 437)).count()
    )


def test_compact_parquet_binpacks_small_files(spark, tmp_path):
    from xml_to_sqlite3_spark.sinks.parquet_sink import compact_parquet

    src = str(tmp_path / "shattered")
    dst = str(tmp_path / "compacted")
    # 64 tiny files
    spark.range(100_000).withColumn("v", F.col("id") * 2).repartition(64).write.parquet(src)
    import glob
    import os

    n_in = len(glob.glob(f"{src}/*.parquet"))
    assert n_in >= 60
    total = sum(os.path.getsize(p) for p in glob.glob(f"{src}/*.parquet"))
    target = total // 4  # aim for ~4-5 files
    n_out = compact_parquet(spark, src, dst, target_file_bytes=target)
    assert n_out <= 6, n_out
    assert n_out >= 2, n_out
    # data round-trips exactly
    back = spark.read.parquet(dst)
    assert back.count() == 100_000
    assert back.agg(F.sum("v")).first()[0] == spark.read.parquet(src).agg(F.sum("v")).first()[0]
