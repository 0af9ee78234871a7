"""Generic as-of join — align each left row with the latest right
row at-or-before it per key.

Spark has no native ASOF JOIN; the scalable formulation is the
union-window trick: tag both sides, union, sort each key's timeline
once, carry the last right value forward, keep left rows. One
shuffle on the key, no range cross-product, no per-key Python —
survives arbitrarily many rows per key (vs. merge_asof-per-group,
which needs the whole key group in one pandas frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach the most recent right row with
    right.on <= left.on and right.by == left.by.

    ``value_cols``: right columns to carry (default: all but on/by).
    Right rows tie-broken to sort before left rows at equal
    timestamps (inclusive match, pd.merge_asof semantics).

    The right side is carried as ONE struct of all value columns, so
    the entire most-recent right row wins atomically — a NULL in one
    of its columns stays NULL rather than letting an older row's
    value bleed through for just that column (which a per-column
    ``last(ignorenulls)`` would do).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, by)]

    rights = right.select(
        by,
        on,
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__r"),
    )
    for c in left.columns:
        if c not in (on, by):
            rights = rights.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    lefts = left.withColumn("__side", F.lit(1)).withColumn(
        "__r", F.lit(None).cast(rights.schema["__r"].dataType)
    )

    unioned = lefts.unionByName(rights)
    w = (
        W.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *[c for c in left.columns],
        "__side",
        F.last("__r", ignorenulls=True).over(w).alias("__match"),
    )
    return carried.filter(F.col("__side") == 1).select(
        *[c for c in left.columns],
        *[F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
