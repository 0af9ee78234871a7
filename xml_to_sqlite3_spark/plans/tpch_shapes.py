"""Join-strategy OLAP shapes — with plans/olap.py (Q1/Q3/Q5/Q6) this
module completes ALL 22 TPC-H query shapes (the testdata carries no
partsupp table, so Q2/Q9/Q11/Q16/Q20 derive the part<->supplier
association and its cost from lineitem — documented per query) plus
event funnel / cohort-retention analytics.

The core surface (plans/olap.py) covers the scan/agg/snowflake
shapes; this module adds the query shapes whose value
is the JOIN STRATEGY they force Catalyst to pick:

- left-semi with a non-equi residual (Q4: EXISTS over lineitem)
- left-anti + a 1-row scalar-subquery broadcast (Q22: NOT EXISTS)
- left-outer feeding a second aggregation (Q13: order-count
  distribution — the outer join must preserve order-less customers)
- self-aliased dimension reused on two join paths (Q7: supplier
  nation x customer nation)
- group-filter (HAVING) before the enrichment join (Q18)
- conditional aggregation after a fact-fact join (Q12, Q14)

All are declarative DataFrame plans: equi-keys drive shuffle or
broadcast joins (nation is hinted broadcast; everything else is left
to AQE so the same plan scales to a 100 TB fact side), residual
predicates ride along as join conditions, and every aggregate is
map-side partial first. Oracle parity notes: DuckDB widens sum(int)
to HUGEINT and EXTRACT(year) to BIGINT — every such column is CAST
back to the exact Spark dtype in the oracle SQL (same class as
commit e1680c1).

Reference anchor: the reference's query surface is "run SQL over the
extracted graph" (README Example Queries, examples/sql_queries.md);
these are the standard relational shapes that surface generalizes to
on the driver's TPC-H-ish tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..io_util import load


def _exact_disc_price():
    """Discounted price as EXACT decimal arithmetic.

    The testdata's prices/discounts are 2-decimal values stored as
    doubles; a double SUM over them is accumulation-order-dependent,
    so Spark and DuckDB can disagree in the last rounded cent (and at
    1000 executors the Spark result would not even be stable run to
    run). Casting both factors to decimal(18,4) is value-exact here,
    and a decimal SUM is associative — deterministic at any scale.
    The oracle SQL mirrors the same casts.
    """
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    keep = (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
    return price * keep


_EXACT_DISC_PRICE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))"
)


def q4_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: orders (one quarter) with at least one lineitem
    shipped >30 days after the order date, counted by priority.

    LEFT SEMI join — the equi-key (orderkey) drives the shuffle; the
    date residual rides as the join condition, so no fact-fact
    materialization and each order is counted once no matter how
    many lineitems are late.
    """
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: shipping volume between two nation pairs by year.

    The nation dimension is aliased TWICE — once on the supplier
    path, once on the customer path — and broadcast on both; the
    cross-pair predicate applies after both joins resolve.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") < F.col("cust_nation"))
        | (F.col("supp_nation") > F.col("cust_nation"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.round(F.sum(_exact_disc_price()), 2)
            .cast("double")
            .alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_ORACLE = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
       CAST(round(sum({disc}), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
""".format(disc=_EXACT_DISC_PRICE_SQL)


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: top-20 customers by revenue lost to returns in one
    quarter. Multi-join fact aggregation with a deterministic top-k
    (unique custkey tie-break below the rounded revenue sort).
    """
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(_exact_disc_price()), 2)
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_ORACLE = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(round(sum({disc}), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""".format(disc=_EXACT_DISC_PRICE_SQL)


def q12_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape (adapted — the driver schema has no l_shipmode):
    conditional priority counts per ship-latency bucket. The
    CASE-sum aggregation runs after an orderkey equi-join.
    """
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    lat = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(lat <= 30, "0-30d").when(lat <= 90, "31-90d").otherwise("90d+")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(bucket.alias("latency_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("latency_bucket")
    )


Q12_ORACLE = """
SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 30 THEN '0-30d'
            WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 90 THEN '31-90d'
            ELSE '90d+' END AS latency_bucket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
ORDER BY 1
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: distribution of per-customer order counts.

    LEFT OUTER join with the filter ON THE JOIN (not a WHERE — a
    where-filter would silently turn the join inner and drop
    zero-order customers), then a second aggregation over the first.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: promo revenue share for one ship-month —
    conditional aggregation over a part equi-join, 1-row result.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    disc = _exact_disc_price()
    zero = F.lit(0).cast("decimal(18,4)") * F.lit(0).cast("decimal(18,4)")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(zero))
                .cast("double")
                / F.sum(disc).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


Q14_ORACLE = """
SELECT round(100 * CAST(sum(CASE WHEN p_type = 'PROMO'
                                 THEN {disc}
                                 ELSE CAST(0 AS DECIMAL(18,4)) * CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(sum({disc}) AS DOUBLE), 6) AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate <  TIMESTAMP '1996-04-01'
""".format(disc=_EXACT_DISC_PRICE_SQL)


def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: orders whose total quantity exceeds a threshold,
    enriched with the customer. The HAVING-filter aggregation runs
    FIRST so only the (few) qualifying orderkeys reach the joins —
    at scale the filtered aggregate is broadcast-sized.
    """
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


Q18_ORACLE = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150)
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def q22_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: customers with above-average balance and NO urgent
    orders, per nation. Two strategies in one plan: the global
    average is a 1-row broadcast (scalar subquery), the NOT EXISTS
    is a LEFT ANTI join against the filtered orders side.
    """
    c = load(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    urgent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    rich = (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
    )
    return (
        rich.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            # acctbal is 2-decimal data in a double column — sum it
            # as exact decimal for order-independence (same reason
            # as _exact_disc_price)
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


Q22_ORACLE = """
SELECT c_nationkey, count(*) AS numcust,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel: view -> click -> purchase per user,
    each later stage strictly after the user's earliest completion
    of the previous one. Returns one row of stage-reach counts.

    Shape: three stage aggregations, each one hash-agg over the
    (already user-partitioned) events plus an equi-join on user_id —
    never a cross-stage window over the whole corpus. At 100 TB each
    stage's output is |users| rows, and the joins co-partition on
    user_id so AQE folds them into one shuffle exchange chain.
    """
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    # GLOBAL aggregates, not groupBy-on-a-literal: a global agg
    # returns its 1 row (count = 0) even over an empty stage, so a
    # corpus with zero purchases still yields (n, m, 0) — matching
    # the oracle's scalar subqueries — instead of vanishing.
    return (
        t1.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(t2.agg(F.count(F.lit(1)).alias("n_click")))
        .crossJoin(t3.agg(F.count(F.lit(1)).alias("n_purchase")))
    )


FUNNEL_ORACLE = """
WITH t1 AS (SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id),
     t2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
            JOIN t1 ON e.user_id = t1.user_id
            WHERE e.event_type = 'click' AND e.ts > t1.t1
            GROUP BY e.user_id),
     t3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
            JOIN t2 ON e.user_id = t2.user_id
            WHERE e.event_type = 'purchase' AND e.ts > t2.t2
            GROUP BY e.user_id)
SELECT (SELECT count(*) FROM t1) AS n_view,
       (SELECT count(*) FROM t2) AS n_click,
       (SELECT count(*) FROM t3) AS n_purchase
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their
    first event; for each (cohort week, weeks-since) cell, how many
    distinct cohort members were active.

    One window-min per user partition assigns cohorts without a
    second scan-join; both week columns truncate to Monday so the
    day-difference is an exact multiple of 7.
    """
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    first_ts = F.min("ts").over(W.partitionBy("user_id"))
    cohort = F.date_trunc("week", first_ts).cast("date")
    week = F.date_trunc("week", F.col("ts")).cast("date")
    return (
        ev.select(
            "user_id",
            cohort.alias("cohort_week"),
            (F.datediff(week, cohort) / 7).cast("int").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


COHORT_ORACLE = """
WITH firsts AS (
  SELECT user_id, ts,
         min(ts) OVER (PARTITION BY user_id) AS first_ts
  FROM events
)
SELECT CAST(date_trunc('week', first_ts) AS DATE) AS cohort_week,
       CAST(date_diff('day', date_trunc('week', first_ts),
                      date_trunc('week', ts)) / 7 AS INTEGER) AS week_offset,
       count(DISTINCT user_id) AS active_users
FROM firsts
GROUP BY 1, 2
ORDER BY 1, 2
"""


QUERIES = {
    "q4_late_shipments": q4_late_shipments,
    "q7_volume_shipping": q7_volume_shipping,
    "q10_returned_items": q10_returned_items,
    "q12_ship_latency": q12_ship_latency,
    "q13_customer_distribution": q13_customer_distribution,
    "q14_promo_effect": q14_promo_effect,
    "q18_large_volume": q18_large_volume,
    "q22_inactive_customers": q22_inactive_customers,
    "funnel_conversion": funnel_conversion,
    "cohort_retention": cohort_retention,
}

ORACLES = {
    "q4_late_shipments": Q4_ORACLE,
    "q7_volume_shipping": Q7_ORACLE,
    "q10_returned_items": Q10_ORACLE,
    "q12_ship_latency": Q12_ORACLE,
    "q13_customer_distribution": Q13_ORACLE,
    "q14_promo_effect": Q14_ORACLE,
    "q18_large_volume": Q18_ORACLE,
    "q22_inactive_customers": Q22_ORACLE,
    "funnel_conversion": FUNNEL_ORACLE,
    "cohort_retention": COHORT_ORACLE,
}


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: the revenue view + scalar-max selection — the
    aggregate is computed ONCE, its max becomes a 1-row broadcast,
    and the equality filter picks the winner(s) without a second
    pass over lineitem (the correlated-subquery formulation would
    re-aggregate per candidate)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(_exact_disc_price()), 2).cast("double").alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    s = load(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey,
         CAST(round(sum({_EXACT_DISC_PRICE_SQL}), 2) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated scalar subquery DECORRELATED — the
    per-part average quantity is one group-aggregate joined back to
    the fact, never a per-row re-aggregation. Exactness at scale:
    the per-part quantity sum is decimal (order-independent); the
    0.2x-average threshold is then one double division from exact
    integers, identical on every engine."""
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    li = load(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("qty_threshold")
    )
    small = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
    )
    return small.agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double")
            / 7.0,
            2,
        ).alias("avg_yearly")
    )


Q17_ORACLE = """
WITH per_part AS (
  SELECT l_partkey AS pk,
         0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                / count(*)) AS qty_threshold
  FROM lineitem GROUP BY l_partkey
)
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0,
             2) AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN per_part ON l_partkey = pk
WHERE p_brand = 'Brand#23' AND l_quantity < qty_threshold
"""


def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: three OR-ed (brand, size-range, quantity-range)
    predicate groups spanning BOTH join sides. The equi-key
    (partkey) still drives one hash join; the disjunction rides as a
    residual — Catalyst additionally pushes the per-table derivable
    parts (brand/size union on part, quantity envelope on lineitem)
    below the join, so neither side full-scans."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    g1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    g2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    g3 = (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(g1 | g2 | g3).agg(
        F.round(F.sum(_exact_disc_price()), 2).cast("double").alias("revenue")
    )


Q19_ORACLE = f"""
SELECT CAST(round(sum({_EXACT_DISC_PRICE_SQL}), 2) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


def q21_sole_returned_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (adapted to the available columns): double
    correlation — suppliers whose item was RETURNED in a
    multi-supplier order where NO other supplier's item was
    returned. EXISTS becomes a left-semi join, NOT EXISTS a
    left-anti, both on the orderkey equi-key with the
    different-supplier residual — never a per-row subquery."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    returned = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    ).distinct()
    # r15: no .distinct() on the semi-join probe side — a left-semi
    # join is insensitive to right-side duplicates, and the distinct
    # shuffled the FULL (orderkey, suppkey) projection once just to
    # shuffle its dedup'd form again for the join (guide §2.4:
    # shuffle N rows once beats N + D twice; lineitem rarely repeats
    # a (order, supplier) pair, so D ≈ N here)
    others = li.select(
        F.col("l_orderkey").alias("o_ok"), F.col("l_suppkey").alias("o_sk")
    )
    # same frame as `returned`, re-aliased — reuse it instead of
    # recomputing the filter+distinct (correct either way, but this
    # does not depend on Catalyst exchange-reuse firing)
    others_r = returned.select(
        F.col("l_orderkey").alias("r_ok"), F.col("l_suppkey").alias("r_sk")
    )
    sole = (
        returned.join(
            others,
            (F.col("l_orderkey") == F.col("o_ok"))
            & (F.col("l_suppkey") != F.col("o_sk")),
            "left_semi",
        )
        .join(
            others_r,
            (F.col("l_orderkey") == F.col("r_ok"))
            & (F.col("l_suppkey") != F.col("r_sk")),
            "left_anti",
        )
    )
    return (
        sole.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


Q21_ORACLE = """
WITH returned AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'
)
SELECT s_name, count(*) AS numwait
FROM returned r
JOIN supplier ON r.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = r.l_orderkey
                AND l2.l_suppkey <> r.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = r.l_orderkey
                    AND l3.l_suppkey <> r.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


QUERIES["q15_top_supplier"] = q15_top_supplier
ORACLES["q15_top_supplier"] = Q15_ORACLE
QUERIES["q17_small_quantity"] = q17_small_quantity
ORACLES["q17_small_quantity"] = Q17_ORACLE
QUERIES["q19_disjunctive_predicates"] = q19_disjunctive_predicates
ORACLES["q19_disjunctive_predicates"] = Q19_ORACLE
QUERIES["q21_sole_returned_supplier"] = q21_sole_returned_supplier
ORACLES["q21_sole_returned_supplier"] = Q21_ORACLE


# ---------------------------------------------------------------------------
# Round-7 additions: the remaining TPC-H shapes (Q2/Q8/Q9/Q11/Q16/Q20),
# completing the full 22-query join-strategy matrix. The testdata has no
# partsupp table, so the part<->supplier association (and its cost) is
# DERIVED from lineitem — the documented adaptation; every query keeps the
# join strategy its TPC-H original exists to force.
# ---------------------------------------------------------------------------


def _q2_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2's candidate frame BEFORE materialization — split out so the
    plan pin (tests/test_plans.py) can assert the broadcast-dim chain
    and single-pass supply aggregate, which the gate's checkpoint
    otherwise hides behind a Scan ExistingRDD."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 5) & (F.col("p_type") == "PROMO")
    )
    # r15: the (p_size, p_type) part filter is highly selective and
    # p_partkey is the part table's key, so semi-joining lineitem on
    # the broadcast filtered keys BEFORE the (pk, sk) aggregation
    # (guide §3.2: reduce the big side before shuffling it) drops the
    # groups the inner join was discarding AFTER the full-lineitem
    # shuffle. Result-identical: per-(pk, sk) minima are per-group
    # values, and the retained groups are exactly the ones the
    # part join kept.
    supply = (
        li.join(
            F.broadcast(p.select(F.col("p_partkey").alias("l_partkey"))),
            "l_partkey",
            "left_semi",
        )
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(
            F.round(
                F.min(
                    F.col("l_extendedprice").cast("decimal(18,4)")
                    / F.col("l_quantity").cast("decimal(18,4)")
                ).cast("double"),
                2,
            ).alias("supply_cost")
        )
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    return (
        p.join(supply, p.p_partkey == F.col("pk"))
        .join(eur, F.col("sk") == F.col("s_suppkey"))
        .select("p_partkey", "s_name", "s_acctbal", "n_name", "supply_cost")
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: correlated MIN subquery decorrelated into one
    group-aggregate + equality join back — the per-part minimum
    supply cost is computed ONCE over the candidate set, never
    re-aggregated per row. Supply cost is the minimum observed unit
    price per (part, supplier) from lineitem (exact decimal division,
    one double round at the end, mirrored in the oracle); candidate
    suppliers are restricted to one region through the
    supplier->nation->region broadcast-dim chain (plan-pinned on
    _q2_candidates)."""
    # cand feeds BOTH the per-part min aggregate and the equality
    # join back (repo two-consumer rule) — checkpoint so the
    # lineitem aggregation + dim joins run once, not per consumer
    cand = _q2_candidates(spark, sf_dir).localCheckpoint(eager=True)
    mins = cand.groupBy(F.col("p_partkey").alias("mpk")).agg(
        F.min("supply_cost").alias("min_cost")
    )
    return (
        cand.join(
            # mins is one row per surviving part — model-sized by
            # construction; after the checkpoint Catalyst has no size
            # estimate and falls back to a sort-merge join, so the
            # broadcast is forced (guide §3.1: estimates are often
            # wrong after opaque ops — hint when you know the size)
            F.broadcast(mins),
            (F.col("p_partkey") == F.col("mpk"))
            & (F.col("supply_cost") == F.col("min_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "supply_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_ORACLE = """
WITH supply AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         CAST(round(CAST(min(CAST(l_extendedprice AS DECIMAL(18,4))
                              / CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE),
                    2) AS DOUBLE) AS supply_cost
  FROM lineitem GROUP BY 1, 2
), eur AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), cand AS (
  SELECT p_partkey, s_name, s_acctbal, n_name, supply_cost
  FROM part JOIN supply ON p_partkey = pk JOIN eur ON sk = s_suppkey
  WHERE p_size = 5 AND p_type = 'PROMO'
), mins AS (
  SELECT p_partkey AS mpk, min(supply_cost) AS min_cost FROM cand GROUP BY 1
)
SELECT s_acctbal, s_name, n_name, p_partkey, supply_cost
FROM cand JOIN mins ON p_partkey = mpk AND supply_cost = min_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: national market share — an 8-table star with the
    nation dimension joined TWICE under different roles (customer's
    region gate, supplier's nationality), and a conditional-share
    aggregation (sum(CASE)/sum) per year. Both sums accumulate exact
    decimals; the share is one double division rounded to 6."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1996-12-31").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = _exact_disc_price()
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(zero)
                ).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_ORACLE = f"""
WITH all_nations AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         {_EXACT_DISC_PRICE_SQL} AS volume, n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  JOIN part ON l_partkey = p_partkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
)
SELECT o_year,
       CAST(round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                  / CAST(sum(volume) AS DOUBLE), 6) AS DOUBLE) AS mkt_share
FROM all_nations GROUP BY o_year ORDER BY o_year
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: product-type profit by nation and year — a LIKE
    filter on the part dimension, a five-table join, and an exact
    decimal profit expression (revenue minus a cost term; with no
    partsupp table the unit cost is the documented 0.5 x
    p_retailprice proxy, rounded to cents BEFORE the decimal
    multiply so both engines accumulate identical exact values)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    cost = F.round(F.lit(0.5) * F.col("p_retailprice"), 2).cast(
        "decimal(18,4)"
    ) * F.col("l_quantity").cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(
            F.round(F.sum(_exact_disc_price() - cost).cast("double"), 2).alias(
                "sum_profit"
            )
        )
        .orderBy("nation", F.desc("o_year"))
    )


Q9_ORACLE = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
       CAST(round(CAST(sum({_EXACT_DISC_PRICE_SQL}
                 - CAST(round(0.5 * p_retailprice, 2) AS DECIMAL(18,4))
                   * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2)
            AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%bolt%'
GROUP BY 1, 2 ORDER BY 1, 2 DESC
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: group-aggregate + HAVING against a GLOBAL scalar —
    the per-part value (one nation's suppliers, lineitem-derived) is
    aggregated once, its grand total becomes a 1-row broadcast, and
    the fraction threshold filters without re-aggregating. Both the
    per-part and total sums are exact decimals; the comparison runs
    on their (identical-on-any-engine) double casts."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    nat_value = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(_exact_disc_price()).alias("__val"))
    )
    total = nat_value.agg(F.sum("__val").alias("__tot"))
    return (
        nat_value.crossJoin(F.broadcast(total))
        .filter(
            F.col("__val").cast("double") > F.col("__tot").cast("double") * 0.002
        )
        .select(
            "p_partkey",
            F.round(F.col("__val").cast("double"), 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


Q11_ORACLE = f"""
WITH nat_value AS (
  SELECT l_partkey AS pk, sum({_EXACT_DISC_PRICE_SQL}) AS val
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_1' GROUP BY 1
), total AS (SELECT sum(val) AS tot FROM nat_value)
SELECT pk AS p_partkey, CAST(round(CAST(val AS DOUBLE), 2) AS DOUBLE) AS part_value
FROM nat_value, total
WHERE CAST(val AS DOUBLE) > CAST(tot AS DOUBLE) * 0.002
ORDER BY part_value DESC, p_partkey
"""


def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: supplier-count distribution over part attributes
    with a NOT-IN exclusion — the excluded-supplier set (negative
    account balance, the available stand-in for Q16's complaint
    comment) leaves by a broadcast LEFT ANTI join before the
    count-distinct; the association is the lineitem (part, supplier)
    projection — NOT pre-distinct'd (r15): the final
    countDistinct(l_suppkey) dedups per group anyway (its partial
    aggregate dedups map-side), p_partkey is unique in part so the
    broadcast join cannot multiply a (part, supplier) pair into a
    different group, and the anti join ignores right-side dupes —
    the old .distinct() was a full extra shuffle of the projection
    for zero result change (guide §2.4)."""
    li = load(spark, sf_dir, "lineitem")
    assoc = li.select("l_partkey", "l_suppkey")
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    return (
        assoc.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_ORACLE = """
WITH assoc AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM assoc
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#9' AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: nested EXISTS/IN chain flattened into decorrelated
    aggregates + semi-joins — suppliers in one nation who shipped
    more than 20%% of a small-part's total 1996 volume (the
    availqty > 0.5 x shipped test of the original, re-expressed over
    the lineitem-derived association). The per-(part, supplier) and
    per-part sums share one scan; the supplier filter is a final
    broadcast semi-join, never a correlated subquery."""
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    shipped = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
    )
    totals = shipped.groupBy("pk").agg(F.sum("qty").alias("total_qty"))
    dominant = (
        shipped.join(totals, "pk")
        .filter(
            F.col("qty").cast("double") > F.col("total_qty").cast("double") * 0.2
        )
        .select(F.col("sk").alias("s_suppkey"))
        .distinct()
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(dominant), "s_suppkey", "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


Q20_ORACLE = """
WITH small_parts AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
shipped AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
  FROM lineitem JOIN small_parts ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY 1, 2
), totals AS (SELECT pk, sum(qty) AS total_qty FROM shipped GROUP BY 1),
dominant AS (
  SELECT DISTINCT sk FROM shipped JOIN totals USING (pk)
  WHERE CAST(qty AS DOUBLE) > 0.2 * CAST(total_qty AS DOUBLE)
)
SELECT s_name, CAST(round(s_acctbal, 2) AS DOUBLE) AS s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_2' AND s_suppkey IN (SELECT sk FROM dominant)
ORDER BY s_name
"""


QUERIES["q2_min_cost_supplier"] = q2_min_cost_supplier
ORACLES["q2_min_cost_supplier"] = Q2_ORACLE
QUERIES["q8_market_share"] = q8_market_share
ORACLES["q8_market_share"] = Q8_ORACLE
QUERIES["q9_product_profit"] = q9_product_profit
ORACLES["q9_product_profit"] = Q9_ORACLE
QUERIES["q11_important_parts"] = q11_important_parts
ORACLES["q11_important_parts"] = Q11_ORACLE
QUERIES["q16_supplier_counts"] = q16_supplier_counts
ORACLES["q16_supplier_counts"] = Q16_ORACLE
QUERIES["q20_dominant_suppliers"] = q20_dominant_suppliers
ORACLES["q20_dominant_suppliers"] = Q20_ORACLE
