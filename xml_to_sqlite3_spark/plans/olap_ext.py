"""Extended OLAP surface: semi-structured JSON extraction, rollup
subtotals, and pivot — rounding out the engine's relational
capabilities (the reference's SQLite surface offers json1/group by;
these are the Spark-first equivalents, each oracle-checked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io_util import load


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pull a typed value out of the semi-structured props JSON
    column and aggregate it — get_json_object stays JVM-side."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


EVENTS_JSON_ORACLE = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals: status x priority with ROLLUP
    (grand total + per-status subtotals in one pass)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


ORDERS_ROLLUP_ORACLE = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-month x event-type count matrix via pivot (fixed
    column list so the plan is single-pass, no collect for values)."""
    ev = load(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.select(F.dayofmonth("ts").alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", types)
        .count()
        .orderBy("day")
    )
    # pivot leaves null for empty cells; normalize to 0 like the
    # oracle's conditional sums
    return out.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
    )


EVENTS_PIVOT_ORACLE = """
SELECT CAST(day(ts) AS INT) AS day,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
FROM events GROUP BY 1 ORDER BY 1
"""


def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group (same linear-interpolation
    definition as Spark `percentile` / DuckDB `quantile_cont`),
    computed via operators/curation.exact_percentiles — the
    sketch-then-refine helper (percentile_approx band + exact
    in-band refinement, proven bit-identical to the builtin) — NOT
    Spark's exact `percentile` aggregate, whose buffer materializes
    each group's full value multiset in one aggregation state: fine
    at sf0.1, a memory cliff on a 100 TB column. The long (group,
    tag, value) result pivots to wide via a conditional max over the
    model-sized (3 groups x 3 tags) table."""
    from ..operators.curation import exact_percentiles

    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    return (
        exact_percentiles(
            li,
            "l_extendedprice",
            [0.5, 0.9, 0.99],
            group_cols=["l_returnflag"],
            tags=["p50", "p90", "p99"],
        )
        .groupBy("l_returnflag")
        .agg(
            *(
                F.round(
                    F.max(F.when(F.col("tag") == t, F.col("value"))), 4
                ).alias(t)
                for t in ("p50", "p90", "p99")
            )
        )
        .orderBy("l_returnflag")
    )


PRICE_PERCENTILES_ORACLE = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per customer over order time (running-sum
    window; bounded to one market segment to keep the gate compact)."""
    from pyspark.sql import Window as W

    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "MACHINERY")
    orders = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("c_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        )
        .orderBy("c_custkey", "o_orderdate", "o_orderkey")
    )


RUNNING_TOTALS_ORACLE = """
SELECT c_custkey, o_orderkey, o_orderdate,
       round(sum(o_totalprice) OVER (PARTITION BY c_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_total
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'MACHINERY'
ORDER BY c_custkey, o_orderdate, o_orderkey
"""


def cheapest_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group-minimum equality (TPC-H Q2 shape without partsupp):
    for each part size, the cheapest parts — correlated-subquery
    semantics via a window minimum, no second scan."""
    from pyspark.sql import Window as W

    # NULL p_size would form its own window partition and pass the
    # equality here while the oracle's correlated subquery (p2.p_size
    # = p.p_size) drops such rows — align on the subquery semantics
    part = load(spark, sf_dir, "part").filter(F.col("p_size").isNotNull())
    w = W.partitionBy("p_size")
    return (
        part.withColumn("min_price", F.min("p_retailprice").over(w))
        .filter(F.col("p_retailprice") == F.col("min_price"))
        .select("p_size", "p_partkey", "p_name", "p_retailprice")
        .orderBy("p_size", "p_partkey")
    )


CHEAPEST_PART_ORACLE = """
SELECT p_size, p_partkey, p_name, p_retailprice
FROM part p
WHERE p_retailprice = (SELECT min(p2.p_retailprice) FROM part p2 WHERE p2.p_size = p.p_size)
ORDER BY p_size, p_partkey
"""


QUERIES = {
    "events_json_extract": events_json_extract,
    "orders_rollup": orders_rollup,
    "events_pivot": events_pivot,
    "price_percentiles": price_percentiles,
    "running_totals": running_totals,
    "cheapest_part_supplier": cheapest_part_supplier,
}

ORACLES = {
    "events_json_extract": EVENTS_JSON_ORACLE,
    "orders_rollup": ORDERS_ROLLUP_ORACLE,
    "events_pivot": EVENTS_PIVOT_ORACLE,
    "price_percentiles": PRICE_PERCENTILES_ORACLE,
    "running_totals": RUNNING_TOTALS_ORACLE,
    "cheapest_part_supplier": CHEAPEST_PART_ORACLE,
}


def events_in_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval containment) join gate: assign every event to
    the session interval containing it via the bucketed range-join
    operator (operators/range_join.py — interval explode + equi-join
    on (user, bucket) + exact predicate; never a nested-loop theta
    join), then count matches per session. The oracle runs the naive
    BETWEEN theta join, so the bucketed rewrite is value-verified."""
    from ..operators.range_join import interval_join
    from .olap import sessionization

    sess = sessionization(spark, sf_dir).select(
        "user_id", "session_id", "session_start", "session_end"
    )
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    joined = interval_join(
        ev,
        sess,
        ts_col="ts",
        start_col="session_start",
        end_col="session_end",
        by=["user_id"],
        bucket_seconds=1800,
    )
    return (
        joined.groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
        .orderBy("user_id", "session_id")
    )


EVENTS_IN_SESSIONS_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts,
         -- floor() both sides: DuckDB epoch() is a fractional double while the
         -- Spark plan compares second-TRUNCATED longs (ts_seconds); an
         -- unfloored gap of e.g. 1800.7s would split a session only here
         CASE WHEN floor(epoch(ts)) - lag(floor(epoch(ts))) OVER (PARTITION BY user_id ORDER BY ts) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sess_rows AS (
  SELECT user_id, ts,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_id
  FROM flagged
), sess AS (
  SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end
  FROM sess_rows GROUP BY user_id, session_id
)
SELECT s.user_id, s.session_id, count(*) AS n_matched
FROM sess s
JOIN events e
  ON e.user_id = s.user_id
 AND e.ts BETWEEN s.session_start AND s.session_end
GROUP BY s.user_id, s.session_id
ORDER BY s.user_id, s.session_id
"""

QUERIES["events_in_sessions"] = events_in_sessions
ORACLES["events_in_sessions"] = EVENTS_IN_SESSIONS_ORACLE


def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over status x priority: every subtotal combination
    (both one-dimension margins + grand total) in one pass — the
    complement of orders_rollup's hierarchy-only subtotals."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


ORDERS_CUBE_ORACLE = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total,
       round(avg(o_totalprice), 2) AS avg_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def events_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-value deltas via lag: each event paired with
    the time gap and value change from the user's previous event —
    the change-detection window idiom (partitioned window, no global
    ordering)."""
    from pyspark.sql import Window as W

    from ..io_util import ts_seconds

    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "event_id",
            "user_id",
            "value",
            (ts_seconds(F.col("ts")) - F.lag(ts_seconds(F.col("ts"))).over(w))
            .cast("long")
            .alias("secs_since_prev"),
            F.round(F.col("value") - F.lag("value").over(w), 2).alias("value_delta"),
        )
        .orderBy("user_id", "event_id")
    )


EVENTS_DELTAS_ORACLE = """
SELECT event_id, user_id, value,
       -- floor each side BEFORE differencing: Spark's ts_seconds
       -- truncates each timestamp to whole seconds (cast long), so
       -- sub-second parts must not flow into the subtraction
       CAST(floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) AS BIGINT)
         AS secs_since_prev,
       round(value - lag(value) OVER w, 2) AS value_delta
FROM events
WHERE user_id < 50
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, event_id
"""


QUERIES["orders_cube"] = orders_cube
ORACLES["orders_cube"] = ORDERS_CUBE_ORACLE
QUERIES["events_deltas"] = events_deltas
ORACLES["events_deltas"] = EVENTS_DELTAS_ORACLE


def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics (operators/skew.py skew_report) on
    the events user_id key — the measurement half of the salting
    toolkit, run before committing a join strategy at scale."""
    from ..operators.skew import skew_report

    ev = load(spark, sf_dir, "events")
    return skew_report(ev, "user_id", top=15)


KEY_SKEW_REPORT_ORACLE = """
WITH counts AS (
  SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS cnt
  FROM events GROUP BY 1
), stats AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS total, count(*) AS n_keys FROM counts
)
SELECT key, cnt,
       round(cnt / CAST(total AS DOUBLE), 6) AS share,
       round(cnt / (CAST(total AS DOUBLE) / n_keys), 4) AS skew_ratio,
       CAST(ceil(cnt / (CAST(total AS DOUBLE) / n_keys)) AS INTEGER) AS suggested_salt
FROM counts, stats
ORDER BY cnt DESC, key
LIMIT 15
"""


QUERIES["key_skew_report"] = key_skew_report
ORACLES["key_skew_report"] = KEY_SKEW_REPORT_ORACLE


def cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE INTO (operators/curation.py merge_upsert): a change
    set derived deterministically from the documents table (doc_id%10
    == 0 -> delete, == 1 -> source rewritten '_v2') applied to the
    base — one full-outer equi-join, change rows win, deletes drop."""
    from ..operators.curation import merge_upsert

    docs = load(spark, sf_dir, "documents")
    changes = docs.filter(F.col("doc_id") % 10 <= 1).select(
        "doc_id",
        "text",
        "lang",
        F.when(F.col("doc_id") % 10 == 1, F.concat("source", F.lit("_v2")))
        .otherwise(F.col("source"))
        .alias("source"),
        "n_chars",
        F.when(F.col("doc_id") % 10 == 0, F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
    )
    return (
        merge_upsert(docs, changes, key_col="doc_id")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


CDC_MERGE_ORACLE = """
SELECT doc_id, lang,
       CASE WHEN doc_id % 10 = 1 THEN source || '_v2' ELSE source END AS source,
       n_chars
FROM documents
WHERE doc_id % 10 <> 0
ORDER BY doc_id
"""


def scd2_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 history build over the event stream: each user's
    event_type becomes a versioned dimension row with
    [valid_from, valid_to) effective ranges (operators/curation.py
    scd2_build) — the standard warehouse dimension-history shape,
    one shuffle on the key."""
    from ..operators.curation import scd2_build

    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    return scd2_build(
        ev, key_col="user_id", ts_col="ts", value_cols=("event_type",)
    ).orderBy("user_id", "valid_from", "event_type")


SCD2_EVENTS_ORACLE = """
SELECT user_id, event_type,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_type) AS valid_to,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_type) IS NULL AS is_current
FROM events
ORDER BY user_id, valid_from, event_type
"""


QUERIES["cdc_merge"] = cdc_merge
ORACLES["cdc_merge"] = CDC_MERGE_ORACLE
QUERIES["scd2_events"] = scd2_events
ORACLES["scd2_events"] = SCD2_EVENTS_ORACLE


def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style single-pass column statistics over orders
    (operators/curation.py table_profile) — null rates, exact
    distincts, min/max per column (double columns excluded from the
    gate: float->string formatting differs between engines; the
    operator itself is column-generic)."""
    from ..operators.curation import table_profile

    orders = load(spark, sf_dir, "orders")
    return table_profile(
        orders,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate", "o_orderpriority"],
    ).orderBy("column")


ORDERS_PROFILE_ORACLE = """
SELECT 'o_custkey' AS "column", count(*) AS n_rows,
       count(*) - count(o_custkey) AS n_nulls,
       count(DISTINCT o_custkey) AS n_distinct,
       CAST(min(o_custkey) AS VARCHAR) AS min_value,
       CAST(max(o_custkey) AS VARCHAR) AS max_value
FROM orders
UNION ALL
SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
       count(DISTINCT o_orderdate),
       CAST(min(o_orderdate) AS VARCHAR), CAST(max(o_orderdate) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderkey', count(*), count(*) - count(o_orderkey),
       count(DISTINCT o_orderkey),
       CAST(min(o_orderkey) AS VARCHAR), CAST(max(o_orderkey) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
       count(DISTINCT o_orderpriority),
       CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
       count(DISTINCT o_orderstatus),
       CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR)
FROM orders
ORDER BY "column"
"""


QUERIES["orders_profile"] = orders_profile
ORACLES["orders_profile"] = ORDERS_PROFILE_ORACLE


def events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-frame window analytics: per-user 5-row moving average
    and rolling peak of event values (ROWS BETWEEN 4 PRECEDING AND
    CURRENT ROW) — the bounded-frame complement of running_totals'
    unbounded cumulative frame. One shuffle on user_id; the frame is
    O(1) state per row."""
    ev = load(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, W.currentRow)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            F.round(F.avg("value").over(w), 6).alias("moving_avg_5"),
            F.round(F.max("value").over(w), 2).alias("rolling_peak_5"),
        )
        .orderBy("user_id", "event_id")
    )


EVENTS_MOVING_AVG_ORACLE = """
SELECT user_id, event_id,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS moving_avg_5,
       round(max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 2) AS rolling_peak_5
FROM events
ORDER BY user_id, event_id
"""


def source_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group KMV distinct sketch: for each document source, the
    k=64 minimum text-hashes and the KMV cardinality estimate —
    the GROUPED form of the global kmv_distinct. The sketch is a
    pure function of each group's value set (sorted k-min of the
    portable md5), so it is mergeable across shards by re-minning
    and fully value-oracled. Scale shape: the k-cut is a rank
    window BEFORE any collect — per-group state is k rows, never
    the group's full distinct set (a collect_set-then-slice would
    buffer a billion-distinct group in one task)."""
    from pyspark.sql import Window as W

    from ..operators.curation import HASH_SPACE, stable_hash60

    docs = load(spark, sf_dir, "documents")
    k = 64
    w = W.partitionBy("source").orderBy("h")
    per = (
        docs.select("source", stable_hash60(F.col("text")).alias("h"))
        .distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy("source")
        .agg(F.sort_array(F.collect_list("h")).alias("kmin"))
    )
    n_seen = F.size("kmin")
    kth = F.element_at("kmin", k)
    est = F.when(
        n_seen < k, n_seen.cast("double")
    ).otherwise(F.round((k - 1) / (kth / F.lit(HASH_SPACE)), 4))
    return per.select(
        "source",
        n_seen.alias("n_kept"),
        est.alias("distinct_estimate"),
        F.element_at("kmin", 1).alias("min_hash"),
    ).orderBy("source")


SOURCE_DISTINCT_SKETCH_ORACLE = """
WITH h AS (
  SELECT DISTINCT source,
         ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
  FROM documents
), ranked AS (
  SELECT source, h,
         row_number() OVER (PARTITION BY source ORDER BY h) AS rn
  FROM h
), kept AS (
  SELECT source, h, rn FROM ranked WHERE rn <= 64
)
SELECT source,
       CAST(count(*) AS INT) AS n_kept,
       CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
            ELSE round(63 / (max(CASE WHEN rn = 64 THEN h END)
                             / 1152921504606846976.0), 4) END AS distinct_estimate,
       min(h) AS min_hash
FROM kept
GROUP BY source
ORDER BY source
"""


QUERIES["events_moving_avg"] = events_moving_avg
ORACLES["events_moving_avg"] = EVENTS_MOVING_AVG_ORACLE
QUERIES["source_distinct_sketch"] = source_distinct_sketch
ORACLES["source_distinct_sketch"] = SOURCE_DISTINCT_SKETCH_ORACLE


def kmv_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed/grouped KMV: per-day distinct-user sketches MERGED
    into weekly sketches — the time-rollup twin of cms_daily and the
    grouped-KMV counterpart of source_distinct_sketch.

    The merge is exact by construction: any hash among a week's true
    k smallest is necessarily among the k smallest of its own day, so
    re-minning the union of the per-day k-min sets yields exactly the
    week's KMV sketch — the property that makes KMV sketches
    pre-aggregable per partition/day at 100 TB and rolled up without
    touching raw events again. Both the daily cut and the weekly
    re-min are rank windows over k rows per group, never a
    collect_set of a group's full distinct set.
    """
    from pyspark.sql import Window as W

    from ..operators.curation import HASH_SPACE, stable_hash60

    k = 64
    ev = load(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts")).cast("date")
    )
    # NULL user_id would hash to NULL, sort first (NULLS FIRST) and
    # evict a real k-slot while the DuckDB oracle's NULLS LAST keeps
    # it — exclude nulls up front, same invariant kmv_distinct
    # documents
    day_hashes = (
        ev.filter(F.col("user_id").isNotNull())
        .select("day", stable_hash60(F.col("user_id").cast("string")).alias("h"))
        .distinct()
    )
    wd = W.partitionBy("day").orderBy("h")
    day_k = (
        day_hashes.withColumn("__rn", F.row_number().over(wd))
        .filter(F.col("__rn") <= k)
        .select("day", "h")
    )
    # weekly rollup purely FROM the day sketches (k rows per day)
    week_rows = day_k.select(
        F.date_trunc("week", F.col("day")).cast("date").alias("week"), "h"
    ).distinct()
    ww = W.partitionBy("week").orderBy("h")
    kept = (
        week_rows.withColumn("__rn", F.row_number().over(ww))
        .filter(F.col("__rn") <= k)
        .groupBy("week")
        .agg(F.sort_array(F.collect_list("h")).alias("kmin"))
    )
    n_seen = F.size("kmin")
    kth = F.element_at("kmin", k)
    est = F.when(n_seen < k, n_seen.cast("double")).otherwise(
        F.round((k - 1) / (kth / F.lit(HASH_SPACE)), 4)
    )
    return kept.select(
        "week",
        n_seen.alias("n_kept"),
        est.alias("distinct_estimate"),
        F.element_at("kmin", 1).alias("min_hash"),
    ).orderBy("week")


KMV_DAILY_ORACLE = """
WITH h AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events WHERE user_id IS NOT NULL
), ranked AS (
  SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rn FROM h
), day_k AS (
  SELECT day, h FROM ranked WHERE rn <= 64
), wk AS (
  SELECT DISTINCT CAST(date_trunc('week', day) AS DATE) AS week, h FROM day_k
), wranked AS (
  SELECT week, h, row_number() OVER (PARTITION BY week ORDER BY h) AS rn FROM wk
), kept AS (
  SELECT week, h, rn FROM wranked WHERE rn <= 64
)
SELECT week,
       CAST(count(*) AS INT) AS n_kept,
       CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
            ELSE round(63 / (max(CASE WHEN rn = 64 THEN h END)
                             / 1152921504606846976.0), 4) END AS distinct_estimate,
       min(h) AS min_hash
FROM kept
GROUP BY week
ORDER BY week
"""


QUERIES["kmv_daily"] = kmv_daily
ORACLES["kmv_daily"] = KMV_DAILY_ORACLE


def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 10-bucket equi-depth histogram of l_extendedprice
    (operators/curation.py equi_depth_histogram) — the ANALYZE
    statistic + exact-percentile primitive."""
    from ..operators.curation import equi_depth_histogram

    li = load(spark, sf_dir, "lineitem")
    return equi_depth_histogram(li, "l_extendedprice", n_buckets=10)


PRICE_HISTOGRAM_ORACLE = """
WITH vals AS (
  SELECT round(l_extendedprice, 2) AS v, count(*) AS cnt
  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1
), cum AS (
  SELECT v, cnt,
         sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         (SELECT sum(cnt) FROM vals) AS n
  FROM vals
)
SELECT CAST(floor((cum - cnt) * 10 / CAST(n AS DOUBLE)) AS INT) AS bucket,
       min(v) AS lo, max(v) AS hi, CAST(sum(cnt) AS BIGINT) AS n_rows
FROM cum
GROUP BY 1
ORDER BY 1
"""


QUERIES["price_histogram"] = price_histogram
ORACLES["price_histogram"] = PRICE_HISTOGRAM_ORACLE


def order_value_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions per priority class: quartile
    (ntile), percent_rank and cume_dist of each order's total price —
    the ranking-family complement of the rank/row_number queries.
    One shuffle on the partition key; ties are made deterministic by
    the (price, orderkey) total order so ntile assignment is
    identical on every engine."""
    from pyspark.sql import Window as W

    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume_dist"),
        )
        .orderBy("o_orderkey")
    )


ORDER_VALUE_DISTRIBUTION_ORACLE = """
SELECT o_orderkey, o_orderpriority,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume_dist
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
ORDER BY o_orderkey
"""


def salted_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated fact-dimension join, driver-gated for result
    identity: lineitem joins supplier through operators/skew.py
    salted_join (keys spread across 8 salt partitions, dimension
    replicated to match), then revenue per supplier top-10. The
    oracle is the PLAIN join — proving the salted rewrite changes
    the shuffle layout and nothing else."""
    from ..operators.skew import salted_join

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"),
        F.col("l_extendedprice").cast("decimal(18,4)").alias("p"),
        (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)").alias("keep"),
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    joined = salted_join(li, s, "s_suppkey", salt=8)
    return (
        joined.groupBy("s_suppkey", "s_name")
        .agg(
            F.round(F.sum(F.col("p") * F.col("keep")), 2)
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "s_suppkey")
        .limit(10)
    )


SALTED_SUPPLIER_REVENUE_ORACLE = """
SELECT l_suppkey AS s_suppkey, s_name,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                      * CAST(1 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY 1, 2
ORDER BY revenue DESC, s_suppkey
LIMIT 10
"""


QUERIES["order_value_distribution"] = order_value_distribution
ORACLES["order_value_distribution"] = ORDER_VALUE_DISTRIBUTION_ORACLE
QUERIES["salted_supplier_revenue"] = salted_supplier_revenue
ORACLES["salted_supplier_revenue"] = SALTED_SUPPLIER_REVENUE_ORACLE


def hll_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed/grouped HyperLogLog: per-day registers over user_id
    MERGED into weekly sketches by per-register MAX — the HLL twin of
    kmv_daily, completing the sketch matrix (CMS / KMV / HLL each in
    global AND time-grouped form). Exact by construction: max is
    associative, so day registers roll up to the week's true sketch
    without touching raw events again; the weekly estimate and its
    exact twin are both emitted and fully value-oracled (integer-
    exact harmonic sums, shared alpha-numerator literal)."""
    from ..operators.curation import HASH_BITS, hll_alpha_numerator, stable_hash60

    m = 64
    b = m.bit_length() - 1
    wbits = HASH_BITS - b
    ev = load(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    hashed = ev.select(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        stable_hash60(F.col("user_id").cast("string")).alias("h"),
    ).select(
        "day",
        (F.col("h") % m).cast("int").alias("register"),
        F.expr(f"h div {m}").alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(wbits + 1)).otherwise(
        (F.log2(F.expr("w & -w")) + 1).cast("int")
    )
    day_regs = (
        hashed.select("day", "register", rho.alias("rho"))
        .groupBy("day", "register")
        .agg(F.max("rho").alias("rho"))
    )
    # weekly rollup purely FROM the day sketches (m rows per day)
    week_regs = (
        day_regs.select(
            F.date_trunc("week", F.col("day")).cast("date").alias("week"),
            "register",
            "rho",
        )
        .groupBy("week", "register")
        .agg(F.max("rho").alias("rho"))
    )
    weeks = week_regs.select("week").distinct()
    full = (
        weeks.crossJoin(
            F.broadcast(spark.range(m).select(F.col("id").cast("int").alias("register")))
        )
        .join(week_regs, ["week", "register"], "left")
        .na.fill({"rho": 0})
    )
    agg = full.groupBy("week").agg(
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {wbits + 1} - rho)")).alias("__den"),
        F.sum(F.when(F.col("rho") == 0, 1).otherwise(0)).alias("n_zero"),
    )
    exact = (
        ev.select(
            F.date_trunc("week", F.col("ts")).cast("date").alias("week"), "user_id"
        )
        .groupBy("week")
        .agg(F.countDistinct("user_id").alias("exact_distinct"))
    )
    numer = hll_alpha_numerator(m)
    raw = F.lit(numer) / F.col("__den")
    est = F.when(
        (raw <= 2.5 * m) & (F.col("n_zero") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("n_zero")),
    ).otherwise(raw)
    return (
        agg.join(F.broadcast(exact), "week")
        .select(
            "week",
            F.col("n_zero").cast("int").alias("n_zero"),
            F.round(est, 4).alias("hll_estimate"),
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
        )
        .orderBy("week")
    )


def _hll_daily_oracle() -> str:
    from ..operators.curation import hll_alpha_numerator

    numer = repr(hll_alpha_numerator(64))
    return f"""
WITH h AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events WHERE user_id IS NOT NULL
), br AS (
  SELECT day, CAST(h % 64 AS INTEGER) AS register, h // 64 AS w FROM h
), rho_t AS (
  SELECT day, register,
         CASE WHEN w = 0 THEN 55
              ELSE CAST(log2(w & -w) + 1 AS INTEGER) END AS rho
  FROM br
), day_regs AS (
  SELECT day, register, max(rho) AS rho FROM rho_t GROUP BY day, register
), week_regs AS (
  SELECT CAST(date_trunc('week', day) AS DATE) AS week, register, max(rho) AS rho
  FROM day_regs GROUP BY 1, register
), full_regs AS (
  SELECT wk.week, r.register, coalesce(week_regs.rho, 0) AS rho
  FROM (SELECT DISTINCT week FROM week_regs) wk
  CROSS JOIN (SELECT unnest(range(64)) AS register) r
  LEFT JOIN week_regs ON week_regs.week = wk.week AND week_regs.register = r.register
), agg AS (
  SELECT week,
         sum(CAST(1 AS BIGINT) << (55 - rho)) AS den,
         sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS n_zero
  FROM full_regs GROUP BY week
), ex AS (
  SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
         count(DISTINCT user_id) AS exact_distinct
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
)
SELECT agg.week,
       CAST(n_zero AS INTEGER) AS n_zero,
       round(CASE WHEN ({numer} / den) <= 160.0 AND n_zero > 0
                  THEN 64.0 * ln(64.0 / n_zero)
                  ELSE {numer} / den END, 4) AS hll_estimate,
       CAST(exact_distinct AS BIGINT) AS exact_distinct
FROM agg JOIN ex ON agg.week = ex.week
ORDER BY agg.week
"""


QUERIES["hll_daily"] = hll_daily
ORACLES["hll_daily"] = _hll_daily_oracle()


def robust_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group aggregates: plain, TRIMMED (drop values
    outside the exact [p5, p95] percentiles), and WINSORIZED (clamp
    to them) means of l_extendedprice per return flag — the
    outlier-resistant summary statistics an ANALYZE/profiling pass
    reports next to the plain mean. Scale shape: the per-group
    thresholds come from operators/curation.exact_percentiles —
    SKETCH-THEN-REFINE (a percentile_approx band whose GK rank bound
    provably brackets the target order statistics, then one exact
    map-side-combinable pass that extracts only the O(n/accuracy)
    in-band values) — NOT Spark's exact `percentile` aggregate,
    whose buffer materializes the group's full value multiset in one
    aggregation state (fine at sf0.1, a memory cliff on a 100 TB
    column). The model-sized (3-row)
    threshold table broadcasts back onto the rows; the conditional/
    clamped sums are a second map-side-combinable aggregate.
    Determinism: double sums round(4) — group cardinality ~15k keeps
    accumulation error ~1e-9, far below the rounding (same contract
    as price_percentiles / q1's averages)."""
    from ..operators.curation import exact_percentiles

    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    th = (
        exact_percentiles(
            li,
            "l_extendedprice",
            [0.05, 0.95],
            group_cols=["l_returnflag"],
            tags=["lo", "hi"],
        )
        .groupBy("l_returnflag")
        .agg(
            F.max(F.when(F.col("tag") == "lo", F.col("value"))).alias("lo"),
            F.max(F.when(F.col("tag") == "hi", F.col("value"))).alias("hi"),
        )
    )
    v = F.col("l_extendedprice")
    inside = v.between(F.col("lo"), F.col("hi"))
    return (
        li.join(F.broadcast(th), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(v), 4).alias("mean"),
            F.round(F.avg(F.when(inside, v)), 4).alias("trimmed_mean"),
            F.round(
                F.avg(F.greatest(F.least(v, F.col("hi")), F.col("lo"))), 4
            ).alias("winsorized_mean"),
            F.round(F.first("lo"), 4).alias("p5"),
            F.round(F.first("hi"), 4).alias("p95"),
        )
        .orderBy("l_returnflag")
    )


ROBUST_PRICE_STATS_ORACLE = """
WITH th AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.05) AS lo,
         quantile_cont(l_extendedprice, 0.95) AS hi
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(l_extendedprice), 4) AS mean,
       round(avg(CASE WHEN l_extendedprice BETWEEN lo AND hi
                      THEN l_extendedprice END), 4) AS trimmed_mean,
       round(avg(greatest(least(l_extendedprice, hi), lo)), 4)
         AS winsorized_mean,
       round(any_value(lo), 4) AS p5,
       round(any_value(hi), 4) AS p95
FROM lineitem l JOIN th USING (l_returnflag)
GROUP BY l.l_returnflag
ORDER BY l_returnflag
"""


QUERIES["robust_price_stats"] = robust_price_stats
ORACLES["robust_price_stats"] = ROBUST_PRICE_STATS_ORACLE


def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the event value distribution,
    first half vs second half of the event_id range (ids are
    monotone with ingestion, so this is the standard
    yesterday-vs-today drift monitor shape) —
    operators/curation.psi_drift: reference-anchored equi-width bins,
    eps-floored log terms, one scan per window. The split key is the
    id midpoint computed in-plan (a 1-row broadcast aggregate), so
    the whole gate is a pure function of the table."""
    from ..operators.curation import psi_drift

    ev = load(spark, sf_dir, "events").select("event_id", "value")
    mid = ev.agg(
        ((F.min("event_id") + F.max("event_id")) / 2.0).alias("mid")
    ).localCheckpoint(eager=False)
    ref = ev.crossJoin(F.broadcast(mid)).filter(F.col("event_id") < F.col("mid"))
    cur = ev.crossJoin(F.broadcast(mid)).filter(F.col("event_id") >= F.col("mid"))
    return psi_drift(ref, cur, value_col="value", bins=10)


EVENTS_PSI_ORACLE = r"""
WITH ev AS (
  SELECT event_id, CAST(value AS DOUBLE) AS x FROM events
), mid AS (
  SELECT (min(event_id) + max(event_id)) / 2.0 AS mid FROM ev
), ref AS (
  SELECT x FROM ev, mid WHERE event_id < mid
), cur AS (
  SELECT x FROM ev, mid WHERE event_id >= mid
), st AS (
  SELECT min(x) AS mn, max(x) AS mx,
         CAST(count(*) AS DOUBLE) AS nr,
         greatest((max(x) - min(x)) / 10.0, 1e-6) AS w
  FROM ref
), nc AS (
  SELECT CAST(count(*) AS DOUBLE) AS nc FROM cur
), rb AS (
  SELECT least(9, greatest(0, CAST(floor((x - st.mn) / st.w) AS INTEGER))) AS bin,
         CAST(count(*) AS DOUBLE) AS rn
  FROM ref, st GROUP BY 1
), cb AS (
  SELECT least(9, greatest(0, CAST(floor((x - st.mn) / st.w) AS INTEGER))) AS bin,
         CAST(count(*) AS DOUBLE) AS cn
  FROM cur, st GROUP BY 1
), grid AS (
  SELECT CAST(g.bin AS INTEGER) AS bin,
         greatest(coalesce(rb.rn, 0) / st.nr, 1e-6) AS rf,
         greatest(coalesce(cb.cn, 0) / nc.nc, 1e-6) AS cf
  FROM (SELECT unnest(range(0, 10)) AS bin) g
  LEFT JOIN rb ON g.bin = rb.bin
  LEFT JOIN cb ON g.bin = cb.bin
  CROSS JOIN st CROSS JOIN nc
), terms AS (
  SELECT bin, rf, cf, (cf - rf) * (ln(cf) - ln(rf)) AS term FROM grid
)
SELECT bin,
       round(rf, 6) AS ref_frac,
       round(cf, 6) AS cur_frac,
       round(term, 6) AS psi_term,
       (SELECT round(sum(term), 6) FROM terms) AS psi_total
FROM terms
ORDER BY bin
"""

QUERIES["events_psi_drift"] = events_psi_drift
ORACLES["events_psi_drift"] = EVENTS_PSI_ORACLE


def events_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift of the event value
    distribution, first half vs second half of the event_id range —
    the same yesterday-vs-today split as events_psi_drift, through
    the bin-free monitor (operators/curation.ks_drift: tagged union →
    distinct-value groupBy → two-phase cumulative CDFs → the single
    worst divergence point). PSI says how much mass moved; KS names
    the exact value where the CDFs tear furthest."""
    from ..operators.curation import ks_drift

    # value-null rows must not influence the split midpoint: the
    # oracle's ev CTE filters value IS NOT NULL before min/max, and
    # ks_drift drops null values anyway — derive mid from the SAME
    # row set so a null-valued row holding the extreme event_id can
    # never make the two sides disagree (latent today: testdata has
    # no null values)
    ev = (
        load(spark, sf_dir, "events")
        .select("event_id", "value")
        .filter(F.col("value").isNotNull())
    )
    mid = ev.agg(
        ((F.min("event_id") + F.max("event_id")) / 2.0).alias("mid")
    ).localCheckpoint(eager=False)
    ref = ev.crossJoin(F.broadcast(mid)).filter(F.col("event_id") < F.col("mid"))
    cur = ev.crossJoin(F.broadcast(mid)).filter(F.col("event_id") >= F.col("mid"))
    return ks_drift(ref, cur, value_col="value")


EVENTS_KS_ORACLE = r"""
WITH ev AS (
  SELECT event_id, CAST(value AS DOUBLE) AS x FROM events
  WHERE value IS NOT NULL
), mid AS (
  SELECT (min(event_id) + max(event_id)) / 2.0 AS mid FROM ev
), tagged AS (
  SELECT x, CASE WHEN event_id < mid THEN 1 ELSE 0 END AS r,
         CASE WHEN event_id >= mid THEN 1 ELSE 0 END AS c
  FROM ev, mid
), g AS (
  SELECT x, SUM(r) AS rn, SUM(c) AS cn FROM tagged GROUP BY x
), tot AS (
  SELECT CAST(SUM(rn) AS BIGINT) AS n_ref, CAST(SUM(cn) AS BIGINT) AS n_cur
  FROM g
), cum AS (
  SELECT x,
         SUM(rn) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cr,
         SUM(cn) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
  FROM g
)
SELECT round(abs(CAST(cr AS DOUBLE) / n_ref - CAST(cc AS DOUBLE) / n_cur), 6)
         AS ks_stat,
       x AS at_value, n_ref, n_cur
FROM cum, tot
ORDER BY abs(CAST(cr AS DOUBLE) / n_ref - CAST(cc AS DOUBLE) / n_cur) DESC,
         x ASC
LIMIT 1
"""

QUERIES["events_ks_drift"] = events_ks_drift
ORACLES["events_ks_drift"] = EVENTS_KS_ORACLE
