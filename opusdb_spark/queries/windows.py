"""Window functions (SURVEY §2B).

Three of these encode opusdb's MVCC read rules directly as analytics:
  - win_latest_version  = deref outside a txn (stm.clj:161-162)
  - win_asof_version    = find-version ≤ read-point (stm.clj:55-65,172)
  - win_history_cap     = MAX_HISTORY=16 truncation (stm.clj:10,47-50)

Windows shuffle once on partitionBy keys, then sort within partitions;
at 100 TB the key cardinality (users) dwarfs the executor count, so the
shuffle is well spread; no window here is an unpartitioned global sort
except the running-sum over dates, whose input is pre-aggregated to one
row per day before the window (tiny).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from opusdb_spark.exactness import dsum, sql_dsum
from opusdb_spark.registry import register
from opusdb_spark.tables import table


@register(
    "win_rank",
    oracle="""
        SELECT c_custkey, c_mktsegment, c_acctbal,
               RANK()       OVER w AS rnk,
               DENSE_RANK() OVER w AS drnk,
               ROW_NUMBER() OVER w AS rn
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal DESC, c_custkey)
    """,
    tags=("window",),
)
def win_rank(spark, sf_dir):
    """rank/dense_rank/row_number per segment (unique-key tie-break)."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
    )


@register(
    "win_topk_group",
    oracle="""
        SELECT * FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        ) WHERE rn <= 3
    """,
    tags=("window",),
)
def win_topk_group(spark, sf_dir):
    """Top-3 orders per customer — rank-then-filter; Spark pushes the
    rn<=3 limit into the window sort (WindowGroupLimit) so no full
    per-group materialization at scale."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "win_running_sum",
    oracle=f"""
        WITH daily AS (
            SELECT o_orderdate, {sql_dsum("o_totalprice", "day_total")}
            FROM orders GROUP BY o_orderdate
        )
        SELECT o_orderdate, day_total,
               CAST(SUM(CAST(day_total AS DECIMAL(27,6))) OVER (
                   ORDER BY o_orderdate
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_total
        FROM daily
    """,
    tags=("window",),
)
def win_running_sum(spark, sf_dir):
    """Cumulative revenue by date. Pre-aggregates to one row per day
    *before* the unpartitioned window, so the global-order window sees
    ~2.4k rows regardless of fact size — the 100 TB-safe shape."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy("o_orderdate").agg(dsum("o_totalprice", "day_total"))
    w = (
        Window.orderBy("o_orderdate")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "o_orderdate",
        "day_total",
        F.sum(F.col("day_total").cast("decimal(27,6)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


@register(
    "win_lag_lead",
    oracle="""
        SELECT event_id, user_id, ts, value,
               LAG(value)  OVER w AS prev_value,
               LEAD(value) OVER w AS next_value,
               value - LAG(value) OVER w AS delta
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window",),
)
def win_lag_lead(spark, sf_dir):
    """lag/lead deltas per user over event time."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@register(
    "win_range_frame",
    oracle="""
        SELECT event_id, user_id, ts, value,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER w AS DOUBLE) AS sum_24h,
               COUNT(value) OVER w AS n_24h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
    """,
    tags=("window",),
)
def win_range_frame(spark, sf_dir):
    """Moving 24-hour sum/count per user — RANGE frame over epoch seconds.

    Frame bounds use integer *microsecond* epochs on both engines so the
    range comparison is exact (fractional-second doubles would disagree
    at the boundary).
    """
    ev = table(spark, sf_dir, "events")
    epoch = F.unix_micros(F.col("ts").cast("timestamp")).alias("__epoch")
    w = (
        Window.partitionBy("user_id")
        .orderBy("__epoch")
        .rangeBetween(-86400000000, 0)
    )
    return ev.select(
        "event_id", "user_id", "ts", "value", epoch
    ).select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.sum(F.col("value").cast("decimal(27,6)"))
        .over(w)
        .cast("double")
        .alias("sum_24h"),
        F.count("value").over(w).alias("n_24h"),
    )


@register(
    "win_ntile_firstlast",
    oracle="""
        SELECT c_custkey, c_mktsegment, c_acctbal,
               NTILE(4) OVER w AS quartile,
               FIRST_VALUE(c_custkey) OVER w AS richest_cust,
               LAST_VALUE(c_custkey) OVER (PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC, c_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS poorest_cust
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal DESC, c_custkey)
    """,
    tags=("window",),
)
def win_ntile_firstlast(spark, sf_dir):
    """Quartiles + first/last per segment (full-frame last_value)."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.first("c_custkey").over(w).alias("richest_cust"),
        F.last("c_custkey").over(w_full).alias("poorest_cust"),
    )


@register(
    "win_latest_version",
    oracle="""
        SELECT user_id, event_id, ts, value FROM (
            SELECT user_id, event_id, ts, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    tags=("window", "mvcc"),
)
def win_latest_version(spark, sf_dir):
    """Latest-per-key = opusdb `deref` outside a txn (stm.clj:161-162):
    the newest committed version of each ref. events(user_id) stands in
    for the ref table (FIXTURES.md B1)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.select(
            "user_id", "event_id", "ts", "value", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "win_asof_version",
    oracle="""
        SELECT user_id, event_id, ts, value FROM (
            SELECT user_id, event_id, ts, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
            WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'
        ) WHERE rn = 1
    """,
    tags=("window", "mvcc"),
)
def win_asof_version(spark, sf_dir):
    """As-of read = `find-version` (stm.clj:55-65): newest version with
    write_point ≤ read-point, here ts ≤ a literal cutoff. The filter
    prunes *before* the window — the pushdown form of the binary search."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.filter(F.col("ts") <= F.lit("2024-01-15 00:00:00").cast("timestamp_ntz"))
        .select(
            "user_id", "event_id", "ts", "value", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "win_history_cap",
    oracle="""
        SELECT user_id, COUNT(*) AS n_kept,
               MIN(ts) AS oldest_kept, MAX(ts) AS newest_kept
        FROM (
            SELECT user_id, ts,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn <= 16
        GROUP BY user_id
    """,
    tags=("window", "mvcc"),
)
def win_history_cap(spark, sf_dir):
    """Bounded history = MAX_HISTORY 16 (stm.clj:10, truncation at
    stm.clj:47-50): keep the newest 16 versions per ref, report survivor
    stats. WindowGroupLimit keeps this from materializing full groups."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.select("user_id", "ts", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 16)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("ts").alias("oldest_kept"),
            F.max("ts").alias("newest_kept"),
        )
    )


@register(
    "win_cume_percent",
    oracle="""
        SELECT event_id, event_type, value,
               cume_dist() OVER (PARTITION BY event_type ORDER BY value, event_id)
                   AS cume,
               percent_rank() OVER (PARTITION BY event_type ORDER BY value, event_id)
                   AS prank
        FROM events
    """,
    tags=("window",),
)
def win_cume_percent(spark, sf_dir):
    """cume_dist / percent_rank per event type: both are exact integer
    ratios (k/n on identical operands), so doubles match bit-for-bit.
    The (value, event_id) ordering is total, making ranks deterministic
    under any partitioning."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.cume_dist().over(w).alias("cume"),
        F.percent_rank().over(w).alias("prank"),
    )


@register(
    "win_rolling_median",
    oracle="""
        SELECT event_id,
               median(value) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 15 PRECEDING AND 15 FOLLOWING) AS med
        FROM events
    """,
    tags=("window",),
)
def win_rolling_median(spark, sf_dir):
    """EXACT rolling median (31-row centered frame per event_type) —
    the robust smoother quantile-approx windows can't replace when the
    contract is exact. Spark has no median window function; the frame
    is collected per row (31 doubles — bounded, executor-local),
    sorted, and the middle element (odd count) or the mean of the two
    middles (even count, matching DuckDB's double interpolation) is
    picked by position. One keyed window shuffle; frame size is the
    knob that keeps per-row state O(31) regardless of table size."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-15, 15)
    )
    arr = F.sort_array(F.collect_list(F.col("value")).over(w))
    k = F.size(arr)
    lo = (k / 2).cast("int")  # k even: lower middle (1-based)
    med = F.when(
        k % 2 == 1, F.element_at(arr, ((k + 1) / 2).cast("int"))
    ).otherwise(
        (F.element_at(arr, lo) + F.element_at(arr, lo + 1)) / 2.0
    )
    return ev.select("event_id", med.alias("med"))


@register(
    "win_streaks",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
            FROM events
        ),
        grp AS (
            SELECT user_id, d,
                   d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                               ORDER BY d) AS INTEGER) AS g
            FROM days
        ),
        streaks AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len,
                   MIN(d) AS streak_start
            FROM grp GROUP BY user_id, g
        )
        SELECT user_id, len AS longest_streak, streak_start
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY len DESC, streak_start) AS rn
              FROM streaks)
        WHERE rn = 1
    """,
    tags=("window", "gaps-islands"),
)
def win_streaks(spark, sf_dir):
    """Longest consecutive-day activity streak per user — the classic
    gaps-and-islands pattern: distinct activity days, day minus
    per-user row_number is constant within a run, group on that
    constant, take the longest (tie → earliest start). Two keyed
    aggregations + one keyed window; nothing global. The engagement
    metric every events warehouse ends up needing."""
    ev = table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.withColumn(
        "g", F.date_sub("d", F.row_number().over(w))
    )
    streaks = grp.groupBy("user_id", "g").agg(
        F.count(F.lit(1)).alias("len"), F.min("d").alias("streak_start")
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("len")).alias("neg_len"),
                    F.col("streak_start").alias("streak_start"),
                )
            ).alias("_b")
        )
        .select(
            "user_id",
            (-F.col("_b.neg_len")).alias("longest_streak"),
            F.col("_b.streak_start").alias("streak_start"),
        )
    )


@register(
    "win_time_range_sum",
    oracle="""
        SELECT event_id,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
               AS DOUBLE) AS hour_sum
        FROM events
    """,
    tags=("window", "range-frame"),
)
def win_time_range_sum(spark, sf_dir):
    """Trailing-1-hour rolling sum per user — a TIME-interval RANGE
    frame (value-based bounds over event-time, not row counts: sparse
    and bursty activity get the same 1-hour semantics). Ordered by
    integer microseconds so both engines bound the frame identically;
    decimal-summed so ties inside the frame can't reorder float
    addition. One keyed window shuffle."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        F.sum(F.col("value").cast("decimal(27,6)"))
        .over(w)
        .cast("double")
        .alias("hour_sum"),
    )


@register(
    "win_ignore_nulls",
    oracle="""
        WITH s AS (
            SELECT event_id, user_id, ts,
                   CASE WHEN event_type = 'purchase' THEN value END AS pv
            FROM events
        )
        SELECT event_id, user_id, pv,
               LAST_VALUE(pv IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS last_purchase_value,
               FIRST_VALUE(pv IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS first_purchase_value
        FROM s
    """,
    tags=("window",),
)
def win_ignore_nulls(spark, sf_dir):
    """IGNORE NULLS window navigation: carry the user's most recent /
    first purchase value onto EVERY event (non-purchase rows are NULL
    and skipped) — the forward-fill primitive the as-of join builds on
    (operators/asof.py uses exactly this carry), here pinned as its
    own SQL surface. One keyed window, running frame."""
    ev = table(spark, sf_dir, "events")
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        pv.alias("pv"),
        F.last(pv, ignorenulls=True).over(w).alias("last_purchase_value"),
        F.first(pv, ignorenulls=True).over(w).alias("first_purchase_value"),
    )
