"""Versioned-table (MVCC) and skew-mitigation queries.

The events table doubles as a version history: user_id is the ref,
event_id the write point (the LSN/WRITE_POINT analog — monotone,
unique), value the cell value. These queries drive opusdb_spark.mvcc
and opusdb_spark.operators.skew through the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from opusdb_spark import mvcc
from opusdb_spark.operators import skew
from opusdb_spark.registry import register
from opusdb_spark.tables import table


def _versions(spark, sf_dir):
    """events as a versioned-cell table (ref=user_id, wp=event_id)."""
    return table(spark, sf_dir, "events").select(
        F.col("user_id").alias("ref_id"),
        F.col("event_id").alias("write_point"),
        "value",
    )


@register(
    "mvcc_snapshot_read",
    oracle="""
        SELECT ref_id, write_point, value FROM (
            SELECT user_id AS ref_id, event_id AS write_point, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY event_id DESC) AS rn
            FROM events WHERE event_id <= 5000
        ) WHERE rn = 1
    """,
    tags=("mvcc",),
)
def mvcc_snapshot_read(spark, sf_dir):
    """Snapshot read at read-point 5000: newest version ≤ rp per ref —
    the find-version rule (stm.clj:55-65) through the mvcc API."""
    return mvcc.snapshot(_versions(spark, sf_dir), 5000)


@register(
    "mvcc_conservation",
    oracle="""
        WITH deltas AS (
            SELECT event_id AS write_point,
                   CAST(value - COALESCE(LAG(value) OVER (
                       PARTITION BY user_id ORDER BY event_id), 0)
                   AS DECIMAL(27,6)) AS d
            FROM events
        )
        SELECT write_point,
               CAST(SUM(d) OVER (ORDER BY write_point
                                 ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS total
        FROM deltas
    """,
    tags=("mvcc",),
)
def mvcc_conservation(spark, sf_dir):
    """Total value as of EVERY write point in one pass (delta + running
    sum — no per-snapshot rescan): the bank invariant query
    (benchmark/bank.clj:41-44) generalized to a full balance history.
    Decimal-summed so the running totals hash-match the oracle."""
    return mvcc.conservation(_versions(spark, sf_dir), decimal=True)


@register(
    "join_salted_skew",
    oracle="""
        SELECT c_mktsegment, COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY c_mktsegment
    """,
    tags=("join", "skew"),
)
def join_salted_skew(spark, sf_dir):
    """Hot-key-proof join: salt the fact side, replicate the dim ×S —
    row-identical to the plain join (this oracle IS the plain join),
    but a key owning 10% of events spreads over S tasks instead of
    stalling one."""
    events = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    customer = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = skew.salted_join(
        events, customer, "user_id", n_salts=8, salt_cols=["event_id"]
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias(
            "total_value"
        ),
    )


@register(
    "agg_salted_skew",
    oracle="""
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
        FROM events GROUP BY event_type
    """,
    tags=("agg", "skew"),
)
def agg_salted_skew(spark, sf_dir):
    """Two-phase (salted) aggregation: (key, salt) partials → key
    finals. Decomposable aggs only; decimal sums keep it order-exact."""
    ev = table(spark, sf_dir, "events").withColumn(
        "dv", F.col("value").cast("decimal(27,6)")
    )
    out = skew.two_phase_agg(
        ev.select("event_id", "event_type", "dv"),
        "event_type",
        [("dv", "count", "n"), ("dv", "sum", "total_value")],
        n_salts=8,
        salt_cols=["event_id"],
    )
    return out.select(
        "event_type", "n", F.col("total_value").cast("double").alias("total_value")
    )
