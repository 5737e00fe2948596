"""Continuous-aggregate rollup store with incremental refresh.

The hypertable/continuous-aggregate pattern (TimescaleDB continuous
aggregates, Druid rollup segments, the classic materialized-view
maintenance literature): raw events are aggregated ONCE into a
day-partitioned store of MERGEABLE partial aggregates, and an
appended batch refreshes ONLY the day partitions it touches — the
unaffected 99.9% of a year-long 100 TB event store is never re-read.
The reference's append-only event log (log_mgr.clj:16-33) is the
ingest side of exactly this shape; this operator is the read-side
materialization Spark users would maintain over it.

Mergeability is the whole design:

- COUNT and the DECIMAL(27,6) value sum are associative, so
  `merged = old + delta-partial` equals a full recompute bit-for-bit
  (the exactness.py contract extends to the merge: decimal addition
  reorders freely, double addition does not — which is why the STORE
  keeps the decimal, and only query output casts to double).
- MIN/MAX merge via least/greatest.
- COUNT DISTINCT is not mergeable from counts, so the store carries a
  SKETCH-typed partial instead: a DataSketches HLL of user_id
  (`hll_sketch_agg`), merged on refresh with `hll_union` and
  finalized with `hll_sketch_estimate` at query time. Below the
  sketch's coupon threshold (~hundreds of distinct items per cell)
  the estimate is exact; above it, within ~2% — the standard rollup
  trade for an O(1)-size mergeable distinct.
- Other non-mergeable aggregates (exact medians) stay excluded; a
  t-digest column would follow the same opaque-binary pattern.

Refresh is partition-surgical: the delta's distinct days are a
model-sized collect (a batch touches hours-to-days, not years), the
old store is read ONLY for those days (partition pruning on the
day directory), and the merged result overwrites ONLY those
directories via dynamic partition overwrite. The merged frame is
rollup-granularity (days x event types — model-sized by
construction), so the eager localCheckpoint that breaks the
read-path lineage before the self-overwrite is cheap.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opusdb_spark.exactness import DEC
from opusdb_spark.session import scoped_confs

# Mergeable partial-aggregate schema of the store; `day` is the
# partition directory column.
_PARTIALS = [
    ("n_events", "bigint"),
    ("sum_value_dec", DEC),
    ("min_value", "double"),
    ("max_value", "double"),
    ("users_hll", "binary"),
]


def _partial_agg(events: DataFrame, grain: str = "day") -> DataFrame:
    """Grain x event_type partial aggregates of a raw-event frame
    (schema contract: ts, event_type, value, user_id). `grain` is any
    date_trunc unit; the bucket column keeps the partition-friendly
    name `day` at day grain, `bucket_ts` otherwise."""
    if grain == "day":
        key = F.to_date("ts").alias("day")
    else:
        key = F.date_trunc(grain, "ts").alias("bucket_ts")
    return events.groupBy(key, "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(DEC)).alias("sum_value_dec"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.hll_sketch_agg("user_id").alias("users_hll"),
    )


def merge_partials(partials: DataFrame, key_cols: list[str]) -> DataFrame:
    """Re-aggregate finer-grain partials to a coarser key — the
    cascade half of the rollup algebra (hourly store answers daily
    questions without touching raw events). Every column merges with
    its own monoid: counts and decimal sums add, min/min and max/max,
    HLL sketches union."""
    return partials.groupBy(*key_cols).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value_dec").cast(DEC).alias("sum_value_dec"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
        F.hll_union_agg("users_hll").alias("users_hll"),
    )


def build_rollup(events: DataFrame, path: str, grain: str = "day") -> None:
    """Full (re)build: one pass over raw events, partitioned out by
    the grain bucket."""
    part_col = "day" if grain == "day" else "bucket_ts"
    _partial_agg(events, grain).write.partitionBy(part_col).mode(
        "overwrite"
    ).parquet(path)


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    roll = spark.read.parquet(path)
    # partition-value inference yields DateType for yyyy-MM-dd dirs;
    # cast defensively so the contract doesn't depend on the conf
    return roll.withColumn("day", F.col("day").cast("date"))


def refresh_rollup(
    spark: SparkSession, path: str, delta: DataFrame
) -> list:
    """Incrementally fold an appended raw-event batch into the store.

    Returns the list of affected days (the only partitions rewritten).
    Correctness relies on the delta being NEW events only — replaying
    a batch would double-count, exactly as in any continuous-aggregate
    system; exactly-once hand-off is the ingest layer's contract (the
    opusdb_log sink's two-phase commit provides it here).
    """
    part = _partial_agg(delta)
    days = [r.day for r in part.select("day").distinct().collect()]
    if not days:
        return []
    try:
        old = read_rollup(spark, path).filter(F.col("day").isin(days))
    except Exception:
        # bootstrap: first batch against a missing/empty store — the
        # delta's partials ARE the store for its days
        part.write.partitionBy("day").mode("overwrite").parquet(path)
        return days
    p = part.select(
        "day",
        "event_type",
        *[F.col(c).alias(f"d_{c}") for c, _ in _PARTIALS],
    )
    merged = (
        old.join(p, ["day", "event_type"], "full_outer")
        .select(
            "day",
            "event_type",
            (
                F.coalesce(F.col("n_events"), F.lit(0))
                + F.coalesce(F.col("d_n_events"), F.lit(0))
            ).alias("n_events"),
            (
                F.coalesce(F.col("sum_value_dec"), F.lit(0).cast(DEC))
                + F.coalesce(F.col("d_sum_value_dec"), F.lit(0).cast(DEC))
            ).cast(DEC).alias("sum_value_dec"),
            F.least(F.col("min_value"), F.col("d_min_value")).alias(
                "min_value"
            ),
            F.greatest(F.col("max_value"), F.col("d_max_value")).alias(
                "max_value"
            ),
            # hll_union is not null-tolerant; a key present on only
            # one side keeps that side's sketch verbatim
            F.when(
                F.col("users_hll").isNull(), F.col("d_users_hll")
            )
            .when(F.col("d_users_hll").isNull(), F.col("users_hll"))
            .otherwise(
                F.hll_union(F.col("users_hll"), F.col("d_users_hll"))
            )
            .alias("users_hll"),
        )
        # model-sized (affected days x event types): the eager local
        # checkpoint materializes the merge BEFORE the write job, so
        # the writer's plan no longer reads the path it overwrites
        .localCheckpoint(eager=True)
    )
    with scoped_confs(
        spark, {"spark.sql.sources.partitionOverwriteMode": "dynamic"}
    ):
        merged.write.partitionBy("day").mode("overwrite").parquet(path)
    return days


def backfill_rollup(
    spark: SparkSession, path: str, corrected: DataFrame, days: list
) -> None:
    """REPLACE the given day partitions from corrected raw events.

    The third maintenance mode: refresh_rollup folds ADDITIVE deltas
    (new events), but a correction — a value restated, events voided,
    late data landing after its day was sealed — is not additive, so
    the affected days are recomputed from the corrected raw slice and
    their partitions dynamically overwritten. Cost is O(corrected
    days' raw), never O(history): the raw read is partition/predicate-
    pruned to `days` and untouched day directories are not rewritten.
    """
    if not days:
        return
    # per-day [00:00, +1d) ts ranges, OR'd: unlike to_date(ts) IN (...)
    # — a function of the column, opaque to parquet stats — plain
    # range predicates on ts push down to row-group min/max pruning,
    # so the raw re-read touches only the restated days' pages even on
    # an unpartitioned event file
    import datetime as _dt

    cond = None
    for d in days:
        lo = F.lit(_dt.datetime(d.year, d.month, d.day))
        hi = F.lit(_dt.datetime(d.year, d.month, d.day) + _dt.timedelta(days=1))
        rng = (F.col("ts") >= lo) & (F.col("ts") < hi)
        cond = rng if cond is None else (cond | rng)
    part = _partial_agg(corrected.filter(cond)).localCheckpoint(
        eager=True
    )  # model-sized; breaks read lineage
    with scoped_confs(
        spark, {"spark.sql.sources.partitionOverwriteMode": "dynamic"}
    ):
        part.write.partitionBy("day").mode("overwrite").parquet(path)
