"""SparkSession factory with scale-aware defaults.

Designed for a 1000-executor cluster but testable on local[N]:
- AQE on (runtime re-planning, skew-join splitting, partition coalescing)
- broadcast threshold left at default so small dims broadcast automatically
- shuffle partitions tuned by env for local runs; on a real cluster AQE
  coalesces from a high initial number.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime confs every query path needs, applied defensively to *any*
# session handed to us (the driver owns the session in `entry()`).
RUNTIME_CONFS = {
    # events.parquet stores TIMESTAMP(NANOS); Spark refuses it unless
    # read as int64 nanos (converted to timestamp_ntz in tables.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    # Arrow for every pandas_udf / toPandas hop.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf not settable at runtime on this build — best effort
    return spark


from contextlib import contextmanager


@contextmanager
def scoped_confs(spark: SparkSession, confs: dict[str, str]):
    """Set session confs for the duration of a block, then restore the
    previous values (unset keys are restored with `unset`). Queries must
    never leave conf mutations behind — a leaked optimizer conf changes
    every later plan in the shared session (order-dependent plan shapes
    and bench timings)."""
    old: dict[str, str | None] = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, prev in old.items():
            if prev is None:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass
            else:
                spark.conf.set(k, prev)


def get_spark(
    app_name: str = "opusdb-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or (int(cpus) if str(cpus).isdigit() else 32)),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return apply_runtime_confs(builder.getOrCreate())
