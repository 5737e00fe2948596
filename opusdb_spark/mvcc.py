"""Versioned-table (MVCC) analytics API.

The reference's data model is a set of versioned cells: a ref holds a
history vector of `{:value :write-point}` entries, newest last, capped
at 16 (reference stm.clj:153-158, stm.clj:10). Its read rules are the
behaviors this module re-expresses over an immutable DataFrame of
versions `(key, write_point, value...)`:

- `latest`    = deref outside a transaction — newest committed version
                (stm.clj:161-162)
- `snapshot`  = deref at a read-point — newest version with
                write_point ≤ read_point, the binary-searched
                `find-version` rule (stm.clj:55-65, 172)
- `retain`    = MAX_HISTORY truncation — keep the newest n versions
                per key (stm.clj:42-53)
- `append_versions` = ref-set/alter + commit: all updates in one batch
                share ONE new write point, mirroring the single
                WRITE_POINT bump per committing transaction
                (stm.clj:42-43); job atomicity gives all-or-nothing
                (stm.clj:103-106)
- `conservation` = the bank-transfer invariant: a value total per
                snapshot, constant across write points when updates
                only move value between keys (benchmark/bank.clj:41-44)

Scale notes: every operation is a window over `partitionBy(key)` — one
hash shuffle on the key, no driver state. At 100 TB the versions table
is written partitioned/bucketed by key so these windows are
shuffle-free local sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_HISTORY = 16  # reference stm.clj:10


def latest(
    versions: DataFrame, key: str = "ref_id", version: str = "write_point"
) -> DataFrame:
    """Newest version per key (deref outside a txn, stm.clj:161-162)."""
    w = Window.partitionBy(key).orderBy(F.col(version).desc())
    return (
        versions.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def snapshot(
    versions: DataFrame,
    read_point,
    key: str = "ref_id",
    version: str = "write_point",
) -> DataFrame:
    """State as of `read_point`: newest version with version ≤ read_point
    per key (find-version, stm.clj:55-65). Keys born after the
    read-point are absent — exactly the nil/GC'd case (stm.clj:172-174).
    """
    return latest(versions.filter(F.col(version) <= read_point), key, version)


def retain(
    versions: DataFrame,
    n: int = MAX_HISTORY,
    key: str = "ref_id",
    version: str = "write_point",
) -> DataFrame:
    """Bounded history: newest n versions per key (stm.clj:42-53).
    Run as the retention pass when compacting a versions table."""
    w = Window.partitionBy(key).orderBy(F.col(version).desc())
    return (
        versions.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def append_versions(
    versions: DataFrame,
    updates: DataFrame,
    key: str = "ref_id",
    version: str = "write_point",
) -> DataFrame:
    """Commit a batch of updates as ONE new write point.

    `updates` carries (key, value...) without a version column; every
    update row gets write_point = max(existing) + 1 — the analog of the
    single WRITE_POINT bump per committing transaction (stm.clj:42-43).
    Returns the new versions DataFrame; writing it (or just the new
    rows, mode="append") is the commit, atomic per Spark job.
    """
    next_wp = versions.agg((F.coalesce(F.max(version), F.lit(0)) + 1).alias("_wp"))
    stamped = updates.crossJoin(F.broadcast(next_wp)).withColumnRenamed(
        "_wp", version
    )
    return versions.unionByName(stamped.select(*versions.columns))


def read_own_writes(
    versions: DataFrame,
    pending: DataFrame,
    key: str = "ref_id",
    version: str = "write_point",
) -> DataFrame:
    """The in-transaction deref order: write-set first, then committed
    history (reference stm.clj:169-171; pinned behavior
    stm_test.clj:196-202).

    `pending` carries this transaction's uncommitted (key, value...)
    rows. The effective read state is latest-per-key where a pending
    row SHADOWS every committed version of its key — other readers
    (anyone holding only `versions`) still see the committed state,
    because nothing here mutates or publishes.
    """
    nxt = versions.agg((F.coalesce(F.max(version), F.lit(0)) + 1).alias("_wp"))
    stamped = pending.crossJoin(F.broadcast(nxt)).withColumnRenamed("_wp", version)
    return latest(versions.unionByName(stamped.select(*versions.columns)), key, version)


def merge(
    versions: DataFrame,
    changes: DataFrame,
    key: str = "ref_id",
    version: str = "write_point",
) -> DataFrame:
    """MERGE a change-set as ONE committed write point (upsert+delete).

    `changes` carries (key, value..., _op) with _op in ('upsert',
    'delete'). Upserts append a new version of the key (insert if the
    key is new); deletes append a TOMBSTONE version (all non-key/value
    columns null, _deleted=true). Mirrors the reference's
    ref-set/alter/ensure batch committed under one WRITE_POINT bump
    (stm.clj:42-43, 103-122): the whole change-set shares one write
    point and lands atomically (single Spark job commit).

    Returns the new versions DataFrame with a `_deleted` flag column.
    Read the post-merge state with `latest(...).filter(~_deleted)`;
    older snapshots still see the pre-merge values — deletes are
    versions, not in-place erasure, exactly like the history vector.
    """
    if "_deleted" not in versions.columns:
        versions = versions.withColumn("_deleted", F.lit(False))
    nxt = versions.agg((F.coalesce(F.max(version), F.lit(0)) + 1).alias("_wp"))
    stamped = (
        changes.withColumn("_deleted", F.col("_op") == "delete")
        .drop("_op")
        .crossJoin(F.broadcast(nxt))
        .withColumnRenamed("_wp", version)
    )
    return versions.unionByName(stamped.select(*versions.columns))


def conservation(
    versions: DataFrame,
    value: str = "value",
    version: str = "write_point",
    decimal: bool = False,
    key: str = "ref_id",
    n_ranges: int = 64,
) -> DataFrame:
    """Total `value` as of every write point — (write_point, total).

    For transfer-shaped histories the total is constant: the
    reference's bank invariant (benchmark/bank.clj:41-44,
    throughput.clj:137-147) as a single analytics query. Implemented
    without a per-snapshot rescan: each key contributes its value delta
    at each of its write points; a running sum over write points yields
    every snapshot's total in one pass.

    `decimal=True` runs the delta sums in decimal(27,6) so running
    totals are exact and hash-match a SQL oracle (decimal addition is
    associative, so the two-level decomposition below is bit-identical
    to a sequential running sum).

    The running sum is a TWO-LEVEL prefix sum, never a single-partition
    window over all write points (which would serialize billions of
    rows through one task at 100 TB):

      1. write points are split into `n_ranges` contiguous ranges by
         value (deterministic integer arithmetic — no sampling);
      2. each range computes its local prefix sums in parallel
         (window partitioned by range id);
      3. the per-range totals — `n_ranges` rows, model-sized — come to
         the driver for an exact exclusive prefix sum and return as a
         literal map of range offsets (the same model-sized-collect
         rule the IVF centroids follow; no unbounded driver state).
    """
    from decimal import Decimal

    w_key = Window.partitionBy(key).orderBy(version)
    delta = F.col(value) - F.coalesce(F.lag(value).over(w_key), F.lit(0))
    if decimal:
        delta = delta.cast("decimal(27,6)")
    deltas = versions.withColumn("_delta", delta)
    # lazy localCheckpoint: per_wp feeds both the range-offset pass and
    # the main path — materialize once inside the first action instead
    # of aggregating the versions table twice.
    per_wp = (
        deltas.groupBy(version)
        .agg(F.sum("_delta").alias("_wp_delta"))
        .localCheckpoint(eager=False)
    )
    # Contiguous ranges from pure integer arithmetic on the version
    # value: deterministic under any partitioning, retry-safe (unlike
    # spark_partition_id after a sampled repartitionByRange). This
    # first action also materializes the per_wp checkpoint, so the two
    # later jobs reuse it instead of re-running the key-window pass.
    lo, hi = per_wp.agg(F.min(version), F.max(version)).first()
    if lo is None:
        return per_wp.select(version, F.lit(None).cast("double").alias("total"))
    width = max(1, -(-(hi - lo + 1) // n_ranges))
    grp = ((F.col(version) - F.lit(lo)) / F.lit(width)).cast("long")
    grouped = per_wp.withColumn("_grp", grp)
    # Per-range totals are MODEL-SIZED (≤ n_ranges rows) — like the IVF
    # centroids, they come to the driver, get an exact exclusive prefix
    # sum there (Python ints/Decimals — no float drift), and go back as
    # literals. That replaces a broadcast-join + partition-less window
    # with a map lookup, and the only cross-range data movement is
    # n_ranges scalars.
    g_rows = sorted(
        grouped.groupBy("_grp").agg(F.sum("_wp_delta").alias("_g")).collect()
    )
    acc = Decimal(0) if decimal else 0
    off_literals = []
    for g, tot in g_rows:
        off_literals.append((g, acc))
        acc += tot
    off_map = F.create_map(
        *[x for g, o in off_literals for x in (F.lit(g), F.lit(o))]
    )
    w_local = (
        Window.partitionBy("_grp")
        .orderBy(version)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    total = off_map[F.col("_grp")] + F.sum("_wp_delta").over(w_local)
    if decimal:
        total = total.cast("double")
    return grouped.select(version, total.alias("total"))
