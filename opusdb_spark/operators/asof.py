"""As-of join — the Spark-native form of opusdb's version resolution.

The reference resolves a snapshot read by binary-searching a ref's
version history for the newest version with write_point ≤ read_point
(`find-version`, stm.clj:55-65, used by in-txn deref stm.clj:160-178).
Generalized to relations: for each left row (key, t), find the single
right row (key, t') with the largest t' ≤ t.

Spark has no native as-of join. Strategy (scales to 100 TB):

  union-tag-window: tag left rows (is_probe=1) and right rows
  (is_probe=0), union, then one window per key ordered by (time,
  is_probe) and `last(right_value, ignorenulls=True)` carries the most
  recent right row forward onto each probe row. Cost: ONE shuffle on the
  key (same as any keyed join) + per-partition sort — no range
  explosion, no skew amplification beyond the key distribution, and AQE
  can split skewed keys. A conditional-join formulation (key-equal +
  t' ≤ t, then max per left row) would multiply matches before
  aggregating — quadratic per hot key — so it is used only as the
  DuckDB oracle, never the Spark plan.

Probe rows whose time precedes every right version get NULLs — exactly
the reference's "version GC'd / nil" case (stm.clj:63-65).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    tolerance: Column | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: newest right row per key with right_time ≤ left_time.

    Returns `left` columns + `right_values` (+ `asof_time`, the matched
    right_time). NULL right columns when no version qualifies.

    `direction`:
      - "backward" (default): newest right_time ≤ left_time — the
        reference's find-version rule.
      - "forward": smallest right_time ≥ left_time — the next version
        at or after the probe (a DESC-ordered running window, NEVER a
        current-row→unbounded-following frame, which Spark executes by
        re-scanning the suffix per row — O(n²) per key).
      - "nearest": whichever of the two is closer in time; exact ties
        prefer backward. Both carries compute over ONE shuffle (same
        partitioning, two sort orders — Catalyst reuses the Exchange).
    `tolerance` applies to the backward direction only.

    Duplicate (on, right_time) build rows are resolved DETERMINISTICALLY:
    the window ordering breaks the tie on the right_values themselves,
    so the carried row is the lexicographically-last duplicate rather
    than partition-sort luck.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of direction: {direction!r}")
    if tolerance is not None and direction != "backward":
        raise ValueError("tolerance is only supported for direction='backward'")
    lcols = left.columns
    clash = set(right_values) & set(lcols)
    if clash:
        raise ValueError(
            f"right_values {sorted(clash)} collide with left columns — "
            "rename them on the right side before the as-of join"
        )
    if right_time in lcols and right_time != left_time:
        raise ValueError(
            f"right_time column '{right_time}' shadows a left column — "
            "rename it on the right side before the as-of join"
        )
    probe = left.withColumn("__is_probe", F.lit(1)).withColumn(
        "__t", F.col(left_time)
    )
    build = (
        right.select(on, right_time, *right_values)
        .withColumn("__is_probe", F.lit(0))
        .withColumn("__t", F.col(right_time))
    )
    # Align schemas for the union: probe rows carry NULL right-values.
    for c in right_values + [right_time]:
        if c not in probe.columns:
            probe = probe.withColumn(c, F.lit(None).cast(dict(build.dtypes)[c]))
    for c in lcols:
        if c not in build.columns:
            build = build.withColumn(c, F.lit(None).cast(dict(probe.dtypes)[c]))
    # right_time == left_time (both sides named e.g. 'ts') is legal:
    # the time already rides in __t (and in lcols for probe rows), so
    # projecting it AGAIN would duplicate the column and unionByName
    # would refuse; project it only when it's a distinct column.
    extra_t = [right_time] if right_time not in lcols else []
    unioned = probe.select(
        *lcols, *extra_t, *right_values, "__is_probe", "__t"
    ).unionByName(
        build.select(*lcols, *extra_t, *right_values, "__is_probe", "__t")
    )
    # Build rows sort before probe rows at equal time, so `≤` is
    # inclusive; trailing right_values keys make duplicate (key, time)
    # build rows resolve deterministically (probe rows all carry NULLs
    # there, so their relative order — which is irrelevant to their own
    # frames — is unaffected).
    w_back = (
        Window.partitionBy(on)
        .orderBy(
            F.col("__t").asc(),
            F.col("__is_probe").asc(),
            *[F.col(c).asc_nulls_first() for c in right_values],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward = the same running-carry trick traversed in DESC time
    # (build rows still sort before probes at equal time, so ≥ stays
    # inclusive); the last non-null seen is the smallest time ≥ probe
    w_fwd = (
        Window.partitionBy(on)
        .orderBy(
            F.col("__t").desc(),
            F.col("__is_probe").asc(),
            *[F.col(c).asc_nulls_first() for c in right_values],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def _carry(col: Column, w) -> Column:
        return F.last(
            F.when(F.col("__is_probe") == 0, col), ignorenulls=True
        ).over(w)

    if direction in ("backward", "forward"):
        w = w_back if direction == "backward" else w_fwd
        filled = unioned.select(
            *lcols,
            "__is_probe",
            _carry(F.col("__t"), w).alias("asof_time"),
            *[_carry(F.col(c), w).alias(c) for c in right_values],
        )
    else:  # nearest: both carries over one shuffle, pick per row
        both = unioned.select(
            *lcols,
            "__is_probe",
            F.col("__t"),
            _carry(F.col("__t"), w_back).alias("__bt"),
            _carry(F.col("__t"), w_fwd).alias("__ft"),
            *[_carry(F.col(c), w_back).alias(f"__b_{c}") for c in right_values],
            *[_carry(F.col(c), w_fwd).alias(f"__f_{c}") for c in right_values],
        )
        # strictly closer forward wins; ties and missing-forward fall
        # back to backward (timestamp/numeric differences both compare)
        prefer_fwd = F.col("__ft").isNotNull() & (
            F.col("__bt").isNull()
            | (
                (F.col("__ft") - F.col("__t"))
                < (F.col("__t") - F.col("__bt"))
            )
        )
        filled = both.select(
            *lcols,
            "__is_probe",
            F.when(prefer_fwd, F.col("__ft"))
            .otherwise(F.col("__bt"))
            .alias("asof_time"),
            *[
                F.when(prefer_fwd, F.col(f"__f_{c}"))
                .otherwise(F.col(f"__b_{c}"))
                .alias(c)
                for c in right_values
            ],
        )
    out = filled.filter(F.col("__is_probe") == 1).drop("__is_probe")
    if tolerance is not None:
        keep = F.col("asof_time") >= (F.col(left_time) - tolerance)
        out = out.select(
            *lcols,
            F.when(keep, F.col("asof_time")).alias("asof_time"),
            *[F.when(keep, F.col(c)).alias(c) for c in right_values],
        )
    return out
