"""Cross-engine numeric determinism helpers.

Summing doubles is order-dependent; Spark's partial/final aggregation
order differs from DuckDB's, so raw `sum(double)` hashes can differ in
the last bits. Fix: cast each operand to DECIMAL before summing —
decimal addition is exact and associative, so both engines produce the
*identical* value — then cast the final sum back to DOUBLE (correctly
rounded in both engines → bit-identical float64).

Per-row double arithmetic (a*b, 1-x, comparisons) is IEEE-deterministic
and needs no treatment. Averages are expressed as exact-decimal-sum /
count so the one division happens on identical operands.

This mirrors the determinism obligations the reference pins with its
conservation invariants (bank.clj:41-44, throughput.clj:137-147): totals
must come out exact regardless of execution interleaving.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(27,6)"  # fits |x| < 1e21 at 6 decimals — row-level safe


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent sum of a double expression, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Deterministic mean: exact decimal sum / non-null count."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE) / COUNT({expr})"
        f" AS {alias}"
    )


def round_like_duckdb(x: float, ndigits: int = 6) -> float:
    """Bit-mirror of DuckDB's ROUND(double, n) for driver-side values
    that an oracle re-rounds with SQL ROUND (ADVICE r10: emb_kmeans
    rounded inertia with Python round() — banker's — while the oracle
    used SQL ROUND; the two only diverge on an exact 5e-7 tie, but the
    mismatch was avoidable).

    DuckDB's kernel is the scaled multiply: round(x*10^n)/10^n with
    half-away-from-zero on the SCALED double — measured bit-identical
    to copysign(floor(|x|*10^n + 0.5), x)/10^n on a 20k uniform fuzz
    plus 100 exact .5-boundary values, where both Python round()
    (banker's) and Decimal-HALF_UP (decimal-exact quantize, which the
    scaled multiply is not) disagree with it on ties. Premise pinned
    in tests/test_properties.py::test_round_like_duckdb_mirrors_sql_round.
    """
    import math

    if x != x or math.isinf(x):  # NaN/inf: ROUND passes them through
        return x
    p = 10.0**ndigits
    return math.copysign(math.floor(abs(x) * p + 0.5), x) / p
