"""UDF / UDAF / UDTF surface (SURVEY §2B).

The extension points a user of the engine gets: row Python UDFs (slow
path, shown once), Arrow-vectorized pandas UDFs (the real path —
SNIPPETS.md [1],[3] patterns), grouped-agg pandas UDAFs, applyInPandas
grouped-map transforms, and generator (explode) UDTFs.

Determinism: pandas UDFs that aggregate floats quantize operands to
6-decimal Decimals and sum exactly — the same exact-decimal contract as
opusdb_spark.exactness — so results hash-match the SQL oracle despite
pandas' pairwise-summation order differing from DuckDB's.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from opusdb_spark.registry import register
from opusdb_spark.tables import table

_Q6 = Decimal("0.000001")


def _exact_sum(series: pd.Series) -> float:
    """Sum of 6-decimal-quantized values — order-independent, exact."""
    total = Decimal(0)
    for v in series:
        # Decimal(float) takes the *exact* binary value (like an engine
        # cast); HALF_UP matches Spark's and DuckDB's cast rounding.
        total += Decimal(float(v)).quantize(_Q6, rounding=ROUND_HALF_UP)
    return float(total)


@register(
    "udf_python",
    oracle="""
        SELECT o_orderkey, o_totalprice,
               CASE WHEN o_totalprice < 50000  THEN 'low'
                    WHEN o_totalprice < 150000 THEN 'mid'
                    ELSE 'high' END AS bracket
        FROM orders
    """,
    tags=("udf",),
)
def udf_python(spark, sf_dir):
    """Row-at-a-time Python UDF (tax bracket). Deliberately the slow path
    — kept off every hot query; see udf_pandas_scalar for the real one."""

    @F.udf(returnType=StringType())
    def bracket(price: float) -> str:
        if price < 50000:
            return "low"
        if price < 150000:
            return "mid"
        return "high"

    o = table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice", bracket("o_totalprice").alias("bracket"))


@register(
    "udf_pandas_scalar",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS discounted
        FROM lineitem
    """,
    tags=("udf", "pandas"),
)
def udf_pandas_scalar(spark, sf_dir):
    """Arrow-vectorized scalar pandas UDF — float64 arithmetic on whole
    batches; per-row IEEE ops so values match the oracle bit-for-bit."""

    @F.pandas_udf(DoubleType())
    def discounted(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1 - disc)

    lt = table(spark, sf_dir, "lineitem")
    return lt.select(
        "l_orderkey",
        "l_linenumber",
        discounted("l_extendedprice", "l_discount").alias("discounted"),
    )


@register(
    "udaf_pandas_grouped",
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(27,6))) AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)
                 AS weighted_avg_price
        FROM lineitem GROUP BY l_returnflag
    """,
    tags=("udf", "pandas"),
)
def udaf_pandas_grouped(spark, sf_dir):
    """Grouped-agg pandas UDAF: quantity-weighted mean price (SNIPPETS.md
    [1] GROUPED_AGG pattern) with exact-decimal internal sums."""

    @F.pandas_udf(DoubleType())
    def weighted_mean(price: pd.Series, qty: pd.Series) -> float:
        return _exact_sum(price * qty) / _exact_sum(qty)

    lt = table(spark, sf_dir, "lineitem")
    return lt.groupBy("l_returnflag").agg(
        weighted_mean("l_extendedprice", "l_quantity").alias("weighted_avg_price")
    )


@register(
    "udtf_grouped_map",
    oracle="""
        WITH stats AS (
            SELECT l_returnflag, COUNT(*) AS n,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS s1,
                   CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS s2
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
               (l.l_quantity - s.s1 / s.n)
                   / SQRT((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1)) AS qty_z
        FROM lineitem l JOIN stats s ON l.l_returnflag = s.l_returnflag
    """,
    tags=("udf", "pandas"),
)
def udtf_grouped_map(spark, sf_dir):
    """applyInPandas per-group z-score normalization (SNIPPETS.md [2]
    grouped-map pattern). Mean/std are derived from exact decimal moments
    so every per-row double matches the window-SQL oracle."""

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        s1 = _exact_sum(pdf["l_quantity"])
        s2 = _exact_sum(pdf["l_quantity"] * pdf["l_quantity"])
        mean = s1 / n
        std = ((s2 - s1 * s1 / n) / (n - 1)) ** 0.5
        return pd.DataFrame(
            {
                "l_orderkey": pdf["l_orderkey"],
                "l_linenumber": pdf["l_linenumber"],
                "l_returnflag": pdf["l_returnflag"],
                "qty_z": (pdf["l_quantity"] - mean) / std,
            }
        )

    lt = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    return lt.groupBy("l_returnflag").applyInPandas(
        normalize,
        schema="l_orderkey long, l_linenumber int, l_returnflag string, qty_z double",
    )


@register(
    "udtf_explode",
    oracle="""
        SELECT o_orderkey,
               UNNEST(generate_series(1, CAST(o_orderkey % 3 + 1 AS INT)))
                   AS slot
        FROM orders
    """,
    tags=("udf", "generator"),
)
def udtf_explode(spark, sf_dir):
    """One-to-many generator: each order fans out to (orderkey % 3) + 1
    slot rows via explode(sequence(...)) — a zero-shuffle row generator."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.explode(
            F.sequence(F.lit(1), (F.col("o_orderkey") % 3 + 1).cast("int"))
        ).alias("slot"),
    )


@register(
    "udtf_python_api",
    oracle="""
        SELECT doc_id, w AS word, CAST(i - 1 AS INTEGER) AS idx
        FROM (
            SELECT doc_id, string_split(text, ' ')[i] AS w, i
            FROM documents,
                 LATERAL (SELECT UNNEST(range(1, len(string_split(text, ' ')) + 1)) AS i)
            WHERE lang = 'de'
        )
        WHERE w <> ''
    """,
    tags=("udtf", "python-api"),
)
def udtf_python_api(spark, sf_dir):
    """Spark's native Python UDTF API (@udtf class, registered and
    invoked via LATERAL in SQL): one (word, idx) row per token — the
    table-function extension point itself, distinct from the
    explode/grouped-map emulations. Arrow-batched; per-row fan-out is
    bounded by document length."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, idx: int")
    class SplitWords:
        def eval(self, text: str):
            if text is None:
                return
            for i, w in enumerate(text.split(" ")):
                if w:
                    yield w, i

    spark.udtf.register("opusdb_split_words", SplitWords)
    from opusdb_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT doc_id, s.word, s.idx
        FROM documents, LATERAL opusdb_split_words(text) AS s
        WHERE lang = 'de'
        """
    )


@register(
    "udf_cogrouped",
    oracle="""
        SELECT o.o_orderkey,
               CAST(COUNT(l.l_orderkey) AS BIGINT) AS n_items,
               round(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(27,6))) AS DOUBLE)
                     / o.o_totalprice, 6) AS price_ratio
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_totalprice
    """,
    tags=("udf", "cogroup"),
)
def udf_cogrouped(spark, sf_dir):
    """Cogrouped applyInPandas: orders and lineitem cogrouped per
    KEY BUCKET (orderkey % 64) and reconciled vectorized inside one
    pandas function — the two-sided custom transform the single-table
    grouped-map can't express.

    Cogrouping on the raw orderkey would invoke Python once per order
    (thousands of single-row calls — measured 28s at sf0.01); bucketing
    gives 64 substantial groups and pandas-vectorized work inside each,
    which is the shape a real cogroup job uses. Determinism: per-order
    price sums use math.fsum (correctly rounded regardless of row
    arrival order), equal to the oracle's exact-decimal sum since
    prices carry 2 decimals. The 6-dp rounding happens ENGINE-side via
    F.round (HALF_UP, matching DuckDB round's half-away-from-zero for
    positive ratios) — Python's round() is banker's rounding and would
    diverge from the oracle on exact halfway points (ADVICE r2)."""
    import math

    o = (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .withColumn("_b", F.col("o_orderkey") % 64)
    )
    lt = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_extendedprice")
        .withColumn("_b", F.col("l_orderkey") % 64)
    )

    def reconcile(key, orders_pdf, items_pdf):
        if not len(orders_pdf) or not len(items_pdf):
            return pd.DataFrame(columns=["o_orderkey", "n_items", "price_ratio"])
        per_order = items_pdf.groupby("l_orderkey")["l_extendedprice"].agg(
            [("total", lambda s: math.fsum(s)), ("n_items", "size")]
        )
        m = orders_pdf.merge(
            per_order, left_on="o_orderkey", right_index=True, how="inner"
        )
        return pd.DataFrame(
            {
                "o_orderkey": m["o_orderkey"].astype("int64"),
                "n_items": m["n_items"].astype("int64"),
                "price_ratio": m["total"] / m["o_totalprice"],
            }
        )

    return (
        o.groupBy("_b")
        .cogroup(lt.groupBy("_b"))
        .applyInPandas(
            reconcile,
            "o_orderkey long, n_items long, price_ratio double",
        )
        .withColumn("price_ratio", F.round("price_ratio", 6))
    )


# EWMA recurrence replay: pandas ewm(alpha, adjust=False) computes
# y_t = ((1-a)·y_{t-1} + a·x_t) / ((1-a)+a) — the divisor is exactly
# 1.0 for a=0.1 so the expanded form is the plain double recurrence —
# PLUS one short-circuit the expanded form lacks: the Cython kernel
# (pandas window/aggregations.pyx) SKIPS the update when
# cur == weighted_avg, preserving constant runs exactly, while the
# expanded 0.9·v + 0.1·v can round 1 ulp away from v on specific
# mantissas (hypothesis falsified the old "bit-identical recurrence"
# premise at ys=[2.374538501501172e-96]×2 — pinned as a regression
# example in tests/test_properties.py). The CTE therefore mirrors the
# kernel: CASE WHEN s.value = r.y THEN r.y ELSE the recurrence END.
# The recursion advances one row per type per round, carrying each
# type's value/id LISTS and stepping by subscript (r11: the original
# row_number JOIN form re-probed the 10k-row seq table every
# iteration — 11.5 s at sf0.01, 34 s inside the driver-sim sweep; the
# list-carry form is 0.6 s and verified BITWISE identical on the full
# table). The point stands: the "not SQL-expressible" claim is about
# WINDOWS, not about SQL recursion.
_EWMA_ORACLE = """
    WITH RECURSIVE seq AS (
        SELECT event_type, event_id, value,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
               ) AS rn
        FROM events
    ),
    arr AS (
        SELECT event_type,
               list(value ORDER BY rn) AS vals,
               list(event_id ORDER BY rn) AS ids
        FROM seq GROUP BY event_type
    ),
    rec AS (
        SELECT event_type, 1 AS rn, vals, ids, vals[1] AS y FROM arr
        UNION ALL
        SELECT event_type, rn + 1, vals, ids,
               CASE WHEN vals[rn + 1] = y THEN y
                    ELSE 0.9 * y + 0.1 * vals[rn + 1] END
        FROM rec WHERE rn < len(vals)
    )
    SELECT ids[rn] AS event_id, event_type, ROUND(y, 6) AS ewma FROM rec
"""


@register("udaf_ewma", oracle=_EWMA_ORACLE, tags=("udf", "timeseries"))
def udaf_ewma(spark, sf_dir):
    """Per-type EWMA (alpha=0.1, adjust=False) over the event stream —
    the inherently-sequential recurrence SQL windows can't express
    (each output depends on the previous output, not a fixed frame).
    applyInPandas per event_type: Arrow-batched, state stays inside the
    group's pandas frame, shuffle ∝ groups. The per-group sort is the
    operator's real cost at 100 TB — same shape as any keyed window.
    Rounded to 6dp so results are stable across Arrow batch splits.
    Hash-oracled since r9: the pandas kernel is the plain double
    recurrence plus an equal-value short-circuit (skip the update when
    cur == weighted_avg), which the DuckDB recursive CTE mirrors
    step-for-step (see _EWMA_ORACLE)."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )

    def ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        out = pdf[["event_id", "event_type"]].copy()
        out["ewma"] = (
            pdf["value"].ewm(alpha=0.1, adjust=False).mean().round(6)
        )
        return out

    return ev.groupBy("event_type").applyInPandas(
        ewma, "event_id long, event_type string, ewma double"
    )
