"""Local replica of the driver's t2 oracle comparison.

Compares a Spark result against its DuckDB oracle: row count, column
names, and order-insensitive values. Floats compare with a tight
tolerance AND report exactness so hash-level drift is visible before
the driver runs.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from decimal import Decimal

import numpy as np
import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            sample = s.dropna()
            if len(sample) and isinstance(sample.iloc[0], Decimal):
                df[c] = s.map(lambda d: float(d) if d is not None else None)
            elif len(sample) and isinstance(
                sample.iloc[0], (list, np.ndarray, tuple)
            ):
                df[c] = s.map(
                    lambda v: tuple(v.tolist() if isinstance(v, np.ndarray) else v)
                    if v is not None
                    else None
                )
            elif len(sample) and isinstance(sample.iloc[0], (bytes, bytearray)):
                df[c] = s.map(lambda b: bytes(b) if b is not None else None)
            elif len(sample) and type(sample.iloc[0]).__name__ in ("date", "datetime"):
                df[c] = pd.to_datetime(s).astype("datetime64[us]")
        if str(s.dtype).startswith("datetime64"):
            df[c] = s.astype("datetime64[us]")
    return df


def _sort_rows(df: pd.DataFrame) -> pd.DataFrame:
    if not len(df.columns) or not len(df):
        return df.reset_index(drop=True)
    key = df.apply(lambda row: repr(tuple(repr(v) for v in row)), axis=1)
    return df.loc[key.sort_values().index].reset_index(drop=True)


@dataclass
class ParityResult:
    ok: bool
    exact: bool
    detail: str


def _canon_kind(s: pd.Series) -> str:
    """Dtype *kind* as the driver's canonicalizer would see it.

    The driver hashes canonicalized values without unifying numeric
    dtypes, so int64 `967` vs float64 `967.0` is a hash MISMATCH even
    though the values are numerically equal (r01 `agg_conditional`).
    This classifier feeds the strictness check that makes the local
    gate predict that behavior.
    """
    k = s.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "ts"
    if k == "O":
        sample = s.dropna()
        if not len(sample):
            return "empty"
        v = sample.iloc[0]
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, Decimal):
            return "decimal"
        if isinstance(v, (int, np.integer)):
            # pandas coerces nullable int columns to float64 (NaN) on
            # BOTH driver paths (toPandas / duckdb .df()); replicate.
            return "float" if s.isna().any() else "int"
        if isinstance(v, (float, np.floating)):
            return "float"
        if type(v).__name__ in ("date", "datetime", "Timestamp"):
            return "ts"
        return "other"
    return k


def _driver_unhashable(s: pd.Series) -> bool:
    """True if the column holds cells pandas can't factorize/hash —
    the driver's row sort dies on these (r01 `agg_collect_sorted`:
    `unhashable type: numpy.ndarray`)."""
    if s.dtype != object:
        return False
    return any(
        isinstance(v, (list, np.ndarray, dict, set))
        for v in s.dropna().head(100)
    )


def _strictness_errors(a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    """Driver-grade checks run BEFORE the lenient value comparison."""
    errs = []
    for c in a.columns:
        if _driver_unhashable(a[c]):
            errs.append(f"{c}: spark side has unhashable cells (array/map)")
        if _driver_unhashable(b[c]):
            errs.append(f"{c}: oracle side has unhashable cells (array/map)")
        ka, kb = _canon_kind(a[c]), _canon_kind(b[c])
        if "empty" in (ka, kb) or ka == kb:
            continue
        numericish = {"int", "float", "decimal", "bool"}
        if ka in numericish and kb in numericish:
            errs.append(
                f"{c}: dtype-kind mismatch {ka} (spark) vs {kb} (oracle) — "
                "driver hash would differ; align with explicit casts"
            )
    return errs


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, rtol=1e-9) -> ParityResult:
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    if len(a) != len(b):
        return ParityResult(False, False, f"row count {len(a)} vs {len(b)}")
    if list(a.columns) != list(b.columns):
        return ParityResult(
            False, False, f"columns {list(a.columns)} vs {list(b.columns)}"
        )
    strict = _strictness_errors(spark_pdf[sorted(spark_pdf.columns)],
                                duck_pdf[sorted(duck_pdf.columns)])
    if strict:
        return ParityResult(False, False, "; ".join(strict))
    a, b = _sort_rows(a), _sort_rows(b)
    exact = True
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            an, bn = av.astype(float), bv.astype(float)
            na, nb = an.isna(), bn.isna()
            if not na.equals(nb):
                return ParityResult(False, False, f"null mismatch in {c}")
            close = np.allclose(
                an[~na], bn[~nb], rtol=rtol, atol=1e-12, equal_nan=True
            )
            if not close:
                i = int(
                    np.argmax(
                        ~np.isclose(an[~na], bn[~nb], rtol=rtol, atol=1e-12)
                    )
                )
                return ParityResult(
                    False,
                    False,
                    f"float mismatch in {c} at sorted row {i}: "
                    f"{an[~na].iloc[i]!r} vs {bn[~nb].iloc[i]!r}",
                )
            x, y = an[~na].to_numpy(), bn[~nb].to_numpy()
            both_nan = np.isnan(x) & np.isnan(y)
            if not ((x == y) | both_nan).all():
                exact = False
        else:
            eq = av.fillna("§null§") if av.dtype == object else av
            be = bv.fillna("§null§") if bv.dtype == object else bv
            try:
                same = eq.equals(be)
            except Exception:
                same = list(eq) == list(be)
            if not same:
                diffs = [
                    (i, x, y)
                    for i, (x, y) in enumerate(zip(list(av), list(bv)))
                    if repr(x) != repr(y)
                ][:3]
                if diffs:
                    return ParityResult(
                        False, False, f"value mismatch in {c}: {diffs}"
                    )
    return ParityResult(True, exact, "ok" if exact else "float-inexact")


def spark_to_pandas(df) -> pd.DataFrame:
    rows = df.collect()
    return pd.DataFrame([r.asDict(recursive=True) for r in rows], columns=df.columns)
