"""The local parity gate must predict the driver's canonicalizer.

Round-1 driver failures that the old lenient compare() let through:
  - `agg_conditional`: Spark int64 967 vs DuckDB HUGEINT→float64 967.0
    — values equal, canonical hash different.
  - `agg_collect_sorted`: array<long> cells — pandas row sort dies with
    "unhashable type: numpy.ndarray".
These tests pin that compare() now rejects those shapes (and the
Decimal-vs-float shape fn_cast_decimal would have hit next).
"""

from __future__ import annotations

from decimal import Decimal

import numpy as np
import pandas as pd

from tests.parity import compare


def test_int_vs_float_column_is_rejected():
    a = pd.DataFrame({"k": ["x", "y"], "n": pd.array([967, 3010], dtype="int64")})
    b = pd.DataFrame({"k": ["x", "y"], "n": [967.0, 3010.0]})
    res = compare(a, b)
    assert not res.ok
    assert "dtype-kind mismatch" in res.detail


def test_ndarray_cells_are_rejected():
    a = pd.DataFrame(
        {"k": [1, 2], "orderkeys": [np.array([1, 2]), np.array([3])]}
    )
    b = pd.DataFrame({"k": [1, 2], "orderkeys": [[1, 2], [3]]})
    res = compare(a, b)
    assert not res.ok
    assert "unhashable" in res.detail


def test_decimal_vs_float_column_is_rejected():
    a = pd.DataFrame({"k": ["x"], "total": [Decimal("123.40")]})
    b = pd.DataFrame({"k": ["x"], "total": [123.4]})
    res = compare(a, b)
    assert not res.ok
    assert "dtype-kind mismatch" in res.detail


def test_matching_int_columns_still_pass():
    a = pd.DataFrame({"k": ["x", "y"], "n": pd.array([1, 2], dtype="int64")})
    b = pd.DataFrame({"k": ["x", "y"], "n": pd.array([1, 2], dtype="int64")})
    res = compare(a, b)
    assert res.ok and res.exact


def test_nullable_int_vs_float_nan_passes():
    # With NULLs present, both driver paths coerce int -> float64; the
    # replica must not flag that as a kind mismatch.
    a = pd.DataFrame({"k": ["x", "y"], "n": [1, None]})  # object ints + None
    b = pd.DataFrame({"k": ["x", "y"], "n": [1.0, np.nan]})
    res = compare(a, b)
    assert res.ok, res.detail


def test_recently_changed_keys_all_exist():
    """Every _RECENTLY_CHANGED entry must name a registered query: the
    sweep-priority head silently drops unknown names (`if k in items`),
    so a typo would waste the driver's budget slot it was meant to
    spend re-verdicting that key."""
    from opusdb_spark import registry as reg

    qs = reg.registry()
    missing = [k for k in reg._RECENTLY_CHANGED if k not in qs]
    assert not missing, f"unknown keys in _RECENTLY_CHANGED: {missing}"


def test_artifact_oracles_resolve_parity_dir_lazily(monkeypatch):
    """ADVICE r10: artifact-backed oracles used to bake
    OPUSDB_PARITY_SF_DIR-derived paths into their SQL at module-import
    time, so any entrypoint importing the registry before pinning the
    env var silently paired Spark results against the wrong corpus's
    artifacts. Pin the fix: `.oracle` must re-resolve the corpus at
    ACCESS time, after the registry is already imported."""
    from opusdb_spark.registry import registry

    q = registry()["llm_pq_recall_eval"]  # artifact-backed oracle
    monkeypatch.setenv("OPUSDB_PARITY_SF_DIR", "/root/testdata/sf0.001")
    assert "sf0.001" in q.oracle
    monkeypatch.setenv("OPUSDB_PARITY_SF_DIR", "/root/testdata/sf0.01")
    assert "sf0.001" not in q.oracle and "sf0.01" in q.oracle
