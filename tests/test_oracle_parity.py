"""The local t2 gate: every registered query vs its DuckDB oracle.

Runs at sf0.001 by default (fast inner loop); set
OPUSDB_PARITY_SF_DIR=/root/testdata/sf0.01 to mirror the driver's scale.
Rows-only queries (no oracle) are just executed and sanity-checked.
"""

from __future__ import annotations

import os

import pytest

from opusdb_spark.registry import registry
from tests.conftest import make_duck
from tests.parity import compare, spark_to_pandas

SF_DIR = os.environ.get("OPUSDB_PARITY_SF_DIR", "/root/testdata/sf0.001")

_QUERIES = registry()


@pytest.fixture(scope="module")
def duck():
    con = make_duck(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_parity(name, spark, duck):
    q = _QUERIES[name]
    sdf = q.fn(spark, SF_DIR)
    spdf = spark_to_pandas(sdf)
    if q.oracle is None:
        # rows-only: runs, returns a stable schema, row count ≥ 0
        assert spdf is not None
        assert len(sdf.columns) > 0
        # The driver's rows-only canonicalizer sorts rows by EVERY
        # column, which dies on unhashable cells (ndarray/list) —
        # emb_pca_power shipped an array<double> column and was the
        # only red CORRECTNESS row in six rounds. Pin the driver op
        # locally for every rows-only key.
        try:
            spdf.sort_values(by=list(spdf.columns))
            for col in spdf.columns:
                hash(tuple(spdf[col].head(5)))
        except (TypeError, ValueError) as e:  # pragma: no cover
            pytest.fail(
                f"{name}: rows-only result not canonicalizable by the "
                f"driver (all-column sort_values raised {e}); emit "
                f"scalar columns only"
            )
        return
    ddf = duck.execute(q.oracle).df()
    res = compare(spdf, ddf)
    assert res.ok, f"{name}: {res.detail}"
    if not res.exact:
        print(f"WARNING {name}: values match within tolerance but not exactly")
