from __future__ import annotations

import os

import duckdb
import pytest

from opusdb_spark.session import get_spark
from opusdb_spark.tables import TABLE_NAMES

SF_SMALL = os.environ.get("OPUSDB_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("OPUSDB_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="opusdb-tests", master="local[8]", shuffle_partitions=8)
    yield s
    # Bound executor memory across the suite: drop the graph family's
    # loop-invariant persisted handles before tearing the session down
    # (graph.py keeps one live handle per (query, sf_dir) otherwise).
    from opusdb_spark.queries.graph import release_graph_caches

    release_graph_caches()
    s.stop()


def make_duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


@pytest.fixture(scope="session")
def duck_small():
    con = make_duck(SF_SMALL)
    yield con
    con.close()


@pytest.fixture(scope="session")
def duck_oracle():
    con = make_duck(SF_ORACLE)
    yield con
    con.close()
