"""opusdb_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of gchape/opusdb (a Clojure
MVCC/STM database kernel, see /root/reference) re-expressed as an
analytical engine on Apache Spark: versioned-table semantics (latest-per-
key, as-of reads, bounded history — reference stm.clj:55-65,161-162,10)
become window queries over immutable columnar snapshots; the append-only
log (reference log_mgr.clj) becomes an ordered event table + streaming
sinks; and the full relational / windowed / streaming / LLM-data-pipeline
operator surface mandated by SURVEY.md §2B is built on DataFrame/SQL so
Catalyst + Tungsten + AQE own the physical execution.

Nothing from the reference's storage machinery (buffer pool, WAL, page
codec, splay cache, commit lock) is ported: Spark subsumes it (SURVEY §4).
"""

__version__ = "0.1.0"

from opusdb_spark.session import get_spark  # noqa: F401
from opusdb_spark.registry import queries, oracle_sql  # noqa: F401
