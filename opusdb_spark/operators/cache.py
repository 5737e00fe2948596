"""Process-wide loop-invariant DataFrame cache with explicit release.

Iterative/multi-pass operators (graph power iterations, multi-spec
exact NTILE) return plans that re-read an intermediate frame many
times; persisting it is mandatory (without it each reference re-runs
the corpus-sized lineage), but the builder cannot unpersist before the
caller collects. The resolution: one live persisted handle per cache
key — a rebuild for the same key unpersists the PREVIOUS handle (the
CacheManager never GCs re-registered identical plans on its own), and
`release_loop_caches()` frees everything at teardown (wired into the
test session fixture and bench.py main).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LOOP_CACHE: dict[str, DataFrame] = {}


def loop_cache(key: str, df: DataFrame) -> DataFrame:
    """Persist ``df`` as the single live handle for ``key``."""
    old = _LOOP_CACHE.pop(key, None)
    if old is not None:
        old.unpersist()
    df = df.persist()
    _LOOP_CACHE[key] = df
    return df


def release_loop_caches() -> None:
    """Unpersist every live loop-invariant cache (teardown hook)."""
    while _LOOP_CACHE:
        _LOOP_CACHE.popitem()[1].unpersist()
