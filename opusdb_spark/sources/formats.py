"""Format readers/writers with explicit schemas.

Readers always take a schema: at 100 TB, schema inference is a full
extra pass over the data (and CSV/JSON inference can mis-type columns
partition-by-partition). Writers default to snappy parquet; the
partitioned writer lays out hive-style directories so downstream
filters on the partition column become partition-pruned scans
(Catalyst prunes directories before listing files).
"""

from __future__ import annotations

import os
import shutil
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".scratch"
)


def scratch_sink(name: str) -> str:
    """Stable per-name scratch path, cleared before reuse.

    Side-effecting queries write here; a STABLE name (not a uuid) plus
    clear-on-entry keeps repeated runs byte-identical without leaking a
    fresh directory per invocation."""
    path = os.path.join(_SCRATCH, name)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path


def scratch_path(name: str) -> str:
    """Stable scratch path that is NOT cleared — for ingest-once
    layouts (partitioned/bucketed copies, indexes) guarded by
    `ensure_written`."""
    path = os.path.join(_SCRATCH, name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path


def ensure_written(path: str, fingerprint: dict, write_fn) -> str:
    """Idempotent materialization: run `write_fn(path)` only when the
    stored fingerprint differs. This is the ingest/query split — a
    100 TB layout is organized ONCE at ingest, never inside a query —
    so repeated query invocations don't pay a table rewrite.
    """
    import json

    marker = os.path.join(path, "_fingerprint.json")
    # normalize through JSON before comparing: the stored side has
    # round-tripped (tuples→lists, int keys→str), and comparing the
    # raw dict against it would silently rebuild on EVERY call — the
    # exact bug the r8 scale probe caught in the ANN index marker
    fingerprint = json.loads(json.dumps(fingerprint))
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                if json.load(f) == fingerprint:
                    return path
        except (json.JSONDecodeError, OSError):
            pass
    shutil.rmtree(path, ignore_errors=True)
    write_fn(path)
    with open(marker, "w") as f:
        json.dump(fingerprint, f)
    return path


def stat_fingerprint(*files: str, **extra) -> dict:
    """Stat-based source fingerprint for ensure_written markers."""
    fp = dict(extra)
    for p in files:
        st = os.stat(p)
        fp[os.path.abspath(p)] = [st.st_mtime_ns, st.st_size]
    return fp


def store_layout_fingerprint(path: str) -> list:
    """Physical-layout fingerprint of an ingest store: sorted
    (abs_path, size, mtime_ns) of its data files. For derived
    artifacts whose CONTENT depends on the store's physical layout —
    e.g. a deletion-vector sidecar keyed by (file_path, row_index) —
    the source-stat fingerprint alone is not enough: a store rebuild
    with unchanged sources (lost marker, scratch cleanup, a session
    conf that changes file splits) re-shuffles physical positions and
    a sidecar validated only against the sources would silently map
    its positions onto different rows. Folding THIS into the derived
    artifact's fingerprint invalidates it on any store rebuild."""
    out = []
    for p, size in list_store_files(path):
        try:
            out.append([p, size, os.stat(p).st_mtime_ns])
        except OSError:
            out.append([p, size, None])
    return out


def list_store_files(
    path: str, suffix: str = ".parquet", recursive: bool = True
) -> list[tuple[str, int]]:
    """Driver-side listing of a store's data files: sorted
    (absolute_path, size_bytes) pairs.

    THE single chokepoint for this repo's driver-side filesystem
    access (split guards, footer harvesting, layout accounting,
    manifest builds). The implementation is local-POSIX — fine for
    this deployment, and cheap up to ~10^5 files. An object-store port
    replaces ONLY this function (plus `stat_mtime_ns`) with the
    store's native listing API (e.g. paginated ListObjectsV2), keeping
    every caller unchanged; prefixes with >>10k objects should also
    revisit `parallelPartitionDiscovery.threshold` in session.py so
    Spark's own listings parallelize. Missing path -> empty list (a
    store that was never built prunes to nothing)."""
    out: list[tuple[str, int]] = []

    def _add(p: str) -> None:
        # a file may vanish between listing and stat (concurrent
        # overwrite, the log sink's stale-temp sweep) — skip it, same
        # graceful contract as the missing-directory case
        try:
            out.append((p, os.path.getsize(p)))
        except OSError:
            pass

    if recursive:
        for r, _, fs in os.walk(path):
            for f in fs:
                if f.endswith(suffix):
                    _add(os.path.join(r, f))
    else:
        try:
            names = os.listdir(path)
        except OSError:
            names = []
        for f in names:
            if f.endswith(suffix):
                _add(os.path.join(path, f))
    return sorted(out)


def stat_mtime_ns(path: str) -> int:
    """Modification stamp of one store file (marker/manifest) — the
    other half of the driver-side FS chokepoint (see list_store_files).
    An object-store port maps this to the object's ETag/version."""
    return os.stat(path).st_mtime_ns


def _parse_bytes_conf(raw: str, default: int) -> int:
    """Spark bytes-conf string ("134217728b", "128mb", "64k") -> int."""
    raw = raw.strip().lower()
    try:
        mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}.get(
            raw.rstrip("b")[-1:], 1
        )
        return int(raw.rstrip("kmgb")) * mult
    except ValueError:
        return default


def effective_max_split_bytes(spark: SparkSession, sizes: list[int]) -> int:
    """The split size Spark will ACTUALLY use when scanning files of
    `sizes` — FilePartition.maxSplitBytes:

        min(maxPartitionBytes, max(openCostInBytes, bytesPerCore))

    where bytesPerCore spreads the total scan (data + per-file open
    cost) over defaultParallelism. Split guards must compare against
    THIS, not raw maxPartitionBytes: with this repo's 64 KB open cost,
    a small store's effective split can be a few MB, so a multi-row-
    group file far below 128 MB would still be split across tasks."""
    max_pb = _parse_bytes_conf(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b"),
        128 << 20,
    )
    open_cost = _parse_bytes_conf(
        spark.conf.get("spark.sql.files.openCostInBytes", "4194304b"),
        4 << 20,
    )
    par = max(spark.sparkContext.defaultParallelism, 1)
    total = sum(sizes) + open_cost * len(sizes)
    return min(max_pb, max(open_cost, total // par))


def read_parquet(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def store_stat_tag(path: str) -> tuple | None:
    """Invalidation tag for a memoized read handle, or None when the
    path does not exist.

    (mtime_ns, size, ino) of the path itself, plus — for directories —
    a fingerprint of the DIRECT children (sorted name/mtime_ns/size
    triples). The child scan makes invalidation granularity-independent
    (ADVICE r12): a delete-and-rewrite that completes within one
    coarse filesystem timestamp tick with unchanged directory size
    would leave the top-level (mtime_ns, size) pair intact, but it
    cannot leave every child's stat intact too, and a recreate flips
    the inode. One level suffices for parquet store layouts: data
    files or hive partition dirs are direct children, and rewriting a
    file INSIDE `day=X/` updates `day=X`'s own mtime (entry
    create/delete bumps the containing dir), so even a two-level
    in-place partition refresh lands in the tag. Pure os.stat work —
    no Spark job, microseconds per call."""
    try:
        st = os.stat(path)
    except OSError:
        return None
    if not os.path.isdir(path):
        return (st.st_mtime_ns, st.st_size, st.st_ino)
    children = []
    try:
        with os.scandir(path) as it:
            for e in it:
                try:
                    cs = e.stat(follow_symlinks=False)
                    children.append((e.name, cs.st_mtime_ns, cs.st_size))
                except OSError:
                    children.append((e.name, -1, -1))
    except OSError:
        pass
    children.sort()
    return (st.st_mtime_ns, st.st_size, st.st_ino, hash(tuple(children)))


# Same memo as tables._TABLE_CACHE, for write-once ingest-ARTIFACT
# stores (signature/fingerprint stores, graph edges, mv partials): every
# schema-inferring spark.read.parquet launches one footer-read job —
# 55-130 ms of scheduler floor on this VM — and the store-backed
# queries re-read their store on every build. Keyed per live session,
# then by (abspath, mtime_ns, size): a rebuilt store (ensure_written
# rewrites bump the directory mtime) can never serve a stale listing,
# and a sink read back in the same query sees its fresh bytes because
# the just-written directory has a new stat. Plans are unchanged —
# the memo returns the same logical scan a fresh read would.
_STORE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def read_store(spark: SparkSession, path: str) -> DataFrame:
    """Memoized `spark.read.parquet` for immutable-once-written stores.

    Stores refreshed IN PLACE (dynamic partition overwrite) should
    still prefer an EXPLICIT version channel (read_rollup's sidecar
    counter) — the store_stat_tag child scan does catch a partition
    refresh (the rewritten partition dir's own mtime changes), but a
    writer-owned counter states the invalidation contract rather than
    deriving it from filesystem behavior."""
    tag = store_stat_tag(path)
    if tag is None:
        return spark.read.parquet(path)  # surface the read error as-is
    # keyed by PATH with the stat as a replace-on-change tag (the
    # ann_index.read_index_store convention): a rebuilt store evicts
    # its predecessor instead of pinning dead handles for the
    # session's lifetime — the cache is bounded by #distinct paths
    cache = _STORE_CACHE.setdefault(spark, {})
    key = os.path.abspath(path)
    hit = cache.get(key)
    if hit is None or hit[0] != tag:
        hit = (tag, spark.read.parquet(path))
        cache[key] = hit
    return hit[1]


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet sink. Partition columns should be
    low-cardinality (each value is a directory); high-cardinality keys
    belong in bucketBy or plain files instead."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)
