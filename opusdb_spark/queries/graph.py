"""Graph analytics over the trade graph derived from the fact table.

The reference engine has no graph operators; these extend the engine
the way a training-data/analytics user expects (ranking entities,
community structure) while staying relational-first: the GRAPH is an
aggregate of the 100 TB fact table (one shuffle, decimal-exact edge
weights), and the iterative algorithms then run on the model-sized
edge/node tables with deterministic arithmetic so a SQL oracle can
replay them.

Exactness contract (exactness.py): edge weights are decimal sums;
per-edge transition probabilities are double divisions of identical
decimals; each PageRank update quantizes per-edge contributions to
DECIMAL(27,18) before the order-free decimal sum, so three unrolled
iterations produce bit-identical doubles in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from opusdb_spark.registry import register
from opusdb_spark.tables import table

# Loop-invariant caches: one live handle per (query, sf_dir), shared
# implementation in operators/cache.py (ADVICE r4: persist without
# unpersist; ADVICE r6: wire the release hook into teardown — done in
# tests/conftest.py's session fixture and bench.py main).
from opusdb_spark.operators.cache import loop_cache, release_loop_caches


def _loop_cache(key: str, sf_dir: str, df: DataFrame) -> DataFrame:
    return loop_cache(f"graph:{key}:{sf_dir}", df)


def release_graph_caches() -> None:
    """Unpersist every live loop-invariant cache (teardown hook)."""
    release_loop_caches()

# Directed nation→nation trade edges: supplier's nation ships to
# customer's nation, weighted by decimal-exact extended price. This is
# the only corpus-sized job in the family — everything after runs on
# |nations|² rows at most.
_EDGES = """
    SELECT s.s_nationkey AS src, c2.c_nationkey AS dst,
           SUM(CAST(l.l_extendedprice AS DECIMAL(27,6))) AS w
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c2 ON c2.c_custkey = o.o_custkey
    WHERE s.s_nationkey <> c2.c_nationkey
    GROUP BY 1, 2
"""

_PR_STEP = """
    SELECT nn.n_nationkey AS id,
           0.15 / (SELECT n FROM cnt) + 0.85 * COALESCE(
               CAST(SUM(CAST(r.r * e.p AS DECIMAL(27,18))) AS DOUBLE),
               0.0) AS r
    FROM nation nn
    LEFT JOIN norm e ON e.dst = nn.n_nationkey
    LEFT JOIN {prev} r ON r.id = e.src
    GROUP BY nn.n_nationkey
"""

_PAGERANK_ORACLE = f"""
    WITH edges AS ({_EDGES}),
    norm AS (
        SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / CAST(t.ow AS DOUBLE) AS p
        FROM edges e
        JOIN (SELECT src, SUM(w) AS ow FROM edges GROUP BY src) t
          ON t.src = e.src
    ),
    cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation),
    r0 AS (SELECT n_nationkey AS id, 1.0 / (SELECT n FROM cnt) AS r
           FROM nation),
    r1 AS ({_PR_STEP.format(prev="r0")}),
    r2 AS ({_PR_STEP.format(prev="r1")}),
    r3 AS ({_PR_STEP.format(prev="r2")})
    SELECT n.n_name AS n_name, round(r3.r, 12) AS pagerank
    FROM r3 JOIN nation n ON n.n_nationkey = r3.id
    ORDER BY pagerank DESC, n_name
"""


def _trade_edges(spark, sf_dir) -> DataFrame:
    """Fingerprinted ingest artifact: the nation-trade edge list is the
    only corpus-sized computation in the graph family, and the edges
    don't change per query — so the fact-table aggregation runs ONCE
    per corpus snapshot (stat fingerprint over the four source tables)
    and every graph query reads a |nations|²-row parquet (the
    ann_index/minhash-signature ingest pattern; VERDICT r6 perf item
    5). At 100 TB this is the difference between a per-query corpus
    pass and a 625-row scan."""
    import hashlib
    import os

    from opusdb_spark.sources.formats import (
        ensure_written,
        read_store,
        scratch_path,
        stat_fingerprint,
    )

    def build(spark, sf_dir) -> DataFrame:
        l = table(spark, sf_dir, "lineitem")
        s = table(spark, sf_dir, "supplier")
        o = table(spark, sf_dir, "orders")
        c = table(spark, sf_dir, "customer")
        return (
            l.join(s, l.l_suppkey == s.s_suppkey)
            .join(o, l.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .filter(F.col("s_nationkey") != F.col("c_nationkey"))
            .groupBy(
                F.col("s_nationkey").alias("src"),
                F.col("c_nationkey").alias("dst"),
            )
            .agg(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(27,6)")
                ).alias("w")
            )
        )

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    base = os.path.basename(os.path.normpath(sf_dir))
    store = ensure_written(
        scratch_path(f"trade_edges_{base}_{tag}"),
        stat_fingerprint(
            *(
                f"{sf_dir}/{t}.parquet"
                for t in ("lineitem", "supplier", "orders", "customer")
            )
        ),
        lambda p: build(spark, sf_dir)
        .coalesce(1)  # 625 rows max — one file, no small-file litter
        .write.mode("overwrite")
        .parquet(p),
    )
    return read_store(spark, store)


@register("graph_pagerank", oracle=_PAGERANK_ORACLE, tags=("graph",))
def graph_pagerank(spark, sf_dir):
    """Weighted PageRank of the nation trade graph (damping 0.85,
    three power iterations — the emb_pca_power pattern applied to a
    graph). The edge list is a fingerprinted ingest artifact (built
    once per corpus snapshot, see _trade_edges) so the query itself
    never touches the fact table; the iteration loop joins node-sized
    DataFrames, so rank state stays distributed (no driver-side matrix)
    and the same loop runs on a billion-node graph. Per-edge contributions quantize to DECIMAL(27,18)
    before each order-free decimal sum — iteration state is therefore
    partition-order-free — and the PUBLISHED score rounds to 12 dp:
    the double→decimal(27,18) quantization itself rounds differently
    between engines at the 1e-18 digit (Spark HALF_UP vs DuckDB's
    double conversion), so raw scores drift ~1e-17 after three
    iterations; 12-dp rounding is the same sub-ulp hygiene the
    ln/corr oracles use. Dangling mass is dropped
    (every node here has out-edges; the standard simplification)."""
    nation = table(spark, sf_dir, "nation")
    nodes = nation.select(F.col("n_nationkey").alias("id"), "n_name")
    n = nodes.count()  # model-sized scalar: |nations|
    edges = _trade_edges(spark, sf_dir)
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    # persist the model-sized (|nations|²) transition table: without
    # it each iteration's lineage re-runs the fact-table edge build —
    # 4 full corpus passes instead of 1. The canonical loop-invariant
    # cache of iterative graph algorithms.
    norm = _loop_cache(
        "graph_pagerank",
        sf_dir,
        edges.join(outw, "src").select(
            "src",
            "dst",
            (
                F.col("w").cast("double") / F.col("ow").cast("double")
            ).alias("p"),
        ),
    )
    ranks = nodes.select("id", F.lit(1.0 / n).alias("r"))
    for _ in range(3):
        contrib = (
            norm.join(ranks, norm.src == ranks.id)
            .groupBy("dst")
            .agg(
                F.sum(
                    (F.col("r") * F.col("p")).cast("decimal(27,18)")
                )
                .cast("double")
                .alias("m")
            )
        )
        ranks = nodes.join(
            contrib, nodes.id == contrib.dst, "left"
        ).select(
            nodes.id,
            (
                F.lit(0.15 / n)
                + F.lit(0.85) * F.coalesce("m", F.lit(0.0))
            ).alias("r"),
        )
    return (
        ranks.join(nodes, "id")
        .select("n_name", F.round("r", 12).alias("pagerank"))
        .orderBy(F.desc("pagerank"), "n_name")
    )


_TRIANGLE_ORACLE = f"""
    WITH edges AS ({_EDGES}),
    pairs AS (
        SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b,
               SUM(w) AS w2
        FROM edges GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(SUM(w2) AS DOUBLE) AS s,
                   CAST(COUNT(*) AS BIGINT) AS m FROM pairs),
    strong AS (
        SELECT a, b FROM pairs CROSS JOIN tot
        WHERE CAST(w2 AS DOUBLE) * m > s * 1.25
    ),
    tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM strong e1
        JOIN strong e2 ON e2.a = e1.b
        JOIN strong e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    members AS (
        SELECT x AS id FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
    )
    SELECT n.n_name AS n_name, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM members m JOIN nation n ON n.n_nationkey = m.id
    GROUP BY n.n_name
    ORDER BY n_triangles DESC, n_name
"""


@register("graph_triangle_count", oracle=_TRIANGLE_ORACLE, tags=("graph",))
def graph_triangle_count(spark, sf_dir):
    """Per-nation triangle participation in the strong-trade graph.
    The dense trade graph is sparsified RELATIVELY (pair weight > 1.25×
    the mean, an exact decimal-derived compare, so the same query works
    at every scale factor), then triangles come from the canonical
    ordered two-hop self-join (a < b < c — each triangle counted once,
    never a cartesian). The strong-edge list is model-sized, so both
    self-joins broadcast; at 100 TB only the edge aggregation touches
    the fact table."""
    edges = _trade_edges(spark, sf_dir)
    pairs = edges.groupBy(
        F.least("src", "dst").alias("a"),
        F.greatest("src", "dst").alias("b"),
    ).agg(F.sum("w").alias("w2"))
    tot = pairs.agg(
        F.sum("w2").cast("double").alias("s"),
        F.count(F.lit(1)).alias("m"),
    )
    # persist: e1/e2/e3 and the member union re-read this model-sized
    # edge list — without the cache the fact-table aggregation lineage
    # above would re-execute once per reference
    strong = _loop_cache(
        "graph_triangle_count",
        sf_dir,
        pairs.crossJoin(F.broadcast(tot))
        .filter(
            F.col("w2").cast("double") * F.col("m") > F.col("s") * F.lit(1.25)
        )
        .select("a", "b"),
    )
    e1 = strong.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = strong.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = strong.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(F.broadcast(e2), "y").join(F.broadcast(e3), ["x", "z"])
    members = (
        tri.select(F.col("x").alias("id"))
        .unionAll(tri.select(F.col("y").alias("id")))
        .unionAll(tri.select(F.col("z").alias("id")))
    )
    nation = table(spark, sf_dir, "nation")
    return (
        members.join(
            F.broadcast(nation), members.id == nation.n_nationkey
        )
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), "n_name")
    )
