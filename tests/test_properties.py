"""Property-based tests (hypothesis): the custom operators vs tiny
brute-force Python references on randomized inputs.

The reference pinned its semantics with hand-built cases plus
concurrency stress (SURVEY §5); here randomized histories and graphs
cover the input space those hand cases can miss. Examples are kept
small and few — each example runs real Spark jobs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from opusdb_spark import mvcc
from opusdb_spark.operators import dedup
from opusdb_spark.operators.asof import asof_join

SMALL = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

versions_strategy = st.lists(
    st.tuples(
        st.integers(1, 4),  # ref_id
        st.integers(1, 30),  # write_point
        st.integers(-100, 100),  # value
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: (t[0], t[1]),
)

probes_strategy = st.lists(
    st.tuples(st.integers(1, 5), st.integers(0, 35)),
    min_size=1,
    max_size=6,
    unique=True,
)


@settings(**SMALL)
@given(
    versions=versions_strategy,
    probes=probes_strategy,
    tol=st.one_of(st.none(), st.integers(0, 8)),
)
def test_asof_matches_bruteforce(spark, versions, probes, tol):
    """asof_join == 'newest version with wp ≤ rp (and rp − wp ≤ tol
    when a tolerance is given), else null' — the find-version rule
    (stm.clj:55-65) — for ANY history."""
    from pyspark.sql import functions as F

    vdf = spark.createDataFrame(
        [(r, w, float(v)) for r, w, v in versions],
        "ref_id long, write_point long, value double",
    )
    pdf = spark.createDataFrame(probes, "ref_id long, read_point long")
    out = asof_join(
        pdf, vdf, on="ref_id", left_time="read_point",
        right_time="write_point", right_values=["value"],
        tolerance=None if tol is None else F.lit(tol),
    )
    got = {(r.ref_id, r.read_point): r.value for r in out.collect()}
    assert len(got) == len(probes), "as-of join must stay 1:1 on probes"
    for ref, rp in probes:
        eligible = [
            (w, v)
            for r, w, v in versions
            if r == ref and w <= rp and (tol is None or rp - w <= tol)
        ]
        want = float(max(eligible)[1]) if eligible else None
        assert got[(ref, rp)] == want


@settings(**SMALL)
@given(
    versions=versions_strategy,
    probes=probes_strategy,
    direction=st.sampled_from(["forward", "nearest"]),
)
def test_asof_forward_nearest_match_bruteforce(
    spark, versions, probes, direction
):
    """The forward and nearest as-of directions ≡ their Python
    references for ANY history: forward = SMALLEST write_point ≥ probe
    (ties on write_point resolve to the lexicographically-last value,
    the operator's documented duplicate rule), nearest = closer of the
    backward/forward carries with exact ties preferring backward."""
    vdf = spark.createDataFrame(
        [(r, w, float(v)) for r, w, v in versions],
        "ref_id long, write_point long, value double",
    )
    pdf = spark.createDataFrame(probes, "ref_id long, read_point long")
    out = asof_join(
        pdf, vdf, on="ref_id", left_time="read_point",
        right_time="write_point", right_values=["value"],
        direction=direction,
    )
    got = {(r.ref_id, r.read_point): r.value for r in out.collect()}
    assert len(got) == len(probes)

    def pick(cands, key):
        """newest-by-key with the duplicate rule: among rows sharing
        the chosen write_point, the lexicographically-last value."""
        best_w = key(cands)
        vals = [v for w, v in cands if w == best_w]
        return float(max(vals))

    for ref, rp in probes:
        back = [(w, v) for r, w, v in versions if r == ref and w <= rp]
        fwd = [(w, v) for r, w, v in versions if r == ref and w >= rp]
        if direction == "forward":
            want = (
                pick(fwd, lambda c: min(w for w, _ in c)) if fwd else None
            )
        else:  # nearest: closer carry; exact tie prefers backward
            bw = max((w for w, _ in back), default=None)
            fw = min((w for w, _ in fwd), default=None)
            if bw is None and fw is None:
                want = None
            elif fw is None or (bw is not None and rp - bw <= fw - rp):
                want = pick(back, lambda c: max(w for w, _ in c))
            else:
                want = pick(fwd, lambda c: min(w for w, _ in c))
        assert got[(ref, rp)] == want, (ref, rp, direction)


@settings(**SMALL)
@given(versions=versions_strategy, n=st.integers(1, 4))
def test_retain_keeps_exactly_newest_n(spark, versions, n):
    vdf = spark.createDataFrame(
        [(r, w, float(v)) for r, w, v in versions],
        "ref_id long, write_point long, value double",
    )
    kept = {(r.ref_id, r.write_point) for r in mvcc.retain(vdf, n).collect()}
    by_key: dict[int, list[int]] = {}
    for r, w, _ in versions:
        by_key.setdefault(r, []).append(w)
    want = {
        (r, w) for r, ws in by_key.items() for w in sorted(ws, reverse=True)[:n]
    }
    assert kept == want


edges_strategy = st.lists(
    st.tuples(st.integers(1, 10), st.integers(1, 10)).filter(lambda t: t[0] < t[1]),
    min_size=1,
    max_size=10,
    unique=True,
)


@settings(**{**SMALL, "max_examples": 5})
@given(edges=edges_strategy)
def test_components_match_union_find(spark, edges):
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.doc_id: r.component for r in dedup.neardup_components(pairs).collect()}

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in edges for n in e}
    want_groups: dict[int, set[int]] = {}
    for node in nodes:
        want_groups.setdefault(find(node), set()).add(node)
    got_groups: dict[int, set[int]] = {}
    for node, comp in got.items():
        got_groups.setdefault(comp, set()).add(node)
    assert {frozenset(g) for g in got_groups.values()} == {
        frozenset(g) for g in want_groups.values()
    }
    for comp, members in got_groups.items():
        assert comp == min(members), "component label must be the min member"


changes_strategy = st.lists(
    st.tuples(
        st.integers(1, 6),  # ref_id (may or may not exist)
        st.integers(-50, 50),  # new value
        st.sampled_from(["upsert", "delete"]),
    ),
    min_size=1,
    max_size=6,
    unique_by=lambda t: t[0],  # one change per key per batch
)


@settings(**SMALL)
@given(versions=versions_strategy, changes=changes_strategy)
def test_merge_matches_dict_semantics(spark, versions, changes):
    """mvcc.merge == dict-apply of the change-set over latest state,
    for ANY history and ANY mixed change batch; pre-merge snapshots are
    untouched (stm.clj:42-43, 103-122)."""
    from pyspark.sql import functions as F

    vdf = spark.createDataFrame(
        [(r, w, float(v)) for r, w, v in versions],
        "ref_id long, write_point long, value double",
    )
    cdf = spark.createDataFrame(
        [(r, float(v) if op == "upsert" else None, op) for r, v, op in changes],
        "ref_id long, value double, _op string",
    )
    merged = mvcc.merge(vdf, cdf)

    # reference: latest per key, then apply the batch as a dict
    latest: dict[int, float] = {}
    for r, w, v in sorted(versions, key=lambda t: t[1]):
        latest[r] = float(v)
    expected = dict(latest)
    for r, v, op in changes:
        if op == "delete":
            expected.pop(r, None)
        else:
            expected[r] = float(v)

    got = {
        r.ref_id: r.value
        for r in mvcc.latest(merged).filter(~F.col("_deleted")).collect()
    }
    assert got == expected

    # old snapshot (≤ max original wp) unaffected
    max_wp = max(w for _, w, _ in versions)
    pre = {
        r.ref_id: r.value
        for r in mvcc.latest(
            merged.filter(F.col("write_point") <= max_wp)
        ).collect()
    }
    assert pre == latest


@settings(**SMALL)
@given(versions=versions_strategy, points=st.tuples(st.integers(0, 35), st.integers(0, 35)))
def test_snapshot_diff_equals_brute_force(spark, versions, points):
    """snapshot_diff's one-pass groupBy vs a dict-based reference on
    randomized histories and arbitrary (old, new) read points."""
    old_p, new_p = min(points), max(points)
    df = spark.createDataFrame(
        [(r, w, float(v)) for r, w, v in versions],
        "ref_id long, write_point long, value double",
    )
    got = {
        r.ref_id: (r.op, r.old_wp, r.new_wp, r.old_value, r.new_value)
        for r in mvcc.snapshot_diff(df, old_p, new_p).collect()
    }

    def snap(rp):
        best = {}
        for r, w, v in versions:
            if w <= rp and (r not in best or w > best[r][0]):
                best[r] = (w, float(v))
        return best

    a, b = snap(old_p), snap(new_p)
    want = {}
    for r, (w_new, v_new) in b.items():
        if r not in a:
            want[r] = ("insert", None, w_new, None, v_new)
        elif a[r][0] != w_new:
            want[r] = ("update", a[r][0], w_new, a[r][1], v_new)
    assert got == want


@settings(**SMALL)
@given(
    obs=st.lists(
        st.tuples(st.integers(0, 20), st.integers(-50, 50)),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
def test_interpolation_bounded_by_neighbors(spark, obs):
    """ts_interpolate on a synthetic minute series: observed minutes
    keep their exact value; every gap minute lies within [min, max] of
    its two bracketing observations (linearity ⊂ boundedness)."""
    from datetime import datetime, timedelta

    from opusdb_spark.registry import registry

    t0 = datetime(2024, 1, 1)
    rows = [
        (i + 1, t0 + timedelta(minutes=m), 1, "error", float(v), "{}")
        for i, (m, v) in enumerate(obs)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        got = {
            int((r.minute - t0).total_seconds() // 60): (
                r.observed,
                r.v_interp,
            )
            for r in registry()["ts_interpolate"].fn(spark, d).collect()
        }
    vals = dict(obs)
    ms = sorted(vals)
    for m, (observed, v) in got.items():
        if m in vals:
            assert observed and v == float(vals[m])
        else:
            prev = max((x for x in ms if x < m), default=None)
            nxt = min((x for x in ms if x > m), default=None)
            lo = min(vals[p] for p in (prev, nxt) if p is not None)
            hi = max(vals[p] for p in (prev, nxt) if p is not None)
            assert lo - 1e-9 <= v <= hi + 1e-9


rank_rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 500),   # id (unique tie-break)
        st.integers(-20, 20),  # metric with heavy ties
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


@settings(**SMALL)
@given(rows=rank_rows_strategy, n=st.integers(2, 7))
def test_global_ntile_matches_python_reference(spark, rows, n):
    """with_global_ntiles == the SQL NTILE bucket rule (first N mod n
    tiles get the extra row over the (metric desc, id asc) total
    order) for ANY metric distribution, tie structure, and tile
    count — including n > row count."""
    from pyspark.sql import functions as F

    from opusdb_spark.operators.ranking import with_global_ntiles

    df = spark.createDataFrame(
        [(i, float(m)) for i, m in rows], "id long, metric double"
    )
    got = {
        r["id"]: r["seg"]
        for r in with_global_ntiles(
            df,
            [("seg", [F.desc("metric"), F.asc("id")], F.col("metric"), True)],
            n=n,
            n_buckets=4,
        ).collect()
    }
    ordered = sorted(rows, key=lambda t: (-t[1], t[0]))
    total = len(ordered)
    q, r_ = divmod(total, n)
    want = {}
    for pos, (i, _m) in enumerate(ordered, start=1):
        if pos <= (q + 1) * r_:
            want[i] = -(-pos // (q + 1))
        else:
            want[i] = r_ + -(-(pos - (q + 1) * r_) // max(q, 1))
    assert got == want


@settings(**SMALL)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 500),     # id (unique tie-break)
            st.integers(-5, 5),      # metric: heavy ties / constant runs
            st.integers(-10_000, 10_000),  # value in cents (exact decimal)
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    n_buckets=st.integers(1, 8),
)
def test_global_running_sum_matches_sequential_reference(
    spark, rows, n_buckets
):
    """with_global_running_sum ≡ the sequential single-partition
    formulation, bit-for-bit on decimals, for ANY value distribution:
    all-tied metrics (one bucket does everything), skewed metrics,
    duplicate/degenerate split points (n_buckets > distinct metrics ->
    empty buckets), and negative running sums. The operator backs the
    pareto / rfm / ntile / cume queries whose edges were previously
    covered only by fixture-shaped tests."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    from opusdb_spark.operators.ranking import with_global_running_sum

    df = spark.createDataFrame(
        [(i, float(m), Decimal(c) / 100) for i, m, c in rows],
        "id long, metric double, val decimal(12,2)",
    )
    got = {
        r["id"]: (r["_rank"], Decimal(r["_rsum"]), Decimal(r["_vtotal"]))
        for r in with_global_running_sum(
            df,
            [F.desc("metric"), F.asc("id")],
            F.col("metric"),
            F.col("val"),
            descending=True,
            n_buckets=n_buckets,
        ).collect()
    }
    ordered = sorted(rows, key=lambda t: (-t[1], t[0]))
    grand = sum(Decimal(c) for _, _, c in ordered) / 100
    run = Decimal(0)
    for pos, (i, _m, c) in enumerate(ordered, start=1):
        run += Decimal(c) / 100
        rank, rsum, vtotal = got[i]
        assert rank == pos, f"rank mismatch at id={i}"
        assert rsum == run, f"running sum mismatch at id={i}"
        assert vtotal == grand


@settings(**SMALL)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 500),      # partkey (unique)
            st.integers(-300, 300),   # price in cents: ties, negatives,
        ),                            # and exact ±1.00 band edges
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    )
)
def test_banded_theta_join_matches_bruteforce(spark, rows):
    """The histogram-banded ±1.0 self-join ≡ the O(n²) reference for
    ANY price distribution — heavy ties (histogram counts > 1),
    negative prices (floor() on negatives), and pairs sitting at the
    band edge (|x−y| ≈ 1.0, where the bucket-±1 coverage argument is
    tightest). Pins the query's two claims: every pair the band
    predicate accepts is found by the bucketing, and none is counted
    twice."""
    import os
    import tempfile

    from opusdb_spark.registry import registry

    # reference uses the SAME float64 band arithmetic as the query
    # (p2 >= p - 1.0 AND p2 <= p + 1.0): integer-cents math would
    # disagree on band edges where the float subtraction is inexact
    # (1.1 - 1.0 = 0.10000000000000009 excludes a pair that
    # |110-10| <= 100 includes)
    want = {}
    for k, c in rows:
        p = float(c) / 100
        n = sum(
            1
            for k2, c2 in rows
            if k2 != k
            and (float(c2) / 100 >= p - 1.0)
            and (float(c2) / 100 <= p + 1.0)
        )
        if n > 0:
            want[k] = n

    df = spark.createDataFrame(
        [(k, "x", float(c) / 100) for k, c in rows],
        "p_partkey long, p_name string, p_retailprice double",
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "part.parquet"))
        got = {
            r.p_partkey: r.n_close
            for r in registry()["join_theta"].fn(spark, d).collect()
        }
    assert got == want


@settings(**SMALL)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 300),            # row id (unique, the salt col)
            st.integers(0, 3),              # key: few values -> hot keys
            st.one_of(st.none(), st.integers(-50, 50)),  # value w/ nulls
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    n_salts=st.integers(1, 5),
)
def test_salted_join_and_two_phase_agg_match_plain(spark, rows, n_salts):
    """The skew remedies must be result-IDENTICAL to their plain
    formulations for ANY data — hot keys, null values, single salt,
    keys absent from one side: salted_join ≡ plain inner join, and
    two_phase_agg ≡ plain groupBy for every decomposable aggregate
    (count / count_nonnull / sum / min / max with null skipping)."""
    from opusdb_spark.operators import skew

    big = spark.createDataFrame(
        [(i, k, v) for i, k, v in rows], "id long, k long, v long"
    )
    small = spark.createDataFrame(
        [(0, "x"), (2, "y"), (9, "z")], "k long, tag string"
    )
    plain = sorted(
        (r.k, r.id, r.tag) for r in big.join(small, "k").collect()
    )
    salted = sorted(
        (r.k, r.id, r.tag)
        for r in skew.salted_join(
            big, small, "k", n_salts, salt_cols=["id"]
        ).collect()
    )
    assert salted == plain

    got = {
        r.k: (r.n, r.nn, r.s, r.lo, r.hi)
        for r in skew.two_phase_agg(
            big,
            "k",
            [
                ("v", "count", "n"),
                ("v", "count_nonnull", "nn"),
                ("v", "sum", "s"),
                ("v", "min", "lo"),
                ("v", "max", "hi"),
            ],
            n_salts,
            salt_cols=["id"],
        ).collect()
    }
    want = {}
    for _, k, _ in rows:
        grp = [v for _, kk, v in rows if kk == k]
        nn = [v for v in grp if v is not None]
        want[k] = (
            len(grp),
            len(nn),
            sum(nn) if nn else None,
            min(nn) if nn else None,
            max(nn) if nn else None,
        )
    assert got == want


@settings(**SMALL)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 200),  # doc_id (unique)
            st.lists(  # words from a tiny vocab -> near-identical docs
                st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
                min_size=1,
                max_size=6,
            ),
        ),
        min_size=2,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
def test_simhash_blocking_finds_every_close_pair(spark, docs):
    """simhash_near_dups' 4x16-bit pigeonhole blocking must find
    EXACTLY the pairs within Hamming ≤ 3 of each other — computed by
    brute force over the operator's own fingerprints. Tiny-vocab docs
    make near-identical fingerprints (and exact collisions) common,
    exercising the recall guarantee where it matters."""
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in docs], "doc_id long, text string"
    )
    fps = {
        r.doc_id: r.simhash
        for r in dedup.simhash_fingerprints(df).collect()
    }
    want = set()
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin(fps[a] ^ fps[b]).count("1") <= 3:
                want.add((min(a, b), max(a, b)))
    got = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b))
        for r in dedup.simhash_near_dups(
            df, fp=dedup.simhash_fingerprints(df)
        ).collect()
    }
    assert got == want


@settings(**SMALL)
@given(
    tokens=st.lists(st.integers(1, 30), min_size=1, max_size=25),
    capacity=st.integers(1, 40),
)
def test_pack_sequences_invariants(spark, tokens, capacity):
    """Greedy packing invariants for ANY doc-length mix: every doc
    appears exactly once; no sequence exceeds capacity unless it holds
    a single oversized doc (never split, never dropped); seq_ids are
    contiguous from 0 in order; and the Spark applyInPandas path
    equals the pure-Python reference."""
    from collections import defaultdict

    from opusdb_spark.operators import packing

    df = spark.createDataFrame(
        [("g", i, t) for i, t in enumerate(tokens)],
        "lang string, doc_id long, n_tokens long",
    )
    rows = sorted(
        packing.pack_sequences(df, capacity).collect(),
        key=lambda r: r.doc_id,
    )
    assert [r.doc_id for r in rows] == list(range(len(tokens)))
    assert [r.seq_id for r in rows] == packing.pack_greedy(
        tokens, capacity
    )
    fill = defaultdict(list)
    for r in rows:
        fill[r.seq_id].append(r.n_tokens)
    assert sorted(fill) == list(range(len(fill))), "seq_ids contiguous"
    for members in fill.values():
        assert sum(members) <= capacity or len(members) == 1


winnow_docs_strategy = st.tuples(
    st.lists(st.integers(0, 50), min_size=0, max_size=20),  # noise A
    st.lists(st.integers(0, 50), min_size=0, max_size=20),  # noise B
    st.lists(st.integers(51, 99), min_size=7, max_size=12),  # shared run
    st.integers(0, 20),  # insert position in A
    st.integers(0, 20),  # insert position in B
)


@settings(**SMALL)
@given(parts=winnow_docs_strategy)
def test_winnowing_guarantee_shared_run_yields_shared_fingerprint(
    spark, parts
):
    """The winnowing theorem (Schleimer et al. 2003): two documents
    sharing a token run of length ≥ w + k − 1 MUST share at least one
    selected fingerprint — for ANY surrounding noise and insert
    position. k=4, w=4 ⇒ runs of ≥ 7 tokens; the shared-run alphabet
    is disjoint from the noise alphabet so the planted run is the only
    guaranteed overlap."""
    from opusdb_spark.operators.dedup import winnow_fingerprints

    noise_a, noise_b, run, ia, ib = parts
    ia, ib = min(ia, len(noise_a)), min(ib, len(noise_b))
    ta = noise_a[:ia] + run + noise_a[ia:]
    tb = noise_b[:ib] + run + noise_b[ib:]
    docs = spark.createDataFrame(
        [
            (0, " ".join(f"t{x}" for x in ta)),
            (1, " ".join(f"t{x}" for x in tb)),
        ],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(docs, k=4, w=4)
    rows = fp.collect()
    a = {r["h"] for r in rows if r["doc_id"] == 0}
    b = {r["h"] for r in rows if r["doc_id"] == 1}
    assert a & b, "shared >= w+k-1 run produced no shared fingerprint"


# ------------------------------------------------ runtime bloom filter
bloom_keys_strategy = st.tuples(
    st.sets(st.integers(-(10**9), 10**9), min_size=0, max_size=40),
    st.sets(st.integers(-(10**9), 10**9), min_size=1, max_size=40),
    st.sampled_from([1, 4, 24]),  # bits_per_key: extreme-FP → roomy
)


@settings(**SMALL)
@given(bloom_keys_strategy)
def test_bloom_prune_semi_join_equals_reference(spark, keys):
    """For random fact/dim key sets and any filter sizing, bloom-pruned
    fact ∩ dim must equal the plain set intersection — no false
    negatives ever, false positives always removed by the exact join."""
    dim_keys, fact_keys, bits_per_key = keys
    from opusdb_spark.operators import runtime_filter as rtf

    fact = spark.createDataFrame(
        [(int(k),) for k in sorted(fact_keys)], "k long"
    )
    dim = spark.createDataFrame(
        [(int(k),) for k in sorted(dim_keys)] or [(0,)], "d long"
    )
    if not dim_keys:
        dim = dim.filter("d != d")  # genuinely empty
    pruned = rtf.bloom_semi_reduce(
        fact, "k", dim, "d", bits_per_key=bits_per_key
    )
    got = sorted(
        r.k
        for r in pruned.join(
            dim, pruned["k"] == dim["d"], "left_semi"
        ).collect()
    )
    assert got == sorted(fact_keys & dim_keys)


# ------------------------------------------- rollup merge algebra
# The continuous-aggregate store is load-bearing for 7 graded queries;
# its two maintenance modes must be ALGEBRAICALLY invisible: folding a
# delta into a built store (refresh) and restating days (backfill)
# must land bit-for-bit where a from-scratch rebuild lands — including
# the DDSketch bucket map (canonical sorted-key form) and the HLL
# estimate — for ANY batch split. VERDICT r8 §7.

events_rows_strategy = st.lists(
    st.tuples(
        st.integers(1, 4),  # day of 2024-01
        st.integers(0, 23),  # hour
        st.sampled_from(["a", "b"]),
        st.integers(-50, 50),  # value (ints: exact in double + decimal)
        st.integers(1, 20),  # user_id
    ),
    min_size=1,
    max_size=15,
)


def _ev_frame(spark, rows):
    from datetime import datetime

    return spark.createDataFrame(
        [
            (datetime(2024, 1, d, h), t, float(v), u)
            for d, h, t, v, u in rows
        ],
        "ts timestamp, event_type string, value double, user_id long",
    )


def _canon_store(spark, path):
    """Store → comparable canonical rows: every partial column, the
    sketch map as (sorted) entries, the HLL as its estimate."""
    from pyspark.sql import functions as F

    from opusdb_spark.operators import rollup

    df = rollup.read_rollup(spark, path).select(
        F.col("day").cast("string"),
        "event_type",
        "n_events",
        F.col("sum_value_dec").cast("string"),
        "min_value",
        "max_value",
        F.expr("hll_sketch_estimate(users_hll)").alias("hll_est"),
        F.map_entries("value_ddsketch").alias("dd_entries"),
    )
    return sorted(str(r) for r in df.collect())


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(a=events_rows_strategy, b=events_rows_strategy)
def test_rollup_refresh_equals_rebuild(spark, a, b):
    """refresh(build(a), b) ≡ build(a ∪ b) bit-for-bit for any split of
    the event stream into a base build and an appended delta."""
    import shutil
    import tempfile

    from opusdb_spark.operators import rollup

    tmp = tempfile.mkdtemp(prefix="rollup_prop_")
    try:
        inc = f"{tmp}/inc"
        full = f"{tmp}/full"
        rollup.build_rollup(_ev_frame(spark, a), inc)
        rollup.refresh_rollup(spark, inc, _ev_frame(spark, b))
        rollup.build_rollup(_ev_frame(spark, a + b), full)
        assert _canon_store(spark, inc) == _canon_store(spark, full)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(
    base=events_rows_strategy,
    corrected=events_rows_strategy,
    restate=st.sets(st.integers(1, 4), min_size=1, max_size=3),
)
def test_rollup_backfill_equals_rebuild(spark, base, corrected, restate):
    """backfill(store, corrected, days) ≡ rebuild over (base minus the
    restated days, plus the corrected slice) — including days that end
    up fully voided (no corrected rows: the partition must vanish, not
    go stale). A fixed day-5 sentinel row guarantees the rebuilt
    reference store is never empty."""
    import shutil
    import tempfile
    from datetime import date

    from opusdb_spark.operators import rollup

    sentinel = [(5, 0, "a", 1, 1)]
    base = base + sentinel
    corrected_slice = [r for r in corrected if r[0] in restate]
    kept = [r for r in base if r[0] not in restate]

    tmp = tempfile.mkdtemp(prefix="rollup_prop_")
    try:
        store = f"{tmp}/store"
        ref = f"{tmp}/ref"
        rollup.build_rollup(_ev_frame(spark, base), store)
        rollup.backfill_rollup(
            spark,
            store,
            _ev_frame(spark, corrected_slice),
            [date(2024, 1, d) for d in sorted(restate)],
        )
        rollup.build_rollup(_ev_frame(spark, kept + corrected_slice), ref)
        assert _canon_store(spark, store) == _canon_store(spark, ref)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ----------------------------------------------------------------
# Recurrence-replay properties: the r9 oracle upgrades for udaf_ewma
# and events_forecast_holt rest on ONE numerical claim — a recursive
# CTE stepping the same literal double constants reproduces the Python
# kernel's state bit-for-bit. Fuzz that claim directly against DuckDB
# (no Spark needed): any platform/libm/engine change that breaks the
# premise fails HERE before it fails as a red driver verdict.

series_strategy = st.lists(
    st.floats(
        min_value=-1e6,
        max_value=1e6,
        allow_nan=False,
        allow_infinity=False,
    ),
    min_size=2,
    max_size=60,
)


# Kernel form (diagnosed r10, fixed r11): pandas' Cython ewm kernel
# is the expanded recurrence PLUS a short-circuit that skips the
# update when cur == weighted_avg (preserving constant runs exactly);
# the bare 0.9·v + 0.1·v form drifts 1 ulp on specific mantissas.
# The falsifying example hypothesis found is pinned below so the
# regression class stays covered even at max_examples=20. The Holt
# premise (next test) is NOT exposed to this class: both its sides
# run the same explicit expanded-form loop (pipeline.py holt()), no
# pandas kernel involved — audited r11.
@settings(max_examples=20, deadline=None)
@example(ys=[2.374538501501172e-96, 2.374538501501172e-96])
@given(ys=series_strategy)
def test_ewma_recursive_cte_replays_pandas_bitwise(ys):
    import duckdb
    import pandas as pd

    want = (
        pd.Series(ys).ewm(alpha=0.1, adjust=False).mean().to_list()
    )
    con = duckdb.connect()
    con.register(
        "seq", pd.DataFrame({"rn": range(1, len(ys) + 1), "y": ys})
    )
    got = [
        r[0]
        for r in con.execute(
            # the production oracle's list-carry form (udfs.py): step
            # by subscript instead of re-joining seq each iteration
            """
            WITH RECURSIVE arr AS (
                SELECT list(y ORDER BY rn) AS vals FROM seq
            ),
            rec AS (
                SELECT 1 AS rn, vals, vals[1] AS v FROM arr
                UNION ALL
                SELECT rn + 1, vals,
                       CASE WHEN vals[rn + 1] = v THEN v
                            ELSE 0.9 * v + 0.1 * vals[rn + 1] END
                FROM rec WHERE rn < len(vals)
            )
            SELECT v FROM rec ORDER BY rn
            """
        ).fetchall()
    ]
    assert got == want  # == on floats: bitwise for non-NaN


@settings(max_examples=20, deadline=None)
@given(ys=series_strategy)
def test_holt_recursive_cte_replays_python_bitwise(ys):
    import duckdb
    import pandas as pd

    l, b = ys[0], ys[1] - ys[0]
    state = [(0, l, b)]
    for t in range(1, len(ys)):
        l_new = 0.5 * ys[t] + 0.5 * (l + b)
        b = 0.25 * (l_new - l) + 0.75 * b
        l = l_new
        state.append((t, l, b))
    con = duckdb.connect()
    con.register(
        "seq", pd.DataFrame({"t": range(len(ys)), "y": ys})
    )
    got = con.execute(
        """
        WITH RECURSIVE rec AS (
            SELECT f0.t, f0.y AS l, f1.y - f0.y AS b
            FROM seq f0 JOIN seq f1 ON f1.t = 1
            WHERE f0.t = 0
            UNION ALL
            SELECT s.t,
                   0.5 * s.y + 0.5 * (r.l + r.b),
                   0.25 * ((0.5 * s.y + 0.5 * (r.l + r.b)) - r.l)
                       + 0.75 * r.b
            FROM rec r JOIN seq s ON s.t = r.t + 1
        )
        SELECT t, l, b FROM rec ORDER BY t
        """
    ).fetchall()
    assert [tuple(r) for r in got] == state


# ----------------------------------------------------------------
# Fold-association premises behind the r9/r10 float-exact oracles.
# _mmr_oracle and the pool-side driver rounds assume DuckDB's
# list_reduce replays a Python/F.aggregate LEFT fold (0.0 init)
# bit-for-bit; _ivfpq_oracle assumes numpy's 8-element .sum(axis=1)
# is the balanced pairwise tree ((1+2)+(3+4))+((5+6)+(7+8)). Fuzz
# both directly so a numpy/DuckDB summation-strategy change fails
# HERE before it fails as a red driver verdict (advisor ask, r9).

vec_strategy = st.lists(
    st.floats(
        min_value=-1e3,
        max_value=1e3,
        allow_nan=False,
        allow_infinity=False,
    ),
    min_size=1,
    max_size=64,
)


@settings(max_examples=25, deadline=None)
@given(xs=vec_strategy, ys=vec_strategy)
def test_list_reduce_replays_python_left_fold(xs, ys):
    import duckdb

    n = min(len(xs), len(ys))
    xs, ys = xs[:n], ys[:n]
    sdot = 0.0
    for a, b in zip(xs, ys):  # the mmr_select pool-round fold
        sdot += a * b
    sq = 0.0
    for a in xs:
        sq += a * a
    con = duckdb.connect()
    got_dot, got_sq = con.execute(
        """
        SELECT list_reduce(list_transform(list_zip($a, $b),
                           s -> s[1] * s[2]), (acc, x) -> acc + x),
               list_reduce(list_transform($a, x -> x * x),
                           (acc, x) -> acc + x)
        """,
        {"a": xs, "b": ys},
    ).fetchone()
    assert got_dot == sdot  # == on floats: bitwise for non-NaN
    assert got_sq == sq


@settings(max_examples=50, deadline=None)
@given(
    row=st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=8,
        max_size=8,
    )
)
def test_numpy_axis_sum_8_is_balanced_pairwise_tree(row):
    import numpy as np

    arr = np.array([row], dtype=np.float64)
    got = float(arr.sum(axis=1)[0])
    x = row
    want = ((x[0] + x[1]) + (x[2] + x[3])) + ((x[4] + x[5]) + (x[6] + x[7]))
    assert got == want


# ----------------------------------------------------------------
# MV-join delta algebra (queries/joins.py mv_join_incremental): for
# ANY split of the fact/dim tables into on-time rows and late deltas,
# fold(partial(base) ∪ partial(ΔL⋈D) ∪ partial(L̄⋈ΔD)) must equal
# fold(partial(L⋈D)) bit-for-bit — rows, exact decimal revenue, AND
# both checksum lanes (the r9 verdict ask: pin the algebra the way
# the rollup store's merge algebra is pinned above).

mv_fact_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=30),  # l_orderkey
        st.integers(min_value=1, max_value=7),  # l_linenumber
        st.floats(min_value=0.01, max_value=9e4, allow_nan=False),
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(
    facts=mv_fact_strategy,
    dl=st.integers(min_value=2, max_value=6),
    do=st.integers(min_value=2, max_value=6),
)
def test_mv_join_delta_fold_equals_full_recompute(spark, facts, dl, do):
    from pyspark.sql import functions as F

    from opusdb_spark.queries.joins import _mv_fold, _mv_partial_agg

    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED"]
    okeys = sorted({f[0] for f in facts})
    lt = spark.createDataFrame(
        [(k, ln, round(p, 2)) for k, ln, p in facts],
        "l_orderkey long, l_linenumber int, l_extendedprice double",
    )
    od = spark.createDataFrame(
        [(k, prios[k % len(prios)]) for k in okeys],
        "o_orderkey long, o_orderpriority string",
    )
    d_l = F.col("l_orderkey") % dl == 0
    d_o = F.col("o_orderkey") % do == 0
    on = F.col("l_orderkey") == F.col("o_orderkey")
    cols = ["l_orderkey", "l_linenumber", "l_extendedprice",
            "o_orderpriority"]
    base = lt.filter(~d_l).join(od.filter(~d_o), on).select(*cols)
    delta_fact = lt.filter(d_l).join(od, on).select(*cols)
    delta_dim = lt.filter(~d_l).join(od.filter(d_o), on).select(*cols)
    folded = _mv_fold(
        _mv_partial_agg(base)
        .unionByName(_mv_partial_agg(delta_fact))
        .unionByName(_mv_partial_agg(delta_dim))
    )
    full = _mv_fold(_mv_partial_agg(lt.join(od, on).select(*cols)))
    assert [tuple(r) for r in folded.collect()] == [
        tuple(r) for r in full.collect()
    ]


# ----------------------------------------------------------------
# Rounding-kernel premise behind exactness.round_like_duckdb (ADVICE
# r10, emb_kmeans): DuckDB's ROUND(double, n) is the scaled multiply
# with half-away-from-zero on the SCALED double — not Python round()
# (banker's) and not Decimal-HALF_UP (decimal-exact quantize). Fuzz
# the mirror directly against DuckDB, ties included.


@settings(max_examples=40, deadline=None)
@example(x=0.0000005)
@example(x=123.4567895)
@example(x=-0.0000015)
@given(
    x=st.floats(
        min_value=-1e9,
        max_value=1e9,
        allow_nan=False,
        allow_infinity=False,
    )
)
def test_round_like_duckdb_mirrors_sql_round(x):
    import duckdb

    from opusdb_spark.exactness import round_like_duckdb

    got = duckdb.connect().execute(
        "SELECT ROUND(?::DOUBLE, 6)", [x]
    ).fetchone()[0]
    assert round_like_duckdb(x, 6) == got  # == on floats: bitwise


# ----------------------------------------------------------------
# The libm-under-ROUND-6 premise: several oracles (entropy/log folds,
# corr, the r11 classifier sigmoid) compare JVM Math.exp/log against
# DuckDB's libm under a 6-dp round, relying on "1-ulp differences are
# absorbed by the round except on a measure-zero boundary set". The
# EWMA incident (r10) showed such premises must be MEASURED, not
# asserted. Writing this test MEASURED the class's real law: an
# n-ulp engine gap crosses a 5e-7 rounding boundary with probability
# ~n x 2.2e-10 x |value| per value — absorption is a property of
# SMALL magnitudes (at |v|=1.5e8 the first grid draft hit a flip
# within 50k samples), and the JVM-vs-glibc gap measured here is up
# to 8 ulps on composed exp/ln expressions (not the folklore 1). At
# the sigmoid/entropy/corr magnitudes the repo actually rounds
# (|v| <= ~1e3) the expected exposure stays ~1e-1 flips across the
# full 280-oracle sweep — small, and zero on this 50k grid. Pins:
# every rounded value agrees across engines, raw divergence stays
# within 16 ulps (2x headroom over the measured 8), boundary
# exposure on this grid is zero. If a platform/libm change widens
# the class, this fails before a driver verdict goes red. Oracles
# must NOT round-6 large libm-derived magnitudes; at |v| > ~1e6 use
# a relative grid or an exact (decimal/integer) formulation.


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(8, 40),
    w=st.integers(8, 40),
    quality=st.integers(12, 96),
    dc_al=st.integers(0, 3),
    ac_al=st.integers(0, 3),
    cut=st.integers(2, 62),
    kind=st.integers(0, 3),
)
def test_jpeg_sa_roundtrip_property(seed, h, w, quality, dc_al, ac_al, cut, kind):
    """Property form of the SA round-trip invariant: for ANY plane,
    quality, band split, and DC/AC successive-approximation depth,
    decode(encode_jpeg_progressive(...)) is PIXEL-IDENTICAL to
    decode(encode_jpeg(...)) at the same quality — SA is a lossless
    re-ordering of the same quantized coefficients. The fixed-seed
    fuzz in test_operators covers curated shapes; hypothesis adds
    fresh adversarial layouts every run plus shrinking on failure
    (the correction-bit protocol is exactly where a self-consistent-
    but-spec-divergent bug would hide — VERDICT r11 ask #4)."""
    import numpy as np

    from opusdb_spark.operators import jpeg

    rng = np.random.RandomState(seed)
    if kind == 0:
        plane = rng.randint(0, 256, (h, w)).astype(np.uint8)
    elif kind == 1:
        plane = np.full((h, w), int(rng.randint(256)), np.uint8)
        for _ in range(int(rng.randint(1, 5))):  # sparse impulses
            plane[rng.randint(h), rng.randint(w)] = int(rng.randint(256))
    elif kind == 2:
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        plane = (
            (np.sin(xx / (1 + rng.rand() * 9)) + np.cos(yy / (1 + rng.rand() * 9)))
            * rng.randint(20, 90)
            + 128
        ).clip(0, 255).astype(np.uint8)
    else:
        plane = (rng.randint(0, 2, (h, w)) * 255).astype(np.uint8)
    bands = ((1, cut), (cut + 1, 63)) if cut < 62 else ((1, 63),)
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(plane, quality))
    sa = jpeg.decode_jpeg(
        jpeg.encode_jpeg_progressive(
            plane, quality, bands=bands, dc_al=dc_al, ac_al=ac_al
        )
    )
    assert (sa == base).all()


def test_spark_round_mirrors_duckdb_round_premise(spark):
    """Spark's F.round(double, 6) vs DuckDB's ROUND(double, 6) — the
    pairing dozens of hash-exact oracles rely on, and since r12 a
    RECURRENCE premise: the classifier trainer snaps per-doc
    probabilities to the 6-dp grid with F.round on the Spark side and
    ROUND in the replay, and any single disagreement compounds through
    every later iteration's weights. The two kernels are NOT the same
    algorithm (Spark routes through BigDecimal HALF_UP on the double's
    shortest decimal repr; DuckDB is a scaled multiply with half-away
    on the SCALED double — measured, see exactness.round_like_duckdb),
    so agreement on the magnitudes the repo rounds must be MEASURED,
    not assumed (the EWMA-incident rule).

    Measured law (writing this test found it): the kernels DISAGREE on
    values sitting within ~1 scaled-ulp of an exact n+0.5e-6 boundary
    — 44 of 5000 MANUFACTURED half-grid ties flipped — and agree
    bitwise everywhere else. A uniform double lands in that window
    with probability ~2e-10 per value (the same measure-zero class as
    the libm-ulp premise below), which real sigmoid/logit/loss values
    cannot systematically hit. Pins: zero mismatches on 55k organic
    values, and every constructed-tie mismatch lies inside the
    boundary window — if either side's kernel changes, this fails
    before a driver verdict goes red."""
    import math

    import numpy as np
    import pandas as pd

    import duckdb
    from pyspark.sql import functions as F

    rng = np.random.default_rng(17)
    organic = np.concatenate(
        [
            rng.uniform(0.0, 1.0, 30000),  # probability range
            rng.uniform(-30.0, 30.0, 15000),  # logit range
            rng.uniform(0.0, 30.0, 10000),  # loss range
        ]
    )
    ties = np.round(rng.uniform(0.0, 1.0, 5000), 6) + rng.integers(
        -2, 3, 5000
    ) * 5e-7
    xs = np.concatenate([organic, ties])
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(xs)], "i long, x double"
    )
    got = [
        r["r"]
        for r in df.select("i", F.round("x", 6).alias("r"))
        .orderBy("i")
        .collect()
    ]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"i": range(len(xs)), "x": xs}))
    want = [
        r[0]
        for r in con.execute(
            "SELECT ROUND(x, 6) FROM t ORDER BY i"
        ).fetchall()
    ]
    n_org = len(organic)
    organic_bad = [
        (float(xs[i]), g, w)
        for i, (g, w) in enumerate(zip(got[:n_org], want[:n_org]))
        if g != w
    ]
    assert not organic_bad, (
        f"{len(organic_bad)} F.round/ROUND disagreements on ORGANIC "
        f"values, first 3: {organic_bad[:3]} — the trainer's p-grid "
        "premise is broken"
    )
    for i in range(n_org, len(xs)):
        if got[i] != want[i]:
            frac = abs(float(xs[i])) * 1e6
            dist = abs(frac - math.floor(frac) - 0.5)
            assert dist < 8 * abs(np.spacing(frac)), (
                f"tie mismatch OUTSIDE the boundary window: x={xs[i]!r}"
                f" spark={got[i]!r} duckdb={want[i]!r}"
            )


def test_libm_exp_log_round6_premise(spark):
    import math

    import numpy as np

    from pyspark.sql import functions as F

    rng = np.random.default_rng(11)
    xs = np.concatenate(
        [
            rng.uniform(-20.0, 20.0, 25000),  # sigmoid-logit range
            rng.uniform(1e-6, 1e6, 25000),  # entropy/log range
        ]
    )
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(xs)], "i long, x double"
    )
    got = (
        df.select(
            "i",
            F.exp(
                F.when(F.abs("x") <= 6.9, F.col("x")).otherwise(
                    F.log(F.abs("x")) / 2.0
                )
            ).alias("e"),  # |e| <= ~1e3, the premise's envelope
            F.log(F.abs("x") + 1e-9).alias("l"),
        )
        .orderBy("i")
        .collect()
    )
    import duckdb

    con = duckdb.connect()
    con.register(
        "t", __import__("pandas").DataFrame({"i": range(len(xs)), "x": xs})
    )
    want = con.execute(
        """SELECT exp(CASE WHEN abs(x) <= 6.9 THEN x
                          ELSE ln(abs(x)) / 2.0 END) AS e,
           ln(abs(x) + 1e-9) AS l FROM t ORDER BY i"""
    ).fetchall()

    def ulps(a: float, b: float) -> int:
        ia = np.frombuffer(np.float64(a).tobytes(), dtype=np.int64)[0]
        ib = np.frombuffer(np.float64(b).tobytes(), dtype=np.int64)[0]
        return abs(int(ia) - int(ib))

    max_ulp = 0
    boundary = 0
    for row, (we, wl) in zip(got, want):
        for g, w in ((row["e"], we), (row["l"], wl)):
            max_ulp = max(max_ulp, ulps(g, w))
            # rounded values must agree — the absorption claim itself
            assert math.floor(abs(g) * 1e6 + 0.5) == math.floor(
                abs(w) * 1e6 + 0.5
            ), (g, w)
            # boundary exposure: raw value within 4 ulps of a .5e-6
            # rounding boundary, where a 1-ulp engine gap COULD flip
            # the rounded value
            frac = abs(g) * 1e6
            if abs(frac - math.floor(frac) - 0.5) < 4 * abs(
                np.spacing(frac)
            ):
                boundary += 1
    assert max_ulp <= 16, f"libm divergence widened to {max_ulp} ulps"
    assert boundary == 0, (
        f"{boundary} grid values sit on a rounding boundary — "
        "the absorption premise is exposed on this data"
    )


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.integers(0, 2**32 - 1))
def test_jpeg_huffman_lut_matches_serial_walk(seed):
    """The r13 flat 16-bit Huffman LUT (jpeg._decode_tree) must decode
    EXACTLY what the spec's serial per-bit tree walk decodes, for
    random canonical tables and random bitstreams. The serial
    reference is re-derived here from T.81's canonical-code
    construction — an independent implementation, not the code under
    test — so a slot-fill bug in the LUT (off-by-one code ranges,
    wrong slot ownership, a length-0 hole where a code belongs) cannot
    hide behind a shared helper."""
    import random

    from opusdb_spark.operators import jpeg

    rng = random.Random(seed)
    # random canonical table: choose counts per length that respect
    # the prefix budget (Kraft sum <= 1), at least one code
    bits = [0] * 16
    budget = 1.0
    n_codes = 0
    for length in range(1, 17):
        cap = int(budget * (1 << length)) - (1 if length == 16 else 0)
        take = rng.randint(0, min(max(cap, 0), 8))
        bits[length - 1] = take
        n_codes += take
        budget -= take / (1 << length)
        if budget <= 0:
            break
    if n_codes == 0:
        bits[8] = 1
        n_codes = 1
    vals = [rng.randint(0, 255) for _ in range(n_codes)]

    # independent serial reference: (length, code) -> symbol
    serial: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            serial[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1

    lut_sym, lut_len = jpeg._decode_tree(bits, vals)

    # every defined code word decodes to its symbol at its length,
    # from EVERY 16-bit slot whose prefix it is
    for (length, c), sym in serial.items():
        lo = c << (16 - length)
        for probe in (lo, lo + (1 << (16 - length)) - 1, lo + rng.randint(0, (1 << (16 - length)) - 1)):
            assert lut_len[probe] == length, (bits, length, c)
            assert lut_sym[probe] == sym

    # random 16-bit indexes: LUT agrees with a serial walk bit-by-bit
    for _ in range(50):
        idx = rng.randint(0, (1 << 16) - 1)
        c = 0
        hit = None
        for length in range(1, 17):
            c = (c << 1) | ((idx >> (16 - length)) & 1)
            if (length, c) in serial:
                hit = (length, serial[(length, c)])
                break
        if hit is None:
            assert lut_len[idx] == 0, (bits, idx)
        else:
            assert (lut_len[idx], lut_sym[idx]) == (hit[0], hit[1])
