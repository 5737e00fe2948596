"""Content-defined chunking contract pins (operators/chunking.py).

The properties that make CDC worth having over fixed-size splits:
self-synchronization under edits, size-policy invariants, and the
Arrow kernel agreeing with the pure reference walk."""

from __future__ import annotations

import hypothesis.strategies as st
from hypothesis import given, settings

from opusdb_spark.operators.chunking import (
    CDC_MAX,
    CDC_MIN,
    CDC_W,
    chunk_doc,
    chunk_positions,
    chunked,
)
from opusdb_spark.tables import table
from tests.conftest import SF_SMALL


@given(st.binary(min_size=0, max_size=2000))
@settings(max_examples=200, deadline=None)
def test_chunk_size_policy(data):
    ends = chunk_positions(data)
    if not data:
        assert ends == []
        return
    assert ends[-1] == len(data)  # full coverage, no gap/overlap
    last = 0
    for e in ends:
        size = e - last
        assert 0 < size <= CDC_MAX
        # every chunk except the final one respects MIN
        assert e == len(data) or size >= CDC_MIN
        last = e


@given(
    st.binary(min_size=200, max_size=1200),
    st.binary(min_size=1, max_size=40),
)
@settings(max_examples=150, deadline=None)
def test_self_synchronization_under_prefix_edit(tail, prefix):
    """CDC's defining property: prepending bytes must leave the chunking
    of the far tail unchanged. After both streams pass one full
    resynchronization point (a boundary both agree on beyond the edit +
    window + MAX horizon), every later boundary is identical —
    fixed-size chunking would shift ALL of them."""
    a = set(chunk_positions(tail))
    shift = len(prefix)
    b = {e - shift for e in chunk_positions(prefix + tail)}
    # boundaries in the stable region (deep enough that MIN/MAX state
    # has resynced: one MAX span past the edit neighborhood)
    horizon = 2 * CDC_MAX
    stable_a = {e for e in a if e > horizon and e < len(tail)}
    common = a & b
    if not stable_a:
        return  # tail too short to have a stable region — vacuous case
    # if ANY shared boundary exists past the horizon, everything after
    # the first shared one must match exactly
    sync = sorted(e for e in common if e > horizon)
    if sync:
        s = sync[0]
        assert {e for e in a if e >= s} == {e for e in b if e >= s}


def _naive_positions(data: bytes) -> list[int]:
    """INDEPENDENT scalar reference: each window hash recomputed from
    scratch per byte position with Python big-int arithmetic (no numpy,
    no sliding windows, no candidate pointer), MIN/MAX enforced by
    rescanning the whole candidate list per chunk. Deliberately shares
    only the CONSTANTS with chunk_positions — an off-by-one in the
    vectorized kernel's window offsets or power ordering cannot
    reproduce here."""
    from opusdb_spark.operators.chunking import _GEAR, _P

    n = len(data)
    if n == 0:
        return []
    mod = 2**64
    pows = [pow(int(_P), CDC_W - 1 - j, mod) for j in range(CDC_W)]
    cands = []
    for i in range(CDC_W - 1, n):
        h = 0
        for j in range(CDC_W):
            h = (h + int(_GEAR[data[i - CDC_W + 1 + j]]) * pows[j]) % mod
        if h & 31 == 0:  # CDC_MASK, written out
            cands.append(i + 1)
    ends: list[int] = []
    last = 0
    while last < n:
        limit = min(last + CDC_MAX, n)
        cut = limit
        for c in cands:
            if last + CDC_MIN <= c <= limit:
                cut = c
                break
        ends.append(cut)
        last = cut
    return ends


@given(st.binary(min_size=0, max_size=600))
@settings(max_examples=120, deadline=None)
def test_vectorized_kernel_matches_independent_scalar_walk(data):
    assert chunk_positions(data) == _naive_positions(data)


def test_chunks_reassemble_document():
    text = "the quick brown fox jumps over the lazy dog " * 20
    data = text.encode()
    ends = chunk_positions(data)
    pieces = []
    last = 0
    for e in ends:
        pieces.append(data[last:e])
        last = e
    assert b"".join(pieces) == data


def test_arrow_kernel_matches_reference(spark):
    """The distributed path (chunked → explode) must produce exactly
    the reference chunk list for every document."""
    docs = table(spark, SF_SMALL, "documents").select("doc_id", "text")
    got = {}
    for r in chunked(docs).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["seq"], r["chunk_hash"], r["chunk_len"])
        )
    rows = docs.collect()
    assert len(got) == len([r for r in rows if r["text"]])
    for r in rows:
        if not r["text"]:
            continue
        expect = [
            (i, h, ln) for i, (h, ln) in enumerate(chunk_doc(r["text"]))
        ]
        assert sorted(got[r["doc_id"]]) == expect, r["doc_id"]


def test_duplicate_documents_share_all_chunks():
    a = chunk_doc("x" * 5 + "shared content that is long enough " * 10)
    b = chunk_doc("y" * 5 + "shared content that is long enough " * 10)
    # identical same-length tails → every chunk except the edited head
    # hash-matches (the dedup win fixed-size chunking cannot get)
    assert len(a) == len(b) > 2
    assert a[0] != b[0]
    assert a[1:] == b[1:]
