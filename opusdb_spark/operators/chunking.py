"""Content-defined chunking (CDC) — storage-level dedup primitives.

Fixed-size chunking breaks on the first insertion: every later chunk
shifts and nothing dedupes. Content-defined chunking (the rolling-hash
technique of LBFS/rsync lineage; Muthitacharoen et al., SOSP 2001)
places chunk boundaries where a rolling hash of the last W bytes hits a
mask condition, so boundaries are a function of LOCAL content — an edit
re-chunks only its neighborhood and every downstream chunk still
matches (the self-synchronization property, pinned in tests).

Spark shape: chunking is pure per-document map work — one Arrow batch
pass (numpy sliding-window polynomial hash, no Python per-byte loop),
no shuffle. The only shuffle in a CDC dedup is the chunk-hash groupBy,
which is exactly the shape of exact dedup (dedup.py) one level below
the document. At 100 TB: chunk rows are (hash, len) — bytes stay in
place; the dedup ledger is hash-keyed and map-side combinable.

Reference anchor: the reference stores page-granular binary blobs
(page.clj:16-28); CDC is the variable-boundary generalization a
dedup-aware store would run over them (SURVEY §2C).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

# Window and size policy. MIN bounds metadata overhead, the mask sets
# the AVERAGE (2^5 → ~32 chars beyond MIN), MAX bounds the tail where
# the mask never fires. Sized for this corpus's ~300-char documents;
# a blob store would scale all three (e.g. 2 KB / 8 KB / 64 KB).
CDC_W = 8
CDC_MIN = 16
CDC_MASK = 31  # boundary when H & MASK == 0 → avg gap 32
CDC_MAX = 128

# Deterministic per-byte gear table: 64-bit values from a fixed-seed
# generator (same determinism contract as dedup.py's affine constants).
_GEAR = np.random.RandomState(0xCDC5EED).randint(
    0, 2**63, size=256, dtype=np.int64
).astype(np.uint64)
# polynomial base, odd → invertible mod 2^64 (wrapping uint64 algebra;
# powers computed in Python ints mod 2^64 — no silent-overflow path)
_P = 0x9E3779B97F4A7C15
_POWS = np.array(
    [pow(_P, CDC_W - 1 - j, 2**64) for j in range(CDC_W)], dtype=np.uint64
)


def chunk_positions(data: bytes) -> list[int]:
    """Boundary END offsets for one document (pure reference
    implementation — also the numpy kernel's oracle in tests).

    H(i) = sum_{j=0..W-1} GEAR[b[i-W+1+j]] * P^(W-1-j)  (mod 2^64);
    position i+1 ends a chunk when H(i) & MASK == 0, subject to
    MIN/MAX. The final chunk ends at len(data) regardless."""
    n = len(data)
    if n == 0:
        return []
    b = np.frombuffer(data, dtype=np.uint8)
    g = _GEAR[b]
    if n >= CDC_W:
        # sliding windows (n-W+1, W) @ powers → every window hash in
        # one vectorized pass (wrapping uint64 == mod 2^64)
        win = np.lib.stride_tricks.sliding_window_view(g, CDC_W)
        H = (win * _POWS[None, :]).sum(axis=1, dtype=np.uint64)
        hits = (H & np.uint64(CDC_MASK)) == 0
    else:
        hits = np.zeros(1, dtype=bool)
    ends = []
    last = 0
    # enforce MIN/MAX sequentially over the (sparse) candidate hits —
    # the dense per-byte work above stays vectorized
    cand = np.nonzero(hits)[0] + CDC_W  # window [i-W+1, i] ends chunk at i+1
    ci = 0
    while last < n:
        limit = min(last + CDC_MAX, n)
        cut = limit
        while ci < len(cand) and cand[ci] <= limit:
            if cand[ci] >= last + CDC_MIN:
                cut = int(cand[ci])
                ci += 1
                break
            ci += 1
        ends.append(cut)
        last = cut
        while ci < len(cand) and cand[ci] < last + CDC_MIN:
            ci += 1
    return ends


def chunk_doc(text: str) -> list[tuple[str, int]]:
    """(chunk_hash, chunk_len) list for one document — md5 of the chunk
    bytes (engine-stable, collision-safe at ledger scale)."""
    data = text.encode("utf-8", "surrogatepass")
    out = []
    last = 0
    for end in chunk_positions(data):
        piece = data[last:end]
        out.append((hashlib.md5(piece).hexdigest(), end - last))
        last = end
    return out


def cdc_chunks_udf():
    """Arrow UDF: document text → its CDC chunk list. Per-batch numpy
    window hashing; the per-doc boundary walk touches only mask hits
    (~len/32 candidates), not bytes. (Factory, not a module-level
    decorator: pandas_udf parses its DDL return type against the
    ACTIVE session, so decorating at import time would require one.)"""

    @F.pandas_udf("array<struct<chunk_hash: string, chunk_len: int>>")
    def udf(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [None if t is None else chunk_doc(t) for t in texts],
            dtype=object,
        )

    return udf


def chunked(docs, id_col: str = "doc_id", text_col: str = "text"):
    """One row per (doc, chunk): doc_id, seq, chunk_hash, chunk_len.
    No shuffle — pure map + explode."""
    from opusdb_spark.operators.skew import spread

    return (
        spread(docs)
        .select(
            id_col, F.posexplode(cdc_chunks_udf()(F.col(text_col))).alias(
                "seq", "c"
            )
        )
        .select(
            id_col,
            "seq",
            F.col("c.chunk_hash").alias("chunk_hash"),
            F.col("c.chunk_len").alias("chunk_len"),
        )
    )
