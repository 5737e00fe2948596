"""Scalar-function library: the engine's reusable column expressions.

Everything here is a Column-in/Column-out expression (JVM-side, codegen
friendly) — the analog of the reference's page codec helpers
(page.clj:16-38), which were its only "functions". Grouped re-exports:

- text analysis (operators/text.py): tokenization, language ID,
  quality scoring, fingerprints
- exactness (exactness.py): decimal-summed aggregates whose results
  hash-match a SQL oracle bit-for-bit
- revenue(): the canonical TPC-H price expression used across queries
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from opusdb_spark.exactness import davg, dsum, sql_davg, sql_dsum  # noqa: F401
from opusdb_spark.operators.text import (  # noqa: F401
    langid_scores,
    mean_word_len,
    n_tokens_regex,
    n_words,
    predicted_lang,
    punct_ratio,
    quality_score,
    rolling_fingerprint,
    stopword_hits,
    words,
)


def revenue(price: Column | str = "l_extendedprice", discount: Column | str = "l_discount") -> Column:
    """extendedprice * (1 - discount) — the expression behind
    project_arith / join_multiway / topk_global."""
    p = F.col(price) if isinstance(price, str) else price
    d = F.col(discount) if isinstance(discount, str) else discount
    return p * (F.lit(1) - d)
