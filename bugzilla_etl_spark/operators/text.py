"""Text-analysis operators for training-data pipelines.

Everything is built from JVM-side column expressions and
higher-order array functions — no Python UDFs anywhere — so the hot
path stays inside whole-stage codegen and scales linearly with the
scan.  All hash values use the portable md5-derived family from
``functions.hashing`` so results are reproducible across engines and
runs (critical for incremental dedup at 100 TB: the same doc always
lands in the same bucket).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from bugzilla_etl_spark.functions.hashing import hash64

# Rolling-hash modulus keeps products < ~1.3e11: no bigint overflow on
# either engine (DuckDB errors on int64 overflow; Java would wrap).
FP_MOD = 1_000_000_007
FP_MULT = 131

# BPE-ish segmentation: letter runs | digit runs | single other glyph
BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of lower-cased trimmed text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), r"\s+")


def shingles(tok: Column, n: int = 3) -> Column:
    """Distinct n-gram shingles (space-joined) over a token array.

    Built as zip_with over shifted slices of the array, NOT a
    transform+element_at loop: lambda bodies re-evaluate outer
    expressions per element (no CSE inside higher-order functions),
    which made the naive form O(tokens² x split()) per document —
    measured 25s to merely explode shingles at sf0.1.  zip_with
    evaluates each argument once per ROW, so this is O(tokens).
    zip_with pads the shorter side with null and concat propagates
    null, so trailing partial grams filter out naturally."""
    z = tok
    for j in range(1, n):
        shifted = F.slice(
            tok, j + 1, F.greatest(F.size(tok) - j, F.lit(0))
        )
        z = F.zip_with(z, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.array_distinct(F.filter(z, lambda x: x.isNotNull()))


def bigrams(tok: Column) -> Column:
    """ALL adjacent token bigrams, multiplicities preserved —
    repetition metrics need counts, unlike shingles() which dedups
    for set semantics.  Same zip_with/slice shape (arguments evaluate
    once per row; see shingles() for why transform+element_at is
    O(tokens²) here)."""
    shifted = F.slice(tok, 2, F.greatest(F.size(tok) - 1, F.lit(0)))
    return F.filter(
        F.zip_with(tok, shifted, lambda a, b: F.concat(a, F.lit(" "), b)),
        lambda x: x.isNotNull(),
    )


def stopword_hits(tok: Column, stopwords=EN_STOPWORDS) -> Column:
    """Count of tokens that are stopwords (filter + size: no shuffle)."""
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(tok, lambda t: F.array_contains(sw, t)))


def lang_guess(tok: Column, threshold: float = 0.05) -> Column:
    """N-gram-free heuristic language ID: English-stopword density.
    A real model slots in behind the same column contract."""
    ratio = stopword_hits(tok) / F.greatest(F.size(tok), F.lit(1))
    return F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("unk"))


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    low = F.lower(c)
    return F.regexp_count(low, F.lit(r"[^a-z0-9\s]")) / F.greatest(
        F.length(low), F.lit(1)
    )


def mean_word_len(tok: Column) -> Column:
    total = F.aggregate(
        tok, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return total / F.greatest(F.size(tok), F.lit(1))


def token_counts(col: Column | str) -> tuple[Column, Column]:
    """(whitespace tokens, BPE-ish regex segments)."""
    c = F.col(col) if isinstance(col, str) else col
    low = F.lower(F.trim(c))
    n_ws = F.size(F.split(low, r"\s+"))
    n_bpe = F.regexp_count(low, F.lit(BPE_RE))
    return n_ws, n_bpe


def rolling_fingerprint(tok: Column) -> Column:
    """Order-sensitive polynomial rolling hash over token hashes —
    the document fingerprint (two docs with the same tokens in a
    different order get different prints, unlike minhash)."""
    hashes = F.transform(tok, lambda t: hash64(t) % FP_MOD)
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * FP_MULT + h) % FP_MOD,
    )
