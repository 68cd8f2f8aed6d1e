"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash.

Scale design (the whole point of these):

* exact        — one hash-groupBy; partial agg map-side, tiny shuffle.
* ngram-jaccard— candidate pairs ONLY within a blocking key; the
                 all-pairs crossJoin never exists in the plan.
* minhash-lsh  — signatures are per-row array expressions (no
                 explode until banding); candidates come from a
                 self-join on (band_id, band_key) so the shuffle is
                 proportional to docs x bands, not docs².  Verified
                 with true Jaccard before reporting.
* simhash      — per-row 32-bit fingerprint; near-pairs via byte-band
                 buckets + popcount(xor) Hamming check.

All hashes are the portable md5 family — deterministic across
engines/runs, so incremental re-runs bucket identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bugzilla_etl_spark.functions.hashing import hash64, hash64_seeded
from bugzilla_etl_spark.operators.text import shingles, tokens

N_MINHASH = 16
N_BANDS = 4  # rows per band = N_MINHASH / N_BANDS = 4
SIMHASH_BITS = 32


def normalized_text(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def exact_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on normalized text: every doc mapped to its group's
    canonical (minimum) id + group size.  Window over the hash key —
    single shuffle on the 60-bit text hash."""
    from pyspark.sql import Window

    keyed = docs.select(
        F.col(id_col), hash64(normalized_text(text_col)).alias("text_hash")
    )
    w = Window.partitionBy("text_hash")
    return keyed.select(
        id_col,
        "text_hash",
        F.min(id_col).over(w).alias("canonical_id"),
        F.count(F.lit(1)).over(w).alias("group_size"),
    )


def _shingled(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    tok = tokens(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        tok.alias("tok"),
        shingles(tok).alias("sh"),
    )


def jaccard(a: Column, b: Column) -> Column:
    """|A ∩ B| / |A ∪ B| over distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_distinct(F.concat(a, b)))
    return inter / F.greatest(union, F.lit(1))


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by 3-gram Jaccard, blocked on the first token.

    Blocking bounds the candidate space (per-block n²; pick the key so
    blocks stay small).  For unbounded corpora prefer minhash_lsh_pairs
    — this variant is the exact verifier used on candidate subsets."""
    t = _shingled(docs, text_col, id_col).withColumn(
        "block", F.element_at("tok", 1)
    )
    a = t.select(
        F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"), "block"
    )
    b = t.select(
        F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"), "block"
    )
    pairs = a.join(b, on="block").where(F.col("doc_a") < F.col("doc_b"))
    return (
        pairs.withColumn("jac", jaccard(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jac") >= threshold)
        .select("doc_a", "doc_b", F.round("jac", 4).alias("jaccard"))
    )


def minhash_signature(sh: Column, n: int = N_MINHASH) -> Column:
    """n-element minhash signature of a shingle array — pure row-local
    array expression (codegen; NO explode, NO shuffle)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda s: F.array_min(
            F.transform(sh, lambda x: hash64(F.concat(s.cast("string"), F.lit(":"), x)))
        ),
    )


def band_keys(sig: Column, n_bands: int = N_BANDS, rows: int | None = None) -> Column:
    """Split a signature into band-key strings (joined values)."""
    rows = rows or (N_MINHASH // n_bands)
    keys = [
        F.concat_ws(
            ",",
            *[
                F.element_at(sig, b * rows + j + 1).cast("string")
                for j in range(rows)
            ],
        )
        for b in range(n_bands)
    ]
    return F.array(*keys)


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash + LSH near-dup pairs, verified with true Jaccard.

    Plan shape: scan -> per-row sig+bands -> posexplode(bands) ->
    self-join on (band, key) -> distinct candidate pairs -> rejoin
    shingles -> Jaccard filter.  The only data-sized shuffles are the
    band join (docs x N_BANDS rows) and the candidate rejoin."""
    t = _shingled(docs, text_col, id_col)
    sig = t.select(
        "doc_id", "sh", band_keys(minhash_signature(F.col("sh"))).alias("bands")
    )
    exploded = sig.select(
        "doc_id", F.posexplode("bands").alias("band_id", "band_key")
    )
    a = exploded.select(
        F.col("doc_id").alias("doc_a"), "band_id", "band_key"
    )
    b = exploded.select(
        F.col("doc_id").alias("doc_b"), "band_id", "band_key"
    )
    cand = (
        a.join(b, on=["band_id", "band_key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sh = t.select("doc_id", "sh")
    verified = (
        cand.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), on="doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), on="doc_b")
        .withColumn("jac", jaccard(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jac") >= threshold)
    )
    return verified.select("doc_a", "doc_b", F.round("jac", 4).alias("jaccard"))


# Bit-vote fold as a SQL expression: the shift amount is the lambda
# variable, which the Python shiftleft/shiftright builders reject
# (they require literal ints) but SQL accepts as an expression.
_SIMHASH_SQL = """
aggregate(sequence(0, {last_bit}), CAST(0 AS BIGINT), (acc, b) -> acc +
  CASE WHEN aggregate({hv}, CAST(0 AS BIGINT), (a2, h) -> a2 +
            CASE WHEN (h >> b) & 1 = 1 THEN CAST(1 AS BIGINT)
                 ELSE CAST(-1 AS BIGINT) END) > 0
       THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END)
"""


def simhash_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Bit-vote fingerprint over distinct token hashes (row-local)."""
    hv = F.transform(F.array_distinct(tokens(text_col)), lambda t: hash64(t))
    return docs.select(F.col(id_col).alias("doc_id"), hv.alias("hv")).select(
        "doc_id",
        F.expr(_SIMHASH_SQL.format(last_bit=bits - 1, hv="hv"))
        .cast("long")
        .alias("simhash"),
    )


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-pairs within Hamming distance: byte-band candidates (a pair
    within distance d<=6 over 4 bytes must agree on >=1 whole byte
    only if d < 4 bits spread — we band on all 4 bytes which catches
    any pair agreeing on at least one byte) + popcount verification."""
    fp = simhash_fingerprints(docs, text_col, id_col)
    banded = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_id"),
                        F.shiftright(F.col("simhash"), 8 * i)
                        .bitwiseAND(F.lit(255))
                        .alias("band_key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band_id", "bk.band_key")
    a = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("fp_a"),
        "band_id", "band_key",
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("fp_b"),
        "band_id", "band_key",
    )
    cand = (
        a.join(b, on=["band_id", "band_key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "fp_a", "fp_b")
        .distinct()
    )
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        cand.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
