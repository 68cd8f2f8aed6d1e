"""Portable 60-bit hashes.

Spark's builtin ``hash``/``xxhash64`` and DuckDB's ``hash`` use
different algorithms, so any operator whose OUTPUT contains hash
values (minhash signatures, LSH buckets, fingerprints) would be
un-oracle-able with them.  Instead we derive a 60-bit integer from
md5 — identical bytes on both engines — via:

    Spark :  conv(substring(md5(x), 1, 15), 16, 10)::bigint
    DuckDB:  ('0x' || substr(md5(x), 1, 15))::UBIGINT::BIGINT

15 hex chars = 60 bits, always fits in a signed 64-bit int on both
sides.  md5 is JVM-side (whole-stage codegen), so this stays off the
Python slow path; seeded variants just prefix the input.  Determinism
also makes hash-partitioned layouts stable across runs/engines, which
matters for incremental pipelines at 100 TB (same key -> same bucket
every run).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash64(col: Column | str) -> Column:
    """Portable 60-bit hash of a string column (JVM codegen path)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def hash64_seeded(col: Column | str, seed: int) -> Column:
    """Seed family: independent-ish hash functions h_i(x) = md5(i:x)."""
    c = F.col(col) if isinstance(col, str) else col
    return hash64(F.concat(F.lit(f"{seed}:"), c.cast("string")))


def hash128(col: Column | str) -> Column:
    """FULL 128-bit portable hash: the complete md5 hex digest (32
    lowercase hex chars — fixed-width, engine-identical).  The
    escape hatch for key spaces past ~1e9 distinct values where the
    60-bit truncation's birthday collisions start fabricating false
    duplicates (the spans-family boundary documented at
    exact_substring_spans); still JVM codegen, still 32 bytes on the
    wire regardless of input length."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c.cast("string"))


# DuckDB SQL template mirroring hash64(); .format(x="<expr>")
DUCKDB_HASH64 = "(('0x' || substr(md5(CAST({x} AS VARCHAR)), 1, 15))::UBIGINT::BIGINT)"


def duckdb_hash64(expr: str, seed: int | None = None) -> str:
    """Render the DuckDB-side equivalent of hash64/hash64_seeded."""
    if seed is not None:
        expr = f"('{seed}:' || CAST({expr} AS VARCHAR))"
    return DUCKDB_HASH64.format(x=expr)


def duckdb_hash128(expr: str) -> str:
    """Render the DuckDB-side equivalent of hash128()."""
    return f"md5(CAST({expr} AS VARCHAR))"
