"""Persistent alias-mapping store with the reference's compaction
rules.

The reference persists the canonical-email mapping ACROSS runs — a
gzipped JSON file (or an ES index) loaded at startup, folded into
during analysis, compacted and saved at the end
(reference: alias_analysis.py:232 load_aliases, :306 save_aliases,
:322 compact — compact drops identity mappings ``alias == canonical``
and keeps the explicit non-match list alongside).  When a canonical
itself gets re-aliased, every stored alias pointing at it is
reassigned to the new canonical (:225 "ALIAS REMAPPED", the reassign
loop in add_alias).

Spark-first the store is a parquet dim table, not JSON: the mapping
is dim-sized (≤ millions of rows), so save is a full overwrite, load
is a broadcast-sized scan, and a merge round is union + precedence
dedup + chain closure — no incremental "dirty" bookkeeping needed
(that is an ES-bulk-append artifact of the reference's sink, not a
semantic).  Non-matches ride in the same table with ``ignore=true``
(mirroring the reference's ES docs, where the non-match rows carry an
``ignore`` field).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from bugzilla_etl_spark.operators.alias import canonical_closure

SCHEMA = "alias string, canonical string, ignore boolean"


def compact(mapping: DataFrame) -> DataFrame:
    """The reference's compact(): drop identity rows (an alias that
    maps to itself carries no information) — alias_analysis.py:322."""
    return mapping.where(
        F.col("alias").isNull()
        | F.col("canonical").isNull()
        | (F.col("alias") != F.col("canonical"))
    )


def save_aliases(
    mapping: DataFrame,
    path: str,
    not_aliases: DataFrame | None = None,
) -> None:
    """Compact + overwrite the store.  ``mapping``: (alias, canonical);
    ``not_aliases``: (alias, canonical) pairs confirmed NOT aliases
    (alias_analysis.py save_aliases keeps both)."""
    rows = compact(
        mapping.select("alias", "canonical", F.lit(False).alias("ignore"))
    )
    if not_aliases is not None:
        rows = rows.unionByName(
            not_aliases.select(
                "alias", "canonical", F.lit(True).alias("ignore")
            )
        )
    # dim-sized by contract: coalesce to a handful of files so the
    # store stays a cheap broadcast-side scan
    rows.coalesce(4).write.mode("overwrite").parquet(path)


def load_aliases(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Load (aliases, not_aliases) from the store; empty typed frames
    ONLY when the store does not exist yet (first run).  Any other
    read failure — partial write, permissions, schema drift —
    propagates: treating it as a first run would let the next
    save_aliases overwrite permanently discard the accumulated alias
    history the store exists to preserve."""
    try:
        stored = spark.read.parquet(path)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" not in (e.getCondition() or ""):
            raise
        empty = spark.createDataFrame([], SCHEMA)
        return empty.select("alias", "canonical"), empty.select(
            "alias", "canonical"
        )
    return (
        stored.where(~F.col("ignore")).select("alias", "canonical"),
        stored.where(F.col("ignore")).select("alias", "canonical"),
    )


def merge_aliases(stored: DataFrame, fresh: DataFrame) -> DataFrame:
    """Fold a fresh analysis round into the stored mapping:

    1. per alias, the FRESH row wins (the reference overwrites
       ``self.aliases[k]`` with the latest analysis);
    2. chains collapse — a stored alias whose canonical was itself
       re-aliased follows to the new canonical ("ALIAS REMAPPED",
       alias_analysis.py:225);
    3. identity rows produced by the collapse are compacted away.

    One broadcast-sized pipeline end-to-end; nothing here touches a
    fact table."""
    tagged = fresh.select(
        "alias", "canonical", F.lit(0).alias("_src")
    ).unionByName(stored.select("alias", "canonical", F.lit(1).alias("_src")))
    w = Window.partitionBy("alias").orderBy("_src", "canonical")
    merged = (
        tagged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("alias", "canonical")
    )
    return compact(canonical_closure(merged))
