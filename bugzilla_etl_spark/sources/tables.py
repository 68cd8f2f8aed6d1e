"""Parquet table loaders.

The reference extracts from MySQL with ~20 hand-written SQL queries
(reference: bugzilla_etl/extract_bugzilla.py).  Spark-first, extraction
is a declarative scan: ``spark.read.parquet`` + column pruning +
predicate pushdown do what those hand-written projections/filters did,
and Catalyst pushes them into the file scan (verify with
``.explain``'s PushedFilters/ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table.  Column pruning / filter pushdown happen
    automatically from the downstream plan — do NOT .cache() here, it
    would pin the full width in memory and defeat pruning at scale."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader refuses.  Read nanos as long (legacy conf, runtime-settable)
        # and rebuild a TimestampType with INTEGER division — `ts/1000`
        # would route through double and lose precision above 2^53.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
