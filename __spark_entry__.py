"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``bugzilla_etl_spark.plans.catalog`` — the query
catalog is the executable form of SURVEY.md §2.  The driver runs
``entry(spark)`` as a smoke check, then each ``queries()[name]`` at
sf=0.01 against the matching ``oracle_sql()[name]`` via DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bugzilla_etl_spark.plans import catalog

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the COMPLETE end-to-end bug-version pipeline —
    change log -> versioned snapshots (intervals, rolled-forward
    state, accumulated sets) -> per-version flag-set replay +
    re-nested attachment sub-entities -> full ES documents."""
    catalog.load_all()
    return catalog.QUERIES["bug_version_full"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    catalog.load_all()
    return dict(catalog.QUERIES)


def oracle_sql() -> dict[str, str]:
    catalog.load_all()
    return dict(catalog.ORACLES)
