"""Elasticsearch-style document sink.

The reference pushes bug-version docs to ES with bulk indexing,
overwrite-by-_id, and alias rollover (reference: bz_etl.py:131
setup_es, pyLibrary elasticsearch bulk usage; replicate.py for
ES->ES copies).  No ES service exists in this container, so the sink
renders the exact bulk-API payload shape to files; pointing it at a
live cluster is a transport swap (the `es-hadoop` connector or a
foreachPartition HTTP post), not a replan.

Scale notes: documents are rendered JVM-side (``to_json``) and
written straight from executors — the driver never sees a row.
``mode=overwrite`` + deterministic doc ids give idempotent re-runs
(same id -> same doc), which is what makes incremental ETL safe to
retry at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bugzilla_etl_spark.operators.normalize import to_es_doc


def bulk_lines(df: DataFrame, entity: str, ts: str, payload: Sequence[str]) -> DataFrame:
    """Render ES bulk-index line pairs:
    ``{"index":{"_id":"<id>"}}\\n{<doc>}`` — one string column."""
    docs = to_es_doc(df, entity, ts, payload)
    action = F.concat(
        F.lit('{"index":{"_id":"'), F.col("_id"), F.lit('"}}')
    )
    return docs.select(
        F.concat_ws("\n", action, F.col("doc")).alias("value")
    )


def write_bulk(
    df: DataFrame,
    path: str,
    entity: str,
    ts: str,
    payload: Sequence[str],
) -> None:
    """Write bulk payload files (one part per partition — each part is
    a valid _bulk request body)."""
    bulk_lines(df, entity, ts, payload).write.mode("overwrite").text(path)


def write_docs_parquet(
    df: DataFrame,
    path: str,
    entity: str,
    ts: str,
    payload: Sequence[str],
) -> None:
    """Document store as parquet (_id + doc json) — the replicate
    source/destination format used in tests."""
    to_es_doc(df, entity, ts, payload).write.mode("overwrite").parquet(path)
