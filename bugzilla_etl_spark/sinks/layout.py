"""History-table layout writer — the storage side of the scale story.

At 100 TB the events table lives as a date-partitioned (and, in a
warehouse, entity-bucketed) lakehouse table:

* partition by event date  -> incremental runs and watermark filters
  prune whole directories before any IO (partition pruning);
* bucket by entity          -> the per-entity shuffle disappears from
  every temporal operator (scan-local windows).

``bucketBy`` needs a metastore table, so the parquet-dir form here
ships the partition layout only; ``write_bucketed_table`` is the
warehouse variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_history_layout(events: DataFrame, path: str) -> None:
    """Date-partitioned parquet layout for the change log."""
    (
        events.withColumn(
            "event_date",
            F.date_format(
                F.timestamp_seconds(
                    F.floor(F.col("ts").cast("long") / 86400) * 86400
                ),
                "yyyy-MM-dd",
            ),
        )
        .repartition("event_date")
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(path)
    )


def read_history_layout(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed_table(
    events: DataFrame, table: str, n_buckets: int = 64, entity: str = "user_id"
) -> None:
    """Warehouse variant: entity-bucketed + date-partitioned.  Windows
    and joins keyed on the entity then read pre-shuffled data."""
    (
        events.write.mode("overwrite")
        .bucketBy(n_buckets, entity)
        .sortBy(entity, "ts")
        .saveAsTable(table)
    )
