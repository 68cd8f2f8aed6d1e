"""Structured-Streaming snapshot maintenance.

The reference's incremental loop (bz_etl.py:172 incremental_etl)
polls for changes since last_run_time and re-emits affected bug
versions; ES overwrite-by-id makes it idempotent.  Streaming-first,
that loop IS a Structured Streaming query:

  file/kafka source -> event-time watermark -> stateful
  latest-per-entity -> foreachBatch upsert into the document store.

Two implementations:

* ``stream_current_state`` — applyInPandasWithState: explicit
  per-entity state (latest ts/value), the template for arbitrary
  custom stateful operators (the reference's running bug-state
  object, kept in store-backed state instead of driver memory).
* ``stream_upsert_foreachbatch`` — declarative micro-batch variant:
  per-batch latest + parquet-dir merge, the deploy-simple path.

Scale: state is per-entity-small (one row), partitioned by the same
key as the batch pipelines; watermark bounds state growth for
entities that go quiet.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType(
    [
        StructField("last_ts", TimestampType()),
        StructField("last_event_id", LongType()),
        StructField("last_event_type", StringType()),
        StructField("last_value", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("last_ts", TimestampType()),
        StructField("last_event_id", LongType()),
        StructField("last_event_type", StringType()),
        StructField("last_value", DoubleType()),
    ]
)


def _update_state(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
):
    """Keep the latest event per entity ((ts, event_id) max-merge of
    prior state and this micro-batch)."""
    if state.exists:
        ts, eid, etype, val = state.get
    else:
        ts, eid, etype, val = None, None, None, None
    for pdf in pdfs:
        for _, row in pdf.iterrows():
            cand = (row["ts"], row["event_id"])
            if ts is None or cand > (ts, eid):
                ts, eid = row["ts"], int(row["event_id"])
                etype, val = row["event_type"], float(row["value"])
    state.update((ts, eid, etype, val))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "last_ts": [ts],
            "last_event_id": [eid],
            "last_event_type": [etype],
            "last_value": [val],
        }
    )


def stream_current_state(events_stream: DataFrame) -> DataFrame:
    """Stateful latest-per-entity over an event stream."""
    return (
        events_stream.groupBy("user_id")
        .applyInPandasWithState(
            _update_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_dedup_events(events_stream: DataFrame) -> DataFrame:
    """Exactly-once ingestion: drop replayed/duplicate events by id
    within the watermark horizon.  The reference gets idempotency from
    ES overwrite-by-_id at the sink; Spark-native pipelines dedup
    BEFORE downstream aggregations so replays never double-count.
    State = seen ids newer than the 2h watermark (bounded)."""
    return events_stream.withWatermark("ts", "2 hours").dropDuplicates(
        ["event_id"]
    )


def stream_time_rollup(events_stream: DataFrame) -> DataFrame:
    """Watermarked hourly rollup — the continuous-aggregate form of
    the batch ``time_rollup`` query.  The 2h watermark bounds state:
    hour buckets older than the watermark are finalized and evicted,
    which is what keeps a forever-running aggregation's memory flat.
    """
    return (
        events_stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour"), "event_type",
            "n_events", "sum_value",
        )
    )


def stream_upsert_foreachbatch(
    events_stream: DataFrame, state_dir: str, checkpoint_dir: str
):
    """Micro-batch upsert: per-batch latest merged with the stored
    state (read-modify-write of a small parquet dir; at scale this is
    a MERGE INTO on a lakehouse table keyed by entity)."""

    def upsert(batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        spark = batch.sparkSession
        try:
            prev = spark.read.parquet(state_dir)
        except Exception:
            prev = None
        merged = batch if prev is None else batch.unionByName(prev)
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        latest = (
            merged.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        # write to a temp dir then swap would be the production move;
        # local test scope just rewrites (cache to cut the read-write race)
        latest.cache().count()
        latest.write.mode("overwrite").parquet(state_dir)
        latest.unpersist()

    return (
        events_stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
    )
