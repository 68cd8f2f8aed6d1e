"""Streaming incremental FULL-document rebuild.

The reference's incremental loop does not patch documents — any bug
touched since the watermark is re-built IN FULL from its complete
history and overwritten in ES (reference: bz_etl.py:172
incremental_etl; the same etl() serves full and incremental runs).
Streaming-first, that loop is a foreachBatch over the change stream:

  1. append the micro-batch to an entity-bucketed EVENTS ARCHIVE
     (the accumulated history — at lakehouse scale, the ingest table
     bucketed by entity);
  2. read the archive back for ONLY the touched buckets (partition
     pruning by path), semi-join the touched entities, dedup replayed
     events by their id;
  3. run the IDENTICAL batch document pipeline (``build_fn``) over
     that touched-entity subset;
  4. swap the rebuilt entities' documents into the bucketed document
     store — replacing every version of a touched entity, exactly
     like ES overwrite-by-_id across the doc's whole version set.

Crash safety: the archive append is idempotent-after-dedup (a
replayed batch appends duplicate rows; step 2 drops them by event
id), and the document swap reuses the retire/rename/restore protocol
of snapshot_stream (old-or-new per bucket, orphans healed on the
next batch).  Re-running a batch therefore converges to the same
store — the incremental==full equivalence is the oracle.

Scale: per batch, work is proportional to the touched entities'
history (the reference's own cost model), not the corpus; untouched
buckets are never read, written, or listed.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bugzilla_etl_spark.streaming.snapshot_stream import (
    restore_orphaned_buckets,
    swap_buckets,
)

#: Per-phase wall split of the LAST stream_full_rebuild run, summed
#: across its micro-batches (the operators/backfill.LAST_SPLIT
#: precedent; round-13 verdict task 3 — stream_bug_versions' 17.5 s
#: marginal had never received the progress-split diagnosis that
#: root-caused the attribution pair).  Phases: ``restore`` = orphan
#: healing, ``discover`` = touched-bucket collect, ``append`` =
#: archive append write, ``rebuild_write`` = the touched-history
#: read + build_fn pipeline + prev-store merge + swap-dir write (one
#: action — splitting it further would need an extra materialization
#: that changes the measured plan), ``swap`` = bucket renames.
#:
#: Under ``fine_split`` additional ``fs_*`` keys appear
#: (fs_hist_read/fs_build/fs_prev_read/fs_write): they are a
#: DECOMPOSITION of the rebuild path, not extra phases — fs_write
#: equals that run's rebuild_write by construction — so consumers
#: summing "the phases" must exclude the ``fs_`` prefix or the
#: write wall double-counts (r15 review).
LAST_SPLIT: dict[str, float] = {}


def _reset_split() -> None:
    LAST_SPLIT.clear()
    LAST_SPLIT["n_batches"] = 0


def _add(key: str, sec: float) -> None:
    LAST_SPLIT[key] = round(LAST_SPLIT.get(key, 0.0) + sec, 3)


def stream_full_rebuild(
    events_stream: DataFrame,
    archive_dir: str,
    docs_dir: str,
    checkpoint_dir: str,
    build_fn: Callable[[DataFrame], DataFrame],
    entity: str = "user_id",
    event_id: str = "event_id",
    n_buckets: int = 16,
    fine_split: bool = False,
):
    """foreachBatch writer: touched-entity full rebuild through
    ``build_fn`` (events subset -> document rows; must include the
    entity column) into a bucketed parquet document store.

    ``fine_split=True`` is the diagnosis mode (r14 verdict task 3):
    it persists and counts each rebuild_write sub-stage (touched
    archive read, build_fn pipeline, prev-store read, final write)
    so the phase wall decomposes into ``fs_hist_read`` /
    ``fs_build`` / ``fs_prev_read`` / ``fs_write`` entries in
    LAST_SPLIT.  The extra materializations CHANGE the measured plan
    (each stage loses pipelining into the next), so the sub-walls
    are attribution evidence, not a performance mode — never enable
    it in a bench lane's timed path."""

    _reset_split()

    def rebuild(batch: DataFrame, batch_id: int) -> None:
        import os

        LAST_SPLIT["n_batches"] += 1
        t = time.perf_counter()
        restore_orphaned_buckets(docs_dir)
        _add("restore", time.perf_counter() - t)
        spark = batch.sparkSession
        bucket = F.pmod(F.hash(entity), F.lit(n_buckets))
        b = batch.withColumn("bucket", bucket)
        t = time.perf_counter()
        touched_b = sorted(
            r.bucket for r in b.select("bucket").distinct().collect()
        )
        _add("discover", time.perf_counter() - t)
        if not touched_b:
            return
        t = time.perf_counter()
        b.write.mode("append").partitionBy("bucket").parquet(archive_dir)
        _add("append", time.perf_counter() - t)

        touched = b.select(entity).distinct()
        hist = (
            spark.read.option("basePath", archive_dir)
            .parquet(*[f"{archive_dir}/bucket={k}" for k in touched_b])
            .dropDuplicates([event_id])
            .join(F.broadcast(touched), on=entity, how="left_semi")
            .drop("bucket")
        )
        pinned = []
        t = time.perf_counter()
        if fine_split:
            hist = hist.persist()
            hist.count()
            pinned.append(hist)
            _add("fs_hist_read", time.perf_counter() - t)
            t = time.perf_counter()
        docs = build_fn(hist).withColumn("bucket", bucket)
        if fine_split:
            docs = docs.persist()
            docs.count()
            pinned.append(docs)
            _add("fs_build", time.perf_counter() - t)
            t = time.perf_counter()

        existing = [
            k
            for k in touched_b
            if os.path.isdir(f"{docs_dir}/bucket={k}")
        ]
        if existing:
            prev = (
                spark.read.option("basePath", docs_dir)
                .parquet(*[f"{docs_dir}/bucket={k}" for k in existing])
                .join(F.broadcast(touched), on=entity, how="left_anti")
            )
            if fine_split:
                prev = prev.persist()
                prev.count()
                pinned.append(prev)
                _add("fs_prev_read", time.perf_counter() - t)
                t = time.perf_counter()
            docs = docs.unionByName(prev)
        tmp = f"{docs_dir}/.swap_{batch_id}"
        t = time.perf_counter()
        docs.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
        w = time.perf_counter() - t
        _add("rebuild_write", w)
        if fine_split:
            _add("fs_write", w)
            for frame in pinned:
                frame.unpersist()
        t = time.perf_counter()
        swap_buckets(docs_dir, tmp, touched_b, batch_id)
        _add("swap", time.perf_counter() - t)

    return (
        events_stream.writeStream.foreachBatch(rebuild)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
    )
