"""Landing-dir helper for the file-source streaming queries.

One copy of the write-one-file-per-part staging dance (repartition ->
temp dir -> rename into the landing dir) that stream_neardup_ingest,
stream_decontam, and stream_attribution each need: under
``maxFilesPerTrigger=1`` each landed file becomes one real
micro-batch, which is what makes their streaming == batch oracles
meaningful multi-batch runs instead of single-shot reads.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame


def land_parts(landing: str, parts: list[tuple[str, DataFrame]]) -> None:
    """Write each (name, frame) as exactly one parquet file named
    ``<name>.parquet`` inside ``landing``.  File-source streams list
    files in name order, so callers control micro-batch ARRIVAL
    ORDER by part name — event-time-ordered names keep watermark
    advancement consistent with arrival, the contract a watermarked
    stream assumes of its ingest."""
    for name, part in parts:
        tmp = os.path.join(landing, f"_stage_{name}")
        # repartition(1), NOT coalesce(1): several callers land
        # DRIVER-CREATED frames (the watermark-heartbeat sentinels),
        # and coalesce(1) over a parallelized local collection folds
        # all 32 default slices into ONE task that performs 32
        # sequential Python-worker round-trips — measured ~5-6 s per
        # landing for a 1-ROW frame (vs ~0.5 s via the shuffle).
        # For JVM-backed parts the shuffle costs about the same as
        # the single-task read, so repartition is safe for both.
        part.repartition(1).write.mode("overwrite").parquet(tmp)
        src = next(
            f for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        os.rename(
            os.path.join(tmp, src),
            os.path.join(landing, f"{name}.parquet"),
        )
        shutil.rmtree(tmp)


def read_store_or_empty(spark, path: str, schema: str):
    """Read a foreachBatch-produced parquet store, or return an
    empty frame with the declared schema when the store was never
    created — the no-new-data incremental run: every batch was
    empty, every write was skipped, and the directory simply does
    not exist.  Callers declare the exact schema the stream's
    writer produces so empty-input runs stay schema-stable."""
    import os

    if not os.path.exists(path):
        return spark.createDataFrame([], schema=schema)
    return spark.read.parquet(path)
