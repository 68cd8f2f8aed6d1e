"""Streaming passage-chunking ingest: documents arriving on a stream
are split into training/RAG passages AT INGEST TIME through the
IDENTICAL ``operators.text.chunk_passages`` projection the batch
``doc_chunks`` entry materializes — streaming == batch by
construction, so the oracle for the streaming entry is the batch
entry's own SQL.

This closes the "every batch LLM op has an ingest twin" symmetry for
the chunking family (stream_neardup_ingest is the dedup-gate twin,
stream_decontam the decontamination twin): a production corpus
pipeline chunks each crawl drop as it lands rather than re-scanning
the accumulated corpus per training run.

Scale shape per micro-batch: chunking is a pure map (scan -> project
-> generate, zero shuffles — the batch entry's plan pin holds for
every micro-batch plan too), so the stream is embarrassingly
parallel and stateless; there is no watermark because there is no
state to bound.  The output dir is batch-keyed (``batch=<id>``
overwritten per batch), so checkpoint replays are idempotent — the
same batch lands in the same dir, the bucketed-swap rule every
file-sink twin follows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from bugzilla_etl_spark.operators.text import chunk_passages


def run_chunk_ingest(
    spark,
    landing_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    width: int = 64,
    stride: int = 48,
) -> None:
    """availableNow streaming run: file source over ``landing_dir``
    (one file per trigger -> real multi-batch execution), each batch
    chunked via the shared ``chunk_passages`` projection and written
    to a batch-keyed dir (idempotent under checkpoint replay)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        chunk_passages(
            batch_df, width=width, stride=stride
        ).write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
