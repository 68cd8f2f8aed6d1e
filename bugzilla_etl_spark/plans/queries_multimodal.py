"""Multimodal queries (SURVEY §2 #37): binary media columns.

``mm_features`` exercises the Arrow-batched mapInPandas decode path —
not SQL-expressible, so the driver records the rows-only check; the
schema/values are unit-tested in tests/test_multimodal.py instead.
``mm_frame_sample`` is pure column logic and fully oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bugzilla_etl_spark.operators import multimodal as M
from bugzilla_etl_spark.plans.catalog import register
from bugzilla_etl_spark.sources import load_table


@register("mm_features", oracle=None)
def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode+featurize media payloads (deterministic stub codec —
    the 100 TB plan shape is real: Arrow batches through mapInPandas)."""
    docs = load_table(spark, sf_dir, "documents")
    media = M.attach_media(docs)
    out = M.extract_features(media)
    return out.select("media_id", "mime", "n_bytes", F.size("feature").alias("dim"))


@register(
    "mm_frame_sample",
    oracle="""
    SELECT media_id, mime,
           unnest(range(0, greatest((n_chars % 24) - 1, 0) + 1, 4))
               AS frame_idx
    FROM (
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                    WHEN doc_id % 3 = 1 THEN 'audio/wav'
                    ELSE 'video/mp4' END AS mime,
               n_chars
        FROM documents
    ) WHERE mime LIKE 'video/%'
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-index sampling plan (no decode in the plan — selection
    happens before any byte is touched)."""
    docs = load_table(spark, sf_dir, "documents")
    media = M.attach_media(docs)
    return M.frame_sample(media, every_n=4).select("media_id", "mime", "frame_idx")
