"""Multimodal queries (SURVEY §2 #37): binary media columns.

``mm_features`` exercises the Arrow-batched mapInPandas decode path.
A REAL codec is not SQL-expressible — but the deterministic stub is
pure modular arithmetic over the payload bytes, so the oracle
recomputes it from ``hex(encode(text))`` with a literal 31^i mod 997
power table: the driver gets a full value-hash check of the decode
plumbing (batch shapes, byte truncation, lane layout), not just a
row count.  ``register_codec`` of a real decoder would flip this
entry back to rows-only — the honest boundary is the codec body,
not the plan.  ``mm_frame_sample`` is pure column logic and fully
oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bugzilla_etl_spark.operators import multimodal as M
from bugzilla_etl_spark.plans.catalog import register
from bugzilla_etl_spark.sources import load_table

# 31^i mod 997 for i < 512 (max lane length of the 4096-byte window)
# — mirrors multimodal._POW31; embedded as a literal so the oracle is
# self-contained SQL.
_POW31 = []
_v = 1
for _ in range(512):
    _POW31.append(_v)
    _v = (_v * 31) % 997
_POW31_SQL = "[" + ",".join(map(str, _POW31)) + "]"

# lane k of the stub codec, as SQL: bytes k, k+8, ... of the first
# 4096 payload bytes, folded as Σ b_j·31^(m-1-j) mod 997 (the same
# vectorized identity the numpy codec uses).  1-based power index =
# m - j with m = (nb-k+7)//8.
_LANE = (
    "CASE WHEN nb > k THEN "
    "list_sum(list_transform(range(0, (nb - k + 7) // 8), j -> "
    "(('0x' || substr(hx, 2*(k + 8*j) + 1, 2))::UBIGINT::BIGINT) "
    f"* ({_POW31_SQL}[(nb - k + 7) // 8 - j]))) % 997 "
    "ELSE 0 END"
)


@register(
    "mm_features",
    oracle=f"""
    WITH d AS (
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                    WHEN doc_id % 3 = 1 THEN 'audio/wav'
                    ELSE 'video/mp4' END AS mime,
               hex(encode(text)) AS hx,
               least(octet_length(encode(text)), 4096) AS nb,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents
    )
    SELECT media_id, mime, n_bytes,
           CASE WHEN hx IS NULL THEN NULL
                ELSE CAST(8 AS INT) END AS dim,
           CASE WHEN hx IS NULL THEN NULL ELSE
           array_to_string(list_transform(range(0, 8), k ->
               CAST({_LANE} AS VARCHAR)), '|') END AS feat_sig
    FROM d
    """,
)
def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode+featurize media payloads (deterministic stub codec —
    the 100 TB plan shape is real: Arrow batches through mapInPandas).
    feat_sig re-integerizes the 8 lane features (k/997 -> k) so the
    oracle checks the decoded VALUES byte-for-byte."""
    docs = load_table(spark, sf_dir, "documents")
    media = M.attach_media(docs)
    out = M.extract_features(media)
    # null payload -> null feature: dim/feat_sig stay null (size()
    # would yield -1 and concat_ws '' — both would fabricate a value
    # for media that never decoded)
    return out.select(
        "media_id",
        "mime",
        "n_bytes",
        F.when(
            F.col("feature").isNotNull(), F.size("feature")
        ).alias("dim"),
        F.when(
            F.col("feature").isNotNull(),
            F.concat_ws(
                "|",
                F.transform(
                    F.col("feature"),
                    lambda x: F.round(x * 997).cast("long").cast("string"),
                ),
            ),
        ).alias("feat_sig"),
    )


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


@register(
    "mm_resize",
    oracle="""
    WITH d AS (
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                    WHEN doc_id % 3 = 1 THEN 'audio/wav'
                    ELSE 'video/mp4' END AS mime,
               hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n,
               n_chars % 640 AS w, n_chars % 480 AS h,
               greatest(n_chars % 640, n_chars % 480, 1) AS mx
        FROM documents
    ),
    r AS (
        SELECT media_id, mime, hx, n,
               CASE WHEN mx > 64 THEN (w * 64) // mx ELSE w END AS out_w,
               CASE WHEN mx > 64 THEN (h * 64) // mx ELSE h END AS out_h,
               CASE WHEN mx > 64 THEN (mx + 63) // 64 ELSE 1 END AS stride
        FROM d
    )
    SELECT media_id, mime,
           CAST(out_w AS INT) AS out_w,
           CAST(out_h AS INT) AS out_h,
           CAST((n + stride - 1) // stride AS BIGINT) AS out_n_bytes,
           -- null payload: no bytes to checksum (NULL, not 0 — the
           -- coalesce is for genuinely EMPTY payloads only)
           CASE WHEN hx IS NULL THEN NULL ELSE
           CAST(coalesce(list_sum(list_transform(
                    range(0, (n + stride - 1) // stride),
                    j -> ('0x' || substr(hx, 2*j*stride + 1, 2))
                             ::UBIGINT::BIGINT)), 0) % 9973
                AS BIGINT) END AS checksum
    FROM r
    """,
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/thumbnail media — the remaining codec verb beside
    decode+featurize (#37) and frame-sample (#121).  Geometry
    (aspect-preserving integer dims, byte stride) is codegen column
    algebra computed BEFORE any payload byte moves — a "skip
    already-small media" filter is pushdown-able metadata work —
    and only the byte resample runs in the Arrow mapInPandas stage
    (numpy stride-decimation per batch; a real pipeline installs
    PIL.thumbnail on the same seam via register_codec's pattern).
    The stub resample is deterministic modular arithmetic, so the
    oracle recomputes the resized byte stream's checksum from
    hex(encode(text)) — a full value check of the batch plumbing,
    same contract as mm_features."""
    docs = load_table(spark, sf_dir, "documents")
    media = M.attach_media(docs)
    return M.resize_media(media, max_dim=64)
