"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata
struct alongside.  Decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` stages: each batch hands the
Python worker a pandas DataFrame whose binary column is a Series of
``bytes`` — the natural shape for wrapping PIL/ffmpeg/torchaudio.

The codec libraries are NOT in this container, so the codec seam is
stubbed: ``register_codec`` installs a real decoder; the default
``deterministic_fake_codec`` derives stable pseudo-features from the
bytes so the Spark-side plumbing (schema, batching, partition
behavior) is fully testable.  The distributed plan is identical
either way — only the per-batch Python body changes.

Scale notes: mapInPandas streams Arrow batches (no per-row pickling);
media rows are large, so upstream ``repartition`` should target
~100-200 MB of payload per partition, and the metadata struct lets
filters (width, duration, mime) push down BEFORE bytes are decoded.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

Codec = Callable[[bytes], list[float]]


import numpy as _np

# 31^k mod 997 lookup — lets the codec's rolling fold vectorize:
# fold(acc*31+b) == Σ b_j·31^(m-1-j) (mod 997), a dot product.
_POW31 = _np.empty(4096, dtype=_np.int64)
_v = 1
for _k in range(4096):
    _POW31[_k] = _v
    _v = (_v * 31) % 997


def deterministic_fake_codec(payload: bytes) -> list[float]:
    """Stable stand-in for a real decoder: 8 pseudo-features folded
    from the byte stream.  Replace via register_codec(real_decode).

    numpy-vectorized (identical values to the sequential fold): a
    per-byte Python loop inside a pandas UDF costs ~100x — vectorize
    codecs batch-wise whenever the real library allows."""
    buf = _np.frombuffer(payload[:4096], dtype=_np.uint8).astype(_np.int64)
    feats = []
    for lane in range(8):
        v = buf[lane::8]
        m = len(v)
        if m == 0:
            feats.append(0.0)
            continue
        # max term 255*996, max sum 512 terms -> ~1.3e8, no overflow
        acc = int((v * _POW31[m - 1 :: -1]).sum() % 997)
        feats.append(acc / 997.0)
    return feats


_codec: Codec = deterministic_fake_codec


def register_codec(codec: Codec) -> None:
    """Install a real decoder (e.g. PIL-based).  Raising
    NotImplementedError from the codec marks unsupported mimes."""
    global _codec
    _codec = codec


def attach_media(docs: DataFrame) -> DataFrame:
    """Derive a media table from documents: payload = utf-8 bytes of
    the text (deterministic fake media), metadata from doc fields.
    Stands in for `spark.read.format('binaryFile')` / a lakehouse
    media table at 100 TB."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
        .alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
        (F.col("n_chars") % 640).cast("int").alias("width"),
        (F.col("n_chars") % 480).cast("int").alias("height"),
        (F.col("n_chars") % 24).cast("int").alias("n_frames"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Decode + featurize via Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # null payload (failed fetch / missing object — routine at
            # 100 TB) decodes to nothing: null n_bytes and features,
            # row preserved so the metadata survives for triage
            feats = [None if p is None else _codec(p)
                     for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pd.array(
                        [None if p is None else len(p)
                         for p in pdf["payload"]],
                        dtype="Int64",
                    ),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("out_w", IntegerType()),
        StructField("out_h", IntegerType()),
        StructField("out_n_bytes", LongType()),
        StructField("checksum", LongType()),
    ]
)


def resize_media(media: DataFrame, max_dim: int = 64) -> DataFrame:
    """Resize stage — the third codec verb beside decode/featurize
    and frame-sample.  Split the way a 100 TB media pipeline must
    be: the GEOMETRY (output dims, byte stride) is pure integer
    column algebra — codegen'd, filterable, pushdown-friendly, so a
    "skip already-small media" predicate never touches payload
    bytes — and only the BYTE RESAMPLE runs in the Arrow
    mapInPandas stage (stub codec: stride-decimate the byte stream,
    numpy-sliced per batch; a real pipeline swaps in PIL.thumbnail
    on the same seam).  Aspect ratio preserved by integer division:
    out = dim * max_dim div max(w, h), stride = ceil(max(w, h) /
    max_dim); media already within max_dim pass through unchanged
    (stride 1)."""

    mx = "greatest(width, height, 1)"
    prepped = media.select(
        "media_id",
        "mime",
        "payload",
        F.expr(
            f"CASE WHEN {mx} > {max_dim}"
            f" THEN CAST((width * {max_dim}) div {mx} AS INT)"
            " ELSE width END"
        ).alias("out_w"),
        F.expr(
            f"CASE WHEN {mx} > {max_dim}"
            f" THEN CAST((height * {max_dim}) div {mx} AS INT)"
            " ELSE height END"
        ).alias("out_h"),
        F.expr(
            f"CASE WHEN {mx} > {max_dim}"
            f" THEN CAST(({mx} + {max_dim} - 1) div {max_dim} AS INT)"
            " ELSE 1 END"
        ).alias("stride"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_out, cks = [], []
            for p, s in zip(pdf["payload"], pdf["stride"]):
                if p is None:
                    # null payload: geometry is still metadata, but
                    # there are no bytes to resample or checksum
                    n_out.append(None)
                    cks.append(None)
                    continue
                buf = _np.frombuffer(p, dtype=_np.uint8)[::s]
                n_out.append(len(buf))
                cks.append(int(buf.astype(_np.int64).sum()) % 9973)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "out_w": pdf["out_w"],
                    "out_h": pdf["out_h"],
                    "out_n_bytes": pd.array(n_out, dtype="Int64"),
                    "checksum": pd.array(cks, dtype="Int64"),
                }
            )

    return prepped.mapInPandas(run, schema=RESIZE_SCHEMA)


def frame_sample(
    media: DataFrame, every_n: int = 4, include_payload: bool = False
) -> DataFrame:
    """Frame-sampling plan: explode frame indices 0..n_frames-1 step
    every_n WITHOUT decoding — pure column expressions; the decode of
    selected frames happens in extract_features downstream.

    ``include_payload=False`` by default: exploding with the payload
    column duplicates the media bytes once PER FRAME through the rest
    of the plan — at scale, select frames first and join the payload
    back right before the decode stage (one copy per decoded frame
    batch, not per plan edge).  Catalyst prunes the column when
    unused, but the API shouldn't invite the copy."""
    idx = F.sequence(
        F.lit(0),
        F.greatest(F.col("n_frames") - 1, F.lit(0)),
        F.lit(every_n),
    )
    cols = ["media_id", "mime"]
    out = media.where(F.col("mime").startswith("video/")).select(
        *cols,
        F.explode(idx).alias("frame_idx"),
        *(["payload"] if include_payload else []),
    )
    return out
