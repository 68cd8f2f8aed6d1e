"""Similarity-search queries (SURVEY §2 #31-#32) over ``embeddings``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bugzilla_etl_spark.operators import similarity as SIM
from bugzilla_etl_spark.plans.catalog import register
from bugzilla_etl_spark.sources import load_table

DUCK_COS = (
    "round(list_dot_product(q.v, c.v) / greatest("
    "sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)),"
    " 1e-12), 4)"
)


@register(
    "ann_topk",
    oracle=f"""
    WITH t AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v FROM t WHERE vec_id % 50 = 0),
    scored AS (
        SELECT q.query_id, c.vec_id AS cand_id, {DUCK_COS} AS cos
        FROM q JOIN t c ON q.query_id <> c.vec_id
    )
    SELECT query_id, cand_id, cos, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, cand_id ASC) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
)
def ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for every 50th vector as query —
    the correctness baseline every ANN variant is measured against."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    return SIM.brute_force_topk(emb, queries, k=5)


def _duck_plane(p: int) -> str:
    """DuckDB expression for pseudo-plane p (mirrors
    similarity.hyperplane_bit's hash-derived components)."""
    from bugzilla_etl_spark.functions.hashing import duckdb_hash64

    h = duckdb_hash64(f"('{p}:' || CAST(d AS VARCHAR))")
    return f"list_transform(range(0,64), d -> (({h} % 1000) / 1000.0 - 0.5))"


# round(_, 9) before the sign on BOTH sides (see lsh_buckets /
# hyperplane_bit): DuckDB folds the dot product sequentially while
# Spark's path is a BLAS matmul, so without the round an
# ulp-of-zero projection could bucket differently per engine.
_DUCK_BUCKET = " + ".join(
    f"(CASE WHEN round(list_dot_product(v, {_duck_plane(p)}), 9) >= 0 "
    f"THEN {1 << (7 - p)} ELSE 0 END)"
    for p in range(8)
)


@register(
    "ann_lsh_buckets",
    oracle=f"""
    WITH t AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT bucket, count(*) AS n_vectors FROM (
        SELECT ({_DUCK_BUCKET})::BIGINT AS bucket FROM t
    ) GROUP BY bucket
    """,
)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucket assignment (the 100 TB ANN path: search
    only within matching buckets, multi-probe for recall).  The
    pseudo-planes derive from the portable hash family, so the DuckDB
    oracle recomputes the exact same buckets (a sign flip would need
    |projection| within float ulps of zero)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = SIM.lsh_buckets(emb, n_planes=8, dim=64)
    return out.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_vectors"))


def _duck_pq_centroid() -> str:
    """DuckDB expression for PQ centroid (m, k) — mirrors
    similarity.pq_codebook's hash-derived components bit-for-bit."""
    from bugzilla_etl_spark.functions.hashing import duckdb_hash64

    h = duckdb_hash64(
        "('pq:' || CAST(m AS VARCHAR) || ':' || CAST(k AS VARCHAR)"
        " || ':' || CAST(d AS VARCHAR))"
    )
    return f"list_transform(range(0, 8), d -> (({h} % 1000) / 1000.0 - 0.5))"


@register(
    "ann_pq",
    oracle=f"""
    WITH t AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cb AS (
        SELECT m, k, {_duck_pq_centroid()} AS c
        FROM range(0, 8) tm(m) CROSS JOIN range(0, 16) tk(k)
    ),
    subd AS (
        SELECT t.vec_id, cb.m, cb.k,
               CAST(floor(list_sum(list_transform(range(0, 8), d ->
                   (v[cb.m*8 + d + 1] - c[d + 1]) ^ 2)) * 10000 + 0.5)
                   AS BIGINT) AS ds
        FROM t CROSS JOIN cb
    ),
    codes AS (
        SELECT vec_id, m, k AS code FROM (
            SELECT vec_id, m, k,
                   row_number() OVER (PARTITION BY vec_id, m
                                      ORDER BY ds ASC, k ASC) AS rn
            FROM subd) WHERE rn = 1
    ),
    adc AS (
        SELECT s.vec_id AS query_id, c.vec_id AS cand_id,
               CAST(sum(s.ds) AS BIGINT) AS adist
        FROM codes c
        JOIN subd s ON s.m = c.m AND s.k = c.code
        WHERE s.vec_id % 50 = 0 AND c.vec_id <> s.vec_id
        GROUP BY 1, 2
    )
    SELECT query_id, cand_id, adist, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                       ORDER BY adist ASC, cand_id ASC) AS INT) AS rank
        FROM adc) WHERE rank <= 3
    """,
)
def ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: 64-dim float vectors compressed to 8
    one-byte codes (32x), asymmetric-distance top-3 for every 50th
    vector as query.  The codebook is hash-derived (deterministic on
    every engine — k-means would slot in unchanged); ALL distances
    are integer-scaled (floor(d^2 * 1e4 + 0.5)) so encode argmins and
    ADC sums compare bit-identically across engines.  Completes the
    ANN ladder: ann_topk (exact) / ann_ivf (cell-pruned exact) /
    ann_lsh_buckets (bucketed) / ann_pq (compressed-domain).
    reference scope: training-data pipeline extension."""
    emb = load_table(spark, sf_dir, "embeddings")
    C = SIM.pq_codebook(spark, n_sub=8, n_codes=16, sub_dim=8)
    queries = emb.where(F.col("vec_id") % 50 == 0)
    return SIM.pq_search_topk(emb, queries, C, k=3)


# the rounded-cosine portability contract is ONE definition —
# ann_ivf / ann_ivf_nprobe (queries_pipeline) and ann_ivf_pq all
# verify the same Spark-side assignment kernel
from bugzilla_etl_spark.plans.queries_pipeline import (  # noqa: E402
    _DUCK_VCOS as _VCOS,
)


@register(
    "ann_ivf_pq",
    oracle=f"""
    WITH t AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nr FROM t),
    c AS (SELECT vec_id AS cid, v, nr FROM n WHERE vec_id % 25 = 0),
    scored AS (
        SELECT n.vec_id, c.cid, {_VCOS.format(a='n', b='c')} AS cos
        FROM n CROSS JOIN c
    ), asg AS (
        SELECT vec_id, cid AS cell FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY cos DESC, cid ASC) AS rn
            FROM scored
        ) WHERE rn = 1
    ), qp AS (
        SELECT vec_id, cid AS cell FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY cos DESC, cid ASC) AS rn
            FROM scored WHERE vec_id % 50 = 0
        ) WHERE rn <= 2
    ),
    cb AS (
        SELECT m, k, {_duck_pq_centroid()} AS c
        FROM range(0, 8) tm(m) CROSS JOIN range(0, 16) tk(k)
    ),
    subd AS (
        SELECT t.vec_id, cb.m, cb.k,
               CAST(floor(list_sum(list_transform(range(0, 8), d ->
                   (v[cb.m*8 + d + 1] - c[d + 1]) ^ 2)) * 10000 + 0.5)
                   AS BIGINT) AS ds
        FROM t CROSS JOIN cb
    ),
    codes AS (
        SELECT vec_id, m, k AS code FROM (
            SELECT vec_id, m, k,
                   row_number() OVER (PARTITION BY vec_id, m
                                      ORDER BY ds ASC, k ASC) AS rn
            FROM subd) WHERE rn = 1
    ),
    adc AS (
        SELECT q.vec_id AS query_id, a.vec_id AS cand_id,
               CAST(sum(s.ds) AS BIGINT) AS adist
        FROM qp q
        JOIN asg a ON a.cell = q.cell AND a.vec_id <> q.vec_id
        JOIN codes cd ON cd.vec_id = a.vec_id
        JOIN subd s ON s.vec_id = q.vec_id AND s.m = cd.m
                   AND s.k = cd.code
        GROUP BY 1, 2
    )
    SELECT query_id, cand_id, adist, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                       ORDER BY adist ASC, cand_id ASC) AS INT) AS rank
        FROM adc) WHERE rank <= 3
    """,
)
def ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ combined (the FAISS-IVFPQ production shape): coarse
    quantization prunes each query's scan to its 2 nearest cells
    (ann_ivf_nprobe's assignment), scoring inside the cells runs in
    the compressed domain (ann_pq's integer LUT / ADC arithmetic).
    Completes the ANN ladder's top rung: exact -> cell-pruned exact
    -> bucketed -> compressed -> cell-pruned compressed.  One
    map-only corpus pass (assignment chained into encode+score), the
    corpus never shuffles; see operators.similarity.
    ivf_pq_search_topk.  reference scope: training-data pipeline
    extension."""
    emb = load_table(spark, sf_dir, "embeddings")
    C = SIM.pq_codebook(spark, n_sub=8, n_codes=16, sub_dim=8)
    cents = emb.where(F.col("vec_id") % 25 == 0)
    queries = emb.where(F.col("vec_id") % 50 == 0)
    return SIM.ivf_pq_search_topk(emb, cents, queries, C, k=3, nprobe=2)
