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


@register(
    "ann_lsh_buckets",
    oracle=None,  # hash->bucket layout is engine-checked via tests +
    # rows-only here: the recall-vs-brute-force test lives in
    # tests/test_similarity.py (oracle SQL for 8 hyperplane folds is
    # expressible but adds nothing the recall check doesn't cover)
)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucket assignment (the 100 TB ANN path: search
    only within matching buckets, multi-probe for recall)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = SIM.lsh_buckets(emb, n_planes=8, dim=64)
    return out.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_vectors"))
