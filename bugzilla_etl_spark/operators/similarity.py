"""Similarity search over embedding columns.

* brute_force_topk — exact cosine top-k: bounded query set broadcast
  against the corpus; ranking on ROUNDED cosine with id tiebreak so
  results are deterministic and engine-portable.
* lsh_buckets — random-hyperplane sign bucketing, the scale path:
  pseudo-planes derived from the portable hash family (no RNG state
  to ship; every executor derives identical planes).
* label blocking (IVF-style) — the `label` column acts as a coarse
  quantizer: near-dup search only within a cell.

All dot products are double-precision sequential folds over the
array (F.aggregate/zip_with) — JVM codegen, no UDF, no explode of
the vector dimension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bugzilla_etl_spark.functions.hashing import hash64


def _dvec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.greatest(norm(a) * norm(b), F.lit(1e-12))


def pair_cosine(va: Column, vb: Column, na: Column, nb: Column) -> Column:
    """Cosine for the pair phase with PRE-JOIN norms: compute each
    row's norm once below the join (attribute references across a
    join boundary are not re-inlined by CollapseProject), so per
    candidate pair only the dot product remains.  Folding norm() into
    the pair expression instead re-evaluates two O(d) norms per
    candidate."""
    return dot(va, vb) / F.greatest(na * nb, F.lit(1e-12))


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    The query side is small and broadcast; the corpus is scanned once.
    Rank key = (cosine rounded to 4, candidate id): rounding absorbs
    float summation ulps so rankings are stable across engines."""
    import numpy as np
    import pandas as pd

    qrows = sorted(
        queries.select(
            F.col(id_col).alias("qid"), _dvec(vec_col).alias("qv")
        ).collect(),
        key=lambda r: r.qid,
    )
    if not qrows:
        # empty query batch (the no-new-data incremental run):
        # empty result, same schema — never a driver-side stack error
        return emb.sparkSession.createDataFrame(
            [], schema="query_id long, cand_id long, cos double, rank int"
        )
    qids = np.array([r.qid for r in qrows], dtype=np.int64)
    Q = np.stack([np.asarray(r.qv, dtype=np.float64) for r in qrows])
    qn = np.sqrt((Q * Q).sum(axis=1))

    t = emb.select(F.col(id_col).alias("cand_id"), _dvec(vec_col).alias("v"))

    # One corpus-batch x query-set matmul per Arrow batch with a
    # per-batch per-query top-k prune: the ranking shuffle carries
    # <= |queries| x k rows per batch, and the scan does one BLAS
    # kernel instead of |corpus| x |queries| interpreted HOF dots
    # (the crossJoin form: measured ~2x slower at sf0.1, linearly
    # worse with corpus size).
    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            vn = np.sqrt((V * V).sum(axis=1))
            cand = pdf["cand_id"].to_numpy(dtype=np.int64)
            S = np.round(
                (V @ Q.T) / np.maximum(np.outer(vn, qn), 1e-12), 4
            )
            out_q, out_c, out_s = [], [], []
            for qi in range(len(qids)):
                mask = cand != qids[qi]
                ids, cos = cand[mask], S[mask, qi]
                order = np.lexsort((ids, -cos))[:k]
                out_q.append(np.full(len(order), qids[qi]))
                out_c.append(ids[order])
                out_s.append(cos[order])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "cand_id": np.concatenate(out_c),
                    "cos": np.concatenate(out_s),
                }
            )

    pruned = t.mapInPandas(
        score, schema="query_id long, cand_id long, cos double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("cand_id").asc()
    )
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank")
    )


def label_blocked_neardup(
    emb: DataFrame,
    threshold: float = 0.35,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    max_cell: int | None = None,
) -> DataFrame:
    """IVF-style near-dup pairs: candidates only within the same coarse
    cell (label); per-cell n² stays bounded by cell size.

    ``max_cell`` is the cell-skew guard.  A skewed cell (one label
    holding 1e6 vectors) would land its entire n² on one task.  Cells
    larger than max_cell are split into nsplit = ceil(size/max_cell)
    sub-cells by a deterministic salt of the vector id; every
    unordered pair is still generated exactly once by joining the
    sub-cell pairs (i ≤ j): a row with salt s serves as the A side of
    buckets (s, j≥s) and the B side of buckets (i≤s, s).  Join-key
    granularity becomes (cell, i, j), so no task sees more than
    ~max_cell² candidates regardless of label skew; total work is the
    same n² the exact semantics require — the guard redistributes it.
    Results are identical to the unguarded plan (oracle unchanged);
    replication factor per row is nsplit+1, bounded and chosen by the
    cell's own size via a broadcast 1-row-per-cell dim."""
    import numpy as np
    import pandas as pd

    t = emb.select(
        F.col(id_col).alias("vid"), F.col(label_col).alias("cell"),
        _dvec(vec_col).alias("v"),
    )

    if max_cell is None:
        s = t.withColumn("nsplit", F.lit(1)).withColumn("s", F.lit(0))
    else:
        cells = t.groupBy("cell").agg(
            F.ceil(F.count(F.lit(1)) / max_cell).cast("int").alias("nsplit")
        )
        s = t.join(F.broadcast(cells), on="cell").withColumn(
            "s", F.pmod(hash64(F.col("vid").cast("string")),
                        F.col("nsplit")).cast("int")
        )
    a = s.select(
        "cell", F.col("s").alias("i"),
        F.explode(F.sequence(F.col("s"), F.col("nsplit") - 1)).alias("j"),
        F.lit(0).alias("side"), "vid", "v",
    )
    b = s.select(
        "cell", F.explode(F.sequence(F.lit(0), F.col("s"))).alias("i"),
        F.col("s").alias("j"),
        F.lit(1).alias("side"), "vid", "v",
    )
    u = a.unionByName(b)

    # One gram matmul per (cell, i, j) bucket: the n² happens inside
    # numpy over <= ~max_cell rows per side, and only SURVIVING pairs
    # leave the task — the candidate product is never materialized as
    # rows (the join+interpreted-fold form shipped every candidate
    # through a per-pair HOF dot: ~3x slower at sf0.1 and pure
    # overhead at corpus scale).
    def score(key, pdf):
        i, j = int(key[1]), int(key[2])
        A = pdf[pdf["side"] == 0]
        B = pdf[pdf["side"] == 1]
        if not len(A) or not len(B):
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype="int64"),
                    "id_b": pd.Series(dtype="int64"),
                    "cos": pd.Series(dtype="float64"),
                }
            )
        VA = np.stack([np.asarray(v, dtype=np.float64) for v in A["v"]])
        VB = np.stack([np.asarray(v, dtype=np.float64) for v in B["v"]])
        na = np.sqrt((VA * VA).sum(axis=1))
        nb = np.sqrt((VB * VB).sum(axis=1))
        S = np.round(
            (VA @ VB.T) / np.maximum(np.outer(na, nb), 1e-12), 4
        )
        avid = A["vid"].to_numpy(dtype=np.int64)
        bvid = B["vid"].to_numpy(dtype=np.int64)
        mask = S >= threshold
        if i == j:
            mask &= avid[:, None] < bvid[None, :]
        r, c = np.nonzero(mask)
        return pd.DataFrame(
            {
                "id_a": np.minimum(avid[r], bvid[c]),
                "id_b": np.maximum(avid[r], bvid[c]),
                "cos": S[r, c],
            }
        )

    return u.groupBy("cell", "i", "j").applyInPandas(
        score, schema="id_a long, id_b long, cos double"
    )


def hyperplane_bit(vec: Column, plane: int, dim: int) -> Column:
    """Sign bit of <vec, pseudo-plane p>: plane component d is derived
    from hash64('p:d') mapped to [-0.5, 0.5) — deterministic on every
    executor and every engine, no RNG broadcast needed."""
    comp = lambda d: (  # noqa: E731
        (hash64(F.concat(F.lit(f"{plane}:"), d.cast("string"))) % 1000)
        .cast("double") / 1000.0 - 0.5
    )
    proj = F.aggregate(
        F.zip_with(
            vec,
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda x, d: x * comp(d),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # round before the sign so a projection within an ulp of zero
    # can't flip the bit between this sequential fold, the BLAS
    # matmul in lsh_buckets, and the DuckDB oracle (all three round
    # to 9 decimals — well above ulp noise, well below plane scale)
    return F.when(F.round(proj, 9) >= 0, F.lit(1)).otherwise(F.lit(0))


def lsh_buckets(
    emb: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign each vector its hyperplane-sign bucket (the ANN scale
    path: top-k search then probes only matching/nearby buckets).

    The pseudo-planes are derived ONCE through engine expressions
    (n_planes x dim values — the same md5 arithmetic
    ``hyperplane_bit`` inlines) and the per-vector work is a single
    numpy sign-of-matmul per Arrow batch.  The inline-expression
    form recomputed the md5-derived plane components inside the HOF
    lambda for EVERY vector (no CSE in lambdas: |corpus| x n_planes
    x dim md5 calls) and ran the fold on the interpreted HOF path —
    measured ~4x slower at sf0.1 and growing with the corpus, since
    plane derivation belongs to the INDEX, not the scan."""
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    # plane component (p, d) = (hash64('p:d') % 1000)/1000 - 0.5,
    # computed BY the engine so values match hyperplane_bit (and the
    # DuckDB oracle) bit-for-bit
    prows = spark.range(n_planes * dim).select(
        (F.col("id") / dim).cast("int").alias("p"),
        (F.col("id") % dim).cast("int").alias("d"),
        (
            (
                hash64(
                    F.concat(
                        (F.col("id") / dim).cast("int").cast("string"),
                        F.lit(":"),
                        (F.col("id") % dim).cast("int").cast("string"),
                    )
                )
                % 1000
            ).cast("double")
            / 1000.0
            - 0.5
        ).alias("c"),
    ).collect()
    P = np.zeros((n_planes, dim), dtype=np.float64)
    for r in prows:
        P[r.p, r.d] = r.c
    weights = (1 << np.arange(n_planes - 1, -1, -1)).astype(np.int64)

    t = emb.select(F.col(id_col).alias("vec_id"), _dvec(vec_col).alias("v"))

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            # same 9-decimal pre-sign rounding as hyperplane_bit and
            # the oracle: BLAS sums in a different order than their
            # sequential folds, so an ulp-of-zero projection could
            # otherwise land in a different bucket
            bits = np.round(V @ P.T, 9) >= 0
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "bucket": (bits.astype(np.int64) * weights).sum(axis=1),
                }
            )

    return t.mapInPandas(assign, schema="vec_id long, bucket long")


def ivf_assign(
    emb: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF coarse quantization: map every vector to its nearest
    centroid (max ROUNDED cosine, centroid-id tiebreak — rounding
    absorbs float ulps so the argmax is engine-portable).

    Plan shape: the centroid table is materialized on the driver —
    bounded by k, it IS the IVF index, the same object an index
    server keeps in RAM (cf. tfidf's metadata-cheap ``docs.count()``)
    — and assignment is an Arrow-batched mapInPandas whose body is
    one BLAS matmul per batch.  Zero shuffle of the corpus: at
    100 TB this is a map-only scan.  The earlier pure-expression
    formulation (broadcast array<struct> + transform/aggregate argmax
    fold) was plan-identical but ran on Catalyst's INTERPRETED
    higher-order-function path: measured ~9 µs per cosine vs ~20 ns
    here — a 100x difference that at corpus scale is the whole job.
    """
    import numpy as np
    import pandas as pd

    c = centroids.select(
        F.col(id_col).alias("cid"), _dvec(vec_col).alias("cv")
    ).select("cid", "cv", norm(F.col("cv")).alias("cn"))
    # bounded driver materialization: k rows of dim doubles (the index)
    crows = sorted(c.collect(), key=lambda r: r.cid)
    if not crows:
        return emb.sparkSession.createDataFrame(
            [],
            schema="vid long, cell long, cell_cos double,"
            " v array<double>, vn double",
        )
    cids = np.array([r.cid for r in crows], dtype=np.int64)
    C = np.stack([np.asarray(r.cv, dtype=np.float64) for r in crows])
    cn = np.array([r.cn for r in crows], dtype=np.float64)

    t = emb.select(
        F.col(id_col).alias("vid"), _dvec(vec_col).alias("v")
    ).select("vid", "v", norm(F.col("v")).alias("vn"))

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            vn = pdf["vn"].to_numpy(dtype=np.float64)
            S = np.round(
                (V @ C.T) / np.maximum(np.outer(vn, cn), 1e-12), 4
            )
            best = S.max(axis=1)
            # tie -> smallest centroid id (cids ascending, argmax takes
            # the first maximum)
            idx = S.argmax(axis=1)
            yield pd.DataFrame(
                {
                    "vid": pdf["vid"],
                    "cell": cids[idx],
                    "cell_cos": best,
                    "v": pdf["v"],
                    "vn": pdf["vn"],
                }
            )

    return t.mapInPandas(
        assign,
        schema="vid long, cell long, cell_cos double, "
        "v array<double>, vn double",
    )


def ivf_assign_probes(
    emb: DataFrame,
    centroids: DataFrame,
    nprobe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-``nprobe`` cell assignment — the multi-probe side of IVF
    search.  Same driver-materialized centroid index and map-only
    Arrow pass as ``ivf_assign``, but emits one row per (vector,
    probed cell) with a 1-based ``probe`` rank, ordered by rounded
    cosine (centroid-id tiebreak, engine-portable).  Intended for the
    BOUNDED query side: nprobe multiplies the broadcast row count,
    not the corpus scan."""
    import numpy as np
    import pandas as pd

    c = centroids.select(
        F.col(id_col).alias("cid"), _dvec(vec_col).alias("cv")
    ).select("cid", "cv", norm(F.col("cv")).alias("cn"))
    crows = sorted(c.collect(), key=lambda r: r.cid)
    if not crows:
        return emb.sparkSession.createDataFrame(
            [],
            schema="vid long, cell long, cell_cos double, probe int,"
            " v array<double>, vn double",
        )
    cids = np.array([r.cid for r in crows], dtype=np.int64)
    C = np.stack([np.asarray(r.cv, dtype=np.float64) for r in crows])
    cn = np.array([r.cn for r in crows], dtype=np.float64)
    npb = min(nprobe, len(cids))

    t = emb.select(
        F.col(id_col).alias("vid"), _dvec(vec_col).alias("v")
    ).select("vid", "v", norm(F.col("v")).alias("vn"))

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            vn = pdf["vn"].to_numpy(dtype=np.float64)
            S = np.round(
                (V @ C.T) / np.maximum(np.outer(vn, cn), 1e-12), 4
            )
            rows = []
            for i in range(len(pdf)):
                # order by (-cos, cid): lexsort sorts by the LAST key
                # first, so cids breaks cosine ties ascending
                order = np.lexsort((cids, -S[i]))[:npb]
                for p, j in enumerate(order, start=1):
                    rows.append(
                        (
                            pdf["vid"].iloc[i],
                            int(cids[j]),
                            float(S[i, j]),
                            int(p),
                            pdf["v"].iloc[i],
                            float(vn[i]),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["vid", "cell", "cell_cos", "probe", "v", "vn"],
            )

    return t.mapInPandas(
        assign,
        schema="vid long, cell long, cell_cos double, probe int, "
        "v array<double>, vn double",
    )


def ivf_search_topk(
    emb: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF top-k: exact cosine ranking restricted to each query's
    ``nprobe`` nearest cells.  The bounded query set (with its cell
    probes) broadcasts; the corpus side is partitioned by cell, so
    per-task candidate volume is bounded by cell size — the same
    inventory brute_force_topk scans in full.  Recall vs the exact
    baseline is a measured property (see tests and SCALING.md),
    traded for an (n_cells/nprobe)-fold scan reduction; each corpus
    vector lives in exactly one cell, so multi-probe never produces
    duplicate candidate pairs."""
    asg = ivf_assign(emb, centroids, vec_col, id_col)
    # assign the BOUNDED query set directly instead of filtering the
    # full corpus assignment — otherwise the corpus-wide assign pass
    # (the expensive map at 100 TB) executes twice, once per consumer
    q = ivf_assign_probes(queries, centroids, nprobe, vec_col, id_col).select(
        F.col("vid").alias("query_id"),
        F.col("cell").alias("qcell"),
        F.col("v").alias("qv"),
        F.col("vn").alias("qn"),
    )
    scored = (
        asg.join(F.broadcast(q), asg["cell"] == q["qcell"])
        .where(F.col("vid") != F.col("query_id"))
        .withColumn(
            "cos",
            F.round(
                pair_cosine(
                    F.col("qv"), F.col("v"), F.col("qn"), F.col("vn")
                ),
                4,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vid").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("vid").alias("cand_id"), "cos", "rank")
    )


def pq_codebook(
    spark,
    n_sub: int = 8,
    n_codes: int = 16,
    sub_dim: int = 8,
):
    """Deterministic product-quantization codebook: component d of
    centroid (m, c) = (hash64('pq:m:c:d') % 1000) / 1000 - 0.5 — the
    same no-RNG-to-ship construction as the LSH pseudo-planes, so
    every executor AND the DuckDB oracle derive bit-identical
    centroids.  (Real deployments drop in k-means centroids; the
    operator is agnostic to where the codebook came from.)

    Derived through Spark expressions (not Python) so the float
    values are exactly the engine's own md5/conv arithmetic, then
    materialized driver-side: n_sub x n_codes x sub_dim doubles is
    the whole index — kilobytes.

    Returns a numpy array of shape (n_sub, n_codes, sub_dim).
    """
    import numpy as np

    mk = spark.range(n_sub * n_codes).select(
        (F.col("id") / n_codes).cast("int").alias("m"),
        (F.col("id") % n_codes).cast("int").alias("c"),
        F.transform(
            F.sequence(F.lit(0), F.lit(sub_dim - 1)),
            lambda d: (
                hash64(
                    F.concat(
                        F.lit("pq:"),
                        (F.col("id") / n_codes).cast("int").cast("string"),
                        F.lit(":"),
                        (F.col("id") % n_codes).cast("int").cast("string"),
                        F.lit(":"),
                        d.cast("string"),
                    )
                )
                % 1000
            ).cast("double")
            / 1000.0
            - 0.5,
        ).alias("comp"),
    )
    C = np.zeros((n_sub, n_codes, sub_dim), dtype=np.float64)
    for r in mk.collect():
        C[r.m, r.c] = r.comp
    return C


def _pq_subdists(V, C):
    """Scaled integer sub-distances floor(||v_m - c_mk||^2 * 1e4 + .5)
    for a batch: (n, n_sub, n_codes) int64.  The d-accumulation is a
    SEQUENTIAL loop mirroring the oracle's list_sum fold order, and
    the floor(x*1e4 + 0.5) integerization (not banker's rounding)
    matches DuckDB's floor() exactly — every downstream comparison
    and sum is then integer, i.e. bit-portable."""
    import numpy as np

    n_sub, n_codes, sub_dim = C.shape
    n = V.shape[0]
    out = np.empty((n, n_sub, n_codes), dtype=np.int64)
    for m in range(n_sub):
        Vm = V[:, m * sub_dim : (m + 1) * sub_dim]
        acc = np.zeros((n, n_codes), dtype=np.float64)
        for d in range(sub_dim):
            diff = Vm[:, d, None] - C[m, :, d][None, :]
            acc = acc + diff * diff
        out[:, m, :] = np.floor(acc * 10000.0 + 0.5).astype(np.int64)
    return out


def pq_encode(
    emb: DataFrame,
    C,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Compress each vector to n_sub uint8-sized code indices (its
    nearest codebook entry per subspace, ties to the smallest code).
    This is the 100 TB memory story: 64 float32 dims -> 8 bytes per
    vector, a 32x reduction, with search running in the compressed
    domain.  Map-only (Arrow-batched numpy, one matmul-shaped kernel
    per batch); the output IS the persistable ANN index."""
    import numpy as np
    import pandas as pd

    t = emb.select(
        F.col(id_col).alias("vec_id"), _dvec(vec_col).alias("v")
    )

    def enc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            ds = _pq_subdists(V, C)
            codes = ds.argmin(axis=2).astype(np.int32)  # first-min = smallest code
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "codes": list(codes)}
            )

    return t.mapInPandas(enc, schema="vec_id long, codes array<int>")


def pq_search_topk(
    emb: DataFrame,
    queries: DataFrame,
    C,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: per query,
    a (n_sub x n_codes) integer lookup table of sub-distances; each
    candidate's approximate distance is n_sub table lookups summed —
    no float math in the scan.

    Scale shape: queries are bounded (the LUT set is kilobytes,
    shipped inside the task closure); the corpus pass is map-only
    over the COMPRESSED codes with a per-batch per-query top-k
    prune, so the shuffle into the final exact ranking window
    carries at most n_queries x k rows per batch, never the corpus.

    Output: query_id, cand_id, adist (squared-L2 in 1e-4 units,
    BIGINT), rank — deterministic via (adist, cand_id) ordering.
    """
    import numpy as np
    import pandas as pd

    qrows = sorted(
        queries.select(
            F.col(id_col).alias("qid"), _dvec(vec_col).alias("qv")
        ).collect(),
        key=lambda r: r.qid,
    )
    if not qrows:
        return emb.sparkSession.createDataFrame(
            [], schema="query_id long, cand_id long, adist long, rank int"
        )
    qids = np.array([r.qid for r in qrows], dtype=np.int64)
    Q = np.stack([np.asarray(r.qv, dtype=np.float64) for r in qrows])
    lut = _pq_subdists(Q, C)  # (nq, n_sub, n_codes) int64

    codes = pq_encode(emb, C, vec_col, id_col)

    def search(batches):
        n_sub = lut.shape[1]
        for pdf in batches:
            if not len(pdf):
                continue
            B = np.stack([np.asarray(c, dtype=np.int64) for c in pdf["codes"]])
            cand = pdf["vec_id"].to_numpy(dtype=np.int64)
            # D[i, q] = sum_m lut[q, m, B[i, m]] — pure int gathers
            D = np.zeros((len(cand), len(qids)), dtype=np.int64)
            for m in range(n_sub):
                D += lut[:, m, B[:, m]].T
            out_q, out_c, out_d = [], [], []
            for qi in range(len(qids)):
                mask = cand != qids[qi]
                ids, dist = cand[mask], D[mask, qi]
                order = np.lexsort((ids, dist))[:k]  # (adist, cand_id)
                out_q.append(np.full(len(order), qids[qi]))
                out_c.append(ids[order])
                out_d.append(dist[order])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "cand_id": np.concatenate(out_c),
                    "adist": np.concatenate(out_d),
                }
            )

    pruned = codes.mapInPandas(
        search, schema="query_id long, cand_id long, adist long"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("cand_id").asc()
    )
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "adist", "rank")
    )


def ivf_pq_search_topk(
    emb: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    C,
    k: int = 3,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF + PQ combined — the production ANN index shape (FAISS
    IVFPQ): coarse quantization prunes the scan to the query's
    ``nprobe`` nearest cells, and scoring inside those cells runs in
    the COMPRESSED domain (per-query integer LUT, n_sub gathers per
    candidate — no float math, no raw vectors).

    Composition of the two audited halves: cell assignment is
    ``ivf_assign``'s rounded-cosine argmax; distances are
    ``_pq_subdists``'s integer-scaled sub-distances.  Scale shape:
    ONE map-only corpus pass chained after the (also map-only)
    assignment pass — the corpus never shuffles, candidates never
    materialize; each Arrow batch PQ-encodes only the rows lying in
    the union of all queries' probed cells and scores only the
    (query, probed-cell) matches, pruning to per-batch top-k, so
    the final exact ranking window sees at most batches x queries x
    k rows.  The query side is bounded: probed cells via
    ``ivf_assign_probes`` (nprobe rows per query) and the LUT set
    (n_sub x n_codes ints per query) both ride the task closure.

    Output: (query_id, cand_id, adist, rank) — adist in 1e-4 squared
    L2 units (BIGINT), deterministic (adist, cand_id) ranking.
    """
    import numpy as np
    import pandas as pd

    qrows = sorted(
        queries.select(
            F.col(id_col).alias("qid"), _dvec(vec_col).alias("qv")
        ).collect(),
        key=lambda r: r.qid,
    )
    empty_schema = "query_id long, cand_id long, adist long, rank int"
    if not qrows:
        return emb.sparkSession.createDataFrame([], schema=empty_schema)
    qids = np.array([r.qid for r in qrows], dtype=np.int64)
    Q = np.stack([np.asarray(r.qv, dtype=np.float64) for r in qrows])
    lut = _pq_subdists(Q, C)  # (nq, n_sub, n_codes) int64

    probes = {int(q): set() for q in qids}
    for r in ivf_assign_probes(
        queries, centroids, nprobe=nprobe, vec_col=vec_col, id_col=id_col
    ).collect():  # bounded: nq x nprobe rows
        if int(r.vid) in probes:
            probes[int(r.vid)].add(int(r.cell))
    if not any(probes.values()):
        return emb.sparkSession.createDataFrame([], schema=empty_schema)

    assigned = ivf_assign(emb, centroids, vec_col=vec_col, id_col=id_col)

    probed_union = sorted(set().union(*probes.values()))

    def search(batches):
        n_sub = lut.shape[1]
        for pdf in batches:
            if not len(pdf):
                continue
            cand = pdf["vid"].to_numpy(dtype=np.int64)
            cell = pdf["cell"].to_numpy(dtype=np.int64)
            # Pre-mask to the union of all queries' probed cells
            # BEFORE PQ-encoding: rows in cells no query probes are
            # never encoded (at low nprobe/n_cells ratios that is
            # most of the batch, and encoding is the batch's one
            # O(rows x n_sub x n_codes) kernel).
            keep = np.isin(cell, probed_union)
            if not keep.any():
                continue
            cand, cell = cand[keep], cell[keep]
            V = np.stack(
                [
                    np.asarray(v, dtype=np.float64)
                    for v in pdf["v"][keep]
                ]
            )
            codes = _pq_subdists(V, C).argmin(axis=2)  # first-min code
            out_q, out_c, out_d = [], [], []
            for qi in range(len(qids)):
                pcells = probes[int(qids[qi])]
                if not pcells:
                    continue
                mask = np.isin(cell, list(pcells)) & (cand != qids[qi])
                if not mask.any():
                    continue
                ids = cand[mask]
                B = codes[mask]
                d = np.zeros(len(ids), dtype=np.int64)
                for m in range(n_sub):
                    d += lut[qi, m, B[:, m]]
                order = np.lexsort((ids, d))[:k]  # (adist, cand_id)
                out_q.append(np.full(len(order), qids[qi]))
                out_c.append(ids[order])
                out_d.append(d[order])
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "cand_id": np.concatenate(out_c),
                    "adist": np.concatenate(out_d),
                }
            )

    pruned = assigned.mapInPandas(
        search, schema="query_id long, cand_id long, adist long"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("cand_id").asc()
    )
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "adist", "rank")
    )
