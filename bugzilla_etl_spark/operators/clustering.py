"""Embedding clustering — Lloyd's k-means, Spark-first.

The corpus-side work per iteration is ONE map-only Arrow pass: the
current centroid table (k x dim — the model, driver-materialized
exactly like the IVF index in similarity.py) is closed over by a
mapInPandas kernel that assigns each batch by BLAS matmul and emits
per-batch PARTIAL sums per cluster (k rows per batch, not per
vector).  The driver folds the bounded partials into new centroids.
n_iter iterations + the final labeling = n_iter+1 linear scans, zero
corpus shuffles — the textbook scalable k-means shape (cf. Spark
MLlib's KMeans, which does the same treeAggregate of partials).

Engine-portable determinism (what makes an ITERATIVE float algorithm
oracle-checkable): vectors quantize once to integers
(floor(x*1e4+.5) — the ann_pq trick, no rounding-mode dependence);
centroid means are exact-integer sums divided once (IEEE division is
correctly rounded, so both engines get bit-identical centroids);
squared distances round to a 1e4 grid before the argmin
(summation-order ulps ~1e-6 against a 1e4 grid: flip odds ~1e-10),
ties break on the smaller cluster id.  Clusters keep the id of their
SEED vector; a cluster that loses all members drops out, identically
on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10_000


def _quantized(emb: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """(vid, iv): vector quantized to integers on the 1e-4 grid."""
    return emb.select(
        F.col(id_col).alias("vid"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(
                x.cast("double") * SCALE + F.lit(0.5)
            ).cast("long"),
        ).alias("iv"),
    )


def kmeans_lloyd(
    emb: DataFrame,
    seed_every: int = 25,
    n_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_k: int = 4096,
) -> DataFrame:
    """Run ``n_iter`` Lloyd iterations from deterministic seeds (every
    ``seed_every``-th vector with id below ``seed_every * max_k``) and
    return the final labeling: (vec_id, cluster, d2s) with d2s =
    squared distance in scaled space, rounded to the 1e4 grid.

    ``max_k`` bounds the MODEL, not the data: without it k = n/
    seed_every grows linearly with the corpus and the driver-held
    centroid table with it.  Capped, the model is ≤ max_k × dim
    float64s (4096 × 64 ≈ 2 MB) no matter how large the corpus — the
    driver-memory contract every other collect() in this package
    already honors.  The cap is an id bound (vid < seed_every*max_k),
    not a LIMIT, so it is deterministic and oracle-expressible."""
    import numpy as np
    import pandas as pd

    t = _quantized(emb, vec_col, id_col)
    seeds = sorted(
        (r.vid, r.iv)
        for r in t.where(
            (F.col("vid") % seed_every == 0)
            & (F.col("vid") < seed_every * max_k)
        ).collect()
    )  # bounded: the model (≤ max_k rows)
    cids = np.array([s[0] for s in seeds], dtype=np.int64)
    C = np.stack([np.asarray(s[1], dtype=np.float64) for s in seeds])

    def _assign(V: np.ndarray, C: np.ndarray) -> tuple:
        # ||v-c||² = ||v||² - 2v·c + ||c||², argmin over rounded grid
        d2 = (
            (V * V).sum(axis=1)[:, None]
            - 2.0 * (V @ C.T)
            + (C * C).sum(axis=1)[None, :]
        )
        rd2 = np.floor(d2 / SCALE + 0.5).astype(np.int64)
        # argmin by (rd2, cid): cids ascending, argmin takes first min
        idx = rd2.argmin(axis=1)
        return idx, rd2[np.arange(len(V)), idx]

    for _ in range(n_iter - 1):
        cids_b, C_b = cids, C

        def partials(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                V = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf["iv"]]
                )
                idx, _ = _assign(V, C_b)
                for j in np.unique(idx):
                    sel = V[idx == j]
                    yield pd.DataFrame(
                        {
                            "cid": [int(cids_b[j])],
                            "n": [int(sel.shape[0])],
                            "s": [sel.sum(axis=0).astype(np.int64)],
                        }
                    )

        parts = t.mapInPandas(
            partials, schema="cid long, n long, s array<long>"
        ).collect()  # bounded: k rows per Arrow batch
        agg: dict[int, tuple] = {}
        for r in parts:
            n0, s0 = agg.get(r.cid, (0, np.zeros(C.shape[1], np.int64)))
            agg[r.cid] = (n0 + r.n, s0 + np.asarray(r.s, dtype=np.int64))
        cids = np.array(sorted(agg), dtype=np.int64)
        # exact integer sums / count: bit-identical means on any engine
        C = np.stack([agg[c][1] / agg[c][0] for c in cids])

    cids_f, C_f = cids, C

    def label(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["iv"]]
            )
            idx, best = _assign(V, C_f)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vid"],
                    "cluster": cids_f[idx],
                    "d2s": best,
                }
            )

    return t.mapInPandas(label, schema="vec_id long, cluster long, d2s long")
