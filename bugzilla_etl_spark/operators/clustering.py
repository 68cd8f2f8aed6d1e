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
    if not seeds:
        # empty corpus => empty model => empty labeling (the
        # no-new-data incremental run must not stack-error)
        return emb.sparkSession.createDataFrame(
            [], schema="vec_id long, cluster long, d2s long"
        )
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


def embedding_outliers(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    z_cut: float = 2.0,
) -> DataFrame:
    """Centroid-distance outlier flagging per label group — the
    embedding-space quality filter (mislabeled / off-manifold vectors
    sit far from their group centroid; z-score > ``z_cut`` flags
    them).

    Exactness contract (same family as kmeans_lloyd): vectors
    quantize to the 1e-4 grid, per-label centroids are EXACT integer
    (n, per-dim sum) models, and each vector's distance is computed
    from the exact integer numerator  Σ_d (iv_d·n − s_d)²  — so
    ``dist`` is bit-identical on any engine (sqrt and the final
    division are single correctly-rounded IEEE ops).  Only the
    mean/std fold over distances is float, absorbed by the rounded
    z.  Integer bound: |iv|·n ≲ 3e4·n must stay under 3e9 (n ≤ 1e5
    rows per label) for the squared sum of 64 dims to fit int64 —
    document-scale embedding groups beyond that need a second
    quantization stage.

    Scale shape: one map-only Arrow pass emits ≤ |labels| partial-sum
    rows per batch (the bounded model fold — no per-dim explode, no
    corpus shuffle), one map-only scoring pass against the broadcast
    model, then a |labels|-row stats dim joined back broadcast."""
    import numpy as np
    import pandas as pd

    # null label = no cohort: centroid distance is undefined, so the
    # vector drops out (the same rows an equi-join on label would
    # drop — null never matches a group key on either engine)
    t = emb.where(F.col(label_col).isNotNull()).select(
        F.col(id_col).alias("vid"),
        F.col(label_col).alias("lbl"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(
                x.cast("double") * SCALE + F.lit(0.5)
            ).cast("long"),
        ).alias("iv"),
    )

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            for lbl, grp in pdf.groupby("lbl"):
                V = np.stack(
                    [np.asarray(v, dtype=np.int64) for v in grp["iv"]]
                )
                yield pd.DataFrame(
                    {
                        "lbl": [int(lbl)],
                        "n": [int(V.shape[0])],
                        "s": [V.sum(axis=0)],
                    }
                )

    parts = t.mapInPandas(
        partials, schema="lbl long, n long, s array<long>"
    ).collect()  # bounded: <= |labels| rows per Arrow batch
    model: dict[int, tuple] = {}
    for r in parts:
        n0, s0 = model.get(r.lbl, (0, None))
        s = np.asarray(r.s, dtype=np.int64)
        model[r.lbl] = (n0 + r.n, s if s0 is None else s0 + s)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vids, lbls, dists = [], [], []
            for vid, lbl, iv in zip(pdf["vid"], pdf["lbl"], pdf["iv"]):
                n, s = model[lbl]
                d = np.asarray(iv, dtype=np.int64) * n - s
                num = int((d * d).sum())
                vids.append(vid)
                lbls.append(lbl)
                dists.append(float(np.sqrt(num)) / (n * float(SCALE)))
            yield pd.DataFrame(
                {"vec_id": pd.Series(vids, dtype="int64"),
                 "label": pd.Series(lbls, dtype="int64"),
                 "dist": pd.Series(dists, dtype="float64")}
            )

    from bugzilla_etl_spark.tmpdirs import pin

    # TWO consumers (the stats aggregate and the final join) would
    # each re-run scan -> quantize -> Arrow distance pass — pin the
    # skinny scored frame for the invocation (nonce-guarded, released
    # via the cleanup registry)
    scored = pin(
        t.mapInPandas(score, schema="vec_id long, label long, dist double")
    )
    stats = scored.groupBy("label").agg(
        F.avg("dist").alias("_m"),
        F.stddev_samp("dist").alias("_sd"),
    )
    z = F.round((F.col("dist") - F.col("_m")) / F.col("_sd"), 4)
    return (
        scored.join(F.broadcast(stats), on="label")
        .select(
            "vec_id",
            "label",
            F.round("dist", 6).alias("dist"),
            z.alias("z"),
            F.when(z > z_cut, 1).otherwise(0).alias("is_outlier"),
        )
    )
