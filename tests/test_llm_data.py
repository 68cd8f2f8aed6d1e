"""Semantics tests for the dedup / similarity / multimodal blocks —
properties the oracle-parity gate can't express (recall, determinism
across runs, stub-codec plumbing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bugzilla_etl_spark.operators import dedup as D
from bugzilla_etl_spark.operators import multimodal as M
from bugzilla_etl_spark.operators import similarity as SIM
from bugzilla_etl_spark.sources import load_table


def test_minhash_lsh_finds_planted_neardups(spark, sf_dir):
    """LSH candidates must recover every pair the exact (blocked)
    Jaccard pass finds at the same threshold — at this corpus size the
    planted dups are token-identical prefixes, squarely inside LSH's
    high-probability region."""
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.doc_a, r.doc_b)
        for r in D.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in D.minhash_lsh_pairs(docs, threshold=0.8).collect()
    }
    assert exact, "corpus should contain planted near-dups"
    missed = exact - lsh
    assert not missed, f"LSH missed planted near-dups: {missed}"


def test_simhash_deterministic_across_runs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = dict(D.simhash_fingerprints(docs).collect())
    b = dict(D.simhash_fingerprints(docs).collect())
    assert a == b


def test_simhash_pairs_hamming_bound(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    for r in D.simhash_pairs(docs, max_hamming=6, n_bands=8).collect():
        assert 0 <= r.hamming <= 6


def test_simhash_pairs_rejects_unguaranteed_radius():
    """Pigeonhole: n_bands segments only guarantee recall for
    d <= n_bands - 1; a wider radius must be an explicit error, not a
    silent recall hole."""
    import pytest

    with pytest.raises(ValueError, match="pigeonhole"):
        D.simhash_pairs(None, max_hamming=6, n_bands=4)
    with pytest.raises(ValueError, match="pigeonhole"):
        D.simhash_pairs(None, max_hamming=4)  # default 4 bands


def test_simhash_pairs_banding_complete_recall(spark, sf_dir):
    """Every pair within the radius found by brute force must appear
    in the banded output (the guarantee the n_bands check protects)."""
    import itertools

    docs = load_table(spark, sf_dir, "documents").limit(120)
    fps = dict(D.simhash_fingerprints(docs).collect())
    want = {
        (a, b)
        for a, b in itertools.combinations(sorted(fps), 2)
        if bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    got = {
        (r.doc_a, r.doc_b)
        for r in D.simhash_pairs(docs, max_hamming=3, n_bands=4).collect()
    }
    assert want == got


def test_exact_groups_full_hash_width(spark, sf_dir):
    """Exact dedup groups on the untruncated 128-bit md5 (a 60-bit
    key has ~40% collision odds at 1e9 docs)."""
    docs = load_table(spark, sf_dir, "documents").limit(50)
    rows = D.exact_groups(docs).collect()
    assert rows and all(len(r.text_hash) == 32 for r in rows)


def test_lsh_near_zero_projection_bit_is_stable(spark):
    """A projection within an ulp of zero must land on the SAME side
    of the hyperplane on every path (expression fold, BLAS matmul,
    oracle) — the 9-decimal pre-sign round absorbs summation-order
    ulps, so a -1e-13 projection reads as zero -> bit 1 everywhere."""
    from bugzilla_etl_spark.functions.hashing import hash64

    comps = {
        r.d: r.c
        for r in spark.range(64)
        .select(
            F.col("id").alias("d"),
            (
                (
                    hash64(
                        F.concat(F.lit("0:"), F.col("id").cast("string"))
                    )
                    % 1000
                ).cast("double")
                / 1000.0
                - 0.5
            ).alias("c"),
        )
        .collect()
    }
    free_d = next(d for d in range(2, 64) if comps[d] != 0.0)
    # <v, plane0> = c0*c1 - c1*c0 + c_free * (-1e-13/c_free) = -1e-13
    v = [0.0] * 64
    v[0] = comps[1]
    v[1] = -comps[0]
    v[free_d] = -1e-13 / comps[free_d]
    df = spark.createDataFrame([(1, v)], "vec_id long, embedding array<double>")

    bit = df.select(
        SIM.hyperplane_bit(F.col("embedding"), 0, 64).alias("b")
    ).first().b
    assert bit == 1  # -1e-13 rounds to zero -> non-negative side

    bucket = SIM.lsh_buckets(df, n_planes=8, dim=64).first().bucket
    assert (bucket >> 7) & 1 == 1  # numpy path agrees on plane 0's bit


def test_lsh_bucket_recall_against_brute_force(spark, sf_dir):
    """Scale-path sanity: vectors in the same LSH bucket should be
    substantially more similar than random pairs (bucketing carries
    signal), and bucket ids must be deterministic."""
    emb = load_table(spark, sf_dir, "embeddings")
    b1 = dict(SIM.lsh_buckets(emb, n_planes=8, dim=64).collect())
    b2 = dict(SIM.lsh_buckets(emb, n_planes=8, dim=64).collect())
    assert b1 == b2
    assert len(set(b1.values())) > 10  # buckets actually spread

    # mean cosine of same-bucket pairs vs global mean
    t = emb.select("vec_id", "embedding")
    buckets = SIM.lsh_buckets(emb, n_planes=4, dim=64)
    joined = (
        t.join(buckets, on="vec_id")
        .select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"), "bucket")
        .join(
            t.join(buckets, on="vec_id").select(
                F.col("vec_id").alias("b"), F.col("embedding").alias("vb"), "bucket"
            ),
            on="bucket",
        )
        .where(F.col("a") < F.col("b"))
    )
    same = joined.select(
        SIM.cosine(
            F.transform("va", lambda x: x.cast("double")),
            F.transform("vb", lambda x: x.cast("double")),
        ).alias("c")
    ).agg(F.avg("c")).first()[0]

    allp = (
        t.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
        .join(t.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb")))
        .where(F.col("a") < F.col("b"))
        .select(
            SIM.cosine(
                F.transform("va", lambda x: x.cast("double")),
                F.transform("vb", lambda x: x.cast("double")),
            ).alias("c")
        )
        .agg(F.avg("c"))
        .first()[0]
    )
    assert same > allp + 0.02, (same, allp)


def test_multimodal_feature_plumbing(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = M.attach_media(docs)
    feats = M.extract_features(media)
    rows = feats.collect()
    assert len(rows) == docs.count()
    for r in rows[:20]:
        assert len(r.feature) == 8
        assert all(0.0 <= f <= 1.0 for f in r.feature)
        assert r.n_bytes > 0
    # codec injection seam: swapping the codec changes features
    try:
        M.register_codec(lambda payload: [float(len(payload) % 7)])
        one = M.extract_features(media).first()
        assert len(one.feature) == 1
    finally:
        M.register_codec(M.deterministic_fake_codec)


def test_frame_sample_no_decode_in_plan(spark, sf_dir):
    """Frame selection must not touch payload bytes: no mapInPandas /
    python worker in the plan."""
    import contextlib
    import io

    docs = load_table(spark, sf_dir, "documents")
    plan_df = M.frame_sample(M.attach_media(docs)).select(
        "media_id", "frame_idx"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    assert "MapInPandas" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan


def test_invindex_df_cap_bounds_boilerplate_skew(spark):
    """Hot-shingle guard: a 50%-boilerplate corpus must not blow up
    the posting self-join.  With the cap binding, (a) candidate rows
    stay under the no-boilerplate budget, (b) pairs are exact Jaccard
    over the REDUCED shingle universe (sizes subtracted too)."""
    # 40 docs: evens share one long boilerplate preamble (every
    # preamble shingle has df=20); each doc also has a unique tail,
    # and docs 2k/2k+1 share that tail (the real near-dups).
    boiler = "terms of service apply to all content provided here "
    rows = []
    for i in range(40):
        tail = f"unique payload {i // 2} alpha beta gamma delta"
        text = (boiler + tail) if i % 2 == 0 else ("intro words " + tail)
        rows.append((i, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = D.jaccard_pairs_invindex(docs, threshold=0.3, max_df=10)
    uncapped = D.jaccard_pairs_invindex(docs, threshold=0.3)

    # (a) the join's candidate volume: Σ df² with the cap is bounded
    # by the budget that holds when no shingle exceeds the cap.
    from bugzilla_etl_spark.operators.dedup import _hashed_shingled

    post = _hashed_shingled(docs, "text", "doc_id").select(
        "doc_id", F.explode("shh").alias("sh")
    )
    dfs = post.groupBy("sh").count()
    total = dfs.agg(F.sum(F.col("count") * F.col("count"))).collect()[0][0]
    capped_total = (
        dfs.where(F.col("count") <= 10)
        .agg(F.sum(F.col("count") * F.col("count")))
        .collect()[0][0]
    )
    budget = 10 * post.count()  # Σ df² ≤ max_df · |postings|
    assert capped_total <= budget < total

    # (b) exactness on the reduced universe: recompute brute-force
    # jaccard with hot shingles removed from BOTH sets.
    hot = {r["sh"] for r in dfs.where(F.col("count") > 10).collect()}
    sets = {
        r["doc_id"]: set(r["shh"]) - hot
        for r in _hashed_shingled(docs, "text", "doc_id").collect()
    }
    expect = set()
    ids = sorted(sets)
    for a in ids:
        for b in ids:
            if a < b and sets[a] and sets[b]:
                j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
                if round(j, 4) >= 0.3:
                    expect.add((a, b))
    got = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert got == expect
    # the cap binds: the boilerplate-only overlap pairs disappear
    assert got != {
        (r["doc_a"], r["doc_b"]) for r in uncapped.collect()
    } or len(hot) == 0


def test_neardup_cell_skew_split_identical_and_bounded(spark, sf_dir):
    """Cell-skew guard: with max_cell forcing multi-way splits, the
    pair set is IDENTICAL to the unguarded join, and no (cell, i, j)
    bucket holds more than ~max_cell rows per side."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = {
        (r["id_a"], r["id_b"], r["cos"])
        for r in SIM.label_blocked_neardup(emb, threshold=0.2).collect()
    }
    split = {
        (r["id_a"], r["id_b"], r["cos"])
        for r in SIM.label_blocked_neardup(
            emb, threshold=0.2, max_cell=4
        ).collect()
    }
    assert split == base and len(base) > 0

    # side-size bound per join bucket: each sub-cell holds <=
    # ceil(cell/nsplit) ~ max_cell rows (salt is ~uniform; allow 3x)
    t = emb.select(
        F.col("vec_id").alias("vid"), F.col("label").alias("cell")
    )
    from bugzilla_etl_spark.functions.hashing import hash64

    cells = t.groupBy("cell").agg(
        F.ceil(F.count(F.lit(1)) / 4).cast("int").alias("nsplit")
    )
    salted = t.join(cells, on="cell").withColumn(
        "s", F.pmod(hash64(F.col("vid").cast("string")), F.col("nsplit"))
    )
    worst = (
        salted.groupBy("cell", "s").count()
        .agg(F.max("count")).collect()[0][0]
    )
    assert worst <= 3 * 4, worst


def test_neardup_components_long_chain_converges(spark):
    """The fixpoint loop must resolve a 9-node PATH (diameter 8) to
    one component — beyond the oracle's 2-hop closed form, proving
    the general iteration + path halving."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 108)] + [(200, 201)],
        "doc_a long, doc_b long",
    )
    out = {
        r["doc_id"]: r["component"]
        for r in D.neardup_components(pairs).collect()
    }
    assert all(out[i] == 100 for i in range(100, 109))
    assert out[200] == out[201] == 200


def test_neardup_components_singletons(spark):
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    members = spark.createDataFrame([(1,), (2,), (9,)], "doc_id long")
    out = {
        r["doc_id"]: r["component"]
        for r in D.neardup_components(pairs, members=members).collect()
    }
    assert out == {1: 1, 2: 1, 9: 9}


# ---- round-3 pipeline extensions -----------------------------------


def test_bigrams_preserve_multiplicity(spark):
    from bugzilla_etl_spark.operators.text import bigrams, tokens

    df = spark.createDataFrame([("a b a b a",)], "text string")
    [row] = df.select(bigrams(tokens("text")).alias("g")).collect()
    assert row.g == ["a b", "b a", "a b", "b a"]


def test_ngrams_order_multiplicity_and_short_docs(spark):
    """ngrams(n=3) keeps order and multiplicity (unlike shingles,
    which dedups for set semantics) and yields [] when the doc has
    fewer than n tokens — no null/partial trailing grams."""
    from bugzilla_etl_spark.operators.text import ngrams, tokens

    df = spark.createDataFrame(
        [("a b a b a",), ("a b",), ("",)], "text string"
    )
    rows = df.select(ngrams(tokens("text"), 3).alias("g")).collect()
    assert rows[0].g == ["a b a", "b a b", "a b a"]
    assert rows[1].g == []
    assert rows[2].g == []


def test_decontam_flags_planted_leak(spark):
    """A train doc that quotes an eval doc verbatim must be flagged;
    an unrelated doc must not."""
    ev = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    tr = spark.createDataFrame(
        [
            (1, "intro words alpha beta gamma delta closing words"),
            (2, "qq ww ee rr tt yy uu ii"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in D.decontam_overlap(tr, ev).collect()}
    assert out[1].contaminated == 1 and out[1].n_overlap >= 2
    assert out[2].contaminated == 0 and out[2].n_overlap == 0


def test_chunk_stats_finds_shared_passage(spark):
    """Two docs sharing ONLY an aligned 64-char header must each
    report exactly one shared chunk; a third unrelated doc none."""
    header = "H" * 64
    docs = spark.createDataFrame(
        [
            (1, header + "x" * 100),
            (2, header + "y" * 100),
            (3, "z" * 200),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in D.chunk_shared_stats(docs, width=64, stride=32).collect()
    }
    assert out[1].n_shared == 1 and out[2].n_shared == 1
    assert out[3].n_shared == 0
    assert all(0.0 <= out[i].shared_frac <= 1.0 for i in out)


def test_ivf_assign_matches_windowed_argmax(spark, sf_dir):
    """The map-only fold must pick the identical cell the
    crossJoin+window formulation picks for every vector."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.where(F.col("vec_id") % 25 == 0)
    fold = {
        r.vid: r.cell for r in SIM.ivf_assign(emb, cents).collect()
    }

    t = emb.select(
        F.col("vec_id").alias("vid"),
        SIM._dvec("embedding").alias("v"),
    ).select("vid", "v", SIM.norm(F.col("v")).alias("vn"))
    c = cents.select(
        F.col("vec_id").alias("cid"), SIM._dvec("embedding").alias("cv")
    ).select("cid", "cv", SIM.norm(F.col("cv")).alias("cn"))
    w = Window.partitionBy("vid").orderBy(
        F.col("cos").desc(), F.col("cid").asc()
    )
    ref = {
        r.vid: r.cid
        for r in t.crossJoin(F.broadcast(c))
        .withColumn(
            "cos",
            F.round(
                SIM.pair_cosine(
                    F.col("v"), F.col("cv"), F.col("vn"), F.col("cn")
                ),
                4,
            ),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .collect()
    }
    assert fold == ref


def test_ivf_candidates_stay_in_cell(spark, sf_dir):
    """Every reported neighbour must share the query's cell, ranks
    dense from 1, cosine non-increasing per query."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.where(F.col("vec_id") % 25 == 0)
    queries = emb.where(F.col("vec_id") % 50 == 0)
    cell = {r.vid: r.cell for r in SIM.ivf_assign(emb, cents).collect()}
    rows = SIM.ivf_search_topk(emb, cents, queries, k=3).collect()
    assert rows
    by_q: dict = {}
    for r in rows:
        assert cell[r.cand_id] == cell[r.query_id]
        by_q.setdefault(r.query_id, []).append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert all(
            rs[i].cos >= rs[i + 1].cos for i in range(len(rs) - 1)
        )


def test_pq_adc_matches_exhaustive_compressed_distance(spark, sf_dir):
    """The batched LUT-gather + per-batch prune must return exactly
    the top-k an exhaustive compressed-domain ranking returns:
    re-derive every candidate's ADC distance from (codes, LUT) in
    Python and compare pairs AND distances."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    C = SIM.pq_codebook(spark, n_sub=8, n_codes=16, sub_dim=8)
    queries = emb.where(F.col("vec_id") % 50 == 0)

    codes = {
        r.vec_id: np.asarray(r.codes, dtype=np.int64)
        for r in SIM.pq_encode(emb, C).collect()
    }
    qrows = sorted(
        queries.select("vec_id", SIM._dvec("embedding").alias("v")).collect(),
        key=lambda r: r.vec_id,
    )
    Q = np.stack([np.asarray(r.v, dtype=np.float64) for r in qrows])
    lut = SIM._pq_subdists(Q, C)

    expected = {}
    for qi, qr in enumerate(qrows):
        dists = sorted(
            (int(lut[qi, np.arange(8), cd].sum()), cid)
            for cid, cd in codes.items()
            if cid != qr.vec_id
        )
        expected[qr.vec_id] = [(c, d) for d, c in dists[:3]]

    got: dict = {}
    for r in SIM.pq_search_topk(emb, queries, C, k=3).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.cand_id, r.adist))
    assert set(got) == set(expected)
    for q, rs in got.items():
        rs.sort()
        assert [(c, d) for _, c, d in rs] == expected[q]


def test_pq_codes_are_within_codebook_range(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    C = SIM.pq_codebook(spark, n_sub=8, n_codes=16, sub_dim=8)
    rows = SIM.pq_encode(emb, C).collect()
    assert rows
    for r in rows:
        assert len(r.codes) == 8
        assert all(0 <= c < 16 for c in r.codes)


def test_pq_search_no_corpus_shuffle(spark, sf_dir):
    """The corpus side must stay map-only (two chained mapInPandas);
    the only exchange is the final tiny ranking window over the
    per-batch-pruned candidates."""
    emb = load_table(spark, sf_dir, "embeddings")
    C = SIM.pq_codebook(spark, n_sub=8, n_codes=16, sub_dim=8)
    queries = emb.where(F.col("vec_id") % 50 == 0)
    plan = (
        SIM.pq_search_topk(emb, queries, C, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_winnowing_guarantee_shared_run_shares_fingerprint(spark):
    """Winnowing's core property (Schleimer et al. 2003): two docs
    sharing a token run of length >= w+k-1 (= 6 at k=3, w=4) must
    share at least one fingerprint hash; disjoint docs share none."""
    from bugzilla_etl_spark.operators.text import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # 6 shared tokens
    rows = [
        (1, f"one two three {shared} four five six"),
        (2, f"seven eight {shared} nine ten eleven twelve"),
        (3, "completely different words with nothing in common here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in winnow_fingerprints(docs).collect()}
    assert out[1].n_shared >= 1 and out[2].n_shared >= 1
    assert out[3].n_shared == 0
    # density sanity: selection keeps ~2/(w+1) of positions, never all
    assert 0 < out[1].n_fp < 1 + out[1].n_hashes * 6


def test_kmeans_iterations_reduce_inertia(spark, sf_dir):
    """Lloyd's guarantee: total within-cluster squared distance is
    non-increasing across iterations, and assignments are
    deterministic across runs."""
    from bugzilla_etl_spark.operators.clustering import kmeans_lloyd

    emb = load_table(spark, sf_dir, "embeddings")
    one = kmeans_lloyd(emb, seed_every=25, n_iter=1)
    two = kmeans_lloyd(emb, seed_every=25, n_iter=2)
    i1 = one.agg(F.sum("d2s")).first()[0]
    i2 = two.agg(F.sum("d2s")).first()[0]
    assert i2 <= i1
    a = sorted(map(tuple, two.collect()))
    b = sorted(map(tuple, kmeans_lloyd(emb, seed_every=25, n_iter=2).collect()))
    assert a == b


def test_winnow_pairs_recovers_planted_neardups(spark, sf_dir):
    """The corpus's planted near-dups (token-identical prefixes, found
    by exact Jaccard at 0.8) must all surface as winnowing match
    pairs — the fingerprint-sharing guarantee applied end-to-end."""
    from bugzilla_etl_spark.operators.text import winnow_pairs

    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.doc_a, r.doc_b)
        for r in D.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    assert exact
    got = {
        (r.doc_a, r.doc_b)
        for r in winnow_pairs(docs, min_shared=2).collect()
    }
    missed = exact - got
    assert not missed, f"winnow_pairs missed planted near-dups: {missed}"


def test_decontam_neardup_catches_paraphrase(spark):
    """A corpus doc that verbatim-copies an eval doc AND one that
    lightly edits it (one token changed — past exact-match probes)
    must both pair with the eval doc; an unrelated doc must not."""
    from bugzilla_etl_spark.operators.dedup import minhash_cross_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " \
           "lam mu nu xi omicron pi rho sigma tau upsilon"
    edited = base.rsplit(" ", 1)[0] + " omega"
    evals = spark.createDataFrame(
        [(100, base)], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, base),
            (2, edited),
            (3, "completely different words having nothing in common "
                "with the evaluation document at all whatsoever here"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.eval_id): r.jaccard
        for r in minhash_cross_pairs(corpus, evals, threshold=0.5).collect()
    }
    assert (1, 100) in got and got[(1, 100)] == 1.0
    assert (2, 100) in got and 0.5 <= got[(2, 100)] < 1.0
    assert all(doc != 3 for doc, _ in got)


def test_char_lm_scores_gibberish_higher(spark):
    """A char-bigram LM fitted on a repetitive reference must score
    an in-distribution doc lower (better) than gibberish, and drop
    docs with no transition."""
    from bugzilla_etl_spark.operators.text import (
        char_bigram_lm,
        char_lm_score,
    )

    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(5)],
        "doc_id long, text string",
    )
    bc, ctx, v = char_bigram_lm(ref)
    assert v > 0 and bc and ctx
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "zq xv qj zz"), (3, "a")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.nll for r in char_lm_score(docs, bc, ctx, v).collect()}
    assert 3 not in out  # single char: no transition
    assert out[2] > out[1], out


def test_char_lm_scoring_is_map_only(spark, sf_dir):
    """Scoring a 100 TB corpus must not shuffle it: the scored frame
    is scan -> project -> Arrow map, zero exchanges."""
    import re

    from bugzilla_etl_spark.operators.text import (
        char_bigram_lm,
        char_lm_score,
    )
    from bugzilla_etl_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    bc, ctx, v = char_bigram_lm(docs.where(F.col("source") == "src0"))
    plan_df = char_lm_score(docs, bc, ctx, v)
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    assert len(re.findall(r"\(\d+\) Exchange", buf.getvalue())) == 0


def test_dsir_scoring_is_map_only(spark, sf_dir):
    """Same contract for DSIR: once the bounded bucket models are
    folded, per-doc scoring is one map-only pass."""
    import re

    from bugzilla_etl_spark.operators.sampling import dsir_weights
    from bugzilla_etl_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = dsir_weights(docs, F.col("source") == "src0", key="doc_id")
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    assert len(re.findall(r"\(\d+\) Exchange", buf.getvalue())) == 0


def test_embedding_outliers_flags_planted_vector(spark):
    """A vector far off its label's manifold must flag; the cluster
    members must not."""
    from bugzilla_etl_spark.operators.clustering import embedding_outliers

    base = [
        (i, [1.0 + 0.001 * i] + [0.0] * 63, 0) for i in range(12)
    ]
    planted = [(99, [50.0] + [0.0] * 63, 0)]
    emb = spark.createDataFrame(
        base + planted,
        "vec_id long, embedding array<float>, label long",
    )
    out = {r.vec_id: r for r in embedding_outliers(emb).collect()}
    assert out[99].is_outlier == 1, out[99]
    assert all(out[i].is_outlier == 0 for i in range(12))
    # planted distance is exact: centroid pulled toward it, but its
    # own distance must dwarf every base vector's
    assert out[99].dist > 10 * max(out[i].dist for i in range(12))


def test_filter_funnel_is_a_chain(spark, sf_dir):
    """Funnel invariants: stage i's input is stage i-1's survivors,
    kept counts are monotone non-increasing, fractions in [0,1], and
    stage 1 sees the whole corpus."""
    from bugzilla_etl_spark.plans import catalog
    from bugzilla_etl_spark.sources import load_table

    catalog.load_all()
    rows = sorted(
        catalog.QUERIES["filter_funnel"](spark, sf_dir).collect(),
        key=lambda r: r.stage_idx,
    )
    assert [r.stage for r in rows] == [
        "lang", "length", "repetition", "pii",
    ]
    docs = load_table(spark, sf_dir, "documents")
    assert rows[0].n_in == docs.count()
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_in == prev.n_kept
        assert cur.n_kept <= cur.n_in
    assert all(0.0 <= r.drop_frac <= 1.0 for r in rows)
    # the planted-email stage must actually drop the planted quarter
    assert rows[3].drop_frac > 0.2, rows[3]


def test_containment_catches_doc_in_doc_that_jaccard_misses(spark):
    """A short doc fully embedded in a long one must score ~1.0
    containment while its Jaccard stays below any useful threshold —
    the asymmetric case the metric exists for."""
    from bugzilla_etl_spark.operators.dedup import jaccard_pairs_invindex

    long_words = " ".join(f"w{i}" for i in range(120))
    short = " ".join(f"w{i}" for i in range(30, 46))  # inside long
    docs = spark.createDataFrame(
        [(1, long_words), (2, short), (3, "zz qq xx vv unrelated run")],
        "doc_id long, text string",
    )
    cont = {
        (r.doc_a, r.doc_b): r.containment
        for r in jaccard_pairs_invindex(
            docs, threshold=0.8, metric="containment"
        ).collect()
    }
    assert cont.get((1, 2)) == 1.0, cont
    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs_invindex(
            docs, threshold=0.0, metric="jaccard"
        ).collect()
    }
    assert jac[(1, 2)] < 0.2, jac  # the union-dominated failure mode


def test_hll_distinct_accuracy_and_small_range(spark, sf_dir):
    """HLL estimates must land within ~5 standard errors of exact
    (sigma = 1.04/sqrt(1024) ≈ 3.3% — generous bound, no flakiness),
    and the output must carry the exact count beside the estimate."""
    from bugzilla_etl_spark.plans import catalog

    catalog.load_all()
    rows = catalog.QUERIES["hll_distinct"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.rel_err <= 0.17, (r.event_type, r.n_exact, r.hll_est)
        assert abs(r.hll_est - r.n_exact) / r.n_exact == __import__(
            "pytest"
        ).approx(r.rel_err, abs=1e-3)


def test_bloom_decontam_never_misses_exact_hits(spark, sf_dir):
    """Bloom guarantee: no false negatives — every doc the EXACT
    decontamination probe flags must also be flagged by the sketch
    (false positives allowed, missed hits never)."""
    from pyspark.sql import functions as F

    from bugzilla_etl_spark.operators.dedup import (
        bloom_build,
        bloom_probe,
        decontam_overlap,
    )
    from bugzilla_etl_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.where(F.col("doc_id") % 20 == 0)
    tr = docs.where(F.col("doc_id") % 20 != 0)
    exact_hit = {
        r.doc_id
        for r in decontam_overlap(tr, ev).collect()
        if r.n_overlap > 0
    }
    bloom_hit = {
        r.doc_id
        for r in bloom_probe(tr, bloom_build(ev)).collect()
        if r.flagged == 1
    }
    assert exact_hit <= bloom_hit, exact_hit - bloom_hit


def test_hll_registers_max_merge_equals_single_pass(spark, sf_dir):
    """The mergeability claim, proven: per-half register tables
    max-merged equal the single-pass registers (so yesterday's
    sketch + today's sketch == the sketch of the union — the
    incremental contract), hence identical estimates."""
    from pyspark.sql import functions as F

    from bugzilla_etl_spark.functions.hashing import hash64
    from bugzilla_etl_spark.plans.queries_engine import _HLL_2P50
    from bugzilla_etl_spark.sources import load_table

    def registers(ev):
        h = hash64(
            F.concat(F.lit("hll:"), F.col("user_id").cast("string"))
        )
        t = ev.select("event_type", h.alias("h")).select(
            "event_type",
            F.expr(f"h div {_HLL_2P50}").alias("b"),
            (F.col("h") % _HLL_2P50).alias("rest"),
        )
        r = (
            F.when(F.col("rest") == 0, F.lit(51))
            .otherwise(F.lit(51) - F.length(F.bin("rest")))
            .cast("int")
        )
        return (
            t.select("event_type", "b", r.alias("r"))
            .groupBy("event_type", "b")
            .agg(F.max("r").alias("m"))
        )

    ev = load_table(spark, sf_dir, "events")
    whole = {
        (r.event_type, r.b): r.m for r in registers(ev).collect()
    }
    half_a = registers(ev.where(F.col("event_id") % 2 == 0)).collect()
    half_b = registers(ev.where(F.col("event_id") % 2 == 1)).collect()
    merged: dict = {}
    for r in list(half_a) + list(half_b):
        k = (r.event_type, r.b)
        merged[k] = max(merged.get(k, 0), r.m)
    assert merged == whole


def test_pagerank_hubs_outrank_and_mass_bounded(spark, sf_dir):
    """On the bipartite trade graph the ~100 suppliers are the hubs
    (every supplier trades with many customers), so the top of the
    ranking must be all-supplier; total rank mass stays <= 1 (floor
    division only ever loses mass, never creates it); re-running is
    byte-identical (integer grid)."""
    from bugzilla_etl_spark.plans import catalog

    catalog.load_all()
    fn = catalog.QUERIES["pagerank_trade"]
    rows = fn(spark, sf_dir).collect()
    assert rows and all(r.node.startswith("s") for r in rows[:10]), [
        r.node for r in rows[:10]
    ]
    assert sum(r.rank for r in rows) <= 1.0 + 1e-9
    again = fn(spark, sf_dir).collect()
    assert [(r.node, r.rank) for r in again] == [
        (r.node, r.rank) for r in rows
    ]
