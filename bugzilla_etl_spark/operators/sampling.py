"""Corpus-curation operators: deterministic sampling, domain quotas,
sequence packing, shard shuffling, and mixture planning — the steps
between a deduped corpus and a tokenizer in a training-data pipeline.

Everything here is driven by the portable key hash
(functions.hashing.hash64) instead of ``rand()``: selections are
reproducible across engines, runs, and *incremental extensions* of
the corpus — a doc's sample/shard/pack position never flips when new
data arrives, which is what makes ablations and resumable jobs
possible at 100 TB.

Scale shapes:
- ``quota_sample``     — one shuffle on the group key (the window);
                         output bounded by quota x |groups|.
- ``pack_sequences``   — one shuffle on the stream key; the running
                         token sum is a single window cumsum, no
                         driver loop, no second pass.
- ``shuffle_shards``   — one shuffle on the computed shard id (which
                         IS the training-data write partitioning, so
                         the sort feeds the sink for free).
- ``mix_weights``      — two skinny aggregations (domain partials,
                         then a broadcast-size total); never touches
                         text after the token count.

reference scope note: the reference ETL has no corpus-curation stage
(it ships documents 1:1 to ES); these extend SURVEY §2's
LLM-data-pipeline block (#26-#42).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bugzilla_etl_spark.functions.hashing import hash64


def _keyed(col: Column | str, salt: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return hash64(F.concat(F.lit(salt), c.cast("string")))


def quota_sample(
    df: DataFrame,
    group: str,
    key: str,
    quota: int,
    salt: str = "q:",
) -> DataFrame:
    """Cap each group at ``quota`` rows, chosen by the portable hash
    of ``key`` (a deterministic uniform sample within the group).

    Unlike fractional sampling (sample_stratified), a quota bounds
    the CONTRIBUTION of any one domain — the over-represented-crawl
    guard in data-mixing recipes.  One shuffle (window on group);
    ties broken by key so the result is total-ordered and stable.
    Output: input columns + ``rk`` (1-based rank within the group).
    """
    w = Window.partitionBy(group).orderBy(
        _keyed(key, salt).asc(), F.col(key).asc()
    )
    return (
        df.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= quota)
    )


def pack_sequences(
    df: DataFrame,
    stream: str,
    key: str,
    n_tokens: str,
    budget: int,
    salt: str = "p:",
) -> DataFrame:
    """Concat-then-chunk sequence packing: within each ``stream``,
    docs are laid end-to-end in hash-of-``key`` order and cut into
    fixed ``budget``-token training sequences; a doc may span a
    boundary (the GPT-style packing that wastes zero pad tokens).

    The layout is one window cumsum: a doc's start offset is the
    running token total before it, so
        seq_id        = start_offset div budget
        offset_in_seq = start_offset mod budget
    Deterministic (hash order), resumable (appending new docs only
    extends each stream's tail), and one shuffle on ``stream``.
    Output: input columns + seq_id, offset_in_seq.
    """
    w = (
        Window.partitionBy(stream)
        .orderBy(_keyed(key, salt).asc(), F.col(key).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(n_tokens).over(w) - F.col(n_tokens)).cast("long")
    return df.select(
        "*",
        (start / budget).cast("long").alias("seq_id"),
        (start % budget).alias("offset_in_seq"),
    )


def shuffle_shards(
    df: DataFrame,
    key: str,
    n_shards: int,
    shard_salt: str = "s:",
    order_salt: str = "o:",
) -> DataFrame:
    """Deterministic global shuffle for training-order: each row gets
    a shard (hash mod n_shards) and a position within the shard
    (rank by an INDEPENDENT hash, so shard assignment and intra-shard
    order are uncorrelated).  This is the write-path op that turns a
    curated corpus into shuffled training shards without ``rand()``
    — rerunning produces byte-identical shards, and the shard id is
    the sink partitioning (partitionBy('shard')), so the single
    shuffle here is the one the write needs anyway.
    Output: input columns + shard, pos (1-based within shard).
    """
    shard = _keyed(key, shard_salt) % n_shards
    w = Window.partitionBy(shard).orderBy(
        _keyed(key, order_salt).asc(), F.col(key).asc()
    )
    return df.select(
        "*", shard.alias("shard"), F.row_number().over(w).alias("pos")
    )


def mix_weights(
    df: DataFrame,
    domain: str,
    n_tokens: str,
    target_frac: dict[str, float] | None = None,
) -> DataFrame:
    """Mixture planning: per-domain token mass -> natural share ->
    repeat factor needed to hit the target share (uniform across
    domains unless ``target_frac`` overrides).  ``repeat_factor`` > 1
    means the domain is up-sampled (epochs over it), < 1 down-sampled
    — the knob data-mixing recipes tune.  Two skinny aggregations;
    the per-domain table is broadcast-size by construction.
    Output: domain, n_docs, n_tokens, natural_frac, target, repeat_factor.
    """
    per = df.groupBy(domain).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens).cast("long").alias("n_tokens"),
    )
    # corpus totals as a broadcast 1-row join, not a global window —
    # same value, but no single-partition WindowExec in the plan
    totals = per.agg(
        F.sum("n_tokens").alias("_tot_tokens"),
        F.count(F.lit(1)).alias("_n_domains"),
    )
    per = per.crossJoin(F.broadcast(totals))
    natural = F.col("n_tokens") / F.col("_tot_tokens")
    if target_frac is None:
        target = F.lit(1.0) / F.col("_n_domains")
    else:
        mapping = F.create_map(
            *[F.lit(x) for kv in target_frac.items() for x in kv]
        )
        target = mapping[F.col(domain)]
    return per.select(
        domain,
        "n_docs",
        "n_tokens",
        F.round(natural, 6).alias("natural_frac"),
        F.round(target, 6).alias("target"),
        F.round(target / natural, 4).alias("repeat_factor"),
    )


def stratified_split(
    df: DataFrame,
    strata: str,
    key: str,
    cuts: tuple[tuple[str, int], ...] = (("train", 8), ("val", 1), ("test", 1)),
    salt: str = "sp:",
) -> DataFrame:
    """Deterministic stratified train/val/test split: within each
    stratum, rows rank by the portable hash of ``key`` and the split
    boundaries are EXACT integer cuts of the stratum size (``cuts``
    are integer weights, e.g. 8/1/1 = 80/10/10) — so every stratum
    lands within one row of its target proportion, unlike
    independent-coin-flip splits whose small strata can end up with
    an empty val set.

    Determinism contract (the property training pipelines need): a
    row's (hash, key) sort position — hence usually its split — is
    stable under corpus growth, and re-running at any scale is
    byte-identical.  One shuffle (window on ``strata``); the stratum
    size rides the same window as a count(*) — no second pass, no
    join.  Output: input columns + ``split``.
    """
    total = sum(w for _, w in cuts)
    w = Window.partitionBy(strata).orderBy(
        _keyed(key, salt).asc(), F.col(key).asc()
    )
    n = F.count(F.lit(1)).over(Window.partitionBy(strata))
    rk = F.row_number().over(w)
    # integer cut points: cum_w/total of n, floor — identical
    # arithmetic on the SQL side ((n * cum) // total)
    expr = None
    cum = 0
    for name, weight in cuts[:-1]:
        cum += weight
        cond = rk <= ((n * cum - (n * cum) % total) / total).cast("long")
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(cuts[-1][0]) if expr is None else expr.otherwise(cuts[-1][0])
    )
    return df.select("*", expr.alias("split"))


def dsir_weights(
    df: DataFrame,
    target_cond,
    key: str,
    text: str = "text",
    n_buckets: int = 1024,
    salt: str = "f:",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling" — public method):
    featurize every document into hashed token-unigram+bigram buckets,
    fit two smoothed bucket distributions — the TARGET domain's
    (rows matching ``target_cond``) and the RAW corpus's — and weight
    each raw document by its log-likelihood ratio
    Σ_grams [ln p_target(b) − ln p_raw(b)].  High weight = looks like
    the target domain; downstream sampling keeps raw docs with
    probability ∝ exp(weight).

    Scale shape: BOTH bounded distributions (``n_buckets`` rows each
    — here 1024) come from ONE map-side-combined conditional
    aggregation over a single corpus scan (raw count + target count
    per bucket), collected to the driver like IVF centroids; scoring
    is then a SINGLE map-only pass — the per-doc gram stream folds
    against the broadcast log-ratio array via aggregate(), zero fact
    shuffles, no second scan, no explode left in the hot path.
    Output: ``key``, n_grams, weight (log-LR, rounded 4).
    """
    from bugzilla_etl_spark.operators.text import ngrams, tokens

    def grams(col):
        tk = tokens(col)
        return F.concat(tk, ngrams(tk, 2))

    bucket = lambda g: hash64(F.concat(F.lit(salt), g)) % n_buckets  # noqa: E731

    import math

    from bugzilla_etl_spark.tmpdirs import pin

    # Featurize ONCE: tokenizing + per-gram md5 bucketing is the
    # dominant cost of this operator, and the naive shape pays it
    # twice (model-build pass, then again in the scoring pass —
    # plus a third gram construction in the scoring pass's
    # null-filter, which the optimizer evaluates as
    # isnotnull(<whole gram expression>)).  Instead: filter on the
    # SOURCE column (text IS NOT NULL ⇔ grams IS NOT NULL, and it
    # pushes down to the parquet scan), compute each doc's bucket
    # array in one map-only pass, persist it for the duration of
    # the invocation, and let both the model aggregation and the
    # scoring fold read the bounded int arrays.  The persisted
    # featurization is int32 arrays — far smaller than the text it
    # replaces — and is released via the tmpdirs cleanup registry,
    # so nothing survives the invocation.
    feat = pin(
        df.where(F.col(text).isNotNull())
        .select(
            F.col(key),
            target_cond.alias("_t"),
            F.transform(
                grams(F.col(text)), lambda x: bucket(x).cast("int")
            ).alias("_bs"),
        )
    )

    counts = (
        feat.select("_t", F.explode("_bs").alias("b"))
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("c_raw"),
            F.count_if(F.col("_t")).alias("c_tgt"),
        )
        .collect()
    )
    t_counts = [0] * n_buckets
    r_counts = [0] * n_buckets
    for r in counts:
        r_counts[r["b"]] = r["c_raw"]
        t_counts[r["b"]] = r["c_tgt"]
    t_total = sum(t_counts) + n_buckets
    r_total = sum(r_counts) + n_buckets
    log_ratio = [
        math.log((t_counts[b] + 1) / t_total)
        - math.log((r_counts[b] + 1) / r_total)
        for b in range(n_buckets)
    ]
    # Bind the log-ratio table as a per-ROW array column BEFORE the
    # lambda: expressions inside higher-order functions re-evaluate
    # per ELEMENT (no folding/CSE there — the shingles() lesson), so
    # an inline 1024-literal CreateArray would rebuild the whole
    # array once per gram (O(|grams|·1024) — measured ~3x the whole
    # query).  As a column it materializes once per row and the
    # lambda's element_at is a cheap bound-reference gather.
    ratio_arr = F.array(*[F.lit(v) for v in log_ratio])
    # Score from the persisted bucket arrays: the fold visits the
    # buckets in gram order (transform preserves order), so the
    # float additions happen in exactly the sequence the two-pass
    # shape produced — bit-identical weights.  null text rows were
    # dropped before featurization (matches the oracle's unnest,
    # which drops the doc; downstream sampling treats absence as
    # weight -inf).
    weight = F.aggregate(
        F.transform(
            F.col("_bs"),
            lambda b: F.element_at(F.col("_lr"), b + F.lit(1)),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        feat.select(F.col(key), F.col("_bs"), ratio_arr.alias("_lr"))
        .select(
            key,
            F.size("_bs").cast("long").alias("n_grams"),
            F.round(weight, 4).alias("weight"),
        )
    )
