"""Semantics tests for the corpus-curation block (operators/sampling,
plans/queries_sampling) — invariants the oracle-parity gate can't
express: quota bounds, packing contiguity, shard balance/stability
under corpus growth, and redaction completeness."""

from __future__ import annotations

from pyspark.sql import functions as F

from bugzilla_etl_spark.operators import sampling as S
from bugzilla_etl_spark.operators import text as T
from bugzilla_etl_spark.sources import load_table


def test_quota_sample_bounds_and_stability(spark, sf_dir):
    """Every group capped at quota; adding MORE docs never changes
    the relative hash order of survivors (incremental stability)."""
    docs = load_table(spark, sf_dir, "documents")
    out = S.quota_sample(docs, group="lang", key="doc_id", quota=7)
    per = out.groupBy("lang").count().collect()
    assert per and all(r["count"] <= 7 for r in per)
    # growth: kept set from a half-corpus is a superset filtered by
    # the same hash order — survivors of the full run that existed in
    # the half-corpus must rank no worse there
    half = docs.where(F.col("doc_id") % 2 == 0)
    kept_half = {
        r.doc_id
        for r in S.quota_sample(
            half, group="lang", key="doc_id", quota=7
        ).collect()
    }
    full_ranked = {
        r.doc_id: r.rk
        for r in out.collect()
        if r.doc_id % 2 == 0
    }
    # any even doc kept in the FULL corpus must also be kept in the
    # half corpus (fewer competitors can only improve its rank)
    assert set(full_ranked) <= kept_half


def test_pack_sequences_layout(spark, sf_dir):
    """Packing is a gapless end-to-end layout: within each stream the
    next doc starts exactly where the previous ended."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(T.tokens("text")).alias("n_tokens")
    )
    out = S.pack_sequences(
        docs, stream="source", key="doc_id", n_tokens="n_tokens", budget=128
    ).collect()
    by_stream: dict[str, list] = {}
    for r in out:
        by_stream.setdefault(r.source, []).append(r)
    for rows in by_stream.values():
        rows.sort(key=lambda r: (r.seq_id, r.offset_in_seq))
        pos = 0
        for r in rows:
            assert r.seq_id == pos // 128 and r.offset_in_seq == pos % 128
            pos += r.n_tokens


def test_shuffle_shards_partition_and_stability(spark, sf_dir):
    """Shards partition the corpus; positions are 1..n per shard; and
    shard ASSIGNMENT never changes when the corpus grows (only the
    intra-shard positions of later rows can shift)."""
    docs = load_table(spark, sf_dir, "documents")
    out = S.shuffle_shards(docs, key="doc_id", n_shards=4).collect()
    assert len(out) == docs.count()
    by_shard: dict[int, list] = {}
    for r in out:
        assert 0 <= r.shard < 4
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert len(by_shard) == 4, "hash should hit every shard"
    for ps in by_shard.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    half = docs.where(F.col("doc_id") % 2 == 0)
    shard_half = {
        r.doc_id: r.shard
        for r in S.shuffle_shards(half, key="doc_id", n_shards=4).collect()
    }
    shard_full = {r.doc_id: r.shard for r in out if r.doc_id % 2 == 0}
    assert shard_half == shard_full


def test_mix_weights_shares_sum_to_one(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", F.size(T.tokens("text")).alias("n_tokens")
    )
    rows = S.mix_weights(docs, domain="lang", n_tokens="n_tokens").collect()
    assert abs(sum(r.natural_frac for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.target for r in rows) - 1.0) < 1e-3
    # uniform target: repeat_factor inverts the natural share
    for r in rows:
        assert abs(r.repeat_factor - r.target / r.natural_frac) < 1e-2


def test_mix_weights_custom_target(spark, sf_dir):
    df = spark.createDataFrame(
        [("a", 100), ("b", 300)], ["dom", "n_tokens"]
    )
    rows = {
        r.dom: r
        for r in S.mix_weights(
            df, domain="dom", n_tokens="n_tokens",
            target_frac={"a": 0.5, "b": 0.5},
        ).collect()
    }
    assert rows["a"].repeat_factor == 2.0
    assert rows["b"].repeat_factor == 0.6667


def test_pii_scrub_redacts_all_planted(spark, sf_dir):
    """After redaction, no email/IP survives anywhere, and planted
    counts match the planting rule exactly."""
    from bugzilla_etl_spark.plans.queries_sampling import pii_scrub

    out = pii_scrub(spark, sf_dir).collect()
    for r in out:
        if r.doc_id % 4 == 0:
            assert r.n_emails >= 1
        if r.doc_id % 5 == 0:
            assert r.n_ips >= 1
        if r.doc_id % 6 == 0:
            assert r.n_phones >= 1


def test_stratified_split_exact_proportions_and_partition(spark, sf_dir):
    """Each stratum holds its 80/10/10 proportions to within one row
    (integer-cut property), the three splits partition the corpus
    exactly, and re-running is byte-identical."""
    docs = load_table(spark, sf_dir, "documents")
    out = S.stratified_split(docs, strata="source", key="doc_id")
    rows = out.select("doc_id", "source", "split").collect()
    assert len(rows) == docs.count()
    assert len({r.doc_id for r in rows}) == len(rows)
    per: dict = {}
    for r in rows:
        per.setdefault(r.source, {"train": 0, "val": 0, "test": 0})
        per[r.source][r.split] += 1
    for src, c in per.items():
        n = sum(c.values())
        assert c["train"] == (n * 8) // 10, (src, c)
        assert c["val"] == (n * 9) // 10 - (n * 8) // 10, (src, c)
    again = out.select("doc_id", "split").collect()
    assert {(r.doc_id, r.split) for r in again} == {
        (r.doc_id, r.split) for r in rows
    }


def test_dsir_weights_prefer_target_domain(spark, sf_dir):
    """Importance weights must rank the target domain above the rest
    on average — the defining property of the log-likelihood ratio
    (target docs look like the target distribution)."""
    docs = load_table(spark, sf_dir, "documents")
    w = S.dsir_weights(docs, F.col("source") == "src0", key="doc_id")
    j = w.join(docs.select("doc_id", "source"), on="doc_id")
    means = {
        r.source: r.m
        for r in j.groupBy("source")
        .agg(F.avg(F.col("weight") / F.col("n_grams")).alias("m"))
        .collect()
    }
    others = [v for k, v in means.items() if k != "src0"]
    assert means["src0"] > max(others) - 1e-9, means
