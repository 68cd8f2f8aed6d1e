"""Corpus-curation queries — the sampling/packing/mixing/PII stage of
a training-data pipeline (between dedup and the tokenizer), over the
``documents`` table.  All selection is portable-hash-driven (never
``rand()``) so every result is reproducible across engines, runs, and
incremental corpus extensions — see operators/sampling.py for the
scale shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bugzilla_etl_spark.functions.hashing import duckdb_hash64, hash64
from bugzilla_etl_spark.operators import sampling as S
from bugzilla_etl_spark.operators import text as T
from bugzilla_etl_spark.plans.catalog import register
from bugzilla_etl_spark.plans.queries_dedup import DUCK_TOKENS
from bugzilla_etl_spark.sources import load_table

_H_QUOTA = duckdb_hash64("('q:' || CAST(doc_id AS VARCHAR))")
_H_PACK = duckdb_hash64("('p:' || CAST(doc_id AS VARCHAR))")
_H_SHARD = duckdb_hash64("('s:' || CAST(doc_id AS VARCHAR))")
_H_ORDER = duckdb_hash64("('o:' || CAST(doc_id AS VARCHAR))")


@register(
    "quota_sample",
    oracle=f"""
    SELECT doc_id, lang, rk FROM (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY {_H_QUOTA} ASC, doc_id ASC) AS rk
        FROM documents
    ) WHERE rk <= 30
    """,
)
def quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota: at most 30 docs per language, chosen by the
    portable doc_id hash — the over-represented-domain cap of a data
    mixing recipe.  One window shuffle on lang; deterministic and
    stable under corpus growth (a kept doc is only ever displaced by
    a lower-hash newcomer, never reshuffled at random)."""
    docs = load_table(spark, sf_dir, "documents")
    return S.quota_sample(docs, group="lang", key="doc_id", quota=30).select(
        "doc_id", "lang", "rk"
    )


@register(
    "seq_packing",
    oracle=f"""
    SELECT doc_id, source, n_tokens,
           CAST((cum - n_tokens) // 256 AS BIGINT) AS seq_id,
           CAST((cum - n_tokens) % 256 AS BIGINT) AS offset_in_seq
    FROM (
        SELECT doc_id, source, n_tokens,
               sum(n_tokens) OVER (PARTITION BY source
                                   ORDER BY {_H_PACK} ASC, doc_id ASC
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cum
        FROM (SELECT doc_id, source, len({DUCK_TOKENS}) AS n_tokens
              FROM documents)
    )
    """,
)
def seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing: docs of each source stream
    laid end-to-end in hash order and cut into 256-token training
    sequences (a doc may span a boundary — zero pad waste).  The
    whole layout is ONE window cumsum per stream; appending docs only
    extends stream tails, so packing is incrementally resumable."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(T.tokens("text")).alias("n_tokens")
    )
    out = S.pack_sequences(
        docs, stream="source", key="doc_id", n_tokens="n_tokens", budget=256
    )
    return out.select(
        "doc_id",
        "source",
        "n_tokens",
        "seq_id",
        F.col("offset_in_seq").cast("long").alias("offset_in_seq"),
    )


@register(
    "shuffle_shards",
    oracle=f"""
    SELECT doc_id,
           {_H_SHARD} % 8 AS shard,
           row_number() OVER (PARTITION BY {_H_SHARD} % 8
                              ORDER BY {_H_ORDER} ASC, doc_id ASC) AS pos
    FROM documents
    """,
)
def shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into 8 training shards: shard =
    one hash, intra-shard order = an independent hash — the write-path
    op that produces byte-identical shuffled shards on every rerun.
    The single shuffle on shard is the partitioning the shard writer
    needs anyway (partitionBy('shard'))."""
    docs = load_table(spark, sf_dir, "documents")
    return S.shuffle_shards(docs, key="doc_id", n_shards=8).select(
        "doc_id", "shard", "pos"
    )


@register(
    "mix_weights",
    oracle=f"""
    WITH per AS (
        SELECT lang, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        FROM (SELECT lang, len({DUCK_TOKENS}) AS n_tokens FROM documents)
        GROUP BY lang
    )
    SELECT lang, n_docs, n_tokens,
           round(n_tokens / sum(n_tokens) OVER (), 6) AS natural_frac,
           round(1.0 / count(*) OVER (), 6) AS target,
           round((1.0 / count(*) OVER ())
                 / (n_tokens / sum(n_tokens) OVER ()), 4) AS repeat_factor
    FROM per
    """,
)
def mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture planning: per-language token mass -> natural share ->
    repeat factor to hit a uniform target share.  repeat_factor > 1
    up-samples (multiple epochs over the domain), < 1 down-samples —
    the data-mixing knob.  Two skinny aggregations; text is dropped
    after the token count so nothing wide shuffles."""
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", F.size(T.tokens("text")).alias("n_tokens")
    )
    return S.mix_weights(docs, domain="lang", n_tokens="n_tokens")


_H_MIX = duckdb_hash64("('m:' || CAST(d.doc_id AS VARCHAR))")


@register(
    "mix_apply",
    oracle=f"""
    WITH per AS (
        SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        FROM (SELECT lang, len({DUCK_TOKENS}) AS n_tokens
              FROM documents)
        GROUP BY lang
    ),
    w AS (
        SELECT lang,
               round((1.0 / count(*) OVER ())
                     / (n_tokens / sum(n_tokens) OVER ()), 4) AS r
        FROM per
    ),
    j AS (
        SELECT d.doc_id, d.lang,
               CAST(floor(w.r) AS BIGINT)
               + CASE WHEN {_H_MIX} % 10000
                           < CAST(round(w.r * 10000) AS BIGINT) % 10000
                      THEN 1 ELSE 0 END AS n_rep
        FROM documents d JOIN w USING (lang)
    )
    SELECT doc_id, lang,
           CAST(unnest(range(0, n_rep)) AS BIGINT) AS epoch_ordinal
    FROM j
    """,
)
def mix_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixing MATERIALIZER — the step #46 plans but nothing
    executed (the same planner→materializer gap #190 closed for
    seq_packing; r15 verdict task 6): emit the actual epoch doc
    stream a training run reads.  Each doc repeats
    floor(repeat_factor) times (epoch ordinals 0..floor-1); the
    FRACTIONAL remainder is realized per doc by a deterministic
    portable-hash threshold (hash('m:'||doc_id) % 10000 against the
    remainder in basis points), so the emitted per-domain doc mass
    converges to n_docs x repeat_factor with zero randomness — the
    same doc gets the extra epoch on every engine, every run, every
    corpus extension.  Output (doc_id, lang, epoch_ordinal) is the
    stream shuffle_shards (#45) shards and seq_packing_ids (#190)
    packs.

    Both engines compare INTEGERS (hash bp < round(r*10000) % 10000,
    both derived from the 4-decimal ROUNDED repeat_factor #46
    publishes) — no float threshold can disagree across engines.

    Scale shape: the per-domain weight table is broadcast-size by
    construction (|domains| rows — here |lang|); the corpus pass is
    ONE broadcast join + an epoch-ordinal explode, zero corpus
    shuffles (plan-asserted) — the explode multiplies rows by the
    mixture's mean repeat factor, which is the OUTPUT size, not an
    intermediate blow-up.  The empty-sequence WHEN guard keeps
    Spark's descending-sequence surprise out for n_rep = 0
    (down-sampled domains drop those docs entirely).
    reference scope: training-data pipeline extension (completes the
    mix chain #46 → #192 → #45/#190)."""
    docs = load_table(spark, sf_dir, "documents")
    w = S.mix_weights(
        docs.select("lang", F.size(T.tokens("text")).alias("n_tokens")),
        domain="lang",
        n_tokens="n_tokens",
    ).select("lang", "repeat_factor")
    base = F.floor("repeat_factor").cast("long")
    frac_bp = (
        F.round(F.col("repeat_factor") * 10000).cast("long") % 10000
    )
    h_bp = F.pmod(
        hash64(F.concat(F.lit("m:"), F.col("doc_id").cast("string"))),
        F.lit(10000),
    )
    n_rep = base + (h_bp < frac_bp).cast("long")
    epochs = F.when(
        n_rep >= 1,
        F.sequence(F.lit(0).cast("long"), n_rep - 1),
    ).otherwise(F.array().cast("array<bigint>"))
    return (
        docs.select("doc_id", "lang")
        .join(F.broadcast(w), "lang")
        .select(
            "doc_id", "lang", F.explode(epochs).alias("epoch_ordinal")
        )
    )


# ---- PII scrub ------------------------------------------------------
# Patterns restricted to the Java-regex ∩ RE2 common subset so both
# engines match identically.  The synthetic corpus has no natural PII,
# so plant it deterministically (same CASE on both engines): every 4th
# doc an email, every 6th a phone, every 5th an IPv4.
_RE_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_RE_PHONE = r"\d{3}-\d{4}(-\d+)?"
_RE_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_PLANT_SPARK = (
    "concat(text,"
    " CASE WHEN doc_id % 4 = 0 THEN"
    "  concat(' contact u', CAST(doc_id AS STRING), '@example.com') "
    "  ELSE '' END,"
    " CASE WHEN doc_id % 6 = 0 THEN"
    "  concat(' call 555-01', CAST(doc_id % 90 + 10 AS STRING)) "
    "  ELSE '' END,"
    " CASE WHEN doc_id % 5 = 0 THEN"
    "  concat(' host 10.0.', CAST(doc_id % 256 AS STRING), '.7') "
    "  ELSE '' END)"
)
_PLANT_DUCK = (
    "text ||"
    " CASE WHEN doc_id % 4 = 0 THEN"
    "  ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com'"
    "  ELSE '' END ||"
    " CASE WHEN doc_id % 6 = 0 THEN"
    "  ' call 555-01' || CAST(doc_id % 90 + 10 AS VARCHAR)"
    "  ELSE '' END ||"
    " CASE WHEN doc_id % 5 = 0 THEN"
    "  ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'"
    "  ELSE '' END"
)


@register(
    "pii_scrub",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_PLANT_DUCK} AS text FROM documents),
    red AS (
        SELECT doc_id, text,
               regexp_replace(regexp_replace(regexp_replace(text,
                   '{_RE_EMAIL}', '<EMAIL>', 'g'),
                   '{_RE_IP}', '<IP>', 'g'),
                   '{_RE_PHONE}', '<PHONE>', 'g') AS redacted
        FROM d
    )
    SELECT doc_id,
           len(regexp_extract_all(text, '{_RE_EMAIL}')) AS n_emails,
           len(regexp_extract_all(text, '{_RE_PHONE}')) AS n_phones,
           len(regexp_extract_all(text, '{_RE_IP}')) AS n_ips,
           length(redacted) AS red_len,
           substr(md5(redacted), 1, 8) AS red_sig
    FROM red
    """,
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction: count and mask emails / phone-like
    runs / IPv4s with engine-portable regexes.  Pure codegen map
    (regexp_extract_all + chained regexp_replace) — zero shuffles,
    zero Python; at 100 TB this is the shape you want for a scrub
    pass (scan-bound, pushdown-friendly, trivially parallel).
    Redaction order (email, ip, phone) is identical on both engines
    so red_sig proves byte-equal output."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.expr(_PLANT_SPARK)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, _RE_EMAIL, "<EMAIL>"),
            _RE_IP,
            "<IP>",
        ),
        _RE_PHONE,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(text, F.lit(_RE_EMAIL), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(text, F.lit(_RE_PHONE), F.lit(0))).alias(
            "n_phones"
        ),
        F.size(F.regexp_extract_all(text, F.lit(_RE_IP), F.lit(0))).alias(
            "n_ips"
        ),
        F.length(redacted).alias("red_len"),
        F.substring(F.md5(redacted), 1, 8).alias("red_sig"),
    )


_H_SPLIT = duckdb_hash64("('sp:' || CAST(doc_id AS VARCHAR))")


@register(
    "stratified_split",
    oracle=f"""
    SELECT doc_id, source,
           CASE WHEN rk <= (n * 8) // 10 THEN 'train'
                WHEN rk <= (n * 9) // 10 THEN 'val'
                ELSE 'test' END AS split
    FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                                  ORDER BY {_H_SPLIT} ASC, doc_id ASC)
                   AS rk,
               count(*) OVER (PARTITION BY source) AS n
        FROM documents
    )
    """,
)
def stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split stratified by
    source: exact integer cuts of each stratum's hash-ranked order,
    so every stratum holds its proportions to within one row (an
    independent-coin split leaves small strata with empty val/test).
    One window shuffle on source; the stratum size rides the same
    partition as a count(*) window — no join, no second pass."""
    docs = load_table(spark, sf_dir, "documents")
    return S.stratified_split(
        docs, strata="source", key="doc_id"
    ).select("doc_id", "source", "split")


from bugzilla_etl_spark.plans.queries_text import (  # noqa: E402
    bpe_encode_docs,
    bpe_tokenizer_map,
    duck_bpe_term_ids,
)


@register(
    "seq_packing_ids",
    oracle=f"""
    WITH {duck_bpe_term_ids()},
    dt AS (
        SELECT doc_id, source,
               coalesce(list_filter({DUCK_TOKENS}, t -> t <> ''),
                        []) AS tk
        FROM documents
    ),
    di AS (
        SELECT dp.doc_id,
               flatten(list(ti.ids ORDER BY dp.pos)) AS ids
        FROM (SELECT doc_id, unnest(tk) AS term,
                     unnest(range(1, len(tk) + 1)) AS pos
              FROM dt) dp
        JOIN term_ids ti ON ti.term = dp.term
        GROUP BY dp.doc_id
    ),
    base AS (
        SELECT dt.doc_id, dt.source,
               coalesce(di.ids, []) AS ids,
               len(coalesce(di.ids, [])) AS n_tokens
        FROM dt LEFT JOIN di ON di.doc_id = dt.doc_id
    ),
    laid AS (
        SELECT *,
               sum(n_tokens) OVER (
                   PARTITION BY source
                   ORDER BY {_H_PACK} ASC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS start
        FROM base
    ),
    tok AS (
        SELECT source, doc_id, unnest(ids) AS id,
               start + unnest(range(0, len(ids))) AS gpos
        FROM laid WHERE n_tokens > 0
    )
    SELECT source,
           CAST(gpos // 256 AS BIGINT) AS seq_id,
           CAST(count(*) AS BIGINT) AS seq_len,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           string_agg(CAST(id AS VARCHAR), ' ' ORDER BY gpos) AS ids
    FROM tok GROUP BY source, seq_id
    """,
)
def seq_packing_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-sequence MATERIALIZER — the step #44 plans and
    #188 feeds: documents are encoded to real BPE token ids
    (bpe_tokenizer_map/bpe_encode_docs, the #188 machinery), laid
    end-to-end per source stream in the IDENTICAL hash order as
    seq_packing (shared pack_sequences — the two entries' layouts
    agree by construction), and the actual 256-token training
    sequences are EMITTED: one row per (source, seq_id) carrying the
    packed id payload, its length (256 except each stream's tail),
    and how many docs it spans.  This is the write job of a
    pretraining data pipeline — tokenize → pack → (shuffle_shards
    #45 then shards it).

    Scale shape: encode is #188's map-only pass (zero corpus
    shuffles); the layout is one window cumsum per stream; the
    materialization explodes to TOKEN grain and regroups on
    (source, seq_id) — one token-grain shuffle, the honest and
    irreducible cost of physically writing training sequences, and
    it is keyed on exactly the layout the sequence writer needs
    (partitionBy(source) write).  Per-sequence state is bounded by
    the 256-token budget (collect_list of <= 256 (pos, id) structs —
    never a whole stream).
    reference scope: training-data pipeline extension (completes the
    tokenize→pack chain; pairs with #44/#45/#188)."""
    docs = load_table(spark, sf_dir, "documents")
    enc = bpe_encode_docs(
        docs.select("doc_id", "source", "text"),
        bpe_tokenizer_map(spark, docs),
        carry=("source",),
        ids_array=True,  # token-grain consumer: no string round-trip
    )
    laid = S.pack_sequences(
        enc, stream="source", key="doc_id", n_tokens="n_tokens",
        budget=256,
    )
    # The materializing shuffle moves each doc's ids ONCE, as
    # per-sequence ARRAY SLICES, not as one row per token: a doc
    # starting at _start with n tokens overlaps sequences
    # [_start div 256 .. (_start + n - 1) div 256] and contributes
    # exactly one contiguous id slice to each, computed map-side.
    # Rows crossing the wire number (docs + sequence crossings), not
    # tokens — same id payload bytes, a fraction of the row count —
    # and the regroup is still keyed on exactly the (source, seq_id)
    # write layout.  n_docs falls out as a plain count: one slice row
    # per (doc, sequence) pair replaces the token-grain
    # countDistinct, whose Expand fan-out doubled the exchange.
    sl = (
        laid.where(F.col("n_tokens") > 0)
        .select(
            "source",
            "ids",
            (F.col("seq_id") * 256 + F.col("offset_in_seq")).alias(
                "_start"
            ),
            "n_tokens",
        )
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform("
                    " sequence(_start div 256,"
                    "          (_start + n_tokens - 1) div 256),"
                    " s -> struct("
                    "   s AS seq_id,"
                    "   greatest(_start, s * 256) AS pos,"
                    "   slice(ids,"
                    "         cast(greatest(_start, s * 256) - _start + 1"
                    "              AS int),"
                    "         cast(least(_start + n_tokens, (s + 1) * 256)"
                    "              - greatest(_start, s * 256) AS int))"
                    "     AS part))"
                )
            ).alias("sl"),
        )
        .select(
            "source",
            F.col("sl.seq_id").alias("seq_id"),
            F.col("sl.pos").alias("_pos"),
            F.col("sl.part").alias("_ids"),
        )
    )
    return sl.groupBy("source", "seq_id").agg(
        F.sum(F.size("_ids")).cast("long").alias("seq_len"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.array_join(
            F.expr(
                "transform(flatten(transform("
                " array_sort(collect_list(struct(_pos, _ids))),"
                " s -> s._ids)), x -> cast(x AS string))"
            ),
            " ",
        ).alias("ids"),
    )
