"""Round-7 additions: layout, robust stats, graph, collocations.

Value parity vs DuckDB is covered by test_catalog_oracle for every
query here; these tests pin the PROPERTIES the operators promise
(locality bounds, first-fit invariants, score arithmetic, oriented
triangle enumeration) that a value hash alone would not explain.
"""

from __future__ import annotations

from bugzilla_etl_spark.plans import catalog


def _q(name, spark, sf_dir):
    catalog.load_all()
    return catalog.QUERIES[name](spark, sf_dir)


def test_zorder_buckets_are_local_in_both_dims(spark, sf_dir):
    """The point of z-ordering: every bucket's range is narrow in
    BOTH dimensions.  Bucket id = top 7 bits of the 20-bit key =
    x's top 3 bits + y's top 4 bits, so on the 0..1023 grid a
    bucket spans <= 127 in x and <= 63 in y BY CONSTRUCTION —
    violated means the interleave or normalization broke."""
    rows = _q("zorder_layout", spark, sf_dir).collect()
    assert rows, "no buckets"
    for r in rows:
        assert 0 <= r["zbucket"] < 128
        assert r["custkey_hi"] - r["custkey_lo"] <= 127, r
        assert r["day_hi"] - r["day_lo"] <= 63, r
    # and the layout actually spreads: more than one bucket occupied
    assert len(rows) > 8


def test_anomaly_mad_matches_numpy(spark, sf_dir):
    """Doubled-order-statistic median/MAD equals the classic numpy
    formulation per event_type (numpy median interpolates the same
    two middle elements)."""
    import numpy as np
    import pandas as pd  # noqa: F401

    got = {
        r["event_type"]: r
        for r in _q("anomaly_mad", spark, sf_dir).collect()
    }
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", "value")
        .toPandas()
    )
    for et, grp in ev.groupby("event_type"):
        v = grp["value"].to_numpy()
        med = np.median(v)
        mad = np.median(np.abs(v - med))
        r = got[et]
        assert r["n"] == len(v)
        assert abs(r["med"] - med) < 1e-6, (et, r["med"], med)
        assert abs(r["mad"] - mad) < 1e-6, (et, r["mad"], mad)
        n_out = int((np.abs(v - med) > 3 * mad).sum())
        assert r["n_outliers"] == n_out, (et, r["n_outliers"], n_out)


def test_triangle_count_oriented_and_bounded_plan(spark, sf_dir):
    """Plan shape: no cartesian product anywhere (the wedge/closure
    joins are keyed), and the backbone sparsification survives as a
    GlobalLimit node.  Values are oracle-checked; this pins the
    no-all-pairs contract."""
    df = _q("triangle_count", spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "GlobalLimit" in analyzed
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in physical
    rows = df.collect()
    # participation counts are positive and sorted desc
    cnts = [r["tri_cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    assert all(c > 0 for c in cnts)


def test_cooccurrence_pmi_score_arithmetic(spark, sf_dir):
    """The returned score IS the documented integer rational: score
    == c_ab * 10^12 div (c_a * c_b), and the min-count guard held."""
    rows = _q("cooccurrence_pmi", spark, sf_dir).collect()
    assert rows, "no collocations at this scale"
    for r in rows:
        assert r["c_ab"] >= 5
        assert r["score"] == (r["c_ab"] * 10**12) // (r["c_a"] * r["c_b"])
        a, b = r["pair"].split(" ")
        assert a and b


def test_compaction_plan_first_fit_invariants(spark, sf_dir):
    """Per source: bins are contiguous from 0, doc ranges do not
    overlap across bins, every byte is conserved, and each bin
    except the last starts strictly below the next target boundary
    (first-fit-in-order semantics)."""
    rows = _q("compaction_plan", spark, sf_dir).collect()
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("source")
        .agg({"n_chars": "sum", "doc_id": "count"})
        .collect()
    )
    totals = {
        r["source"]: (r["sum(n_chars)"], r["count(doc_id)"]) for r in docs
    }
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert set(by_src) == set(totals)
    for src, bins in by_src.items():
        bins.sort(key=lambda r: r["bin"])
        # bin ids start at 0 and strictly increase; they may
        # legitimately SKIP indices when a single file exceeds the
        # target (cum_before jumps more than one bin width)
        ids = [b["bin"] for b in bins]
        assert ids[0] == 0 and ids == sorted(set(ids))
        assert sum(b["bytes"] for b in bins) == totals[src][0]
        assert sum(b["n_files"] for b in bins) == totals[src][1]
        for prev, nxt in zip(bins, bins[1:]):
            assert prev["last_doc"] < nxt["first_doc"]


def test_stream_decontam_equals_batch(spark, sf_dir):
    """streaming == batch: the per-batch Bloom probe over the split
    landing files reproduces bloom_decontam's frame exactly."""
    batch = {
        r["doc_id"]: r for r in _q("bloom_decontam", spark, sf_dir).collect()
    }
    stream = _q("stream_decontam", spark, sf_dir).collect()
    assert len(stream) == len(batch)
    for r in stream:
        b = batch[r["doc_id"]]
        assert (r["n_shingles"], r["n_hits"], r["flagged"]) == (
            b["n_shingles"],
            b["n_hits"],
            b["flagged"],
        ), r


def test_embedding_pca_direction_quality(spark, sf_dir):
    """The integer power iteration lands close to the true
    between-class principal direction (float SVD of the centered
    label-centroid matrix), and the L-inf normalization contract
    holds (max |weight| == 10^6)."""
    import numpy as np

    rows = _q("embedding_pca", spark, sf_dir).collect()
    v = np.array(
        [r["weight"] for r in sorted(rows, key=lambda r: r["dim"])],
        dtype=np.float64,
    )
    assert len(v) == 64
    assert int(np.abs(v).max()) == 10**6
    df = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("label", "embedding")
        .toPandas()
    )
    A = np.array(df["embedding"].tolist(), dtype=np.float64)
    lab = df["label"].to_numpy()
    cents = np.array([A[lab == l].mean(0) for l in np.unique(lab)])
    C = cents - cents.mean(0)
    pc1 = np.linalg.svd(C, full_matrices=False)[2][0]
    cos = abs(v @ pc1) / (np.linalg.norm(v) * np.linalg.norm(pc1))
    assert cos >= 0.9, cos


def test_profile_table_matches_pandas(spark, sf_dir):
    """Profile rows equal per-column pandas stats (exact NDV, null
    count, numeric/text min-max routing)."""
    rows = {r["col_name"]: r for r in _q("profile_table", spark, sf_dir).collect()}
    pdf = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    assert set(rows) == {
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
        "o_orderstatus", "o_orderpriority",
    }
    for col, r in rows.items():
        s = pdf[col]
        assert r["n"] == len(s)
        assert r["n_null"] == int(s.isna().sum())
        assert r["ndv"] == s.nunique()
        if col in ("o_orderstatus", "o_orderpriority"):
            assert r["min_num"] is None and r["max_num"] is None
            assert r["min_str"] == s.min() and r["max_str"] == s.max()
        else:
            assert r["min_str"] is None and r["max_str"] is None
            assert r["min_num"] is not None and r["max_num"] is not None
            assert r["min_num"] <= r["max_num"]


def test_skyline_orders_is_exact_pareto_set(spark, sf_dir):
    """Brute-force O(n^2) domination check: the returned set is
    EXACTLY the Pareto frontier under (day min, price max)."""
    import numpy as np

    got = {r["o_orderkey"] for r in _q("skyline_orders", spark, sf_dir).collect()}
    pdf = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    day = (pdf["o_orderdate"].astype("int64") // 10**9 // 86400).to_numpy()
    price = pdf["o_totalprice"].to_numpy()
    key = pdf["o_orderkey"].to_numpy()
    n = len(key)
    dominated = np.zeros(n, dtype=bool)
    for i in range(n):
        dom = (
            (day <= day[i])
            & (price >= price[i])
            & ((day < day[i]) | (price > price[i]))
        )
        dominated[i] = dom.any()
    expect = set(key[~dominated].tolist())
    assert got == expect


def test_compact_store_reduces_files_preserves_content(spark, sf_dir):
    """The executed compaction cycle: fewer files (>=2x at this
    smallest scale; ~8x at sf0.01 where sources hold more docs) and
    exact content preservation (ids a permutation, sizes conserved;
    the catalog oracle re-checks the same invariant vs DuckDB)."""
    from bugzilla_etl_spark.plans.queries_engine import compact_documents

    out, stats = compact_documents(spark, sf_dir)
    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        (r["doc_id"], r["source"], r["n_chars"]) for r in out.collect()
    )
    want = sorted(
        (r["doc_id"], r["source"], r["n_chars"])
        for r in src.select("doc_id", "source", "n_chars").collect()
    )
    assert got == want
    assert stats["files_after"] * 2 <= stats["files_before"], stats


def test_bloom_join_prune_no_false_negatives(spark, sf_dir):
    """The Bloom prune may over-admit (deterministic FPs) but can
    never drop a real match: n_matched equals the exact semi-join
    count, and candidates always contain the matches."""
    r = _q("bloom_join_prune", spark, sf_dir).collect()[0]
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cu = spark.read.parquet(f"{sf_dir}/customer.parquet")
    from pyspark.sql import functions as F

    exact = (
        od.join(
            cu.where(F.col("c_mktsegment") == "BUILDING"),
            od.o_custkey == cu.c_custkey,
            "left_semi",
        ).count()
    )
    assert r["n_matched"] == exact
    assert r["n_candidates"] >= r["n_matched"]
    assert r["n_orders"] == od.count()


def test_frequent_pairs_support_and_bruteforce(spark, sf_dir):
    """Every returned pair meets the relative support threshold, and
    the top pair matches a brute-force pandas count."""
    import itertools

    rows = _q("frequent_pairs", spark, sf_dir).collect()
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .toPandas()
    )
    n_baskets = li["l_orderkey"].nunique()
    minsup = max(n_baskets // 1000, 2)
    counts: dict = {}
    for _, grp in li.groupby("l_orderkey"):
        for a, b in itertools.combinations(sorted(grp["l_suppkey"]), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    for r in rows:
        assert r["support"] >= minsup
        assert counts[(r["s1"], r["s2"])] == r["support"]
    if rows and counts:
        best = max(counts.values())
        assert rows[0]["support"] == best


def test_round7_plan_shapes(spark, sf_dir):
    """Physical-plan contracts for the round-7 family:
    - profile_table really multi-distincts through ONE Expand (one
      scan), not per-column scans;
    - anomaly_mad's two rank passes + aggregates share ONE
      event_type exchange (the snapshot-family single-shuffle
      contract);
    - bloom_join_prune's probe adds NO join — the only join in the
      plan is the exact verification semi/left join;
    - zorder_layout's normalization is a broadcast (1-row min/max),
      never a shuffle join."""
    plans = {
        name: _q(name, spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        for name in (
            "profile_table",
            "anomaly_mad",
            "bloom_join_prune",
            "zorder_layout",
        )
    }
    # r16 contract: the multi-distinct still fans through ONE Expand,
    # but the string min/max extremes live in a SEPARATE grouping-free
    # pass (their non-fixed-width buffers demoted the whole Expand
    # stack to SortAggregate) — so exactly TWO scans, the second
    # pruned to only the string columns, and NO sort-based aggregate
    # anywhere (the point of the split: the melt path hash-aggregates).
    pt = plans["profile_table"]
    assert pt.count("Expand") >= 1
    assert pt.count("Scan parquet") == 2
    assert (
        "ReadSchema: struct<o_orderstatus:string,o_orderpriority:string>"
        in pt
    )
    # every sort-based aggregate must be the string-extremes pass
    # (min/max string buffers are not fixed-width, so that pass is
    # legitimately sort-based); the Expand melt itself must never be
    for line in pt.splitlines():
        if "SortAggregate" in line:
            assert "o_orderstatus" in line, line

    mad = plans["anomaly_mad"]
    import re

    ex_keys = re.findall(r"Exchange hashpartitioning\((\w+)#", mad)
    assert ex_keys.count("event_type") == 1, ex_keys

    bj = plans["bloom_join_prune"]
    n_joins = sum(
        bj.count(k)
        for k in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
    )
    assert n_joins == 1, bj[:500]

    zo = plans["zorder_layout"]
    assert "BroadcastNestedLoopJoin" in zo or "BroadcastExchange" in zo
    assert "SortMergeJoin" not in zo


def test_stream_attribution_equals_batch_join(spark, sf_dir):
    """streaming == batch for the stream-stream interval join: the
    append-mode result set equals the batch interval join exactly
    (same pairs, same gaps), across real interleaved micro-batches."""
    from pyspark.sql import functions as F

    got = sorted(
        (r["user_id"], r["purchase_id"], r["click_id"], r["gap_s"])
        for r in _q("stream_attribution", spark, sf_dir).collect()
    )
    from bugzilla_etl_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("cts"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    want = sorted(
        (r["user_id"], r["purchase_id"], r["click_id"], r["gap_s"])
        for r in p.join(
            c,
            (p.user_id == c.cu)
            & (c.cts <= p.pts)
            & (c.cts >= p.pts - F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            "user_id",
            "purchase_id",
            "click_id",
            F.expr(
                "(unix_micros(pts) - unix_micros(cts)) div 1000000"
            ).alias("gap_s"),
        )
        .collect()
    )
    assert got == want
    assert got, "no attribution pairs at this scale"


def test_profile_table_merge_semantics(spark, sf_dir):
    """Which profile columns are MERGEABLE across incremental runs:
    count/nulls sum, min/max fold — a split profile recombines to
    the whole-table answer for those — while exact NDV does NOT
    merge (distinct sets overlap), which is precisely why
    hll_distinct (max-mergeable registers) is the documented scale
    path for the NDV column."""
    from pyspark.sql import functions as F

    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    whole = {r["col_name"]: r for r in _q("profile_table", spark, sf_dir).collect()}
    halves = [
        od.where(F.col("o_orderkey") % 2 == i).agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("o_custkey").alias("ndv"),
            F.min("o_custkey").alias("mn"),
            F.max("o_custkey").alias("mx"),
        ).collect()[0]
        for i in (0, 1)
    ]
    r = whole["o_custkey"]
    assert halves[0]["n"] + halves[1]["n"] == r["n"]
    assert min(halves[0]["mn"], halves[1]["mn"]) == r["min_num"]
    assert max(halves[0]["mx"], halves[1]["mx"]) == r["max_num"]
    # NDV does not merge by addition (overlapping key sets)
    assert halves[0]["ndv"] + halves[1]["ndv"] > r["ndv"]


def test_partition_prune_stats_locality_properties(spark, sf_dir):
    """The layout trade, as invariants rather than pinned counts:
    an x-sorted layout cannot skip anything for a y-only predicate
    (every bucket spans all y), z-order skips in BOTH dimensions,
    and the conjunctive predicate touches no more z-buckets than
    either single-dimension predicate."""
    rows = {
        (r["layout"], r["predicate"]): r
        for r in _q("partition_prune_stats", spark, sf_dir).collect()
    }
    total = rows[("xsort", "y_range")]["buckets_total"]
    # an x-sorted bucket spans ~the full y range with high
    # probability (uncorrelated dims), but a sparse bucket can
    # occasionally miss the y window — near-total, not exact-total
    xs_y = rows[("xsort", "y_range")]["buckets_touched"]
    z_y = rows[("zorder", "y_range")]["buckets_touched"]
    assert xs_y >= (9 * total) // 10
    assert z_y < xs_y  # z-order actually skips where x-sort cannot
    zx = rows[("zorder", "x_range")]["buckets_touched"]
    zy = z_y
    zb = rows[("zorder", "both")]["buckets_touched"]
    assert zb <= min(zx, zy)
    assert rows[("xsort", "x_range")]["buckets_touched"] < total
