"""Plan-shape assertions: the scale story, checked mechanically.

These tests read ``explain`` output and fail if a plan regresses into
a shape that would not survive 100 TB: missing pushdown, missing
broadcast, redundant exchanges.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bugzilla_etl_spark.operators import snapshot as S
from bugzilla_etl_spark.sources import load_table


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# foreachBatch / memory-sink / store-lifecycle queries whose builder
# runs real jobs; executed-plan text is not a pure function of the
# logical query for them (shared by the fleet sweeps below).
SKIP_EXECUTING = {
    "stream_snapshot",
    "stream_rollup",
    "stream_sessionize",
    "stream_dedup",
    "stream_previous_values",
    "stream_bug_versions",
    "stream_heavy_hitters",
    "stream_neardup_ingest",
    "stream_hll",
    "stream_decontam",
    "stream_attribution",
    "stream_attribution_outer",
    "alias_compact",
    "compact_store",
    "es_file_extract",
    "es_alias_cutover",
    "bucketed_join_zero_shuffle",
}


import pytest


@pytest.fixture(scope="module")
def catalog_plans(spark, sf_dir):
    """ONE catalog sweep shared by every fleet-wide plan test: each
    query's frame is built once and its formatted / analyzed /
    executed plan strings derived from that single build.  The four
    sweeps previously re-built all 185 frames each (~650 s of the
    suite — the single biggest reason VERIFY_r16 timed out at ~75%);
    the assertions are unchanged, only the frame construction is
    shared.  ``executed`` is None for SKIP_EXECUTING entries."""
    from bugzilla_etl_spark.plans import catalog

    catalog.load_all()
    plans = {}
    for name, fn in sorted(catalog.QUERIES.items()):
        df = fn(spark, sf_dir)
        qe = df._jdf.queryExecution()
        formatted = _plan(df)
        analyzed = qe.analyzed().toString()
        executed = (
            qe.executedPlan().toString()
            if name not in SKIP_EXECUTING
            else None
        )
        plans[name] = (formatted, analyzed, executed)
    return plans


def test_snapshot_versions_single_exchange(spark, sf_dir):
    """The whole SCD2 build must need exactly ONE shuffle (on user_id)."""
    import re

    ev = load_table(spark, sf_dir, "events")
    plan = _plan(S.snapshot_versions(ev))
    # count operator-detail headers like "(4) Exchange", not tree echoes
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    """A 2-column projection must scan 2 columns, not the whole table."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    plan = _plan(li)
    assert "ReadSchema" in plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read and "l_quantity" in read
    assert "l_extendedprice" not in read, read


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") < 5)
    plan = _plan(li)
    assert "PushedFilters" in plan
    assert "LessThan(l_quantity" in plan, plan


def test_incremental_touched_broadcasts(spark, sf_dir):
    """The touched-entity semi-join must broadcast the small side —
    shuffling 100 TB of history to join a tiny touched set is the
    canonical scale failure."""
    ev = load_table(spark, sf_dir, "events")
    plan = _plan(S.incremental_touched(ev, 0))
    assert "BroadcastExchange" in plan, plan


def test_tpch_q5_all_dims_broadcast(spark, sf_dir):
    """At test SF the star join must broadcast every dimension side —
    a SortMergeJoin here means AQE/stats failed and the fact table
    shuffles per dim.  But the broadcasts must come from EVIDENCE,
    not hints: only the constant-size nation/region dims may carry
    ResolvedHints (a hinted year-of-orders/customer/supplier build
    side OOMs at 100-TB TPC-H instead of degrading)."""
    import re

    from bugzilla_etl_spark.plans import catalog

    catalog.load_all()
    df = catalog.QUERIES["tpch_q5"](spark, sf_dir)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) >= 4, plan
    analyzed = df._jdf.queryExecution().analyzed().toString()
    lines = analyzed.splitlines()
    hints = [i for i, l in enumerate(lines) if "ResolvedHint" in l]
    assert len(hints) == 2, analyzed
    for i in hints:
        below = "\n".join(lines[i + 1 : i + 3])
        assert "n_nationkey" in below or "r_regionkey" in below, below


def _hinted_subtrees(analyzed: str):
    """Yield the subtree lines under each BROADCAST ResolvedHint in
    an analyzed plan string (tree indentation: children are deeper).

    strategy=merge hints are excluded by design: the bounded-subtree
    policy exists because a forced broadcast BUILD SIDE OOMs when
    the relation outgrows memory, but a merge hint forces
    SortMergeJoin — no build side, graceful degradation — and is
    exactly what pins a co-located bucketed join against AQE's
    small-SF broadcast preference (bucketed_join_zero_shuffle)."""
    lines = analyzed.splitlines()
    for i, l in enumerate(lines):
        if "ResolvedHint" not in l or "strategy=merge" in l:
            continue
        indent = len(l) - len(l.lstrip(" :+-"))
        sub = []
        for m in lines[i + 1 :]:
            mi = len(m) - len(m.lstrip(" :+-"))
            if mi <= indent:
                break
            sub.append(m)
        yield sub


def test_tpch_fleet_no_raw_fact_hints(catalog_plans):
    """Policy test over EVERY tpch_* query: no broadcast-hint subtree
    may scan orders/lineitem/customer/supplier/part raw (filters
    don't bound a table that scales with SF — the q10/q3/q5 lesson).
    Only the constant-size nation/region relations — or a subtree
    rooted at a SCALAR aggregate (no grouping keys => exactly one row
    at any SF, e.g. q22's avg-balance) — may sit under a hint."""
    import re

    offenders = []
    for name, (_f, analyzed, _e) in sorted(catalog_plans.items()):
        if not name.startswith("tpch_"):
            continue
        for sub in _hinted_subtrees(analyzed):
            top = sub[0] if sub else ""
            # scalar Aggregate: single bracket group (grouped aggs
            # print "Aggregate [keys], [exprs]")
            if re.search(r"Aggregate \[", top) and "], [" not in top:
                continue
            for m in sub:
                if "Relation" not in m:
                    continue
                if any(
                    c in m
                    for c in (
                        "o_orderkey#", "l_orderkey#", "c_custkey#",
                        "s_suppkey#", "p_partkey#",
                    )
                ):
                    offenders.append((name, m.strip()[:80]))
    assert not offenders, offenders


def test_minhash_no_cartesian(spark, sf_dir):
    """LSH banding must join on (band, key) — any cartesian/NLJ of the
    doc table against itself is the O(n²) failure mode."""
    from bugzilla_etl_spark.operators.dedup import minhash_lsh_pairs
    from bugzilla_etl_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(minhash_lsh_pairs(docs))
    assert "CartesianProduct" not in plan, plan


def test_catalog_no_smj_no_cartesian(catalog_plans):
    """Fleet-wide plan audit: NO query in the catalog may plan a
    SortMergeJoin (a dim failed to broadcast) or a CartesianProduct
    (unkeyed pair generation).  Explain-only — nothing executes.

    Allowlist: dedup_components' label-propagation joins are BIG-BIG
    by construction (labels has one row per corpus node — never
    broadcastable at 100 TB), so SMJ on the node id is the plan we
    WANT there; whether explain shows it depends on whether the
    per-round persists have materialized stats yet.  Cartesian stays
    forbidden for it."""
    import re

    # bug_version_full joins two per-(entity, version) aggregates back
    # to the version spine — both sides scale with the corpus, so SMJ
    # on the co-partitioned key is the intended plan there too.
    # tpch_q8: the ⋈customer join pairs the order-grain fact stream
    # with the EU-filtered customer table — BOTH scale with SF (a
    # fifth of billions of customers at 100-TB TPC-H is not
    # broadcastable), so the statically-planned SMJ on custkey is the
    # shape we want; AQE promotes to broadcast at small SF where the
    # filtered side measures under the threshold.
    # cc_fuzzy_match: lost ⋈ remaining pairs two slices of the same
    # per-(entity, email) aggregate — BOTH scale with the number of
    # entities, so the static SMJ on the entity key is the intended
    # big-big shape (AQE promotes to broadcast at test SF where the
    # slices measure small).  Cartesian stays forbidden: the join IS
    # keyed on the entity.
    # semdedup: embeddings ⋈ kmeans assignment on vec_id — both sides
    # are corpus-sized (the assignment has one row per vector), so
    # the id-keyed SMJ is the intended shape.
    # flag_fuzzy_match: removals ⋈ current flags on the entity key —
    # both lists scale with the entity count (same class as
    # cc_fuzzy_match's lost ⋈ remaining).
    # decontam_neardup: the corpus ⋈ candidate-ids semi join (the
    # verify-only-hits reduction) pairs the full corpus with a
    # COMPUTED id set whose size the static planner cannot know —
    # SMJ on the id is the safe static shape; AQE promotes to
    # broadcast at runtime when the candidate set measures small
    # (it is band-collision-bounded, but only at runtime).
    # pagerank_trade: the per-iteration edges⋈ranks join pairs the
    # corpus-scale edge list with a one-row-per-NODE rank frame —
    # at graph scale neither side broadcasts (the dedup_components
    # class), so SMJ on src is the intended shape; AQE promotes to
    # broadcast at test SF from measured sizes when stats are
    # visible, but the static plan may not see them.
    # bucketed_join_zero_shuffle: the SMJ is the DEMONSTRATION — a
    # co-located bucketed fact⋈fact join whose merge-sorted scans
    # replace the exchange; its own plan test pins the zero-shuffle
    # property.
    # kmv_source_overlap: the EXACT-Jaccard side joins two slices of
    # the corpus-scale distinct (source, token-hash) relation on the
    # hash — both sides scale with the corpus, so the key-wise SMJ
    # is the intended big-big shape (the cc_fuzzy_match class); at
    # 100 TB you run only the k-row sketches, which never SMJ.
    smj_ok = {
        "kmv_source_overlap",
        "dedup_components",
        "pagerank_trade",
        "bug_version_full",
        "tpch_q8",
        "cc_fuzzy_match",
        "semdedup",
        "flag_fuzzy_match",
        "decontam_neardup",
        "bucketed_join_zero_shuffle",
    }
    offenders = []
    for name, (plan, _a, _e) in sorted(catalog_plans.items()):
        if name not in smj_ok and re.search(r"\(\d+\) SortMergeJoin", plan):
            offenders.append((name, "SortMergeJoin"))
        if "CartesianProduct" in plan:
            offenders.append((name, "CartesianProduct"))
    assert not offenders, offenders


def test_replicate_pending_no_shuffle_of_source(spark, sf_dir):
    """Watermark filter = broadcast 1-row agg; the source side must not
    be hash-exchanged."""
    ev = load_table(spark, sf_dir, "events")
    dest = ev.where(F.col("user_id") < 50)
    plan = _plan(S.replicate_pending(ev, dest))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "hashpartitioning(event_id" not in plan


def test_pii_scrub_map_only(spark, sf_dir):
    """The scrub pass is a pure scan->project map: ANY exchange means
    a 100 TB redaction job shuffles the corpus for nothing."""
    from bugzilla_etl_spark.plans.queries_sampling import pii_scrub

    plan = _plan(pii_scrub(spark, sf_dir))
    assert "Exchange" not in plan, plan


def test_sampling_ops_single_exchange(spark, sf_dir):
    """quota_sample / seq_packing / shuffle_shards each need exactly
    one hash exchange (their window key) — the shard shuffle doubles
    as the sink partitioning, so a second exchange is pure waste."""
    import re

    from bugzilla_etl_spark.plans import queries_sampling as QS

    for fn in (QS.quota_sample, QS.seq_packing, QS.shuffle_shards):
        plan = _plan(fn(spark, sf_dir))
        n = len(re.findall(r"\(\d+\) Exchange", plan))
        assert n == 1, (fn.__name__, n, plan)


def test_curate_corpus_composition_shape(spark, sf_dir):
    """The composed curation pipeline must stay one declarative plan:
    four column-pruned scans (one per stage branch — dedup hash,
    token stats, bigram stats, pii/text), and no more exchanges than
    the stages themselves require (2 bigram aggs + dedup-hash window
    + quota window); doc_id joins broadcast at this SF."""
    from bugzilla_etl_spark.plans import catalog

    catalog.load_all()
    plan = (
        catalog.QUERIES["curate_corpus"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") <= 4, plan
    assert plan.count("Exchange hashpartitioning") <= 4, plan
    assert "CartesianProduct" not in plan


def test_previous_values_single_exchange(spark, sf_dir):
    """Five window passes (prior-value, change-detect, prior-change-ts,
    record, carry) must share ONE entity shuffle — stacked WindowExec
    over the same (user_id x (ts, event_id)) sort, no per-field or
    per-pass exchange."""
    import re

    ev = load_table(spark, sf_dir, "events")
    plan = _plan(S.previous_values(ev, fields=("click", "purchase")))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_winnow_selection_is_map_local(spark, sf_dir):
    """Winnowing's fingerprint SELECTION must be row-local (numpy
    sliding-min in the Arrow pass — no WindowExec, no shuffle of the
    raw k-gram stream); only the skinny selected-fingerprint
    df agg/join and the per-doc rollup may exchange."""
    import re

    from bugzilla_etl_spark.operators.text import winnow_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(winnow_fingerprints(docs))
    assert "Window" not in plan, plan
    n = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n <= 4, f"{n} exchanges\n{plan}"


def test_tpch_q6_filters_all_pushed(spark, sf_dir):
    """Every Q6 predicate must reach the parquet scan as a pushed
    filter — the row-group-skipping contract at 100 TB."""
    from bugzilla_etl_spark.plans import catalog

    catalog.load_all()
    plan = _plan(catalog.QUERIES["tpch_q6"](spark, sf_dir))
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    for frag in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount",
        "LessThanOrEqual(l_discount",
        "LessThan(l_quantity",
    ):
        assert frag in pushed, (frag, pushed)


def test_tpch_q10_aggregates_before_customer_join(spark, sf_dir):
    """Q10's revenue aggregation must sit BELOW the customer join
    (shuffle one row per custkey, not per lineitem), and NO fact-sized
    side (orders, customer) may carry an explicit broadcast hint — a
    forced broadcast of a 3-month orders slice OOMs at 100-TB TPC-H;
    AQE may promote at runtime, but only from evidence, not a hint."""
    from bugzilla_etl_spark.plans import catalog

    catalog.load_all()
    df = catalog.QUERIES["tpch_q10"](spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()

    # Exactly ONE broadcast hint, and it sits directly above the
    # 25-row nation dim — orders and customer are unhinted.
    hints = [
        i
        for i, line in enumerate(analyzed.splitlines())
        if "ResolvedHint" in line
    ]
    lines = analyzed.splitlines()
    assert len(hints) == 1, analyzed
    assert "n_nationkey" in lines[hints[0] + 1], analyzed

    # Aggregate-below-join, asserted as an actual tree relationship:
    # in the analyzed tree parents print before children, so the
    # customer join (on o_custkey = c_custkey) must appear BEFORE the
    # Aggregate on o_custkey, which must appear BEFORE the
    # lineitem⋈orders join it consumes.
    cust_join = analyzed.find("Join Inner, (o_custkey")
    agg = analyzed.find("Aggregate [o_custkey")
    fact_join = analyzed.find("Join Inner, (l_orderkey")
    assert -1 < cust_join < agg < fact_join, analyzed


def test_tpch_q14_pushdown_and_no_hints(spark, sf_dir):
    """Q14: the date filter must reach the lineitem scan, and part —
    which scales with SF — must carry NO broadcast hint (AQE promotes
    from size evidence when it fits)."""
    from bugzilla_etl_spark.plans import catalog

    catalog.load_all()
    df = catalog.QUERIES["tpch_q14"](spark, sf_dir)
    assert "ResolvedHint" not in df._jdf.queryExecution().analyzed().toString()
    plan = _plan(df)
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "GreaterThanOrEqual(l_shipdate" in pushed, pushed
    assert "LessThan(l_shipdate" in pushed, pushed


def test_tpch_q18_semi_join_below_aggregate_no_hints(spark, sf_dir):
    """Q18: no broadcast hints anywhere (lineitem/orders/customer all
    fact-sized at scale), and the HAVING aggregate feeds a LeftSemi
    join that sits BELOW the outer per-order aggregate."""
    from bugzilla_etl_spark.plans import catalog

    catalog.load_all()
    df = catalog.QUERIES["tpch_q18"](spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, analyzed
    semi = analyzed.find("Join LeftSemi")
    outer_agg = analyzed.find("Aggregate [l_orderkey")
    assert -1 < outer_agg < semi, analyzed  # parents print first


def test_tpch_q7_only_nation_hinted(spark, sf_dir):
    """Q7: exactly two broadcast hints, both directly above the 25-row
    nation dim; the nation-filtered supplier/customer sides scale with
    SF and must stay unhinted."""
    from bugzilla_etl_spark.plans import catalog

    catalog.load_all()
    df = catalog.QUERIES["tpch_q7"](spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    lines = analyzed.splitlines()
    hints = [i for i, l in enumerate(lines) if "ResolvedHint" in l]
    assert len(hints) == 2, analyzed
    for i in hints:
        below = "\n".join(lines[i + 1 : i + 3])
        assert "n_nationkey" in below, below


def test_tpch_q15_q17_no_hints_single_fact_strategy(spark, sf_dir):
    """q15/q17: no broadcast hints anywhere (supplier/part scale with
    SF).  q15's scalar max is a global aggregate crossJoined back —
    NOT an empty-partition window (single-task sort of the
    SF-scaling per-supplier aggregate) — and the revenue shuffle is
    REUSED between the two branches (AQE ReusedExchange: one
    physical lineitem scan feeds both revenue and its max).
    q17's decorrelated average is a second, column-pruned lineitem
    scan (the standard shape) — exactly two."""
    from bugzilla_etl_spark.plans import catalog

    catalog.load_all()
    q15 = catalog.QUERIES["tpch_q15"](spark, sf_dir)
    q17 = catalog.QUERIES["tpch_q17"](spark, sf_dir)
    assert (
        "ResolvedHint"
        not in q17._jdf.queryExecution().analyzed().toString()
    )
    # q15's single allowed hint is the 1-row scalar-max aggregate
    # (bounded by construction — the catalog-wide hint-policy test
    # checks the Aggregate-in-subtree rule for it too)
    analyzed15 = q15._jdf.queryExecution().analyzed().toString()
    assert analyzed15.count("ResolvedHint") == 1, analyzed15
    q15.collect()  # AQE finalizes; reuse is a runtime decision
    final15 = (
        q15._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert final15.count("lineitem.parquet") == 1, final15
    assert "ReusedExchange" in final15, final15
    assert _plan(q17).count("lineitem.parquet") == 2


def test_catalog_no_unbounded_broadcast_hints(catalog_plans):
    """Catalog-wide hint policy: every ResolvedHint subtree must be
    BOUNDED — it contains an Aggregate/Deduplicate/Window/Limit node
    (derived dims: touched sets, mappings, df caps, watermarks,
    indexes) or scans only the constant-size nation/region dims.
    A hint whose subtree reaches a raw scaling relation is a forced
    build side that OOMs at 100 TB (the q10/q3/q5/jaccard-sizes
    defect class, all removed in round 6).

    Whitelist: the ANN operators broadcast their QUERY set and
    decontam_neardup its EVAL set's bands/shingles — bounded by
    workload semantics (a fixed query batch / an MB-scale eval
    closure, the same asymmetry contract as decontam_overlap), not
    by an aggregate; the every-Nth filters are test synthesis."""
    # 'Distinct' is NOT in this list on purpose: analyzed plans print
    # distinct() as 'Deduplicate'.
    BOUNDING = ("Aggregate", "Deduplicate", "GlobalLimit", "Window")
    WORKLOAD_BOUNDED = {"ann_ivf", "ann_ivf_nprobe", "decontam_neardup"}
    offenders = []
    for name, (_f, analyzed, _e) in sorted(catalog_plans.items()):
        if name in WORKLOAD_BOUNDED:
            continue
        for sub in _hinted_subtrees(analyzed):
            # The bounding node must come BEFORE every scanned
            # relation in the printed subtree (parents/left-siblings
            # print first): a Relation appearing before the first
            # bounding node is NOT below it — e.g. the fact side of
            # broadcast(fact ⋈ small_agg) — and substring membership
            # over the whole subtree would green-light exactly the
            # forced-fact-build defect this test exists to prevent.
            first_bound = next(
                (
                    i
                    for i, l in enumerate(sub)
                    if any(b in l for b in BOUNDING)
                ),
                len(sub),
            )
            bad = [
                l
                for l in sub[:first_bound]
                if "Relation" in l
                and "n_nationkey#" not in l
                and "r_regionkey#" not in l
            ]
            if bad:
                offenders.append((name, bad[0].strip()[:80]))
    assert not offenders, offenders


def test_tpch_q4_semi_join_pushdown(spark, sf_dir):
    """Q4's EXISTS must plan as ONE LeftSemi join (no distinct
    pre-agg, no subquery re-execution) with the correlated date
    inequality folded into the join condition, and the quarter filter
    pushed to the orders scan."""
    from bugzilla_etl_spark.plans import catalog

    catalog.load_all()
    df = catalog.QUERIES["tpch_q4"](spark, sf_dir)
    plan = _plan(df)
    assert "LeftSemi" in plan, plan
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "GreaterThanOrEqual(o_orderdate" in pushed, pushed
    assert "LessThan(o_orderdate" in pushed, pushed


def test_tpch_q19_implied_conjuncts_pushed(spark, sf_dir):
    """Q19's cross-table disjunction cannot be pushed whole, so the
    IMPLIED single-table conjuncts must reach both scans: the 3-brand
    IN-list on the part side and the covering quantity envelope on
    the lineitem side (the textbook Q19 rewrite)."""
    from bugzilla_etl_spark.plans import catalog

    catalog.load_all()
    df = catalog.QUERIES["tpch_q19"](spark, sf_dir)
    plan = _plan(df)
    scans = plan.split("PushedFilters:")
    pushed_all = "".join(s.splitlines()[0] for s in scans[1:])
    assert "In(p_brand" in pushed_all, pushed_all
    assert "GreaterThanOrEqual(l_quantity,1.0)" in pushed_all, pushed_all
    assert "LessThanOrEqual(l_quantity,40.0)" in pushed_all, pushed_all


def test_tpch_q2_window_reuses_join_key_and_limit_shape(spark, sf_dir):
    """Q2's decorrelated min must NOT add an exchange beyond the joins
    it sits on (window key = the part-join key), and the ORDER+LIMIT
    must plan as TakeOrderedAndProject, never a global Sort of the
    eligible set."""
    from bugzilla_etl_spark.plans import catalog

    catalog.load_all()
    import re

    plan = _plan(catalog.QUERIES["tpch_q2"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    # the window's required distribution is ps_partkey — the same key
    # the part join shuffles on (or broadcast-satisfies): at test SF
    # every join broadcasts, so AT MOST the window's own ps_partkey
    # exchange may appear; a second hashpartitioning exchange means
    # the window re-keyed away from the join key (measured: 0 today)
    assert plan.count("Window") >= 1
    n_ex = len(re.findall(r"\(\d+\) Exchange hashpartitioning", plan))
    assert n_ex <= 1, f"{n_ex} exchanges\n{plan}"
    assert "CartesianProduct" not in plan


def test_tpch_q9_partsupp_derivation_map_only(spark, sf_dir):
    """The derived partsupp feeding Q9 must be generator+project over
    the part scan (one 1-row broadcast scalar for the supplier
    count) — ANY hash exchange inside the derivation means the
    synthesis itself shuffles, which would be pure waste at 4x|part|
    rows.  The red-part filter must reach the part scan pushed."""
    import re

    from bugzilla_etl_spark.sources.derived import partsupp

    plan = _plan(partsupp(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Exchange hashpartitioning", plan)) == 0, plan
    assert re.search(r"\(\d+\) Generate", plan), plan

    from bugzilla_etl_spark.plans import catalog

    catalog.load_all()
    qplan = _plan(catalog.QUERIES["tpch_q9"](spark, sf_dir))
    # the red-part filter must be pushed INTO a part.parquet scan's
    # PushedFilters — StringContains elsewhere in the plan (a
    # post-join Filter node) does not count
    pushed_part = [
        seg.split("PushedFilters:")[1].splitlines()[0]
        for seg in qplan.split("Scan parquet")
        if "part.parquet" in seg and "PushedFilters" in seg
    ]
    assert any(
        "StringContains(p_name,red)" in f.replace(" ", "")
        for f in pushed_part
    ), pushed_part


def test_catalog_no_cartesian_no_row_python(catalog_plans):
    """Catalog-wide anti-pattern fleet check, complementing the
    broadcast-hint policy test:

    - NO CartesianProduct anywhere: every 1-row scalar crossJoin in
      the catalog must plan as BroadcastNestedLoopJoin (the bounded
      side broadcasts); a CartesianProduct means a scaling relation
      ended up on both sides un-broadcast — quadratic at 100 TB.
    - NO row-at-a-time Python (BatchEvalPython): every Python path
      must be Arrow-vectorized (ArrowEvalPython / mapInPandas /
      FlatMapGroupsInPandas and friends), the 10-100x rule from the
      operator contracts.

    Scope limits, stated plainly: streaming/lifecycle queries are
    skipped (their builders run real jobs; their own equivalence
    tests cover them), and model-collapse builders (embedding_pca,
    bloom builds, pagerank/kmeans seeds) DO execute their bounded
    build stage when this test constructs their frames — only the
    FINAL plan is inspected, so an anti-pattern inside a collected
    build stage is out of this test's sight and belongs to that
    operator's own plan/equivalence tests."""
    offenders = []
    for name, (_f, _a, plan) in sorted(catalog_plans.items()):
        if plan is None:  # SKIP_EXECUTING
            continue
        if "CartesianProduct" in plan:
            offenders.append((name, "CartesianProduct"))
        if "BatchEvalPython" in plan:
            offenders.append((name, "BatchEvalPython"))
    assert not offenders, offenders


def test_catalog_no_unpartitioned_window(catalog_plans):
    """Catalog-wide ban on UNPARTITIONED windows: an empty partition
    spec funnels the window's entire input through ONE task's sort —
    the skyline_orders round-7 defect class (and Spark itself warns
    'No Partition Defined for Window operation').  Detection: in the
    executed plan a windowspecdefinition whose FIRST argument is a
    sort order (or the frame itself) has an empty partition clause.

    Allowlist = windows whose input is BOUNDED by construction, with
    the bound stated: skyline_orders' global pass runs over the
    union of per-bucket Pareto frontiers (phase 1 output), not the
    corpus."""
    import re

    BOUNDED_OK = {
        # global pass input = union of bucket-local frontiers
        "skyline_orders",
    }
    pat = re.compile(
        r"windowspecdefinition\((?:[^(,]*\s(?:ASC|DESC)\s"
        r"|specifiedwindowframe)"
    )
    offenders = []
    for name, (_f, _a, plan) in sorted(catalog_plans.items()):
        if plan is None or name in BOUNDED_OK:
            continue
        if pat.search(plan):
            offenders.append(name)
    assert not offenders, offenders
