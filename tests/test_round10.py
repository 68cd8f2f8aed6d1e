"""Round-10 additions: fail-fast clustered-layout validation for the
backfill walk (a wrong/stale layout must error, never land empty
"successful" blocks), the driver-registered clustered backfill entry
(the layout half of the contract), and the composed replicate cycle
(pending-detection -> file-dump extract -> alias cut-over).

Value parity vs DuckDB is covered by test_catalog_oracle for every
registered entry; these tests pin the failure modes and lifecycle
semantics a value hash alone would not witness.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bugzilla_etl_spark.plans import catalog


def _q(name, spark, sf_dir):
    catalog.load_all()
    return catalog.QUERIES[name](spark, sf_dir)


# ---------------------------------------------------------------------
# validate_clustered_layout — the ADVICE-r9 hole: run_backfill with a
# wrong clustered_dir used to read every block as empty and land an
# all-empty store with _SUCCESS markers.


def test_clustered_validation_rejects_missing_path(tmp_path):
    from bugzilla_etl_spark.operators.backfill import (
        validate_clustered_layout,
    )

    with pytest.raises(FileNotFoundError):
        validate_clustered_layout(str(tmp_path / "nope"), 10)


def test_clustered_validation_rejects_unclustered_dir(tmp_path):
    """A real directory with no entity_block= partition dirs is not a
    land_clustered layout: reading it as one would substitute empty
    frames for every block."""
    from bugzilla_etl_spark.operators.backfill import (
        validate_clustered_layout,
    )

    d = tmp_path / "plain"
    d.mkdir()
    (d / "part-00000.parquet").write_bytes(b"")
    with pytest.raises(ValueError, match="no entity_block="):
        validate_clustered_layout(str(d), 10)


def test_clustered_validation_rejects_increment_mismatch(
    spark, sf_dir, tmp_path
):
    """A layout landed with increment A walked with increment B (or
    a different entity) would read planned blocks empty or bleed
    rows across block boundaries.  Must raise, not land empties."""
    from bugzilla_etl_spark.operators.backfill import (
        land_clustered,
        run_backfill,
        validate_clustered_layout,
    )
    from bugzilla_etl_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    end = ev.agg(F.max("user_id")).collect()[0][0] + 1
    inc_a = -(-end // 5)
    inc_b = -(-end // 3)
    clustered = str(tmp_path / "clustered")
    land_clustered(ev, clustered, inc_a)

    with pytest.raises(ValueError, match="landed with"):
        validate_clustered_layout(clustered, inc_b)
    with pytest.raises(ValueError, match="landed with"):
        validate_clustered_layout(clustered, inc_a, entity="event_id")

    # and the walk itself fail-fasts BEFORE landing anything
    store = str(tmp_path / "store")
    with pytest.raises(ValueError, match="landed with"):
        run_backfill(
            spark, ev, store, inc_b, lambda df: df,
            end=end, clustered_dir=clustered,
        )
    import os

    assert not os.path.isdir(store) or not os.listdir(store)


def test_clustered_validation_markerless_alignment(tmp_path):
    """Without a marker (layout landed by other tooling), a
    misaligned partition dir (lo % increment != 0) must raise —
    the finer-grained-layout case where planned blocks would
    interleave with dirs they never read."""
    from bugzilla_etl_spark.operators.backfill import (
        validate_clustered_layout,
    )

    d = tmp_path / "markerless"
    (d / "entity_block=0").mkdir(parents=True)
    (d / "entity_block=6").mkdir()
    with pytest.raises(ValueError, match="different increment"):
        validate_clustered_layout(str(d), 10)


def test_clustered_validation_allows_missing_single_block(tmp_path):
    """A block with no events lands no partition dir — that is
    legitimate sparsity, not a layout error."""
    from bugzilla_etl_spark.operators.backfill import (
        validate_clustered_layout,
    )

    import json

    d = tmp_path / "sparse"
    (d / "entity_block=0").mkdir(parents=True)
    (d / "entity_block=20").mkdir()  # dir for block 10 missing: OK
    (d / "_layout.json").write_text(
        json.dumps({"increment": 10, "entity": "user_id"})
    )
    present = validate_clustered_layout(str(d), 10)
    assert present == {0, 20}


# ---------------------------------------------------------------------
# full_backfill_clustered — the registered LAYOUT-half entry.


def test_full_backfill_clustered_matches_unbatched_build(spark, sf_dir):
    """The driver-registered clustered entry lands the identical doc
    set as the one-shot unbatched build (the same invariant the
    filter-scan entry pins), through directory-pruned block reads."""
    from bugzilla_etl_spark.plans.queries_history import build_full_docs
    from bugzilla_etl_spark.sources import load_table

    got = sorted(
        map(tuple, _q("full_backfill_clustered", spark, sf_dir).collect())
    )
    ev = load_table(spark, sf_dir, "events")
    want = sorted(map(tuple, build_full_docs(ev).collect()))
    assert got == want


# ---------------------------------------------------------------------
# replicate_cycle — the composed replicate.py main loop.


def test_replicate_cycle_via_boundary_and_retirement(spark, sf_dir):
    """The via column splits exactly at the destination's high-water
    mark (the pending-detection boundary), every doc appears exactly
    once, and both runs' content unions to the full es_docs set."""
    out = _q("replicate_cycle", spark, sf_dir).collect()
    ids = [r._id for r in out]
    assert len(ids) == len(set(ids)), "alias read must never blend runs"

    cut = None
    init_max = max(
        (r.modified_ts for r in out if r.via == "initial"), default=None
    )
    repl_min = min(
        (r.modified_ts for r in out if r.via == "replicated"), default=None
    )
    assert init_max is not None and repl_min is not None
    # pending = strictly newer than the destination's max ts
    assert repl_min > init_max, (init_max, repl_min, cut)

    # full content = the es_docs projection of the whole events table
    es = _q("es_docs", spark, sf_dir).collect()
    assert sorted((r._id, r.user_id, r.event_type, r.modified_ts) for r in out) == sorted(
        (r._id, r.user_id, r.event_type, r.modified_ts) for r in es
    )


def test_replicate_cycle_pending_is_broadcast_probe(spark, sf_dir):
    """Pending detection must be the 1-row broadcast high-water-mark
    probe (BroadcastNestedLoopJoin against a single-row agg), never a
    shuffle of the source corpus."""
    catalog.load_all()
    df = catalog.QUERIES["replicate_cycle"](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # the final frame reads the landed parquet, so the interesting
    # plan is the one that computed it — re-derive the pending side
    from bugzilla_etl_spark.operators import snapshot as S
    from bugzilla_etl_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    src = ev.select("event_id", "user_id", "ts")
    dest = ev.where(F.col("event_id") % 2 == 0).select("ts")
    p = S.replicate_pending(src, dest)
    pplan = p._sc._jvm.PythonSQLUtils.explainString(
        p._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" in pplan
    assert "SortMergeJoin" not in pplan
    assert plan  # the entry itself produced a readable plan


# ---------------------------------------------------------------------
# rotation ledger freshness check (round-9 verdict What's-wrong #1).


def test_rotation_ledger_is_fresh():
    """ROTATION.md must never be older than the newest committed
    CORRECTNESS_rN.json — the exact staleness round 9 shipped."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, "tools/rotation_ledger.py", "--check"],
        cwd=repo, capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr


# ---------------------------------------------------------------------
# bench_alert — the mechanical regression gate (round-9 verdict #3).


def test_bench_alert_pins_parse_and_r10_is_clean():
    """BASELINE.md parses to a full pin table (batch + streaming) and
    the committed r10 artifacts cross zero alerts with COMPLETE pin
    coverage (ok now fails closed: a pinned query with no
    measurement in the artifacts flips ok to False)."""
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo / "tools"))
    import bench_alert as BA

    pins = BA.parse_pins()
    assert len(pins) > 130
    # first-occurrence wins: the re-pinned invindex keeps its
    # original (alert-basis) pin
    assert pins["dedup_jaccard_invindex"] == 3.997
    # streaming pins present
    assert pins["stream_bug_versions"] == 16.907
    # round-10 additions pinned
    assert "full_backfill_clustered" in pins and "replicate_cycle" in pins

    # check the NEWEST committed artifacts (r10 artifacts predate
    # later rounds' pins, so re-checking them against the living pin
    # table would fail closed on queries that did not yet exist —
    # the gate's contract is "newest artifacts vs all pins")
    bench = max(repo.glob("BENCH_LOCAL_r*.json"))
    stream = max(repo.glob("STREAMBENCH_r*.json"))
    report = BA.check(str(bench), str(stream))
    assert report["ok"], (report["alerts"], report["missing_pinned"])
    assert not report["unpinned"], report["unpinned"]
    assert not report["missing_pinned"], report["missing_pinned"]
    assert report["recovery"] == "full"


def test_bench_alert_fails_closed_on_partial_coverage(tmp_path):
    """A truncated artifact that measures only a few pinned queries
    must NOT report ok — 'OK' means 'checked everything', not 'found
    nothing among what survived' (the r9 driver wrapper recovers
    only ~half the timed queries)."""
    import json
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo / "tools"))
    import bench_alert as BA

    partial = tmp_path / "BENCH_r99.json"
    partial.write_text(json.dumps({"queries": {"tpch_q1": 0.3}}))
    report = BA.check(str(partial), None)
    assert not report["ok"]
    assert len(report["missing_pinned"]) > 100
    assert not report["alerts"]


def test_bench_alert_wrapper_recovery_is_labeled():
    """The r9 driver wrapper's tail lost the whole `queries` dict, so
    recovery yields medians — load_bench must label that, and the
    labeled values still compare conservatively (median >= min)."""
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo / "tools"))
    import bench_alert as BA

    d = BA.load_bench(str(repo / "BENCH_r09.json"))
    assert d["recovery"] in ("tail-partial", "tail-median-only")
    assert d["queries"]  # recovery still yields usable rows

    full = BA.load_bench(str(repo / "BENCH_LOCAL_r10.json"))
    assert full["recovery"] == "full"


def test_bench_alert_flags_a_crossing(tmp_path):
    """A synthetic bench with one query at 3x its pin must exit the
    report not-ok with exactly that alert."""
    import json
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo / "tools"))
    import bench_alert as BA

    bad = tmp_path / "BENCH_r99.json"
    bad.write_text(json.dumps({
        "queries": {"tpch_q1": 0.984},  # pin 0.328, alert 0.66
        "comparable23_total": 12.0,
    }))
    report = BA.check(str(bad), None)
    assert not report["ok"]
    assert [a["query"] for a in report["alerts"]] == ["tpch_q1"]


# ---------------------------------------------------------------------
# partition-plan determinism — the same query under the deployment
# profile and under a hostile one (7 shuffle partitions, 64 KB scan
# splits, AQE off) must produce identical canonical value rows.  A
# result that depends on the partition plan is a latent flaky-gate
# bug at any scale: it hashes green one run and red the next with
# zero code change.  Full-catalog form: tools/determinism_sweep.py
# (DETERMINISM_r10.json).  This slice keeps the bug-prone shapes
# (top-k ties, float sums, hash sampling, window first/lag,
# iterative convergence, sketch register merges) on every suite run.


@pytest.mark.slow
def test_partition_plan_determinism_representative(spark, sf_dir):
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo))
    from tools.determinism_sweep import HOSTILE
    from tools.verify_local import canon_frame

    names = [
        "topk_per_group",          # rank ties under LIMIT
        "heavy_hitters_ngrams",    # TakeOrderedAndProject
        "tpch_q1",                 # float sums, order-sensitive
        "quota_sample",            # hash-gated sampling
        "stratified_split",
        "previous_values",         # window lag/first
        "kmeans_embeddings",       # iterative convergence
        "hll_distinct",            # sketch register fold
        "kmv_source_overlap_sketch",
        "dedup_components",        # label propagation rounds
    ]
    catalog.load_all()
    base = {
        n: canon_frame(catalog.QUERIES[n](spark, sf_dir).toPandas())
        for n in names
    }
    saved = {k: spark.conf.get(k, None) for k in HOSTILE}
    for k, v in HOSTILE.items():
        spark.conf.set(k, v)
    try:
        for n in names:
            got = canon_frame(catalog.QUERIES[n](spark, sf_dir).toPandas())
            assert got == base[n], f"{n} is partition-plan dependent"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ---------------------------------------------------------------------
# null-hardened correctness — a deterministically-dirtied copy of the
# testdata (1-in-7 payload NULLs per column, per-column de-correlated)
# must still hash-match the DuckDB oracle.  Full-catalog form:
# tools/null_sweep.py (NULL_SWEEP_r10.json).  This slice keeps one
# query per fixed null-contract family on every suite run: kernel
# null guards, signature-op drops, all-null set rendering, 3VL-safe
# HOF equality, struct-carried as-of payloads, observed-only stats.


@pytest.mark.slow
def test_null_hardened_representative(spark, tmp_path):
    import sys
    from pathlib import Path

    import duckdb

    repo = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo))
    from tools.null_sweep import TABLES, build_dirty_dir
    from tools.verify_local import canon_frame

    names = [
        "doc_fingerprint",       # scalar metric: null in, null out
        "dedup_simhash",         # signature op: null doc emits no row
        "decontam_overlap",      # probe kernel: null doc overlaps 0
        "dsir_weights",          # gram-less docs drop on both engines
        "set_accumulate",        # all-null running set renders ''
        "nested_docs",           # null child field = explicit empty slot
        "interval_asof_join",    # struct carry: null payload still wins
        "anomaly_mad",           # observed values / attributable types
        "anomaly_mad_hist",      # hist mode: same null screen as exact
        "diff_apply",            # unknown base stays unknown, not ''
        "attachment_versions",   # eqNullSafe in last-per-field filter
        "mm_resize",             # null payload: null bytes/checksum
        "embedding_outliers",    # null label = no cohort, row drops
    ]
    dirty = str(tmp_path / "nullsf")
    (tmp_path / "nullsf").mkdir()
    build_dirty_dir("/root/testdata/sf0.001", dirty)

    catalog.load_all()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{dirty}/{t}.parquet'"
        )
    for n in names:
        got = canon_frame(catalog.QUERIES[n](spark, dirty).toPandas())
        want = canon_frame(con.execute(catalog.ORACLES[n]).df())
        assert got == want, f"{n} diverges from oracle on null-injected data"
