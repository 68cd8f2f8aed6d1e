"""sf1 correctness gate for the state-heavy catalog slice.

The standing gates check values at sf0.01 (driver) and sf0.1 (local
10x sweep); SCALEPROBE times another decade but never value-checks
it.  This tool builds an sf1-equivalent corpus (10x sf0.1 via
scaleprobe's disjoint-id replication protocol — ids offset per
replica so join cardinality grows linearly, text perturbed so dedup
families see new content, dims constant) and runs the full
Spark-vs-DuckDB value gate (tools/verify_local.py) over the queries
most sensitive to partition counts, per-key state size, and
accumulator overflow: the window/replay, sketch, graph, and
iterative families (round-11 verdict task 5).

Usage:
    python tools/sf1_gate.py [--json OUT.json] [base_sf_dir]
                             [query ...]
Default base = /root/testdata/sf0.1, factor 10.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Window/replay state, sketches whose registers fill another decade
# up, graph/iterative fixpoints, and the multi-distinct/percentile
# aggs — the families where partition count or accumulator width can
# break silently between decades.
STATE_HEAVY = [
    "previous_values",
    "previous_values_paned",
    "state_rollforward",
    "state_rollforward_paned",
    "events_sessionize",
    "events_sessionize_paned",
    "moving_average_ranged",
    "set_accumulate",
    "set_final",
    "set_final_salted",
    "snapshot_versions",
    "bug_version_full",
    "hll_distinct",
    "count_min_freq",
    "hist_quantile",
    "kmv_source_overlap_sketch",
    "pagerank_trade",
    # triangle_count's r12 red row was a DuckDB PLAN pathology, not
    # an operator or capacity problem: the plain `edges` CTE was
    # inlined into all three consumers (e1, e2, the EXISTS) plus a
    # delim-join, re-running the corpus-scale ps->co->top-5000
    # pipeline three times concurrently and spilling >17 GB.  Fixed
    # at the oracle (`edges AS MATERIALIZED`, ~6 s at sf1); the
    # verify_local connection now also pins temp_directory and
    # bounds memory + temp so any future plan regression fails fast
    # instead of exhausting the host disk.
    "triangle_count",
    # r14: the data-scaled backbone form — the cap derivation (weight
    # histogram -> boundary ties) is exactly the kind of logic that
    # only misbehaves when the weight distribution thickens a decade
    "triangle_count_scaled",
    "dedup_components",
    "kmeans_embeddings",
    "heavy_hitters_ngrams",
    "value_percentiles",
]

# The dedup/similarity slice (round-12 verdict task 5): the family
# whose correctness is most partition-count-sensitive (band
# boundaries, posting-list df caps, cell assignment) and, after
# triangle_count, the steepest scaleprobe curves — minhash_lsh's
# x10 exponent is 0.39.  Value-checked at sf1 alongside STATE_HEAVY.
DEDUP_SIM = [
    "dedup_minhash_lsh",
    "dedup_jaccard_invindex",
    "semdedup",
    "decontam_neardup",
    "dedup_containment",
    "dedup_simhash_pairs",
    # round-13: the ExactSubstr span family — duplicate detection
    # rides a corpus-grain gram groupBy and the island merge rides
    # per-doc windows, both shapes whose correctness must hold as
    # partition counts and gram multiplicity grow a decade
    "dedup_spans",
    "dedup_spans_apply",
]

# The text/gram token-explode family (round-13 verdict task 5): the
# plans whose correctness is most row-group/partition-sensitive
# after the dedup slice — BM25's corpus stats, the BPE merge loop's
# exact pair counts, PMI/co-occurrence and pair-support counting,
# n-gram novelty's first-seen semantics, TF-IDF's df — all ride
# corpus-grain token explodes whose groupBy boundaries move as
# partition counts and gram multiplicity grow a decade.
# (heavy_hitters_ngrams, the sixth member, already sits in
# STATE_HEAVY.)
TEXT_GRAM = [
    "bm25_topk",
    "bpe_apply",
    "cooccurrence_pmi",
    "frequent_pairs",
    "ngram_novelty",
    "tfidf_top_terms",
    # r15: the corpus encode pass — vocab-grain symbol-id ranks and
    # the one-row tokenizer map must stay exact as the vocab and the
    # token stream grow a decade (the map fold is a collect_list
    # whose order must not leak into the map lookup)
    "bpe_encode",
    # r15: the sequence materializer — its token-grain explode/
    # regroup and per-stream cumsum layout are exactly where 32-
    # real-partition data can diverge a decade up
    "seq_packing_ids",
]

# The remaining RANGE-frame / rolling-window / as-of entries (r14
# verdict task 4): the hot-key-splittable and range-frame forms
# exist FOR scale, so their correctness is witnessed at the 100x
# point like the dedup and gram families — pane boundaries, RANGE
# frames, and rolling-distinct state are exactly where 32-real-
# partition data can diverge.  (previous_values_paned,
# state_rollforward_paned, events_sessionize_paned,
# moving_average_ranged, value_percentiles already sit in
# STATE_HEAVY.)
PANED_WINDOW = [
    "range_window_load",
    "rolling_distinct_users",
    "moving_average",
    "interval_asof_join",
    "trunc_uncertain",
    "events_sessionize_native",
    "topk_per_group",
]

# The flag/attachment/fuzzy replay family (r15 verdict task 5):
# per-entity list joins and tiered-cascade argmins whose inputs GROW
# with SF — per-bug flag/attachment event lists lengthen, the fuzzy
# cascades' candidate tiers widen — exactly the shapes where a
# 100x-fatter entity can silently change a tie-break or overflow a
# collect_list ordering assumption.  (previous_values and its paned
# companion already sit in STATE_HEAVY.)
REPLAY_FUZZY = [
    "flag_state_versions",
    "attachment_versions",
    "flag_fuzzy_match",
    "cc_fuzzy_match",
    "diff_rollback",
    "diff_apply",
    "canonical_fields",
]

FACTOR = 10

# Documented oracle-side limitations (NOT operator failures): a name
# here still runs and records its row, but a red result does not
# flip the exit code — so "gate nonzero" always means a REAL
# regression.  Empty since the r12 triangle_count hole was fixed at
# the root (the oracle plan, see STATE_HEAVY note); add a name only
# with a comment citing the artifact that documents the limitation.
XFAIL: set[str] = set()


def evaluate(rec: dict) -> tuple[list[str], list[str]]:
    """Split a verify_local record into (real_failures, xfailed):
    only the former flips the gate's exit code, so a nonzero exit
    always means a REAL regression even while a documented
    oracle-side limitation is listed in XFAIL."""

    def _green(row: dict) -> bool:
        return bool(
            row.get("rows_match")
            and row.get("schema_match")
            and row.get("hash_match")
        )

    real = sorted(
        n for n, row in rec.items() if not _green(row) and n not in XFAIL
    )
    xfailed = sorted(
        n for n, row in rec.items() if not _green(row) and n in XFAIL
    )
    return real, xfailed


def main() -> None:
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    base = args[0] if args else "/root/testdata/sf0.1"
    queries = args[1:] or (
        STATE_HEAVY + DEDUP_SIM + TEXT_GRAM + PANED_WINDOW + REPLAY_FUZZY
    )

    from bugzilla_etl_spark.session import get_spark
    from tools.scaleprobe import replicate

    big = tempfile.mkdtemp(prefix="bes_sf1_")
    try:
        spark = get_spark("sf1-gate")
        spark.sparkContext.setLogLevel("ERROR")
        print(f"replicating {base} x{FACTOR} -> {big}", file=sys.stderr)
        replicate(spark, base, big, FACTOR)
        spark.stop()  # verify_local runs its own fresh session

        fd, gate_json = tempfile.mkstemp(suffix=".json")
        os.close(fd)
        r = subprocess.run(
            [
                sys.executable,
                "tools/verify_local.py",
                "--json",
                gate_json,
                big,
                *queries,
            ],
            cwd=REPO,
        )
        with open(gate_json) as f:
            rec = json.load(f)
        os.unlink(gate_json)
        real_failures, xfailed = evaluate(rec)
        result = {
            "base": base,
            "factor": FACTOR,
            "queries": rec,
            "xfailed": xfailed,
            "real_failures": real_failures,
            "ok": not real_failures,
        }
        line = json.dumps(result)
        print(line)
        if json_out:
            with open(json_out, "w") as f:
                f.write(line + "\n")
        sys.exit(1 if real_failures else 0)
    finally:
        shutil.rmtree(big, ignore_errors=True)


if __name__ == "__main__":
    main()
