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
    # triangle_count stays listed: at sf1 its DUCKDB ORACLE (not the
    # operator) spills past local temp disk — the wedge join the
    # Spark side df-caps explodes uncapped in the oracle SQL.  The
    # r12 artifact records that honestly (spark_rows=10, oracle
    # IO Error); the operator's own sf1 behavior is witnessed by the
    # Spark side completing and by SCALEPROBE's 0.72 exponent.
    "triangle_count",
    "dedup_components",
    "kmeans_embeddings",
    "heavy_hitters_ngrams",
    "value_percentiles",
]

FACTOR = 10


def main() -> None:
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    base = args[0] if args else "/root/testdata/sf0.1"
    queries = args[1:] or STATE_HEAVY

    from bugzilla_etl_spark.session import get_spark
    from tools.scaleprobe import replicate

    big = tempfile.mkdtemp(prefix="bes_sf1_")
    try:
        spark = get_spark("sf1-gate")
        spark.sparkContext.setLogLevel("ERROR")
        print(f"replicating {base} x{FACTOR} -> {big}", file=sys.stderr)
        replicate(spark, base, big, FACTOR)
        spark.stop()  # verify_local runs its own fresh session

        gate_json = tempfile.mktemp(suffix=".json")
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
        result = {
            "base": base,
            "factor": FACTOR,
            "queries": rec,
            "ok": r.returncode == 0,
        }
        line = json.dumps(result)
        print(line)
        if json_out:
            with open(json_out, "w") as f:
                f.write(line + "\n")
        sys.exit(r.returncode)
    finally:
        shutil.rmtree(big, ignore_errors=True)


if __name__ == "__main__":
    main()
