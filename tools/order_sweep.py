"""Arrival-order sweep: streaming correctness under out-of-order
ingest.

Production ingest is never event-time-ordered across partitions —
Kafka partitions drain at different rates, landing buckets list
uploads in arrival order, a backfill races the live feed.  Every
prior gate delivered each streaming entry's input in event-time
order, which silently tested only the contract the state functions
*assumed* (``_pv_state``/``_sessionize_state`` document in-order
delivery).  This sweep re-runs the file-source streaming entries
over a BOUNDED-DISORDER landing (``BES_STREAM_ARRIVAL=delay`` —
see streaming/landing.py: time-sliced parts where half of each
slice's trailing margin arrives one file late, duplicates one batch
late; every row stays above the watermark when it arrives) and
compares against the unchanged DuckDB batch oracle.

Two corpora per group:

* the plain testdata (30-day span: disorder is sparse — per-entity
  inter-event gaps dwarf the margin, so per-entity inversions are
  rare; passing here is necessary, not sufficient), and
* a TIME-DENSIFIED copy (ts compressed 24x -> ~30h span, same rows,
  same everything else; the oracle reads the same dense parquet so
  value parity is still exact).  Here the margin spans several
  same-entity events and real cross-batch inversions occur — the
  first run of this sweep showed stream_previous_values diverging
  at row 22 and stream_sessionize inventing 70 extra sessions.

Groups:

* CONVERGE — must hash-match the batch oracle under disorder on
  BOTH corpora: the commutative-state entries (snapshot max-merge,
  rollup's watermarked agg, dedup-within-watermark, HLL register
  max-merge, heavy-hitter counting, rebuild-from-archive) and the
  two *_ooo watermark-buffered forms (#176, #177) built to retire
  the in-order assumption.
* IN_ORDER_CONTRACT — the classic ``stream_previous_values`` /
  ``stream_sessionize``: their documented delivery contract is
  in-order-per-entity; the sweep RECORDS their behavior under
  disorder (expected: divergence on the dense corpus) so the
  boundary is measured, not folklore.  Their green path stays the
  ordered landing every other gate runs.

Usage:
  python tools/order_sweep.py [--json OUT.json] [sf_dir]
Defaults: sf0.001, mode delay:12:5400 (12 files, 90 min margin —
inside every consumer's 2h watermark).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MODE = "delay:12:5400"
DENSE_FACTOR = 24

CONVERGE = [
    "stream_snapshot",
    "stream_rollup",
    "stream_dedup",
    "stream_hll",
    "stream_heavy_hitters",
    "stream_heavy_hitters_capped",
    "stream_bug_versions",
    "stream_previous_values_ooo",
    "stream_sessionize_ooo",
    # round-12: the chunking ingest twin — stateless per-batch map,
    # so ANY arrival order converges
    "stream_doc_chunks",
    # round-13: the span-probe ingest twin — per-batch stream-static
    # join against a fixed index, no cross-batch state, so ANY
    # arrival order converges
    "stream_dedup_spans",
    # round-15: the tokenize ingest twin — per-batch map-only encode
    # against a FROZEN broadcast tokenizer, no cross-batch state, so
    # ANY arrival order converges
    "stream_bpe_encode",
]
IN_ORDER_CONTRACT = ["stream_previous_values", "stream_sessionize"]

TABLES = (
    "region nation customer supplier part orders lineitem"
    " documents embeddings"
).split()


def build_dense_dir(src: str, dst: str, factor: int = DENSE_FACTOR) -> None:
    """Symlink every table, rewrite events with ts compressed by
    ``factor`` toward the corpus minimum (microsecond-integer
    arithmetic — never float; same rows, same schema, same types)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.dataset as ds
    import pyarrow.parquet as pq

    for t in TABLES:
        s = f"{src}/{t}.parquet"
        if os.path.exists(s):
            os.symlink(s, f"{dst}/{t}.parquet")
    tab = ds.dataset(f"{src}/events.parquet", format="parquet").to_table()
    fld = tab.schema.field("ts")
    if tab.num_rows:
        us = tab.column("ts").cast(pa.int64()).to_numpy()
        mn = us.min()
        dense = mn + (us - mn) // factor
        i = tab.schema.get_field_index("ts")
        tab = tab.set_column(
            i, fld, pa.array(dense, type=pa.int64()).cast(fld.type)
        )
    pq.write_table(tab, f"{dst}/events.parquet")


def run_gate(sf_dir: str, queries: list[str], scrambled: bool) -> dict:
    """Run tools/verify_local.py over ``queries`` in a fresh process
    (env-scoped arrival knob), return its per-query record."""
    env = dict(os.environ)
    if scrambled:
        env["BES_STREAM_ARRIVAL"] = MODE
    else:
        env.pop("BES_STREAM_ARRIVAL", None)
    with tempfile.NamedTemporaryFile(suffix=".json") as f:
        subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "tools", "verify_local.py"),
                "--json",
                f.name,
                sf_dir,
                *queries,
            ],
            env=env,
            cwd=REPO,
            check=False,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        f.seek(0)
        return json.load(open(f.name))


def green(rec: dict) -> bool:
    return bool(
        rec.get("rows_match")
        and rec.get("schema_match")
        and rec.get("hash_match", True)
        and not rec.get("err")
    )


def main() -> None:
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    src = args[0] if args else "/root/testdata/sf0.001"

    dense = tempfile.mkdtemp(prefix="bes_dense_")
    build_dense_dir(src, dense)

    out: dict = {"mode": MODE, "dense_factor": DENSE_FACTOR, "results": {}}
    ok = True
    for dirname, d in (("plain", src), ("dense", dense)):
        rec = run_gate(d, CONVERGE, scrambled=True)
        for q in CONVERGE:
            g = green(rec.get(q, {}))
            out["results"][f"{q}@{dirname}"] = {
                "group": "converge",
                "pass": g,
            }
            ok = ok and g
            print(
                f"{'PASS' if g else 'FAIL'} {q}@{dirname} (converge)",
                file=sys.stderr,
            )
    # the documented boundary: classic forms under dense disorder
    rec = run_gate(dense, IN_ORDER_CONTRACT, scrambled=True)
    for q in IN_ORDER_CONTRACT:
        g = green(rec.get(q, {}))
        out["results"][f"{q}@dense"] = {
            "group": "in_order_contract",
            "diverged": not g,
        }
        print(
            f"{'diverged (documented contract)' if not g else 'converged'}"
            f" {q}@dense",
            file=sys.stderr,
        )
    # and their green path: the ordered landing (sanity control)
    rec = run_gate(dense, IN_ORDER_CONTRACT, scrambled=False)
    for q in IN_ORDER_CONTRACT:
        g = green(rec.get(q, {}))
        out["results"][f"{q}@dense-ordered"] = {
            "group": "in_order_contract",
            "pass": g,
        }
        ok = ok and g
        print(
            f"{'PASS' if g else 'FAIL'} {q}@dense-ordered (control)",
            file=sys.stderr,
        )
    out["ok"] = ok
    blob = json.dumps(out, indent=1)
    if json_out:
        with open(json_out, "w") as f:
            f.write(blob + "\n")
    print(blob)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
