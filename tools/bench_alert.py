"""Mechanical bench regression alerts (round-9 verdict item 3).

Before this tool, a regression only became visible if a human read
two JSON files side by side.  This reads the newest (or named)
BENCH_rN.json and STREAMBENCH_rN.json against the pins in
BASELINE.md and exits nonzero on any crossing of the standing rules:

- per-query: measured > 2 x pin  (the BASELINE.md alert column)
- headline:  comparable-23 total > 1.5 x its 22.43 s pin (33.6 s)
- streaming: same 2 x rule over the streaming-pin table

It also diffs against the PREVIOUS round's bench and lists every
shared query that moved >1.3x — informational (the documented
+-0.15 s host-noise class routinely trips it on sub-second
queries), never an exit condition on its own.

Pin source: every `| name | ... | pin | alert |` row of BASELINE.md
tables.  Where a query appears in more than one table (re-pins),
the FIRST occurrence wins — BASELINE.md's rule is that old pins
remain the alert basis until a driver round confirms the new floor.

Usage:
    python tools/bench_alert.py                  # newest artifacts
    python tools/bench_alert.py BENCH_r10.json   # explicit bench
    python tools/bench_alert.py --json OUT.json  # also write report
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMPARABLE23_PIN = 22.43
COMPARABLE23_ALERT = 33.6  # 1.5x, the BASELINE.md headline rule

# Scalar / rollup fields that the wrapper-tail regex recovery also
# matches; never per-query timings.
NON_QUERY = {
    "comparable23", "comparable23_total", "engine_etl", "dedup_sim",
    "llm_text", "tpch", "n_queries", "runs_per_query", "sf", "value",
    "n", "rc", "cpus", "noop_1batch", "noop_3batch",
    "per_batch_overhead",
    # r13 bench diagnostics: the `splits` sub-dict's timing keys and
    # the io probe's start/end — recovered by the same tail regex,
    # never query timings
    "landing_write_sec", "validate_sec", "walk_sec", "blocks_walked",
    "pass_total_sec", "start", "end",
    # streambench `progress` sub-dict keys
    "batches", "input_rows", "state_rows_max", "state_mem_bytes_max",
}


def parse_pins(path: str | None = None) -> dict[str, float]:
    """Every `| name | ... |` table row whose trailing cells are a
    pin and an alert; first occurrence of a name wins (old pins stay
    the alert basis until a driver round confirms a re-pin)."""
    path = path or os.path.join(REPO, "BASELINE.md")
    pins: dict[str, float] = {}
    row = re.compile(
        r"^\| ([a-z0-9_]+) \|(?: [0-9.]+ \|){0,2} ([0-9.]+) \| [0-9.]+ \|"
    )
    with open(path) as f:
        for line in f:
            m = row.match(line)
            if m and m.group(1) not in pins:
                pins[m.group(1)] = float(m.group(2))
    return pins


def load_bench(path: str) -> dict:
    """Read a bench artifact in either shape: bench.py's own JSON
    line, or the driver's wrapper ({n, rc, tail, ...}) whose `tail`
    holds a possibly front-truncated copy of that line.  For the
    wrapper, per-query pairs are regex-recovered from the tail (the
    tail-field ordering in bench.py exists exactly so the summary
    numbers survive truncation)."""
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        d.setdefault("recovery", "full")
        return d
    tail = d.get("tail", "") or ""
    queries: dict[str, float] = {}
    # the tail may contain both `queries` and `queries_median`; take
    # each name's FIRST occurrence (min precedes median in the line).
    # If the truncation cut off the whole `queries` dict, everything
    # recovered is a MEDIAN: medians ≥ mins, so pin comparisons can
    # only over-fire (a false alert), never miss a regression — but
    # the report must say so.
    for m in re.finditer(r'"([a-z0-9_]+)": ([0-9.]+)', tail):
        if m.group(1) not in NON_QUERY:
            queries.setdefault(m.group(1), float(m.group(2)))
    out = {
        "queries": queries,
        "recovery": (
            "tail-partial" if '"queries":' in tail else "tail-median-only"
        ),
    }
    for key in ("comparable23_total", "value", "sf"):
        m = re.search(rf'"{key}": ([0-9.]+)', tail)
        if m:
            out[key] = float(m.group(1))
    return out


def newest(pattern: str) -> str | None:
    def rnd(p: str) -> int:
        m = re.search(r"_r(\d+)", p)
        return int(m.group(1)) if m else -1

    paths = sorted(glob.glob(os.path.join(REPO, pattern)), key=rnd)
    return paths[-1] if paths else None


def newest_bench() -> str | None:
    """Newest round wins across BOTH namings — the driver's
    BENCH_rN.json and the builder's BENCH_LOCAL_rN.json; on a round
    tie the LOCAL artifact wins (it is the complete JSON line, the
    driver wrapper may be front-truncated)."""
    def key(p: str) -> tuple[int, int]:
        m = re.search(r"_r(\d+)", p)
        return (int(m.group(1)) if m else -1, "LOCAL" in p)

    paths = sorted(
        glob.glob(os.path.join(REPO, "BENCH_r*.json"))
        + glob.glob(os.path.join(REPO, "BENCH_LOCAL_r*.json")),
        key=key,
    )
    return paths[-1] if paths else None


def previous(current: str) -> str | None:
    """The newest bench artifact from a STRICTLY EARLIER round than
    `current` (either naming; LOCAL preferred on a round tie, same
    rule as newest_bench)."""
    def rnd(p: str) -> int:
        m = re.search(r"_r(\d+)", p)
        return int(m.group(1)) if m else -1

    paths = sorted(
        (
            p
            for p in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
            + glob.glob(os.path.join(REPO, "BENCH_LOCAL_r*.json"))
            if rnd(p) < rnd(current)
        ),
        key=lambda p: (rnd(p), "LOCAL" in p),
    )
    return paths[-1] if paths else None


def check(bench_path: str, stream_path: str | None) -> dict:
    pins = parse_pins()
    report: dict = {
        "bench": os.path.basename(bench_path),
        "alerts": [],
        "moved_1p3x": [],
        "unpinned": [],
        "ok": True,
    }

    cur = load_bench(bench_path)
    queries = cur.get("queries", {})
    report["recovery"] = cur.get("recovery", "full")

    # per-query 2x-pin crossings
    for name, t in sorted(queries.items()):
        pin = pins.get(name)
        if pin is None:
            report["unpinned"].append(name)
            continue
        if t > 2 * pin:
            report["alerts"].append(
                {"query": name, "sec": t, "pin": pin, "alert": round(2 * pin, 2)}
            )

    # headline rule: comparable-23 vs its 1.5x ceiling
    c23 = cur.get("comparable23_total")
    if c23 is not None:
        report["comparable23_total"] = c23
        report["comparable23_alert"] = COMPARABLE23_ALERT
        if c23 > COMPARABLE23_ALERT:
            report["alerts"].append(
                {
                    "query": "<comparable23_total>",
                    "sec": c23,
                    "pin": COMPARABLE23_PIN,
                    "alert": COMPARABLE23_ALERT,
                }
            )

    # informational: >1.3x moves vs the previous round's bench
    prev_path = previous(bench_path)
    if prev_path:
        prev = load_bench(prev_path).get("queries", {})
        for name, t in sorted(queries.items()):
            p = prev.get(name)
            if p and p > 0 and t > 1.3 * p:
                report["moved_1p3x"].append(
                    {"query": name, "sec": t, "prev": p, "prev_round": os.path.basename(prev_path)}
                )

    # streaming lane: same 2x rule over the streaming pins
    measured = set(queries)
    if stream_path:
        report["streambench"] = os.path.basename(stream_path)
        with open(stream_path) as f:
            sb = json.load(f)
        for name, t in sorted(sb.get("queries", {}).items()):
            measured.add(name)
            pin = pins.get(name)
            if pin is None:
                report["unpinned"].append(name)
                continue
            if t > 2 * pin:
                report["alerts"].append(
                    {"query": name, "sec": t, "pin": pin, "alert": round(2 * pin, 2)}
                )

    # FAIL-CLOSED on coverage: every pin exists because some bench
    # lane once measured that query, so a pinned query with no
    # measurement in this round's artifacts means the gate did NOT
    # check it (a front-truncated driver wrapper, a renamed query,
    # or a lane that silently dropped entries).  "OK" must mean
    # "checked everything", not "found nothing among what survived".
    report["missing_pinned"] = sorted(set(pins) - measured)
    report["coverage"] = f"{len(set(pins) & measured)}/{len(pins)} pins measured"
    report["ok"] = not report["alerts"] and not report["missing_pinned"]
    return report


def main() -> None:
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    bench_path = args[0] if args else newest_bench()
    stream_path = args[1] if len(args) > 1 else newest("STREAMBENCH_r*.json")
    if bench_path is None:
        sys.exit("no BENCH_r*.json / BENCH_LOCAL_r*.json found")

    report = check(bench_path, stream_path)

    if report["recovery"] != "full":
        print(
            f"note  {report['bench']} is a truncated driver wrapper"
            f" ({report['recovery']}): recovered values may be MEDIANS"
            " (≥ min, so alerts can over-fire but never miss)"
        )
    for a in report["alerts"]:
        print(
            f"ALERT {a['query']}: {a['sec']} s > {a['alert']} s"
            f" (2x pin {a['pin']})"
        )
    for mv in report["moved_1p3x"]:
        print(
            f"note  {mv['query']}: {mv['sec']} s vs {mv['prev']} s in"
            f" {mv['prev_round']} (>1.3x; informational — host-noise"
            " class unless code changed)"
        )
    if report["unpinned"]:
        print(
            f"unpinned ({len(report['unpinned'])}):"
            f" {', '.join(sorted(set(report['unpinned'])))} — add their"
            " first measurement to BASELINE.md"
        )
    if report["missing_pinned"]:
        print(
            f"MISSING {len(report['missing_pinned'])} pinned queries"
            " with no measurement in these artifacts (gate did NOT"
            f" check them): {', '.join(report['missing_pinned'][:8])}"
            f"{'...' if len(report['missing_pinned']) > 8 else ''}"
        )
    c23 = report.get("comparable23_total")
    if c23 is not None:
        print(
            f"comparable23 {c23} s vs pin {COMPARABLE23_PIN}"
            f" ({c23 / COMPARABLE23_PIN:.2f}x; alert {COMPARABLE23_ALERT})"
        )
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {json_out}")
    if not report["ok"]:
        sys.exit(
            f"{len(report['alerts'])} alert crossing(s),"
            f" {len(report['missing_pinned'])} unmeasured pin(s)"
        )
    print(
        f"OK: zero alert crossings, {report['coverage']}"
        f" ({report['bench']})"
    )


if __name__ == "__main__":
    main()
