"""Generate ROTATION.md — the per-query driver-row staleness ledger.

The external correctness gate records rows for only the first 50
catalog entries per round, so with 150+ queries the full cycle is
ceil(N/50) rounds and some green queries' newest driver row is
always a few rounds old.  This ledger makes that staleness auditable
at a glance (round-7 verdict item 8) and is the input for composing
each round's `_PRIORITY` window: never-tested first, then
behavior-touched, then stalest greens.

Usage:
    python tools/rotation_ledger.py          (writes ROTATION.md)
    python tools/rotation_ledger.py --check  (fail if ROTATION.md is
                                              older than the newest
                                              CORRECTNESS_rN.json)
    python tools/rotation_ledger.py --ingest (git-add any untracked
                                              round artifacts, then
                                              regenerate + stage
                                              ROTATION.md — the one-
                                              step round-close ingest,
                                              round-13 verdict task 8)

The --check mode exists because round 9 committed ROTATION.md
BEFORE the r9 driver artifacts landed, so the ledger said "newest =
r8" while CORRECTNESS_r09.json sat next to it (round-9 verdict,
What's-wrong #1).  The check is mechanical: the ledger records the
newest round it ingested; if a CORRECTNESS file with a higher round
exists, exit nonzero with the regen command.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def check_survey_bijection(names: list[str]) -> None:
    """Assert SURVEY.md §2's numbering is a BIJECTION onto the
    catalog: every `| N | \\`key\\` |` row has a unique number and a
    unique key, and the key set equals the registered catalog
    exactly (retired/vacant numbers carry no backticked key and are
    skipped).  Round-8 checked only the count; the duplicate
    ann_lsh_buckets row (#32/#125) slipped through that."""
    with open(os.path.join(REPO, "SURVEY.md")) as f:
        text = f.read()
    # a (number, key) pair may legitimately repeat across §2's
    # summary and detail tables; conflicts are one number with two
    # KEYS or one key with two NUMBERS
    pairs = sorted(
        {
            (int(n), k)
            for n, k in re.findall(r"^\| (\d+) \| `(\w+)` \|", text, re.M)
        }
    )
    nums = [n for n, _k in pairs]
    keys = [k for _n, k in pairs]
    dup_nums = {n for n in nums if nums.count(n) > 1}
    dup_keys = {k for k in keys if keys.count(k) > 1}
    assert not dup_nums, f"SURVEY §2 numbers with two keys: {sorted(dup_nums)}"
    assert not dup_keys, f"SURVEY §2 keys with two numbers: {sorted(dup_keys)}"
    missing = set(names) - set(keys)
    extra = set(keys) - set(names)
    assert not missing, f"catalog keys missing a SURVEY §2 row: {sorted(missing)}"
    assert not extra, f"SURVEY §2 rows with no catalog entry: {sorted(extra)}"
    print(
        f"SURVEY §2 bijection OK: {len(keys)} unique numbers"
        f" for {len(names)} catalog keys"
    )


def newest_artifact_round(committed_only: bool = False) -> int:
    """Newest round among CORRECTNESS_rN.json files.  With
    committed_only, consider only files tracked by git: the external
    driver lands each round's artifact UNTRACKED after the final
    commit, so a working-tree-based check is guaranteed red at every
    judging point (rounds 9–11 all shipped that state).  The ledger
    is only stale when it lags an artifact someone actually
    committed without regenerating."""
    paths = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    if committed_only:
        try:
            tracked = set(
                subprocess.run(
                    ["git", "ls-files", "--", "CORRECTNESS_r*.json"],
                    cwd=REPO,
                    capture_output=True,
                    text=True,
                    check=True,
                ).stdout.split()
            )
            paths = [p for p in paths if os.path.basename(p) in tracked]
        except (OSError, subprocess.CalledProcessError):
            pass  # no git → fall back to all files (strictest check)
    rounds = [
        int(re.search(r"CORRECTNESS_r(\d+)\.json", p).group(1))
        for p in paths
    ]
    return max(rounds, default=0)


def check_ledger_fresh() -> None:
    """Exit nonzero only if ROTATION.md predates the newest
    *committed* CORRECTNESS_rN.json.  An untracked-newer artifact
    (the normal state right after the driver runs) is reported as
    pending ingest and exits 0 — regenerating before committing it
    is the next round's first task, not a broken tree."""
    path = os.path.join(REPO, "ROTATION.md")
    if not os.path.exists(path):
        sys.exit("ROTATION.md missing — run tools/rotation_ledger.py")
    with open(path) as f:
        m = re.search(r"newest driver round:\s*r(\d+)", f.read())
    ledger_round = int(m.group(1)) if m else 0
    committed_round = newest_artifact_round(committed_only=True)
    any_round = newest_artifact_round(committed_only=False)
    if committed_round > ledger_round:
        sys.exit(
            f"ROTATION.md is STALE: ledger ingested up to r{ledger_round}"
            f" but CORRECTNESS_r{committed_round:02d}.json is committed —"
            " rerun `python tools/rotation_ledger.py` and commit both."
        )
    if any_round > ledger_round:
        print(
            f"ROTATION.md fresh vs committed artifacts (r{ledger_round});"
            f" CORRECTNESS_r{any_round:02d}.json is PENDING INGEST"
            " (untracked) — regenerate + commit next session."
        )
        return
    print(
        f"ROTATION.md fresh: ledger r{ledger_round} >="
        f" newest artifact r{any_round}"
    )


#: Driver/gate artifact families staged by --ingest.  Only files the
#: round machinery writes at the repo root; never sources or tests.
_ARTIFACT_GLOBS = (
    "CORRECTNESS_r*.json",
    "BENCH_r*.json",
    "BENCH_LOCAL_r*.json",
    "BENCHALERT_r*.json",
    "LOCAL_GATE*_r*.json",
    "STREAMBENCH_r*.json",
    "SCALEPROBE_r*.json",
    "*_SWEEP_r*.json",
    "SKEW_CROSSOVER_r*.json",
    "DETERMINISM_r*.json",
    "TRI_DECADE_r*.json",
    "PAGERANK_DECADE_r*.json",
)


def ingest_artifacts() -> None:
    """One-step round-close ingest: ``git add`` every untracked
    round artifact at the repo root, then regenerate ROTATION.md
    over the now-staged CORRECTNESS rows and stage it too.  Retires
    the standing pending-ingest warning loop — running this at round
    close leaves --check with nothing pending (round-13 verdict,
    task 8)."""
    untracked = []
    for pat in _ARTIFACT_GLOBS:
        for path in glob.glob(os.path.join(REPO, pat)):
            rel = os.path.relpath(path, REPO)
            tracked = subprocess.run(
                ["git", "ls-files", "--error-unmatch", rel],
                cwd=REPO,
                capture_output=True,
            ).returncode == 0
            if not tracked:
                untracked.append(rel)
    if untracked:
        subprocess.run(["git", "add", "--"] + untracked, cwd=REPO, check=True)
        print(f"staged {len(untracked)} artifact(s): {sorted(untracked)}")
    else:
        print("no untracked round artifacts")


def main() -> None:
    if "--check" in sys.argv[1:]:
        check_ledger_fresh()
        return
    ingest = "--ingest" in sys.argv[1:]
    if ingest:
        ingest_artifacts()
    rows: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json", path)
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, rec in data.items():
            green = bool(
                rec.get("rows_match")
                and rec.get("schema_match") is not False
                and rec.get("hash_match") is not False
                and not rec.get("err")
            )
            prev = rows.get(name)
            if prev is None or rnd >= prev[0]:
                rows[name] = (rnd, green)

    from bugzilla_etl_spark.plans import catalog

    catalog.load_all()
    names = list(catalog.QUERIES)
    check_survey_bijection(names)
    latest_round = max((r for r, _g in rows.values()), default=0)

    def key(n: str):
        rec = rows.get(n)
        return (rec is not None, rec[0] if rec else 0, n)

    lines = [
        "# ROTATION — per-query newest driver row",
        "",
        "Generated by `tools/rotation_ledger.py` from the",
        "`CORRECTNESS_r*.json` records.  `never` = no driver row yet",
        "(covered by the local gate + fleet plan tests; leads the",
        "next `_PRIORITY` window).  Staleness = rounds since the",
        "newest row.",
        "",
        f"Catalog: {len(names)} queries; newest driver round:"
        f" r{latest_round}.",
        "",
        "| query | newest driver row | green | staleness |",
        "|-------|-------------------|-------|-----------|",
    ]
    for n in sorted(names, key=key):
        rec = rows.get(n)
        if rec is None:
            lines.append(f"| {n} | never | — | ∞ |")
        else:
            rnd, green = rec
            lines.append(
                f"| {n} | r{rnd} | {'yes' if green else 'NO'} |"
                f" {latest_round - rnd} |"
            )
    n_never = sum(1 for n in names if n not in rows)
    n_stale = sum(
        1
        for n in names
        if n in rows and latest_round - rows[n][0] >= 2
    )
    lines += [
        "",
        f"Never-tested: {n_never}; rows ≥2 rounds stale: {n_stale}.",
        "",
    ]
    out = os.path.join(REPO, "ROTATION.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}: {len(names)} queries, {n_never} never-tested")
    if ingest:
        subprocess.run(["git", "add", "--", "ROTATION.md"], cwd=REPO, check=True)
        print("staged ROTATION.md")


if __name__ == "__main__":
    main()
