"""Partition-plan determinism sweep over the full catalog.

At 100 TB the same query runs under whatever parallelism the cluster
has that day: a result that depends on ``spark.sql.shuffle.partitions``
or on how the scan was split (an unordered LIMIT, a first()/any()
without ordering, float summation order drifting past the canonical
tolerance) is a latent flaky-pipeline bug — it would pass the driver
gate one round and hash-mismatch the next with zero code change.

This sweep executes every registered query TWICE over the same data:
once under the deployment profile (the get_spark defaults) and once
under a deliberately hostile one — 7 shuffle partitions, 64 KB scan
splits (so every parquet file shatters into many input slices), AQE
off — then asserts the driver-shaped canonical value rows
(tools/verify_local.canon_frame) are identical.

A strict mismatch is re-compared with float literals blurred to 3
significant digits: if that matches, the difference is summation-
order drift *within* values (classified ``float_drift``, reported
but non-fatal); if not, it is a real partition-dependent result
(``mismatch``, fatal).

Usage: python tools/determinism_sweep.py [--json OUT.json] [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Runtime-settable confs only (all four are session confs in Spark):
# the hostile profile must be applicable to a live session because
# getOrCreate() would otherwise hand back the deployment one.
HOSTILE = {
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.files.maxPartitionBytes": str(64 * 1024),
    "spark.sql.files.openCostInBytes": "0",
    "spark.sql.adaptive.enabled": "false",
}

_FLOAT = re.compile(r"-?\d+\.\d+(?:e[+-]?\d+)?")


def _blur(rows: list[str]) -> list[str]:
    """Re-round every float literal in canonical rows to 3 significant
    digits.  Applied identically to both runs, so equal inputs stay
    equal; only used to CLASSIFY a strict mismatch, never to pass one.
    """
    out = [_FLOAT.sub(lambda m: f"{float(m.group(0)):.3g}", r) for r in rows]
    out.sort()
    return out


def _run_catalog(spark, sf_dir, names, catalog, tmpdirs, canon_frame):
    out = {}
    for name in names:
        try:
            pdf = catalog.QUERIES[name](spark, sf_dir).toPandas()
            out[name] = ("ok", canon_frame(pdf))
        except Exception as e:  # noqa: BLE001 — recorded, not hidden
            out[name] = ("err", f"{type(e).__name__}: {str(e)[:200]}")
            print(f"ERR  {name}: {out[name][1]}")
        tmpdirs.gc_now()
    return out


def main() -> None:
    args = sys.argv[1:]
    out_json = None
    if args and args[0] == "--json":
        out_json = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from bugzilla_etl_spark import tmpdirs
    from bugzilla_etl_spark.plans import catalog
    from bugzilla_etl_spark.session import get_spark
    from tools.verify_local import canon_frame

    catalog.load_all()
    names = [n for n in catalog.QUERIES if not only or n in only]

    spark = get_spark("determinism-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"run A (deployment profile) over {len(names)} queries ...")
    run_a = _run_catalog(spark, sf_dir, names, catalog, tmpdirs, canon_frame)

    saved = {k: spark.conf.get(k, None) for k in HOSTILE}
    for k, v in HOSTILE.items():
        spark.conf.set(k, v)
    try:
        print(f"run B (hostile profile {HOSTILE}) ...")
        run_b = _run_catalog(
            spark, sf_dir, names, catalog, tmpdirs, canon_frame
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    results: dict[str, dict] = {}
    fatals, drifts = [], []
    for name in names:
        (sa, va), (sb, vb) = run_a[name], run_b[name]
        rec = {"status": None, "rows": None, "detail": None}
        results[name] = rec
        if sa == "err" or sb == "err":
            rec["status"] = "err"
            rec["detail"] = va if sa == "err" else vb
            fatals.append(name)
            continue
        rec["rows"] = len(va)
        if va == vb:
            rec["status"] = "ok"
            print(f"PASS {name} ({len(va)} rows)")
            continue
        if len(va) == len(vb) and _blur(va) == _blur(vb):
            rec["status"] = "float_drift"
            bad = next(i for i, (x, y) in enumerate(zip(va, vb)) if x != y)
            rec["detail"] = f"A:{va[bad][:160]} B:{vb[bad][:160]}"
            drifts.append(name)
            print(f"DRIFT {name}: {rec['detail']}")
            continue
        rec["status"] = "mismatch"
        bad = next(
            (i for i, (x, y) in enumerate(zip(va, vb)) if x != y),
            min(len(va), len(vb)) - 1,
        )
        rec["detail"] = (
            f"rows A={len(va)} B={len(vb)}; first diff at sorted row "
            f"{bad}: A:{va[bad][:160]} B:{vb[bad][:160]}"
        )
        fatals.append(name)
        print(f"FAIL {name}: {rec['detail']}")

    print(
        f"\n{len(names)} queries: {len(fatals)} partition-dependent, "
        f"{len(drifts)} float-drift"
        + (f"\nfatal: {fatals}" if fatals else "")
        + (f"\ndrift: {drifts}" if drifts else "")
    )
    if out_json:
        with open(out_json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {out_json}")
    sys.exit(1 if fatals else 0)


if __name__ == "__main__":
    main()
