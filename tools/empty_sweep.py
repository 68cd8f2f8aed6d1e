"""Run the ENTIRE catalog against zero-row copies of every table.

The no-new-data incremental run is a first-class input at 100 TB
(empty partitions, empty increments, empty eval sets).  This sweep
builds an all-empty scale-factor dir (schema copied from a real one)
and executes every registered query against it, recording pass/fail
per query.  tests/test_round8.py pins the historical failure classes
on every suite run; this tool is the full-catalog form.

Usage: python tools/empty_sweep.py [--json OUT.json] [src_sf_dir]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem"
    " events documents embeddings"
).split()


def main() -> None:
    args = sys.argv[1:]
    out_json = None
    if args and args[0] == "--json":
        out_json = args[1]
        args = args[2:]
    src = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    from bugzilla_etl_spark import tmpdirs
    from bugzilla_etl_spark.plans import catalog
    from bugzilla_etl_spark.session import get_spark

    catalog.load_all()
    spark = get_spark("empty-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    empty = tempfile.mkdtemp(prefix="bes_emptysf_")
    for t in TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet").limit(0)
        stage = os.path.join(empty, f"_stage_{t}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        f = glob.glob(f"{stage}/*.parquet")[0]
        shutil.move(f, os.path.join(empty, f"{t}.parquet"))
        shutil.rmtree(stage)

    results: dict[str, dict] = {}
    fails = 0
    for name, fn in catalog.QUERIES.items():
        if only and name not in only:
            continue
        try:
            n = fn(spark, empty).count()
            results[name] = {"ok": True, "rows": n, "err": None}
        except Exception as e:  # noqa: BLE001 — recorded, not hidden
            fails += 1
            results[name] = {
                "ok": False,
                "rows": None,
                "err": str(e).splitlines()[0][:160],
            }
            print(f"FAIL {name}: {results[name]['err']}")
        tmpdirs.gc_now()
    shutil.rmtree(empty, ignore_errors=True)

    print(f"{len(results)} queries, {fails} failures on empty input")
    if out_json:
        with open(out_json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {out_json}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
