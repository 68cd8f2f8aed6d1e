"""Local stand-in for the driver's correctness gate.

Runs every catalog query on Spark and its oracle on DuckDB over the
same parquet dir, then compares through PANDAS frames the way the
driver does: columns sorted by name, ``sort_values`` over ALL columns
(this is what raises ``unhashable type: 'list'`` on array outputs —
we must fail the same way the driver fails), then an
order-insensitive canonical-value comparison (floats to 6 significant
digits, timestamps to ISO micros).

Usage: python tools/verify_local.py [sf_dir] [query ...]
       python tools/verify_local.py --json OUT.json [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

args = sys.argv[1:]
JSON_OUT = None
if args and args[0] == "--json":
    JSON_OUT = args[1]
    args = args[2:]
SF_DIR = args[0] if args else "/root/testdata/sf0.01"
ONLY = set(args[1:])

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _canon_cell(v):
    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, (bool, np.bool_)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        # Type-distinct on purpose: the driver's canonicalizer hashes a
        # float64 1.0 differently from an int64 1 (this is how the
        # DuckDB-HUGEINT-sum -> pandas-float64 bug slipped through three
        # rounds: %.6g mapped both to "1").  Keep a decimal marker so
        # float cells NEVER collapse to integer strings.
        v = float(v)
        if math.isnan(v):
            return "nan"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        if v == 0:
            return "0.0"
        s = f"{v:.6g}"
        if "." not in s and "e" not in s:
            s += ".0"
        return s
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        return v.strftime("%Y-%m-%dT%H:%M:%S.%f")
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_frame(pdf: pd.DataFrame) -> list[str]:
    """Driver-shaped canonicalization: name-sorted columns, then
    sort_values over every column (raises on unhashable cells exactly
    like the driver's canonicalizer), then per-cell canonical strings.
    """
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    cells = pdf.map(_canon_cell)
    rows = ["|".join(r) for r in cells.itertuples(index=False, name=None)]
    rows.sort()  # canonical order independent of engine sort quirks
    return rows


def main():
    from bugzilla_etl_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("verify-local", cpus=8, shuffle_partitions=8)
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()

    con = duckdb.connect()
    # Spill budget: an in-memory DuckDB spills to cwd/.tmp with no
    # cap — at the sf1 gate one pathological oracle plan filled the
    # volume (LOCAL_GATE_sf1_r12's triangle_count red row).  Pin the
    # temp dir somewhere disposable and bound memory so an oracle
    # regression fails fast with an OOM error instead of taking the
    # host's disk down with it.
    con.execute("SET temp_directory='/tmp/bes_duck_spill'")
    con.execute("SET max_temp_directory_size='20GB'")
    con.execute("SET memory_limit='24GB'")
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(path):
            # Spark-written table (a directory of part files), e.g.
            # the sf1 gate's replicated corpus: glob the parts
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    results: dict[str, dict] = {}
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        rec = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        results[name] = rec
        try:
            sdf = fn(spark, SF_DIR)
            spdf = sdf.toPandas()
            rec["spark_rows"] = len(spdf)
        except Exception as e:
            rec["err"] = f"spark error {type(e).__name__}: {str(e)[:300]}"
            failures.append(name)
            print(f"FAIL {name}: {rec['err']}")
            continue
        if name not in oracles:
            rec["err"] = "no_oracle"
            print(f"OK?  {name}: rows-only ({len(spdf)} rows, no oracle)")
            continue
        try:
            dpdf = con.execute(oracles[name]).df()
            rec["oracle_rows"] = len(dpdf)
        except Exception as e:
            rec["err"] = f"duckdb error {str(e)[:300]}"
            failures.append(name)
            print(f"FAIL {name}: {rec['err']}")
            continue
        rec["schema_match"] = sorted(spdf.columns) == sorted(dpdf.columns)
        rec["rows_match"] = len(spdf) == len(dpdf)
        if not rec["schema_match"]:
            failures.append(name)
            print(
                f"FAIL {name}: columns spark={sorted(spdf.columns)} "
                f"duck={sorted(dpdf.columns)}"
            )
            continue
        if not rec["rows_match"]:
            failures.append(name)
            print(
                f"FAIL {name}: rowcount spark={len(spdf)} duck={len(dpdf)}"
            )
            continue
        try:
            a, b = canon_frame(spdf), canon_frame(dpdf)
        except Exception as e:
            rec["err"] = f"canon error {type(e).__name__}: {str(e)[:300]}"
            failures.append(name)
            print(f"FAIL {name}: {rec['err']}")
            continue
        rec["hash_match"] = a == b
        if a != b:
            failures.append(name)
            bad = next(
                (i for i, (x, y) in enumerate(zip(a, b)) if x != y),
                len(a) - 1,
            )
            print(f"FAIL {name}: values differ at sorted row {bad}:")
            print(f"  spark: {a[bad][:250]}")
            print(f"  duck : {b[bad][:250]}")
        else:
            print(f"PASS {name} ({len(spdf)} rows)")

    if JSON_OUT:
        with open(JSON_OUT, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {JSON_OUT} ({len(results)} rows)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
