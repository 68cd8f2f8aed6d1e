"""Null-hardened correctness sweep over the full catalog.

100 TB corpora are dirty: comments are missing, JSON payloads are
empty, attributes were never set.  Correctness proven only on fully-
populated testdata can hide null-semantics divergences between the
Spark plan and its oracle (``concat`` vs ``||`` null propagation, a
pandas kernel crashing on ``None``, a filter that silently drops
null groups one engine keeps).

This tool builds a deterministically-dirtied copy of a scale-factor
dir — for each payload column below, rows whose key hashes into a
1-in-7 bucket get NULL (a per-column offset de-correlates the
buckets) — and then runs the full Spark-vs-DuckDB value gate
(tools/verify_local) over the dirty dir.  Keys, foreign keys, and
event timestamps stay non-null: those are preconditions the
reference's extractor guarantees (bugs/activity rows always carry
ids and times — extract_bugzilla.py's SELECTs), so nulling them
would test an input that cannot occur; payload columns carry no
such guarantee.

Usage: python tools/null_sweep.py [--json OUT.json] [src_sf_dir] [query ...]
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem"
    " events documents embeddings"
).split()

# table -> (row-identity key expr, payload columns to dirty).
NULLED: dict[str, tuple[str, list[str]]] = {
    "documents": ("doc_id", ["text", "lang", "source"]),
    "events": ("event_id", ["props", "value", "event_type"]),
    "orders": ("o_orderkey", ["o_orderpriority"]),
    "lineitem": (
        "l_orderkey * 8 + l_linenumber",
        ["l_returnflag", "l_discount"],
    ),
    "customer": ("c_custkey", ["c_mktsegment", "c_acctbal"]),
    "part": ("p_partkey", ["p_type", "p_brand"]),
    "supplier": ("s_suppkey", ["s_acctbal"]),
    "embeddings": ("vec_id", ["label"]),
}


def build_dirty_dir(src: str, dst: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        src_file = f"{src}/{t}.parquet"
        dst_file = f"{dst}/{t}.parquet"
        if t not in NULLED:
            shutil.copyfile(src_file, dst_file)
            continue
        key, cols = NULLED[t]
        # Per-column hash offset: different columns go null on
        # DIFFERENT rows, so multi-column null interactions appear
        # without any row losing every attribute at once.
        exprs = []
        for c in con.execute(
            f"SELECT * FROM '{src_file}' LIMIT 0"
        ).description:
            name = c[0]
            if name in cols:
                i = cols.index(name)
                exprs.append(
                    f"CASE WHEN hash(({key}) + {i * 1000003}) % 7 = 0"
                    f" THEN NULL ELSE {name} END AS {name}"
                )
            else:
                exprs.append(name)
        con.execute(
            f"COPY (SELECT {', '.join(exprs)} FROM '{src_file}')"
            f" TO '{dst_file}' (FORMAT PARQUET)"
        )


def main() -> None:
    args = sys.argv[1:]
    json_args: list[str] = []
    if args and args[0] == "--json":
        json_args = args[:2]
        args = args[2:]
    src = args[0] if args else "/root/testdata/sf0.001"
    only = args[1:]

    dirty = tempfile.mkdtemp(prefix="bes_nullsf_")
    try:
        build_dirty_dir(src, dirty)
        print(f"dirty copy of {src} at {dirty}; running verify_local ...")
        r = subprocess.run(
            [sys.executable, "tools/verify_local.py", *json_args, dirty,
             *only],
            cwd=REPO,
        )
        sys.exit(r.returncode)
    finally:
        shutil.rmtree(dirty, ignore_errors=True)


if __name__ == "__main__":
    main()
