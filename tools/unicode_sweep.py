"""Unicode-hardened correctness sweep over the full catalog.

Web-scale corpora are multi-byte: CJK, emoji, combining accents,
bidi marks.  Correctness proven only on ASCII testdata can hide
byte-vs-codepoint divergences between the Spark plan and its DuckDB
oracle (``length``/``substr`` units, regex word classes, case
mapping, hash inputs taken over bytes on one side and codepoints on
the other).

This tool builds a deterministically-decorated copy of a scale-factor
dir: rows of ``documents`` whose doc_id hashes into a 5-in-6 bucket
get a multi-byte snippet woven into ``text`` (prefix + infix so both
edge and interior positions are exercised), cycling through five
script classes — CJK, emoji (astral plane, surrogate-pair territory
in UTF-16 engines), combining accents (NFD ``é``), Greek with a
bidi mark, and an uppercase case-stress class (Greek/Cyrillic/
Latin-extended through the text path's ``lower()``).  ``n_chars``
is recomputed in codepoints so the schema
invariant the generator guarantees (n_chars = length(text)) survives
decoration.  Then the full Spark-vs-DuckDB value gate
(tools/verify_local) runs over the decorated dir.

Usage: python tools/unicode_sweep.py [--json OUT.json] [src_sf_dir] [query ...]
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

# Five script classes, cycled by hash bucket.  Each holds a multi-byte
# prefix and an infix woven after the first word.  The fifth is the
# case-stress class: uppercase Greek/Cyrillic/Latin-extended that the
# text path's lower() must case-map identically on both engines.
#
# Case-mapping boundary (probed, pinned in tests/test_round10.py):
# the decoration deliberately avoids the two codepoint classes where
# Spark and DuckDB LEGITIMATELY disagree -- word-final 'Σ' (Spark
# applies Unicode FULL case mapping with the contextual final-sigma
# rule -> 'ς'; DuckDB applies SIMPLE mapping -> 'σ') and dotted 'İ'
# (Spark keeps the U+0307 combining dot, DuckDB drops it).  Both
# engines are internally consistent; a corpus containing those
# codepoints case-folds deterministically on the engine, it just
# cannot be value-compared against a simple-mapping oracle.
SNIPPETS = [
    ("漢字テスト ", " 中文分词 "),
    ("\U0001f680\U0001f9ea ", " \U0001f4c8\U0001f30d "),
    ("café naïve ", " résumé "),
    ("Αβγ ‏", " δέλτα "),
    ("ΔΟΚΙΜΗ STRAßE ", " ЖУРНАЛ Łódź "),
]


def build_decorated_dir(src: str, dst: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        src_file = f"{src}/{t}.parquet"
        dst_file = f"{dst}/{t}.parquet"
        if t != "documents":
            shutil.copyfile(src_file, dst_file)
            continue
        # CASE over hash(doc_id)%6: buckets 0-4 get snippet k woven in
        # (prefix + infix after the first space), bucket 5 stays ASCII
        # so mixed corpora are represented.  n_chars recomputed in
        # codepoints (DuckDB length() is codepoint-based, matching the
        # generator's invariant).
        arms = []
        for k, (pre, mid) in enumerate(SNIPPETS):
            pre_sql = pre.replace("'", "''")
            mid_sql = mid.replace("'", "''")
            arms.append(
                f"WHEN hash(doc_id) % 6 = {k} THEN"
                f" '{pre_sql}' || regexp_replace(text, ' ',"
                f" '{mid_sql}')"
            )
        decorated = f"CASE {' '.join(arms)} ELSE text END"
        con.execute(
            f"COPY (SELECT doc_id, {decorated} AS text, lang, source,"
            f" length({decorated}) AS n_chars"
            f" FROM '{src_file}')"
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

    deco = tempfile.mkdtemp(prefix="bes_unisf_")
    try:
        build_decorated_dir(src, deco)
        print(f"decorated copy of {src} at {deco}; running verify_local ...")
        r = subprocess.run(
            [sys.executable, "tools/verify_local.py", *json_args, deco,
             *only],
            cwd=REPO,
        )
        sys.exit(r.returncode)
    finally:
        shutil.rmtree(deco, ignore_errors=True)


if __name__ == "__main__":
    main()
