"""Round-15 additions: bpe_encode (#188, r14 verdict task 8) and the
spans-family hash_bits parameter (r14 verdict task 5)."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from bugzilla_etl_spark.plans import catalog
from tests.util import assert_same

catalog.load_all()


def test_bpe_encode_hostile_docs(spark, tmp_path):
    """Null text, empty text, whitespace-only, unicode, and a
    single-char doc all encode without error and match the oracle on
    the same parquet — the hostile-input sweep's cases, pinned as a
    unit test at the operator's own edge."""
    rows = [
        (1, "low lower low", "en"),
        (2, None, "en"),
        (3, "", "en"),
        (4, "   ", "en"),
        (5, "héllo wörld héllo", "de"),
        (6, "x", "en"),
        (7, "newest widest newest NEWEST", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    d = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(d)
    sf_dir = str(tmp_path)
    os.rename(
        next(
            str(p) for p in (tmp_path / "docs").iterdir()
            if p.suffix == ".parquet"
        ),
        str(tmp_path / "documents.parquet"),
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" '{tmp_path}/documents.parquet'"
    )
    sdf = catalog.QUERIES["bpe_encode"](spark, sf_dir)
    assert_same(sdf, con, catalog.ORACLES["bpe_encode"])
    got = {r.doc_id: r for r in sdf.collect()}
    # null / empty / whitespace-only all encode to the empty sequence
    for did in (2, 3, 4):
        assert got[did].n_terms == 0
        assert got[did].n_tokens == 0
        assert got[did].token_ids == ""
    # a doc's token count is the sum of its terms' symbol counts
    assert got[6].n_terms == 1 and got[6].n_tokens >= 1
    assert len(got[1].token_ids.split(" ")) == got[1].n_tokens
    con.close()


def test_bpe_encode_consistent_with_bpe_apply(spark, sf_dir):
    """Cross-operator invariant: total corpus tokens under the
    learned tokenizer == Σ over the vocab of f · n_sym (bpe_apply's
    output) — the encode pass and the training loop must agree on
    every term's segmentation."""
    enc = catalog.QUERIES["bpe_encode"](spark, sf_dir)
    app = catalog.QUERIES["bpe_apply"](spark, sf_dir)
    total_enc = enc.agg(F.sum("n_tokens")).first()[0]
    total_app = app.agg(F.sum(F.col("f") * F.col("n_sym"))).first()[0]
    assert total_enc == total_app


def test_bpe_encode_corpus_pass_is_broadcast_map(spark, sf_dir):
    """Plan shape: the corpus-side encode is a broadcast of the
    ONE-ROW tokenizer map (BroadcastNestedLoopJoin — the documented
    bounded-broadcast exception), never a CartesianProduct, and the
    documents scan reads only (doc_id, text)."""
    import contextlib
    import io

    sdf = catalog.QUERIES["bpe_encode"](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sdf.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    scan = next(
        seg for seg in plan.split("\n\n")
        if "documents.parquet" in seg and "ReadSchema" in seg
    )
    assert "lang" not in scan, scan
