"""Round-16 additions, part 1: the bench-alert artifact-provenance
fixes (r15 advice — embedded measured_at for the corroboration
freshness guard; same-conditions cross-check before the streaming
lane borrows the batch host_factor)."""

from __future__ import annotations

import json
import os
import time

import pytest


def _ba():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import bench_alert as BA

    return BA


def test_freshness_guard_reads_embedded_measured_at(tmp_path):
    """A committed artifact's mtime is reset by any checkout, so a
    lane measured DAYS ago under genuine host tax can look mtime-
    fresh.  With measured_at embedded, the guard must treat it as
    stale (median kept, no probe) even though the file was written
    this instant."""
    BA = _ba()
    taxed = {q: ref * 2.0 for q, ref in BA.CALIBRATION.items()}
    stale_at = int(time.time()) - BA.CORROBORATE_MAX_AGE_S - 3600
    p = tmp_path / "BENCH_r95.json"
    p.write_text(json.dumps({"queries": taxed, "measured_at": stale_at}))
    # mtime is NOW (just written) — the old mtime proxy would have
    # called this fresh and capped the factor
    report = BA.check(str(p), None)
    assert report["host_factor"] == pytest.approx(2.0)
    assert "synthetic_factor" not in report
    assert "NOT corroborated" in report["calibration"]["note"]
    assert report["calibration"]["age_source"] == "measured_at"


def test_freshness_guard_falls_back_to_mtime_with_note(tmp_path):
    """Pre-r16 artifacts carry no measured_at: the guard falls back
    to mtime and SAYS so, keeping old artifacts evaluable."""
    BA = _ba()
    taxed = {q: ref * 2.0 for q, ref in BA.CALIBRATION.items()}
    p = tmp_path / "BENCH_r94.json"
    p.write_text(json.dumps({"queries": taxed}))
    old = time.time() - BA.CORROBORATE_MAX_AGE_S - 60
    os.utime(p, (old, old))
    report = BA.check(str(p), None)
    assert report["host_factor"] == pytest.approx(2.0)
    assert "mtime" in report["calibration"]["age_source"]


def _write_pair(tmp_path, BA, rnd_b, rnd_s, bm=None, sm=None, t=None):
    """A quiet-host batch artifact except taxed calibration members
    (host_factor 2.0) plus a streaming artifact whose one pinned
    query sits at 1.5x pin — under a borrowed factor of 2.0 it reads
    0.75x (forgiven); uncalibrated it reads 1.5x (no 2x crossing
    either, so use 2.2x for the alert-firing variants)."""
    pins = BA.parse_pins()
    sname = "stream_previous_values"
    assert sname in pins
    taxed = {q: ref * 2.0 for q, ref in BA.CALIBRATION.items()}
    b = {"queries": taxed}
    if bm is not None:
        b["measured_at"] = bm
    s = {"queries": {sname: pins[sname] * (t or 2.2)}}
    if sm is not None:
        s["measured_at"] = sm
    bp = tmp_path / f"BENCH_r{rnd_b}.json"
    sp = tmp_path / f"STREAMBENCH_r{rnd_s}.json"
    bp.write_text(json.dumps(b))
    sp.write_text(json.dumps(s))
    return str(bp), str(sp), sname


def test_stream_lane_borrows_factor_only_same_round(tmp_path):
    """Round-suffix mismatch between the batch and streaming
    artifacts → the batch host_factor is NOT borrowed; the streaming
    2.2x-pin query alerts at factor 1.0 instead of being divided
    under its pin by a host tax measured in a different round."""
    BA = _ba()
    now = int(time.time())
    bp, sp, sname = _write_pair(tmp_path, BA, 93, 92, bm=now, sm=now)
    report = BA.check(bp, sp, synth=2.0)
    assert report["stream_host_factor"] == 1.0
    assert "round mismatch" in report["stream_calibration_note"]
    assert any(a["query"] == sname for a in report["alerts"])


def test_stream_lane_borrows_factor_only_when_fresh_pair(tmp_path):
    """Same round but measured hours apart → host state is not
    shared; factor not borrowed, streaming alert fires."""
    BA = _ba()
    now = int(time.time())
    apart = now - BA.CORROBORATE_MAX_AGE_S - 120
    bp, sp, sname = _write_pair(tmp_path, BA, 91, 91, bm=now, sm=apart)
    report = BA.check(bp, sp, synth=2.0)
    assert report["stream_host_factor"] == 1.0
    assert "apart" in report["stream_calibration_note"]
    assert any(a["query"] == sname for a in report["alerts"])


def test_stream_lane_same_conditions_pair_is_calibrated(tmp_path):
    """Same round, measured minutes apart, probe corroborates the
    tax → the streaming lane IS calibrated by the batch factor and a
    2.2x raw / 1.1x calibrated query does not alert."""
    BA = _ba()
    now = int(time.time())
    bp, sp, sname = _write_pair(tmp_path, BA, 90, 90, bm=now, sm=now - 300)
    report = BA.check(bp, sp, synth=2.0)
    assert report["stream_host_factor"] == pytest.approx(2.0)
    assert not any(a["query"] == sname for a in report["alerts"])


def test_stream_lane_legacy_pair_keeps_old_behavior(tmp_path):
    """Both artifacts pre-r16 (no measured_at): same-round filename
    match is accepted, with the legacy note in the report — old
    committed rounds stay evaluable without spurious alerts."""
    BA = _ba()
    bp, sp, sname = _write_pair(tmp_path, BA, 89, 89)
    report = BA.check(bp, sp, synth=2.0)
    assert report["stream_host_factor"] == pytest.approx(2.0)
    assert "pre-r16" in report["stream_calibration_note"]
    assert not any(a["query"] == sname for a in report["alerts"])


def test_bench_artifacts_embed_measured_at():
    """bench.py and streambench.py must stamp measured_at into the
    JSON they print — greppable contract so a refactor can't drop
    the field the freshness guard depends on."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    for rel in ("bench.py", "tools/streambench.py"):
        src = (root / rel).read_text()
        assert '"measured_at": int(time.time())' in src, rel


def test_probe_gram_index_rejects_width_mismatch(spark, tmp_path):
    """An index written at one hash width probed at the other must
    RAISE: gh is bigint at 60 and md5-hex string at 128, so the
    coerced join key would null every comparison and return zero
    hits — a silent false-negative on the dedup path (r15 advice)."""
    import pytest as _pytest

    from bugzilla_etl_spark.operators.dedup import (
        probe_gram_index,
        write_gram_index,
    )

    corpus = spark.createDataFrame(
        [(2, "a b c d e f g h i j k l")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(1, "a b c d e f g h q r s t")], "doc_id long, text string"
    )
    name60 = write_gram_index(
        corpus, "r16_gramidx_w60_t", str(tmp_path / "idx60"), hash_bits=60
    )
    try:
        with _pytest.raises(ValueError, match="hash_bits=128.*built at"):
            probe_gram_index(spark.table(name60), batch, hash_bits=128)
        # matched width still probes fine
        assert probe_gram_index(
            spark.table(name60), batch, hash_bits=60
        ).count() > 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name60}")
    name128 = write_gram_index(
        corpus, "r16_gramidx_w128_t", str(tmp_path / "idx128"),
        hash_bits=128,
    )
    try:
        with _pytest.raises(ValueError, match="hash_bits=60.*built at"):
            probe_gram_index(spark.table(name128), batch, hash_bits=60)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name128}")


# --- bpe_encode map_mode={broadcast,join} (r15 verdict task 2) ----


def _join_mode_fixture(spark):
    docs = spark.createDataFrame(
        [
            (1, "low lower low"),
            (2, None),
            (3, ""),
            (4, "newest low oov_term"),
        ],
        "doc_id long, text string",
    )
    term_ids = spark.createDataFrame(
        [("low", [1]), ("lower", [2, 3]), ("newest", [4])],
        "term string, ids array<bigint>",
    )
    return docs, term_ids


def test_bpe_encode_join_mode_semantics(spark):
    """Join mode reproduces the broadcast contract on hostile rows:
    empty/null docs survive with zero tokens, order is positional,
    and the unk policy maps OOV to id 0 (without unk the OOV token
    drops, matching the oracle's inner join)."""
    from bugzilla_etl_spark.plans.queries_text import bpe_encode_docs

    docs, term_ids = _join_mode_fixture(spark)
    out = {
        r.doc_id: r
        for r in bpe_encode_docs(
            docs, term_ids, unk=True, map_mode="join"
        ).collect()
    }
    assert out[1].token_ids == "1 2 3 1" and out[1].n_tokens == 4
    assert out[2].n_terms == 0 and out[2].token_ids == ""
    assert out[3].n_terms == 0 and out[3].token_ids == ""
    assert out[4].token_ids == "4 1 0"  # oov -> unk id 0
    strict = {
        r.doc_id: r
        for r in bpe_encode_docs(
            docs, term_ids, unk=False, map_mode="join"
        ).collect()
    }
    assert strict[4].token_ids == "4 1"  # oov token dropped, doc kept
    assert strict[2].token_ids == ""


def test_bpe_encode_join_mode_plan_shape(spark):
    """The large-vocab plan contract: NO broadcast of the vocab (the
    whole point — it doesn't fit), a shuffle-hash join on term,
    exactly THREE hash exchanges total (term x2 — probe and vocab
    build side — plus the doc_id regroup; the corpus pays the two
    token-grain ones), and no unpartitioned window."""
    import contextlib
    import io
    import re

    from bugzilla_etl_spark.plans.queries_text import bpe_encode_docs

    docs, term_ids = _join_mode_fixture(spark)
    out = bpe_encode_docs(docs, term_ids, unk=True, map_mode="join")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" not in plan, plan
    assert "BroadcastExchange" not in plan, plan
    assert "ShuffledHashJoin" in plan, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 3, plan
    assert "Window" not in plan, plan


def test_bpe_encode_docs_rejects_unknown_map_mode(spark):
    from bugzilla_etl_spark.plans.queries_text import bpe_encode_docs

    docs, term_ids = _join_mode_fixture(spark)
    with pytest.raises(ValueError, match="map_mode"):
        bpe_encode_docs(docs, term_ids, map_mode="hybrid")


def test_bpe_encode_modes_agree_end_to_end(spark, sf_dir):
    """Both catalog entries — #188 (broadcast fold) and #191 (term
    join) — produce IDENTICAL rows over the real documents table:
    the mode knob changes the physical strategy, never the result."""
    from bugzilla_etl_spark.plans import catalog

    a = catalog.QUERIES["bpe_encode"](spark, sf_dir)
    b = catalog.QUERIES["bpe_encode_join"](spark, sf_dir)
    assert a.columns == b.columns
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_bpe_encode_join_ids_array_and_carry(spark):
    """The seq_packing_ids consumer surface works in join mode too:
    ids_array returns array<bigint> and carry columns pass through."""
    from bugzilla_etl_spark.plans.queries_text import bpe_encode_docs

    docs = spark.createDataFrame(
        [(1, "low lower", "web"), (2, None, "code")],
        "doc_id long, text string, source string",
    )
    term_ids = spark.createDataFrame(
        [("low", [1]), ("lower", [2, 3])],
        "term string, ids array<bigint>",
    )
    out = {
        r.doc_id: r
        for r in bpe_encode_docs(
            docs,
            term_ids,
            carry=("source",),
            ids_array=True,
            map_mode="join",
        ).collect()
    }
    assert out[1].ids == [1, 2, 3] and out[1].source == "web"
    assert out[2].ids == [] and out[2].source == "code"


# --- persisted tokenizer artifact (r15 verdict task 3) ------------


def test_tokenizer_save_load_roundtrip(spark, tmp_path):
    """save_tokenizer → load_tokenizer is lossless: the loaded
    vocab-grain frame folds to the same one-row map and encodes
    identically to the in-memory path, in BOTH encode modes."""
    from bugzilla_etl_spark.operators.text import (
        load_tokenizer,
        save_tokenizer,
    )
    from bugzilla_etl_spark.plans.queries_text import (
        bpe_encode_docs,
        bpe_tokenizer_terms,
        fold_term_map,
    )

    docs = spark.createDataFrame(
        [(1, "low lower low"), (2, "newest widest"), (3, None)],
        "doc_id long, text string",
    )
    terms = bpe_tokenizer_terms(spark, docs)
    path = str(tmp_path / "tok")
    save_tokenizer(terms, path)
    loaded = load_tokenizer(spark, path)
    tkey = lambda rows: sorted(  # noqa: E731
        (r.term, list(r.ids)) for r in rows
    )
    assert tkey(terms.collect()) == tkey(loaded.collect()), (
        "vocab-grain artifact must round-trip bit-identically"
    )
    key = lambda df: sorted(  # noqa: E731
        tuple(r.asDict().values()) for r in df.collect()
    )
    direct = key(bpe_encode_docs(docs, fold_term_map(terms)))
    via_store_bcast = key(bpe_encode_docs(docs, fold_term_map(loaded)))
    via_store_join = key(bpe_encode_docs(docs, loaded, map_mode="join"))
    assert direct == via_store_bcast == via_store_join


def test_load_tokenizer_empty_artifact_dir(spark, tmp_path):
    """An artifact dir holding an empty-vocab write still loads with
    the pinned schema and encodes every doc to the empty sequence
    (the empty-corpus contract riding through the store)."""
    from bugzilla_etl_spark.operators.text import (
        TOKENIZER_SCHEMA,
        load_tokenizer,
        save_tokenizer,
    )
    from bugzilla_etl_spark.plans.queries_text import (
        bpe_encode_docs,
        fold_term_map,
    )

    empty = spark.createDataFrame([], TOKENIZER_SCHEMA)
    path = str(tmp_path / "tok0")
    save_tokenizer(empty, path)
    loaded = load_tokenizer(spark, path)
    assert loaded.count() == 0
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    out = bpe_encode_docs(docs, fold_term_map(loaded), unk=True).collect()
    assert out[0].n_tokens == 2 and out[0].token_ids == "0 0"


@pytest.mark.slow
def test_stream_bpe_encode_serves_prebuilt_artifact(spark, sf_dir, tmp_path):
    """The production call shape: a tokenizer artifact saved BEFORE
    the stream exists is served via tokenizer_path and yields rows
    identical to the self-contained train+save path — proving the
    entry's wall time is the only thing the knob changes."""
    from bugzilla_etl_spark.operators.text import save_tokenizer
    from bugzilla_etl_spark.plans import catalog
    from bugzilla_etl_spark.plans.queries_history import stream_bpe_encode
    from bugzilla_etl_spark.plans.queries_text import bpe_tokenizer_terms
    from bugzilla_etl_spark.sources import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    art = str(tmp_path / "frozen")
    save_tokenizer(
        bpe_tokenizer_terms(spark, docs.where(F.col("doc_id") % 2 == 0)),
        art,
    )
    served = stream_bpe_encode(spark, sf_dir, tokenizer_path=art)
    default = catalog.QUERIES["stream_bpe_encode"](spark, sf_dir)
    assert served.columns == default.columns
    a = sorted(tuple(r.asDict().values()) for r in served.collect())
    b = sorted(tuple(r.asDict().values()) for r in default.collect())
    assert a == b


# --- mix_apply: the mixing materializer (r15 verdict task 6) ------


def test_mix_apply_invariants_vs_planned_shares(spark, sf_dir):
    """#192 executes #46's plan: per language the emitted doc mass
    must be floor(r)*n_docs plus a hash-selected remainder cohort —
    bounded by [floor(r), ceil(r)]*n_docs, within binomial noise of
    n_docs*r, with (doc_id, epoch_ordinal) unique and ordinals
    dense from 0."""
    import math

    from bugzilla_etl_spark.plans import catalog
    from pyspark.sql import functions as F

    catalog.load_all()
    plan = {
        r.lang: r.asDict()
        for r in catalog.QUERIES["mix_weights"](spark, sf_dir).collect()
    }
    out = catalog.QUERIES["mix_apply"](spark, sf_dir)
    emitted = {
        r.lang: r.asDict()
        for r in out.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("docs"),
            F.max("epoch_ordinal").alias("max_ord"),
            F.min("epoch_ordinal").alias("min_ord"),
        )
        .collect()
    }
    assert out.count() == out.select("doc_id", "epoch_ordinal").distinct().count()
    for lang, p in plan.items():
        r = p["repeat_factor"]
        n_docs = p["n_docs"]
        lo, hi = math.floor(r), math.ceil(r)
        if lang not in emitted:
            assert lo == 0 and r < 1, (lang, r)
            continue
        e = emitted[lang]
        assert lo * n_docs <= e["n"] <= hi * n_docs, (lang, r, e)
        frac = r - lo
        sd = math.sqrt(n_docs * frac * (1 - frac))
        assert abs(e["n"] - n_docs * r) <= 4 * sd + 2, (lang, r, e)
        assert e["min_ord"] == 0
        assert e["max_ord"] <= hi - 1


def test_mix_apply_plan_zero_corpus_exchanges(spark, sf_dir):
    """The corpus pass is one broadcast join + an epoch explode —
    the only exchanges in the plan belong to the broadcast-size
    weight aggregation, so the corpus side plans ZERO hash
    exchanges and no window at all."""
    import contextlib
    import io
    import re

    from bugzilla_etl_spark.plans import catalog

    catalog.load_all()
    out = catalog.QUERIES["mix_apply"](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Window" not in plan, plan
    # corpus side: scan -> project -> BroadcastHashJoin -> explode;
    # hash exchanges may appear only under the (vocab-size) weight
    # subtree feeding a BroadcastExchange
    assert "BroadcastHashJoin" in plan, plan
    # every Exchange must sit INSIDE a BroadcastExchange subtree
    # (the |lang|-grain weight aggregations feeding the broadcast);
    # in the indented tree a corpus-side shuffle would appear at
    # shallower indentation than the first BroadcastExchange
    tree = plan.split("(1) Scan")[0].splitlines()
    bcast_depth = min(
        line.index("BroadcastExchange")
        for line in tree
        if "BroadcastExchange" in line
    )
    for line in tree:
        if re.search(r"\bExchange \(\d+\)", line):
            assert line.index("Exchange") > bcast_depth, (line, plan)


# --- sessionize-ooo premature-close fix (found by the r16
# --- hypothesis run while touching the heartbeat drain) -----------


def test_sessionize_ooo_timeout_does_not_close_in_gap_session():
    """A mid-stream timeout (armed at the buffered-rows horizon)
    fires while the watermark still sits INSIDE the open session's
    gap window; a later in-gap event must EXTEND that session, not
    start a new one.  Pre-r16 the kernel closed the session
    unconditionally on hasTimedOut, splitting it in two."""
    import numpy as np
    import pandas as pd

    from bugzilla_etl_spark.streaming.snapshot_stream import (
        SESSION_GAP_S,
        _sessionize_state_ooo,
    )
    from tests.test_ooo_properties import FakeGroupState

    stt = FakeGroupState()

    def run(batch_rows, wm_ms, timed_out=False):
        stt.wm_ms = wm_ms
        stt.hasTimedOut = timed_out
        if timed_out:
            stt.timeout_ms = None
        pdf = pd.DataFrame(
            batch_rows, columns=["event_id", "tsl"]
        ).astype(np.int64)
        return list(
            _sessionize_state_ooo((7,), [pdf] if len(pdf) else [], stt)
        )

    # batch 0: three events at ts=0 arrive, wm=0 -> all buffered,
    # timeout armed at (0+1)*1000
    assert run([(1, 0), (2, 0), (3, 0)], 0) == []
    assert stt.timeout_ms is not None and stt.timeout_ms <= 2000
    # timeout fires at wm=2s (gap is SESSION_GAP_S >> 2s): the
    # buffered rows finalize into the OPEN session; nothing closes
    out = run([], 2000, timed_out=True)
    assert out == [] or all(len(o) == 0 for o in out)
    # the surviving session re-armed its timeout at the gap horizon
    assert stt.timeout_ms is not None
    assert stt.timeout_ms >= (SESSION_GAP_S + 1) * 1000
    # an in-gap event at ts=2 extends the same session
    assert run([(4, 2)], 2000) == []
    # stream drains: watermark passes everything
    out = run([], (SESSION_GAP_S + 10) * 1000, timed_out=True)
    rows = pd.concat(out, ignore_index=True)
    assert len(rows) == 1
    r = rows.iloc[0]
    assert (
        int(r.session_id), int(r.n_events),
        int(r.session_start), int(r.session_end),
    ) == (1, 4, 0, 2)
