"""Behavioral tests for flag-change replay and sub-entity versioning
(reference parse_bug_history.py semantics on hand-built change logs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bugzilla_etl_spark.operators import flags as FL
from bugzilla_etl_spark.operators import subentity as SUB


def _flag_rows(spark, rows):
    return spark.createDataFrame(
        rows, "user_id int, event_id int, tsl long, name string, "
        "status string, requestee string, action string"
    )


def _versions(spark, rows):
    return spark.createDataFrame(rows, "user_id int, version_ts long")


def test_flag_delete_carries_previous_status_and_age(spark):
    # review?(a@x) added at t=100, removed at t=300 ->
    # deleted marker with prev='?' and age=200 (processFlagChange :666)
    ch = _flag_rows(
        spark,
        [
            (1, 1, 100, "review", "?", "a@x", "add"),
            (1, 2, 300, "review", "?", "a@x", "remove"),
        ],
    )
    iv = FL.flag_state_intervals(ch, ts="tsl")
    out = FL.flag_states_per_version(
        iv, _versions(spark, [(1, 100), (1, 300)])
    ).sort("version_ts")
    r = {row["version_ts"]: row for row in out.collect()}
    assert r[100]["flags_active"] == "review?(a@x)"
    assert r[100]["n_deleted"] == 0
    assert r[300]["flags_active"] == ""
    assert r[300]["flags_deleted"] == "review:d:prev=?:age=200"


def test_flag_deformat_matches_across_case_and_hyphen(spark):
    # 'Sec‑Review' (U+2011) and 'sec-review' are the SAME flag key
    # (deformat :1088): the second add supersedes, not duplicates.
    ch = _flag_rows(
        spark,
        [
            (1, 1, 100, "Sec‑Review", "+", None, "add"),
            (1, 2, 200, "sec-review", "-", None, "add"),
        ],
    )
    iv = FL.flag_state_intervals(ch, ts="tsl")
    out = FL.flag_states_per_version(iv, _versions(spark, [(1, 250)]))
    row = out.collect()[0]
    assert row["n_active"] == 1
    assert row["flags_active"] == "sec-review-"


def test_flag_requestee_keys_requests_separately(spark):
    # Two '?' requests of the same type to different requestees
    # coexist; a granted '+' of that type is a third, setter-keyed
    # flag (findFlag :630-:636).
    ch = _flag_rows(
        spark,
        [
            (1, 1, 100, "review", "?", "a@x", "add"),
            (1, 2, 110, "review", "?", "b@x", "add"),
            (1, 3, 120, "review", "+", None, "add"),
        ],
    )
    iv = FL.flag_state_intervals(ch, ts="tsl")
    out = FL.flag_states_per_version(iv, _versions(spark, [(1, 150)]))
    row = out.collect()[0]
    assert row["n_active"] == 3
    assert row["flags_active"] == "review+|review?(a@x)|review?(b@x)"


def test_flag_readd_supersedes_dangling_deletion(spark):
    # add -> remove -> re-add: final state is active again, and the
    # middle version shows the deletion (realignment :693).
    ch = _flag_rows(
        spark,
        [
            (1, 1, 100, "approval", "?", "q@x", "add"),
            (1, 2, 200, "approval", "?", "q@x", "remove"),
            (1, 3, 300, "approval", "?", "q@x", "add"),
        ],
    )
    iv = FL.flag_state_intervals(ch, ts="tsl")
    out = FL.flag_states_per_version(
        iv, _versions(spark, [(1, 200), (1, 300)])
    )
    r = {row["version_ts"]: row for row in out.collect()}
    assert r[200]["n_deleted"] == 1 and r[200]["n_active"] == 0
    assert r[300]["flags_active"] == "approval?(q@x)"
    assert r[300]["n_deleted"] == 0


def _sub_rows(spark, rows):
    return spark.createDataFrame(
        rows,
        "user_id int, event_id int, tsl long, attach_id int, "
        "field string, cents long",
    )


def test_subentity_rollforward_and_nesting(spark):
    # attach 1: status set twice (rollforward keeps latest <= T);
    # attach 2 appears later; version before any change nests empty.
    ch = _sub_rows(
        spark,
        [
            (1, 1, 100, 1, "status", 10),
            (1, 2, 200, 1, "status", 20),
            (1, 3, 150, 1, "size", 5),
            (1, 4, 250, 2, "status", 30),
        ],
    )
    iv = SUB.subentity_state_intervals(
        ch, sub="attach_id", field="field", value="cents", ts="tsl"
    )
    ver = _versions(spark, [(1, 50), (1, 160), (1, 260)])
    out = SUB.nest_per_version(
        iv, ver, sub="attach_id", field="field", value="cents"
    )
    r = {row["version_ts"]: row for row in out.collect()}
    assert r[50]["n_subs"] == 0 and r[50]["subs"] == ""
    assert r[160]["n_subs"] == 1
    assert r[160]["subs"] == "a1:c100:size=5,status=10"
    assert r[260]["n_subs"] == 2
    assert r[260]["subs"] == "a1:c100:size=5,status=20|a2:c250:status=30"


def test_subentity_created_ts_is_first_change(spark):
    # created_ts = MIN over the sub-entity's changes
    # (processAttachmentsTableItem :286), stable across later versions.
    ch = _sub_rows(
        spark,
        [
            (1, 1, 500, 7, "status", 1),
            (1, 2, 900, 7, "flagged", 2),
        ],
    )
    iv = SUB.subentity_state_intervals(
        ch, sub="attach_id", field="field", value="cents", ts="tsl"
    )
    out = SUB.nest_per_version(
        iv, _versions(spark, [(1, 1000)]), sub="attach_id",
        field="field", value="cents",
    )
    assert out.collect()[0]["subs"] == "a7:c500:flagged=2,status=1"


def test_subentity_single_exchange_for_both_windows(spark):
    # hashpartitioning(entity, sub) must serve BOTH windows (subset
    # rule) — exactly one Exchange in the interval plan.
    ch = _sub_rows(spark, [(1, 1, 100, 1, "status", 10)])
    iv = SUB.subentity_state_intervals(
        ch, sub="attach_id", field="field", value="cents", ts="tsl"
    )
    plan = iv._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_changepoint_path_matches_interval_path(spark):
    # The scale-path (per-change-point rendered states, as-of join)
    # must produce byte-identical version documents to the per-field
    # interval join, including same-ts tiebreaks and empty versions.
    import random

    rng = random.Random(7)
    rows = []
    eid = 0
    for u in (1, 2):
        for _ in range(40):
            eid += 1
            rows.append(
                (
                    u,
                    eid,
                    rng.choice([100, 200, 200, 300, 400, 500]),
                    rng.randint(1, 3),
                    rng.choice(["status", "size", "mime", "flag"]),
                    rng.randint(0, 9),
                )
            )
    ch = _sub_rows(spark, rows)
    ver = _versions(
        spark, [(u, t) for u in (1, 2) for t in (50, 150, 250, 350, 600)]
    )

    iv = SUB.subentity_state_intervals(
        ch, sub="attach_id", field="field", value="cents", ts="tsl"
    )
    a = SUB.nest_per_version(
        iv, ver, sub="attach_id", field="field", value="cents"
    )
    cp = SUB.subentity_changepoints(
        ch, sub="attach_id", field="field", value="cents", ts="tsl"
    )
    b = SUB.nest_changepoints_per_version(cp, ver, sub="attach_id")

    ka = sorted(map(tuple, a.collect()))
    kb = sorted(map(tuple, b.collect()))
    assert ka == kb


def test_changepoint_single_exchange(spark):
    # Change-point rendering keeps the one-exchange shape: both the
    # cumulative-history window and the lead() window cluster on
    # (entity, sub).
    ch = _sub_rows(spark, [(1, 1, 100, 1, "status", 10)])
    cp = SUB.subentity_changepoints(
        ch, sub="attach_id", field="field", value="cents", ts="tsl"
    )
    plan = cp._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_previous_values_tracks_real_changes_only(spark):
    """setPrevious parity: first change uses creation ts as change_to,
    later changes chain prior change-away -> change_to; a no-op entry
    (same value again) neither emits nor disturbs the carried record.
    reference: parse_bug_history.py:783 setPrevious, :599 != guard,
    :528 old==new entries nulled."""
    import datetime as dt

    from bugzilla_etl_spark.operators.snapshot import previous_values

    def t(s):
        return dt.datetime(1970, 1, 1) + dt.timedelta(seconds=s)

    rows = [
        (1, 1, t(0), "a", 1.0),
        (1, 2, t(86400), "a", 2.0),
        (1, 3, t(100000), "a", 2.0),  # no-op: value unchanged
        (1, 4, t(200000), "a", 3.0),
        (1, 5, t(250000), "b", 9.0),
    ]
    df = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp, "
        "event_type string, value double",
    )
    out = {
        r.event_id: r
        for r in previous_values(df, fields=("a", "b")).collect()
    }
    assert len(out) == 5

    # first change of 'a': prev NULL, change_to = creation ts (= 0)
    r1 = out[1]
    assert r1.a_prev_value is None
    assert r1.a_change_to_l == 0 and r1.a_change_away_l == 0
    assert r1.a_duration_days == 0
    assert r1.b_prev_value is None and r1.b_change_away_l is None

    # second change: prev=1.0, change_to = prior change-away (0)
    r2 = out[2]
    assert r2.a_prev_value == 1.0
    assert r2.a_change_to_l == 0 and r2.a_change_away_l == 86400
    assert r2.a_duration_days == 1

    # no-op row carries the SAME record, does not re-emit
    r3 = out[3]
    assert (
        r3.a_prev_value, r3.a_change_to_l, r3.a_change_away_l,
        r3.a_duration_days,
    ) == (r2.a_prev_value, r2.a_change_to_l, r2.a_change_away_l,
          r2.a_duration_days)

    # third real change: prev=2.0, change_to = 86400 (NOT the no-op ts)
    r4 = out[4]
    assert r4.a_prev_value == 2.0
    assert r4.a_change_to_l == 86400 and r4.a_change_away_l == 200000
    assert r4.a_duration_days == (200000 - 86400) // 86400

    # b's first change on the last row: change_to = entity creation (0)
    r5 = out[5]
    assert r5.b_prev_value is None
    assert r5.b_change_to_l == 0 and r5.b_change_away_l == 250000
    assert r5.b_duration_days == 250000 // 86400
    # a's record still carried forward unchanged
    assert r5.a_change_away_l == 200000


def test_build_full_docs_canonicalizes_actor_through_store(
    spark, sf_dir, tmp_path
):
    """The flagship's modified_by field must pass through the alias
    mapping exactly like the reference's email_alias during parsing
    (parse_bug_history.py:1048) — and the mapping parameter must seam
    to the PERSISTENT store: a mapping saved with save_aliases and
    re-loaded with load_aliases drives the same canonicalization."""
    from bugzilla_etl_spark.plans.queries_history import build_full_docs
    from bugzilla_etl_spark.sinks import alias_store as S
    from bugzilla_etl_spark.sources import load_table

    # take the aliased user's events explicitly plus a control slice,
    # so the mapped row is GUARANTEED present (an arbitrary limit()
    # could miss user 13 and degenerate the test to its control arm)
    all_ev = load_table(spark, sf_dir, "events")
    ev = all_ev.where(F.col("user_id") == 13).limit(50).unionByName(
        all_ev.where(F.col("user_id") != 13).limit(150)
    )
    mapping = spark.createDataFrame(
        [("u13@example.com", "canonical@example.com")],
        "alias string, canonical string",
    )
    path = str(tmp_path / "store")
    S.save_aliases(mapping, path)
    stored, _ = S.load_aliases(spark, path)

    docs = build_full_docs(ev, alias_mapping=stored)
    got = {
        r.user_id: r.modified_by
        for r in docs.select("user_id", "modified_by").distinct().collect()
    }
    assert 13 in got and len(got) > 1
    for uid, mb in got.items():
        if uid == 13:
            assert mb == "canonical@example.com"
        else:
            assert mb == f"u{uid}@example.com"


def test_flag_tiered_match_cascade(spark):
    """findFlag's tier cascade (parse_bug_history.py:626-:650):
    parsed-key match absorbs case via deformat but REQUIRES status
    equality; unparseable flags match by exact value; truncated
    values match by common prefix; garbage stays unmatched."""
    from bugzilla_etl_spark.operators.flags import flag_tiered_match

    cur = spark.createDataFrame(
        [
            (1, "review?(u7@x.org)"),
            (1, "review-(u7@x.org)"),
            (1, "chopped_raw_flag_value"),
        ],
        "entity int, value string",
    )
    rem = spark.createDataFrame(
        [
            (1, "REVIEW?(u7@x.org)"),       # tier 1: deformat(name), same status
            (1, "REVIEW+(u7@x.org)"),       # '+' parses but no '+' current:
                                            # must NOT key-match the '-' one;
                                            # falls to tier-3 prefix? no common
                                            # prefix (case) -> unmatched
            (1, "chopped_raw_flag_value"),  # tier 2: exact, unparseable
            (1, "review?(u7@"),             # tier 3: truncated prefix
            (1, "zz_nothing+(q@q)"),        # unmatched
        ],
        "entity int, value string",
    )
    got = {
        r.removal: (r.matched, r.tier)
        for r in flag_tiered_match(cur, rem).collect()
    }
    assert got["REVIEW?(u7@x.org)"] == ("review?(u7@x.org)", 1)
    assert got["REVIEW+(u7@x.org)"] == (None, None)
    assert got["chopped_raw_flag_value"] == ("chopped_raw_flag_value", 2)
    assert got["review?(u7@"] == ("review?(u7@x.org)", 3)
    assert got["zz_nothing+(q@q)"] == (None, None)


def test_scrub_truncated_null_field_passes_through(spark):
    """A NULL field is NOT a TRUNC field (the reference's membership
    test is False for None): its '?'-looking values must pass
    through verbatim, un-flagged — not be scrubbed on three-valued
    logic."""
    from bugzilla_etl_spark.operators.normalize import scrub_truncated

    df = spark.createDataFrame(
        [(None, "?", "? x"), ("cc", "?", "? x")],
        "field string, added string, removed string",
    )
    rows = {r.field: r for r in scrub_truncated(df).collect()}
    nul = rows[None]
    assert (nul.added, nul.removed) == ("?", "? x")
    assert nul.uncertain is False and nul.skip_update is False
    cc = rows["cc"]
    assert (cc.added, cc.removed) == (None, "x")
    assert cc.uncertain is True and cc.skip_update is False
