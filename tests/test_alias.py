"""Alias closure and resolution semantics."""

from __future__ import annotations

from bugzilla_etl_spark.operators.alias import (
    canonical_closure,
    resolve_aliases,
)


def test_canonical_closure_chains(spark):
    mapping = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
        "alias string, canonical string",
    )
    out = dict(
        (r.alias, r.canonical) for r in canonical_closure(mapping).collect()
    )
    assert out == {"a": "d", "b": "d", "c": "d", "x": "y"}


def test_canonical_closure_cycle_resolves_to_least(spark):
    """A 2-cycle (a<->b) must RESOLVE, not survive as two mutual
    rows: both names collapse to the lexicographically smaller
    canonical, and the resulting self-map is dropped."""
    mapping = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "alias string, canonical string"
    )
    out = dict(
        (r.alias, r.canonical) for r in canonical_closure(mapping).collect()
    )
    assert out == {"b": "a"}


def test_canonical_closure_cycle_plus_chain(spark):
    """A chain feeding into a 2-cycle lands on the cycle's least
    member."""
    mapping = spark.createDataFrame(
        [("c", "a"), ("a", "b"), ("b", "a")],
        "alias string, canonical string",
    )
    out = dict(
        (r.alias, r.canonical) for r in canonical_closure(mapping).collect()
    )
    assert out == {"b": "a", "c": "a"}


def test_resolve_aliases_identity_for_unmapped(spark):
    df = spark.createDataFrame(
        [(1, "a@x"), (2, "q@x")], "id long, email string"
    )
    mapping = spark.createDataFrame(
        [("a@x", "canon@x")], "alias string, canonical string"
    )
    out = dict(
        (r.id, r.email)
        for r in resolve_aliases(df, mapping, ["email"]).collect()
    )
    assert out == {1: "canon@x", 2: "q@x"}


def test_minimize_aliases_multi_round_chain(spark):
    """The fixpoint loop must need MORE than one round here: c@ is
    only discoverable after b@ folds into a@ (round 1 merges b->a,
    which concentrates a@'s positive counts; round 2 then resolves
    c->a via the chain closure)."""
    from bugzilla_etl_spark.operators.alias import minimize_aliases

    rows = []
    # b@ added-without-remove on bugs 1..6, removals recorded as a@
    for bug in range(1, 7):
        rows += [(bug, "b@", -1), (bug, "a@", 1)]
    # c@ added-without-remove on bugs 11..16; removals split between
    # b@ and a@ so NEITHER alone beats the other by min_diff until
    # b@ has folded into a@ (3+3 vs margin 4).
    for bug in range(11, 17):
        rows += [(bug, "c@", -1), (bug, "b@" if bug % 2 else "a@", 1)]
    counts = spark.createDataFrame(
        rows, "bug_id long, email string, cnt long"
    )
    m = {
        r["alias"]: r["canonical"]
        for r in minimize_aliases(counts, min_diff=4).collect()
    }
    assert m == {"b@": "a@", "c@": "a@"}


def test_minimize_aliases_skips_indistinct(spark):
    """A problem whose best and runner-up tie within min_diff stays
    unmatched (the reference's 'not distinctive enough' guard)."""
    from bugzilla_etl_spark.operators.alias import minimize_aliases

    rows = []
    for bug in range(1, 7):
        rows += [(bug, "x@", -1), (bug, "p@" if bug % 2 else "q@", 1)]
    counts = spark.createDataFrame(
        rows, "bug_id long, email string, cnt long"
    )
    assert minimize_aliases(counts, min_diff=4).isEmpty()


def test_alias_store_round_trip_and_compaction(spark, tmp_path):
    """save -> load returns the same mapping minus identity rows;
    not_aliases ride alongside under the ignore flag.
    reference: alias_analysis.py:306 save_aliases / :322 compact."""
    from bugzilla_etl_spark.sinks import alias_store as S

    mapping = spark.createDataFrame(
        [("a@x", "b@x"), ("c@x", "c@x"), ("d@x", "b@x")],
        "alias string, canonical string",
    )
    nots = spark.createDataFrame(
        [("e@x", "b@x")], "alias string, canonical string"
    )
    path = str(tmp_path / "store")
    S.save_aliases(mapping, path, not_aliases=nots)
    aliases, not_aliases = S.load_aliases(spark, path)
    assert sorted(map(tuple, aliases.collect())) == [
        ("a@x", "b@x"),
        ("d@x", "b@x"),
    ]  # identity row compacted away
    assert [tuple(r) for r in not_aliases.collect()] == [("e@x", "b@x")]


def test_alias_store_missing_path_is_empty(spark, tmp_path):
    from bugzilla_etl_spark.sinks import alias_store as S

    aliases, nots = S.load_aliases(spark, str(tmp_path / "nope"))
    assert aliases.count() == 0 and nots.count() == 0
    assert aliases.columns == ["alias", "canonical"]


def test_alias_store_corrupt_store_raises(spark, tmp_path):
    """A corrupt/unreadable store must NOT be treated as a first run:
    returning empty frames would let the next save_aliases overwrite
    silently discard the accumulated alias history.  Only
    PATH_NOT_FOUND maps to the empty-store case."""
    import pytest

    from bugzilla_etl_spark.sinks import alias_store as S

    bad = tmp_path / "corrupt"
    bad.mkdir()
    (bad / "part-00000.parquet").write_bytes(b"definitely not parquet")
    with pytest.raises(Exception):
        a, n = S.load_aliases(spark, str(bad))
        a.count()  # force the read if schema inference was lazy


def test_merge_aliases_fresh_wins_and_chains_collapse(spark):
    """Per-alias precedence (fresh overwrites stored) plus the
    ALIAS REMAPPED collapse: stored k->old + fresh old->new folds to
    k->new.  reference: alias_analysis.py:225 reassign loop."""
    from bugzilla_etl_spark.sinks import alias_store as S

    stored = spark.createDataFrame(
        [("k@x", "old@x"), ("p@x", "q@x")],
        "alias string, canonical string",
    )
    fresh = spark.createDataFrame(
        [("old@x", "new@x"), ("p@x", "r@x")],
        "alias string, canonical string",
    )
    got = sorted(map(tuple, S.merge_aliases(stored, fresh).collect()))
    assert got == [
        ("k@x", "new@x"),    # chain followed through the re-alias
        ("old@x", "new@x"),
        ("p@x", "r@x"),      # fresh row won over stored p->q
    ]


def test_cc_fuzzy_rescue_kinds_and_argmin(spark):
    """The uncertain-CC rescue (parse_bug_history.py:848/:877):
    exact member removals pass through; a mangled removal rescues to
    the CLOSEST remaining member under 0.3 (argmin, not just any
    sub-threshold candidate); far-off removals stay unmatched; the
    local-part variant can beat the full-string distance."""
    from bugzilla_etl_spark.operators.alias import cc_fuzzy_rescue

    totals = spark.createDataFrame(
        [
            (1, "user0042@ex.org"),
            (1, "user0043@ex.org"),
            (1, "other@ex.org"),
            (2, "abcdefgh@long-domain-here.example"),
        ],
        "entity int, email string",
    )
    removes = spark.createDataFrame(
        [
            (1, "other@ex.org"),        # exact
            (1, "user0042xx@ex.org"),   # fuzzy: 2 edits to 0042, 3 to 0043
            (1, "zz999@nowhere.net"),   # unmatched (> 0.3 everywhere)
            # local part identical (distance 0) while the full string
            # is far: the local-part variant must carry the match
            (2, "abcdefgh@elsewhere.invalid"),
        ],
        "entity int, email string",
    )
    rows = {
        (r.entity, r.removal): (r.matched, r.kind)
        for r in cc_fuzzy_rescue(totals, removes).collect()
    }
    assert rows[(1, "other@ex.org")] == ("other@ex.org", "exact")
    assert rows[(1, "user0042xx@ex.org")] == ("user0042@ex.org", "fuzzy")
    assert rows[(1, "zz999@nowhere.net")] == (None, "unmatched")
    assert rows[(2, "abcdefgh@elsewhere.invalid")] == (
        "abcdefgh@long-domain-here.example",
        "fuzzy",
    )
    assert len(rows) == 4
