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
