"""Reverse-diff rollback + multi-record fragment reassembly
(reference parse_bug_history.py:1104 ApplyDiff(reverse=True), :1193
LongField, the 255-char bugs_activity truncation)."""

from __future__ import annotations

import difflib

from pyspark.sql import functions as F

from bugzilla_etl_spark.operators.diffs import (
    apply_unified_diff,
    assemble_fragments,
    reverse_unified_diff,
    rollback_diff_chain,
)

V1 = "the quick brown fox\njumps over\nthe lazy dog"
V2 = "the quick brown fox\nleaps over\nthe lazy dog\nat night"
V3 = "a new first line\nthe quick brown fox\nleaps over\nthe lazy dog"


def _udiff(a: str, b: str) -> str:
    return "\n".join(
        difflib.unified_diff(a.split("\n"), b.split("\n"), lineterm="")
    )


def test_reverse_inverts_forward_on_random_chains():
    import random

    rng = random.Random(7)
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    text = "\n".join(rng.choice(words) for _ in range(12))
    for _ in range(25):
        lines = text.split("\n")
        op = rng.random()
        i = rng.randrange(len(lines))
        if op < 0.4:
            lines[i] = rng.choice(words)
        elif op < 0.7:
            lines.insert(i, rng.choice(words))
        elif len(lines) > 2:
            del lines[i]
        new = "\n".join(lines)
        d = _udiff(text, new)
        assert apply_unified_diff(text, d) == new
        assert reverse_unified_diff(new, d) == text
        text = new


def test_rollback_chain_reproduces_history(spark):
    # versions V1 -> V2 -> V3; stored diffs are old->new at each step;
    # rollback starts from the CURRENT text (V3) like the reference.
    d12, d23 = _udiff(V1, V2), _udiff(V2, V3)
    current = spark.createDataFrame(
        [(1, V3)], "user_id long, text string"
    )
    changes = spark.createDataFrame(
        [(1, 100, d12), (1, 200, d23)],
        "user_id long, tsl long, diff string",
    ).select(
        "user_id", F.timestamp_seconds("tsl").alias("ts"), "diff"
    )
    out = rollback_diff_chain(current, changes)
    rows = {
        (r["ts"].timestamp() if r["ts"] else None): r["value_text"]
        for r in out.collect()
    }
    assert rows[200.0] == V3  # value as of the latest change
    assert rows[100.0] == V2  # after the first change
    assert rows[None] == V1  # base before recorded history


def test_fragment_reassembly_roundtrip(spark):
    # a long diff split into 7-char activity records reassembles in
    # part order and still rolls back exactly.
    d12 = _udiff(V1, V2)
    frags = [
        (1, 100, i, d12[i * 7 : (i + 1) * 7])
        for i in range((len(d12) + 6) // 7)
    ]
    log = spark.createDataFrame(
        frags, "user_id long, tsl long, part int, frag string"
    )
    asm = assemble_fragments(log, ts="tsl")
    assert asm.collect()[0]["diff"] == d12

    current = spark.createDataFrame([(1, V2)], "user_id long, text string")
    changes = asm.select(
        "user_id", F.timestamp_seconds("tsl").alias("ts"), "diff"
    )
    rows = {
        (r["ts"].timestamp() if r["ts"] else None): r["value_text"]
        for r in rollback_diff_chain(current, changes).collect()
    }
    assert rows[100.0] == V2
    assert rows[None] == V1
