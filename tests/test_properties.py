"""Property-based tests (hypothesis) for the imperative corners —
diff application and as-of join semantics — checked against
independent naive implementations."""

from __future__ import annotations

import difflib

from hypothesis import given, settings, strategies as st

from bugzilla_etl_spark.operators.diffs import apply_unified_diff

LINES = st.lists(
    st.text(alphabet="abcXYZ 123", min_size=0, max_size=8), min_size=1, max_size=12
)


@given(base_lines=LINES, target_lines=LINES)
@settings(max_examples=200, deadline=None)
def test_apply_unified_diff_roundtrip(base_lines, target_lines):
    """Applying difflib's unified diff of (base -> target) onto base
    must reproduce target exactly (n=0 context, like the reference's
    stored diffs)."""
    base = "\n".join(base_lines)
    target = "\n".join(target_lines)
    diff = "\n".join(
        difflib.unified_diff(
            base.split("\n"), target.split("\n"), lineterm="", n=0
        )
    )
    if not diff:
        assert base == target
        return
    assert apply_unified_diff(base, diff) == target


@st.composite
def asof_case(draw):
    keys = draw(st.lists(st.integers(0, 3), min_size=1, max_size=8))
    left = [
        (k, draw(st.integers(0, 100))) for k in keys
    ]
    right = [
        (draw(st.integers(0, 3)), draw(st.integers(0, 100)), draw(st.integers(0, 999)))
        for _ in range(draw(st.integers(0, 8)))
    ]
    return left, right


_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from bugzilla_etl_spark.session import get_spark

        _spark = get_spark("props", cpus=4, shuffle_partitions=4)
    return _spark


@given(case=asof_case())
@settings(max_examples=12, deadline=None)
def test_asof_join_matches_naive(case):
    """Union-window as-of join == naive per-row max-scan (the O(L x R)
    definition)."""
    from bugzilla_etl_spark.operators.asof import asof_join

    left_rows, right_rows = case
    spark = _get_spark()
    left = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left_rows)],
        "lid long, key long, ts long",
    )
    right = spark.createDataFrame(
        right_rows or [(None, None, None)], "key long, ts long, payload long"
    ).where("key is not null")

    got = {
        r.lid: r.asof_payload
        for r in asof_join(
            left, right, key="key", left_ts="ts", right_ts="ts",
            payload=["payload"],
        ).collect()
    }

    def naive(k, ts):
        cands = [
            (rts, p) for (rk, rts, p) in right_rows if rk == k and rts <= ts
        ]
        return max(cands)[1] if cands else None

    want = {i: naive(k, ts) for i, (k, ts) in enumerate(left_rows)}
    # ties among equal right timestamps are resolved arbitrarily in
    # both implementations; compare the *set of admissible answers*
    for i, (k, ts) in enumerate(left_rows):
        admissible = {
            p
            for (rk, rts, p) in right_rows
            if rk == k
            and rts <= ts
            and rts == max(r2 for (k2, r2, _) in right_rows if k2 == k and r2 <= ts)
        } or {None}
        assert got.get(i) in admissible, (i, got.get(i), admissible, want)
