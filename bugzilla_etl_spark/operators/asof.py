"""As-of (temporal) join.

Joins each left row to the most recent right row at-or-before its
timestamp, per key.  This is how a bug-version interval picks up the
dimension state that was valid at its ``modified_ts`` (the reference
does this implicitly by replaying both streams in timestamp order —
parse_bug_history.py's merge of _merge_order'd rows).

Spark-first strategy: the UNION-WINDOW form, not an inequality join.
A range join ``l.ts >= r.ts`` explodes to O(|L| x |R|) per key before
filtering; the union form tags both sides, sorts once per key, and
forward-fills the right payload — one shuffle on the key, linear
work, identical semantics:

    union(left(tag=1), right(tag=0))
    -> window (key ORDER BY ts, tag)
    -> last(struct(right_payload) tagged right, ignorenulls)
    -> keep tag=1 rows

The carry is a STRUCT of the right row's payload, not the raw
columns: the struct is non-null for every right row, so a right row
whose payload VALUE is null still wins the as-of race (raw-column
ignorenulls would silently fall back to an older right row — wrong
on any corpus with null attributes).

Ties: a right row AT the same timestamp sorts before the left row
(tag 0 < 1), so "at-or-before" includes simultaneous rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
) -> DataFrame:
    """Columns of ``left`` + ``asof_<p>`` for each right payload col."""
    lcols = left.columns
    l = left.withColumn("_tag", F.lit(1)).withColumn("_ats", F.col(left_ts))
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_tag"),
        *[F.col(p) for p in payload],
    )
    merged = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy("_ats", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rec = F.when(
        F.col("_tag") == 0, F.struct(*[F.col(p) for p in payload])
    )
    filled = merged.select(
        "*",
        F.last(rec, ignorenulls=True).over(w).alias("_asof_rec"),
    )
    return filled.where(F.col("_tag") == 1).select(
        *lcols,
        *[
            F.col(f"_asof_rec.{p}").alias(f"asof_{p}")
            for p in payload
        ],
    )
