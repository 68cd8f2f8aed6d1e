"""Unified-diff application for DIFF_FIELDS.

The reference stores some long text fields (cf_user_story) as
unified diffs between versions and reconstructs values by applying
diffs in sequence (reference: transform_bugzilla.py:25 DIFF_FIELDS,
parse_bug_history.py:1104 ApplyDiff class, mo_logs.strings
apply_diff).

Text patching is inherently imperative, so this is one of the few
places we leave codegen: an Arrow-batched pandas UDF applies the
hunks.  The GROUPING stays distributed — diffs are applied per
(entity) group after the same single entity-shuffle as every other
temporal operator; only the string patching itself is Python.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

HUNK_RE = re.compile(r"^@@ -(\d+)(?:,(\d+))? \+(\d+)(?:,(\d+))? @@")


def apply_unified_diff(base: str, diff: str) -> str:
    """Apply a unified diff (hunk headers + +/-/space lines) to base.
    Tolerant of missing trailing newlines, like the reference's
    apply_diff."""
    lines = base.split("\n") if base else [""]
    out: list[str] = []
    pos = 0  # 0-based index into `lines`
    in_hunks = False
    for raw in diff.split("\n"):
        m = HUNK_RE.match(raw)
        if m:
            in_hunks = True
            # zero-length source range ("-N,0"): N is the line AFTER
            # which to insert, so no -1 adjustment
            src_len = int(m.group(2)) if m.group(2) is not None else 1
            start = int(m.group(1)) - (0 if src_len == 0 else 1)
            out.extend(lines[pos:start])
            pos = start
            continue
        if not in_hunks and (raw.startswith("---") or raw.startswith("+++")):
            continue  # file header lines, not content
        if not raw:
            continue
        tag, body = raw[0], raw[1:]
        if tag == " ":
            out.append(body)
            pos += 1
        elif tag == "-":
            pos += 1
        elif tag == "+":
            out.append(body)
    out.extend(lines[pos:])
    return "\n".join(out)


def apply_diff_chain(
    log: DataFrame,
    entity: str = "user_id",
    ts: str = "ts",
    base_col: str = "base",
    diff_col: str = "diff",
) -> DataFrame:
    """Reconstruct the value timeline of a diff-stored field: each
    entity's first row carries the base text, later rows carry diffs;
    output adds ``value_text`` per row.  applyInPandas over the entity
    key — one shuffle, Arrow batches, linear per-group work."""
    schema = StructType(
        [
            StructField(entity, LongType()),
            StructField(ts, TimestampType()),
            StructField("value_text", StringType()),
        ]
    )

    def rebuild(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts)
        cur = ""
        vals = []
        for _, row in pdf.iterrows():
            if isinstance(row[base_col], str) and row[base_col]:
                cur = row[base_col]
            elif isinstance(row[diff_col], str) and row[diff_col]:
                cur = apply_unified_diff(cur, row[diff_col])
            vals.append(cur)
        return pd.DataFrame(
            {entity: pdf[entity], ts: pdf[ts], "value_text": vals}
        )

    return log.groupBy(entity).applyInPandas(rebuild, schema=schema)
