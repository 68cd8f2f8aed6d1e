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


def _map_entity_groups(df: DataFrame, entity: str, process, schema,
                       order_by=()):
    """Run ``process(frame)`` over per-entity groups with MANY groups
    per Python crossing: repartition on entity + sort within
    partitions (entity first, then ``order_by``), then mapInPandas
    with group-boundary buffering across Arrow batches.

    Same distribution contract as groupBy(entity).applyInPandas (every
    row of an entity reaches exactly one task, contiguous and in
    ``order_by`` order inside the frames ``process`` sees), but
    applyInPandas pays per-GROUP Arrow/pandas overhead — measured
    ~3.6 ms/group, i.e. 18 s for 5 000 tiny document histories — while
    this pays per-BATCH.  Pushing the intra-group order into the Spark
    sort (Tungsten, spillable) instead of per-group pandas
    ``sort_values`` removes the other per-group cost; together they
    cut the same job ~15x.  At 100 TB the difference is the whole
    job: histories are numerous and small, so per-group overhead
    dominates everything else.
    """

    def run(batches):
        buf = None
        for pdf in batches:
            if buf is not None and len(buf):
                pdf = pd.concat([buf, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # rows are entity-sorted: only the tail group may continue
            # into the next batch — hold it back
            mask = pdf[entity] == pdf[entity].iloc[-1]
            buf = pdf[mask]
            rest = pdf[~mask]
            if len(rest):
                yield process(rest)
        if buf is not None and len(buf):
            yield process(buf)

    return (
        df.repartition(entity)
        .sortWithinPartitions(entity, *order_by)
        .mapInPandas(run, schema=schema)
    )


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

    def rebuild(frame: pd.DataFrame) -> pd.DataFrame:
        # rows arrive sorted (entity, ts asc) — single linear pass.
        # cur is None until a base or diff is seen: an entity whose
        # stored text is null reconstructs to null (unknown), never
        # to the fabricated empty string
        vals = []
        prev = None
        cur = None
        for e, b, d in zip(frame[entity], frame[base_col], frame[diff_col]):
            if e != prev:
                prev, cur = e, None
            if isinstance(b, str) and b:
                cur = b
            elif isinstance(d, str) and d:
                cur = apply_unified_diff(cur or "", d)
            vals.append(cur)
        return pd.DataFrame(
            {entity: frame[entity], ts: frame[ts], "value_text": vals}
        )

    return _map_entity_groups(
        log, entity, rebuild, schema, order_by=(F.col(ts).asc(),)
    )


def reverse_unified_diff(target: str, diff: str) -> str:
    """Apply a unified diff BACKWARDS (new text -> old text).

    This is the reference's actual direction: parsing starts from the
    CURRENT value and rolls back through history, so each stored diff
    must be un-applied (parse_bug_history.py:1104 ApplyDiff with
    reverse=True; mo_logs.strings apply_diff(reverse=)).

    Role swap relative to the forward applier: the '+' side ranges
    address ``target``, '+' lines are consumed (they exist in the new
    text), '-' lines are emitted (they existed in the old text).
    """
    lines = target.split("\n") if target else [""]
    out: list[str] = []
    pos = 0
    in_hunks = False
    for raw in diff.split("\n"):
        m = HUNK_RE.match(raw)
        if m:
            in_hunks = True
            dst_len = int(m.group(4)) if m.group(4) is not None else 1
            start = int(m.group(3)) - (0 if dst_len == 0 else 1)
            out.extend(lines[pos:start])
            pos = start
            continue
        if not in_hunks and (raw.startswith("---") or raw.startswith("+++")):
            continue
        if not raw:
            continue
        tag, body = raw[0], raw[1:]
        if tag == " ":
            out.append(body)
            pos += 1
        elif tag == "+":
            pos += 1  # present in new text only: consume, don't emit
        elif tag == "-":
            out.append(body)  # restored old line
    out.extend(lines[pos:])
    return "\n".join(out)


def assemble_fragments(
    log: DataFrame,
    entity: str = "user_id",
    ts: str = "ts",
    frag_col: str = "frag",
    order_col: str = "part",
    out_col: str = "diff",
) -> DataFrame:
    """Reassemble values split across multiple activity records.

    Bugzilla's bugs_activity column is 255 chars; long diffs/fields
    span several rows sharing one timestamp and must be concatenated
    in record order (parse_bug_history.py:1106 'THE BUGZILLA DIFF IS
    ACROSS MULTIPLE RECORDS', :1193 LongField).  The reference leans
    on its backwards-walk stack to undo the reverse arrival order;
    declaratively the order is just an explicit sort key.  Pure
    aggregation — one shuffle on (entity, ts), no UDF.
    """
    pair = F.struct(F.col(order_col).alias("o"), F.col(frag_col).alias("f"))
    return log.groupBy(entity, ts).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(pair)), lambda x: x["f"]
            ),
            "",
        ).alias(out_col)
    )


def rollback_diff_chain(
    current: DataFrame,
    changes: DataFrame,
    entity: str = "user_id",
    ts: str = "ts",
    text_col: str = "text",
    diff_col: str = "diff",
) -> DataFrame:
    """Reconstruct every historical value from the CURRENT text by
    un-applying diffs newest -> oldest (the reference's rollback walk:
    populateIntermediateVersionObjects consumes activity in reverse
    chronological order).

    ``current``: one row per entity with the present text.
    ``changes``: (entity, ts, diff) — the stored old->new diff at ts
    (pre-assembled if fragmented; see assemble_fragments).
    Output: (entity, ts, value_text) — the value AS OF each change ts
    (i.e. the text the change produced), plus one ts=NULL row per
    entity carrying the base value before all recorded changes.

    Same distribution contract as apply_diff_chain: one shuffle on
    entity, Arrow batches, linear sequential patching per group (the
    chain is inherently order-dependent; per-entity history is the
    bounded unit of work exactly as in the reference's per-bug replay).
    """
    schema = StructType(
        [
            StructField(entity, LongType()),
            StructField(ts, TimestampType()),
            StructField("value_text", StringType()),
        ]
    )
    cur = current.select(
        F.col(entity),
        F.lit(None).cast("timestamp").alias(ts),
        F.lit(None).cast("string").alias(diff_col),
        F.col(text_col).alias("_current"),
    )
    ch = changes.select(
        F.col(entity), F.col(ts), F.col(diff_col),
        F.lit(None).cast("string").alias("_current"),
    )
    merged = cur.unionByName(ch)

    def rollback(frame: pd.DataFrame) -> pd.DataFrame:
        # rows arrive sorted (entity, ts desc NULLS FIRST): each group
        # leads with its base row (_current, ts NULL), then changes
        # newest -> oldest — exactly the replay order, single pass
        ents, tss, vals = [], [], []
        prev = None
        text = ""
        for e, t, d, c in zip(
            frame[entity], frame[ts], frame[diff_col], frame["_current"]
        ):
            if e != prev:
                if prev is not None:
                    ents.append(prev)
                    tss.append(pd.NaT)
                    vals.append(text)  # base value before history
                prev, text = e, ""
            if pd.isna(t):
                # the current-value row, identified STRUCTURALLY by
                # its null ts (sorted NULLS FIRST) — a null current
                # text must not demote it to a change row; unknown
                # current text rolls back as unknown
                text = c if isinstance(c, str) else None
            else:
                ents.append(e)
                tss.append(t)
                vals.append(text)  # value AS OF this change (its result)
                if text is not None:
                    text = reverse_unified_diff(
                        text, d if isinstance(d, str) else ""
                    )
        if prev is not None:
            ents.append(prev)
            tss.append(pd.NaT)
            vals.append(text)
        return pd.DataFrame({entity: ents, ts: tss, "value_text": vals})

    return _map_entity_groups(
        merged, entity, rollback, schema,
        order_by=(F.col(ts).desc_nulls_first(),),
    )
