"""Sub-entity versioning — per-(entity, sub_id) state rollforward,
re-nested into each PARENT version.  This is the reference's
attachment handling: attachments live inside a bug's versions, but
their fields change on their own (bug_id, attach_id) timeline.

reference: bugzilla_etl/parse_bug_history.py:255
    processAttachmentsTableItem — currBugAttachmentsMap[attach_id]
    accumulates field mutations; created_ts = MIN(modified_ts, ...)
           bugzilla_etl/extract_bugzilla.py:591 flatten_attachments —
    attachment rows arrive flattened (bug_id, attach_id, field, value)
    and are re-nested per bug version.

Spark-first: the per-sub-entity mutable dict becomes SCD2 intervals
per (entity, sub_id, field) via lead(ts); the re-nest is a join of
parent-version timestamps into those intervals plus a two-level
aggregation (fields -> one sub-entity doc, sub-entities -> one
version doc).  Window order matters for shuffle reuse: the
(entity, sub_id) running-min window runs FIRST, then the
(entity, sub_id, field) window — hashpartitioning(entity, sub_id)
satisfies the finer clustering (subset rule), so the second window
adds only a sort, not an exchange.

Scale shape (100 TB): one shuffle on (entity, sub_id), one hash join
on entity with per-entity fan-out = versions x live sub-entity fields
(the same in-memory bound the reference carries per bug), two
aggregation shuffles for the nesting.  Nothing crosses entities.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def subentity_state_intervals(
    changes: DataFrame,
    entity: str = "user_id",
    sub: str = "attach_id",
    field: str = "field",
    value: str = "value",
    ts: str = "ts",
    tiebreak: Sequence[str] = ("event_id",),
) -> DataFrame:
    """SCD2 intervals per (entity, sub, field) + the sub-entity's
    created_ts (running MIN of change ts — processAttachmentsTableItem
    :286 ``att["created_ts"] = MIN(...)``).

    ``changes``: entity, sub, field, value, ts (long), *tiebreak.
    Output: entity, sub, field, value, created_ts, valid_from,
    valid_to (NULL = open interval).
    """
    # (entity, sub) window FIRST: its exchange also serves the finer
    # (entity, sub, field) window below (hash(e,s) ⊆ cluster(e,s,f)).
    w_sub = (
        Window.partitionBy(entity, sub)
        .orderBy(ts, *tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_field = Window.partitionBy(entity, sub, field).orderBy(ts, *tiebreak)

    return changes.select(
        F.col(entity),
        F.col(sub),
        F.col(field),
        F.col(value),
        F.min(ts).over(w_sub).alias("created_ts"),
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w_field).alias("valid_to"),
    )


def nest_per_version(
    intervals: DataFrame,
    versions: DataFrame,
    entity: str = "user_id",
    sub: str = "attach_id",
    field: str = "field",
    value: str = "value",
    version_ts: str = "version_ts",
) -> DataFrame:
    """Re-nest sub-entity states into parent versions.

    LEFT join keeps versions with zero live sub-entities (a bug
    version with an empty attachments list).  Output per version:
    n_subs, subs — each sub-entity serialized
    ``a<sub>:c<created_ts>:f1=v1,f2=v2`` (fields sorted), sub-entities
    sorted, '|'-joined — strings so the driver canonicalizer hashes
    them.
    """
    # Render each interval's "field=value" string ONCE, pre-join —
    # the version join repeats every live interval per version, so
    # per-row expression work multiplies by the fan-out if left here
    rendered = intervals.select(
        F.col(entity),
        F.col(sub),
        "created_ts",
        "valid_from",
        "valid_to",
        F.concat(
            F.col(field), F.lit("="), F.col(value).cast("string")
        ).alias("fv"),
    )
    i, v = rendered.alias("i"), versions.alias("v")
    joined = v.join(
        i,
        (F.col(f"i.{entity}") == F.col(f"v.{entity}"))
        & (F.col("i.valid_from") <= F.col(f"v.{version_ts}"))
        & (
            F.col("i.valid_to").isNull()
            | (F.col(f"v.{version_ts}") < F.col("i.valid_to"))
        ),
        "left",
    )

    # Level 1: fields -> one row per (version, sub-entity)
    per_sub = joined.groupBy(
        F.col(f"v.{entity}").alias(entity),
        F.col(f"v.{version_ts}").alias(version_ts),
        F.col(f"i.{sub}").alias("_sub"),
    ).agg(
        F.min("i.created_ts").alias("_created"),
        F.concat_ws(
            ",", F.sort_array(F.collect_list("i.fv"))
        ).alias("_fields"),
    )

    sub_str = F.concat(
        F.lit("a"),
        F.col("_sub").cast("string"),
        F.lit(":c"),
        F.col("_created").cast("string"),
        F.lit(":"),
        F.col("_fields"),
    )
    # Level 2: sub-entities -> one row per version
    return per_sub.groupBy(entity, version_ts).agg(
        F.count("_sub").alias("n_subs"),
        F.concat_ws(
            "|",
            F.sort_array(
                F.collect_list(F.when(F.col("_sub").isNotNull(), sub_str))
            ),
        ).alias("subs"),
    )


def subentity_changepoints(
    changes: DataFrame,
    entity: str = "user_id",
    sub: str = "attach_id",
    field: str = "field",
    value: str = "value",
    ts: str = "ts",
    tiebreak: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Fully-rendered sub-entity state at each of its OWN change
    points — the scale-path alternative to the per-field interval
    join above.

    ``nest_per_version(subentity_state_intervals(...))`` fans the
    version join out to |versions| x |live fields| rows and string-
    aggregates all of them per version.  But a sub-entity's rendered
    state only changes when the sub-entity itself changes, so render
    it ONCE per change point here (last value per field, rendered
    strings sorted), and let the version join pick at most ONE row
    per (version, sub) — fan-out |versions| x |subs|, an order of
    magnitude less string traffic for wide field sets, identical
    output.

    Per-row work is a two-level HOF over the cumulative change
    history of one sub-entity (O(n^2) with n = that sub-entity's
    change count — tens for real attachments, the same per-entity
    bound the reference holds in memory), all inside whole-stage
    codegen; one exchange on (entity, sub) total.

    Output: entity, sub, created_ts, valid_from, valid_to (NULL =
    open), fields_str ("f1=v1,f2=v2", rendered-string sorted).
    """
    w_sub = Window.partitionBy(entity, sub).orderBy(ts, *tiebreak)
    w_cum = w_sub.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    # Cumulative (field, rendered-ts, value) history at each change
    # point; frame order == (ts, tiebreak) order, so "last per field"
    # is position-based.  Materialized as a real column FIRST: HOF
    # lambdas get no CSE, so every reference below must be to the
    # attribute, never to the collect_list expression itself.
    hist = changes.withColumn(
        "_hist",
        F.collect_list(
            F.struct(F.col(field).alias("f"), F.col(value).alias("v"))
        ).over(w_cum),
    ).withColumn("_n", F.size("_hist"))

    h = F.col("_hist")
    # Keep entry i iff no later entry mutates the same field, then
    # render + sort the surviving "field=value" strings (string sort
    # matches the oracle's list_sort of rendered strings; struct sort
    # would diverge when one field name prefixes another).
    last_per_field = F.filter(
        h,
        lambda x, i: ~F.exists(
            F.slice(h, i + F.lit(2), F.col("_n")),
            # eqNullSafe, NOT ==: with a plain equals, a later
            # null-field entry makes exists() return NULL (3VL), and
            # filter() drops NULL rows — a later UNKNOWN-field change
            # would silently erase every known field's last value
            lambda y: y["f"].eqNullSafe(x["f"]),
        ),
    )
    fields_str = F.array_join(
        F.array_sort(
            F.transform(
                last_per_field,
                lambda x: F.concat(x["f"], F.lit("="), x["v"].cast("string")),
            )
        ),
        ",",
    )

    return hist.select(
        F.col(entity),
        F.col(sub),
        F.min(ts).over(w_cum).alias("created_ts"),
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w_sub).alias("valid_to"),
        fields_str.alias("fields_str"),
    )


def nest_changepoints_per_version(
    changepoints: DataFrame,
    versions: DataFrame,
    entity: str = "user_id",
    sub: str = "attach_id",
    version_ts: str = "version_ts",
) -> DataFrame:
    """Re-nest pre-rendered change-point states into parent versions:
    each version matches AT MOST ONE change point per sub-entity
    (its as-of state), so a single aggregation level assembles the
    version document.  Same output contract as ``nest_per_version``.

    Same-timestamp duplicate change points self-resolve: the earlier
    one's [valid_from, valid_to) interval is empty, so only the last
    (tiebreak-ordered) state is joinable.
    """
    c, v = changepoints.alias("c"), versions.alias("v")
    joined = v.join(
        c,
        (F.col(f"c.{entity}") == F.col(f"v.{entity}"))
        & (F.col("c.valid_from") <= F.col(f"v.{version_ts}"))
        & (
            F.col("c.valid_to").isNull()
            | (F.col(f"v.{version_ts}") < F.col("c.valid_to"))
        ),
        "left",
    )
    sub_str = F.concat(
        F.lit("a"),
        F.col(f"c.{sub}").cast("string"),
        F.lit(":c"),
        F.col("c.created_ts").cast("string"),
        F.lit(":"),
        F.col("c.fields_str"),
    )
    return joined.groupBy(
        F.col(f"v.{entity}").alias(entity),
        F.col(f"v.{version_ts}").alias(version_ts),
    ).agg(
        F.count(f"c.{sub}").alias("n_subs"),
        F.concat_ws(
            "|",
            F.sort_array(
                F.collect_list(
                    F.when(F.col(f"c.{sub}").isNotNull(), sub_str)
                )
            ),
        ).alias("subs"),
    )
