"""Temporal snapshot operators — the heart of Bugzilla-ETL.

The reference rebuilds every historical version of a bug from its
current state plus a reverse-chronological activity log
(reference: bugzilla_etl/parse_bug_history.py:10-36 workflow comment,
:457 populateIntermediateVersionObjects).  Each version carries
``modified_ts`` (valid_from) and ``expires_on`` (the next version's
timestamp; the current version never expires).

Spark-first, that whole imperative replay collapses into window
functions over ``(entity ORDER BY ts)``:

* intervals        -> lead(ts)
* current state    -> row_number() desc = 1  (or max_by)
* field roll-up    -> last(ignorenulls=True) with unbounded-preceding
* set accumulation -> collect_set over a running frame

Scale notes: every function here produces exactly ONE shuffle — the
hash partition on the entity key — and all subsequent windows reuse
that partitioning (Catalyst plans a single Exchange feeding stacked
WindowExecs).  No driver-side iteration, no Python UDFs; everything is
whole-stage-codegen'd JVM expressions.  ``expires_on`` for the live
version is NULL (not a sentinel timestamp) so the value is portable
across engines and timezones.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bugzilla_etl_spark.functions.hashing import hash64

# reference: bugzilla_etl/extract_bugzilla.py:30 MAX_TIMESTAMP — we keep
# NULL instead of a sentinel; expose epoch-millis constant for callers
# that need the reference's exact convention.
MAX_TIMESTAMP_MILLIS = 9999999999000


def _ordered_window(entity: str | Sequence[str], ts: str, tiebreak: Sequence[str]):
    keys = [entity] if isinstance(entity, str) else list(entity)
    return Window.partitionBy(*keys).orderBy(ts, *tiebreak)


def snapshot_versions(
    log: DataFrame,
    entity: str = "user_id",
    ts: str = "ts",
    tiebreak: Sequence[str] = ("event_id",),
) -> DataFrame:
    """SCD2 interval construction from a change log.

    Each log row becomes a version: valid_from = its timestamp,
    expires_on = the next version's timestamp (NULL while live), plus
    a 1-based version number.  Mirrors
    parse_bug_history.py:457-520 (populateIntermediateVersionObjects)
    where bug_version.expires_on = next modified_ts.
    """
    w = _ordered_window(entity, ts, tiebreak)
    return log.select(
        "*",
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w).alias("expires_on"),
        F.row_number().over(w).alias("version"),
    )


def snapshot_asof(
    log: DataFrame,
    asof_epoch_s: int,
    entity: str = "user_id",
    ts: str = "ts",
    tiebreak: Sequence[str] = ("event_id",),
) -> DataFrame:
    """State of every entity as of a point in time: the last log row at
    or before the cutoff.  This is how the reference resumes an
    incremental run from ``last_run_time`` (bz_etl.py:172).

    The cutoff is epoch SECONDS compared against ``ts`` cast to long —
    an instant comparison that is timezone-portable and pushed down to
    the parquet scan.
    """
    w = Window.partitionBy(entity).orderBy(
        F.col(ts).desc(), *[F.col(c).desc() for c in tiebreak]
    )
    return (
        log.where(F.col(ts).cast("long") <= F.lit(asof_epoch_s))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def state_rollforward(
    log: DataFrame,
    fields: Sequence[str],
    entity: str = "user_id",
    ts: str = "ts",
    tiebreak: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Forward-fill: at each log row, the most recent non-null value of
    each tracked field.  This is the declarative form of the
    reference's running current-state object that each activity row
    mutates (parse_bug_history.py:111 processRow merging rows into
    ``currBugState``).
    """
    w = (
        _ordered_window(entity, ts, tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cols = [F.last(f, ignorenulls=True).over(w).alias(f"last_{f}") for f in fields]
    return log.select("*", *cols)


def set_accumulate(
    log: DataFrame,
    value_col: str,
    entity: str = "user_id",
    ts: str = "ts",
    tiebreak: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Running set of values seen per entity — the multi-value-field
    reconstruction (cc lists, keywords) of
    parse_bug_history.py:816 addValues / :848 removeValues, expressed
    as a cumulative window ``collect_set`` (sorted for determinism).
    """
    w = (
        _ordered_window(entity, ts, tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return log.select(
        "*", F.sort_array(F.collect_set(value_col).over(w)).alias("acc_set")
    )


def set_final(
    log: DataFrame,
    value_col: str,
    entity: str = "user_id",
) -> DataFrame:
    """Final sorted multi-value per entity (normalize() keeps
    MULTI_FIELDS sorted — transform_bugzilla.py:99-102).  Partial
    aggregation (ObjectHashAggregate) combines map-side, so the
    shuffle carries per-entity partial sets, not raw rows.
    n_distinct derives from the collected set — a countDistinct
    would add an Expand + second exchange for a number we already
    hold."""
    return log.groupBy(entity).agg(
        F.sort_array(F.collect_set(value_col)).alias("final_set"),
    ).withColumn("n_distinct", F.size("final_set").cast("long"))


def set_final_salted(
    log: DataFrame,
    value_col: str,
    entity: str = "user_id",
    n_salts: int = 8,
) -> DataFrame:
    """``set_final`` with two-phase salted aggregation — the hot-key
    mitigation when one entity owns a pathological share of rows (one
    bug with millions of changes): phase 1 aggregates by
    (entity, salt) spreading the hot key over n_salts reducers, phase
    2 merges the n_salts partial sets per entity.  Identical result,
    same oracle; the salt is a deterministic hash of the tiebreak
    column so re-runs place rows identically."""
    salt = (hash64(F.col(value_col)) % n_salts).alias("_salt")
    partial = (
        log.select(entity, value_col, salt)
        .groupBy(entity, "_salt")
        .agg(F.collect_set(value_col).alias("_part"))
    )
    return (
        partial.groupBy(entity)
        .agg(
            F.sort_array(
                F.array_distinct(F.flatten(F.collect_list("_part")))
            ).alias("final_set"),
        )
        .withColumn("n_distinct", F.size("final_set").cast("long"))
    )


def dedup_latest(
    log: DataFrame,
    entity: str = "user_id",
    ts: str = "ts",
    tiebreak: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Exactly one current row per entity — what ES doc overwrite by
    ``_id`` achieves in the reference's sink.  row_number (not
    dropDuplicates) so the survivor is deterministic."""
    w = Window.partitionBy(entity).orderBy(
        F.col(ts).desc(), *[F.col(c).desc() for c in tiebreak]
    )
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_order_union(
    current: DataFrame,
    activity: DataFrame,
    entity: str,
    ts: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """The reference merges current-state rows (_merge_order=1) with
    activity rows (_merge_order=2+) and processes them per bug in
    (_merge_order asc, modified_ts desc) order (bz_etl.py:105-111).
    Declaratively: unionByName with a source tag + one rank window.
    """
    cur = current.withColumn("_merge_order", F.lit(1))
    act = activity.withColumn("_merge_order", F.lit(2))
    merged = cur.unionByName(act, allowMissingColumns=True)
    w = Window.partitionBy(entity).orderBy(
        F.col("_merge_order").asc(),
        F.col(ts).desc(),
        *[F.col(c).desc() for c in tiebreak],
    )
    return merged.withColumn("replay_seq", F.row_number().over(w))


def activity_invert(
    log: DataFrame,
    value_col: str = "value",
    entity: str = "user_id",
    ts: str = "ts",
    tiebreak: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Reverse-replay chain: for each change, the value it replaced and
    the value that replaced it.  The reference walks activities
    backwards applying the ``removed`` column to roll state back
    (parse_bug_history.py:307 processBugsActivitiesTableItem); with
    the full log, prev/next are just lag/lead on one window."""
    w = _ordered_window(entity, ts, tiebreak)
    return log.select(
        "*",
        F.lag(value_col).over(w).alias("removed"),
        F.lead(value_col).over(w).alias("superseded_by"),
    )


def incremental_touched(
    log: DataFrame,
    since_epoch_s: int,
    entity: str = "user_id",
    ts: str = "ts",
    broadcast_touched: bool = True,
) -> DataFrame:
    """Incremental ETL semantics (bz_etl.py:172 incremental_etl): any
    entity with at least one change after the watermark is re-built
    IN FULL — so: semi-join the log against the touched-entity set.

    Scale: the touched set is usually tiny relative to history, so we
    hint the broadcast; set ``broadcast_touched=False`` after a long
    outage (huge touched set) and let AQE pick the strategy from the
    runtime size instead.
    """
    touched = (
        log.where(F.col(ts).cast("long") >= F.lit(since_epoch_s))
        .select(entity)
        .distinct()
    )
    if broadcast_touched:
        touched = F.broadcast(touched)
    return log.join(touched, on=entity, how="left_semi")


def replicate_pending(source: DataFrame, dest: DataFrame, ts: str = "ts") -> DataFrame:
    """ES->ES replication picks rows modified since the destination's
    max timestamp (replicate.py:68 get_last_updated, :97 get_pending).
    Expressed as a cross-join against a 1-row aggregate (broadcast
    nested loop over a single row — no shuffle of the big side)."""
    last = dest.agg(F.max(F.col(ts).cast("long")).alias("_last_ts"))
    return (
        source.crossJoin(F.broadcast(last))
        .where(
            F.col("_last_ts").isNull() | (F.col(ts).cast("long") > F.col("_last_ts"))
        )
        .drop("_last_ts")
    )
