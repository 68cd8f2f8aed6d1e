"""Temporal-snapshot queries (SURVEY §2 #1-#7, #13, #17, #18).

The ``events`` table plays the role of Bugzilla's ``bugs_activity``
change log: entity=user_id, modified_ts=ts, field/value payloads.
Every query here compiles to: scan -> ONE hash exchange on user_id ->
stacked window/agg operators, all whole-stage-codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bugzilla_etl_spark.operators import normalize as N
from bugzilla_etl_spark.operators import snapshot as S
from bugzilla_etl_spark.plans.catalog import register
from bugzilla_etl_spark.sources import load_table

# Data-derived watermark: midpoint of the event time range, in whole
# epoch seconds with pure integer arithmetic so Spark and the DuckDB
# oracle agree bit-for-bit regardless of scale factor.
DUCK_MID_CUT = """(SELECT (min(floor(epoch(ts))::BIGINT)
                         + max(floor(epoch(ts))::BIGINT)) // 2 AS c FROM events)"""


def _with_mid_cut(ev: DataFrame) -> DataFrame:
    """Attach the midpoint watermark as column ``_cut`` (broadcast 1-row agg)."""
    cut = ev.agg(
        F.expr("(min(cast(ts as long)) + max(cast(ts as long))) div 2").alias("_cut")
    )
    return ev.crossJoin(F.broadcast(cut))


@register(
    "snapshot_versions",
    oracle="""
    SELECT user_id, event_id, event_type, value,
           ts AS valid_from,
           lead(ts) OVER w AS expires_on,
           row_number() OVER w AS version
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def snapshot_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 intervals from the change log (flagship).
    reference: parse_bug_history.py:457 populateIntermediateVersionObjects."""
    ev = load_table(spark, sf_dir, "events")
    out = S.snapshot_versions(ev, entity="user_id", ts="ts", tiebreak=("event_id",))
    return out.select(
        "user_id", "event_id", "event_type", "value",
        "valid_from", "expires_on", "version",
    )


@register(
    "snapshot_asof",
    oracle=f"""
    SELECT user_id, event_id, ts, event_type, value
    FROM (
        SELECT user_id, event_id, ts, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events, {DUCK_MID_CUT} cut
        WHERE floor(epoch(ts))::BIGINT <= cut.c
    ) WHERE rn = 1
    """,
)
def snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity state at a point in time. reference: bz_etl.py:172."""
    ev = load_table(spark, sf_dir, "events")
    filtered = (
        _with_mid_cut(ev)
        .where(F.col("ts").cast("long") <= F.col("_cut"))
        .drop("_cut")
    )
    out = S.dedup_latest(filtered)
    return out.select("user_id", "event_id", "ts", "event_type", "value")


@register(
    "state_rollforward",
    oracle="""
    SELECT user_id, event_id, ts,
           last(purchase_value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS last_purchase_value
    FROM (
        SELECT user_id, event_id, ts,
               CASE WHEN event_type = 'purchase' THEN value END AS purchase_value
        FROM events
    )
    """,
)
def state_rollforward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill the running current-state object.
    reference: parse_bug_history.py:111 processRow."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts",
        F.when(F.col("event_type") == "purchase", F.col("value")).alias(
            "purchase_value"
        ),
    )
    out = S.state_rollforward(ev, fields=["purchase_value"])
    return out.select("user_id", "event_id", "ts", "last_purchase_value")


@register(
    "state_rollforward_paned",
    oracle="""
    SELECT user_id, event_id, ts,
           last(purchase_value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS last_purchase_value
    FROM (
        SELECT user_id, event_id, ts,
               CASE WHEN event_type = 'purchase' THEN value END AS purchase_value
        FROM events
    )
    """,
)
def state_rollforward_paned(
    spark: SparkSession, sf_dir: str, width_s: int = 3600
) -> DataFrame:
    """state_rollforward's HOT-KEY-SPLITTABLE form (#173): the same
    forward-fill, decomposed as a two-level prefix scan (docstring
    at operators/snapshot.state_rollforward_paned) — in-pane carry
    per (user, pane), one summary row per pane, sequential pass over
    the tiny summary only.  Same oracle as state_rollforward: the
    decomposition is value-exact, only the partitioning moved.
    reference: parse_bug_history.py:111 processRow."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts",
        F.when(F.col("event_type") == "purchase", F.col("value")).alias(
            "purchase_value"
        ),
    )
    out = S.state_rollforward_paned(
        ev, fields=["purchase_value"], width_s=width_s
    )
    return out.select("user_id", "event_id", "ts", "last_purchase_value")


@register(
    "set_accumulate",
    oracle="""
    SELECT user_id, event_id, ts,
           -- null event_type = no value observed (skipped from the
           -- set).  array_to_string already skips nulls inside mixed
           -- lists but returns NULL for the all-null list; coalesce
           -- renders that empty set '' like Spark's collect_set
           -- (FILTER+DISTINCT over a window is not usable here —
           -- DuckDB internal error)
           coalesce(array_to_string(list_sort(list(DISTINCT event_type)
               OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           )), '|'), '') AS acc_set
    FROM events
    """,
)
def set_accumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running multi-value set (cc/keywords reconstruction).
    reference: parse_bug_history.py:816 addValues / :848 removeValues.

    The accumulated set is emitted '|'-joined (sorted, so the string
    is canonical) — scalar output the verifier can hash."""
    ev = load_table(spark, sf_dir, "events")
    out = S.set_accumulate(ev, value_col="event_type")
    return out.select(
        "user_id", "event_id", "ts",
        F.concat_ws("|", "acc_set").alias("acc_set"),
    )


SET_FINAL_ORACLE = """
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), '|')
               AS final_set,
           count(DISTINCT event_type) AS n_distinct
    FROM events GROUP BY user_id
    """


def _serialize_final_set(out: DataFrame) -> DataFrame:
    """'|'-join the sorted set column so the verifier can hash it."""
    return out.select(
        "user_id",
        F.concat_ws("|", "final_set").alias("final_set"),
        "n_distinct",
    )


@register("set_final", oracle=SET_FINAL_ORACLE)
def set_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final sorted multi-value per entity.
    reference: transform_bugzilla.py:99 MULTI_FIELDS sort."""
    ev = load_table(spark, sf_dir, "events")
    return _serialize_final_set(S.set_final(ev, value_col="event_type"))


@register("set_final_salted", oracle=SET_FINAL_ORACLE)
def set_final_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result as set_final via two-phase SALTED aggregation —
    the hot-entity mitigation (same oracle proves the rewrite exact).
    reference semantics: transform_bugzilla.py:99; scale pattern:
    SCALING.md skew notes."""
    ev = load_table(spark, sf_dir, "events")
    return _serialize_final_set(S.set_final_salted(ev, value_col="event_type"))


@register(
    "dedup_latest",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value
    FROM (
        SELECT user_id, event_id, ts, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current version per entity (ES overwrite-by-id semantics)."""
    ev = load_table(spark, sf_dir, "events")
    return S.dedup_latest(ev).select("user_id", "event_id", "ts", "event_type", "value")


@register(
    "merge_order_union",
    oracle="""
    WITH current AS (
        SELECT user_id, NULL::BIGINT AS event_id, max(ts) AS ts,
               1 AS _merge_order
        FROM events GROUP BY user_id
    ), activity AS (
        SELECT user_id, event_id, ts, 2 AS _merge_order FROM events
    ), merged AS (
        SELECT * FROM current UNION ALL BY NAME SELECT * FROM activity
    )
    SELECT user_id, event_id, ts, _merge_order,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY _merge_order ASC, ts DESC,
                                       event_id DESC NULLS LAST) AS replay_seq
    FROM merged
    """,
)
def merge_order_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current-state + activity merge in replay order.
    reference: bz_etl.py:105-111 (sorted by bug_id, _merge_order, ts desc)."""
    ev = load_table(spark, sf_dir, "events")
    current = ev.groupBy("user_id").agg(
        F.lit(None).cast("long").alias("event_id"), F.max("ts").alias("ts")
    )
    activity = ev.select("user_id", "event_id", "ts")
    out = S.merge_order_union(
        current, activity, entity="user_id", ts="ts", tiebreak=("event_id",)
    )
    return out.select("user_id", "event_id", "ts", "_merge_order", "replay_seq")


@register(
    "activity_invert",
    oracle="""
    SELECT user_id, event_id, ts, value,
           lag(value)  OVER w AS removed,
           lead(value) OVER w AS superseded_by
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def activity_invert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prior/next value chain per change.
    reference: parse_bug_history.py:307 processBugsActivitiesTableItem."""
    ev = load_table(spark, sf_dir, "events")
    out = S.activity_invert(ev, value_col="value")
    return out.select("user_id", "event_id", "ts", "value", "removed", "superseded_by")


@register(
    "incremental_touched",
    oracle=f"""
    SELECT user_id, event_id, ts, event_type, value
    FROM events
    WHERE user_id IN (
        SELECT DISTINCT user_id FROM events, {DUCK_MID_CUT} cut
        WHERE floor(epoch(ts))::BIGINT >= cut.c + 86400 * 13
    )
    """,
)
def incremental_touched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full history of every entity touched since the watermark.
    reference: bz_etl.py:172 incremental_etl re-ETLs whole bugs.

    Watermark = midpoint + 13 days: late enough that only SOME
    entities are touched, so the semi-join actually filters."""
    ev = load_table(spark, sf_dir, "events")
    touched = (
        _with_mid_cut(ev)
        .where(F.col("ts").cast("long") >= F.col("_cut") + 86400 * 13)
        .select("user_id")
        .distinct()
    )
    out = ev.join(F.broadcast(touched), on="user_id", how="left_semi")
    return out.select("user_id", "event_id", "ts", "event_type", "value")


@register(
    "interval_asof_join",
    oracle="""
    WITH l AS (
        SELECT user_id, event_id, ts, value FROM events
        WHERE event_type = 'purchase'
    ), r AS (
        SELECT user_id, ts AS r_ts, value AS signup_value FROM events
        WHERE event_type = 'signup'
    )
    SELECT l.user_id, l.event_id, l.ts, l.value,
           (SELECT r.signup_value FROM r
            WHERE r.user_id = l.user_id AND r.r_ts <= l.ts
            ORDER BY r.r_ts DESC LIMIT 1) AS asof_signup_value
    FROM l
    """,
)
def interval_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase picks up the state of the latest
    signup at-or-before it.  Union-window form — one shuffle on the
    key, NO inequality join (which would be per-key O(L x R)).
    reference: the _merge_order timestamp replay of
    parse_bug_history.py applied across two row streams."""
    from bugzilla_etl_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    signups = ev.where(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("value").alias("signup_value")
    )
    return asof_join(
        purchases, signups, key="user_id", left_ts="ts", right_ts="ts",
        payload=["signup_value"],
    )


@register(
    "replicate_pending",
    oracle=f"""
    SELECT event_id, user_id, ts
    FROM events
    WHERE floor(epoch(ts))::BIGINT > (
        SELECT max(floor(epoch(ts))::BIGINT)
        FROM events, {DUCK_MID_CUT} cut
        WHERE floor(epoch(ts))::BIGINT <= cut.c
    )
    """,
)
def replicate_pending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows newer than the destination's high-water mark.
    reference: replicate.py:68 get_last_updated / :97 get_pending.
    (dest stand-in: the first-half-of-time slice of events, so the
    pending set is the entire second half — a real workload shape)"""
    ev = load_table(spark, sf_dir, "events")
    dest = (
        _with_mid_cut(ev)
        .where(F.col("ts").cast("long") <= F.col("_cut"))
        .drop("_cut")
    )
    out = S.replicate_pending(ev, dest)
    return out.select("event_id", "user_id", "ts")


# Truncated-value synthesis (same CASE arithmetic both engines; only
# the string-cast spelling differs).  event_id%7 drives added:
# unknown / unknown / "? "-prefixed / clean; event_id%5 drives
# removed: unknown / prefixed / absent / clean.  The %35==0 rows on a
# TRUNC field scrub BOTH sides to NULL — the reference's skip branch.
def _trunc_cases(cast_t: str) -> tuple[str, str]:
    add = (
        "CASE event_id % 7 WHEN 0 THEN '?' WHEN 1 THEN '? ?' "
        "WHEN 2 THEN '? ' || event_type "
        f"ELSE 'v' || CAST(event_id % 10 AS {cast_t}) END"
    )
    rem = (
        "CASE event_id % 5 WHEN 0 THEN '?' "
        "WHEN 1 THEN '? o' || event_type "
        f"WHEN 2 THEN CAST(NULL AS {cast_t}) "
        f"ELSE 'o' || CAST(event_id % 10 AS {cast_t}) END"
    )
    return add, rem


_TRUNC_ADD_S, _TRUNC_REM_S = _trunc_cases("STRING")
_TRUNC_ADD_D, _TRUNC_REM_D = _trunc_cases("VARCHAR")


@register(
    "trunc_uncertain",
    oracle=f"""
    WITH act AS (
        SELECT user_id, event_id, epoch_us(ts) AS tsl,
               event_type AS field,
               {_TRUNC_ADD_D} AS added_raw,
               {_TRUNC_REM_D} AS removed_raw
        FROM events
    ),
    scrub AS (
        SELECT user_id, event_id, tsl, field,
               CASE WHEN field IS NULL OR field NOT IN ('click', 'view') THEN added_raw
                    WHEN added_raw IN ('?', '? ?') THEN NULL
                    WHEN added_raw LIKE '? %' THEN substring(added_raw, 3)
                    ELSE added_raw END AS added,
               CASE WHEN field IS NULL OR field NOT IN ('click', 'view') THEN removed_raw
                    WHEN removed_raw IN ('?', '? ?') THEN NULL
                    WHEN removed_raw LIKE '? %' THEN substring(removed_raw, 3)
                    ELSE removed_raw END AS removed,
               (coalesce(field IN ('click', 'view')
                         AND (added_raw IN ('?', '? ?')
                              OR added_raw LIKE '? %'), FALSE)
                OR coalesce(field IN ('click', 'view')
                            AND (removed_raw IN ('?', '? ?')
                                 OR removed_raw LIKE '? %'), FALSE))
                   AS uncertain
        FROM act
    ),
    marked AS (
        SELECT *,
               (uncertain AND added IS NULL AND removed IS NULL)
                   AS skip_update,
               max(CASE WHEN uncertain THEN tsl END)
                   OVER (PARTITION BY user_id) AS t_unc
        FROM scrub
    )
    SELECT user_id, event_id, tsl, field, added, removed,
           uncertain, skip_update,
           CASE WHEN tsl < t_unc THEN '1' END AS entity_uncertain
    FROM marked
    """,
)
def trunc_uncertain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated-value uncertainty handling (bug 55161 workaround).
    reference: parse_bug_history.py:79 TRUNC_FIELDS, :137-156 — on
    truncation-prone fields, "?"/"? ?" activity values are unknown
    (NULL + uncertain), "? "-prefixed values are stripped + uncertain,
    both-NULL rows are skipped, and the FIRST uncertain row met
    walking backwards (= the latest in time) injects a synthetic
    'uncertain' activity that marks every EARLIER version
    uncertain='1' (:156-171 — "WE ARE GOING BACKWARDS IN TIME, SO
    MARKUP PAST").

    Spark shape: the scrub is pure column expressions (zero shuffle);
    the past-markup is ONE per-entity window max over the uncertain
    timestamps — no second pass, no join."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    act = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("tsl"),
        F.col("event_type").alias("field"),
        F.expr(_TRUNC_ADD_S).alias("added"),
        F.expr(_TRUNC_REM_S).alias("removed"),
    )
    scrubbed = N.scrub_truncated(act, trunc_fields=("click", "view"))
    w = Window.partitionBy("user_id")
    t_unc = F.max(F.when(F.col("uncertain"), F.col("tsl"))).over(w)
    return scrubbed.select(
        "user_id",
        "event_id",
        "tsl",
        "field",
        "added",
        "removed",
        "uncertain",
        F.col("skip_update"),
        F.when(F.col("tsl") < t_unc, F.lit("1")).alias("entity_uncertain"),
    )
