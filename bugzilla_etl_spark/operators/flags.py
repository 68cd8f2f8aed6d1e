"""Flag-change replay — per-version flag *sets* rebuilt from an
add/remove change log, the most distinctive semantics of the
reference's history parser.

reference: bugzilla_etl/parse_bug_history.py
    :292  processFlagsTableItem   (current-state flag rows)
    :653  processFlagChange       (removed -> mark deleted w/ carry;
                                   added -> realign-or-append)
    :626  findFlag                (match by deformat(type) +
                                   requestee-for-'?' / setter-otherwise)
    :970  processFlags            (set replay per activity row)
    :1088 deformat                (lower + U+2011 -> '-')

Spark-first re-expression.  The reference replays each bug's activity
imperatively against an in-memory flag list; the same semantics
factor into a declarative plan because findFlag's match is (almost) a
key equality:

  match key  = deformat(request_type) + (requestee   if status '?'
                                         else setter)   [findFlag :630-:636]
  replay     = last change wins per (entity, match key)  ->  SCD2
               intervals via lead(ts) over that key
  deletion   = a 'remove' change yields status 'd', value NULL,
               previous_status = the removed flag's own status, and
               previous_modified_ts = ts of the last preceding 'add'
               [processFlagChange :666-:681]
  realign    = a later 'add' on the same key supersedes the dangling
               deletion (the interval chain does this for free; the
               reference's candidate scoring :693-:766 exists only
               because its keys are implicit)
  re-nest    = join bug-version timestamps into the key intervals,
               aggregate the live set per version

Scale shape (100 TB): one shuffle on (entity, key) for the interval
windows, one hash join on entity (bug) whose per-key fan-out is the
entity's own history — the identical bound the reference carries in
memory per bug — then one aggregation shuffle.  No cross-entity data
motion beyond hash partitioning on entity; skewed entities are single
bugs with huge histories, bounded by Bugzilla itself (~1e4 rows).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# parse_bug_history.py:1088 — lower() + non-breaking hyphen U+2011
NONBREAK_HYPHEN = "‑"


def deformat(col: F.Column | str) -> F.Column:
    """Fuzzy-match canonicalization of a flag type (deformat :1088)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.translate(c, NONBREAK_HYPHEN, "-"))


def flag_match_key(
    name: F.Column, status: F.Column, requestee: F.Column
) -> F.Column:
    """findFlag :630-:636 — '?' requests match on requestee, granted/
    denied flags match on the setter (constant within an entity's
    replay, so it reduces to a marker)."""
    return F.concat_ws(
        "/",
        deformat(name),
        F.when(status == "?", F.coalesce(requestee, F.lit(""))).otherwise(
            F.lit("*setter*")
        ),
    )


def flag_state_intervals(
    changes: DataFrame,
    entity: str = "user_id",
    ts: str = "ts",
    tiebreak: Sequence[str] = ("event_id",),
) -> DataFrame:
    """SCD2 state intervals per (entity, flag match key).

    ``changes`` columns: entity, ts (long), *tiebreak, name, status,
    requestee, action ('add' | 'remove').

    Output: entity, match_key, flag_name, requestee, cur_status,
    previous_status, prev_add_ts, valid_from, valid_to (NULL = open).

    A 'remove' produces the reference's deleted-flag marker
    (processFlagChange :666-:681): cur_status 'd', previous_status =
    the removed flag's own status, previous ts carried from the last
    'add' so flag age is recoverable.
    """
    key = flag_match_key(F.col("name"), F.col("status"), F.col("requestee"))
    ch = changes.withColumn("match_key", key)

    w = Window.partitionBy(entity, "match_key").orderBy(ts, *tiebreak)
    hist = w.rowsBetween(Window.unboundedPreceding, -1)

    return ch.select(
        F.col(entity),
        "match_key",
        deformat("name").alias("flag_name"),
        "requestee",
        F.when(F.col("action") == "remove", F.lit("d"))
        .otherwise(F.col("status"))
        .alias("cur_status"),
        F.when(F.col("action") == "remove", F.col("status")).alias(
            "previous_status"
        ),
        F.last(
            F.when(F.col("action") == "add", F.col(ts)), ignorenulls=True
        )
        .over(hist)
        .alias("prev_add_ts"),
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w).alias("valid_to"),
    )


def flag_states_per_version(
    intervals: DataFrame,
    versions: DataFrame,
    entity: str = "user_id",
    version_ts: str = "version_ts",
) -> DataFrame:
    """Join version timestamps into the key intervals and aggregate
    the live flag set per version (populateIntermediateVersionObjects'
    per-version flags list, re-expressed as one join + one agg).

    ``versions``: (entity, version_ts long), one row per bug version.
    Output: entity, version_ts, n_active, n_deleted, flags_active,
    flags_deleted — the sets serialized sorted + '|'-joined so the
    driver's canonicalizer can hash them.
    """
    # Render each interval's display strings ONCE, pre-join: the
    # version join fans out |versions| x |live intervals| per entity
    # (that fan-out IS the output content, so it can't shrink), but
    # string building should not be repeated on every fanned-out row
    active = F.col("cur_status").isNotNull() & (F.col("cur_status") != "d")
    deleted = F.col("cur_status") == "d"
    # Reference flag VALUE string: name + status + '(requestee)' (:1052)
    active_str = F.concat(
        F.col("flag_name"),
        F.col("cur_status"),
        F.when(
            (F.col("cur_status") == "?") & F.col("requestee").isNotNull(),
            F.concat(F.lit("("), F.col("requestee"), F.lit(")")),
        ).otherwise(F.lit("")),
    )
    # Deleted marker carries previous_status + age (duration_ms :680)
    deleted_str = F.concat(
        F.col("flag_name"),
        F.lit(":d:prev="),
        F.coalesce(F.col("previous_status"), F.lit("")),
        F.lit(":age="),
        F.coalesce(
            (F.col("valid_from") - F.col("prev_add_ts")).cast("string"),
            F.lit("-1"),
        ),
    )
    rendered = intervals.select(
        F.col(entity),
        "valid_from",
        "valid_to",
        F.when(active, active_str).alias("astr"),
        F.when(deleted, deleted_str).alias("dstr"),
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

    return joined.groupBy(
        F.col(f"v.{entity}").alias(entity),
        F.col(f"v.{version_ts}").alias(version_ts),
    ).agg(
        F.count("i.astr").alias("n_active"),
        F.count("i.dstr").alias("n_deleted"),
        F.concat_ws(
            "|", F.sort_array(F.collect_list("i.astr"))
        ).alias("flags_active"),
        F.concat_ws(
            "|", F.sort_array(F.collect_list("i.dstr"))
        ).alias("flags_deleted"),
    )


def flag_tiered_match(
    current: DataFrame,
    removals: DataFrame,
    entity: str = "entity",
    value: str = "value",
) -> DataFrame:
    """findFlag's full three-tier cascade (parse_bug_history.py:626-
    :650): a flag removal is matched against the entity's current
    flag list by (1) the parsed key — deformat(type) + status +
    requestee-or-setter, (2) exact string equality (flags the
    255-char bugs_activity limit left unparseable), (3) common-
    prefix equality ``f.value[:min_len] == flag.value[:min_len]``
    — the truncation workaround itself.  Output: one row per
    removal with (matched, tier) or tier NULL = unmatched.

    Determinism (deviation, cited like cc_fuzzy_rescue): each
    reference tier returns the FIRST hit in flag-list order — an
    ingestion-order artifact no engine reproduces; this operator
    takes the argmin over (tier, matched value).  All three tiers
    evaluate in ONE entity-keyed join (candidates bounded by the
    per-entity flag-list size, the reference's own loop bound) and
    one window pass; prefix equality is two startswith's — min_len
    truncation makes "equal prefixes" mean "one is a prefix of the
    other"."""
    from bugzilla_etl_spark.operators.normalize import parse_flag

    def keyed(df: DataFrame, out: str) -> DataFrame:
        # findFlag's tier-1 equality is deformat(type) AND status AND
        # requestee-or-setter (:629-:636) — status is part of the
        # match, unlike flag_state_intervals' match_key, which folds
        # '+'/'-' together by design.  Setter comparison reduces to a
        # marker (constant within an entity's replay, same reduction
        # as flag_match_key documents).
        p = parse_flag(F.col("_raw"))
        key = F.concat_ws(
            "/",
            deformat(p["name"]),
            p["status"],
            F.when(
                p["status"] == "?", F.coalesce(p["requestee"], F.lit(""))
            ).otherwise(F.lit("*setter*")),
        )
        return (
            df.select(entity, F.col(value).alias("_raw"))
            .distinct()
            .select(
                entity,
                F.col("_raw").alias(out),
                F.when(p["status"].isNotNull(), key).alias(f"_key_{out}"),
            )
        )

    cur = keyed(current, "_cv")
    rem = keyed(removals, "removal")
    key_hit = (
        F.col("_key_removal").isNotNull()
        & F.col("_key__cv").isNotNull()
        & (F.col("_key_removal") == F.col("_key__cv"))
    )
    exact_hit = F.col("removal") == F.col("_cv")
    prefix_hit = F.col("_cv").startswith(F.col("removal")) | F.col(
        "removal"
    ).startswith(F.col("_cv"))
    cand = (
        rem.join(cur, on=entity)
        .where(key_hit | exact_hit | prefix_hit)
        .withColumn(
            "tier",
            F.when(key_hit, 1).when(exact_hit, 2).otherwise(3),
        )
    )
    w = Window.partitionBy(entity, "removal").orderBy(
        F.col("tier").asc(), F.col("_cv").asc()
    )
    best = (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(entity, "removal", F.col("_cv").alias("matched"), "tier")
    )
    return (
        rem.select(entity, "removal")
        .join(best, on=[entity, "removal"], how="left")
        .select(entity, "removal", "matched", "tier")
    )
