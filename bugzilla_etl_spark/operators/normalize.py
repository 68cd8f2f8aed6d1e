"""Normalization operators — the reference's ``normalize()`` +
field parsers, re-expressed as pure column expressions (zero shuffle,
whole-stage codegen).

reference: bugzilla_etl/transform_bugzilla.py:53 normalize()
           bugzilla_etl/parse_bug_history.py:70 FLAG_PATTERN,
           :1052 parse_flag, :1069 parseMultiField
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# transform_bugzilla.py:42 NULL_VALUES = ['--', '---', '']
NULL_VALUES = ("--", "---", "")
# transform_bugzilla.py:41 ZERO_IS_NULL = ["votes", "remaining_time"]

# parse_bug_history.py:70 — "review?(mreid@mozilla.com)" -> (review, ?, mreid…)
FLAG_REGEX = r"^(.*)([?+-])(\([^)]*\))?$"


def scrub_nulls(col: Column | str, null_values: Sequence[str] = NULL_VALUES) -> Column:
    """Map the reference's null-token strings to real NULLs."""
    c = F.col(col) if isinstance(col, str) else col
    out = c
    for nv in null_values:
        out = F.nullif(out, F.lit(nv))
    return out


def zero_to_null(col: Column | str) -> Column:
    """ZERO_IS_NULL fields: a 0 means 'absent' (votes, remaining_time)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(c, F.lit(0))


def numeric_coerce(col: Column | str) -> Column:
    """Best-effort numeric coercion (NUMERIC_FIELDS): non-numeric -> NULL
    (try_cast, so bad rows degrade instead of failing the job)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double")


def parse_flag(col: Column | str) -> Column:
    """``"review?(requestee@x)"`` -> struct(name, status, requestee).

    Status is one of ?/+/-; requestee only present for requests.
    Empty-match convention: regexp_extract returns '' on no match —
    normalized to NULL so downstream set logic treats it as absent.
    """
    c = F.col(col) if isinstance(col, str) else col
    name = F.nullif(F.regexp_extract(c, FLAG_REGEX, 1), F.lit(""))
    status = F.nullif(F.regexp_extract(c, FLAG_REGEX, 2), F.lit(""))
    requestee = F.nullif(
        F.regexp_replace(F.regexp_extract(c, FLAG_REGEX, 3), r"[()]", ""), F.lit("")
    )
    return F.struct(
        name.alias("name"), status.alias("status"), requestee.alias("requestee")
    )


def split_multi_field(col: Column | str, sep: str = r",\s*") -> Column:
    """MULTI_FIELDS arrive as delimited strings; emit a sorted array
    (normalize() keeps multi-values sorted for stable diffs)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sort_array(F.array_distinct(F.split(c, sep)))


def doc_id(entity: Column | str, ts: Column | str) -> Column:
    """ES document id — ``f"{bug_id}_{modified_ts_seconds}"``.
    reference: transform_bugzilla.py:55 (millis string minus last 3
    digits == whole seconds)."""
    e = F.col(entity) if isinstance(entity, str) else entity
    t = F.col(ts) if isinstance(ts, str) else ts
    return F.concat_ws("_", e.cast("string"), t.cast("long").cast("string"))


def to_es_doc(df: DataFrame, entity: str, ts: str, payload: Sequence[str]) -> DataFrame:
    """Shape rows as ES bulk documents: (_id, doc-json).  The sink
    streams these straight into bulk-index lines; JSON rendering is
    JVM-side ``to_json`` — no Python in the hot path."""
    return df.select(
        doc_id(entity, ts).alias("_id"),
        F.to_json(F.struct(*[F.col(p) for p in payload])).alias("doc"),
    )


# parse_bug_history.py:79 — "Fields that could have been truncated per
# bug 55161" (the Bugzilla bug where long multi-value fields were cut
# off, so activity rows carry "?"-mangled values).
TRUNC_FIELDS = ("cc", "blocked", "dependson", "keywords")


def scrub_truncated(
    df: DataFrame,
    added: str = "added",
    removed: str = "removed",
    field: str = "field",
    trunc_fields: Sequence[str] = TRUNC_FIELDS,
    uncertain_col: str = "uncertain",
    skip_col: str = "skip_update",
) -> DataFrame:
    """Truncated-value uncertainty handling for activity replay.

    reference: parse_bug_history.py:137-156 — for activity rows on a
    TRUNC_FIELDS field, ``"?"`` / ``"? ?"`` values are UNKNOWN (the
    truncation ate them: value -> NULL) and ``"? "``-prefixed values
    are uncertain-but-usable (prefix stripped); either case marks the
    row uncertain.  A row whose added AND removed both scrub to NULL
    carries no usable change and is flagged ``skip_update`` (the
    reference ``return``s without applying it).  Non-TRUNC fields
    pass through verbatim — a literal ``"?"`` in, say, a status field
    is a real value, so the gate column matters.

    A NULL field is not a TRUNC field (the reference's ``field_name
    in TRUNC_FIELDS`` is False for None) — the gate coalesces NULL
    to False so such rows pass through verbatim instead of falling
    into the scrub branches on three-valued logic.

    Pure column expressions (zero shuffle, whole-stage codegen); the
    entity-level "mark the past uncertain" step — the reference
    injects a synthetic ``uncertain`` activity at the FIRST uncertain
    row it meets walking backwards in time (:156-171), i.e. versions
    strictly before the latest uncertain change inherit
    ``uncertain='1'`` — is a per-entity max-ts window the caller
    composes on top (see the ``trunc_uncertain`` catalog query).
    """
    gate = F.coalesce(F.col(field).isin(*trunc_fields), F.lit(False))

    def _clean(c: Column) -> Column:
        return (
            F.when(~gate, c)
            .when(c.isin("?", "? ?"), F.lit(None).cast("string"))
            .when(c.startswith("? "), c.substr(F.lit(3), F.length(c)))
            .otherwise(c)
        )

    def _unc(c: Column) -> Column:
        return F.coalesce(
            gate & (c.isin("?", "? ?") | c.startswith("? ")),
            F.lit(False),
        )

    a, r = F.col(added), F.col(removed)
    return (
        df.withColumn(uncertain_col, _unc(a) | _unc(r))
        .withColumn(added, _clean(a))
        .withColumn(removed, _clean(r))
        .withColumn(
            skip_col,
            F.col(uncertain_col)
            & F.col(added).isNull()
            & F.col(removed).isNull(),
        )
    )


# transform_bugzilla.py:28-29 / parse_bug_history.py:48
TIME_FIELDS = ("cf_due_date", "cf_last_resolved")
EMAIL_FIELDS = (
    "cc", "assigned_to", "modified_by", "created_by", "qa_contact",
    "bug_mentor",
)


def canonicalize_fields(
    df: DataFrame,
    mapping: DataFrame,
    field: str = "field",
    value: str = "value_raw",
    email_fields: Sequence[str] = EMAIL_FIELDS,
    time_fields: Sequence[str] = TIME_FIELDS,
    numeric_fields: Sequence[str] = ("votes", "remaining_time"),
) -> DataFrame:
    """The reference's ``canonical(field, value)`` dispatch
    (parse_bug_history.py:1026-1045): null-token values -> NULL,
    email-typed fields -> alias-resolved, time-typed fields -> epoch
    millis, numeric fields -> best-effort number, everything else
    passes through.

    Adds ``value_canon`` (string, the unified canonical form),
    ``value_ms`` (long, time fields only) and ``value_num`` (long,
    numeric fields only).  Everything is a column expression except
    the email branch, which is the usual broadcast mapping join
    (get_canonical's dict lookup) — one dim-sized build side, zero
    fact shuffles.  Time parsing assumes the UTC session pin from
    load_table; numeric parsing is try_cast (bad rows -> NULL,
    mirroring value2number's failure mode)."""
    f, v = F.col(field), F.col(value)
    scrubbed = scrub_nulls(v)
    is_email = f.isin(*email_fields)
    is_time = f.isin(*time_fields)
    is_num = f.isin(*numeric_fields)

    out = df.withColumn("__scr", scrubbed)
    m = mapping.select(
        F.col("alias").alias("__al"), F.col("canonical").alias("__cn")
    )
    out = out.join(
        F.broadcast(m),
        on=(is_email & (F.col("__scr") == F.col("__al"))),
        how="left",
    )
    # try_* variants mirror the reference's bare-except: a malformed
    # date/number degrades (NULL in the typed column, raw value kept
    # in the canon string) instead of failing the job under ANSI mode.
    ms = F.unix_millis(F.try_to_timestamp(F.col("__scr")))
    num = F.col("__scr").try_cast("long")
    return (
        out.withColumn("value_ms", F.when(is_time, ms))
        .withColumn("value_num", F.when(is_num, num))
        .withColumn(
            "value_canon",
            F.when(F.col("__scr").isNull(), F.lit(None).cast("string"))
            .when(is_email, F.coalesce(F.col("__cn"), F.col("__scr")))
            .when(
                is_time,
                F.coalesce(F.col("value_ms").cast("string"), F.col("__scr")),
            )
            .when(
                is_num,
                F.coalesce(F.col("value_num").cast("string"), F.col("__scr")),
            )
            .otherwise(F.col("__scr")),
        )
        .drop("__scr", "__al", "__cn")
    )
