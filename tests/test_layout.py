"""Storage-layout tests: partition pruning must actually prune."""

from __future__ import annotations

from pyspark.sql import functions as F

from bugzilla_etl_spark.sinks.layout import (
    read_history_layout,
    write_history_layout,
)
from bugzilla_etl_spark.sources import load_table


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_table_eliminates_window_exchange(spark, sf_dir):
    """THE scale cornerstone: over an entity-bucketed table, the whole
    snapshot pipeline plans ZERO exchanges — the shuffle that
    dominates every temporal operator at 100 TB simply disappears
    when the storage layout carries the partitioning."""
    import re

    from bugzilla_etl_spark.operators import snapshot as S

    ev = load_table(spark, sf_dir, "events")
    spark.sql("DROP TABLE IF EXISTS events_bucketed_t")
    (
        ev.write.mode("overwrite")
        .bucketBy(8, "user_id")
        .sortBy("user_id", "ts")
        .saveAsTable("events_bucketed_t")
    )
    try:
        plan = _plan(S.snapshot_versions(spark.table("events_bucketed_t")))
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS events_bucketed_t")


def test_partition_pruning_on_date_layout(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "hist")
    write_history_layout(ev, path)

    back = read_history_layout(spark, path)
    # full round-trip
    assert back.count() == ev.count()

    one_day = back.where(F.col("event_date") == "2024-01-05")
    plan = _plan(one_day)
    # the date filter must become a partition filter, not a data filter
    assert "PartitionFilters" in plan
    assert "2024-01-05" in plan.split("PartitionFilters")[1].splitlines()[0]
    got = one_day.count()
    want = ev.where(
        F.floor(F.col("ts").cast("long") / 86400) * 86400
        == 1704412800  # 2024-01-05 UTC
    ).count()
    assert got == want and got > 0


def test_load_table_pins_utc_for_non_utc_session(spark, sf_dir):
    """The events ntz->timestamp cast is value-identical ONLY under a
    UTC session timezone.  session.py pins UTC, but the external
    driver imports __spark_entry__ with its OWN vanilla session — if
    that session (or a notebook's) carries a local timezone, every
    event instant would silently shift by the UTC offset.  load_table
    must therefore pin UTC itself: a deliberately non-UTC session must
    read the exact same epoch instants as the UTC one."""
    utc_ts = [
        r.us
        for r in load_table(spark, sf_dir, "events")
        .select(F.unix_micros("ts").alias("us"))
        .orderBy("us")
        .limit(50)
        .collect()
    ]

    utc_od = [
        r.s
        for r in load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderdate").cast("timestamp").cast("long").alias("s"))
        .orderBy("s")
        .limit(50)
        .collect()
    ]

    other = spark.newSession()
    other.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        ny_ts = [
            r.us
            for r in load_table(other, sf_dir, "events")
            .select(F.unix_micros("ts").alias("us"))
            .orderBy("us")
            .limit(50)
            .collect()
        ]
        # and load_table must have pinned the conf itself
        assert other.conf.get("spark.sql.session.timeZone") == "UTC"
        # the pin covers EVERY table, not just events — tpch_q18's
        # ntz orderdate -> epoch projection depends on it
        other.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny_od = [
            r.s
            for r in load_table(other, sf_dir, "orders")
            .select(
                F.col("o_orderdate").cast("timestamp").cast("long").alias("s")
            )
            .orderBy("s")
            .limit(50)
            .collect()
        ]
    finally:
        other.conf.set("spark.sql.session.timeZone", "UTC")
    assert utc_ts == ny_ts and len(utc_ts) == 50
    assert utc_od == ny_od and len(utc_od) == 50
