"""Private-data leak checks — the analog of the reference's
leak_check.py (tests/resources/python/leak_check.py): after
screening, NOTHING private may reach the output, under any of the
screening operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from bugzilla_etl_spark.plans import catalog
from bugzilla_etl_spark.sources import load_table


def test_private_screen_no_leak(spark, sf_dir):
    catalog.load_all()
    out = catalog.QUERIES["private_screen"](spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    private = (
        ev.where((F.col("event_type") == "error") & (F.col("value") > 190))
        .select("user_id")
        .distinct()
    )
    leaked = out.join(private, on="user_id", how="inner").count()
    assert leaked == 0


def test_screen_mask_no_unmasked_props(spark, sf_dir):
    catalog.load_all()
    out = catalog.QUERIES["screen_mask"](spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    screened = (
        ev.where((F.col("event_type") == "error") & (F.col("value") > 180))
        .select("user_id")
        .distinct()
    )
    bad = (
        out.join(screened, on="user_id")
        .where(F.col("props") != "[screened]")
        .count()
    )
    assert bad == 0
    # and non-screened rows must be untouched
    untouched = out.join(screened, on="user_id", how="left_anti").where(
        F.col("props") == "[screened]"
    )
    assert untouched.count() == 0


def test_comments_etl_excludes_private_source(spark, sf_dir):
    catalog.load_all()
    out = catalog.QUERIES["comments_etl"](spark, sf_dir)
    assert out.where(F.col("source") == "src0").count() == 0


def test_es_docs_only_from_screened_pipeline(spark, sf_dir):
    """Composing screening with the doc sink: no private entity id may
    appear in any emitted doc id."""
    catalog.load_all()
    ev = load_table(spark, sf_dir, "events")
    private = {
        r.user_id
        for r in ev.where(
            (F.col("event_type") == "error") & (F.col("value") > 190)
        )
        .select("user_id")
        .distinct()
        .collect()
    }
    screened = catalog.QUERIES["private_screen"](spark, sf_dir)
    from bugzilla_etl_spark.operators.normalize import doc_id

    ids = screened.join(
        load_table(spark, sf_dir, "events").select("event_id", "ts"),
        on="event_id",
    ).select(doc_id("user_id", "ts").alias("_id"))
    leaked = [
        r._id for r in ids.collect() if int(r._id.split("_")[0]) in private
    ]
    assert not leaked

def test_private_subentity_screen_list_scrubs_nested_docs(spark, sf_dir):
    """Composing the sub-entity flip list with the nested-attachment
    pipeline (the reference's re-ETL consumption of
    get_recent_private_attachments): scrubbing the screen_sub pairs
    out of the attachment mutation stream removes every screened
    sub-document and ONLY those."""
    catalog.load_all()
    out = catalog.QUERIES["private_subentity"](spark, sf_dir)
    screen = out.where(F.col("action") == "screen_sub").select(
        "user_id", F.col("sub_id").alias("attach_id")
    )
    assert screen.count() > 0  # the check has teeth at this SF
    ev = load_table(spark, sf_dir, "events")
    muts = ev.where(F.col("event_id") % 2 == 0).select(
        "user_id",
        (F.lit(1) + F.col("event_id") % 5).alias("attach_id"),
    )
    # every screened pair must actually exist in the mutation stream
    # (otherwise the kept-count arithmetic below proves nothing)
    present = screen.join(
        muts.distinct(), on=["user_id", "attach_id"], how="left_semi"
    ).count()
    assert present == screen.count()
    scrubbed = muts.join(
        screen, on=["user_id", "attach_id"], how="left_anti"
    )
    # completeness + minimality in one count: the anti-join removed
    # EXACTLY the screened pairs (a leaked pair would raise `kept`,
    # an over-scrub would lower it)
    kept = scrubbed.select("user_id", "attach_id").distinct().count()
    total = muts.select("user_id", "attach_id").distinct().count()
    assert kept == total - screen.count()


def test_private_subentity_state_is_latest_marker(spark, sf_dir):
    """Every screen_sub pair's LATEST privacy marker is private, and
    every refresh_entity entity has a recent flip none of whose
    now-current states are private for that flipped sub — checked
    against a pandas replay of the marker stream."""
    catalog.load_all()
    out = catalog.QUERIES["private_subentity"](spark, sf_dir)
    rows = out.collect()
    ev = load_table(spark, sf_dir, "events")
    m = (
        ev.where(
            (F.col("event_id") % 2 == 0)
            & (F.col("event_type") == "error")
        )
        .select(
            "user_id",
            (F.lit(1) + F.col("event_id") % 5).alias("sub_id"),
            "event_id",
            F.col("ts").cast("long").alias("tsl"),
            "value",
        )
        .toPandas()
    )
    latest = (
        m.sort_values(["tsl", "event_id"])
        .groupby(["user_id", "sub_id"])
        .tail(1)
        .set_index(["user_id", "sub_id"])["value"]
    )
    for r in rows:
        if r["action"] == "screen_sub":
            assert latest[(r["user_id"], r["sub_id"])] > 150, r
    # cut exactly as the query computes it: off ALL events (the
    # marker-subset max would under-count recent flips whenever the
    # newest event is not a marker)
    cut = (
        ev.agg(F.max(F.col("ts").cast("long"))).collect()[0][0]
        - 604800
    )
    recent = m[m["tsl"] >= cut]
    refresh = {r["user_id"] for r in rows if r["action"] == "refresh_entity"}
    for uid in refresh:
        flips = recent[recent["user_id"] == uid]
        assert len(flips) > 0, uid
        ok = any(
            latest[(uid, sid)] <= 150
            for sid in flips["sub_id"].unique()
        )
        assert ok, uid
