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