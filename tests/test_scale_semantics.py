"""Scale-rewrite exactness and approximate-operator accuracy."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from bugzilla_etl_spark.operators.snapshot import set_final, set_final_salted
from bugzilla_etl_spark.sources import load_table

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from bugzilla_etl_spark.session import get_spark

        _spark = get_spark("scale-sem", cpus=4, shuffle_partitions=4)
    return _spark


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.sampled_from("abcdef")),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=10, deadline=None)
def test_salted_set_final_exact(rows):
    """The two-phase salted aggregation must be EXACTLY set_final on
    arbitrary inputs (skew rewrites may never change results)."""
    spark = _get_spark()
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    a = {
        r.user_id: (tuple(r.final_set), r.n_distinct)
        for r in set_final(df, "event_type").collect()
    }
    b = {
        r.user_id: (tuple(r.final_set), r.n_distinct)
        for r in set_final_salted(df, "event_type").collect()
    }
    assert a == b


def test_approx_count_distinct_accuracy(spark, sf_dir):
    """The 100 TB path for n_distinct is approx_count_distinct — pin
    its error against the exact count so the documented accuracy
    claim (rsd 5%) stays honest."""
    ev = load_table(spark, sf_dir, "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.05).alias("approx"),
    ).first()
    assert abs(row.approx - row.exact) <= max(3, 0.15 * row.exact), row


def test_stream_time_rollup_matches_batch(spark, sf_dir, tmp_path):
    """Watermarked streaming hourly rollup == batch rollup on the same
    data (final emission per window)."""
    from tests.test_sinks_streaming import _write_event_slices
    from bugzilla_etl_spark.streaming.snapshot_stream import (
        stream_time_rollup,
    )

    src = str(tmp_path / "src")
    schema = _write_event_slices(spark, sf_dir, src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        stream_time_rollup(stream)
        .writeStream.format("memory")
        .queryName("rollup_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.hour, r.event_type): (r.n_events, round(r.sum_value, 4))
        for r in spark.sql(
            """SELECT hour, event_type, n_events, sum_value FROM (
                   SELECT *, row_number() OVER (
                       PARTITION BY hour, event_type
                       ORDER BY n_events DESC) rn
                   FROM rollup_stream) WHERE rn = 1"""
        ).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        (r.hour, r.event_type): (r.n_events, round(r.sum_value, 4))
        for r in ev.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour"), "event_type",
            "n_events", "sum_value",
        )
        .collect()
    }
    assert got == want


def test_stream_dedup_drops_replays(spark, sf_dir, tmp_path):
    """Events replayed across micro-batches must be ingested once."""
    from pyspark.sql import functions as F
    from bugzilla_etl_spark.streaming.snapshot_stream import (
        stream_dedup_events,
    )

    ev = load_table(spark, sf_dir, "events").limit(300)
    src = str(tmp_path / "src")
    # write the SAME slice twice plus a fresh slice -> replay scenario
    ev.where(F.col("event_id") < 150).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src + "/a")
    ev.where(F.col("event_id") < 150).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src + "/b")
    ev.where(F.col("event_id") >= 150).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src + "/c")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        stream_dedup_events(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_stream"
    ).first()
    want = ev.count()
    assert got.n == got.d == want, (got, want)
