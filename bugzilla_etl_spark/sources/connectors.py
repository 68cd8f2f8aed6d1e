"""External-source connectors (config stubs).

The reference extracts from MySQL (pyLibrary.sql.mysql over the
Bugzilla schema, extract_bugzilla.py) and reads/writes Elasticsearch
(pyLibrary.env.elasticsearch; replicate.py).  Neither service exists
in this container, so these builders construct the correctly-shaped
Spark readers and fail with a clear error only at connection time —
the plan-level integration (predicate/partition pushdown options,
parallel partitioned reads) is real.

At 100 TB the operative details are encoded here:
* JDBC reads MUST be partitioned (partitionColumn/numPartitions) or
  the whole table funnels through one task — mirrored from the
  reference's bug-range batching (bz_etl.py splits bug_list across
  connections).
* ES reads/writes go through the es-hadoop connector when present
  (`org.elasticsearch.spark.sql`); doc ids map from our deterministic
  `_id` so overwrites stay idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **options: str,
) -> DataFrame:
    """Partitioned JDBC read (MySQL/MariaDB Bugzilla schema).
    reference: extract_bugzilla.py's range-batched SQL; bz_etl.py:84
    connection pooling."""
    reader = spark.read.format("jdbc").option("url", url).option(
        "dbtable", table
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partitioned jdbc read requires lower_bound/upper_bound "
                "(scan min/max of the partition column first)"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def es_index(
    spark: SparkSession, nodes: str, index: str, **options: str
) -> DataFrame:
    """Elasticsearch index read via es-hadoop (if the connector jar is
    on the classpath).  reference: replicate.py:97 get_pending reads
    the source index with a range filter — express that filter on the
    returned DataFrame; the connector pushes it down."""
    reader = (
        spark.read.format("org.elasticsearch.spark.sql")
        .option("es.nodes", nodes)
        .option("es.resource", index)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_es_index(
    df: DataFrame, nodes: str, index: str, id_col: str = "_id", **options: str
) -> None:
    """Bulk-write documents with explicit ids (idempotent overwrite —
    the reference's ES sink contract)."""
    writer = (
        df.write.format("org.elasticsearch.spark.sql")
        .option("es.nodes", nodes)
        .option("es.resource", index)
        .option("es.mapping.id", id_col)
        .mode("append")
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
