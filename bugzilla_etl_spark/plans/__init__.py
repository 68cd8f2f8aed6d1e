from bugzilla_etl_spark.plans.catalog import QUERIES, ORACLES, register  # noqa: F401
