from bugzilla_etl_spark.functions.hashing import (  # noqa: F401
    hash64,
    hash64_seeded,
    DUCKDB_HASH64,
    duckdb_hash64,
)
