"""Derived relations: the TPC-H ``partsupp`` table, synthesized
deterministically from ``part`` × ``supplier``.

The driver's test schema ships 8 of the 9 TPC-H tables — no
``partsupp`` — which left q2/q9/q11/q20 unreachable.  Those four are
the remaining JOIN/AGG shapes (correlated min-cost subquery, 6-way
profit snowflake, scalar-subquery HAVING, nested semi-join chain),
so we derive the missing relation with the same spirit as dbgen:
each part gets exactly ``SUPP_PER_PART`` (4) suppliers, spread over
the supplier key space by a pure-integer formula computed identically
by the Spark plan and the DuckDB oracle (`PARTSUPP_CTE`).  The
correctness gate therefore still checks the QUERY plan — the input
relation is bit-identical on both engines by construction.

Keys here are 0-based (driver data), so the dbgen formula
``((ps_partkey + i*(S/4 + (ps_partkey-1)/S)) % S) + 1`` is adapted:
the per-part offset ``p div S`` moves OUT of the ``i``-multiplied
term.  dbgen assumes S ≥ 10 000 where ``S/4 + ...`` can never be a
multiple of S; at test scale S is 10/100/1000, and an ``i``-stride
that hits ``S`` would collapse a part's 4 suppliers into one.  With
the constant stride ``S div 4`` the four keys are distinct at every
S ≥ 5 (k·(S div 4) mod S ≠ 0 for k = 1..3).

availqty/supplycost are deterministic integer hashes of the key pair
(dbgen draws them from seeded RNG streams — any fixed pseudo-random
assignment preserves the queries' selectivity character):

    ps_availqty   = (ps_partkey·37 + ps_suppkey·71)  mod 9999 + 1
    ps_supplycost = ((ps_partkey·13 + ps_suppkey·101) mod 99900
                     + 100) / 100.0          -- 1.00 .. 1000.99

Scale: partsupp is 4×|part| — a FACT-class relation at 100-TB TPC-H
(0.8 B rows at SF 1000), so downstream queries treat it under the
same no-broadcast-hint policy as lineitem/orders (SCALING.md round-6
hint policy).  The derivation itself is embarrassingly parallel: a
generator (explode) over the part scan plus one 1-row broadcast
scalar (the supplier count) — no shuffle, no skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bugzilla_etl_spark.sources.tables import load_table

SUPP_PER_PART = 4

# DuckDB mirror — compose as f"WITH {PARTSUPP_CTE}, ..." in oracles.
# Integer ops only until the final /100.0, so both engines compute
# the exact same doubles.
PARTSUPP_CTE = """
    _s AS (SELECT CAST(count(*) AS BIGINT) AS s FROM supplier),
    _ps0 AS (
      SELECT CAST(p_partkey AS BIGINT) AS ps_partkey,
             (CAST(p_partkey AS BIGINT)
              + CAST(p_partkey AS BIGINT) // s
              + i * (s // 4)) % s AS ps_suppkey
      FROM part, _s, (SELECT unnest([0, 1, 2, 3]) AS i) _gen
    ),
    partsupp AS (
      SELECT ps_partkey, ps_suppkey,
             (ps_partkey * 37 + ps_suppkey * 71) % 9999 + 1
                 AS ps_availqty,
             ((ps_partkey * 13 + ps_suppkey * 101) % 99900 + 100)
                 / 100.0 AS ps_supplycost
      FROM _ps0
    )
"""


def partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived ``partsupp`` relation (see module docstring).

    Plan shape: part scan -> generate(4 rows/part) -> project, with
    the supplier count folded in as a 1-row broadcast scalar
    aggregate (BroadcastNestedLoopJoin of one row — the catalog's
    standard scalar-subquery shape, exempt from the hint policy's
    raw-table rule because a scalar aggregate is one row at ANY SF).
    """
    pk = F.col("p_partkey").cast("long")
    part = load_table(spark, sf_dir, "part").select(pk.alias("ps_partkey"))
    sup_n = (
        load_table(spark, sf_dir, "supplier")
        .agg(F.count(F.lit(1)).cast("long").alias("_s"))
    )
    gen = part.crossJoin(F.broadcast(sup_n)).select(
        "ps_partkey",
        "_s",
        F.explode(
            F.array(*[F.lit(i) for i in range(SUPP_PER_PART)])
        ).alias("_i"),
    )
    keyed = gen.select(
        "ps_partkey",
        (
            (
                F.col("ps_partkey")
                + F.expr("ps_partkey div _s")
                + F.col("_i") * F.expr("_s div 4")
            )
            % F.col("_s")
        ).alias("ps_suppkey"),
    )
    return keyed.select(
        "ps_partkey",
        "ps_suppkey",
        (
            (F.col("ps_partkey") * 37 + F.col("ps_suppkey") * 71) % 9999 + 1
        ).alias("ps_availqty"),
        (
            (
                (F.col("ps_partkey") * 13 + F.col("ps_suppkey") * 101)
                % 99900
                + 100
            )
            / F.lit(100.0)
        ).alias("ps_supplycost"),
    )
