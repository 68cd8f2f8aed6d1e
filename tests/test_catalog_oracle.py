"""Catalog-wide oracle parity — the local mirror of the driver's
CORRECTNESS gate.  Every query with an oracle must match DuckDB on
sf0.001; queries without an oracle must at least run and return a
stable schema."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.util import assert_same


def _cases():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    return [(name, fn, oracles.get(name)) for name, fn in sorted(qs.items())]


@pytest.mark.parametrize("name,fn,oracle", _cases(), ids=[c[0] for c in _cases()])
def test_query_matches_oracle(spark, duck, sf_dir, name, fn, oracle):
    sdf = fn(spark, sf_dir)
    if oracle is None:
        rows = sdf.collect()
        assert sdf.columns, f"{name}: empty schema"
        assert rows is not None
    else:
        assert_same(sdf, duck, oracle)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "expires_on" in df.columns and "_id" in df.columns
