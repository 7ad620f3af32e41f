"""Every registry query vs. its DuckDB oracle at sf0.001 — the same
differential check the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare


def _registry():
    from etl_mini_spark.queries import ORACLE, QUERIES

    return QUERIES, ORACLE


QUERIES, ORACLE = _registry()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    if name in ORACLE:
        ok, msg = compare(df, ORACLE[name], SF_SMOKE)
        assert ok, f"{name}: {msg}"
    else:
        # rows-only: must execute and produce a stable schema
        n = df.count()
        assert n >= 0
        assert df.columns


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    assert df.count() > 0
    assert "event_id" in df.columns


def test_oracle_keys_subset():
    assert set(ORACLE) <= set(QUERIES)
