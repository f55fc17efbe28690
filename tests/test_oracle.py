"""Every registered query must hash-match its DuckDB oracle — the local
mirror of the driver's t2 correctness gate."""

import pytest

from user_behavior_analysis_spark import queries as q
from user_behavior_analysis_spark.oracle import compare_query

FLOAT_TOL = 1e-9


@pytest.mark.parametrize("name", sorted(q.QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    res = compare_query(spark, name, sf_dir, float_tol=FLOAT_TOL)
    assert res.ok, str(res)
    if name in q.ORACLES:
        assert res.rows_spark == res.rows_oracle


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert set(entry_mod.oracle_sql()) <= set(entry_mod.queries())
