"""Oracle-differential tests: every oracle-paired query in the registry
must match DuckDB exactly (SURVEY.md §5.1). Runs at sf0.001 by default
(SPARK_GRAFT_TEST_SF_DIR overrides, e.g. the driver-scale sf0.01)."""

from __future__ import annotations

import pytest

from big_data_final_project_spark.registry import catalog

from .oracle_utils import run_differential

ORACLE_QUERIES = sorted(n for n, q in catalog().items() if q.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_matches_oracle(spark, sf_dir, name):
    problems = run_differential(spark, sf_dir, name)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_rows_only_queries_run(spark, sf_dir):
    """Queries without an oracle still must run and return a schema."""
    for name, q in catalog().items():
        if q.oracle is None:
            df = q.fn(spark, sf_dir)
            assert df.columns, name
            assert df.count() >= 0, name
