"""Driver-harness pre-flight: replicate the DRIVER's comparison path
over every registry query, so "green locally" cannot diverge from
"green for the driver" again.

Round 1 lesson: the local differential canonicalized list cells to
tuples *before* row-sorting, but the driver's comparator sorts the raw
pandas frame first — so `agg_percentiles_approx`'s ArrayType column
passed locally and crashed the driver ("unhashable type: 'list'").
This test applies the driver's order of operations to all queries,
including the rows-only ones the oracle differential skips:

  1. ``toPandas()`` the query result,
  2. column-name sort, then ``sort_values`` over ALL columns on the
     RAW frame (crashes on list/dict/ndarray cells, like the driver),
  3. hash every cell (``pd.util.hash_pandas_object``, the strictest
     scalar-cell check pandas offers).

Any query whose result schema would crash the driver's comparator
fails here first.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pandas as pd
import pytest

from big_data_final_project_spark.registry import catalog

ALL_QUERIES = sorted(catalog())
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_artifacts_fresh():
    """VERDICT r6 #1: the staleness guard must be unskippable. This
    test shells out to tools/check_artifacts.py, so `pytest tests/`
    (run by the driver and the judge every round) fails whenever the
    committed CORRECTNESS_SWEEP.json was generated against different
    engine-source bytes than the tree being tested. Mid-round, while
    query code is being edited, this test is EXPECTED to go red — it
    goes green again only after the sweep is regenerated, which is
    exactly the close-out discipline it enforces."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_artifacts.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"artifact staleness guard failed:\n{proc.stdout}{proc.stderr}"
    )


def test_catalog_import_runs_zero_spark_jobs():
    """VERDICT r7 #8: at 442 queries, catalog import + registration is
    part of every bench/driver start — it must stay PURE (decorator
    bookkeeping only). A fresh interpreter builds a SparkSession,
    snapshots the job counter, imports the registry and builds the
    full catalog, and asserts not one Spark job ran (also guards
    against an import-time .collect()/.count() sneaking into module
    scope of any query module, which would execute at import against
    whatever sf_dir a later call passes)."""
    code = """
import os
os.environ["SPARK_GRAFT_CPUS"] = "2"
from big_data_final_project_spark.session import get_spark
spark = get_spark(shuffle_partitions=2)
tracker = spark.sparkContext.statusTracker()
before = len(tracker.getJobIdsForGroup(None))
from big_data_final_project_spark.registry import catalog
reg = catalog()
assert len(reg) > 400, f"catalog unexpectedly small: {len(reg)}"
after = len(tracker.getJobIdsForGroup(None))
assert after == before, f"catalog() ran {after - before} Spark job(s)"
print("ZERO_JOBS_OK", len(reg))
"""
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    assert proc.returncode == 0 and "ZERO_JOBS_OK" in proc.stdout, (
        f"import-laziness check failed:\n{proc.stdout}\n{proc.stderr[-2000:]}"
    )


def driver_canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """The driver's canonicalization order: sort raw cells first."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf.columns):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_driver_comparator_safe(spark, sf_dir, name):
    q = catalog()[name]
    pdf = q.fn(spark, sf_dir).toPandas()
    # Raw-frame sort: raises TypeError on unhashable cells (driver's
    # exact failure mode in round 1).
    canon = driver_canon(pdf)
    # Cell hashing: every value the driver would hash must hash.
    pd.util.hash_pandas_object(canon.astype(str), index=False)
    # Defense in depth: no top-level container cells at all.
    for c in canon.columns:
        s = canon[c]
        if s.dtype == object:
            bad = s.map(
                lambda v: isinstance(v, (list, dict, set))
                or (hasattr(v, "tolist") and not isinstance(v, (str, bytes)))
            )
            assert not bad.any(), (
                f"{name}.{c}: container-valued cell would crash the "
                f"driver comparator (e.g. {s[bad.idxmax()]!r})"
            )


def test_coverage_totals_fresh():
    """COVERAGE.md's totals line is generated from the registry
    (VERDICT r10 #4) — fail the suite if it drifts from catalog()."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ),
    )
    from tools.gen_coverage_totals import totals_block

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "COVERAGE.md",
    )
    with open(path) as fh:
        text = fh.read()
    expected = totals_block().strip()
    assert expected in text, (
        "COVERAGE.md totals stale — run python tools/gen_coverage_totals.py"
        f" (expected: {expected!r})"
    )
