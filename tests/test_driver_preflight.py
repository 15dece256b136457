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
