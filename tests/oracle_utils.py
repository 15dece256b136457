"""Local mirror of the driver's DuckDB differential check.

Runs a registered query's Spark form and its oracle SQL over the same
parquet tables and compares row count, column names, and values
(column-name-sorted, row-order-insensitive, exact) — the same contract
CORRECTNESS_r{N}.json grades, so a pass here predicts a pass there.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from big_data_final_project_spark.data import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None)
        elif s.dtype == object:

            def _cell(v):
                if isinstance(v, dict):
                    return tuple(sorted(v.items()))
                if isinstance(v, (list, tuple)) or (
                    hasattr(v, "tolist") and not isinstance(v, (str, bytes))
                ):
                    return tuple(v)
                return v

            df[c] = s.map(_cell)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("bool")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return list of mismatch descriptions; empty == match."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        return problems
    a, b = _canon(spark_pdf.copy()), _canon(oracle_pdf.copy())
    for c in a.columns:
        sa, sb = a[c], b[c]
        if pd.api.types.is_float_dtype(sa) and pd.api.types.is_float_dtype(sb):
            eq = (sa == sb) | (sa.isna() & sb.isna())
            if not eq.all():
                bad = (~eq).idxmax()
                diff = (sa - sb).abs().max()
                problems.append(
                    f"col {c!r}: {int((~eq).sum())} exact-float mismatches, "
                    f"max abs diff {diff!r}, first at row {bad}: "
                    f"spark={sa[bad]!r} oracle={sb[bad]!r}"
                )
        else:
            ea = sa.astype(str)
            eb = sb.astype(str)
            eq = ea == eb
            if not eq.all():
                bad = (~eq).idxmax()
                problems.append(
                    f"col {c!r}: {int((~eq).sum())} mismatches, first at row {bad}: "
                    f"spark={sa[bad]!r} oracle={sb[bad]!r}"
                )
    return problems


def run_differential(spark, sf_dir: str, name: str) -> list[str]:
    from big_data_final_project_spark.registry import catalog

    q = catalog()[name]
    assert q.oracle is not None, f"{name} has no oracle"
    spark_pdf = q.fn(spark, sf_dir).toPandas()
    con = duck_connection(sf_dir)
    try:
        oracle_pdf = con.execute(q.oracle).fetchdf()
    finally:
        con.close()
    return compare_frames(spark_pdf, oracle_pdf)


def assert_float_finite(x: float) -> bool:
    return x is not None and not math.isnan(x)
