"""Bucketed co-located joins (SCALE.md; SURVEY.md §7 M6).

A fact-fact join normally shuffles both sides on the join key every
query. Writing both tables bucketed by that key moves the shuffle to
*write time, once*: Spark records the bucketing in the catalog, and a
join between two tables bucketed by the same key into the same bucket
count plans as a zero-Exchange sort-merge join. At 100 TB this is the
difference between re-shuffling the lakehouse per query and never
shuffling the fact tables at all.

`tests/test_bucketing.py` proves both properties: no Exchange in the
bucketed join plan, and result parity with the shuffled join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a table bucketed (and bucket-sorted) by
    ``bucket_col``. Bucket-local sorting additionally removes the
    per-task sort from later sort-merge joins. ``path`` makes it an
    external table (warehouse.dir is a static config, so tests point
    each table at a temp location instead)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key: Catalyst
    sees matching output partitionings and plans no Exchange."""
    return spark.table(left_table).join(spark.table(right_table), on)
