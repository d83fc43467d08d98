"""Bucketed tables: shuffle-free co-located joins (SURVEY §2/§4 scale note).

At 100 TB the repeated join key (url / doc_id) should be bucketed at write
time so every subsequent join/aggregation on it is exchange-free: Spark's
bucketing stores HashPartitioning metadata in the catalog, and the planner
drops the Exchange when both sides are bucketed on the join key with
compatible bucket counts.

This is the storage-layout complement to the broadcast joins used for
dimension tables — use bucketing when BOTH sides are fact-scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 64,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (optionally sorted) managed table; sorting
    within buckets additionally removes the Sort from sort-merge joins."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two bucketed tables on their bucket column — planner emits a
    SortMergeJoin with NO Exchange on either side (asserted in
    tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
