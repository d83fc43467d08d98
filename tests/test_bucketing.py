"""Bucketed co-located join: zero shuffle exchanges on either side."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from ot_spark import bucketing


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    left = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"), (F.col("id") * 3 % 97).alias("a")
    )
    right = spark.range(0, 5000, 2).select(
        F.col("id").alias("doc_id"), (F.col("id") * 7 % 89).alias("b")
    )
    bucketing.write_bucketed(left, "t_left", "doc_id", 8, sort_col="doc_id")
    bucketing.write_bucketed(right, "t_right", "doc_id", 8, sort_col="doc_id")

    joined = bucketing.colocated_join(spark, "t_left", "t_right", "doc_id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain()
    plan = buf.getvalue()
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles == 0, plan
    assert joined.count() == 2500

    # and an aggregation on the bucket key is exchange-free too
    agg = spark.table("t_left").groupBy("doc_id").agg(F.sum("a"))
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        agg.explain()
    assert buf2.getvalue().count("Exchange") - buf2.getvalue().count(
        "BroadcastExchange"
    ) == 0

    spark.sql("DROP TABLE IF EXISTS t_left")
    spark.sql("DROP TABLE IF EXISTS t_right")
