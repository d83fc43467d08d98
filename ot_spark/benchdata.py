"""Spark-native deterministic pages generator for benchmarks.

``spark.range(n)`` -> full pages rows (url/text with embedded coordinates,
attrs map) computed by pure Column arithmetic — no driver-side data, no I/O,
deterministic for a given n, and it scales to any row count (the same
generator shape would produce the 10^9-row bench table on a cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pagesview import attrs_col, lat_col, lon_col

# bump when the generated schema/content changes — bench.py keys its cached
# input path on this so a stale file from an older generator is never reused
GEN_VERSION = 1


def pages_range_df(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """n synthetic pages. Coordinate placement: rows 0-4 (mod 10) embed
    coords in the url path, 5-7 in the text body, 8-9 have none — the same
    mix the parquet fixture generator uses (ot_spark.synth)."""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism * 2
    df = spark.range(0, n, 1, partitions).withColumnRenamed("id", "doc_id")
    lat = lat_col()
    lon = lon_col()
    mode = F.col("doc_id") % 10
    host = F.format_string("site-%d.example.org", F.col("doc_id") % 20)
    geo_url = F.format_string(
        "https://%s/geo/%.7f,%.7f/p%d", host, lat, lon, F.col("doc_id")
    )
    plain_url = F.format_string("https://%s/page/p%d", host, F.col("doc_id"))
    base_text = F.format_string(
        "crawl body %d spark grid tile raster page filter enrich", F.col("doc_id")
    )
    geo_text = F.format_string("%s coords: %.7f, %.7f", base_text, lat, lon)
    return df.select(
        "doc_id",
        F.when(mode <= 4, geo_url).otherwise(plain_url).alias("url"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=F.col("doc_id") % 86400)).alias("warc_ts"),
        F.encode(F.format_string("<html><body>%d</body></html>", F.col("doc_id")), "UTF-8").alias("html"),
        F.when((mode >= 5) & (mode <= 7), geo_text).otherwise(base_text).alias("text"),
        F.element_at(
            F.array(*[F.lit(x) for x in ["en", "de", "nl", "fr", "es", "it", "pt", "pl"]]),
            (F.col("doc_id") % 8 + 1).cast("int"),
        ).alias("lang"),
        attrs_col().alias("attrs"),
    )
