"""Fused spatial enrichment == composed operators, row for row."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ot_spark import area_index, parse, raster, spatial_join
from ot_spark.enrich_fused import spatial_enrich
from ot_spark.s2h3 import with_tiles
from ot_spark.synth import gen_admin_polygons


@pytest.fixture(scope="module")
def indices(spark, fixture_dir):
    idx = area_index.build_area_index(
        [(r["key"], r["name"], r["wkt"]) for r in gen_admin_polygons().to_pylist()]
    )
    ridx = raster.RasterIndex.from_df(
        spark.read.parquet(f"{fixture_dir}/raster_tiles.parquet")
    )
    return idx, ridx


def test_fused_equals_composed(spark, pages, indices):
    idx, ridx = indices
    df = parse.with_coordinates(pages).select("url", "lat", "lon")

    fused = spatial_enrich(df, idx, ridx)
    composed = raster.enrich_with_elevation(
        spatial_join.enrich_with_admin(with_tiles(df), idx), ridx
    )
    cols = ["url", "grid_cell", "admin_key", "raster_id", "elev", "s2_10", "h3_7", "h3_9"]
    a = {r.url: tuple(r) for r in fused.select(cols).collect()}
    b = {r.url: tuple(r) for r in composed.select(cols).collect()}
    assert a == b


def test_fused_skip_col(spark, pages, indices):
    idx, ridx = indices
    df = parse.with_coordinates(pages).select("url", "lat", "lon").withColumn(
        "no_elevation", F.col("url").endswith("1")
    )
    fused = spatial_enrich(df, idx, ridx, skip_col="no_elevation")
    assert fused.where(F.col("no_elevation") & F.col("elev").isNotNull()).count() == 0
    assert fused.where(~F.col("no_elevation") & F.col("elev").isNotNull()).count() > 0
