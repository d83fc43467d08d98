"""Fused spatial enrichment — ONE Arrow round-trip for all Python work.

The composable operators (spatial_join.enrich_with_admin,
raster.enrich_with_elevation, s2h3.with_tiles) are semantically canonical
but each contributes its own ArrowEvalPython node; chained, the batch
crosses the JVM<->Python boundary three times per row and each node runs
its own per-core Python worker pool (3x oversubscription at local[32] —
measured anti-scaling).

This module composes the same primitives into a single struct-returning
pandas UDF: the JVM side still does everything vectorizable in codegen
(grid cell, single-cell broadcast join, raster routing CASE, skip masks);
Python does only the irreducible numpy work (border PIP refine, pixel
gather, S2/true-H3 encode) in one pass.  Semantics are identical to the
composed operators — tests/test_fused.py asserts equality row-for-row.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType
)

from . import geom
from .area_index import AreaIndex
from .cells import grid_cell
from .raster import (
    ROUTE_JOIN_THRESHOLD, RasterIndex, route_col, route_via_cell_join
)
from .h3x import h3x_cell_ids, h3x_parent_col
from .s2h3 import s2_cell_ids


def spatial_enrich(
    df: DataFrame,
    area_index: AreaIndex,
    raster_index: RasterIndex | None = None,
    s2_level: int = 10,
    h3_resolutions: tuple[int, ...] = (7, 9),
    lat_col: str = "lat",
    lon_col: str = "lon",
    skip_col: str | None = None,
    cell_col: str = "grid_cell",
) -> DataFrame:
    """Adds grid_cell, admin_key, raster_id, elev, s2_<L>, h3_<r> columns."""
    spark = df.sparkSession
    sc = spark.sparkContext

    lat, lon = F.col(lat_col), F.col(lon_col)
    df = df.withColumn(cell_col, grid_cell(lat, lon, area_index.tile_size))

    # single-area cells: broadcast equi-join, no geometry work (area.rs:391)
    single = area_index.single_cells
    if single:
        single_df = spark.createDataFrame(
            list(single.items()), f"{cell_col} long, __single_key string"
        )
        df = df.join(F.broadcast(single_df), cell_col, "left")
    else:
        df = df.withColumn("__single_key", F.lit(None).cast("string"))

    border_cells = area_index.border_cells
    border_payload = {
        c: [(area_index.id_to_key[aid], mp) for aid, mp in area_index.border[c]]
        for c in border_cells
    }
    grids = raster_index.grids() if raster_index is not None else {}
    bc = sc.broadcast((border_payload, grids))

    # JVM-side masks: NULL border-cell for non-border rows, NULL raster for
    # skip-flagged rows — Python loops only touch relevant rows.  Both masks
    # get the same scale fallbacks as the canonical operators: planet-scale
    # border sets (>1000 cells) would inline ~10^5 literals into the plan
    # (spatial_join.py's broadcast-membership path), and deep route CASE
    # chains blow codegen past ROUTE_JOIN_THRESHOLD tiles (raster.py's
    # cell-join path).
    drop_cols = ["__single_key", "__e"]
    if border_cells:
        if len(border_cells) <= 1000:
            is_border = F.col(cell_col).isin([int(c) for c in border_cells])
        else:
            border_df = spark.createDataFrame(
                [(int(c), True) for c in border_cells],
                f"{cell_col} long, __is_border boolean",
            )
            df = df.join(F.broadcast(border_df), cell_col, "left")
            is_border = F.coalesce(F.col("__is_border"), F.lit(False))
            drop_cols.append("__is_border")
        border_cell = F.when(is_border, F.col(cell_col))
    else:
        border_cell = F.lit(None).cast("long")
    if raster_index is not None:
        if len(raster_index.tiles) <= ROUTE_JOIN_THRESHOLD:
            df = df.withColumn("raster_id", route_col(raster_index, lat, lon))
        else:
            df = route_via_cell_join(
                df, raster_index, lat_col, lon_col, "raster_id"
            )
        if skip_col is not None:
            df = df.withColumn(
                "raster_id",
                F.when(
                    ~F.coalesce(F.col(skip_col), F.lit(False)),
                    F.col("raster_id"),
                ),
            )
    else:
        df = df.withColumn("raster_id", F.lit(None).cast("string"))

    fields = [
        StructField("border_key", StringType()),
        StructField("elev", DoubleType()),
        StructField(f"s2_{s2_level}", LongType()),
    ] + [StructField(f"h3_{max(h3_resolutions)}", LongType())]
    schema = StructType(fields)
    finest_res = max(h3_resolutions)

    @F.pandas_udf(schema)
    def enrich(
        it: Iterator[tuple[pd.Series, pd.Series, pd.Series, pd.Series]],
    ) -> Iterator[pd.DataFrame]:
        borders, rgrids = bc.value
        for cell_s, rid_s, lon_s, lat_s in it:
            n = len(cell_s)
            lon_np = lon_s.to_numpy(dtype=np.float64, na_value=np.nan)
            lat_np = lat_s.to_numpy(dtype=np.float64, na_value=np.nan)
            out: dict[str, pd.Series] = {}

            # --- border PIP refine (only rows with non-null masked cell)
            bkey = pd.Series([None] * n, dtype=object)
            cells_np = cell_s.to_numpy()
            for cell in pd.unique(cell_s.dropna()):
                cands = borders.get(int(cell))
                if not cands:
                    continue
                m = cells_np == cell
                lo, la = lon_np[m], lat_np[m]
                hits: list[list[str]] = [[] for _ in range(int(m.sum()))]
                for key, mp in cands:
                    hit = geom.points_intersect_mp(lo, la, mp)
                    for j in np.flatnonzero(hit):
                        hits[j].append(key)
                bkey.iloc[np.flatnonzero(m)] = [
                    ",".join(h) if h else None for h in hits
                ]
            out["border_key"] = bkey

            # --- raster pixel gather (geotiff.rs:36-60 affine math)
            elev = np.full(n, np.nan)
            rids = rid_s.to_numpy(dtype=object)
            for r in pd.unique(rid_s.dropna()):
                g = rgrids.get(r)
                if g is None:
                    continue
                m = rids == r
                px = np.floor((lon_np[m] - g["min_lon"]) / g["pixel_w"]).astype(np.int64)
                py = np.floor((g["max_lat"] - lat_np[m]) / g["pixel_h"]).astype(np.int64)
                px = np.clip(px, 0, g["width"] - 1)
                py = np.clip(py, 0, g["height"] - 1)
                vals = g["grid"][py, px]
                elev[m] = np.where(vals == g["nodata"], np.nan, vals)
            out["elev"] = pd.Series(elev)

            # --- tile encodes
            ok = ~(np.isnan(lat_np) | np.isnan(lon_np))
            s2 = np.zeros(n, dtype=np.int64)
            if ok.any():
                s2[ok] = s2_cell_ids(lat_np[ok], lon_np[ok], s2_level)
            ser = pd.Series(s2, dtype="Int64")
            ser[~ok] = pd.NA
            out[f"s2_{s2_level}"] = ser
            # TRUE-GEOMETRY H3 (round 6: retires the last h3ish use in
            # the headline path): ONLY the finest resolution crosses the
            # Arrow boundary — coarser resolutions are derived JVM-side
            # by the parent bit-truncation (h3x_parent_col), saving one
            # full Int64 column per extra resolution in the transfer
            hf = np.zeros(n, dtype=np.int64)
            if ok.any():
                hf[ok] = h3x_cell_ids(lat_np[ok], lon_np[ok], finest_res)
            hs = pd.Series(hf, dtype="Int64")
            hs[~ok] = pd.NA
            out[f"h3_{finest_res}"] = hs
            yield pd.DataFrame(out)

    # nondeterministic marker: a downstream projection of a SUBSET of __e
    # fields lets column pruning clone the UDF once per field otherwise
    enrich_nd = enrich.asNondeterministic()
    df = df.withColumn(
        "__e", enrich_nd(border_cell, F.col("raster_id"), lon, lat)
    )
    df = df.withColumn(
        "admin_key", F.coalesce("__single_key", F.col("__e.border_key"))
    ).withColumn("elev", F.round(F.col("__e.elev"), 2))
    if skip_col is not None:
        df = df.withColumn(
            "elev",
            F.when(~F.coalesce(F.col(skip_col), F.lit(False)), F.col("elev")),
        )
    for f_ in fields[2:]:
        df = df.withColumn(f_.name, F.col(f"__e.{f_.name}"))
    for r in sorted(h3_resolutions):
        if r != finest_res:
            df = df.withColumn(
                f"h3_{r}", h3x_parent_col(F.col(f"h3_{finest_res}"), r)
            )
    return df.drop(*drop_cols)
