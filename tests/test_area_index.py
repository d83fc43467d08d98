"""Area index build + probe golden tests.

Mirrors /root/reference/src/area.rs:447-564: same fixture polygons, same
expected assignments, at tile sizes 1.0 and 0.25, including the shared
border giving "SQA,REC" and the grid-edge documented limitation.
"""

from __future__ import annotations

import pytest

from ot_spark import area_index
from ot_spark.synth import gen_admin_polygons

ROWS = [
    (r["key"], r["name"], r["wkt"]) for r in gen_admin_polygons().to_pylist()
]


@pytest.fixture(scope="module", params=[1.0, 0.25])
def idx(request):
    return area_index.build_area_index(ROWS, tile_size=request.param)


GOLDEN = [
    # (lat, lon, expected@ts=1.0, expected@ts=0.25)
    (2.0, 2.0, "SQA", "SQA"),   # Squareland interior
    (2.0, 3.0, "REC", "REC"),   # Rectanglia interior
    # shared border: comma-joined at ts=1.0; at ts=0.25 the point's cell
    # [2.5, 2.75) is only edge-touched by SQA -> single "REC" — the
    # documented border-on-grid-edge limitation (area.rs:494-496)
    (2.0, 2.5, "SQA,REC", "REC"),
    (1.9, 6.5, "TRI", "TRI"),   # Trianglia interior
    (0.5, 0.5, None, None),     # outside all
    (5.0, 5.0, None, None),
    (90.0, 0.0, None, None),    # pole skipped (area.rs:368-370)
    (-90.0, 0.0, None, None),
    (1.5, 1.5, "SQA", "SQA"),   # SQA corner (boundary inclusive)
    (2.4999999, 2.0, "SQA", "SQA"),
    (3.5, 7.5, "EDG", "EDG"),   # Edgeland interior (grid-aligned polygon)
]


def test_probe_golden(idx):
    for lat, lon, want_1, want_025 in GOLDEN:
        want = want_1 if idx.tile_size == 1.0 else want_025
        assert idx.probe(lat, lon) == want, (lat, lon, idx.tile_size)


def test_single_vs_border_cells_at_quarter_tile():
    idx = area_index.build_area_index(ROWS, tile_size=0.25)
    # SQA spans lon/lat 1.5..2.5 — the four cells (1.5..2.25)^2 interior
    # band contains fully-covered single cells
    from ot_spark.cells import grid_cell_py

    c = grid_cell_py(1.8, 1.8, 0.25)
    assert idx.index[c] != area_index.MULTIPLE
    assert idx.single_cells[c] == "SQA"
    # SQA/REC border lies exactly on 0.25-cell edges, so even the border
    # cells are single (the grid-edge limitation); TRI's diagonal hypotenuse
    # genuinely straddles cells -> MULTIPLE
    cb = grid_cell_py(2.4, 6.5, 0.25)
    assert idx.index[cb] == area_index.MULTIPLE
    assert idx.probe(2.4, 6.5) == "TRI"
    assert idx.probe(2.4, 6.7) is None  # same cell, outside the clip


def test_save_load_roundtrip(tmp_path):
    idx = area_index.build_area_index(ROWS, tile_size=1.0)
    p = str(tmp_path / "areas.idx.parquet")
    area_index.save_index(idx, p)
    idx2 = area_index.load_index(p)
    assert idx2.tile_size == idx.tile_size
    assert idx2.index == idx.index
    assert idx2.id_to_key == idx.id_to_key
    assert set(idx2.border) == set(idx.border)
    for lat, lon, want, _ in GOLDEN:
        assert idx2.probe(lat, lon) == want


def test_unsupported_geometry_skipped():
    idx = area_index.build_area_index(
        [("A", "a", "POINT(1 1)"), ("B", "b", ROWS[0][2])]
    )
    # A skipped with warning semantics; B still gets id (ids count loaded rows)
    assert set(idx.id_to_key.values()) == {"B"}
