"""Pure-geometry golden tests (mirror /root/reference/src/area.rs:447-564)."""

from __future__ import annotations

import numpy as np
import pytest

from ot_spark import geom

SQA = "POLYGON((1.5 1.5, 1.5 2.5, 2.5 2.5, 2.5 1.5, 1.5 1.5))"
TRI = "MULTIPOLYGON(((5.5 1.5, 7.5 1.5, 6.5 2.5, 5.5 1.5)))"


def test_parse_wkt_polygon():
    mp = geom.parse_wkt(SQA)
    assert len(mp) == 1 and len(mp[0]) == 1
    assert mp[0][0].shape == (4, 2)  # closed ring stored open
    assert geom.mp_bbox(mp) == (1.5, 1.5, 2.5, 2.5)


def test_parse_wkt_multipolygon():
    mp = geom.parse_wkt(TRI)
    assert len(mp) == 1
    assert geom.ring_area(mp[0][0]) == pytest.approx(1.0)


def test_parse_wkt_rejects_other():
    with pytest.raises(ValueError):
        geom.parse_wkt("POINT(1 2)")


def test_point_in_polygon_interior_boundary_outside():
    mp = geom.parse_wkt(SQA)
    lon = np.array([2.0, 2.5, 1.5, 2.0, 3.0, 2.5])
    lat = np.array([2.0, 2.0, 1.5, 2.5, 3.0, 2.5])
    got = geom.points_intersect_mp(lon, lat, mp)
    # interior, edge, corner, edge, outside, corner — boundary inclusive
    assert got.tolist() == [True, True, True, True, False, True]


def test_point_in_triangle():
    mp = geom.parse_wkt(TRI)
    lon = np.array([6.5, 5.5, 6.5, 7.4, 6.5])
    lat = np.array([1.9, 1.5, 2.5, 2.4, 1.5])
    got = geom.points_intersect_mp(lon, lat, mp)
    assert got.tolist() == [True, True, True, False, True]


def test_polygon_with_hole():
    donut = "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
    mp = geom.parse_wkt(donut)
    lon = np.array([5.0, 1.0, 4.0])
    lat = np.array([5.0, 1.0, 5.0])
    got = geom.points_intersect_mp(lon, lat, mp)
    # hole interior excluded; hole boundary still belongs to the polygon
    assert got.tolist() == [False, True, True]


def test_clip_to_box():
    mp = geom.parse_wkt(SQA)
    clipped = geom.clip_mp_to_box(mp, 2.0, 2.0, 3.0, 3.0)
    assert len(clipped) == 1
    assert geom.ring_area(clipped[0][0]) == pytest.approx(0.25)
    assert geom.clip_mp_to_box(mp, 5.0, 5.0, 6.0, 6.0) == []
    # boundary-touch only -> degenerate -> empty (matches GEOS is_empty)
    assert geom.clip_mp_to_box(mp, 2.5, 1.5, 3.5, 2.5) == []


def test_contains_box():
    mp = geom.parse_wkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert geom.mp_contains_box(mp, 1.0, 1.0, 2.0, 2.0)
    assert geom.mp_contains_box(mp, 0.0, 0.0, 4.0, 4.0)  # exact cover
    assert not geom.mp_contains_box(mp, 3.5, 3.5, 4.5, 4.5)


def test_wkt_roundtrip():
    mp = geom.parse_wkt(TRI)
    mp2 = geom.parse_wkt(geom.mp_to_wkt(mp))
    assert np.allclose(mp[0][0], mp2[0][0])
