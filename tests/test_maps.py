"""Map stack tests on the real warehouse data."""
import os

import numpy as np
import pytest

from dyobav_tpu.interfaces.map_interface import MapInterface
from dyobav_tpu.maps.blob import min_area_rect
from dyobav_tpu.maps.geometric import GeometricMap
from dyobav_tpu.maps.transforms import ScaleOffsetReverseTransform

DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "data",
                        "warehouse_sim_original")
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA_DIR, "mymap.pgm")),
    reason="warehouse data not imported")


def test_min_area_rect_axis_aligned():
    pts = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 2.0], [0.0, 2.0]])
    rect = min_area_rect(pts)
    assert rect.shape == (4, 2)
    assert np.isclose(np.abs(np.cross(rect[1] - rect[0], rect[3] - rect[0])), 8.0)


def test_min_area_rect_rotated():
    # 45°-rotated unit square: min-area rect should have area ~1, not the
    # axis-aligned bounding box's 2.
    pts = np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]])
    rect = min_area_rect(pts)
    area = np.abs(np.cross(rect[1] - rect[0], rect[3] - rect[0]))
    assert area == pytest.approx(2.0, rel=1e-6)  # side sqrt2 x sqrt2


def test_warehouse_pipeline():
    mi = MapInterface(DATA_DIR)
    occ = mi.get_occ_map_from_pgm("mymap.pgm", 120, inversed_pixel=True)
    assert occ.width == 330 and occ.height == 293
    geo = mi.cvt_occ2geo(occ, inflate_margin=0.5 + 0.2)
    assert len(geo.obstacle_list) > 30          # ~55 shelf/post blobs
    assert len(geo.processed_obstacle_list) == len(geo.obstacle_list)
    # Inflated obstacles strictly contain the originals (area grows) —
    # including degenerate 1-px-wide blobs, which must become proper rects.
    area = lambda p: 0.5 * abs(np.sum(p[:, 0] * np.roll(p[:, 1], -1)
                                      - np.roll(p[:, 0], -1) * p[:, 1]))
    for orig, infl in zip(geo.obstacle_list, geo.processed_obstacle_list):
        assert area(np.array(infl)) > area(np.array(orig))
        assert area(np.array(infl)) > 0.1

    graph = mi.get_graph_from_json("mygraph.json")
    assert len(graph.nodes) == 32
    assert graph.get_node_coord(16) == (235, 120)

    # Coordinate conversion to world frame (main_base.py:101-103 semantics).
    ct = ScaleOffsetReverseTransform(scale=0.1, offsetx_after=-15,
                                     offsety_after=-15, y_reverse=True,
                                     y_max_before=293)
    geo.coords_cvt(ct)
    b = np.array(geo.boundary_coords)
    assert b[:, 0].min() == pytest.approx(-15.0)
    assert b[:, 0].max() == pytest.approx(-15.0 + 33.0)


def test_transform_roundtrip():
    ct = ScaleOffsetReverseTransform(scale=0.1, offsetx_after=-15,
                                     offsety_after=-15, y_reverse=True,
                                     y_max_before=293)
    p = [160.0, 120.0, 0.7]
    world = ct(p)
    back = ct(world, forward=False)
    np.testing.assert_allclose(back[:2], p[:2], atol=1e-9)
    assert world[2] == p[2]  # heading untouched

    arr = ct.cvt_coords(np.array([0.0, 330.0]), np.array([0.0, 293.0]))
    np.testing.assert_allclose(arr[0], [-15.0, -15.0 + 29.3], atol=1e-9)


def test_geometric_rasterize():
    geo = GeometricMap([(0, 0), (10, 0), (10, 10), (0, 10)],
                       [[(4, 4), (6, 4), (6, 6), (4, 6)]], inflate_margin=0.5)
    grid = geo.get_occupancy_map(cell_size=0.5)
    H, W = grid.shape
    assert grid[H // 2, W // 2] == 0        # obstacle center occupied
    assert grid[1, 1] == 255                # corner free
