"""Native map-compiler parity tests (C++ vs numpy implementations)."""
import numpy as np
import pytest

from dyobav_tpu import native
from dyobav_tpu.maps.blob import get_bounding_polygons
from dyobav_tpu.maps.pgm import process_map_image
from dyobav_tpu.utils.geometry import (inflate_convex_polygon,
                                       polygon_halfspace_representation)

lib = native.load_map_compiler()
pytestmark = pytest.mark.skipif(lib is None, reason="native lib not built")


def test_process_map_parity():
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (40, 50)).astype(np.uint8)
    want = process_map_image(raw, inversed_pixel=True)
    got = native.process_map(raw, inversed=True)
    np.testing.assert_array_equal(got, want)


def test_extract_obstacles_parity():
    img = np.zeros((60, 80), np.uint8)
    img[10:20, 10:30] = 255      # rect blob
    img[35:55, 50:60] = 255      # second blob
    img[40, 5] = 255             # single pixel (below min_pixels)
    got = native.extract_obstacles(img, threshold=120, min_pixels=2)
    want = get_bounding_polygons(img > 120, min_pixels=2)
    assert len(got) == len(want) == 2

    def area(p):
        x, y = p[:, 0], p[:, 1]
        return 0.5 * abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))

    got_areas = sorted(area(p) for p in got)
    want_areas = sorted(area(p) for p in want)
    np.testing.assert_allclose(got_areas, want_areas, rtol=1e-9)


def test_inflate_parity():
    square = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])
    got = native.inflate_polygon(square, 0.5)
    want = inflate_convex_polygon(square, 0.5)
    # Same vertex set (order/offset may differ).
    got_s = sorted(map(tuple, np.round(got, 9)))
    want_s = sorted(map(tuple, np.round(want, 9)))
    assert got_s == want_s


def test_halfspaces_parity():
    poly = np.array([[0.0, 0.0], [3.0, 0.0], [3.0, 2.0], [0.0, 2.0]])
    got = native.halfspaces(poly)
    want = polygon_halfspace_representation(poly)
    for arr_g, arr_w in zip(got, want):
        np.testing.assert_allclose(sorted(arr_g), sorted(arr_w), atol=1e-9)
    # Interior residual == 1 at centroid for both.
    b, a0, a1 = got
    res = np.array(b) - np.array(a0) * 1.5 - np.array(a1) * 1.0
    np.testing.assert_allclose(res, 1.0, atol=1e-9)
