"""Preset synthetic maps for tests and demos.

The counterpart of the reference's `basic_map/preset_maps/`
(`test_maps.py`: six synthetic test maps + a dynamic variant;
`scene_maps.py`: FTD/crosswalk/crossing scenes).  Each factory returns
(boundary_coords, obstacle_list) ready for `GeometricMap`.
"""
from __future__ import annotations

import math
from typing import List, Tuple

MapSpec = Tuple[List[tuple], List[List[tuple]]]


def empty_map(width: float = 10.0, height: float = 10.0) -> MapSpec:
    return ([(0, 0), (width, 0), (width, height), (0, height)], [])


def single_block(width: float = 10.0, height: float = 10.0) -> MapSpec:
    b, _ = empty_map(width, height)
    cx, cy = width / 2, height / 2
    return b, [[(cx - 1, cy - 1), (cx + 1, cy - 1),
                (cx + 1, cy + 1), (cx - 1, cy + 1)]]


def corridor(width: float = 12.0, height: float = 6.0,
             gap: float = 2.0) -> MapSpec:
    """Two blocks leaving a central corridor of the given gap."""
    b, _ = empty_map(width, height)
    y0 = (height - gap) / 2
    y1 = (height + gap) / 2
    return b, [
        [(4.0, 0.5), (8.0, 0.5), (8.0, y0), (4.0, y0)],
        [(4.0, y1), (8.0, y1), (8.0, height - 0.5), (4.0, height - 0.5)],
    ]


def slalom(width: float = 16.0, height: float = 8.0) -> MapSpec:
    b, _ = empty_map(width, height)
    obs = []
    for i, x in enumerate([4.0, 8.0, 12.0]):
        if i % 2 == 0:
            obs.append([(x - 0.6, 0.5), (x + 0.6, 0.5),
                        (x + 0.6, height * 0.6), (x - 0.6, height * 0.6)])
        else:
            obs.append([(x - 0.6, height * 0.4), (x + 0.6, height * 0.4),
                        (x + 0.6, height - 0.5), (x - 0.6, height - 0.5)])
    return b, obs


def crossing(width: float = 12.0, height: float = 12.0,
             road: float = 3.0) -> MapSpec:
    """Four corner blocks forming a crossing (scene_maps-style)."""
    b, _ = empty_map(width, height)
    m = (width - road) / 2
    obs = []
    for x0, y0 in [(0, 0), (width - m, 0), (0, height - m),
                   (width - m, height - m)]:
        obs.append([(x0, y0), (x0 + m, y0), (x0 + m, y0 + m), (x0, y0 + m)])
    return b, obs


def rotated_block(width: float = 10.0, height: float = 10.0,
                  angle: float = math.pi / 6) -> MapSpec:
    b, _ = empty_map(width, height)
    cx, cy = width / 2, height / 2
    c, s = math.cos(angle), math.sin(angle)
    corners = [(-1.2, -0.8), (1.2, -0.8), (1.2, 0.8), (-1.2, 0.8)]
    poly = [(cx + c * x - s * y, cy + s * x + c * y) for x, y in corners]
    return b, [poly]


PRESETS = {
    "empty": empty_map,
    "single_block": single_block,
    "corridor": corridor,
    "slalom": slalom,
    "crossing": crossing,
    "rotated_block": rotated_block,
}


def get_preset(name: str, **kwargs) -> MapSpec:
    if name not in PRESETS:
        raise KeyError(f"Unknown preset map {name!r}; have {sorted(PRESETS)}")
    return PRESETS[name](**kwargs)
