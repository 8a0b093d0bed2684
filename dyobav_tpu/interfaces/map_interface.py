"""Map IO adapter: raw files → map objects (L4).

Mirrors `interfaces/map_interface.MapInterface` (map_interface.py:16-42).
"""
from __future__ import annotations

import os

from ..maps.geometric import GeometricMap
from ..maps.graph import NetGraph
from ..maps.occupancy import OccupancyMap
from ..maps.pgm import process_map_image, read_pgm


class MapInterface:
    def __init__(self, raw_map_dir: str, use_native: bool = True):
        """raw_map_dir: directory holding the map files (absolute, or
        relative to the current working directory).  When the C++
        map-compiler library is built (`native/build.sh`), the
        threshold/border pass runs natively; numpy otherwise."""
        self.raw_map_dir = raw_map_dir
        self.use_native = use_native

    def get_occ_map_from_pgm(self, pgm_fname: str, occupancy_threshold: int,
                             inversed_pixel: bool = False) -> OccupancyMap:
        image = read_pgm(os.path.join(self.raw_map_dir, pgm_fname))
        processed = None
        if self.use_native:
            from .. import native
            processed = native.process_map(image, inversed=inversed_pixel)
        if processed is None:
            processed = process_map_image(image, inversed_pixel=inversed_pixel)
        return OccupancyMap(processed, occupancy_threshold)

    def cvt_occ2geo(self, occ_map: OccupancyMap, inflate_margin: float) -> GeometricMap:
        boundary, obstacles = occ_map.get_geometric_map()
        return GeometricMap(boundary, obstacles, inflate_margin=inflate_margin)

    def get_graph_from_json(self, json_fname: str) -> NetGraph:
        return NetGraph.load_from_json(os.path.join(self.raw_map_dir, json_fname))
