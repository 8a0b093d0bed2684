"""Path-planning layer tests."""
import numpy as np
import pandas as pd
import pytest

from dyobav_tpu.maps.geometric import GeometricMap
from dyobav_tpu.maps.graph import NetGraph
from dyobav_tpu.planners.dijkstra import DijkstraPathPlanner
from dyobav_tpu.planners.global_plan import GlobalPathPlanner
from dyobav_tpu.planners.paths import PathNode, PathNodeList
from dyobav_tpu.planners.visibility import LocalPathPlanner


def grid_graph():
    #  1 -- 2 -- 3
    #  |         |
    #  4 ------- 5
    g = NetGraph({1: (0, 0), 2: (1, 0), 3: (2, 0), 4: (0, 1), 5: (2, 1)},
                 [(1, 2), (2, 3), (1, 4), (3, 5), (4, 5)])
    g.set_distance_weight()
    return g


def test_dijkstra_shortest():
    planner = DijkstraPathPlanner(grid_graph())
    lengths, paths = planner.k_shortest_paths(1, 5, k=1, get_coords=False)
    assert paths[0] == [1, 4, 5] or lengths[0] == pytest.approx(3.0)
    assert lengths[0] == pytest.approx(3.0)


def test_dijkstra_k_shortest():
    planner = DijkstraPathPlanner(grid_graph())
    lengths, paths = planner.k_shortest_paths(1, 5, k=2, get_coords=False)
    assert len(paths) == 2
    assert lengths[0] <= lengths[1]
    assert paths[0] != paths[1]
    # Second path goes over the top: 1-2-3-5 length 3.
    assert lengths[1] == pytest.approx(3.0)


def test_dijkstra_coords():
    planner = DijkstraPathPlanner(grid_graph())
    _, paths = planner.k_shortest_paths(1, 3, k=1, get_coords=True)
    assert paths[0][0] == (0, 0, 1)
    assert paths[0][-1] == (2, 0, 3)


def test_visibility_planner_detours():
    geo = GeometricMap([(0, 0), (10, 0), (10, 10), (0, 10)],
                       [[(4, 3), (6, 3), (6, 7), (4, 7)]],
                       inflate_margin=0.2)
    planner = LocalPathPlanner(geo)
    path = planner.get_ref_path((1.0, 5.0), (9.0, 5.0))
    pts = np.array([p() for p in path])
    assert tuple(pts[0]) == (1.0, 5.0)
    assert tuple(pts[-1]) == (9.0, 5.0)
    assert len(path) > 2              # must detour around the block
    # No waypoint inside the inflated obstacle x-band at y in (2.8, 7.2).
    for x, y in pts[1:-1]:
        inside = 3.8 < x < 6.2 and 2.8 < y < 7.2
        assert not inside, (x, y)


def test_global_planner_detailed_schedule():
    gpp = GlobalPathPlanner()
    df = pd.DataFrame({"robot_id": [7, 7, 7], "node_id": [1, 2, 3],
                       "ETA": [0.0, 1.0, 2.0]})
    gpp.load_schedule_from_dataframe(df)
    nodes, times = gpp.get_robot_schedule(7, time_offset=0.0)
    assert nodes == [1, 2, 3]
    assert times == [0.0, 1.0, 2.0]


def test_global_planner_rough_schedule():
    gpp = GlobalPathPlanner()
    gpp.load_graph(grid_graph())
    df = pd.DataFrame({"robot_id": [9], "start_node": [1], "end_node": [5],
                       "EDT": [6.0]})
    gpp.load_schedule_from_dataframe(df)
    nodes, times = gpp.get_robot_schedule(9, time_offset=1.0)
    assert nodes[0] == 1 and nodes[-1] == 5
    assert times[0] == pytest.approx(1.0)
    assert times[-1] == pytest.approx(7.0)


def test_path_containers():
    pl = PathNodeList.from_tuples([(0, 0), (1, 2)])
    assert pl.numpy().shape == (2, 2)
    assert pl[1]() == (1.0, 2.0)
    n = PathNode(3, 4, node_id=5)
    assert pl.get_node_coords(5) is None
    pl.append(n)
    assert pl.get_node_coords(5) == (3.0, 4.0)
    assert pl.rescale(2.0)[2]() == (6.0, 8.0)
