"""Schedule-driven multi-robot global path planner.

Mirrors `pkg_path_plan/global_path_plan.GlobalPathPlanner`
(global_path_plan.py:9-119): detailed schedules (node_id + ETA per robot)
or rough schedules (start/end node + EDT) resolved through Dijkstra.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import networkx as nx
import pandas as pd

from .dijkstra import DijkstraPathPlanner


class GlobalPathPlanner:
    def __init__(self) -> None:
        self.schedule: pd.DataFrame | None = None
        self.robot_plan_dict: Dict[Any, pd.DataFrame] = {}
        self._robot_ids: list = []
        self.G: nx.Graph | None = None
        self.with_detail = False

    @property
    def robot_ids(self) -> list:
        return self._robot_ids

    def load_schedule_from_dataframe(self, new_schedule: pd.DataFrame):
        if "ETA" in new_schedule.columns:
            self.with_detail = True
        elif "EDT" in new_schedule.columns:
            self.with_detail = False
        else:
            raise ValueError("The schedule should include ETA or EDT.")
        self.schedule = (pd.concat([self.schedule, new_schedule])
                         if self.schedule is not None else new_schedule)
        self._robot_ids = list(self.schedule["robot_id"].unique())
        for robot_id in self._robot_ids:
            plan = self.schedule[self.schedule["robot_id"] == robot_id]
            self.robot_plan_dict[robot_id] = plan.reset_index(drop=True)

    def load_schedule(self, file_path: str, csv_sep: str = ",", header=0):
        self.load_schedule_from_dataframe(
            pd.read_csv(file_path, sep=csv_sep, header=header))

    def load_graph(self, G: nx.Graph):
        self.G = G

    def remove_schedule(self, robot_id: Any):
        self.schedule = self.schedule[self.schedule["robot_id"] != robot_id]
        self._robot_ids = list(self.schedule["robot_id"].unique())
        self.robot_plan_dict.pop(robot_id, None)

    def set_path(self, robot_id: Any, path_node_list: list, time_list=None):
        if time_list is None:
            time_list = [None] * len(path_node_list)
        new_schedule = pd.DataFrame({"robot_id": robot_id,
                                     "node_id": path_node_list,
                                     "ETA": time_list})
        self.remove_schedule(robot_id)
        self.load_schedule_from_dataframe(new_schedule)

    def get_robot_schedule(self, robot_id: Any, time_offset: float = 0.0
                           ) -> Tuple[list, list]:
        if self.with_detail:
            plan = self.robot_plan_dict[robot_id]
            return plan["node_id"].tolist(), plan["ETA"].tolist()
        if self.G is None:
            raise ValueError("The graph is not loaded.")
        plan = self.robot_plan_dict[robot_id]
        source = plan["start_node"].iloc[0]
        target = plan["end_node"].iloc[0]
        edt = plan["EDT"].iloc[0]
        path_nodes, section_lengths = self.get_shortest_path(self.G, source,
                                                             target)
        total = sum(section_lengths) or 1.0
        cumulative = 0.0
        path_times = [time_offset]
        for seg in section_lengths:
            cumulative += seg
            path_times.append(time_offset + cumulative / total * edt)
        return path_nodes, path_times

    @staticmethod
    def get_shortest_path(graph: nx.Graph, source: Any, target: Any,
                          algorithm: str = "dijkstra"):
        if algorithm != "dijkstra":
            raise NotImplementedError(f"Algorithm {algorithm} not implemented.")
        planner = DijkstraPathPlanner(graph)
        _, paths = planner.k_shortest_paths(source, target, k=1,
                                            get_coords=False)
        shortest = paths[0]
        section_lengths = [graph.edges[u, v]["weight"]
                           for u, v in zip(shortest[:-1], shortest[1:])]
        return shortest, section_lengths
