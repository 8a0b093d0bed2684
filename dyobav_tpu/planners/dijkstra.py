"""Graph path planning: Dijkstra + Yen's k-shortest paths.

Mirrors `pkg_path_plan/path_plan_graph/dijkstra.DijkstraPathPlanner`
(dijkstra.py:8-120): k-shortest simple paths on a weighted (di)graph via
Yen's algorithm with spur-node edge removal, built on networkx Dijkstra.
"""
from __future__ import annotations

from heapq import heappop, heappush
from typing import Any, List, Tuple

import networkx as nx


class DijkstraPathPlanner:
    def __init__(self, graph: nx.Graph):
        self.G = graph

    def _path_length(self, G: nx.Graph, path_nodes: list,
                     weight_key: str = "weight") -> float:
        length = 0.0
        for u, v in zip(path_nodes[:-1], path_nodes[1:]):
            length += G.edges[u, v][weight_key]
        return length

    def _k_shortest(self, source, target, k: int = 1,
                    weight_key: str = "weight"
                    ) -> Tuple[List[float], List[List[Any]]]:
        if source == target:
            return [0.0], [[source]]
        G = self.G.copy()
        length, path = nx.single_source_dijkstra(G, source, target,
                                                 weight=weight_key)
        lengths, paths = [length], [path]
        candidates: list = []
        counter = 0
        for _ in range(1, k):
            prev = paths[-1]
            for j in range(len(prev) - 1):
                spur_node = prev[j]
                root_path = prev[:j + 1]
                removed = []
                for p in paths:
                    if len(p) > j and root_path == p[:j + 1] and G.has_edge(p[j], p[j + 1]):
                        attr = dict(G.edges[p[j], p[j + 1]])
                        G.remove_edge(p[j], p[j + 1])
                        removed.append((p[j], p[j + 1], attr))
                for node in root_path[:-1]:
                    for u, v, attr in list(G.edges(node, data=True)):
                        G.remove_edge(u, v)
                        removed.append((u, v, dict(attr)))
                try:
                    spur_len, spur_path = nx.single_source_dijkstra(
                        G, spur_node, target, weight=weight_key)
                    total = root_path[:-1] + spur_path
                    total_len = self._path_length(self.G, root_path,
                                                  weight_key) + spur_len
                    heappush(candidates, (total_len, counter, total))
                    counter += 1
                except (nx.NetworkXNoPath, KeyError):
                    pass
                finally:
                    for u, v, attr in removed:
                        G.add_edge(u, v, **attr)
            if not candidates:
                break
            total_len, _, total = heappop(candidates)
            if total not in paths:
                lengths.append(total_len)
                paths.append(total)
        return lengths, paths

    def k_shortest_paths(self, source, target, k: int = 1,
                         weight_key: str = "weight",
                         position_key: str = "position",
                         get_coords: bool = True
                         ) -> Tuple[List[float], List[list]]:
        lengths, raw_paths = self._k_shortest(source, target, k, weight_key)
        if not get_coords:
            return lengths, raw_paths
        paths = []
        for raw in raw_paths:
            path = []
            for node_id in raw:
                x, y = self.G.nodes[node_id][position_key][:2]
                path.append((x, y, node_id))
            paths.append(path)
        return lengths, paths
