"""Navigation graph over networkx (node positions + helpers).

Mirrors `basic_map/graph_basic.NetGraph` (graph_basic.py:11-77).
"""
from __future__ import annotations

import json
import math
import random
from typing import Any, Dict, List

import networkx as nx


class NetGraph(nx.Graph):
    POSITION_KEY = "position"

    def __init__(self, node_dict: Dict[Any, tuple] | None = None,
                 edge_list: List[tuple] | None = None, **kwargs):
        super().__init__(**kwargs)
        if node_dict:
            for node_id, pos in node_dict.items():
                self.add_node(int(node_id), **{self.POSITION_KEY: tuple(pos)})
        if edge_list:
            self.add_edges_from(edge_list)

    @classmethod
    def load_from_json(cls, json_path: str) -> "NetGraph":
        with open(json_path) as jf:
            map_dict = json.load(jf)
        return cls(map_dict["node_dict"], map_dict["edge_list"])

    def save_to_json(self, json_path: str) -> None:
        payload = {
            "node_dict": {str(n): list(self.get_node_coord(n)) for n in self.nodes},
            "edge_list": [list(e) for e in self.edges],
        }
        with open(json_path, "w") as jf:
            json.dump(payload, jf, indent=2)

    def set_distance_weight(self) -> None:
        for u, v in self.edges():
            x1, y1 = self.nodes[u][self.POSITION_KEY]
            x2, y2 = self.nodes[v][self.POSITION_KEY]
            self[u][v]["weight"] = math.hypot(x1 - x2, y1 - y2)

    def get_node_coord(self, node_id) -> tuple:
        pos = self.nodes[node_id][self.POSITION_KEY]
        return pos[0], pos[1]

    def return_given_nodelist(self, graph_node_ids: list) -> List[tuple]:
        return [self.get_node_coord(i) for i in graph_node_ids]

    def return_random_nodelist(self, start_node_id, num_traversed_nodes: int,
                               rng: random.Random | None = None) -> List[tuple]:
        rng = rng or random
        node_ids = [start_node_id]
        nodelist = [self.get_node_coord(start_node_id)]
        for _ in range(num_traversed_nodes):
            neighbors = [x for x in self.adj[node_ids[-1]] if x not in node_ids]
            if not neighbors:
                return nodelist
            next_id = rng.choice(neighbors)
            node_ids.append(next_id)
            nodelist.append(self.get_node_coord(next_id))
        return nodelist

    def plot_netgraph(self, ax, node_style="x", node_text: bool = True,
                      edge_color="r") -> None:
        for n in self.nodes:
            x, y = self.get_node_coord(n)
            ax.plot(x, y, node_style)
            if node_text:
                ax.text(x, y, str(n))
        pos = nx.get_node_attributes(self, self.POSITION_KEY)
        nx.draw_networkx_edges(self, pos, ax=ax, edge_color=edge_color)
