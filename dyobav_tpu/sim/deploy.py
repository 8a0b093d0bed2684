"""Deployment node: the predict → cluster → control loop behind a message
transport.

The shape of the reference's ROS node (`src/main_ros.py:215-412`, live on
its `ros_version` branch): subscribe robot pose + actor poses, maintain
pedestrian history buffers, run MMP/CGF + MPC each control tick, publish
velocity commands and diagnostics.  rospy does not exist in this
environment, so the node is written against an abstract `Transport`; a ROS
adapter only has to map the four channels onto topics
(amcl_pose/odometry → `robot_pose`, actor poses → `actor_poses`,
cmd_vel ← `cmd_vel`, obstacle polygons ← `viz`).
"""
from __future__ import annotations

import collections
from typing import Callable, Dict, List, Optional, Protocol

import numpy as np


class Transport(Protocol):
    """Minimal pub/sub surface a deployment environment must provide."""

    def subscribe(self, channel: str, callback: Callable[[dict], None]) -> None:
        ...

    def publish(self, channel: str, message: dict) -> None:
        ...


class LocalTransport:
    """In-process transport for tests/simulated deployment."""

    def __init__(self):
        self.subs: Dict[str, List[Callable]] = {}
        self.published: Dict[str, List[dict]] = collections.defaultdict(list)

    def subscribe(self, channel, callback):
        self.subs.setdefault(channel, []).append(callback)

    def publish(self, channel, message):
        self.published[channel].append(message)
        for cb in self.subs.get(channel, []):
            cb(message)


class NavigationNode:
    """Control node: wire a tracker + predictor interface to a transport.

    Mirrors the reference node's loop (main_ros.py:320-405): buffer actor
    histories, predict + cluster, assemble dynamic obstacles, run one MPC
    step, publish the first action as a velocity command.
    """

    def __init__(self, transport: Transport, tracker_interface=None,
                 predictor=None, ref_map=None, n_hor: int = 20,
                 history_len: int = 5, human_size: float = 0.2,
                 scale2nn: float = 1.0, fused_step=None, scenario=None,
                 n_humans: int = 1):
        """Two drive modes:

        * tracker_interface (host-orchestrated): the reference-shaped loop —
          predictor interface + tracker interface called per tick from the
          host (many small device dispatches; ~seconds per tick over a
          tunneled remote TPU).
        * fused_step + scenario (certified-latency): `(step, cold_start)`
          from `sim.batch.build_step_program` plus the static `Scenario`
          tensors; the whole tick is ONE device program — the exact path
          the step-latency bench certifies against the 0.2 s budget.
        """
        if tracker_interface is None and fused_step is None:
            raise ValueError("need tracker_interface or fused_step")
        self.transport = transport
        self.tracker = tracker_interface
        self.predictor = predictor
        self.ref_map = ref_map
        self.n_hor = n_hor
        self.human_size = human_size
        self.scale2nn = scale2nn
        self.robot_pose: Optional[np.ndarray] = None
        self.histories: Dict[str, collections.deque] = {}
        self.history_len = history_len
        self.fused = None
        if fused_step is not None:
            import jax.numpy as jnp
            step, cold = fused_step
            self.fused = {
                "step": step, "cold": cold, "scenario": scenario,
                "n_humans": n_humans,
                "u_warm": None,
                "u_prev": jnp.zeros(2, jnp.float32),
                "ref_idx": jnp.array(0, "int32"),
            }
        transport.subscribe("robot_pose", self._on_robot_pose)
        transport.subscribe("actor_poses", self._on_actor_poses)

    def _on_robot_pose(self, msg: dict):
        self.robot_pose = np.array([msg["x"], msg["y"], msg["theta"]])

    def _on_actor_poses(self, msg: dict):
        for actor_id, (x, y) in msg["poses"].items():
            hist = self.histories.setdefault(
                actor_id, collections.deque(maxlen=self.history_len))
            hist.append([float(x), float(y)])

    def _predict_obstacles(self):
        if not self.histories:
            return None
        mu_list_list = None
        std_list_list = None
        for hist in self.histories.values():
            past = list(hist)
            positions, stds = self.predictor.get_motion_prediction(past)
            if mu_list_list is None:
                mu_list_list = [[p] for p in positions]
                std_list_list = [[s] for s in stds]
            else:
                for t, (p, s) in enumerate(zip(positions, stds)):
                    mu_list_list[t].append(p)
                    std_list_list[t].append(s)
        curr = [list(h)[-1] for h in self.histories.values()]
        mu_list_list.insert(0, curr)
        std_list_list.insert(
            0, [[self.human_size, self.human_size] for _ in curr])
        n_obs = max(len(m) for m in mu_list_list)
        dyn = [[[0, 0, 0, 0, 0, 1]] * (self.n_hor + 1) for _ in range(n_obs)]
        for t, (mus, stds) in enumerate(zip(mu_list_list, std_list_list)):
            for i, (mu, std) in enumerate(zip(mus, stds)):
                dyn[i][t] = [mu[0], mu[1], std[0], std[1], 0, 1]
        return dyn

    def _human_hist_tensor(self):
        """(history_len, n_humans, 2) fixed-shape history tensor; missing
        actors/samples pad FAR so their obstacle slots are inert."""
        import jax.numpy as jnp
        H = self.fused["n_humans"]
        far = 1.0e6
        out = np.full((self.history_len, H, 2), far, np.float32)
        for i, hist in enumerate(list(self.histories.values())[:H]):
            past = list(hist)
            if not past:
                continue
            while len(past) < self.history_len:   # backfill like the sim
                past.insert(0, past[0])
            out[:, i, :] = np.asarray(past[-self.history_len:], np.float32)
        return jnp.asarray(out)

    def _fused_tick(self):
        import jax.numpy as jnp
        f = self.fused
        robot = jnp.asarray(self.robot_pose, jnp.float32)
        hist = self._human_hist_tensor()
        if f["u_warm"] is None:                   # episode cold start
            u_init = jnp.tile(jnp.asarray([1.2, 0.0], jnp.float32),
                              self.n_hor)
            f["u_warm"] = f["cold"](f["scenario"], robot, hist, u_init)
        action, u_warm, ref_idx, ok, cost = f["step"](
            f["scenario"], robot, hist, f["u_warm"], f["u_prev"],
            f["ref_idx"])
        f["u_warm"], f["ref_idx"] = u_warm, ref_idx
        f["u_prev"] = action
        a = np.asarray(action)
        self.transport.publish("cmd_vel", {"v": float(a[0]),
                                           "w": float(a[1])})
        self.transport.publish("viz", {"cost": float(cost),
                                       "converged": bool(ok)})
        return a

    def control_tick(self, mode: str = "super"):
        """One control step; publishes cmd_vel and returns the action."""
        if self.robot_pose is None:
            return None
        if self.fused is not None:
            return self._fused_tick()
        self.tracker.set_current_state(self.robot_pose)
        dyn = self._predict_obstacles() if self.predictor else None
        actions, pred_states, cost, obs_list, refs = self.tracker.run_step(
            mode, dyn, map_updated=True)
        action = np.asarray(actions[0])
        if action[0] < 0:
            action = np.zeros_like(action)
        self.transport.publish("cmd_vel",
                               {"v": float(action[0]), "w": float(action[1])})
        self.transport.publish("viz", {
            "pred_states": [list(map(float, s[:2])) for s in pred_states],
            "cost": float(cost),
        })
        return action
