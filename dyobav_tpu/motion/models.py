"""Kinematic motion models as pure JAX functions (L1).

One implementation serves the simulator, the MPC rollout (traced under jit /
`lax.scan`), and the DWA candidate rollout — replacing the reference's dual
numpy/CasADi-SX dispatch (`basic_motion_model/motion_model.py:130-163`).
`jax.grad` through these functions replaces CasADi autodiff.

state  = (x, y, theta)
action = (v, omega)        for the unicycle
action = (vx, vy, omega)   for the omnidirectional model
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def unicycle_derivative(state: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
    v, w = action[0], action[1]
    return jnp.stack([v * jnp.cos(state[2]), v * jnp.sin(state[2]), w])


def unicycle_step(state: jnp.ndarray, action: jnp.ndarray, ts: float, rk4: bool = True) -> jnp.ndarray:
    """Unicycle kinematics, RK4-integrated by default.

    Ref: `motion_model.unicycle_model` (motion_model.py:141-163).  The
    reference's RK4 holds the action constant across sub-steps; so do we.
    """
    if rk4:
        k1 = ts * unicycle_derivative(state, action)
        k2 = ts * unicycle_derivative(state + 0.5 * k1, action)
        k3 = ts * unicycle_derivative(state + 0.5 * k2, action)
        k4 = ts * unicycle_derivative(state + k3, action)
        return state + (k1 + 2.0 * k2 + 2.0 * k3 + k4) / 6.0
    return state + ts * unicycle_derivative(state, action)


def omnidirectional_step(state: jnp.ndarray, action: jnp.ndarray, ts: float) -> jnp.ndarray:
    """Holonomic model: state += ts * action.

    Ref: `motion_model.omnidirectional_model` (motion_model.py:130-139).
    """
    return state + ts * action


def unicycle_step_np(state, action, ts: float, rk4: bool = True):
    """Numpy twin of `unicycle_step` for HOST-side callers (sim agents,
    trackers stepping one 3-element state).  A jnp call here would
    dispatch a device program per agent per step — over the remote-TPU
    tunnel that is a full RPC round trip for 12 bytes of math, which
    dominated the per-step eval latency."""
    import numpy as np

    def d(s):
        return ts * np.array([action[0] * np.cos(s[2]),
                              action[0] * np.sin(s[2]), action[1]])

    if rk4:
        k1 = d(state)
        k2 = d(state + 0.5 * k1)
        k3 = d(state + 0.5 * k2)
        k4 = d(state + k3)
        return state + (k1 + 2.0 * k2 + 2.0 * k3 + k4) / 6.0
    return state + d(state)


def omnidirectional_step_np(state, action, ts: float):
    """Numpy twin of `omnidirectional_step` (host-side agents)."""
    return state + ts * action


class MotionModel:
    """Thin callable wrapper carrying (state_dim, action_dim, ts).

    Mirrors the reference's `MotionModel` ABC surface
    (motion_model.py:32-68) for the tracker/agent protocol.
    """

    def __init__(self, fn: Callable, state_dim: int, action_dim: int, ts: float,
                 np_fn: Callable | None = None):
        self.fn = fn
        self.np_fn = np_fn
        self.state_dim = state_dim
        self.action_dim = action_dim
        self.ts = ts

    def __call__(self, state, action, ts: float | None = None):
        ts = self.ts if ts is None else ts
        # Host-side callers (sim agents stepping one 3-element state) take
        # the numpy twin — a device dispatch per agent per step is a full
        # RPC round trip on a remote-TPU backend.
        if self.np_fn is not None and not isinstance(state, jnp.ndarray):
            import numpy as np
            return self.np_fn(np.asarray(state, np.float64),
                              np.asarray(action, np.float64), ts)
        return self.fn(jnp.asarray(state), jnp.asarray(action), ts)

    def zero_state(self):
        return jnp.zeros(self.state_dim)

    def zero_action(self):
        return jnp.zeros(self.action_dim)


class UnicycleModel(MotionModel):
    def __init__(self, ts: float, rk4: bool = True):
        super().__init__(
            lambda s, a, t: unicycle_step(s, a, t, rk4=rk4), 3, 2, ts,
            np_fn=lambda s, a, t: unicycle_step_np(s, a, t, rk4=rk4),
        )


class OmnidirectionalModel(MotionModel):
    def __init__(self, ts: float):
        super().__init__(omnidirectional_step, 3, 3, ts,
                         np_fn=omnidirectional_step_np)


def reciprocating_state(kt, speed: float, ts: float, p1, p2):
    """Preset back-and-forth motion between p1 and p2, starting at p1
    (reference `reciprocating_model`, motion_model.py:165-186): position is
    a pure function of the time step, so it traces under jit/scan.

    Args:
        kt: current time step (int or traced int array).
        speed: linear speed along the segment.
    Returns:
        (3,) state [x, y, theta].
    """
    p1 = jnp.asarray(p1, jnp.float32)
    p2 = jnp.asarray(p2, jnp.float32)
    period = jnp.floor(2.0 * jnp.linalg.norm(p1 - p2) / speed / ts) + 1.0
    progress = (kt % period) / period
    fwd = progress < 0.5
    theta = jnp.where(
        fwd,
        jnp.arctan2(p2[1] - p1[1], p2[0] - p1[0]),
        jnp.arctan2(p1[1] - p2[1], p1[0] - p2[0]))
    w1 = 2.0 * jnp.abs(0.5 - progress)
    w2 = 2.0 * (0.5 - jnp.abs(0.5 - progress))
    xy = w1 * p1 + w2 * p2
    return jnp.concatenate([xy, theta[None]])


class ReciprocatingModel(MotionModel):
    """Preset reciprocating agent (reference motion_model.py:102-127):
    `model(kt)` returns the state at time step kt; action = (speed,)."""

    def __init__(self, ts: float, p1: tuple, p2: tuple, speed: float = 1.0):
        super().__init__(
            lambda state, action, ts_: reciprocating_state(
                state, action[0], ts_, p1, p2),
            3, 1, ts)
        self.p1, self.p2, self.speed = p1, p2, speed

    def __call__(self, kt, action=None):
        a = jnp.asarray([self.speed] if action is None else action)
        return self.fn(kt, a, self.ts)

    def init_state(self):
        return jnp.array([self.p1[0], self.p1[1], 0.0], jnp.float32)
