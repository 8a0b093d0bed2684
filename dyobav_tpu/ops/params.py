"""Structured view of the flat NMPC parameter vector.

The flat layout is byte-compatible with the reference solver's ~2778-element
parameter vector (`mpc_builder.py:45-60` / `trajectory_tracker.py:315-317`):

    z = [u_m1(2) | s_0(3) | s_N(3) | q(10) | r_s(60) | r_v(20) |
         c_0(ns*Nother) | c(ns*N_hor*Nother) | o_s(Nstcobs*nstcobs) |
         o_d(Ndynobs*ndynobs*(N_hor+1)) | q_stc(N_hor) | q_dyn(N_hor)]

so a parameter vector assembled for the reference's OpEn solver drives this
solver unchanged — which is how numerical parity is validated.  Internally
the solver works on this structured pytree; `pack`/`unpack` convert.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..configs import MpcConfiguration


class MpcParams(NamedTuple):
    u_prev: jnp.ndarray       # (nu,)            action at kt=-1
    s0: jnp.ndarray           # (ns,)            current state
    sN: jnp.ndarray           # (ns,)            goal state
    q: jnp.ndarray            # (nq,)            penalty weights
    ref_states: jnp.ndarray   # (N_hor, ns)      local reference states
    ref_speed: jnp.ndarray    # (N_hor,)         reference speeds
    others0: jnp.ndarray      # (Nother, ns)     other robots at kt=0
    others_pred: jnp.ndarray  # (Nother, N_hor, ns)  predicted other robots
    stc_obs: jnp.ndarray      # (Nstcobs, nstcobs)   half-space params (b|a0|a1)
    dyn_obs: jnp.ndarray      # (Ndynobs, N_hor+1, ndynobs)  (x,y,rx,ry,ang,alpha)
    q_stc: jnp.ndarray        # (N_hor,)         static obstacle weights
    q_dyn: jnp.ndarray        # (N_hor,)         dynamic obstacle weights


def unpack(z: jnp.ndarray, cfg: MpcConfiguration) -> MpcParams:
    """Flat parameter vector (n_params,) → structured MpcParams."""
    N, ns, nu, nq = cfg.N_hor, cfg.ns, cfg.nu, cfg.nq
    sizes = [
        nu, ns, ns, nq, ns * N, N,
        ns * cfg.Nother, ns * N * cfg.Nother,
        cfg.Nstcobs * cfg.nstcobs,
        cfg.Ndynobs * cfg.ndynobs * (N + 1),
        N, N,
    ]
    offs = np.concatenate([[0], np.cumsum(sizes)])
    z = jnp.asarray(z)
    if z.shape[-1] != offs[-1]:
        raise ValueError(
            f"Parameter vector has {z.shape[-1]} elements; this MPC config "
            f"needs {offs[-1]} (see MpcConfiguration.n_params)")
    seg = [z[offs[i]:offs[i + 1]] for i in range(len(sizes))]
    return MpcParams(
        u_prev=seg[0],
        s0=seg[1],
        sN=seg[2],
        q=seg[3],
        ref_states=seg[4].reshape(N, ns),
        ref_speed=seg[5],
        others0=seg[6].reshape(cfg.Nother, ns),
        # Reference layout is robot-major: robot i holds ns*N_hor consecutive
        # values, time-major within the robot (mpc_builder.py:93-94).
        others_pred=seg[7].reshape(cfg.Nother, N, ns),
        stc_obs=seg[8].reshape(cfg.Nstcobs, cfg.nstcobs),
        # Obstacle-major: obstacle i holds (N_hor+1)*ndynobs consecutive
        # values, step-major within the obstacle (mpc_builder.py:111-134).
        dyn_obs=seg[9].reshape(cfg.Ndynobs, N + 1, cfg.ndynobs),
        q_stc=seg[10],
        q_dyn=seg[11],
    )


def pack(p: MpcParams) -> jnp.ndarray:
    """Structured MpcParams → flat parameter vector (reference layout)."""
    return jnp.concatenate([
        p.u_prev, p.s0, p.sN, p.q,
        p.ref_states.reshape(-1), p.ref_speed,
        p.others0.reshape(-1), p.others_pred.reshape(-1),
        p.stc_obs.reshape(-1), p.dyn_obs.reshape(-1),
        p.q_stc, p.q_dyn,
    ])


def empty_params(cfg: MpcConfiguration, dtype=jnp.float32) -> MpcParams:
    """All-zero parameters with inactive padded obstacles.

    Matches the reference's zero-fill defaults (`trajectory_tracker.py:291-296`)
    — zero-radius ellipses and zero half-spaces are naturally inactive in the
    cost (see `utils.geometry`).
    """
    N = cfg.N_hor
    return MpcParams(
        u_prev=jnp.zeros(cfg.nu, dtype),
        s0=jnp.zeros(cfg.ns, dtype),
        sN=jnp.zeros(cfg.ns, dtype),
        q=jnp.zeros(cfg.nq, dtype),
        ref_states=jnp.zeros((N, cfg.ns), dtype),
        ref_speed=jnp.zeros(N, dtype),
        others0=jnp.zeros((cfg.Nother, cfg.ns), dtype),
        others_pred=jnp.zeros((cfg.Nother, N, cfg.ns), dtype),
        stc_obs=jnp.zeros((cfg.Nstcobs, cfg.nstcobs), dtype),
        dyn_obs=jnp.zeros((cfg.Ndynobs, N + 1, cfg.ndynobs), dtype),
        q_stc=jnp.zeros(N, dtype),
        q_dyn=jnp.zeros(N, dtype),
    )


def tuning_vector(cfg: MpcConfiguration) -> np.ndarray:
    """The 10-element penalty vector q in reference order
    (`trajectory_tracker.py:138-139`):
    [qpos, qvel, qtheta, lin_vel_penalty, ang_vel_penalty,
     qpN, qthetaN, qrpd, lin_acc_penalty, ang_acc_penalty].
    """
    return np.array([
        cfg.qpos, cfg.qvel, cfg.qtheta, cfg.lin_vel_penalty,
        cfg.ang_vel_penalty, cfg.qpN, cfg.qthetaN, cfg.qrpd,
        cfg.lin_acc_penalty, cfg.ang_acc_penalty,
    ])
