#!/usr/bin/env python
"""Measure how the escalation-stage solve cost scales with slot count K.

The escalated batch path re-solves the failed tail in K static slots
(engine.solve_batch_escalated).  Whether shrinking K buys anything depends
on how the deep/strong-profile batch solve scales below the Pallas kernel's
1024-lane tile: this probe times solve_batch for the warm default, the deep
cold_profile, and the OpEn-default strong budget at a range of batch sizes
on the current backend.

    python scripts/stage_cost_probe.py            # real TPU
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import dataclasses

    import jax.numpy as jnp

    from dyobav_tpu.configs import (CircularRobotSpecification,
                                    MpcConfiguration, SolverConfiguration)
    from dyobav_tpu.ops.engine import build_mpc_solver
    from dyobav_tpu.ops.params import empty_params, pack, tuning_vector

    cfg = MpcConfiguration()
    robot = CircularRobotSpecification()
    d = SolverConfiguration()
    deep = tuple(d.cold_profile)
    profiles = {
        "warm": (d.max_inner_iters, d.max_outer_iters, d.inner_iters_later,
                 d.newton_substeps, d.initial_penalty),
        "deep": deep[:4] + ((deep[4] if len(deep) > 4 else 10.0),),
        "strong": (30, 10, 10, 1, 10.0),
    }

    rng = np.random.default_rng(0)
    N = cfg.N_hor
    Bmax = 1024
    x0s = rng.uniform(-5, 5, Bmax)
    y0s = rng.uniform(-5, 5, Bmax)
    headings = rng.uniform(-np.pi, np.pi, Bmax)
    coss, sins = np.cos(headings), np.sin(headings)
    obs_xy = np.stack([x0s + coss * 2.2 - sins * 0.3,
                       y0s + sins * 2.2 + coss * 0.3], axis=1)
    zs = []
    for b in range(Bmax):
        p = empty_params(cfg)
        ref = np.zeros((N, 3), np.float32)
        steps = np.arange(1, N + 1)
        ref[:, 0] = x0s[b] + coss[b] * 0.24 * steps
        ref[:, 1] = y0s[b] + sins[b] * 0.24 * steps
        ref[:, 2] = headings[b]
        ell = np.zeros((cfg.Ndynobs, N + 1, cfg.ndynobs), np.float32)
        ell[0, :, :] = [obs_xy[b, 0], obs_xy[b, 1], 0.4, 0.4, 0.0, 1.0]
        p = p._replace(
            u_prev=jnp.asarray([1.2, 0.0], jnp.float32),
            s0=jnp.asarray([x0s[b], y0s[b], headings[b]], jnp.float32),
            sN=jnp.asarray(ref[-1]),
            q=jnp.asarray(tuning_vector(cfg), jnp.float32),
            ref_states=jnp.asarray(ref),
            ref_speed=jnp.full((N,), 1.2, jnp.float32),
            dyn_obs=jnp.asarray(ell),
            q_stc=jnp.full((N,), 10.0, jnp.float32),
            q_dyn=jnp.full((N,), 10.0, jnp.float32),
        )
        zs.append(np.asarray(pack(p)))
    Zfull = jnp.asarray(np.stack(zs))
    U0full = jnp.tile(jnp.asarray(np.tile([1.2, 0.0], N), jnp.float32),
                      (Bmax, 1))

    sizes = [8, 16, 32, 64, 128, 256, 512, 1024]
    for name, prof in profiles.items():
        ci, co, cl, cs, pen = prof
        scfg = dataclasses.replace(d, max_inner_iters=ci, max_outer_iters=co,
                                   inner_iters_later=cl, newton_substeps=cs,
                                   initial_penalty=pen, cold_profile=None)
        bundle = build_mpc_solver(cfg, robot, scfg)
        for B in sizes:
            Z, U0 = Zfull[:B], U0full[:B]
            sol = bundle.solve_batch(Z, U0)
            sol.u.block_until_ready()
            iters = 5
            t0 = time.perf_counter()
            for _ in range(iters):
                sol = bundle.solve_batch(Z, U0)
            sol.u.block_until_ready()
            dt = (time.perf_counter() - t0) / iters
            print(f"{name:7s} B={B:5d}  {dt*1e3:8.2f} ms  "
                  f"({B/dt:9.0f} solves/s)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
