#!/usr/bin/env python
"""Per-lane triage of the warm-solve non-convergence tail (VERDICT r2 #4).

Reproduces bench.py's warm receding-horizon distribution, finds the lanes
the production (chord) profile reports non-converged, and answers:

  1. Does a much stronger budget (strong profile) converge those lanes
     from the same warm start?  → truncation vs fundamental.
  2. How far is the chord control from the strong control on those lanes
     (max |Δu|)?  → does the failure matter for control quality?
  3. What do the failing lanes share geometrically (obstacle bearing)?

Usage: python scripts/triage_tail.py [--batch 1024] [--platform cpu]
           [--json-out docs/triage_tail_r3.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--warm-steps", type=int, default=3)
    ap.add_argument("--platform", default="")
    ap.add_argument("--profile", default="3,2,2,2,1250")
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    import jax.numpy as jnp

    from dyobav_tpu.configs import (CircularRobotSpecification,
                                    MpcConfiguration, SolverConfiguration)
    from dyobav_tpu.motion.models import unicycle_step
    from dyobav_tpu.ops.engine import build_mpc_solver
    from dyobav_tpu.ops.params import empty_params, pack, tuning_vector

    cfg = MpcConfiguration()
    robot = CircularRobotSpecification()
    batch, N = args.batch, cfg.N_hor

    pi, po, pl, ps = (int(x) for x in args.profile.split(",")[:4])
    pen = float(args.profile.split(",")[4])
    chord = SolverConfiguration(max_inner_iters=pi, max_outer_iters=po,
                                inner_iters_later=pl, newton_substeps=ps,
                                initial_penalty=pen, linear_solver="schulz")
    strong = SolverConfiguration(max_inner_iters=30, max_outer_iters=10,
                                 inner_iters_later=10, newton_substeps=1,
                                 initial_penalty=10.0, linear_solver="schulz")
    b_chord = build_mpc_solver(cfg, robot, chord)
    b_strong = build_mpc_solver(cfg, robot, strong)

    # === bench.py's randomized scenario generator (identical seed). ===
    rng = np.random.default_rng(0)
    x0s = rng.uniform(-5, 5, batch)
    y0s = rng.uniform(-5, 5, batch)
    headings = rng.uniform(-np.pi, np.pi, batch)
    coss, sins = np.cos(headings), np.sin(headings)
    obs_xy = np.stack([x0s + coss * 2.2 - sins * 0.3,
                       y0s + sins * 2.2 + coss * 0.3], axis=1)

    def make_Z(states, u_prev, k):
        zs = []
        steps = np.arange(k + 1, k + N + 1)
        for b in range(batch):
            p = empty_params(cfg)
            ref = np.zeros((N, 3), np.float32)
            ref[:, 0] = x0s[b] + coss[b] * 0.24 * steps
            ref[:, 1] = y0s[b] + sins[b] * 0.24 * steps
            ref[:, 2] = headings[b]
            ell = np.zeros((cfg.Ndynobs, N + 1, cfg.ndynobs), np.float32)
            ell[0, :, :] = [obs_xy[b, 0], obs_xy[b, 1], 0.4, 0.4, 0.0, 1.0]
            p = p._replace(
                u_prev=jnp.asarray(u_prev[b], jnp.float32),
                s0=jnp.asarray(states[b], jnp.float32),
                sN=jnp.asarray(ref[-1], jnp.float32),
                q=jnp.asarray(tuning_vector(cfg), jnp.float32),
                ref_states=jnp.asarray(ref),
                ref_speed=jnp.full((N,), 1.2, jnp.float32),
                dyn_obs=jnp.asarray(ell),
                q_stc=jnp.full((N,), 10.0, jnp.float32),
                q_dyn=jnp.full((N,), 10.0, jnp.float32),
            )
            zs.append(np.asarray(pack(p)))
        return jnp.asarray(np.stack(zs))

    states = np.stack([x0s, y0s, headings], axis=1).astype(np.float32)
    u_prev = np.tile(np.array([1.2, 0.0], np.float32), (batch, 1))
    Z = make_Z(states, u_prev, 0)
    U0 = jnp.tile(jnp.asarray(np.tile([1.2, 0.0], N), jnp.float32),
                  (batch, 1))
    step_batch = jax.jit(jax.vmap(lambda s, u: unicycle_step(s, u, cfg.ts)))

    sol = b_chord.solve_batch(Z, U0)
    for k in range(args.warm_steps):
        u = np.asarray(sol.u)
        states = np.asarray(step_batch(jnp.asarray(states),
                                       jnp.asarray(u[:, :cfg.nu])))
        u_prev = u[:, :cfg.nu]
        U0 = jnp.asarray(np.concatenate([u[:, cfg.nu:], u[:, -cfg.nu:]],
                                        axis=1))
        Z = make_Z(states, u_prev, k + 1)
        sol = b_chord.solve_batch(Z, U0)

    res = np.asarray(sol.residual)
    inf = np.asarray(sol.infeasibility)
    bad = np.where(~np.asarray(sol.exit_ok))[0]
    print(f"chord: {len(bad)}/{batch} non-converged "
          f"(residual p95 {np.percentile(res, 95):.2e})")

    # Strong solve on the SAME warm problems / warm starts.
    sol_s = b_strong.solve_batch(Z, U0)
    res_s = np.asarray(sol_s.residual)
    ok_s = np.asarray(sol_s.exit_ok)
    du = np.abs(np.asarray(sol.u) - np.asarray(sol_s.u)).max(axis=1)
    dcost = np.asarray(sol.cost) - np.asarray(sol_s.cost)

    # Geometry of failing lanes: bearing of the obstacle vs heading and
    # lateral offset sign are identical by construction; distance to the
    # obstacle after warm-up is the discriminator.
    d_obs = np.hypot(states[:, 0] - obs_xy[:, 0], states[:, 1] - obs_xy[:, 1])

    def stats(idx):
        if len(idx) == 0:
            return {}
        return {
            "n": int(len(idx)),
            "strong_converged_frac": float(ok_s[idx].mean()),
            "chord_residual_median": float(np.median(res[idx])),
            "strong_residual_median": float(np.median(res_s[idx])),
            "du_vs_strong_median": float(np.median(du[idx])),
            "du_vs_strong_max": float(du[idx].max()),
            "du_vs_strong_p90": float(np.percentile(du[idx], 90)),
            "cost_gap_vs_strong_median": float(np.median(dcost[idx])),
            "cost_gap_vs_strong_p90": float(np.percentile(dcost[idx], 90)),
            "dist_to_obstacle_median_m": float(np.median(d_obs[idx])),
        }

    good = np.where(np.asarray(sol.exit_ok))[0]
    # Converged lanes that nevertheless differ from the strong-budget
    # solution: basin differences (both at valid local optima), not
    # convergence failures — the cost-gap sign shows who found the better
    # basin (negative = chord's is cheaper).
    hop = good[du[good] > 1e-2]
    out = {
        "basin_diff_lanes": [
            {"lane": int(b), "du_vs_strong": float(du[b]),
             "cost_gap": float(dcost[b]),
             "residual": float(res[b]), "residual_strong": float(res_s[b])}
            for b in hop],
        "batch": batch,
        "profile": args.profile,
        "exit_ok": float(np.asarray(sol.exit_ok).mean()),
        "failing_lanes": stats(bad),
        "converged_lanes": stats(good),
    }
    # Worst five lanes, spelled out.
    worst = bad[np.argsort(res[bad])[-5:][::-1]] if len(bad) else []
    out["worst"] = [
        {"lane": int(b), "residual": float(res[b]),
         "residual_strong": float(res_s[b]), "infeas": float(inf[b]),
         "du_vs_strong": float(du[b]), "cost_gap": float(dcost[b]),
         "dist_to_obstacle_m": float(d_obs[b])}
        for b in worst
    ]
    print(json.dumps(out, indent=1))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
