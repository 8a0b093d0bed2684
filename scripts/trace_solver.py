#!/usr/bin/env python
"""Measured (not inferred) time attribution for the batched NMPC solve.

Captures a jax.profiler device trace of `solve_batch` and aggregates device
op durations by HLO category, answering where the solve's wall time
actually goes (RESULTS.md's component timings are dispatch-polluted
standalone measurements; ROADMAP item: "profile with a real trace").

Usage: python scripts/trace_solver.py [--batch 1024] [--profile chord]
Prints one JSON line with total device time and the top op categories.
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROFILES = {
    "full": (12, 4, 5, 1),
    "lean": (6, 3, 3, 1),
    "chord": (3, 2, 2, 2),
    "default": None,          # SolverConfiguration() as shipped
}


def build_and_run(batch: int, profile: str, log_dir: str,
                  hessian: str = ""):
    import jax
    import jax.numpy as jnp

    from dyobav_tpu.configs import (CircularRobotSpecification,
                                    MpcConfiguration, SolverConfiguration)
    from dyobav_tpu.ops.engine import build_mpc_solver
    from dyobav_tpu.ops.params import empty_params, pack, tuning_vector
    from dyobav_tpu.utils.profiling import device_trace

    cfg = MpcConfiguration()
    robot = CircularRobotSpecification()
    kw = {"hessian_mode": hessian} if hessian else {}
    if PROFILES[profile] is None:
        scfg = SolverConfiguration(**kw)
    else:
        inner, outer, later, sub = PROFILES[profile]
        scfg = SolverConfiguration(max_inner_iters=inner,
                                   max_outer_iters=outer,
                                   inner_iters_later=later,
                                   newton_substeps=sub, **kw)
    bundle = build_mpc_solver(cfg, robot, scfg)

    rng = np.random.default_rng(0)
    N = cfg.N_hor
    p = empty_params(cfg)
    ref = np.zeros((N, 3), np.float32)
    ref[:, 0] = 0.24 * np.arange(1, N + 1)
    ell = np.zeros((cfg.Ndynobs, N + 1, cfg.ndynobs), np.float32)
    ell[0, :, :] = [2.2, 0.3, 0.4, 0.4, 0.0, 1.0]
    p = p._replace(
        u_prev=jnp.array([1.2, 0.0]), s0=jnp.zeros(3),
        sN=jnp.asarray(ref[-1]),
        q=jnp.asarray(tuning_vector(cfg), jnp.float32),
        ref_states=jnp.asarray(ref),
        ref_speed=jnp.full((N,), 1.2, jnp.float32),
        dyn_obs=jnp.asarray(ell),
        q_stc=jnp.full((N,), 10.0, jnp.float32),
        q_dyn=jnp.full((N,), 10.0, jnp.float32))
    z = np.asarray(pack(p))
    Z = jnp.asarray(np.tile(z, (batch, 1))
                    + rng.normal(0, 1e-3, (batch, z.shape[0])).astype(np.float32))
    U0 = jnp.tile(jnp.asarray(np.tile([1.2, 0.0], N), jnp.float32),
                  (batch, 1))

    bundle.solve_batch(Z, U0).u.block_until_ready()      # compile
    with device_trace(log_dir):
        for _ in range(2):
            sol = bundle.solve_batch(Z, U0)
        sol.u.block_until_ready()


def aggregate(log_dir: str, top: int = 12) -> dict:
    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace under {log_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)

    # Keep complete events on device (TPU/accelerator) tracks only.
    dev_pids = {p["pid"] for p in trace.get("traceEvents", [])
                if p.get("ph") == "M" and p.get("name") == "process_name"
                and re.search(r"TPU|/device|Chip",
                              str(p.get("args", {}).get("name", "")), re.I)}
    by_cat = defaultdict(float)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or (dev_pids and ev.get("pid") not in dev_pids):
            continue
        name = ev.get("name", "")
        if name.startswith(("tf_", "pjrt", "Thread", "process", "$", "end:",
                            "ThunkExecutor", "Xla", "run_")):
            continue
        dur = float(ev.get("dur", 0.0))          # microseconds
        # HLO category: strip fusion indices, keep the leading op kind.
        cat = re.sub(r"[.\d]+$", "", name.split("(")[0]).strip() or name
        by_cat[cat] += dur
        total += dur
    ranked = sorted(by_cat.items(), key=lambda kv: -kv[1])[:top]
    return {
        "device_time_ms_total": round(total / 1000, 2),
        "top_ops_ms": {k: round(v / 1000, 2) for k, v in ranked},
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--profile", default="chord", choices=sorted(PROFILES))
    ap.add_argument("--log-dir", default="/tmp/dyobav_trace")
    ap.add_argument("--hessian", default="", help="hessian_mode override")
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    os.makedirs(args.log_dir, exist_ok=True)
    build_and_run(args.batch, args.profile, args.log_dir, args.hessian)
    out = aggregate(args.log_dir)
    out.update({"batch": args.batch, "profile": args.profile,
                "hessian": args.hessian or "default"})
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
