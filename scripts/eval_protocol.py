#!/usr/bin/env python
"""Reference evaluation protocol at full scale.

Runs the reference's evaluation (10 runs x <=120 steps, `main_eva.py:6` /
`main_base.py:483-506`) for every (tracker, predictor) pair across
scenarios 0-2 and emits one results table (JSON + markdown) with the
reference's printed metrics: success rate, solve time, action smoothness,
static/dynamic clearance, path deviation.

    python scripts/eval_protocol.py --runs 10 --out docs/eval_protocol_r2
    python scripts/eval_protocol.py --combos mpc:mmp,mpc:cvmp --scenarios 0
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALL_COMBOS = ["mpc:mmp", "mpc:kfmp", "mpc:cvmp",
              "dwa:mmp", "dwa:kfmp", "dwa:cvmp"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--scenarios", default="0,1,2")
    ap.add_argument("--combos", default=",".join(ALL_COMBOS))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ckpt", default=None,
                    help="SWTA checkpoint for mmp (default Model/wsd_1t20)")
    ap.add_argument("--platform", default="")
    ap.add_argument("--out", default="docs/eval_protocol")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    except Exception:
        pass

    from dyobav_tpu.sim.harness import MainBase

    rows = []
    for combo in args.combos.split(","):
        tracker, predictor = combo.strip().split(":")
        for sc in (int(s) for s in args.scenarios.split(",")):
            t0 = time.time()
            base = MainBase(max_num_run=args.runs,
                            max_run_time_step=args.steps,
                            scenario_index=sc, evaluation=True,
                            seed=args.seed, mmp_checkpoint=args.ckpt)
            base.run(tracker, predictor)
            summary = base.results_summary()
            summary.update(tracker=tracker, predictor=predictor, scenario=sc,
                           runs=args.runs, wall_s=round(time.time() - t0, 1),
                           platform=jax.default_backend())
            rows.append(summary)
            print(json.dumps(summary), flush=True)

    with open(args.out + ".json", "w") as f:
        json.dump(rows, f, indent=1)

    # Markdown table in the reference's print_results() metric order.
    cols = ["tracker", "predictor", "scenario", "success_rate",
            "solve_time_mean_s", "smoothness_mean", "clearance_mean",
            "clearance_dyn_mean", "deviation_mean", "deviation_max"]
    lines = ["| " + " | ".join(cols) + " |",
             "|" + "---|" * len(cols)]
    for r in rows:
        cells = []
        for c in cols:
            v = r.get(c)
            if isinstance(v, float):
                v = round(v, 3)
            elif isinstance(v, list):
                v = "/".join(str(round(x, 3)) for x in v)
            cells.append(str(v))
        lines.append("| " + " | ".join(cells) + " |")
    with open(args.out + ".md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}.json / .md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
