"""dyobav_tpu — TPU-native warehouse navigation framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of
Woodenonez/DyObAv-MPCnWTA-Warehouse (RA-L 2023): multimodal pedestrian motion
prediction (SWTA CNN), cluster-and-Gaussian-fit post-processing, and nonlinear
MPC trajectory tracking with static polygon + dynamic ellipse obstacle
avoidance — plus DWA / Kalman / constant-velocity baselines, map and graph
tooling, path planners, and a simulation + evaluation harness.

Unlike the reference (offline Rust/OpEn PANOC codegen + PyTorch CNN + CPU
glue), every hot-path computation here is a single jitted device program:
the predictor, constraint assembly, and a PANOC-style ALM solver run
in-graph, vmap over scenario batches, and shard across TPU meshes.

Layering (mirrors SURVEY.md §1 of the reference analysis):
    configs      L0  typed config system (YAML-compatible with the reference)
    utils/motion L1  geometry + motion-model primitives (pure jnp)
    maps         L2  occupancy/geometric maps, graphs, transforms
    ops/models   L3  MPC/DWA engines, WTA predictor network
    predictors/trackers/interfaces  L4  uniform adapter protocols
    sim          L5  simulation harness, metrics, batch evaluation
    parallel         mesh/sharding layer (no reference counterpart)
"""

__version__ = "0.1.0"
