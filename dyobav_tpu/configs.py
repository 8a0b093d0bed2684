"""Typed configuration system (L0).

Mirrors the configuration surface of the reference (`src/configs.py:10-199` in
Woodenonez/DyObAv-MPCnWTA-Warehouse): the same five config families with the
same field names, loadable from the same YAML files (including the
multi-document "partition" YAML used by the WTA net config), so that reference
config files run unmodified.  Implemented as frozen dataclasses with defaults
equal to the reference's shipped configs, so the framework is also fully
usable without any YAML on disk.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, List

import yaml


def _load_yaml(path: str, multi_doc: bool = False) -> dict:
    with open(path, "r") as stream:
        if multi_doc:
            merged: dict = {}
            for doc in yaml.safe_load_all(stream):
                if doc:
                    merged.update(doc)
            return merged
        return yaml.safe_load(stream) or {}


def save_yaml_all(docs, yaml_path: str) -> None:
    """Write a multi-document YAML (`---`-separated), mirroring the
    reference's `utils_yaml.to_yaml_all` (utils/utils_yaml.py:50-55)."""
    with open(yaml_path, "w") as f:
        yaml.safe_dump_all(docs, f, explicit_start=True, sort_keys=False)


class _YamlConfig:
    """Mixin: construct any config dataclass from a (reference-schema) YAML."""

    @classmethod
    def from_yaml(cls, yaml_path: str, with_partition: bool = False):
        raw = _load_yaml(yaml_path, multi_doc=with_partition)
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: dict):
        names = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in raw.items() if k in names}
        return cls(**kwargs)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def save_yaml(self, yaml_path: str) -> None:
        """Write the config back out as YAML (the counterpart of the
        reference's `utils_yaml` config generator)."""
        with open(yaml_path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)


@dataclass(frozen=True)
class WarehouseSimConfiguration(_YamlConfig):
    """Scene/simulation wiring (ref `configs.py:61-83`)."""

    scene: str = "warehouse"
    map_dir: str = "warehouse_sim_original"
    map_file: str = "mymap.pgm"
    graph_file: str = "mygraph.json"
    mmp_cfg: str = "wsd_1t20_test.yaml"
    mpc_cfg: str = "mpc_fast.yaml"
    dwa_cfg: str = "dwa_test.yaml"
    sim_width: int = 330
    sim_height: int = 293
    scale2nn: float = 1.0
    scale2real: float = 0.1
    image_axis: bool = False
    corner_coords: List[float] = field(default_factory=lambda: [-15.0, -15.0])


@dataclass(frozen=True)
class CircularRobotSpecification(_YamlConfig):
    """Physical + kinematic robot limits (ref `configs.py:86-103`)."""

    ts: float = 0.2
    vehicle_width: float = 0.5
    vehicle_margin: float = 0.2
    social_margin: float = 0.2
    lin_vel_min: float = -0.5
    lin_vel_max: float = 1.5
    lin_acc_min: float = -1.0
    lin_acc_max: float = 1.0
    ang_vel_max: float = 0.5
    ang_acc_max: float = 3.0


@dataclass(frozen=True)
class MpcConfiguration(_YamlConfig):
    """NMPC problem dimensions + penalty weights (ref `configs.py:140-176`).

    The solver-build fields of the reference (`build_directory`, `build_type`,
    `optimizer_name`) are accepted for YAML compatibility but unused: there is
    no codegen phase — the problem jit-compiles on first use.
    """

    ts: float = 0.2
    N_hor: int = 20
    action_steps: int = 1
    ns: int = 3
    nu: int = 2
    nq: int = 10
    Nother: int = 10
    nstcobs: int = 12
    Nstcobs: int = 10
    ndynobs: int = 6
    Ndynobs: int = 15
    max_solver_time: int = 100_000  # microseconds; solve-time budget
    build_directory: str = "mpc_solver"
    build_type: str = "release"
    bad_exit_codes: List[str] = field(
        default_factory=lambda: ["NotConvergedIterations", "NotConvergedOutOfTime"]
    )
    optimizer_name: str = "navi_fast"
    lin_vel_penalty: float = 0.0
    lin_acc_penalty: float = 10.0
    ang_vel_penalty: float = 0.0
    ang_acc_penalty: float = 20.0
    qrpd: float = 100.0
    qpos: float = 0.0
    qvel: float = 10.0
    qtheta: float = 0.0
    qpN: float = 0.0
    qthetaN: float = 0.0

    @property
    def n_params(self) -> int:
        """Length of the flat solver parameter vector (ref layout, ~2778)."""
        return (
            self.nu                                      # u_m1
            + self.ns                                    # s_0
            + self.ns                                    # s_N
            + self.nq                                    # q penalties
            + self.ns * self.N_hor                       # ref states
            + self.N_hor                                 # ref speeds
            + self.ns * self.Nother                      # other robots @ t0
            + self.ns * self.N_hor * self.Nother         # other robots predicted
            + self.Nstcobs * self.nstcobs                # static obstacles
            + self.Ndynobs * self.ndynobs * (self.N_hor + 1)  # dynamic obstacles
            + self.N_hor                                 # static obstacle weights
            + self.N_hor                                 # dynamic obstacle weights
        )


@dataclass(frozen=True)
class DwaConfiguration(_YamlConfig):
    """Dynamic-window-approach tracker config (ref `configs.py:179-199`)."""

    ts: float = 0.2
    N_hor: int = 20
    ns: int = 3
    nu: int = 2
    vel_resolution: float = 0.1
    ang_resolution: float = 0.1
    stuck_threshold: float = 0.001
    q_goal_dir: float = 0.05
    q_ref_deviation: float = 0.1
    q_speed: float = 1.0
    q_stc_obstacle: float = 2.0
    q_dyn_obstacle: float = 2.0
    q_social: float = 0.1


@dataclass(frozen=True)
class WtaNetConfiguration(_YamlConfig):
    """SWTA predictor net + training config (ref `configs.py:106-137`).

    Loaded from the multi-document YAML with `with_partition=True`.
    """

    device: str = "tpu"
    dim_out: int = 2
    dynamic_env: bool = False
    fc_input: int = 3200
    input_channel: int = 7
    num_hypos: int = 20
    obsv_len: int = 5
    pred_len: int = 1
    batch_size: int = 20
    checkpoint_dir: str = "Model/"
    early_stopping: int = 0
    epoch: int = 20
    learning_rate: float = 0.001
    weight_regularization: float = 0.0001
    cell_width: float = 1.0
    x_max_px: int = 330
    y_max_px: int = 293
    data_name: str = "WSD_1t20_train"
    data_path: str = "data/WSD_1t20_train"
    label_csv: str = "all_data.csv"
    label_path: str = "data/WSD_1t20_train/all_data.csv"
    model_path: str = "Model/wsd_1t20_full"   # promoted r3 (full recipe)

    # Field partition of the reference's 4-document training YAMLs, in the
    # generator's document order (utils/utils_yaml.py:13-42).
    _PARTITION = (
        ("pred_len", "obsv_len", "dim_out", "fc_input", "num_hypos",
         "dynamic_env", "device", "input_channel"),
        ("epoch", "batch_size", "early_stopping", "learning_rate",
         "weight_regularization", "checkpoint_dir"),
        ("x_max_px", "y_max_px", "cell_width"),
        ("model_path", "data_name", "label_csv", "data_path", "label_path"),
    )

    def save_yaml_partition(self, yaml_path: str) -> None:
        """Regenerate a multi-document training YAML — the counterpart of
        the reference's config generator (`utils/utils_yaml.py:44-56`
        `to_yaml_all`), emitting the same general/training/converting/path
        document split so the file round-trips through
        `from_yaml(with_partition=True)` and the reference's own loader."""
        d = self.to_dict()
        docs = [{k: d[k] for k in part} for part in self._PARTITION]
        save_yaml_all(docs, yaml_path)


@dataclass(frozen=True)
class SolverConfiguration:
    """PANOC/ALM solver knobs — the TPU-side analogue of OpEn's
    `SolverConfiguration` (ref `mpc_builder.py:187-195`).

    Fixed iteration caps keep the compiled program static-shaped so the whole
    solve vmaps/shards cleanly over scenario batches; converged lanes are
    masked out rather than exiting early.

    DEFAULTS = the PRODUCTION OPERATING POINT (round 3): the chord profile
    (3+2 iterations x 3 Newton updates per exact Hessian) with the penalty
    pre-escalated to 1250 (= 10 * 5^3, where the full ALM ramp ends up),
    tile-parallel Pallas Cholesky linear solves, and deep cold-start
    escalation.  This is the exact configuration the headline bench times
    (bench.py 'default' reads these fields) and the parity tables certify
    (docs/parity_r3*.json) — `sim eval`, the sweep, and the tracker all
    run what the bench advertises.  The warm profile is sized for
    receding-horizon solves (shifted warm start each step); the one cold
    solve per episode runs `cold_profile` with the OpEn from-10 penalty
    ramp instead, and the tracker escalates distressed multistart steps to
    the same budget (trackers/mpc_tracker.py).  For OpEn-default semantics
    on every solve (reference-style, much slower), use
    `strong_configuration()`.
    """

    max_inner_iters: int = 3        # inner iterations in the first ALM stage
    max_outer_iters: int = 2        # ALM / penalty update stages
    inner_iters_later: int = 2      # inner iterations per warm-started stage
    initial_penalty: float = 1250.0  # pre-escalated for warm solves (see above)
    penalty_update_factor: float = 5.0
    tol: float = 1e-4               # fixed-point-residual tolerance (inner)
    constraint_tol: float = 1e-3    # ALM infeasibility tolerance
    multistart_infeas_factor: float = 10.0  # multi-start candidates whose
                                    # infeasibility exceeds this multiple of
                                    # constraint_tol are cost-penalized when
                                    # ranking (trackers/mpc_tracker.py)
    lbfgs_memory: int = 10
    dtype: Any = None               # default float32; jnp dtype override
    fused: bool = True              # single-scan ALM (masked stage updates;
                                    # ~4x faster compiles, identical controls)
                                    # vs Python-unrolled outer stages
    linear_solver: str = "pallas"   # "pallas": tile-parallel batched
                                    # Cholesky kernel (ops/pallas_spd.py) —
                                    # measured 14.3x faster than XLA's
                                    # per-matrix-serialized Cholesky custom
                                    # call at (4096, 40, 40) with equal f32
                                    # residuals (scripts/check_pallas_spd.py
                                    # on a v5e chip); falls back to XLA
                                    # batched LU on non-TPU backends.
                                    # "schulz": Newton-Schulz inverse via
                                    # batched matmuls (MXU-native, inexact
                                    # at float32 for ill-conditioned rungs).
                                    # "cholesky": XLA custom call (exact,
                                    # serialized per matrix on TPU).
    schulz_iters: int = 14          # Newton–Schulz iterations (error squares
                                    # each iteration from the Gershgorin
                                    # starting point)
    hessian_mode: str = "block"
                                    # Exact merit Hessian implementation
                                    # (all three produce the same matrix
                                    # to float tolerance, tests/
                                    # test_hessian.py):
                                    # "block" (default): N vmapped 7×7
                                    # per-step Hessians over (x_k, u_k,
                                    # u_{k-1}) + weight-linearized penalty
                                    # blocks + rank-M penalty outer
                                    # products, mapped through the
                                    # trajectory Jacobian; dynamics
                                    # curvature via the second-order
                                    # adjoint (costs.make_block_curvature,
                                    # newton.make_structured_hessian).
                                    # Measured v5e B=4096: 12.8 ms vs
                                    # jacfwd 14.7 / structured 19.3 (CPU:
                                    # 30 vs 89 / 79 ms at B=256).
                                    # "structured": same chain assembly
                                    # but ∇²φ via 40 HVPs of the full φ.
                                    # "jacfwd": forward-over-reverse AD
                                    # through the rollout scan (r1-r4).
    cold_profile: Any = (12, 6, 5, 1, 10.0)
                                    # (inner, outer, later, substeps[,
                                    # penalty]) used for the FIRST solve of
                                    # an episode (no warm start).  Lean
                                    # iteration profiles are sized for
                                    # warm-started receding-horizon solves
                                    # and can leave cold starts infeasible;
                                    # escalating the one cold solve per
                                    # episode costs ~one extra compile and
                                    # nothing per step.  Measured: 97% cold
                                    # convergence at 3,608 solves/s
                                    # (BENCH_CUSTOM=12,6,5,1,10
                                    # BENCH_WARM_STEPS=0).
    escalation_ladder: Any = ((6, 10, 5, 2, 10.0),)
                                    # Stage profiles (inner, outer, later,
                                    # substeps[, penalty[, from_iterate]])
                                    # for the escalated batch path; None =
                                    # (cold_profile, then the OpEn-default
                                    # strong budget).  Stages run
                                    # sequentially on the still-failing
                                    # tail, so their SEQUENTIAL Hessian-
                                    # refresh count is what a stage costs
                                    # at small slot counts (latency-bound:
                                    # ~0.35 ms/refresh at 1 substep,
                                    # ~0.52 ms at 3, measured at 32 slots
                                    # on v5e).  The default single stage —
                                    # 51 refreshes × 2 substeps with the
                                    # full 10-outer-stage penalty ramp
                                    # from 10 — is the measured knee of
                                    # the r4 frontier: 15,007 solves/s at
                                    # exit_ok 0.991 (B=1024, one chip) vs
                                    # 13.1k@0.992 (62 refreshes × 3 sub),
                                    # 15.1k@0.988 (42 × 3), 11.7k@0.991
                                    # (the 120-refresh strong stage), and
                                    # 9.9-10.2k@0.995-6 (two-stage
                                    # ladders).  From-scratch penalty
                                    # ramps are what recover the tail:
                                    # continuation at the pre-escalated
                                    # warm penalty recovers almost nothing
                                    # (20.5k@0.977, /tmp ladder sweep r4).
    escalation_residual_tol: Any = 1e-4
                                    # Lanes whose stationarity residual
                                    # (control units) exceeds this are
                                    # escalated EVEN IF the settledness
                                    # probe passed them: the r5 residual-
                                    # band study (docs/residual_band_r5
                                    # .json) measured first-action
                                    # deviations up to 0.21 control units
                                    # vs a deep re-solve on the ~4% of
                                    # warm lanes in the (1e-4, tol-pass]
                                    # band, so "settled but rough" is not
                                    # control-irrelevant.  None restores
                                    # converged-only escalation.
    escalation_slots: Any = (16,)
                                    # Per-stage slot DIVISORS for the
                                    # escalated batch path: ladder stage i
                                    # re-solves up to
                                    # max(B // slots[i], min(B, 8), 1)
                                    # failed lanes (engine.
                                    # solve_batch_escalated) — the floor is
                                    # min(B, 8), i.e. whole-batch coverage
                                    # below B=8.  NOTE the r4 single-stage
                                    # default ladder trades the old
                                    # two-stage default's exit_ok (~0.995)
                                    # down to 0.991 for +45% throughput
                                    # (recorded frontier sweep below); the
                                    # two-stage chord+strong point remains
                                    # available via escalation_ladder=None.
                                    # B/32 = 32
                                    # slots at B=1024 covers the measured
                                    # warm-profile failure tail (~2.4% ≈
                                    # 25 lanes, docs/triage_tail_r3_b1024
                                    # .json); the stage is latency-bound,
                                    # so slot count barely moves its cost
                                    # — starving it (8 slots at divisor
                                    # 128) is what dropped exit_ok to
                                    # 0.984-0.985 in early r4 runs.
                                    # Stages are lax.cond-gated on any-fail
                                    # so a fully-converged batch pays
                                    # nothing.
    newton_substeps: int = 3        # Newton updates per Hessian refresh
                                    # (chord method): the exact Hessian is
                                    # ~90% of per-iteration compute, so K>1
                                    # trades slightly staler curvature for
                                    # nearly K-fold cheaper updates.  Each
                                    # configured "iteration" performs K
                                    # damped updates sharing one Hessian.


def strong_configuration(**overrides) -> SolverConfiguration:
    """OpEn-default solve semantics on EVERY solve: full iteration budget,
    from-10 penalty escalation, no chord substeps — the reference-style
    configuration (`mpc_builder.py:187-195` with_initial_penalty(10) and
    OpEn's default outer-iteration cap).  ~7x slower than the production
    default; use for fidelity studies and as the escalation ceiling."""
    base = dict(max_inner_iters=30, max_outer_iters=10, inner_iters_later=10,
                initial_penalty=10.0, newton_substeps=1, cold_profile=None)
    base.update(overrides)
    return SolverConfiguration(**base)
