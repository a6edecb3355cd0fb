"""Trajectory optimization / MPC solvers (SURVEY.md §7 `solver/`): DDP/iLQR
with scan rollouts, vmapped linearization, Riccati backward sweep and parallel
line search; MPPI sampling MPC; receding-horizon wrapper."""
from .integrate import pack_state, split_state, euler_semi_implicit, step_jacobians
from .rollout import rollout, linearize_trajectory, normalize_f_ext
from .costs import (
    Cost,
    quadratic_tracking_cost,
    ee_reaching_cost,
    add_limit_barrier,
    trajectory_cost,
    quadratize_trajectory,
)
from .ddp import DDPConfig, DDPState, ddp_solve, backward_pass, forward_pass
from .mppi import MPPIConfig, mppi_step, mppi_solve
from .mpc import MPCCarry, mpc_step, mpc_run, save_solver_state, load_solver_state
from .hybrid import hybrid_solve

__all__ = [
    "hybrid_solve",
    "MPCCarry", "mpc_step", "mpc_run", "save_solver_state", "load_solver_state",
    "pack_state", "split_state", "euler_semi_implicit", "step_jacobians",
    "rollout", "linearize_trajectory", "normalize_f_ext",
    "Cost", "quadratic_tracking_cost", "ee_reaching_cost",
    "add_limit_barrier", "trajectory_cost", "quadratize_trajectory",
    "DDPConfig", "DDPState", "ddp_solve", "backward_pass", "forward_pass",
    "MPPIConfig", "mppi_step", "mppi_solve",
]
