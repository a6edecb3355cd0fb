"""Sampling + DDP hybrid solve (BASELINE.json configs[4]: humanoid-class
sampling+DDP hybrid MPC).

MPPI explores globally (thousands of perturbed rollouts, no gradients), then
DDP refines the best plan locally with exact linearizations — the standard
hybrid that escapes the local minima a cold-started DDP falls into while
keeping DDP's terminal precision.
"""
from __future__ import annotations

from ..model.robot import RobotModel
from .costs import Cost
from .ddp import DDPConfig, ddp_solve
from .mppi import MPPIConfig, mppi_solve


def hybrid_solve(
    model: RobotModel,
    cost: Cost,
    x0,
    U0,
    key,
    mppi_config: MPPIConfig = MPPIConfig(),
    ddp_config: DDPConfig = DDPConfig(),
    mppi_iters: int = 8,
    f_ext=None,
):
    """MPPI warm start -> DDP refinement.  NATIVELY BATCHED over leading
    problem dims (x0 (..., nx), U0 (..., H, nv), one key): the MPPI stage
    flattens problems x samples into one fused rollout batch and the DDP
    stage is natively batched — prefer this over vmap-of-problems, which
    blocks the packed-lane Pallas kernels from engaging at their efficient
    widths.

    f_ext: optional per-body disturbance wrenches ((NB, 6) or (H, NB, 6),
    solver.rollout.normalize_f_ext), applied in BOTH stages' rollouts.

    Returns (DDPState, (mppi_hist, ddp_hist))."""
    U_warm, mppi_hist = mppi_solve(
        model, cost, x0, U0, key, iters=mppi_iters, config=mppi_config,
        f_ext=f_ext,
    )
    state, ddp_hist = ddp_solve(model, cost, x0, U_warm, ddp_config,
                                f_ext=f_ext)
    return state, (mppi_hist, ddp_hist)
