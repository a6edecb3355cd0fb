"""Cost models for trajectory optimization.

Costs are plain callables ``stage(x, u, t) -> scalar`` / ``terminal(x) ->
scalar``; the solver quadratizes them with forward-mode AD (exact, fused by
XLA).  Two ready-made costs cover the benchmark configs (BASELINE.json):
quadratic state tracking and end-effector reaching through the analytic FK of
kinematics/fk.py.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from ..model.robot import RobotModel
from ..kinematics.fk import ee_pose
from .integrate import split_state


@dataclasses.dataclass(frozen=True)
class Cost:
    stage: Callable  # (x, u, t) -> scalar
    terminal: Callable  # (x,) -> scalar


def quadratic_tracking_cost(
    model: RobotModel, x_goal, *, w_q=1.0, w_qd=0.1, w_u=1e-4,
    w_q_f=100.0, w_qd_f=10.0,
) -> Cost:
    """0.5 * weighted quadratic distance to a goal state, plus control effort."""
    x_goal = jnp.asarray(x_goal)

    def stage(x, u, t):
        dq = x[: model.nq] - x_goal[: model.nq]
        dqd = x[model.nq :] - x_goal[model.nq :]
        return 0.5 * (
            w_q * dq @ dq + w_qd * dqd @ dqd + w_u * u @ u
        )

    def terminal(x):
        dq = x[: model.nq] - x_goal[: model.nq]
        dqd = x[model.nq :] - x_goal[model.nq :]
        return 0.5 * (w_q_f * dq @ dq + w_qd_f * dqd @ dqd)

    return Cost(stage, terminal)


def ee_reaching_cost(
    model: RobotModel, target_xyz, *, w_ee=1.0, w_qd=1e-2, w_u=1e-4,
    w_ee_f=100.0, w_qd_f=1.0, ee_names=None,
) -> Cost:
    """Reach a Cartesian end-effector target (the iiwa reaching task of
    BASELINE.json configs[2]); uses the analytic FK (C11) inside the cost."""
    target_xyz = jnp.asarray(target_xyz)

    def ee_err(x):
        q, _ = split_state(model, x)
        pos = ee_pose(model, q, ee_names=ee_names)[..., 0, :3]
        return pos - target_xyz

    def stage(x, u, t):
        e = ee_err(x)
        qd = x[model.nq :]
        return 0.5 * (w_ee * e @ e + w_qd * qd @ qd + w_u * u @ u)

    def terminal(x):
        e = ee_err(x)
        qd = x[model.nq :]
        return 0.5 * (w_ee_f * e @ e + w_qd_f * qd @ qd)

    return Cost(stage, terminal)


def trajectory_cost(cost: Cost, X, U):
    """Total cost of a trajectory: X (H+1, nx), U (H, nv) -> scalar."""
    H = U.shape[-2]
    ts = jnp.arange(H)
    stage_costs = jax.vmap(cost.stage)(X[..., :-1, :], U, ts)
    return jnp.sum(stage_costs, axis=-1) + cost.terminal(X[..., -1, :])


def quadratize_trajectory(cost: Cost, X, U):
    """Per-knot cost expansions via AD, vmapped across the horizon.

    Returns (lx, lu, lxx, luu, lux, lfx, lfxx): gradients/Hessians of stage
    costs at each knot and of the terminal cost.
    """
    H = U.shape[-2]
    ts = jnp.arange(H)

    gx = jax.vmap(jax.grad(cost.stage, argnums=0))
    gu = jax.vmap(jax.grad(cost.stage, argnums=1))
    hxx = jax.vmap(jax.hessian(cost.stage, argnums=0))
    huu = jax.vmap(jax.hessian(cost.stage, argnums=1))
    hux = jax.vmap(jax.jacfwd(jax.grad(cost.stage, argnums=1), argnums=0))

    Xs = X[..., :-1, :]
    lx = gx(Xs, U, ts)
    lu = gu(Xs, U, ts)
    lxx = hxx(Xs, U, ts)
    luu = huu(Xs, U, ts)
    lux = hux(Xs, U, ts)
    lfx = jax.grad(cost.terminal)(X[..., -1, :])
    lfxx = jax.hessian(cost.terminal)(X[..., -1, :])
    return lx, lu, lxx, luu, lux, lfx, lfxx
