"""State representation and integrators for the MPC engine.

The reference stops at qdd (its consumers are "trajectory optimization
algorithms", RBDReference.py:1347-1351); the rollout layer is new TPU-first
design (SURVEY.md §5 "horizon H is the sequential dimension — lax.scan").

State x = [q; qd] (nq + nv).  Semi-implicit (symplectic) Euler is the default:
stable for stiff manipulator dynamics at the dt used by the benchmark configs.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..model.robot import RobotModel


def pack_state(q, qd):
    return jnp.concatenate([q, qd], axis=-1)


def split_state(model: RobotModel, x):
    return x[..., : model.nq], x[..., model.nq :]


def euler_semi_implicit(model: RobotModel, x, qdd, dt: float):
    """x' = [q + dt*qd', qd + dt*qdd] with qd' = qd + dt*qdd."""
    q, qd = split_state(model, x)
    qd_new = qd + dt * qdd
    q_new = q + dt * qd_new
    return pack_state(q_new, qd_new)


def step_jacobians(model: RobotModel, Mi, dqdd_dq, dqdd_dqd, dt: float):
    """Exact Jacobians A = dx'/dx, B = dx'/du of the semi-implicit Euler step
    given the continuous-time derivatives (from ``forward_dynamics_full``).

    A = [[I + dt² ∂qdd/∂q,  dt I + dt² ∂qdd/∂qd],
         [dt   ∂qdd/∂q,     I    + dt  ∂qdd/∂qd]]
    B = [[dt² M⁻¹], [dt M⁻¹]]       (∂qdd/∂u = M⁻¹)
    """
    n = model.nv
    dt2 = dt * dt
    eye = jnp.eye(n, dtype=Mi.dtype)
    A_qq = eye + dt2 * dqdd_dq
    A_qv = dt * eye + dt2 * dqdd_dqd
    A_vq = dt * dqdd_dq
    A_vv = eye + dt * dqdd_dqd
    A = jnp.concatenate(
        [
            jnp.concatenate([A_qq, A_qv], axis=-1),
            jnp.concatenate([A_vq, A_vv], axis=-1),
        ],
        axis=-2,
    )
    B = jnp.concatenate([dt2 * Mi, dt * Mi], axis=-2)
    return A, B
