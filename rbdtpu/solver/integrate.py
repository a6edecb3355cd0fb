"""State representation, integrators, and tangent-space geometry for the MPC
engine.

The reference stops at qdd (its consumers are "trajectory optimization
algorithms", RBDReference.py:1347-1351); the rollout layer is new TPU-first
design (SURVEY.md §5 "horizon H is the sequential dimension — lax.scan").

State x = [q; qd] (nq + nv).  Semi-implicit (symplectic) Euler is the default:
stable for stiff manipulator dynamics at the dt used by the benchmark configs.

Quaternion-root models (model.root_quat, nq != nv): the configuration lives on
R^3 x S^3 x R^(nb-1) and the solver works in the 2*nv-dimensional TANGENT
space.  ``config_retract`` / ``config_diff`` define the local chart (root
rotation tangent = body-frame rotation vector, root translation tangent =
body-frame displacement — the same coordinates as the root twist, so d/dt of
the pose tangent IS the velocity), and ``euler_semi_implicit`` integrates the
root on the manifold via the quaternion exponential.  The rpy root keeps the
reference's flat q + dt*qd semantics for oracle parity.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..model.robot import RobotModel
from ..spatial.quat import (
    quat_exp, quat_log, quat_mul, quat_conj, quat_normalize, quat_to_R,
)


def pack_state(q, qd):
    return jnp.concatenate([q, qd], axis=-1)


def split_state(model: RobotModel, x):
    return x[..., : model.nq], x[..., model.nq :]


def config_retract(model: RobotModel, q, xi):
    """q (+) xi: apply a tangent step xi (..., nv) to a configuration
    (..., nq).  Flat for every coordinate except a quaternion root, where
    xi[0:3] is a body-frame rotation vector and xi[3:6] a body-frame
    translation (matching the root twist ordering [omega; v])."""
    if not (model.floating_base and model.root_quat):
        return q + xi
    p, quat, rest = q[..., 0:3], q[..., 3:7], q[..., 7:]
    dth, dp, drest = xi[..., 0:3], xi[..., 3:6], xi[..., 6:]
    quat_new = quat_normalize(quat_mul(quat, quat_exp(dth)))
    p_new = p + (quat_to_R(quat) * dp[..., None, :]).sum(-1)
    return jnp.concatenate([p_new, quat_new, rest + drest], axis=-1)


def config_diff(model: RobotModel, q1, q0):
    """q1 (-) q0 -> tangent (..., nv): inverse of ``config_retract`` to first
    order (exact for the rotation via the quaternion log)."""
    if not (model.floating_base and model.root_quat):
        return q1 - q0
    dth = quat_log(quat_mul(quat_conj(q0[..., 3:7]), q1[..., 3:7]))
    R0 = quat_to_R(q0[..., 3:7])
    dp = ((q1[..., 0:3] - q0[..., 0:3])[..., :, None] * R0).sum(-2)  # R0^T d
    return jnp.concatenate([dth, dp, q1[..., 7:] - q0[..., 7:]], axis=-1)


def state_retract(model: RobotModel, x, xi):
    """x (+) xi with xi (..., 2*nv) = [config tangent; velocity delta]."""
    if not (model.floating_base and model.root_quat):
        return x + xi
    q, qd = split_state(model, x)
    n = model.nv
    return pack_state(
        config_retract(model, q, xi[..., :n]), qd + xi[..., n:]
    )


def state_diff(model: RobotModel, x1, x0):
    """x1 (-) x0 -> (..., 2*nv) tangent.  == x1 - x0 unless quaternion root."""
    if not (model.floating_base and model.root_quat):
        return x1 - x0  # flat chart: one subtract, no split/concat
    q1, qd1 = split_state(model, x1)
    q0, qd0 = split_state(model, x0)
    return jnp.concatenate([config_diff(model, q1, q0), qd1 - qd0], axis=-1)


def euler_semi_implicit(model: RobotModel, x, qdd, dt: float):
    """x' = [q (+) dt*qd', qd + dt*qdd] with qd' = qd + dt*qdd.

    Flat coordinates for the rpy root (reference semantics); manifold
    retraction for the quaternion root."""
    q, qd = split_state(model, x)
    qd_new = qd + dt * qdd
    if model.floating_base and model.root_quat:
        q_new = config_retract(model, q, dt * qd_new)
    else:
        q_new = q + dt * qd_new
    return pack_state(q_new, qd_new)


def step_jacobians(model: RobotModel, Mi, dqdd_dq, dqdd_dqd, dt: float,
                   qd_new=None):
    """Exact Jacobians A = dx'/dx, B = dx'/du of the semi-implicit Euler step
    given the continuous-time derivatives (from ``forward_dynamics_full``).

    A = [[I + dt² ∂qdd/∂q,  dt I + dt² ∂qdd/∂qd],
         [dt   ∂qdd/∂q,     I    + dt  ∂qdd/∂qd]]
    B = [[dt² M⁻¹], [dt M⁻¹]]       (∂qdd/∂u = M⁻¹)

    Both are (2*nv x 2*nv / 2*nv x nv) — for quaternion-root models these are
    TANGENT-space Jacobians: ∂qdd/∂q must then hold tangent columns
    (``rnea_grad`` provides this) and the root POSE rows get the exact SO(3)
    transport terms of the manifold retraction, which need the post-step root
    twist ``qd_new`` (..., nv):

      δθ' = exp(-ŵ) ξθ + dt·Jr(w) δω'            w  = dt·ω'
      δp' = exp(-ŵ)(ξp + dt ξθ×v' + dt δv')      v' = post-step linear twist

    (first-order expansion of log/exp around the nominal step — exact tangent
    linearization of ``euler_semi_implicit``'s retraction).
    """
    n = model.nv
    dt2 = dt * dt
    eye = jnp.eye(n, dtype=Mi.dtype)
    A_qq = eye + dt2 * dqdd_dq
    A_qv = dt * eye + dt2 * dqdd_dqd
    A_vq = dt * dqdd_dq
    A_vv = eye + dt * dqdd_dqd
    B_v = dt * Mi
    B_q = dt2 * Mi
    if model.floating_base and model.root_quat:
        from ..spatial.ops import skew
        from ..spatial.quat import so3_right_jacobian

        if qd_new is None:
            raise ValueError("quaternion-root step_jacobians needs qd_new")
        w = dt * qd_new[..., 0:3]
        vl = qd_new[..., 3:6]
        Rt = quat_to_R(quat_exp(-w))  # exp(-w^)
        Jr = so3_right_jacobian(w)
        # velocity rows of the root: V = [A_vq; A_vv] restricted to rows 0:6
        Vq_r, Vv_r = A_vq[..., 0:6, :], A_vv[..., 0:6, :]
        Bv_r = B_v[..., 0:6, :]
        # T2 @ (root velocity rows): block-diagonal [dt Jr, dt Rt]
        T2 = jnp.concatenate(
            [
                jnp.concatenate([dt * Jr, jnp.zeros_like(Jr)], axis=-1),
                jnp.concatenate([jnp.zeros_like(Rt), dt * Rt], axis=-1),
            ],
            axis=-2,
        )
        pose_q = jnp.einsum("...ij,...jk->...ik", T2, Vq_r)
        pose_v = jnp.einsum("...ij,...jk->...ik", T2, Vv_r)
        pose_B = jnp.einsum("...ij,...jk->...ik", T2, Bv_r)
        # T1: identity-transport of the input pose tangent
        zero3 = jnp.zeros_like(Rt)
        T1 = jnp.concatenate(
            [
                jnp.concatenate([Rt, zero3], axis=-1),
                jnp.concatenate([-dt * (Rt @ skew(vl)), Rt], axis=-1),
            ],
            axis=-2,
        )
        pose_q = pose_q.at[..., :, 0:6].add(T1)
        A_qq = A_qq.at[..., 0:6, :].set(pose_q)
        A_qv = A_qv.at[..., 0:6, :].set(pose_v)
        B_q = B_q.at[..., 0:6, :].set(pose_B)
    A = jnp.concatenate(
        [
            jnp.concatenate([A_qq, A_qv], axis=-1),
            jnp.concatenate([A_vq, A_vv], axis=-1),
        ],
        axis=-2,
    )
    B = jnp.concatenate([B_q, B_v], axis=-2)
    return A, B
