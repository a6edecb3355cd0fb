"""Analytical RNEA gradient: dc/dq and dc/dqd, batched.

Reimplements reference C4 (``rnea_grad_fpass_dq`` RBDReference.py:1127-1187,
``rnea_grad_fpass_dqd`` :1189-1255, ``rnea_grad_bpass_dq`` :1257-1297,
``rnea_grad_bpass_dqd`` :1299-1343, driver ``rnea_grad`` :1345-1368) as a fused
batched Jacobian sweep (SURVEY.md §3.2: "per body a (6,n) GEMM" — here each
body's derivative block update is one batched multiply-reduce over all n
columns at once, with the single derivative-column injections done via static
`.at[]` updates).  Transforms come as an unstacked per-body list and all small
contractions take the VPU broadcast-multiply-reduce path (spatial.batched).

Fixed-base path is the exact analytical algorithm (the parity oracle).  For
floating-base models the rpy-root derivative identities the reference assumes do
not hold per-coordinate (its fb grad path is flagged broken, SURVEY.md §2.1), so
``rnea_grad`` falls back to ``jax.jacfwd`` of the (exact, fb-correct) RNEA —
still jit/vmap-compatible and machine-precision exact.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..model.robot import RobotModel
from ..spatial.ops import cross_motion, cross_force
from ..spatial.batched import mm, mtm, mtv
from .rnea import gravity_accel, rnea
from .xforms import joint_transforms_list


def _cross_motion_cols(M, s):
    """For M (..., 6, n): column-wise crm(M[:, c]) @ s -> (..., 6, n)."""
    cols = jnp.swapaxes(M, -1, -2)  # (..., n, 6)
    out = cross_motion(cols, jnp.broadcast_to(s, cols.shape))
    return jnp.swapaxes(out, -1, -2)


def _cross_force_cols(M, f):
    """Column-wise crf(M[:, c]) @ f -> (..., 6, n)."""
    cols = jnp.swapaxes(M, -1, -2)
    f_cols = jnp.broadcast_to(f[..., None, :], cols.shape)
    out = cross_force(cols, f_cols)
    return jnp.swapaxes(out, -1, -2)


def _cross_force_by(v, M):
    """Column-wise crf(v) @ M[:, c] -> (..., 6, n) for fixed motion vector v."""
    cols = jnp.swapaxes(M, -1, -2)
    out = cross_force(jnp.broadcast_to(v[..., None, :], cols.shape), cols)
    return jnp.swapaxes(out, -1, -2)


def rnea_grad_fpass(model: RobotModel, Xs, qd, v, a, gravity=-9.81,
                    full: bool = False):
    """Both forward derivative sweeps (dq and dqd) fused in one pass over bodies
    (they share X, v, Iv and the column-cross structure; reference runs them as
    two separate loops :1127 and :1189).

    v, a: (..., NB, 6) stacked kinematics from rnea.
    Returns (df_dq, df_dqd): lists of (..., 6, n) per body; with ``full=True``
    all six derivative lists (dv_dq, da_dq, df_dq, dv_dqd, da_dqd, df_dqd) —
    the reference's separately-returned fpass intermediates (:1127, :1189),
    surfaced for the compat layer's granular pass methods.

    Floating base: valid for the dqd pass and the JOINT columns of the dq
    pass (the root's S = eye(6) is constant and joint coordinates do not move
    the root, so the recursions hold; root dq-columns stay zero).  The 6
    root-POSE dq-columns involve Euler-angle coupling and are filled by the
    driver via 6 forward-mode tangents — the piece the reference's fb grad
    got wrong (SURVEY.md §2.1).
    """
    nb, n = model.nb, model.nv
    batch = Xs[0].shape[:-2]
    dt = Xs[0].dtype
    a_grav = gravity_accel(gravity, dt)

    dv_q = [None] * nb
    da_q = [None] * nb
    df_q = [None] * nb
    dv_d = [None] * nb
    da_d = [None] * nb
    df_d = [None] * nb

    for i in range(nb):
        p = model.parent[i]
        Xi = Xs[i]
        if model.floating_base and i == 0:
            zeros = jnp.zeros(batch + (6, n), dt)
            # dq joint-columns of the root are zero; dqd: dv = eye block,
            # da = d(crm(v)v) = 0 (motion cross is antisymmetric)
            dvq, daq = zeros, zeros
            dvd = zeros.at[..., :, 0:6].add(jnp.eye(6, dtype=dt))
            dad = zeros
            Ii = model.I[i]
            vi = v[..., i, :]
            Iv = (Ii * vi[..., None, :]).sum(-1)
            dfq = zeros
            dfd = (
                mm(Ii, dad) + _cross_force_cols(dvd, Iv)
                + _cross_force_by(vi, mm(Ii, dvd))
            )
            dv_q[i], da_q[i], df_q[i] = dvq, daq, dfq
            dv_d[i], da_d[i], df_d[i] = dvd, dad, dfd
            continue
        S = model.S[i]
        qi = model.v_index(i)
        qd_i = qd[..., qi]
        zeros = jnp.zeros(batch + (6, n), dt)

        if p == -1:
            dvq = zeros
            daq_base = zeros
            Xa_ref = (Xi * a_grav).sum(-1)
            dvd = zeros.at[..., :, qi].add(S)
            dad_base = zeros
        else:
            dvq = mm(Xi, dv_q[p])
            Xv = (Xi * v[..., p, None, :]).sum(-1)
            dvq = dvq.at[..., :, qi].add(cross_motion(Xv, S))
            daq_base = mm(Xi, da_q[p])
            Xa_ref = (Xi * a[..., p, None, :]).sum(-1)
            dvd = mm(Xi, dv_d[p]).at[..., :, qi].add(S)
            dad_base = mm(Xi, da_d[p])

        daq = daq_base + qd_i[..., None, None] * _cross_motion_cols(dvq, S)
        daq = daq.at[..., :, qi].add(cross_motion(Xa_ref, S))
        dad = dad_base + qd_i[..., None, None] * _cross_motion_cols(dvd, S)
        dad = dad.at[..., :, qi].add(cross_motion(v[..., i, :], S))

        Ii = model.I[i]
        vi = v[..., i, :]
        Iv = (Ii * vi[..., None, :]).sum(-1)
        dfq = mm(Ii, daq) + _cross_force_cols(dvq, Iv) + _cross_force_by(vi, mm(Ii, dvq))
        dfd = mm(Ii, dad) + _cross_force_cols(dvd, Iv) + _cross_force_by(vi, mm(Ii, dvd))

        dv_q[i], da_q[i], df_q[i] = dvq, daq, dfq
        dv_d[i], da_d[i], df_d[i] = dvd, dad, dfd

    if full:
        return dv_q, da_q, df_q, dv_d, da_d, df_d
    return df_q, df_d


def rnea_grad_bpass(model: RobotModel, Xs, f, df_q, df_d, use_damping=False):
    """Both backward derivative sweeps fused (reference :1257-1297 and
    :1299-1343).  f: (..., NB, 6) accumulated forces from rnea.
    Returns (dc_dq, dc_dqd) each (..., n, n)."""
    nb, n = model.nb, model.nv
    batch = Xs[0].shape[:-2]
    dt = Xs[0].dtype
    dc_dq = jnp.zeros(batch + (n, n), dt)
    dc_dqd = jnp.zeros(batch + (n, n), dt)
    df_q = list(df_q)
    df_d = list(df_d)

    for i in range(nb - 1, -1, -1):
        p = model.parent[i]
        if model.floating_base and i == 0:
            # S = eye(6): the root's 6 dc rows are the df blocks directly
            dc_dq = dc_dq.at[..., 0:6, :].set(df_q[i])
            dc_dqd = dc_dqd.at[..., 0:6, :].set(df_d[i])
            continue
        S = model.S[i]
        qi = model.v_index(i)
        dc_dq = dc_dq.at[..., qi, :].set((S[:, None] * df_q[i]).sum(-2))
        dc_dqd = dc_dqd.at[..., qi, :].set((S[:, None] * df_d[i]).sum(-2))
        if p != -1:
            Xi = Xs[i]
            df_q[p] = mtm(Xi, df_q[i]) + df_q[p]
            # d(X^T f)/dq_i correction: X^T crf(S) f, injected into column qi.
            # The reference uses fxS(S, f) = -crm(f) @ S here (:166-168,
            # :1278) which equals crf(S) f ONLY for angular-only S — a
            # reference bug for prismatic joints (its rnea_grad disagrees
            # with finite differences of its own rnea on prismatic chains;
            # found by the exact native second-order sweep, tests/test_idsva).
            delta = mtv(Xi, cross_force(S, f[..., i, :]))
            df_q[p] = df_q[p].at[..., :, qi].add(delta)
            df_d[p] = mtm(Xi, df_d[i]) + df_d[p]

    if use_damping:
        diag = jnp.zeros((n,), dt)
        for i in range(nb):
            if model.floating_base and i == 0:
                for k in range(6):
                    diag = diag.at[k].add(model.damping[0])
            else:
                diag = diag.at[model.v_index(i)].add(model.damping[i])
        dc_dqd = dc_dqd + jnp.eye(n, dtype=dt) * diag

    return dc_dq, dc_dqd


def rnea_grad(
    model: RobotModel,
    q,
    qd,
    qdd=None,
    gravity: float = -9.81,
    use_damping: bool = False,
    split: bool = False,
):
    """d(tau)/d(q, qd) of inverse dynamics.

    Returns (..., n, 2n) hstacked like the reference (RBDReference.py:1367), or a
    (dc_dq, dc_dqd) tuple when split=True.
    """
    Xs = joint_transforms_list(model, q)
    c, v, a, f = rnea(model, q, qd, qdd, gravity)
    df_q, df_d = rnea_grad_fpass(model, Xs, qd, v, a, gravity)
    dc_dq, dc_dqd = rnea_grad_bpass(model, Xs, f, df_q, df_d, use_damping)
    if model.floating_base:
        # the analytic dq pass leaves the 6 root-POSE columns zero (Euler
        # angle coupling breaks the per-column crm identities there — the
        # reference's fb grad bug, SURVEY.md §2.1); fill them exactly with
        # 6 forward-mode tangents through the fb-correct RNEA.  For a
        # quaternion root the columns are TANGENT-space derivatives (d tau /
        # d [dtheta; dp_body] through the retraction — the coordinates the
        # tangent-space solver linearizes in, solver/integrate.py).
        qdd_arg = qdd if qdd is not None else jnp.zeros_like(qd)

        if model.root_quat:
            from ..spatial.quat import quat_exp, quat_mul, quat_to_R

            def tau_of_root(d6, root7, q_rest, qd_, qdd_):
                quat = quat_mul(root7[..., 3:7], quat_exp(d6[..., 0:3]))
                p = root7[..., 0:3] + (
                    quat_to_R(root7[..., 3:7]) * d6[..., None, 3:6]
                ).sum(-1)
                q_full = jnp.concatenate([p, quat, q_rest], axis=-1)
                return rnea(model, q_full, qd_, qdd_, gravity)[0]

            zero6 = jnp.zeros(q.shape[:-1] + (6,), q.dtype)
            J6 = _batched_jac(tau_of_root, 0)(
                zero6, q[..., 0:7], q[..., 7:], qd, qdd_arg
            )
        else:
            def tau_of_root(r6, q_rest, qd_, qdd_):
                q_full = jnp.concatenate([r6, q_rest], axis=-1)
                return rnea(model, q_full, qd_, qdd_, gravity)[0]

            J6 = _batched_jac(tau_of_root, 0)(
                q[..., 0:6], q[..., 6:], qd, qdd_arg
            )
        dc_dq = dc_dq.at[..., :, 0:6].set(J6)
    if split:
        return dc_dq, dc_dqd
    return jnp.concatenate([dc_dq, dc_dqd], axis=-1)


def _batched_jac(fn, argnum):
    """jacfwd that maps over arbitrary leading batch dims (last dim = coords)."""
    def wrapped(*args):
        jac = jax.jacfwd(fn, argnums=argnum)
        lead = args[0].ndim - 1
        if lead > 0:
            batch_shape = args[0].shape[:-1]
            flat = [a.reshape((-1, a.shape[-1])) for a in args]
            out = jax.vmap(jac)(*flat)
            return out.reshape(batch_shape + out.shape[1:])
        return jac(*args)
    return wrapped
