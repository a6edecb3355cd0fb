"""Cost models for trajectory optimization.

Costs are BATCH-CLOSED callables ``stage(x, u, t) -> scalar-per-state`` /
``terminal(x) -> scalar-per-state`` operating on arbitrary leading batch dims
(the solver is natively batched).  When a cost supplies analytic
quadratizations (``stage_derivs`` / ``terminal_derivs``) the solver uses them;
otherwise it falls back to forward-mode AD (exact but ~5x the linearization
cost when FK sits inside the cost).  The built-in costs cover the benchmark
configs (BASELINE.json): quadratic state tracking (exact derivatives) and
end-effector reaching through the analytic FK Jacobian of kinematics/fk.py
(Gauss-Newton quadratization — standard iLQR practice).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..model.robot import RobotModel
from ..kinematics.fk import ee_pose, ee_position_jacobian_tangent
from ..spatial.batched import mtv, mtm


@dataclasses.dataclass(frozen=True)
class Cost:
    stage: Callable  # (x, u, t) -> (...) cost per state
    terminal: Callable  # (x,) -> (...)
    stage_derivs: Optional[Callable] = None  # (x,u,t)->(lx,lu,lxx,luu,lux)
    terminal_derivs: Optional[Callable] = None  # (x,)->(lfx,lfxx)


def _sq(v):
    return (v * v).sum(-1)


def quadratic_tracking_cost(
    model: RobotModel, x_goal, *, w_q=1.0, w_qd=0.1, w_u=1e-4,
    w_q_f=100.0, w_qd_f=10.0,
) -> Cost:
    """0.5 * weighted quadratic distance to a goal state, plus control effort.
    Exact analytic quadratization.

    Quaternion-root models: the distance is measured in the TANGENT space,
    d = state_diff(x, x_goal) (2*nv), with the root attitude error as the
    log-map rotation vector; the analytic derivatives use the exact tangent
    Jacobian of the diff (inverse right Jacobian on the rotation block,
    exp(d_rot^) transport on the translation block) so lx is the exact
    gradient and lxx its Gauss-Newton quadratic form.
    """
    x_goal = jnp.asarray(x_goal)
    nq, nv = model.nq, model.nv
    quat_root = model.floating_base and model.root_quat
    nx = nq + nv
    ndim = 2 * nv if quat_root else nx
    W = jnp.concatenate([jnp.full(nv if quat_root else nq, w_q),
                         jnp.full(nv, w_qd)])
    Wf = jnp.concatenate([jnp.full(nv if quat_root else nq, w_q_f),
                          jnp.full(nv, w_qd_f)])

    if quat_root:
        from ..spatial.quat import quat_to_R, so3_right_jacobian_inv
        from .integrate import state_diff

        diff = lambda x: state_diff(model, x, x_goal)

        def _ddiff_dxi(d):
            """Tangent Jacobian of the diff: block-diag(Jr^-1(d_rot),
            exp(d_rot^), I) acting on the first 6 tangent coords."""
            drot = d[..., 0:3]
            Jri = so3_right_jacobian_inv(drot)
            from ..spatial.quat import quat_exp

            Rd = quat_to_R(quat_exp(drot))  # R_goal^T R_x = exp(d_rot^)
            return Jri, Rd

        def _derivs(x, W_):
            d = diff(x)
            Jri, Rd = _ddiff_dxi(d)
            g = W_ * d
            # lx = J^T (W d) with J block-diag on the root-pose coords
            g_rot = (Jri * g[..., 0:3, None]).sum(-2)     # Jri^T g
            g_p = (Rd * g[..., 3:6, None]).sum(-2)        # Rd^T g
            lx = jnp.concatenate([g_rot, g_p, g[..., 6:]], axis=-1)
            # GN Hessian J^T W J (batched only on the root blocks)
            batch = x.shape[:-1]
            Hd = jnp.broadcast_to(jnp.diag(W_), batch + (ndim, ndim))
            Hrot = jnp.swapaxes(Jri, -1, -2) @ (W_[0:3, None] * Jri)
            Hp = jnp.swapaxes(Rd, -1, -2) @ (W_[3:6, None] * Rd)
            Hd = Hd.at[..., 0:3, 0:3].set(Hrot)
            Hd = Hd.at[..., 3:6, 3:6].set(Hp)
            return lx, Hd

        def stage(x, u, t):
            d = diff(x)
            return 0.5 * ((W * d * d).sum(-1) + w_u * _sq(u))

        def terminal(x):
            d = diff(x)
            return 0.5 * (Wf * d * d).sum(-1)

        def stage_derivs(x, u, t):
            lx, lxx = _derivs(x, W)
            return (lx, w_u * u, lxx, w_u * jnp.eye(nv),
                    jnp.zeros((nv, ndim), x.dtype))

        def terminal_derivs(x):
            return _derivs(x, Wf)

        return Cost(stage, terminal, stage_derivs, terminal_derivs)

    def stage(x, u, t):
        d = x - x_goal
        return 0.5 * ((W * d * d).sum(-1) + w_u * _sq(u))

    def terminal(x):
        d = x - x_goal
        return 0.5 * (Wf * d * d).sum(-1)

    def stage_derivs(x, u, t):
        d = x - x_goal
        lx = W * d
        lu = w_u * u
        # CONSTANT quadratic terms are returned unbatched ((nx,nx) etc.):
        # the backward pass keeps them as closure constants instead of
        # streaming (B,H,nx,nx) copies through the scan (hundreds of MB at
        # benchmark sizes)
        lxx = jnp.diag(W)
        luu = w_u * jnp.eye(nv)
        lux = jnp.zeros((nv, nx), x.dtype)
        return lx, lu, lxx, luu, lux

    def terminal_derivs(x):
        batch = x.shape[:-1]
        d = x - x_goal
        return Wf * d, jnp.broadcast_to(jnp.diag(Wf), batch + (nx, nx))

    return Cost(stage, terminal, stage_derivs, terminal_derivs)


def ee_reaching_cost(
    model: RobotModel, target_xyz, *, w_ee=1.0, w_qd=1e-2, w_u=1e-4,
    w_ee_f=100.0, w_qd_f=1.0, ee_names=None, fused: bool | None = None,
) -> Cost:
    """Reach a Cartesian end-effector target (the iiwa reaching task of
    BASELINE.json configs[2]); uses the analytic FK (C11) inside the cost and
    the analytic FK Jacobian (C12) for the Gauss-Newton quadratization.

    ``fused``: run the FK + Gauss-Newton terms as ONE Pallas kernel in the
    colvec layout (kernels.fk_lane — the quadratization was ~1/3 of the arm
    MPC iteration on the jnp path).  None = auto: on on TPU when the
    flattened knot batch packs (compile-probe gated); the geometric-Jacobian
    kernel equals the analytic chain derivative to roundoff.

    Every root type quadratizes ANALYTICALLY in the solver's chart
    (kinematics.fk.ee_position_jacobian_tangent): configuration coordinates
    for fixed-base/rpy models, the body-twist tangent for the quaternion
    root (whose lx/lxx therefore have 2*nv tangent dims).
    """
    import numpy as _np

    try:  # static copy for the fused kernel (folded as lane constants);
        # unavailable when the target is itself a tracer -> jnp path
        _tgt_static = tuple(float(t) for t in _np.asarray(target_xyz))
    except Exception:
        _tgt_static = None
    target_xyz = jnp.asarray(target_xyz)
    nq, nv = model.nq, model.nv
    nx = nq + nv
    quat_root = model.floating_base and model.root_quat
    nb_q = nv if quat_root else nq  # config-block size in the solver chart
    ndim = nb_q + nv
    fused_requested = fused

    def _fused_on(flat_batch, dtype):
        if _tgt_static is None:
            return False
        if fused_requested is False:
            return False
        from ..kernels.fk_lane import ee_gn_fused_ok

        if fused_requested is None:
            from ..kernels.fused import _on_tpu

            if not _on_tpu():
                return False
        return ee_gn_fused_ok(model, flat_batch, dtype, ee_names=ee_names)

    def _flat_q(x):
        q = x[..., :nq]
        lead = q.shape[:-1]
        flat = 1
        for b in lead:
            flat *= b
        return q.reshape((flat, nq)), lead, flat

    def _gn_fused(x, gn=True):
        """(e, g0, H0) via the fused kernel, batch-reshaped; None when the
        kernel doesn't apply at this shape.  gn=False: position error only
        (the rollout cost-eval path skips the Jacobian/Hessian outputs)."""
        q, lead, flat = _flat_q(x)
        if flat == 0 or not _fused_on(flat, x.dtype):
            return None
        from ..kernels.fk_lane import ee_gn_fused

        e, g0, H0 = ee_gn_fused(model, q, _tgt_static,
                                ee_names=ee_names, gn=gn)
        if not gn:
            return (e.reshape(lead + (3,)), None, None)
        return (e.reshape(lead + (3,)), g0.reshape(lead + (nb_q,)),
                H0.reshape(lead + (nb_q, nb_q)))

    def ee_err(x):
        out = _gn_fused(x, gn=False)
        if out is not None:
            return out[0]
        q = x[..., :nq]
        pos = ee_pose(model, q, ee_names=ee_names)[..., 0, :3]
        return pos - target_xyz

    def stage(x, u, t):
        e = ee_err(x)
        qd = x[..., nq:]
        return 0.5 * (w_ee * _sq(e) + w_qd * _sq(qd) + w_u * _sq(u))

    def terminal(x):
        e = ee_err(x)
        qd = x[..., nq:]
        return 0.5 * (w_ee_f * _sq(e) + w_qd_f * _sq(qd))

    def _ee_terms(x, w):
        """Gauss-Newton terms of 0.5*w*||e(q)||^2 in the SOLVER chart:
        grad = w J^T e, hess ~= w J^T J through the analytic position
        Jacobian (fused kernel when it applies; identical math).  J has
        nb_q tangent columns (== nq except the quaternion root)."""
        out = _gn_fused(x)
        if out is not None:
            _, g0, H0 = out
            return w * g0, w * H0
        q = x[..., :nq]
        e = ee_err(x)
        J = ee_position_jacobian_tangent(
            model, q, ee_names=ee_names
        )[..., 0, :, :]
        return w * mtv(J, e), w * mtm(J, J)

    def _assemble(g_q, H_qq, g_qd, w_qd_blk, x):
        batch = x.shape[:-1]
        lx = jnp.concatenate([g_q, g_qd], axis=-1)
        top = jnp.concatenate(
            [H_qq, jnp.zeros(batch + (nb_q, nv), x.dtype)], axis=-1
        )
        bot = jnp.concatenate(
            [jnp.zeros(batch + (nv, nb_q), x.dtype),
             jnp.broadcast_to(w_qd_blk * jnp.eye(nv), batch + (nv, nv))],
            axis=-1,
        )
        lxx = jnp.concatenate([top, bot], axis=-2)
        return lx, lxx

    def stage_derivs(x, u, t):
        g_q, H_qq = _ee_terms(x, w_ee)
        lx, lxx = _assemble(g_q, H_qq, w_qd * x[..., nq:], w_qd, x)
        lu = w_u * u
        luu = w_u * jnp.eye(nv)          # constant: see tracking cost note
        lux = jnp.zeros((nv, ndim), x.dtype)
        return lx, lu, lxx, luu, lux

    def terminal_derivs(x):
        g_q, H_qq = _ee_terms(x, w_ee_f)
        return _assemble(g_q, H_qq, w_qd_f * x[..., nq:], w_qd_f, x)

    return Cost(stage, terminal, stage_derivs, terminal_derivs)


def add_limit_barrier(
    model: RobotModel, cost: Cost, *, w_q=100.0, w_qd=10.0,
) -> Cost:
    """Wrap ``cost`` with quadratic-hinge penalties on the model's URDF
    position and velocity limits (``q_lower``/``q_upper``/``velocity_limit``
    — limits the reference discards at parse time):

        0.5 w_q  sum relu(q - q_hi)^2 + relu(q_lo - q)^2
      + 0.5 w_qd sum relu(|qd| - qd_lim)^2

    Exact analytic derivatives (piecewise; the hinge Hessian is the active-set
    indicator diagonal), composed onto the base cost's quadratization so DDP
    and MPPI both consume the limits.  Unbounded coordinates (continuous
    joints, the floating-base root) contribute exactly zero.

    Quaternion-root models: penalties are expressed in the solver's TANGENT
    coordinates — joint positions retract additively, so the q hinge lands on
    tangent rows v_index(i) with unit Jacobian; root rows are unbounded.
    """
    nq, nv = model.nq, model.nv
    quat_root = model.floating_base and model.root_quat
    ndim = 2 * nv if quat_root else nq + nv
    q_lo, q_hi = model.q_limit_vectors()
    qd_lim = model.qd_limit_vector()
    # finite-limit masks as float weights: rows with inf limits produce
    # hinge 0 with 0 gradient (avoid inf - inf under jit by masking)
    q_lo_f = jnp.isfinite(q_lo)
    q_hi_f = jnp.isfinite(q_hi)
    qd_f = jnp.isfinite(qd_lim)
    q_lo_s = jnp.where(q_lo_f, q_lo, 0.0)
    q_hi_s = jnp.where(q_hi_f, q_hi, 0.0)
    qd_s = jnp.where(qd_f, qd_lim, 0.0)

    def _hinges(x):
        q, qd = x[..., :nq], x[..., nq:]
        h_hi = jnp.where(q_hi_f, jnp.maximum(q - q_hi_s, 0.0), 0.0)
        h_lo = jnp.where(q_lo_f, jnp.maximum(q_lo_s - q, 0.0), 0.0)
        h_qd = jnp.where(qd_f, jnp.maximum(jnp.abs(qd) - qd_s, 0.0), 0.0)
        return h_hi, h_lo, h_qd, qd

    def _penalty(x):
        h_hi, h_lo, h_qd, _ = _hinges(x)
        return 0.5 * (
            w_q * ((h_hi * h_hi).sum(-1) + (h_lo * h_lo).sum(-1))
            + w_qd * (h_qd * h_qd).sum(-1)
        )

    def _grad_diag(x):
        """(lx_pen (..., ndim), diag_pen (..., ndim)) in solver coordinates."""
        h_hi, h_lo, h_qd, qd = _hinges(x)
        g_q = w_q * (h_hi - h_lo)                       # d/dq
        d_q = w_q * ((h_hi > 0) | (h_lo > 0)).astype(x.dtype)
        g_qd = w_qd * h_qd * jnp.sign(qd)               # d/dqd
        d_qd = w_qd * (h_qd > 0).astype(x.dtype)
        if quat_root:
            # tangent layout [root twist (6) | joints (nv-6) | qd (nv)]:
            # joint q rows map 1:1 onto tangent rows 6..nv-1 (additive
            # retraction); root pose rows are unbounded by construction
            zroot = jnp.zeros(x.shape[:-1] + (6,), x.dtype)
            g = jnp.concatenate([zroot, g_q[..., 7:], g_qd], axis=-1)
            d = jnp.concatenate([zroot, d_q[..., 7:], d_qd], axis=-1)
            return g, d
        return (jnp.concatenate([g_q, g_qd], axis=-1),
                jnp.concatenate([d_q, d_qd], axis=-1))

    def stage(x, u, t):
        return cost.stage(x, u, t) + _penalty(x)

    def terminal(x):
        return cost.terminal(x) + _penalty(x)

    if cost.stage_derivs is None or cost.terminal_derivs is None:
        # base cost quadratizes by AD; the wrapped stage/terminal are
        # AD-differentiable (hinges are piecewise smooth), so let the solver's
        # AD fallback handle everything
        return Cost(stage, terminal, None, None)

    def _addx(lx, lxx, x):
        g, d = _grad_diag(x)
        batch_t = x.shape[:-1] + (ndim, ndim)
        lxx_b = jnp.broadcast_to(lxx, batch_t) if lxx.ndim == 2 else lxx
        eye = jnp.eye(ndim, dtype=x.dtype)
        return lx + g, lxx_b + d[..., None] * eye

    def stage_derivs(x, u, t):
        lx, lu, lxx, luu, lux = cost.stage_derivs(x, u, t)
        lx, lxx = _addx(lx, lxx, x)
        return lx, lu, lxx, luu, lux

    def terminal_derivs(x):
        lfx, lfxx = cost.terminal_derivs(x)
        return _addx(lfx, lfxx, x)

    return Cost(stage, terminal, stage_derivs, terminal_derivs)


def trajectory_cost(cost: Cost, X, U):
    """Total cost: X (..., H+1, nx), U (..., H, nv) -> (...).  Batch-closed."""
    H = U.shape[-2]
    ts = jnp.arange(H)
    stage_costs = cost.stage(X[..., :-1, :], U, ts)
    return stage_costs.sum(-1) + cost.terminal(X[..., -1, :])


def quadratize_trajectory(cost: Cost, X, U, model: RobotModel | None = None):
    """Per-knot cost expansions: analytic forms when the cost provides them,
    AD otherwise.  Batch-closed on the analytic path; the AD path vmaps over
    flattened (batch, time).

    Quaternion-root models (pass ``model``): the AD fallback differentiates in
    the TANGENT space — c(xi, u) = cost(state_retract(x, xi), u) at xi = 0 —
    so lx/lxx have the solver's 2*nv dimensions; analytic derivs are trusted
    to already be tangent-space (the built-in costs are).

    Returns (lx, lu, lxx, luu, lux, lfx, lfxx) with (..., H, ...) stage terms.
    """
    H = U.shape[-2]
    ts = jnp.arange(H)
    Xs = X[..., :-1, :]

    if cost.stage_derivs is not None and cost.terminal_derivs is not None:
        lx, lu, lxx, luu, lux = cost.stage_derivs(Xs, U, ts)
        lfx, lfxx = cost.terminal_derivs(X[..., -1, :])
        return lx, lu, lxx, luu, lux, lfx, lfxx

    # AD fallback: flatten leading batch dims, vmap over knots
    batch = U.shape[:-2]
    nx = X.shape[-1]
    nu = U.shape[-1]
    Xf = Xs.reshape((-1, nx))
    Uf = U.reshape((-1, nu))
    tf = jnp.broadcast_to(ts, batch + (H,)).reshape((-1,))

    quat_root = model is not None and model.floating_base and model.root_quat
    if quat_root:
        from .integrate import state_retract

        ndim = 2 * model.nv
        stage_t = lambda xi, x, u, t: cost.stage(
            state_retract(model, x, xi), u, t
        )
        term_t = lambda xi, x: cost.terminal(state_retract(model, x, xi))
        z = jnp.zeros((ndim,), X.dtype)
        gx = jax.vmap(lambda x, u, t: jax.grad(stage_t)(z, x, u, t))
        hxx = jax.vmap(lambda x, u, t: jax.hessian(stage_t)(z, x, u, t))
        hux = jax.vmap(
            lambda x, u, t: jax.jacfwd(
                lambda xi: jax.grad(stage_t, argnums=2)(xi, x, u, t)
            )(z)
        )
        gfx = jax.vmap(lambda x: jax.grad(term_t)(z, x))
        hfxx = jax.vmap(lambda x: jax.hessian(term_t)(z, x))
    else:
        ndim = nx
        gx = jax.vmap(jax.grad(cost.stage, argnums=0))
        hxx = jax.vmap(jax.hessian(cost.stage, argnums=0))
        hux = jax.vmap(jax.jacfwd(jax.grad(cost.stage, argnums=1), argnums=0))
        gfx = jax.vmap(jax.grad(cost.terminal))
        hfxx = jax.vmap(jax.hessian(cost.terminal))

    gu = jax.vmap(jax.grad(cost.stage, argnums=1))
    huu = jax.vmap(jax.hessian(cost.stage, argnums=1))

    rs = lambda a: a.reshape(batch + (H,) + a.shape[1:])
    lx = rs(gx(Xf, Uf, tf))
    lu = rs(gu(Xf, Uf, tf))
    lxx = rs(hxx(Xf, Uf, tf))
    luu = rs(huu(Xf, Uf, tf))
    lux = rs(hux(Xf, Uf, tf))
    XT = X[..., -1, :].reshape((-1, nx))
    lfx = gfx(XT).reshape(batch + (ndim,))
    lfxx = hfxx(XT).reshape(batch + (ndim, ndim))
    return lx, lu, lxx, luu, lux, lfx, lfxx
