"""DDP / iLQR trajectory optimizer — the MPC engine around the dynamics core.

New TPU-first design (the reference has no solver; its gradients exist to feed
one, RBDReference.py:1347-1351 / SURVEY.md §1 "above L3 sits nothing in-repo"):

  - NATIVELY BATCHED: every function takes arbitrary leading batch dims on
    (x0, U0) and solves all problems in one program — the unit of work is a
    batch, never a single state (SURVEY.md §7).  vmap still works, but the
    explicit batch is what lets the fused Pallas rollout kernel engage;
  - rollout / line-search rollouts: lax.scan over the horizon; with
    ``DDPConfig.fused=True`` (fixed-base models) each step is ONE fused
    Pallas kernel (ABA + integrator, kernels.fused);
  - linearization: ONE batched sweep over all H knots at once (rnea_grad +
    Minv per knot — the "fused batched Jacobian kernel feeding the DDP
    backward sweep" of SURVEY.md C4);
  - backward Riccati sweep: lax.scan over time (sequential by nature,
    SURVEY.md §7 hard parts), with the UNROLLED batched Cholesky for the Quu
    solves (jnp.linalg's batched small factorizations lower to loops on TPU
    and dominated the sweep) and Levenberg regularization;
  - forward pass: ALL line-search step sizes evaluated in parallel (the
    alpha ladder is one more batch dim), best improving candidate selected
    with a masked argmin per problem;
  - failure detection (SURVEY.md §5): non-PD Quu -> NaN in the unrolled
    Cholesky -> pd=False -> regularization backoff; no improving alpha ->
    keep nominal, raise regularization.

Everything is jit-compatible with a FIXED iteration count; convergence is
handled by masking (no data-dependent Python control flow).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..model.robot import RobotModel
from ..spatial.batched import (
    mm, mtm, mv, mtv, cholesky_small, cholesky_solve_small,
)
from .costs import Cost, trajectory_cost, quadratize_trajectory
from .rollout import linearize_trajectory
from .integrate import split_state, euler_semi_implicit, state_diff
from ..dynamics.aba import aba


@dataclasses.dataclass(frozen=True)
class DDPConfig:
    iters: int = 20
    dt: float = 0.01
    gravity: float = -9.81
    reg_init: float = 1e-6
    reg_min: float = 1e-9
    reg_max: float = 1e6
    reg_up: float = 10.0
    reg_down: float = 0.5
    n_alphas: int = 8  # parallel line-search ladder 1, 1/2, ..., 2^-(n-1)
    # minimum RELATIVE improvement to accept a candidate: J_new <
    # J - tol_dJ*max(1, |J|).  Makes the accept/reject decision deterministic
    # at convergence — without it, rounding-level (~1e-13) "improvements" are
    # accepted or rejected inconsistently across executions, which breaks
    # control parity between independent implementations of the same solver
    tol_dJ: float = 1e-12
    fused: bool = False  # use the fused Pallas step kernel for rollouts
    # fused Pallas linearization: None = auto (follows ``fused``; the colvec
    # columns-in-sublanes kernel covers fixed AND floating base with
    # fast Mosaic compiles — kernels.colvec)
    fused_linearize: bool | None = None
    # O(log H) associative-scan Riccati (solver.parallel_riccati) instead of
    # the sequential scan — exact-regularization convention.  None = AUTO:
    # parallel when the flattened problem batch is tiny (<= 4) and H >= 100,
    # the measured win regime (v5e, nx=14: 4.6x at B=1/H=200, wash at B=8,
    # batch-dominated beyond — BASELINE.md "Riccati backward sweep")
    parallel_riccati: bool | None = None
    # rollout dynamics route for the un-fused step: "aba" (O(n), default) or
    # "minv" (Minv + RNEA, BASELINE configs[1] path — the exact mirror of the
    # oracle's forward_dynamics for control-parity runs)
    rollout_route: str = "aba"
    # FULL DDP (exact dynamics Hessians): fold the second-order forward-
    # dynamics tensors (dynamics.fdsva_so — the native IDSVA-SO sweep,
    # reference C10) into the backward pass (Qxx/Qux gain Vx . Fxx terms).
    # Off = iLQR (Gauss-Newton), the usual default
    exact_hessians: bool = False
    # fused feedback-rollout line search (kernels.feedback_rollout_fused):
    # None = auto (on whenever ``fused``, the packed K gain blocks fit
    # VMEM — kernels.fused.feedback_fused_ok — AND the flattened
    # alpha x batch lane count is >= 256, its measured win regime; at tiny
    # batches the jnp pass is faster — r5: humanoid B=16 full_iter 9.5 vs
    # 8.3 ms); True = force the kernel at any size and additionally allow
    # the chunked-K tier when the unchunked kernel doesn't fit (measured
    # SLOWER than the jnp pass at large-batch humanoid — 857.7 vs 881.1
    # solves/s at Bm=256/H=32 — hence opt-in); False = force the jnp
    # forward pass (used by equivalence tests)
    fused_feedback: bool | None = None
    # fused Riccati backward sweep.  Two kernels by size regime:
    # lane-scalar (kernels.riccati, arm-class nx <= 16 — measured LOSS at
    # arm B=128, stays opt-in) and the chunked-batch VMEM-resident sweep
    # (kernels.riccati_chunk, nx ~24-40 — measured 2.7x over the jnp sweep
    # at quadruped B=1024/nx=36, the #1 solver phase there).  None = AUTO:
    # chunked kernel when the probe passes and nx is in its measured win
    # regime; True = force-try fused (lane-scalar at small nx, chunked
    # otherwise); False = always the jnp sweep (equivalence tests)
    fused_riccati: bool | None = None
    # box control limits from the model's URDF <limit effort> bounds
    # (model.u_limit_vector): clamp every applied control in the line-search
    # rollouts (and the initial rollout), so accepted trajectories are
    # feasible by construction.  Clamped line search (Tassa 2014's "naive
    # clamping"): the Riccati gains stay unconstrained; the forward pass
    # projects — the line-search rejection guard keeps it monotone
    u_limits: bool = False


class DDPState(NamedTuple):
    X: jax.Array  # (..., H+1, nx) nominal states
    U: jax.Array  # (..., H, nv) nominal controls
    J: jax.Array  # (...) cost
    reg: jax.Array  # (...) regularization
    dJ: jax.Array  # (...) last accepted improvement


def _step_plain(model, x, u, dt, gravity, route="aba", f_ext=None):
    q, qd = split_state(model, x)
    if route == "minv":
        from ..dynamics.fd import forward_dynamics

        qdd = forward_dynamics(model, q, qd, u, gravity=gravity, f_ext=f_ext)
    else:
        qdd = aba(model, q, qd, u, f_ext=f_ext, gravity=gravity)
    return euler_semi_implicit(model, x, qdd, dt)


def _make_step(model, config):
    if config.fused:
        from ..kernels.fused import fd_step_fused

        def step(x, u):
            batch = x.shape[:-1]
            flat = 1
            for b in batch:
                flat *= b
            if flat % 8 == 0:
                xf = fd_step_fused(
                    model, x.reshape(flat, x.shape[-1]),
                    u.reshape(flat, u.shape[-1]), config.dt, config.gravity,
                )
                return xf.reshape(x.shape)
            return _step_plain(model, x, u, config.dt, config.gravity)

        return step
    return lambda x, u: _step_plain(
        model, x, u, config.dt, config.gravity, config.rollout_route
    )


def _make_linearize(model, config):
    use_fused_lin = (
        config.fused_linearize
        if config.fused_linearize is not None
        else config.fused
    )
    if use_fused_lin:
        from ..kernels.colvec import linearize_fused, linearize_fused_ok

        def lin(X, U):
            q, qd = split_state(model, X[..., :-1, :])
            lead = q.shape[:-1]
            flat = 1
            for b in lead:
                flat *= b
            # compile-probe gate (kernels.probe): a Mosaic-side failure at
            # this batch size degrades to the jnp path instead of crashing
            if flat % 8 == 0 and linearize_fused_ok(model, flat, X.dtype):
                A, B = linearize_fused(
                    model, q.reshape(flat, q.shape[-1]),
                    qd.reshape(flat, qd.shape[-1]),
                    U.reshape(flat, U.shape[-1]),
                    config.dt, config.gravity,
                )
                return (A.reshape(lead + A.shape[1:]),
                        B.reshape(lead + B.shape[1:]))
            return linearize_trajectory(model, X, U, config.dt, config.gravity)

        return lin
    return lambda X, U: linearize_trajectory(
        model, X, U, config.dt, config.gravity
    )


def backward_pass(A, B, lx, lu, lxx, luu, lux, lfx, lfxx, reg, fxx=None,
                  dt=None):
    """Riccati sweep over the horizon (axis -3 of A is time when batched?
    No — time is the LEADING axis after vmovement below).  All args carry
    arbitrary leading batch dims with time at axis -(rank_of_entry): callers
    pass (..., H, n, m) tensors; the scan runs over the H axis.

    ``fxx``: optional (Hq, Hvq, Hvv, Htq) second-order forward-dynamics
    tensors, each (..., H, n, n, n) (dynamics.fdsva_so layout), for FULL DDP:
    Qxx/Qux gain the Vx-contracted dynamics curvature of the semi-implicit
    Euler step (requires ``dt``).

    Returns (k (..., H, nu), K (..., H, nu, nx), dV1 (...), ok (...))."""
    nu = lu.shape[-1]
    eye_u = jnp.eye(nu, dtype=lu.dtype)

    # move time axis to front for the scan: (..., H, ...) -> (H, ..., ...).
    # CONSTANT quadratic cost terms (plain (n, m) arrays, no batch/time —
    # see costs.quadratic_tracking_cost) stay closure constants instead of
    # being streamed through the scan as (B, H, n, m) copies.
    tmove = lambda x, r: jnp.moveaxis(x, -r, 0)
    A_t = tmove(A, 3)
    B_t = tmove(B, 3)
    lx_t = tmove(lx, 2)
    lu_t = tmove(lu, 2)
    timed = {}
    const = {}
    for name, arr in (("lxx", lxx), ("luu", luu), ("lux", lux)):
        if arr.ndim == 2:
            const[name] = arr
        else:
            timed[name] = tmove(arr, 3)
    if fxx is not None:
        nq2 = fxx[0].shape[-1]
        for name, arr in zip(("Hq", "Hvq", "Hvv", "Htq"), fxx):
            timed[name] = tmove(arr, 4)

    batch = lfx.shape[:-1]
    reg_b = jnp.broadcast_to(reg, batch)

    def step(carry, inp):
        Vx, Vxx, ok = carry
        A_s, B_s, lx_s, lu_s, extras = inp
        lxx_s = extras.get("lxx", const.get("lxx"))
        luu_s = extras.get("luu", const.get("luu"))
        lux_s = extras.get("lux", const.get("lux"))
        VxxA = mm(Vxx, A_s)
        VxxB = mm(Vxx, B_s)
        Qx = lx_s + mtv(A_s, Vx)
        Qu = lu_s + mtv(B_s, Vx)
        Qxx = lxx_s + mtm(A_s, VxxA)
        Quu = luu_s + mtm(B_s, VxxB)
        Qux = lux_s + mtm(B_s, VxxA)
        if fxx is not None:
            # FULL DDP: Vx . d2(step)/dz2.  The semi-implicit Euler step has
            # qd' = qd + dt qdd, q' = q + dt qd', so every second derivative
            # of x' is (dt^2 Vq'_r + dt Vqd'_r) d2qdd_r — one weight vector
            # contracted against the fdsva_so tensors
            n = nq2
            w = dt * dt * Vx[..., :n] + dt * Vx[..., n:]
            Wqq = jnp.einsum("...r,...rjk->...jk", w, extras["Hq"])
            Wvq = jnp.einsum("...r,...rjk->...jk", w, extras["Hvq"])
            Wvv = jnp.einsum("...r,...rjk->...jk", w, extras["Hvv"])
            Wtq = jnp.einsum("...r,...rjk->...jk", w, extras["Htq"])
            top = jnp.concatenate([Wqq, jnp.swapaxes(Wvq, -1, -2)], axis=-1)
            bot = jnp.concatenate([Wvq, Wvv], axis=-1)
            Qxx = Qxx + jnp.concatenate([top, bot], axis=-2)
            Qux = Qux + jnp.concatenate(
                [Wtq, jnp.zeros_like(Wtq)], axis=-1
            )
        if fxx is not None:
            # FULL-DDP gains use STATE regularization (Tassa 2012): the
            # exact-curvature terms can make Vxx/Quu indefinite far from the
            # optimum, so gains come from Vxx + reg I while the value
            # recursion keeps the exact quantities
            eye_x = jnp.eye(A_s.shape[-1], dtype=lu.dtype)
            VxxR = Vxx + reg_b[..., None, None] * eye_x
            Quu_hat = luu_s + mtm(B_s, mm(VxxR, B_s)) + \
                reg_b[..., None, None] * eye_u
            Qux_hat = Qux - mtm(B_s, VxxA) + mtm(B_s, mm(VxxR, A_s))
            L = cholesky_small(Quu_hat)
            pd = jnp.all(jnp.isfinite(L), axis=(-1, -2))
            k = -cholesky_solve_small(L, Qu)
            K = -cholesky_solve_small(L, Qux_hat)
        else:
            Quu_reg = Quu + reg_b[..., None, None] * eye_u
            # PD check + solves via unrolled batched Cholesky: non-PD -> NaN
            # -> pd False (failure-detection guard, SURVEY.md §5)
            L = cholesky_small(Quu_reg)
            pd = jnp.all(jnp.isfinite(L), axis=(-1, -2))
            k = -cholesky_solve_small(L, Qu)
            K = -cholesky_solve_small(L, Qux)
        QuuK = mm(Quu, K)
        Vx_new = Qx + mtv(K, mv(Quu, k)) + mtv(K, Qu) + mtv(Qux, k)
        Vxx_new = Qxx + mtm(K, QuuK) + mtm(K, Qux) + mtm(Qux, K)
        Vxx_new = 0.5 * (Vxx_new + jnp.swapaxes(Vxx_new, -1, -2))
        dV1 = (k * Qu).sum(-1)
        return (Vx_new, Vxx_new, ok & pd), (k, K, dV1)

    init = (lfx, lfxx, jnp.ones(batch, bool))
    inputs = (A_t, B_t, lx_t, lu_t, timed)
    rev = lambda t: jnp.flip(t, axis=0)
    (Vx, Vxx, ok), (k, K, dV1) = jax.lax.scan(
        step, init, jax.tree.map(rev, inputs)
    )
    k = jnp.moveaxis(rev(k), 0, -2)
    K = jnp.moveaxis(rev(K), 0, -3)
    return k, K, jnp.sum(dV1, axis=0), ok


def forward_pass(model: RobotModel, cost: Cost, X, U, k, K, alphas, dt,
                 gravity, step_fn=None, u_clip=None, f_ext=None):
    """Closed-loop rollouts for every alpha in the ladder, in parallel, for
    every problem in the batch.

    X (..., H+1, nx), U/k (..., H, nv), K (..., H, nv, nx), alphas (n_alpha,).
    u_clip: optional (nv,) box bound; applied controls are clamped to
    [-u_clip, u_clip].  f_ext: optional (H, NB, 6) per-knot disturbance
    wrenches (pre-normalized); a caller-supplied step_fn must then accept
    (x, u, fe) — the default step handles both arities.
    Returns (Xs, Us, Js) with a leading n_alpha axis before the batch dims.
    """
    if step_fn is None:
        if f_ext is not None:
            step_fn = lambda x, u, fe: _step_plain(model, x, u, dt, gravity,
                                                   f_ext=fe)
        else:
            step_fn = lambda x, u: _step_plain(model, x, u, dt, gravity)
    n_alpha = alphas.shape[0]
    batch = U.shape[:-2]
    # broadcast against (n_alpha, *batch, nv) control vectors
    al = alphas.reshape((n_alpha,) + (1,) * (len(batch) + 1))

    # broadcast everything over the alpha axis
    bx = lambda x: jnp.broadcast_to(x[None], (n_alpha,) + x.shape)
    X_b, U_b, k_b, K_b = bx(X), bx(U), bx(k), bx(K)

    tmove = lambda x, r: jnp.moveaxis(x, -r, 0)
    inputs = (tmove(X_b[..., :-1, :], 2), tmove(U_b, 2), tmove(k_b, 2),
              tmove(K_b, 3))
    if f_ext is not None:
        inputs = inputs + (f_ext,)

    def step(x, inp):
        X_t, U_t, k_t, K_t = inp[:4]
        # tangent-space feedback (== x - X_t unless quaternion root)
        u = U_t + al * k_t + mv(K_t, state_diff(model, x, X_t))
        if u_clip is not None:
            u = jnp.clip(u, -u_clip, u_clip)
        x_next = step_fn(x, u, inp[4]) if f_ext is not None else step_fn(x, u)
        return x_next, (x_next, u)

    x0 = X_b[..., 0, :]
    _, (X_tail, U_new) = jax.lax.scan(step, x0, inputs)
    X_tail = jnp.moveaxis(X_tail, 0, -2)
    U_new = jnp.moveaxis(U_new, 0, -2)
    X_new = jnp.concatenate([X_b[..., 0:1, :], X_tail], axis=-2)
    Js = trajectory_cost(cost, X_new, U_new)
    return X_new, U_new, Js


def forward_pass_fused(model: RobotModel, cost: Cost, X, U, k, K, alphas,
                       dt, gravity, u_clip=None, nchunks=None, f_ext=None):
    """forward_pass with the feedback law fused into the rollout kernel
    (kernels.feedback_rollout_fused): the whole alpha ladder x problem batch
    flattens into one packed lane batch, scanned with zero per-step layout
    ops.  Same contract as forward_pass (u_clip clamps inside the kernel
    as static lane constants).  nchunks selects the chunked-K variant
    (kernels.feedback_rollout_fused_chunked) for K-gain blocks that exceed
    VMEM in one piece (large-batch humanoid line search).  f_ext: optional
    (H, NB, 6) per-knot disturbance wrenches applied INSIDE the kernel
    (r5: robust MPC at fused speed — VERDICT r4 #4)."""
    from ..kernels.fused import (feedback_rollout_fused,
                                 feedback_rollout_fused_chunked)

    n_alpha = alphas.shape[0]
    batch = U.shape[:-2]
    bx = lambda a: jnp.broadcast_to(a[None], (n_alpha,) + a.shape)
    al = alphas.reshape((n_alpha,) + (1,) * (len(batch) + 2))
    k_eff = al * bx(k)
    nb_lead = len(batch) + 1
    flat = lambda a: a.reshape((-1,) + a.shape[nb_lead:])
    X_b, U_b, K_b, k_b = flat(bx(X)), flat(bx(U)), flat(bx(K)), flat(k_eff)
    if nchunks is None:
        X_new, U_new = feedback_rollout_fused(
            model, X_b[..., 0, :], X_b[..., :-1, :], U_b, k_b, K_b, dt,
            gravity, u_clip=u_clip, f_ext=f_ext,
        )
    else:
        X_new, U_new = feedback_rollout_fused_chunked(
            model, X_b[..., 0, :], X_b[..., :-1, :], U_b, k_b, K_b, dt,
            gravity, u_clip=u_clip, nchunks=nchunks, f_ext=f_ext,
        )
    lead = (n_alpha,) + batch
    X_new = jnp.concatenate([X_b[..., 0:1, :], X_new], axis=-2)
    X_new = X_new.reshape(lead + X_new.shape[1:])
    U_new = U_new.reshape(lead + U_new.shape[1:])
    Js = trajectory_cost(cost, X_new, U_new)
    return X_new, U_new, Js


def ddp_solve(
    model: RobotModel,
    cost: Cost,
    x0,
    U0,
    config: DDPConfig = DDPConfig(),
    f_ext=None,
):
    """Solve trajectory-optimization problem(s): x0 (..., nx), U0 (..., H, nv)
    with arbitrary (possibly empty) leading batch dims.  Fully jit-able.
    Returns (DDPState, J_history (iters, ...)).

    f_ext: optional per-body world-frame disturbance wrenches, (NB, 6)
    constant or (H, NB, 6) per-knot (solver.rollout.normalize_f_ext) — the
    robust-MPC surface of VERDICT r3 item 6.  EVERY rollout (initial nominal
    + all line-search candidates) applies the wrenches with exact
    ``dynamics.aba(f_ext)`` semantics, so the accepted trajectory is
    dynamically consistent under the disturbance; the accepted cost is the
    true disturbed cost.  Linearizations keep the undisturbed A, B (the
    state-dependence of the body-frame wrench mapping is dropped — standard
    disturbance-aware iLQR practice; the line search on true disturbed
    rollouts preserves descent and the fixed point).  r5: the fused step and
    feedback kernels carry the wrench input natively (compact Xa-chain
    composition in-kernel), so robust MPC runs at fused speed; the jnp path
    remains the probe fallback (VERDICT r4 #4).
    """
    dt, gravity = config.dt, config.gravity
    from .rollout import normalize_f_ext

    F = normalize_f_ext(model, f_ext, U0.shape[-2], x0.dtype)
    alphas = 2.0 ** -jnp.arange(config.n_alphas, dtype=x0.dtype)
    batch = x0.shape[:-1]
    step_fn = _make_step(model, config)
    if F is not None:
        def _plain_fe(x, u, fe):
            return _step_plain(model, x, u, dt, gravity,
                               config.rollout_route, f_ext=fe)

        if config.fused:
            from ..kernels.fused import fd_step_fused

            def step_fn_fe(x, u, fe):
                b = x.shape[:-1]
                flat = 1
                for s in b:
                    flat *= s
                if flat % 8 == 0:
                    xf = fd_step_fused(
                        model, x.reshape(flat, x.shape[-1]),
                        u.reshape(flat, u.shape[-1]), dt, gravity,
                        f_ext=fe,
                    )
                    return xf.reshape(x.shape)
                return _plain_fe(x, u, fe)
        else:
            step_fn_fe = _plain_fe
    lin_fn = _make_linearize(model, config)
    u_clip = (
        model.u_limit_vector().astype(x0.dtype) if config.u_limits else None
    )
    if u_clip is not None:
        U0 = jnp.clip(U0, -u_clip, u_clip)

    def roll0(x, U):
        if F is not None:
            def step_fe(xc, inp):
                u, fe = inp
                xn = step_fn_fe(xc, u, fe)
                return xn, xn
            U_t = jnp.moveaxis(U, -2, 0)
            _, X_t = jax.lax.scan(step_fe, x, (U_t, F))
            X = jnp.moveaxis(X_t, 0, -2)
            return jnp.concatenate([x[..., None, :], X], axis=-2)

        def step(xc, u):
            xn = step_fn(xc, u)
            return xn, xn
        U_t = jnp.moveaxis(U, -2, 0)
        _, X_t = jax.lax.scan(step, x, U_t)
        X = jnp.moveaxis(X_t, 0, -2)
        return jnp.concatenate([x[..., None, :], X], axis=-2)

    H_len = U0.shape[-2]
    batch_flat = 1
    for b in batch:
        batch_flat *= b
    use_parallel = (
        config.parallel_riccati
        if config.parallel_riccati is not None
        else (
            batch_flat <= 4 and H_len >= 100
            and jax.default_backend() == "tpu"  # measured win regime is
            # accelerator-only; CPU (tests, oracle parity) keeps the
            # sequential sweep's iterate path
        )
    )
    if config.exact_hessians and use_parallel:
        if config.parallel_riccati:
            raise ValueError(
                "parallel_riccati solves the LQR subproblem and cannot fold "
                "the exact-Hessian fxx terms; use the sequential sweep"
            )
        use_parallel = False  # auto mode defers to the exact-Hessian sweep
    # fused feedback rollout: whole (alpha x batch) line search in packed
    # lane layout, feedback law (tangent-space, incl. the quat-root manifold
    # diff) and the static effort-box clamp inside the dynamics kernel.
    # Large-batch humanoid-size K gain blocks (nv*2nv rows) exceed VMEM ->
    # jnp pass (kernels.fused.feedback_fused_ok), unless fused_feedback=True
    # explicitly opts into the chunked-K tier
    # (kernels.feedback_rollout_fused_chunked) — MEASURED at humanoid
    # Bm=256/H=32: chunked 857.7 vs jnp 881.1 solves/s (BASELINE.md), so the
    # extra per-knot kernel launches lose to XLA's batched jnp pass at large
    # batch and auto mode stops at the unchunked kernel.  r5: disturbance
    # wrenches ride inside the kernels (with_fext probes), so F no longer
    # forces the jnp pass
    from ..kernels.fused import feedback_chunked_ok, feedback_fused_ok

    fwd_nchunks = None
    with_fe = F is not None
    # auto floor (r5 measured): the feedback kernel's win regime is large
    # lane batches (arm B*alphas=1024: 2.4x; quadruped 6k: -27% iter); at
    # tiny batches it LOSES to the jnp pass (humanoid B=16*8=128 lanes:
    # full_iter 9.5 vs 8.3 ms with it off; same direction in r4).  None =
    # auto applies the floor; True forces the kernel at any size.
    auto_fb = batch_flat * config.n_alphas >= 256
    use_fused_fwd = (
        config.fused
        and config.fused_feedback is not False
        and (config.fused_feedback is True or auto_fb)
        and feedback_fused_ok(model, batch_flat * config.n_alphas, x0.dtype,
                              with_fext=with_fe)
    )
    if (not use_fused_fwd and config.fused
            and config.fused_feedback is True):
        fwd_nchunks = feedback_chunked_ok(
            model, batch_flat * config.n_alphas, x0.dtype, with_fext=with_fe
        )
        use_fused_fwd = fwd_nchunks is not None
    # fused Riccati backward sweep (see DDPConfig.fused_riccati).  Auto
    # policy (measured, BASELINE.md r5): the chunked VMEM-resident kernel
    # wins at quadruped-class nx (2.7x at nx=36 B=1024); the lane-scalar
    # kernel measured a LOSS at arm nx=14, so small nx stays jnp unless
    # forced.  use_fused_bwd selects lane-scalar, use_chunk_bwd the chunked
    # kernel; both match the iLQR branch only.
    nx_dim = model.nq + model.nv if not model.root_quat else 2 * model.nv
    use_fused_bwd = False
    use_chunk_bwd = False
    if not config.exact_hessians and not use_parallel:
        if config.fused_riccati and nx_dim <= 16:
            from ..kernels.riccati import riccati_fused_ok

            use_fused_bwd = riccati_fused_ok(
                nx_dim, model.nv, batch_flat, x0.dtype
            )
        else:
            from ..kernels.fused import _on_tpu
            from ..kernels.riccati_chunk import riccati_chunk_ok

            # auto engages on TPU only: off-TPU the kernel would run in
            # interpret mode (tests opt in explicitly with
            # fused_riccati=True at small sizes)
            import os
            chunk_nx_min = int(os.environ.get("RBDTPU_CHUNK_NX_MIN", "24"))
            want = (
                config.fused_riccati
                or (config.fused_riccati is None and nx_dim >= chunk_nx_min
                    and _on_tpu())
            )
            if want:
                # the kernel arity depends on which cost blocks are
                # CONSTANT — resolve the exact combination with a free
                # shape-only trace so the probe compiles what will run
                H_ = U0.shape[-2]
                nxs = x0.shape[-1]
                qshape = jax.eval_shape(
                    lambda X_, U_: quadratize_trajectory(
                        cost, X_, U_, model=model),
                    jax.ShapeDtypeStruct(batch + (H_ + 1, nxs), x0.dtype),
                    jax.ShapeDtypeStruct(batch + (H_, model.nv), x0.dtype),
                )
                consts = tuple(
                    nm for nm, arr in zip(("lxx", "luu", "lux"), qshape[2:5])
                    if arr.ndim == 2
                )
                use_chunk_bwd = riccati_chunk_ok(
                    nx_dim, model.nv, batch_flat, x0.dtype,
                    const_blocks=consts,
                )

    X0 = roll0(x0, U0)
    J0 = trajectory_cost(cost, X0, U0)
    state = DDPState(
        X=X0, U=U0, J=J0,
        reg=jnp.full(batch, config.reg_init, x0.dtype),
        dJ=jnp.full(batch, jnp.inf, x0.dtype),
    )

    def iteration(state: DDPState, _):
        A, B = lin_fn(state.X, state.U)
        lx, lu, lxx, luu, lux, lfx, lfxx = quadratize_trajectory(
            cost, state.X, state.U, model=model
        )
        fxx = None
        if config.exact_hessians:
            # All three root types: dynamics.fdsva_so returns tangent-chart
            # tensors for the quaternion root (the native sweep captures the
            # retraction curvature of tau exactly — dynamics.idsva).  For the
            # quat root the STEP's own second-order transport terms (the
            # curvature of euler_semi_implicit's retraction, whose first
            # derivative is step_jacobians' T1/T2 blocks) are omitted from
            # the Vx contraction — the dominant dynamics-curvature terms are
            # exact, first-order A/B stay exact, and the line search on true
            # rollouts preserves descent (validated: tests/test_idsva.py
            # quat exact-Hessian DDP descent test)
            from ..dynamics.idsva import fdsva_so

            q, qd = split_state(model, state.X[..., :-1, :])
            fxx = fdsva_so(model, q, qd, state.U, gravity)
        if use_parallel:
            from .parallel_riccati import backward_pass_parallel

            k, K, dV1, ok = backward_pass_parallel(
                A, B, lx, lu, lxx, luu, lux, lfx, lfxx, state.reg
            )
        elif use_fused_bwd:
            from ..kernels.riccati import backward_pass_fused

            k, K, dV1, ok = backward_pass_fused(
                A, B, lx, lu, lxx, luu, lux, lfx, lfxx, state.reg
            )
        elif use_chunk_bwd:
            from ..kernels.riccati_chunk import backward_pass_chunked

            k, K, dV1, ok = backward_pass_chunked(
                A, B, lx, lu, lxx, luu, lux, lfx, lfxx, state.reg
            )
        else:
            k, K, dV1, ok = backward_pass(
                A, B, lx, lu, lxx, luu, lux, lfx, lfxx, state.reg,
                fxx=fxx, dt=dt,
            )
        if use_fused_fwd:
            Xs, Us, Js = forward_pass_fused(
                model, cost, state.X, state.U, k, K, alphas, dt, gravity,
                u_clip=u_clip, nchunks=fwd_nchunks, f_ext=F,
            )
        elif F is not None:
            Xs, Us, Js = forward_pass(
                model, cost, state.X, state.U, k, K, alphas, dt, gravity,
                step_fn_fe, u_clip=u_clip, f_ext=F,
            )
        else:
            Xs, Us, Js = forward_pass(
                model, cost, state.X, state.U, k, K, alphas, dt, gravity,
                step_fn, u_clip=u_clip,
            )
        Js = jnp.where(jnp.isfinite(Js), Js, jnp.inf)  # (n_alpha, ...)
        best = jnp.argmin(Js, axis=0)  # (...)
        J_best = jnp.min(Js, axis=0)

        def take(arr):
            idx = best.reshape(
                (1,) + best.shape + (1,) * (arr.ndim - 1 - best.ndim)
            )
            idx = jnp.broadcast_to(idx, (1,) + arr.shape[1:])
            return jnp.take_along_axis(arr, idx, axis=0)[0]

        X_best = take(Xs)
        U_best = take(Us)
        min_dJ = config.tol_dJ * jnp.maximum(1.0, jnp.abs(state.J))
        improved = ok & (J_best < state.J - min_dJ)
        sel = lambda c, a, b: jnp.where(
            c.reshape(c.shape + (1,) * (a.ndim - c.ndim)), a, b
        )
        X_new = sel(improved, X_best, state.X)
        U_new = sel(improved, U_best, state.U)
        J_new = jnp.where(improved, J_best, state.J)
        reg_new = jnp.clip(
            jnp.where(improved, state.reg * config.reg_down,
                      state.reg * config.reg_up),
            config.reg_min, config.reg_max,
        )
        dJ = jnp.where(improved, state.J - J_best, 0.0)
        return DDPState(X_new, U_new, J_new, reg_new, dJ), J_new

    state, J_hist = jax.lax.scan(
        iteration, state, None, length=config.iters
    )
    return state, J_hist
