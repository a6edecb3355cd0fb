"""DDP / iLQR trajectory optimizer — the MPC engine around the dynamics core.

New TPU-first design (the reference has no solver; its gradients exist to feed
one, RBDReference.py:1347-1351 / SURVEY.md §1 "above L3 sits nothing in-repo"):

  - rollout: lax.scan over the horizon with O(n) ABA steps;
  - linearization: ONE vmapped batched sweep over all H knots
    (rnea_grad + Minv per knot — the "fused batched Jacobian kernel feeding the
    DDP backward sweep" of SURVEY.md C4);
  - backward Riccati sweep: lax.scan (sequential in H by nature, SURVEY.md §7
    hard parts) with Levenberg regularization on Quu;
  - forward pass: ALL line-search step sizes evaluated in parallel (vmap over
    the alpha ladder — width replaces the serial backtracking loop), the best
    improving candidate selected with a masked argmax;
  - failure detection (SURVEY.md §5): non-PD Quu -> regularization backoff;
    no improving alpha -> keep nominal, raise regularization.

Everything is jit-compatible with a FIXED iteration count; convergence is
handled by masking (no data-dependent Python control flow).  Batched solves =
``jax.vmap(solve)`` over initial states / goals.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..model.robot import RobotModel
from .costs import Cost, trajectory_cost, quadratize_trajectory
from .rollout import rollout, linearize_trajectory
from .integrate import split_state, euler_semi_implicit
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
    tol_dJ: float = 1e-9


class DDPState(NamedTuple):
    X: jax.Array  # (H+1, nx) nominal states
    U: jax.Array  # (H, nv) nominal controls
    J: jax.Array  # scalar cost
    reg: jax.Array  # scalar regularization
    dJ: jax.Array  # last accepted improvement


def backward_pass(A, B, lx, lu, lxx, luu, lux, lfx, lfxx, reg):
    """Riccati sweep (scan, leaf<-root in time).  Returns (k, K, dV1, ok)."""
    nu = lu.shape[-1]
    eye_u = jnp.eye(nu, dtype=lu.dtype)

    def step(carry, inp):
        Vx, Vxx, ok = carry
        A_t, B_t, lx_t, lu_t, lxx_t, luu_t, lux_t = inp
        Qx = lx_t + A_t.T @ Vx
        Qu = lu_t + B_t.T @ Vx
        Qxx = lxx_t + A_t.T @ Vxx @ A_t
        Quu = luu_t + B_t.T @ Vxx @ B_t
        Qux = lux_t + B_t.T @ Vxx @ A_t
        Quu_reg = Quu + reg * eye_u
        # PD check via Cholesky (checkify-free NaN guard, SURVEY.md §5)
        L = jnp.linalg.cholesky(Quu_reg)
        pd = jnp.all(jnp.isfinite(L))
        k = -jnp.linalg.solve(Quu_reg, Qu)
        K = -jnp.linalg.solve(Quu_reg, Qux)
        Vx_new = Qx + K.T @ Quu @ k + K.T @ Qu + Qux.T @ k
        Vxx_new = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
        Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
        dV1 = k @ Qu
        return (Vx_new, Vxx_new, ok & pd), (k, K, dV1)

    init = (lfx, lfxx, jnp.array(True))
    inputs = (A, B, lx, lu, lxx, luu, lux)
    # scan from the end of the horizon backwards
    rev = lambda t: jnp.flip(t, axis=0)
    (Vx, Vxx, ok), (k, K, dV1) = jax.lax.scan(
        step, init, jax.tree.map(rev, inputs)
    )
    return rev(k), rev(K), jnp.sum(dV1), ok


def forward_pass(model: RobotModel, cost: Cost, X, U, k, K, alphas, dt, gravity):
    """Closed-loop rollouts for every alpha in the ladder, in parallel.

    Returns (Xs, Us, Js): candidate trajectories (n_alpha, H+1, nx) and costs.
    """
    def one_alpha(alpha):
        def step(x, inp):
            X_t, U_t, k_t, K_t = inp
            u = U_t + alpha * k_t + K_t @ (x - X_t)
            q, qd = split_state(model, x)
            qdd = aba(model, q, qd, u, gravity=gravity)
            x_next = euler_semi_implicit(model, x, qdd, dt)
            return x_next, (x_next, u)

        _, (X_tail, U_new) = jax.lax.scan(step, X[0], (X[:-1], U, k, K))
        X_new = jnp.concatenate([X[:1], X_tail], axis=0)
        return X_new, U_new, trajectory_cost(cost, X_new, U_new)

    return jax.vmap(one_alpha)(alphas)


def ddp_solve(
    model: RobotModel,
    cost: Cost,
    x0,
    U0,
    config: DDPConfig = DDPConfig(),
):
    """Solve one trajectory-optimization problem.  Fully jit-able; vmap for
    batched solves.  Returns the final DDPState."""
    dt, gravity = config.dt, config.gravity
    alphas = 2.0 ** -jnp.arange(config.n_alphas, dtype=x0.dtype)

    X0 = rollout(model, x0, U0, dt, gravity)
    J0 = trajectory_cost(cost, X0, U0)
    state = DDPState(
        X=X0, U=U0, J=J0,
        reg=jnp.asarray(config.reg_init, x0.dtype),
        dJ=jnp.asarray(jnp.inf, x0.dtype),
    )

    def iteration(state: DDPState, _):
        A, B = linearize_trajectory(model, state.X, state.U, dt, gravity)
        lx, lu, lxx, luu, lux, lfx, lfxx = quadratize_trajectory(
            cost, state.X, state.U
        )
        k, K, dV1, ok = backward_pass(
            A, B, lx, lu, lxx, luu, lux, lfx, lfxx, state.reg
        )
        Xs, Us, Js = forward_pass(
            model, cost, state.X, state.U, k, K, alphas, dt, gravity
        )
        Js = jnp.where(jnp.isfinite(Js), Js, jnp.inf)
        best = jnp.argmin(Js)
        J_best = Js[best]
        improved = ok & (J_best < state.J)
        X_new = jnp.where(improved, Xs[best], state.X)
        U_new = jnp.where(improved, Us[best], state.U)
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
