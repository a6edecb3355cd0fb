"""Control-sequence parity at the NORTH-STAR config (BASELINE.json:
"MPC control parity, iiwa-class arm, H=100, max |u - u_ref| <= 1e-6").

Fixed base: the full TPU-stack DDP vs a serial numpy DDP driven by the
REFERENCE dynamics (RBDReference.forward_dynamics/.minv/.rnea_grad).  Same
cost, integrator, Riccati recursion and line-search rule on both sides; the
only difference is the dynamics engine (our batched JAX kernels vs the
reference's serial numpy).  f64 end to end, several random problems.

Floating base: the reference's own fb dynamics paths are broken (SURVEY.md
§2.1: minv dense fill, f_ext chain), so the mirror is the same serial numpy
DDP driven by OUR dynamics evaluated one sample at a time in f64 — an
independent SOLVER path (serial numpy Riccati/line-search vs batched JAX) —
plus a finite-difference cross-check of the fb linearization itself.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rbdtpu.dynamics import forward_dynamics, forward_dynamics_full
from rbdtpu.oracle.ddp_numpy import NumpyDDP, QuadTrackingCostNp
from rbdtpu.solver import (
    DDPConfig, ddp_solve, linearize_trajectory, quadratic_tracking_cost,
)

H = 100
ITERS = 10
DT = 0.01
N_PROBLEMS = 3


@pytest.mark.slow
def test_ddp_control_parity_northstar(arm7, oracle, rng):
    """North-star config: H=100, 10 iterations, 3 random problems, 1e-6."""
    x_goals = np.stack([
        np.concatenate([rng.uniform(-0.4, 0.4, arm7.nq), np.zeros(arm7.nv)])
        for _ in range(N_PROBLEMS)
    ])
    x0s = np.stack([
        np.concatenate([rng.uniform(-0.2, 0.2, arm7.nq), np.zeros(arm7.nv)])
        for _ in range(N_PROBLEMS)
    ])

    from rbdtpu.dynamics import rnea

    cfg = DDPConfig(iters=ITERS, dt=DT, n_alphas=8, rollout_route="minv",
                    parallel_riccati=False)  # mirror the numpy oracle sweep
    for p in range(N_PROBLEMS):
        # gravity-compensation warm start: a zero-torque nominal physically
        # diverges over the 1 s horizon (same as bench.py's MPC config)
        q0 = jnp.array(x0s[p][: arm7.nq])
        zero = jnp.zeros(arm7.nv)
        u_hold = np.asarray(rnea(arm7, q0, zero, zero)[0])
        U0 = np.broadcast_to(u_hold, (H, arm7.nv)).copy()

        # --- ours (JAX, f64 on CPU) ---
        cost = quadratic_tracking_cost(arm7, jnp.array(x_goals[p]))
        state, _ = ddp_solve(
            arm7, cost, jnp.array(x0s[p]), jnp.array(U0), cfg
        )
        U_ours = np.asarray(state.U)

        # --- reference-driven numpy mirror ---
        np_cost = QuadTrackingCostNp(arm7.nq, arm7.nv, x_goals[p])
        np_ddp = NumpyDDP(oracle, arm7.nq, arm7.nv, dt=DT, iters=ITERS)
        _, U_ref, J_ref = np_ddp.solve(np_cost, x0s[p], U0)

        err = np.abs(U_ours - U_ref).max()
        assert err < 1e-6, f"problem {p}: max |u - u_ref| = {err:.3e}"
        assert abs(float(state.J) - J_ref) / max(1.0, abs(J_ref)) < 1e-9


class _JaxDrivenNumpyDDP(NumpyDDP):
    """NumpyDDP whose per-knot dynamics come from OUR f64 jnp algorithms,
    one sample at a time (independent serial solver path for fb models,
    where the reference dynamics is broken — SURVEY.md §2.1)."""

    def __init__(self, model, **kw):
        super().__init__(None, model.nq, model.nv, **kw)
        self.model = model
        # Minv route: matches DDPConfig(rollout_route="minv") exactly
        self._fd = jax.jit(
            lambda q, qd, u: forward_dynamics(model, q, qd, u)
        )
        self._full = jax.jit(
            lambda q, qd, u: forward_dynamics_full(model, q, qd, u)
        )

    def fd(self, q, qd, u):
        return np.asarray(self._fd(q, qd, u))

    def step_jac(self, x, u):
        q, qd = x[: self.nq], x[self.nq:]
        _, Mi, dqdd_dq, dqdd_dqd = map(np.asarray, self._full(q, qd, u))
        n, dt = self.nv, self.dt
        eye = np.eye(n)
        A = np.block([
            [eye + dt * dt * dqdd_dq, dt * eye + dt * dt * dqdd_dqd],
            [dt * dqdd_dq, eye + dt * dqdd_dqd],
        ])
        B = np.concatenate([dt * dt * Mi, dt * Mi], axis=0)
        return A, B


@pytest.mark.slow
def test_ddp_control_parity_floating_base(quadruped12fb, rng):
    """fb control parity: batched JAX DDP vs the serial numpy DDP (driven by
    our own f64 dynamics, sample at a time) at 1e-6."""
    m = quadruped12fb
    Hf, itf = 40, 6
    q0 = np.zeros(m.nq)
    q0[2] = 0.35
    q0 += 0.05 * rng.standard_normal(m.nq)
    x0 = np.concatenate([q0, np.zeros(m.nv)])
    x_goal = np.zeros(m.nq + m.nv)
    x_goal[2] = 0.4
    U0 = np.zeros((Hf, m.nv))

    cfg = DDPConfig(iters=itf, dt=DT, n_alphas=8, rollout_route="minv",
                    parallel_riccati=False)  # mirror the numpy oracle sweep
    cost = quadratic_tracking_cost(m, jnp.array(x_goal))
    state, _ = ddp_solve(m, cost, jnp.array(x0), jnp.array(U0), cfg)
    U_ours = np.asarray(state.U)

    np_cost = QuadTrackingCostNp(m.nq, m.nv, x_goal)
    np_ddp = _JaxDrivenNumpyDDP(m, dt=DT, iters=itf)
    _, U_ref, J_ref = np_ddp.solve(np_cost, x0, U0)

    err = np.abs(U_ours - U_ref).max()
    assert err < 1e-6, f"fb: max |u - u_ref| = {err:.3e}"
    assert abs(float(state.J) - J_ref) / max(1.0, abs(J_ref)) < 1e-9


@pytest.mark.slow
def test_fb_linearization_matches_finite_differences(quadruped12fb, rng):
    """The fb discrete Jacobians (analytic rnea_grad incl. the root-pose
    columns) match central finite differences of the step function."""
    m = quadruped12fb
    nx = m.nq + m.nv
    x = np.concatenate([
        0.3 * rng.standard_normal(m.nq), 0.3 * rng.standard_normal(m.nv)
    ])
    u = rng.uniform(-1, 1, m.nv)

    X2 = jnp.array(x)[None, None, :].repeat(2, axis=1)
    A, B = linearize_trajectory(m, X2, jnp.array(u)[None, None, :], DT)
    A, B = np.asarray(A)[0, 0], np.asarray(B)[0, 0]

    from rbdtpu.solver import euler_semi_implicit, split_state

    def step_np(x, u):
        q, qd = x[: m.nq], x[m.nq:]
        qdd = forward_dynamics(m, jnp.array(q), jnp.array(qd), jnp.array(u))
        return np.asarray(
            euler_semi_implicit(m, jnp.array(x), qdd, DT)
        )

    eps = 1e-6
    A_fd = np.zeros_like(A)
    for j in range(nx):
        dxj = np.zeros(nx)
        dxj[j] = eps
        A_fd[:, j] = (step_np(x + dxj, u) - step_np(x - dxj, u)) / (2 * eps)
    B_fd = np.zeros_like(B)
    for j in range(m.nv):
        duj = np.zeros(m.nv)
        duj[j] = eps
        B_fd[:, j] = (step_np(x, u + duj) - step_np(x, u - duj)) / (2 * eps)
    np.testing.assert_allclose(A, A_fd, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(B, B_fd, rtol=1e-5, atol=1e-6)
