"""Solver tests: rollout correctness, DDP convergence on a small reaching task,
MPPI improvement, and linearization consistency with AD (SURVEY.md §4).
Small horizon/model keeps CPU compile time bounded.
"""
import jax
import jax.numpy as jnp
import numpy as np

from rbdtpu import dynamics as dyn
from rbdtpu.solver import (
    DDPConfig, MPPIConfig, ddp_solve, ee_reaching_cost,
    euler_semi_implicit, linearize_trajectory, mppi_solve, pack_state,
    quadratic_tracking_cost, rollout, split_state, trajectory_cost,
)


def test_rollout_matches_manual(arm7, rng):
    H = 5
    dt = 0.01
    x0 = jnp.array(rng.uniform(-0.5, 0.5, arm7.nq + arm7.nv))
    U = jnp.array(rng.uniform(-1, 1, (H, arm7.nv)))
    X = rollout(arm7, x0, U, dt)
    assert X.shape == (H + 1, arm7.nq + arm7.nv)
    x = x0
    for t in range(H):
        q, qd = split_state(arm7, x)
        qdd = dyn.aba(arm7, q, qd, U[t])
        x = euler_semi_implicit(arm7, x, qdd, dt)
        np.testing.assert_allclose(np.asarray(X[t + 1]), np.asarray(x), atol=1e-10)


def test_linearization_matches_ad(arm7, rng):
    """Discrete step Jacobians A, B match jacfwd of the integrator step."""
    dt = 0.01
    H = 3
    x0 = jnp.array(rng.uniform(-0.5, 0.5, arm7.nq + arm7.nv))
    U = jnp.array(rng.uniform(-1, 1, (H, arm7.nv)))
    X = rollout(arm7, x0, U, dt)
    A, B = linearize_trajectory(arm7, X, U, dt)

    def step(x, u):
        q, qd = split_state(arm7, x)
        qdd = dyn.forward_dynamics(arm7, q, qd, u)
        return euler_semi_implicit(arm7, x, qdd, dt)

    for t in range(H):
        A_ad = jax.jacfwd(step, argnums=0)(X[t], U[t])
        B_ad = jax.jacfwd(step, argnums=1)(X[t], U[t])
        np.testing.assert_allclose(np.asarray(A[t]), np.asarray(A_ad), atol=1e-7)
        np.testing.assert_allclose(np.asarray(B[t]), np.asarray(B_ad), atol=1e-7)


def test_ddp_converges_tracking(arm7, rng):
    """DDP drives a 7-DoF arm toward a joint-space goal: cost must drop
    substantially and monotonically (accepted steps only improve)."""
    H = 20
    cfg = DDPConfig(iters=10, dt=0.02, n_alphas=6)
    q_goal = jnp.array(rng.uniform(-0.5, 0.5, arm7.nq))
    x_goal = pack_state(q_goal, jnp.zeros(arm7.nv))
    cost = quadratic_tracking_cost(arm7, x_goal, w_u=1e-5)
    x0 = pack_state(jnp.zeros(arm7.nq), jnp.zeros(arm7.nv))
    U0 = jnp.zeros((H, arm7.nv))
    X0 = rollout(arm7, x0, U0, cfg.dt)
    J0 = trajectory_cost(cost, X0, U0)
    state, hist = ddp_solve(arm7, cost, x0, U0, cfg)
    assert float(state.J) < 0.2 * float(J0), (float(state.J), float(J0))
    # J history is non-increasing (rejected iterations keep the nominal)
    h = np.asarray(hist)
    assert np.all(np.diff(h) <= 1e-9)


def test_ddp_reaching_ee(arm7, rng):
    """End-effector reaching with the analytic-FK cost: final EE position gets
    close to the target."""
    from rbdtpu.kinematics.fk import ee_pose

    H = 30
    cfg = DDPConfig(iters=40, dt=0.02, n_alphas=8)
    target = jnp.array([0.3, 0.2, 0.8])
    cost = ee_reaching_cost(
        arm7, target, w_ee=10.0, w_ee_f=2000.0, w_u=1e-6, w_qd=1e-3, w_qd_f=0.1
    )
    x0 = pack_state(jnp.full(arm7.nq, 0.1), jnp.zeros(arm7.nv))
    U0 = jnp.zeros((H, arm7.nv))
    state, _ = ddp_solve(arm7, cost, x0, U0, cfg)
    qf, _ = split_state(arm7, state.X[-1])
    ee = np.asarray(ee_pose(arm7, qf)[0, :3])
    assert np.linalg.norm(ee - np.asarray(target)) < 0.1, ee


def test_mppi_improves(arm7, rng):
    """Braking task: the arm starts moving at 1 rad/s with a hold-still goal —
    zero controls are clearly suboptimal, sampled corrections must improve."""
    H = 10
    cfg = MPPIConfig(n_samples=128, sigma=0.5, dt=0.02, temperature=0.02)
    cost = quadratic_tracking_cost(
        arm7, pack_state(jnp.zeros(arm7.nq), jnp.zeros(arm7.nv)),
        w_q=1.0, w_qd=0.5, w_u=1e-5,
    )
    x0 = pack_state(jnp.zeros(arm7.nq), jnp.full(arm7.nv, 1.0))
    U0 = jnp.zeros((H, arm7.nv))
    X0 = rollout(arm7, x0, U0, cfg.dt)
    J0 = trajectory_cost(cost, X0, U0)
    U, hist = mppi_solve(arm7, cost, x0, U0, jax.random.PRNGKey(0), iters=10,
                         config=cfg)
    Xf = rollout(arm7, x0, U, cfg.dt)
    Jf = trajectory_cost(cost, Xf, U)
    assert float(Jf) < float(J0)
    # accepted costs never regress
    h = np.asarray(hist)
    assert np.all(np.diff(h) <= 1e-9)


def test_ddp_native_batch_matches_single(arm7, rng):
    """Explicit leading batch dims solve the same problems as one-at-a-time."""
    H, Bn = 6, 3
    cfg = DDPConfig(iters=3, dt=0.02, n_alphas=4)
    cost = quadratic_tracking_cost(
        arm7, pack_state(jnp.full(arm7.nq, 0.3), jnp.zeros(arm7.nv))
    )
    x0 = jnp.array(rng.uniform(-0.2, 0.2, (Bn, arm7.nq + arm7.nv)))
    U0 = jnp.zeros((Bn, H, arm7.nv))
    states, _ = ddp_solve(arm7, cost, x0, U0, cfg)
    assert states.J.shape == (Bn,)
    for b in range(Bn):
        s1, _ = ddp_solve(arm7, cost, x0[b], U0[b], cfg)
        np.testing.assert_allclose(
            np.asarray(states.U[b]), np.asarray(s1.U), atol=1e-9
        )
        np.testing.assert_allclose(float(states.J[b]), float(s1.J), rtol=1e-9)


def test_ddp_solve_is_jittable_and_vmappable(arm7, rng):
    H = 8
    cfg = DDPConfig(iters=3, dt=0.02, n_alphas=4)
    cost = quadratic_tracking_cost(
        arm7, pack_state(jnp.full(arm7.nq, 0.3), jnp.zeros(arm7.nv))
    )
    solve = jax.jit(lambda x, U: ddp_solve(arm7, cost, x, U, cfg)[0].J)
    Bx = jnp.array(rng.uniform(-0.2, 0.2, (3, arm7.nq + arm7.nv)))
    BU = jnp.zeros((3, H, arm7.nv))
    Js = jax.vmap(solve)(Bx, BU)
    assert Js.shape == (3,)
    assert np.all(np.isfinite(np.asarray(Js)))
