"""Receding-horizon MPC driver, hybrid solve, and checkpoint/resume tests."""
import jax
import jax.numpy as jnp
import numpy as np

from rbdtpu.solver import (
    DDPConfig, MPPIConfig, MPCCarry, ddp_solve, hybrid_solve,
    load_solver_state, mpc_run, pack_state, quadratic_tracking_cost,
    save_solver_state,
)


def test_mpc_run_tracks_goal(arm7):
    """Closed-loop MPC drives the arm toward a nearby joint goal."""
    H, steps = 10, 20
    cfg = DDPConfig(iters=4, dt=0.02, n_alphas=4)
    q_goal = jnp.full(arm7.nq, 0.2)
    cost = quadratic_tracking_cost(
        arm7, pack_state(q_goal, jnp.zeros(arm7.nv)), w_u=1e-5
    )
    x0 = pack_state(jnp.zeros(arm7.nq), jnp.zeros(arm7.nv))
    U0 = jnp.zeros((H, arm7.nv))
    carry, (U_applied, J_hist) = mpc_run(arm7, cost, x0, U0, steps, cfg)
    q_final = np.asarray(carry.x[: arm7.nq])
    assert np.linalg.norm(q_final - np.asarray(q_goal)) < np.linalg.norm(
        np.asarray(q_goal)
    ), q_final
    assert U_applied.shape == (steps, arm7.nv)


def test_hybrid_solve_improves(arm7, rng):
    H = 10
    mcfg = MPPIConfig(n_samples=64, sigma=0.4, dt=0.02)
    dcfg = DDPConfig(iters=5, dt=0.02, n_alphas=4)
    cost = quadratic_tracking_cost(
        arm7, pack_state(jnp.full(arm7.nq, 0.3), jnp.zeros(arm7.nv))
    )
    x0 = pack_state(jnp.zeros(arm7.nq), jnp.zeros(arm7.nv))
    U0 = jnp.zeros((H, arm7.nv))
    state, (mppi_hist, ddp_hist) = hybrid_solve(
        arm7, cost, x0, U0, jax.random.PRNGKey(0),
        mppi_config=mcfg, ddp_config=dcfg, mppi_iters=4,
    )
    assert np.isfinite(float(state.J))
    # DDP refinement ends at least as good as the MPPI warm start
    assert float(state.J) <= float(np.asarray(mppi_hist)[-1]) + 1e-9


def test_solver_state_checkpoint_roundtrip(arm7, tmp_path):
    H = 6
    cfg = DDPConfig(iters=2, dt=0.02, n_alphas=3)
    cost = quadratic_tracking_cost(
        arm7, pack_state(jnp.full(arm7.nq, 0.2), jnp.zeros(arm7.nv))
    )
    x0 = pack_state(jnp.zeros(arm7.nq), jnp.zeros(arm7.nv))
    state, _ = ddp_solve(arm7, cost, x0, jnp.zeros((H, arm7.nv)), cfg)
    path = str(tmp_path / "solver_state.npz")
    save_solver_state(path, state)
    restored = load_solver_state(path, state)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
