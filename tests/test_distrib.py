"""Multi-device tests on the 8-virtual-CPU-device mesh (SURVEY.md §4 item 4):
sharded results must equal single-device results (deterministic collectives).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rbdtpu.distrib import (
    make_mesh, sharded_rollouts, sharded_ddp_solve, sharded_mppi_step,
)
from rbdtpu.solver import (
    DDPConfig, MPPIConfig, ddp_solve, ee_reaching_cost, mppi_step,
    quadratic_tracking_cost, pack_state, rollout,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(8)


def test_sharded_rollouts_match_local(arm7, mesh, rng):
    B, H, dt = 16, 5, 0.01
    x0 = jnp.array(rng.uniform(-0.3, 0.3, (B, arm7.nq + arm7.nv)))
    U = jnp.array(rng.uniform(-1, 1, (B, H, arm7.nv)))
    X_sharded = sharded_rollouts(mesh, arm7, x0, U, dt)
    X_local = rollout(arm7, x0, U, dt)
    np.testing.assert_allclose(
        np.asarray(X_sharded), np.asarray(X_local), atol=1e-12
    )


def test_sharded_ddp_matches_local(arm7, mesh, rng):
    B, H = 8, 6
    cfg = DDPConfig(iters=2, dt=0.02, n_alphas=3)
    cost = quadratic_tracking_cost(
        arm7, pack_state(jnp.full(arm7.nq, 0.2), jnp.zeros(arm7.nv))
    )
    x0 = jnp.array(rng.uniform(-0.2, 0.2, (B, arm7.nq + arm7.nv)))
    U0 = jnp.zeros((B, H, arm7.nv))
    J_sh, U_sh, meanJ = sharded_ddp_solve(mesh, arm7, cost, x0, U0, cfg)
    J_loc = jax.vmap(lambda x, U: ddp_solve(arm7, cost, x, U, cfg)[0].J)(x0, U0)
    np.testing.assert_allclose(np.asarray(J_sh), np.asarray(J_loc), atol=1e-10)
    # psum reduction order differs from jnp.mean -> tiny float drift
    np.testing.assert_allclose(
        float(meanJ), float(jnp.mean(J_loc)), rtol=1e-9
    )


def test_sharded_ddp_fused_kernels_match_local(arm7, mesh, rng):
    """Fused Pallas kernels under shard_map (the hardware sharded-bench
    config): each device's natively-batched shard drives the fused step /
    colvec linearize / feedback line-search kernels, and the sharded result
    still equals the local natively-batched solve."""
    B, H = 16, 5  # 2 problems/shard x 4 alphas = 8 -> feedback kernel on
    cfg = DDPConfig(iters=2, dt=0.02, n_alphas=4, fused=True)
    cost = quadratic_tracking_cost(
        arm7, pack_state(jnp.full(arm7.nq, 0.2), jnp.zeros(arm7.nv))
    )
    x0 = jnp.array(rng.uniform(-0.2, 0.2, (B, arm7.nq + arm7.nv)))
    U0 = jnp.zeros((B, H, arm7.nv))
    J_sh, U_sh, _ = sharded_ddp_solve(mesh, arm7, cost, x0, U0, cfg)
    state_loc, _ = ddp_solve(arm7, cost, x0, U0, cfg)
    np.testing.assert_allclose(np.asarray(J_sh), np.asarray(state_loc.J),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(U_sh), np.asarray(state_loc.U),
                               atol=1e-9)


def test_sharded_mppi_runs_and_is_finite(arm7, mesh, rng):
    """Population-sharded MPPI: U stays replicated-consistent and finite.
    (Exact equality with the single-device path is not expected — the sharded
    variant folds the device index into the RNG stream.)"""
    H = 5
    cfg = MPPIConfig(n_samples=32, sigma=0.3, dt=0.02)
    cost = quadratic_tracking_cost(
        arm7, pack_state(jnp.zeros(arm7.nq), jnp.zeros(arm7.nv))
    )
    x0 = pack_state(jnp.zeros(arm7.nq), jnp.full(arm7.nv, 0.5))
    U0 = jnp.zeros((H, arm7.nv))
    U1, J = sharded_mppi_step(mesh, arm7, cost, x0, U0, jax.random.PRNGKey(1),
                              cfg)
    assert U1.shape == U0.shape
    assert np.all(np.isfinite(np.asarray(U1)))
    assert np.isfinite(float(J))
