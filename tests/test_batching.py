"""Batched-semantics tests (SURVEY.md §4 item 3): the algorithms accept leading
batch dims directly, and direct-batched == vmap(single) == loop(single).
"""
import jax
import jax.numpy as jnp
import numpy as np

from rbdtpu import dynamics as dyn
from rbdtpu.kinematics import fk

from conftest import random_state

TOL = 1e-10
B = 4


def test_rnea_batched_equals_vmap(arm7, rng):
    q, qd, tau = random_state(rng, arm7, batch=(B,))
    c_b = dyn.rnea(arm7, jnp.array(q), jnp.array(qd))[0]
    c_v = jax.vmap(lambda a, b: dyn.rnea(arm7, a, b)[0])(jnp.array(q), jnp.array(qd))
    np.testing.assert_allclose(np.asarray(c_b), np.asarray(c_v), atol=TOL)
    for k in range(B):
        c1 = dyn.rnea(arm7, jnp.array(q[k]), jnp.array(qd[k]))[0]
        np.testing.assert_allclose(np.asarray(c_b[k]), np.asarray(c1), atol=TOL)


def test_minv_batched_equals_vmap(arm7, rng):
    q, _, _ = random_state(rng, arm7, batch=(B,))
    Mi_b = dyn.minv(arm7, jnp.array(q))
    Mi_v = jax.vmap(lambda a: dyn.minv(arm7, a))(jnp.array(q))
    np.testing.assert_allclose(np.asarray(Mi_b), np.asarray(Mi_v), atol=TOL)


def test_fd_two_level_batch(arm7, rng):
    """Arbitrary leading batch shape (2, 3)."""
    q, qd, tau = random_state(rng, arm7, batch=(2, 3))
    qdd = dyn.forward_dynamics(arm7, jnp.array(q), jnp.array(qd), jnp.array(tau))
    assert qdd.shape == (2, 3, arm7.nv)
    single = dyn.forward_dynamics(
        arm7, jnp.array(q[1, 2]), jnp.array(qd[1, 2]), jnp.array(tau[1, 2])
    )
    np.testing.assert_allclose(np.asarray(qdd[1, 2]), np.asarray(single), atol=TOL)


def test_rnea_grad_batched(arm7, rng):
    q, qd, _ = random_state(rng, arm7, batch=(B,))
    g_b = dyn.rnea_grad(arm7, jnp.array(q), jnp.array(qd))
    assert g_b.shape == (B, arm7.nv, 2 * arm7.nv)
    g0 = dyn.rnea_grad(arm7, jnp.array(q[0]), jnp.array(qd[0]))
    np.testing.assert_allclose(np.asarray(g_b[0]), np.asarray(g0), atol=TOL)


def test_fk_batched(arm7, rng):
    q, _, _ = random_state(rng, arm7, batch=(B,))
    p_b = fk.ee_pose(arm7, jnp.array(q))
    p0 = fk.ee_pose(arm7, jnp.array(q[0]))
    np.testing.assert_allclose(np.asarray(p_b[0]), np.asarray(p0), atol=TOL)
    g_b = fk.ee_pose_gradient(arm7, jnp.array(q))
    g0 = fk.ee_pose_gradient(arm7, jnp.array(q[0]))
    np.testing.assert_allclose(np.asarray(g_b[0]), np.asarray(g0), atol=TOL)


def test_jit_compiles(arm7, rng):
    q, qd, tau = random_state(rng, arm7, batch=(B,))
    step = jax.jit(lambda a, b, c: dyn.forward_dynamics(arm7, a, b, c))
    out = step(jnp.array(q), jnp.array(qd), jnp.array(tau))
    ref = dyn.forward_dynamics(arm7, jnp.array(q), jnp.array(qd), jnp.array(tau))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=TOL)
