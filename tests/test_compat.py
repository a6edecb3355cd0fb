"""Drop-in compat layer: RBDReferenceTPU must return the same values AND
shapes/orientations as the reference class for every mirrored method."""
import numpy as np
import pytest

from rbdtpu.compat import RBDReferenceTPU

from conftest import random_state

TOL = 1e-8


@pytest.fixture(scope="module")
def compat(arm7):
    return RBDReferenceTPU(arm7)


def test_rnea_shapes_and_values(compat, arm7, oracle, rng):
    q, qd, _ = random_state(rng, arm7)
    qdd = rng.uniform(-1, 1, arm7.nv)
    c, v, a, f = compat.rnea(q, qd, qdd)
    c_r, v_r, a_r, f_r = oracle.rnea(q.copy(), qd.copy(), qdd.copy())
    assert v.shape == np.asarray(v_r).shape  # (6, NB), reference layout
    np.testing.assert_allclose(c, np.asarray(c_r).ravel(), atol=TOL)
    np.testing.assert_allclose(v, np.asarray(v_r), atol=TOL)
    np.testing.assert_allclose(f, np.asarray(f_r), atol=TOL)


def test_pass_functions(compat, arm7, oracle, rng):
    q, qd, _ = random_state(rng, arm7)
    qdd = rng.uniform(-1, 1, arm7.nv)
    v, a, f = compat.rnea_fpass(q, qd, qdd)
    v_r, a_r, f_r = oracle.rnea_fpass(q.copy(), qd.copy(), qdd.copy())
    np.testing.assert_allclose(f, np.asarray(f_r), atol=TOL)
    c, f2 = compat.rnea_bpass(q, f)
    c_r, f2_r = oracle.rnea_bpass(q.copy(), np.asarray(f_r))
    np.testing.assert_allclose(c, np.asarray(c_r).ravel(), atol=TOL)
    np.testing.assert_allclose(f2, np.asarray(f2_r), atol=TOL)


def test_matrix_methods(compat, arm7, oracle, rng):
    q, qd, tau = random_state(rng, arm7)
    np.testing.assert_allclose(compat.minv(q), np.asarray(oracle.minv(q.copy())),
                               atol=TOL)
    np.testing.assert_allclose(compat.crba(q), np.asarray(oracle.crba(q.copy())),
                               atol=TOL)
    np.testing.assert_allclose(
        compat.forward_dynamics(q, qd, tau),
        np.asarray(oracle.forward_dynamics(q.copy(), qd.copy(), tau.copy())).ravel(),
        atol=TOL,
    )
    g = compat.rnea_grad(q, qd, tau, USE_VELOCITY_DAMPING=True)
    g_r = oracle.rnea_grad(q.copy(), qd.copy(), tau.copy(),
                           USE_VELOCITY_DAMPING=True)
    np.testing.assert_allclose(g, np.asarray(g_r), atol=TOL)


def test_second_order_and_fk(compat, arm7, oracle, rng):
    q, qd, tau = random_state(rng, arm7)
    qdd = rng.uniform(-1, 1, arm7.nv)
    ours = compat.second_order_idsva_parallel(q, qd, qdd)
    refs = oracle.second_order_idsva_parallel(q.copy(), qd.copy(), qdd.copy())
    for o, r in zip(ours, refs):
        np.testing.assert_allclose(o, np.asarray(r), atol=TOL)
    pose = compat.end_effector_pose(q)
    pose_r = np.asarray(oracle.end_effector_pose(q.copy()))
    np.testing.assert_allclose(pose, pose_r.reshape(pose.shape), atol=TOL)
