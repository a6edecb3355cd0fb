"""Parity-oracle tests: our batched JAX algorithms vs the serial numpy reference
run on bit-identical model data (SURVEY.md §4 item 1; BASELINE.json configs[0]).

Tolerance: 1e-8 in float64 (the 1e-6 ladder target with margin; SURVEY.md §7).
Fixed-base arm7 only — the reference's floating-base Minv/grad paths carry known
bugs (SURVEY.md §2.1) and are validated by property tests instead.
"""
import numpy as np
import jax.numpy as jnp

from rbdtpu import dynamics as dyn
from rbdtpu.kinematics import fk

from conftest import random_state

TOL = 1e-8


def test_rnea_parity(arm7, oracle, rng):
    q, qd, tau = random_state(rng, arm7)
    qdd = rng.uniform(-1, 1, arm7.nv)
    c_ref, v_ref, a_ref, f_ref = oracle.rnea(q.copy(), qd.copy(), qdd.copy())
    c, v, a, f = dyn.rnea(arm7, jnp.array(q), jnp.array(qd), jnp.array(qdd))
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref).ravel(), atol=TOL)
    # per-body kinematic quantities are (NB, 6) here vs (6, NB) in the reference
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref).T, atol=TOL)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a_ref).T, atol=TOL)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref).T, atol=TOL)


def test_rnea_bias_only_parity(arm7, oracle, rng):
    q, qd, _ = random_state(rng, arm7)
    c_ref = oracle.rnea(q.copy(), qd.copy())[0]
    c = dyn.rnea(arm7, jnp.array(q), jnp.array(qd))[0]
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref).ravel(), atol=TOL)


def test_rnea_gravity_kwarg_parity(arm7, oracle, rng):
    q, qd, _ = random_state(rng, arm7)
    for g in (0.0, 3.71):
        c_ref = oracle.rnea(q.copy(), qd.copy(), GRAVITY=g)[0]
        c = dyn.rnea(arm7, jnp.array(q), jnp.array(qd), gravity=g)[0]
        np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref).ravel(), atol=TOL)


def test_rnea_grad_parity(arm7, oracle, rng):
    q, qd, _ = random_state(rng, arm7)
    qdd = rng.uniform(-1, 1, arm7.nv)
    g_ref = oracle.rnea_grad(q.copy(), qd.copy(), qdd.copy())
    g = dyn.rnea_grad(arm7, jnp.array(q), jnp.array(qd), jnp.array(qdd))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=TOL)


def test_rnea_grad_damping_parity(arm7, oracle, rng):
    q, qd, _ = random_state(rng, arm7)
    qdd = rng.uniform(-1, 1, arm7.nv)
    g_ref = oracle.rnea_grad(
        q.copy(), qd.copy(), qdd.copy(), USE_VELOCITY_DAMPING=True
    )
    g = dyn.rnea_grad(
        arm7, jnp.array(q), jnp.array(qd), jnp.array(qdd), use_damping=True
    )
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=TOL)


def test_minv_parity(arm7, oracle, rng):
    q, _, _ = random_state(rng, arm7)
    Mi_ref = oracle.minv(q.copy())
    Mi = dyn.minv(arm7, jnp.array(q))
    np.testing.assert_allclose(np.asarray(Mi), np.asarray(Mi_ref), atol=TOL)


def test_minv_triangular_parity(arm7, oracle, rng):
    q, _, _ = random_state(rng, arm7)
    Mi_ref = oracle.minv(q.copy(), output_dense=False)
    Mi = dyn.minv(arm7, jnp.array(q), output_dense=False)
    np.testing.assert_allclose(np.asarray(Mi), np.asarray(Mi_ref), atol=TOL)


def test_crba_parity(arm7, oracle, rng):
    q, _, _ = random_state(rng, arm7)
    H_ref = oracle.crba(q.copy())
    H = dyn.crba(arm7, jnp.array(q))
    np.testing.assert_allclose(np.asarray(H), np.asarray(H_ref), atol=TOL)


def test_forward_dynamics_parity(arm7, oracle, rng):
    q, qd, tau = random_state(rng, arm7)
    qdd_ref = oracle.forward_dynamics(q.copy(), qd.copy(), tau.copy())
    qdd = dyn.forward_dynamics(arm7, jnp.array(q), jnp.array(qd), jnp.array(tau))
    np.testing.assert_allclose(np.asarray(qdd), np.asarray(qdd_ref).ravel(), atol=TOL)


def test_forward_dynamics_grad_parity(arm7, oracle, rng):
    q, qd, tau = random_state(rng, arm7)
    dq_ref, dqd_ref = oracle.forward_dynamics_grad(q.copy(), qd.copy(), tau.copy())
    dq, dqd = dyn.forward_dynamics_grad(
        arm7, jnp.array(q), jnp.array(qd), jnp.array(tau)
    )
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), atol=TOL)
    np.testing.assert_allclose(np.asarray(dqd), np.asarray(dqd_ref), atol=TOL)


def test_ee_pose_parity(arm7, oracle, rng):
    q, _, _ = random_state(rng, arm7)
    pose_ref = oracle.end_effector_pose(q.copy())
    pose = fk.ee_pose(arm7, jnp.array(q))
    np.testing.assert_allclose(
        np.asarray(pose), np.asarray(pose_ref).reshape(pose.shape), atol=TOL
    )


def test_ee_pose_gradient_parity(arm7, oracle, rng):
    q, _, _ = random_state(rng, arm7)
    g_ref = oracle.end_effector_pose_gradient(q.copy())
    g = fk.ee_pose_gradient(arm7, jnp.array(q))
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref).reshape(g.shape), atol=TOL
    )


def test_ee_pose_hessian_parity(arm7, oracle, rng):
    """The reference's pitch-row Hessian deviates from the exact value by up to
    ~9e-7 (verified against jacfwd of the analytic gradient, which our
    implementation matches to 3e-16) — so parity here uses a 2e-6 tolerance;
    exactness is asserted in test_properties.py::test_ee_hessian_matches_ad."""
    q, _, _ = random_state(rng, arm7)
    h_ref = np.asarray(oracle.end_effector_pose_hessian(q.copy()))
    h = np.asarray(fk.ee_pose_hessian(arm7, jnp.array(q)))
    h_ref = h_ref.reshape(h.shape)
    np.testing.assert_allclose(h[..., :3, :, :], h_ref[..., :3, :, :], atol=TOL)
    np.testing.assert_allclose(h[..., 3:, :, :], h_ref[..., 3:, :, :], atol=1e-4)


def test_spatial_factor_helpers_parity(oracle, rng):
    """spatial.factor_inertia / dot_inertia vs the reference's
    factor_functions(number=3) / dot_matrix (RBDReference.py:27-31,45-54;
    these feed the IDSVA-SO sweep, where dynamics.idsva consumes them)."""
    from rbdtpu.spatial import factor_inertia, dot_inertia

    A = rng.standard_normal((6, 6))
    I = A @ A.T + 6 * np.eye(6)  # SPD like a spatial inertia
    v = rng.standard_normal(6)
    B_ref = np.asarray(oracle.factor_functions(I, v, number=3))
    D_ref = np.asarray(oracle.dot_matrix(I, v))
    np.testing.assert_allclose(
        np.asarray(factor_inertia(jnp.array(I), jnp.array(v))), B_ref, atol=TOL
    )
    np.testing.assert_allclose(
        np.asarray(dot_inertia(jnp.array(I), jnp.array(v))), D_ref, atol=TOL
    )


# --- FLOATING-BASE parity against the reference's TRUSTED fb paths ---------
# (VERDICT r3 item 5: fb rnea RBDReference.py:585-593 and fb crba :1045-1089
# are coherent; anchoring our fb dynamics to them replaces property/AD
# self-consistency with an independent implementation.  fb minv/aba/grad stay
# EXCLUDED — known reference bugs, SURVEY.md §2.1.)

def _fb_parity_rnea(model, oracle_ref, rng, with_qdd, gravity=-9.81):
    q, qd, _ = random_state(rng, model)
    qdd = rng.uniform(-1, 1, model.nv) if with_qdd else None
    c_ref, v_ref, a_ref, f_ref = oracle_ref.rnea(
        q.copy(), qd.copy(),
        qdd.copy() if qdd is not None else None, GRAVITY=gravity,
    )
    out = dyn.rnea(
        model, jnp.array(q), jnp.array(qd),
        jnp.array(qdd) if qdd is not None else None, gravity=gravity,
    )
    c, v, a, f = out
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref).ravel(),
                               atol=TOL)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref).T, atol=TOL)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a_ref).T, atol=TOL)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref).T, atol=TOL)


def test_fb_rnea_parity_quadruped(quadruped12fb, oracle_fb, rng):
    _fb_parity_rnea(quadruped12fb, oracle_fb, rng, with_qdd=True)


def test_fb_rnea_bias_parity_quadruped(quadruped12fb, oracle_fb, rng):
    _fb_parity_rnea(quadruped12fb, oracle_fb, rng, with_qdd=False,
                    gravity=-3.71)


def test_fb_rnea_parity_humanoid(humanoid30fb, oracle_fb_humanoid, rng):
    _fb_parity_rnea(humanoid30fb, oracle_fb_humanoid, rng, with_qdd=True)


def _fb_crba_vs_ref_rnea(model, oracle_ref, rng):
    """fb CRBA anchored to the reference's trusted fb RNEA.

    The reference's own fb crba branch is UNRUNNABLE for every floating-base
    robot: it allocates ``H = np.zeros((NB, NB))`` (RBDReference.py:1046-1047)
    but indexes ``matrix_ind = ind + 5`` up to NB+4 (:1063) -> IndexError
    (verified here on the quadruped; same latent-bug family as the fb minv
    dense-fill, SURVEY.md §2.1).  The independent anchor is instead built
    from the trusted fb rnea (:585-593): with zero gravity and zero velocity,
    c = H @ qdd exactly, so H_ref[:, j] = ref.rnea(q, 0, e_j, GRAVITY=0).
    """
    q, _, _ = random_state(rng, model)
    n = model.nv
    zero = np.zeros(n)
    H_ref = np.empty((n, n))
    for j in range(n):
        e = np.zeros(n)
        e[j] = 1.0
        H_ref[:, j] = np.asarray(
            oracle_ref.rnea(q.copy(), zero.copy(), e, GRAVITY=0.0)[0]
        ).ravel()
    H = np.asarray(dyn.crba(model, jnp.array(q)))
    assert H.shape == (n, n)
    np.testing.assert_allclose(H, H_ref, atol=TOL)


def test_fb_crba_reference_branch_is_broken(quadruped12fb, oracle_fb, rng):
    """Pin the newly-found reference bug so the anchoring strategy above is
    justified by an executable fact, not a claim."""
    q, _, _ = random_state(rng, quadruped12fb)
    try:
        oracle_fb.crba(q.copy())
    except IndexError:
        return  # expected: (NB,NB) allocation vs ind+5 indexing
    raise AssertionError(
        "reference fb crba ran without IndexError — re-audit "
        "RBDReference.py:1046-1063 and switch this suite to direct parity"
    )


def test_fb_crba_parity_quadruped(quadruped12fb, oracle_fb, rng):
    _fb_crba_vs_ref_rnea(quadruped12fb, oracle_fb, rng)


def test_fb_crba_parity_humanoid(humanoid30fb, oracle_fb_humanoid, rng):
    _fb_crba_vs_ref_rnea(humanoid30fb, oracle_fb_humanoid, rng)
