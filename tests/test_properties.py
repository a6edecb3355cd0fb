"""Property tests (SURVEY.md §4 item 2): algebraic identities that hold for any
correct implementation — the validation path for floating-base models, where the
reference oracle itself carries bugs (SURVEY.md §2.1).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rbdtpu import dynamics as dyn
from rbdtpu.spatial import ops as so

from conftest import random_state

TOL = 1e-8


# --------------------------------------------------------------------------- #
# Spatial algebra identities                                                  #
# --------------------------------------------------------------------------- #

def test_crf_is_neg_crm_transpose(rng):
    v = rng.uniform(-1, 1, (5, 6))
    np.testing.assert_allclose(
        np.asarray(so.crf(v)), -np.swapaxes(np.asarray(so.crm(v)), -1, -2), atol=TOL
    )


def test_icrf_identity(rng):
    f = rng.uniform(-1, 1, 6)
    v = rng.uniform(-1, 1, 6)
    lhs = so.icrf(jnp.array(f)) @ v
    rhs = so.crf(jnp.array(v)) @ f
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=TOL)


def test_cross_products_match_operators(rng):
    v = rng.uniform(-1, 1, 6)
    m = rng.uniform(-1, 1, 6)
    np.testing.assert_allclose(
        np.asarray(so.cross_motion(jnp.array(v), jnp.array(m))),
        np.asarray(so.crm(jnp.array(v)) @ m),
        atol=TOL,
    )
    np.testing.assert_allclose(
        np.asarray(so.cross_force(jnp.array(v), jnp.array(m))),
        np.asarray(so.crf(jnp.array(v)) @ m),
        atol=TOL,
    )


# --------------------------------------------------------------------------- #
# Dynamics identities (fixed base and floating base)                          #
# --------------------------------------------------------------------------- #

@pytest.fixture(params=["arm7", "quadruped12fb", "quadruped12quat"])
def model(request, arm7, quadruped12fb, quadruped12quat):
    return {
        "arm7": arm7,
        "quadruped12fb": quadruped12fb,
        "quadruped12quat": quadruped12quat,
    }[request.param]


def test_minv_inverts_crba(model, rng):
    q, _, _ = random_state(rng, model)
    H = dyn.crba(model, jnp.array(q))
    Mi = dyn.minv(model, jnp.array(q))
    np.testing.assert_allclose(
        np.asarray(H @ Mi), np.eye(model.nv), atol=1e-7
    )


def test_mass_matrix_spd(model, rng):
    q, _, _ = random_state(rng, model)
    H = np.asarray(dyn.crba(model, jnp.array(q)))
    np.testing.assert_allclose(H, H.T, atol=TOL)
    assert np.linalg.eigvalsh(H).min() > 0


def test_aba_matches_minv_route(model, rng):
    q, qd, tau = random_state(rng, model)
    qdd_aba = dyn.aba(model, jnp.array(q), jnp.array(qd), jnp.array(tau))
    qdd_fd = dyn.forward_dynamics(model, jnp.array(q), jnp.array(qd), jnp.array(tau))
    np.testing.assert_allclose(np.asarray(qdd_aba), np.asarray(qdd_fd), atol=1e-7)


def test_rnea_aba_roundtrip(model, rng):
    """tau -> ABA -> qdd -> RNEA -> tau."""
    q, qd, tau = random_state(rng, model)
    qdd = dyn.aba(model, jnp.array(q), jnp.array(qd), jnp.array(tau))
    tau_back = dyn.rnea(model, jnp.array(q), jnp.array(qd), qdd)[0]
    np.testing.assert_allclose(np.asarray(tau_back), tau, atol=1e-7)


def test_rnea_grad_matches_jacfwd(model, rng):
    q, qd, _ = random_state(rng, model)
    qdd = rng.uniform(-1, 1, model.nv)
    dc_dq, dc_dqd = dyn.rnea_grad(
        model, jnp.array(q), jnp.array(qd), jnp.array(qdd), split=True
    )
    if model.floating_base and model.root_quat:
        # dq columns are TANGENT-space: compare against AD through the
        # retraction q (+) xi (solver/integrate.py convention)
        from rbdtpu.solver.integrate import config_retract

        tau_fn = lambda xi, qd_: dyn.rnea(
            model, config_retract(model, jnp.array(q), xi), qd_,
            jnp.array(qdd),
        )[0]
        zero = jnp.zeros(model.nv, jnp.float64)
        J_q = jax.jacfwd(tau_fn, argnums=0)(zero, jnp.array(qd))
        J_qd = jax.jacfwd(tau_fn, argnums=1)(zero, jnp.array(qd))
    else:
        tau_fn = lambda q_, qd_: dyn.rnea(model, q_, qd_, jnp.array(qdd))[0]
        J_q = jax.jacfwd(tau_fn, argnums=0)(jnp.array(q), jnp.array(qd))
        J_qd = jax.jacfwd(tau_fn, argnums=1)(jnp.array(q), jnp.array(qd))
    np.testing.assert_allclose(np.asarray(dc_dq), np.asarray(J_q), atol=1e-7)
    np.testing.assert_allclose(np.asarray(dc_dqd), np.asarray(J_qd), atol=1e-7)


def test_external_forces_roundtrip(model, rng):
    """RNEA(q, qd, ABA(q, qd, tau, f_ext), f_ext) == tau."""
    q, qd, tau = random_state(rng, model)
    f_ext = rng.uniform(-1, 1, (model.nb, 6))
    qdd = dyn.aba(
        model, jnp.array(q), jnp.array(qd), jnp.array(tau), f_ext=jnp.array(f_ext)
    )
    tau_back = dyn.rnea(
        model, jnp.array(q), jnp.array(qd), qdd, f_ext=jnp.array(f_ext)
    )[0]
    np.testing.assert_allclose(np.asarray(tau_back), tau, atol=1e-7)


def test_ee_fk_derivatives_match_ad(arm7, rng):
    """Analytic FK gradient and Hessian are exact (machine precision vs AD).
    The reference's Hessian pitch rows carry ~1e-6 numerical error; ours must
    not (see test_parity.py::test_ee_pose_hessian_parity)."""
    from rbdtpu.kinematics import fk

    q = jnp.array(rng.uniform(-1, 1, arm7.nq))
    G = fk.ee_pose_gradient(arm7, q)
    G_ad = jax.jacfwd(lambda qq: fk.ee_pose(arm7, qq))(q)
    np.testing.assert_allclose(np.asarray(G), np.asarray(G_ad), atol=1e-12)
    H = fk.ee_pose_hessian(arm7, q)
    H_ad = jax.jacfwd(lambda qq: fk.ee_pose_gradient(arm7, qq))(q)
    np.testing.assert_allclose(np.asarray(H), np.asarray(H_ad), atol=1e-12)


def test_ee_fk_derivatives_floating_base(quadruped12fb, quadruped12quat, rng):
    """FK gradient/Hessian on the rpy FLOATING ROOT are exact vs AD (the
    6 root columns use the analytic root-transform derivatives,
    fk._root_hom_derivs — the generic per-joint tables treat the 6-DoF root
    as revolute and would be silently wrong; the reference's EE derivative
    stack has no floating-base support at all, RBDReference.py:286-527).
    The quaternion root must raise (chart-dependent derivatives)."""
    from rbdtpu.kinematics import fk

    m = quadruped12fb
    ee = [m.joint_names[m.leaves()[0]]]
    q = jnp.array(rng.uniform(-0.6, 0.6, m.nq))
    G = fk.ee_pose_gradient(m, q, ee_names=ee)
    G_ad = jax.jacfwd(lambda qq: fk.ee_pose(m, qq, ee_names=ee))(q)
    np.testing.assert_allclose(np.asarray(G), np.asarray(G_ad), atol=1e-12)
    H = fk.ee_pose_hessian(m, q, ee_names=ee)
    H_ad = jax.jacfwd(
        jax.jacfwd(lambda qq: fk.ee_pose(m, qq, ee_names=ee))
    )(q)
    np.testing.assert_allclose(np.asarray(H), np.asarray(H_ad), atol=1e-12)

    mq = quadruped12quat
    qq0 = jnp.zeros(mq.nq).at[3].set(1.0)
    eeq = [mq.joint_names[mq.leaves()[0]]]
    import pytest

    with pytest.raises(ValueError, match="tangent"):
        fk.ee_pose_gradient(mq, qq0, ee_names=eeq)


def test_ee_tangent_jacobian_quat_root(quadruped12quat, arm7, rng):
    """ee_position_jacobian_tangent on the QUATERNION root equals the AD
    Jacobian of the retracted EE position (the solver's body-twist chart,
    solver.integrate.config_retract) to machine precision; on flat-chart
    models it is exactly ee_pose_gradient's position rows."""
    from rbdtpu.kinematics import fk
    from rbdtpu.solver.integrate import config_retract

    m = quadruped12quat
    ee = [m.joint_names[m.leaves()[0]]]
    q0 = jnp.zeros(m.nq).at[2].set(0.35).at[3].set(1.0)
    q = config_retract(m, q0, jnp.array(rng.uniform(-0.5, 0.5, m.nv)))
    J = fk.ee_position_jacobian_tangent(m, q, ee_names=ee)[0]
    f = lambda xi: fk.ee_pose(m, config_retract(m, q, xi), ee_names=ee)[0, :3]
    J_ad = jax.jacfwd(f)(jnp.zeros(m.nv))
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad), atol=1e-12)

    q2 = jnp.array(rng.uniform(-1, 1, arm7.nq))
    J2 = fk.ee_position_jacobian_tangent(arm7, q2)[0]
    J2_ref = fk.ee_pose_gradient(arm7, q2)[0, :3, :]
    np.testing.assert_array_equal(np.asarray(J2), np.asarray(J2_ref))


def test_gravity_zero_free_fall(model, rng):
    """With tau=0, qd=0 and g=0 every joint acceleration vanishes."""
    q, _, _ = random_state(rng, model)
    zeros = jnp.zeros(model.nv, jnp.float64)
    qdd = dyn.aba(model, jnp.array(q), zeros, zeros, gravity=0.0)
    np.testing.assert_allclose(np.asarray(qdd), 0.0, atol=1e-9)
