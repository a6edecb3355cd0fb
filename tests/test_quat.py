"""Quaternion floating-base root (SURVEY.md §7 hard parts; VERDICT r1 item 5).

The quaternion root replaces the reference's singular rpy parameterization
(pitch = +-pi/2) with nq = nb+6 != nv and tangent-space solver handling:
retraction/diff charts (solver/integrate.py), exact tangent step Jacobians
with SO(3) transport, and log-map tracking costs.  The ground truth throughout
is AD through the retraction — implementation-independent.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rbdtpu.spatial import quat as Q
from rbdtpu.solver.integrate import (
    config_retract, config_diff, state_retract, state_diff,
    euler_semi_implicit, step_jacobians, split_state, pack_state,
)
from rbdtpu.dynamics.fd import forward_dynamics_full
from rbdtpu.dynamics import aba, crba

from conftest import random_state

TOL = 1e-9


def _rand_quat(rng, shape=()):
    v = rng.standard_normal(shape + (4,))
    return jnp.array(v / np.linalg.norm(v, axis=-1, keepdims=True))


# --------------------------------------------------------------------------- #
# Quaternion algebra                                                          #
# --------------------------------------------------------------------------- #

def test_exp_log_roundtrip(rng):
    phi = jnp.array(rng.uniform(-1.5, 1.5, (16, 3)))
    np.testing.assert_allclose(
        np.asarray(Q.quat_log(Q.quat_exp(phi))), np.asarray(phi), atol=TOL
    )
    # tiny angles hit the Taylor branch
    phi_s = 1e-8 * phi
    np.testing.assert_allclose(
        np.asarray(Q.quat_log(Q.quat_exp(phi_s))), np.asarray(phi_s),
        atol=1e-15,
    )


def test_quat_to_R_is_rotation(rng):
    q = _rand_quat(rng, (8,))
    R = np.asarray(Q.quat_to_R(q))
    np.testing.assert_allclose(
        R @ np.swapaxes(R, -1, -2), np.broadcast_to(np.eye(3), R.shape),
        atol=TOL,
    )
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=TOL)


def test_quat_mul_matches_rotation_compose(rng):
    a, b = _rand_quat(rng), _rand_quat(rng)
    np.testing.assert_allclose(
        np.asarray(Q.quat_to_R(Q.quat_mul(a, b))),
        np.asarray(Q.quat_to_R(a) @ Q.quat_to_R(b)),
        atol=TOL,
    )


def test_quat_from_rpy_matches_rpy_to_R(rng):
    from rbdtpu.spatial.transforms import rpy_to_R

    rpy = jnp.array(rng.uniform(-1.5, 1.5, (5, 3)))
    np.testing.assert_allclose(
        np.asarray(Q.quat_to_R(Q.quat_from_rpy(rpy))),
        np.asarray(rpy_to_R(rpy)),
        atol=TOL,
    )


def test_right_jacobians_vs_ad(rng):
    """Jr and Jr^-1 against AD of the exp/log maps."""
    phi = jnp.array(rng.uniform(-1.0, 1.0, 3))
    # d/db log(exp(phi)^-1 exp(phi + b)) at b=0  ==  Jr(phi)
    f = lambda b: Q.quat_log(
        Q.quat_mul(Q.quat_conj(Q.quat_exp(phi)), Q.quat_exp(phi + b))
    )
    Jr_ad = jax.jacfwd(f)(jnp.zeros(3))
    np.testing.assert_allclose(
        np.asarray(Q.so3_right_jacobian(phi)), np.asarray(Jr_ad), atol=1e-8
    )
    # d/db log(exp(phi) exp(b)) at b=0  ==  Jr(phi)^-1
    g = lambda b: Q.quat_log(Q.quat_mul(Q.quat_exp(phi), Q.quat_exp(b)))
    Jri_ad = jax.jacfwd(g)(jnp.zeros(3))
    np.testing.assert_allclose(
        np.asarray(Q.so3_right_jacobian_inv(phi)), np.asarray(Jri_ad),
        atol=1e-8,
    )


# --------------------------------------------------------------------------- #
# Retraction / diff charts                                                    #
# --------------------------------------------------------------------------- #

def test_retract_diff_roundtrip(quadruped12quat, rng):
    m = quadruped12quat
    q, qd, _ = random_state(rng, m)
    xi = 0.3 * rng.standard_normal(m.nv)
    q2 = config_retract(m, jnp.array(q), jnp.array(xi))
    np.testing.assert_allclose(
        np.asarray(config_diff(m, q2, jnp.array(q))), xi, atol=1e-9
    )
    # diff then retract recovers the state (up to quat sign, handled by log)
    q3 = config_retract(
        m, jnp.array(q), config_diff(m, q2, jnp.array(q))
    )
    np.testing.assert_allclose(np.asarray(q3), np.asarray(q2), atol=1e-9)


def test_euler_step_preserves_unit_quat(quadruped12quat, rng):
    m = quadruped12quat
    q, qd, tau = random_state(rng, m)
    x = jnp.array(np.concatenate([q, qd]))
    for _ in range(5):
        qdd = aba(m, x[: m.nq], x[m.nq :], jnp.array(tau))
        x = euler_semi_implicit(m, x, qdd, 0.01)
    norm = float(jnp.linalg.norm(x[3:7]))
    assert abs(norm - 1.0) < 1e-12


def test_step_jacobians_match_ad(quadruped12quat, rng):
    """Tangent A, B against AD of diff(step(retract(x, xi), u + du)) — the
    exact tangent linearization including the SO(3) transport terms."""
    m = quadruped12quat
    dt = 0.01
    q, qd, tau = random_state(rng, m)
    x = jnp.array(np.concatenate([q, qd]))
    u = jnp.array(tau)

    def stepf(x_, u_):
        qdd = aba(m, x_[: m.nq], x_[m.nq :], u_)
        return euler_semi_implicit(m, x_, qdd, dt)

    x1 = stepf(x, u)
    fA = lambda xi: state_diff(m, stepf(state_retract(m, x, xi), u), x1)
    fB = lambda du: state_diff(m, stepf(x, u + du), x1)
    A_ad = np.asarray(jax.jacfwd(fA)(jnp.zeros(2 * m.nv)))
    B_ad = np.asarray(jax.jacfwd(fB)(jnp.zeros(m.nv)))

    qdd, Mi, dq, dqd = forward_dynamics_full(m, jnp.array(q), jnp.array(qd), u)
    A, B = step_jacobians(m, Mi, dq, dqd, dt, qd_new=jnp.array(qd) + dt * qdd)
    np.testing.assert_allclose(np.asarray(A), A_ad, atol=1e-8)
    np.testing.assert_allclose(np.asarray(B), B_ad, atol=1e-8)


def test_free_body_conserves_momentum(rng):
    """Free-floating quadruped, zero torque, zero gravity: the WORLD-frame
    momentum (angular about the origin + linear) is conserved along the
    manifold rollout to integration order."""
    from rbdtpu.model import load_asset
    from rbdtpu.spatial.transforms import plux

    m = load_asset(
        "quadruped12", dtype=np.float64, floating_base=True, root_quat=True
    )
    q, qd, _ = random_state(rng, m)
    qd = 0.3 * qd
    x = jnp.array(np.concatenate([q, qd]))
    dt = 1e-4

    def world_momentum(x):
        q_, qd_ = x[: m.nq], x[m.nq :]
        H = crba(m, q_)  # root rows = total momentum in root body coords
        h_root = (H @ qd_)[0:6]
        R = Q.quat_to_R(q_[3:7])
        E = jnp.swapaxes(R, -1, -2)
        # X world->root; transpose of force transform maps momentum to world
        Xf = plux(E, q_[0:3])
        return jnp.swapaxes(Xf, -1, -2) @ h_root

    h0 = np.asarray(world_momentum(x))
    for _ in range(50):
        qdd = aba(m, x[: m.nq], x[m.nq :], jnp.zeros(m.nv), gravity=0.0)
        x = euler_semi_implicit(m, x, qdd, dt)
    h1 = np.asarray(world_momentum(x))
    np.testing.assert_allclose(h1, h0, atol=5e-4 * max(1.0, np.abs(h0).max()))


# --------------------------------------------------------------------------- #
# Tangent-space solver                                                        #
# --------------------------------------------------------------------------- #

def test_tracking_cost_tangent_derivs_match_ad(quadruped12quat, rng):
    from rbdtpu.solver import quadratic_tracking_cost

    m = quadruped12quat
    qg, qdg, _ = random_state(rng, m)
    x_goal = jnp.array(np.concatenate([qg, 0.0 * qdg]))
    cost = quadratic_tracking_cost(m, x_goal, w_q=2.0, w_qd=0.1, w_u=1e-3)
    q, qd, tau = random_state(rng, m)
    x = jnp.array(np.concatenate([q, qd]))
    u = jnp.array(tau)

    lx, lu, lxx, luu, lux = cost.stage_derivs(x, u, 0)
    c_t = lambda xi: cost.stage(state_retract(m, x, xi), u, 0)
    z = jnp.zeros(2 * m.nv)
    np.testing.assert_allclose(
        np.asarray(lx), np.asarray(jax.grad(c_t)(z)), atol=1e-9
    )
    lfx, lfxx = cost.terminal_derivs(x)
    t_t = lambda xi: cost.terminal(state_retract(m, x, xi))
    np.testing.assert_allclose(
        np.asarray(lfx), np.asarray(jax.grad(t_t)(z)), atol=1e-9
    )
    # quadratic term: exact Gauss-Newton — must dominate the true Hessian's
    # GN part (compare against AD on the diff-Jacobian contraction is
    # implicit in lx above; here just sanity: symmetric PSD)
    H = np.asarray(lfxx)
    np.testing.assert_allclose(H, H.T, atol=1e-10)
    assert np.linalg.eigvalsh(H).min() > -1e-10


def test_ddp_on_quat_quadruped_improves(quadruped12quat):
    """DDP converges on a quaternion-root posture task, including an initial
    attitude PAST the rpy pitch singularity (pitch ~ pi/2 + 0.3 — the regime
    the reference's parameterization cannot represent)."""
    from rbdtpu.solver import DDPConfig, ddp_solve, quadratic_tracking_cost
    from rbdtpu.dynamics import rnea

    m = quadruped12quat
    H, dt = 20, 0.01
    # goal: level stance at height 0.35
    qg = np.zeros(m.nq)
    qg[2] = 0.35
    qg[3] = 1.0  # identity quat
    x_goal = jnp.array(np.concatenate([qg, np.zeros(m.nv)]))
    cost = quadratic_tracking_cost(
        m, x_goal, w_q=5.0, w_qd=0.1, w_u=1e-4, w_q_f=200.0, w_qd_f=20.0
    )
    # start tipped past the rpy singularity
    q0 = np.zeros(m.nq)
    q0[2] = 0.4
    q0[3:7] = np.asarray(Q.quat_exp(jnp.array([0.0, np.pi / 2 + 0.3, 0.0])))
    x0 = jnp.array(np.concatenate([q0, np.zeros(m.nv)]))
    zero = jnp.zeros(m.nv)
    u0 = rnea(m, jnp.array(q0), zero, zero)[0]
    U0 = jnp.broadcast_to(u0, (H, m.nv))
    state, J_hist = ddp_solve(
        m, cost, x0, U0, DDPConfig(iters=12, dt=dt, n_alphas=8)
    )
    J = np.asarray(J_hist)
    assert np.isfinite(J).all()
    # converges to a fixed point well below the initial cost (measured
    # optimum ~168.6 from 226.3; short horizon bounds the recoverable cost)
    assert J[-1] < 0.8 * J[0], f"insufficient improvement: {J[0]} -> {J[-1]}"
    assert abs(J[-1] - J[-2]) < 1e-8 * max(1.0, J[-1]), "not converged"
    # quaternions along the accepted trajectory stay unit
    norms = np.linalg.norm(np.asarray(state.X[..., 3:7]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-9)


def test_mppi_on_quat_free_body_improves(rng):
    """MPPI reorients a free-floating quaternion-root body (direct root
    wrenches, Minv ~ I — the regime where iid sampling is informative; on the
    quadruped the tiny leg inertias make torque noise almost surely
    cost-increasing, equally for rpy and quat roots — verified)."""
    from rbdtpu.model import parse_urdf
    from rbdtpu.solver import MPPIConfig, mppi_solve, quadratic_tracking_cost
    from rbdtpu.solver.rollout import rollout
    from rbdtpu.solver.costs import trajectory_cost

    urdf = """<robot name=\"box\"><link name=\"b\"><inertial>
      <origin xyz=\"0 0 0\"/><mass value=\"1.0\"/>
      <inertia ixx=\"0.1\" iyy=\"0.12\" izz=\"0.09\" ixy=\"0\" ixz=\"0\" iyz=\"0\"/>
      </inertial></link></robot>"""
    m = parse_urdf(urdf, floating_base=True, root_quat=True, dtype=np.float64)
    H, dt = 20, 0.02
    x_goal = jnp.zeros(m.nq + m.nv, jnp.float64).at[3].set(1.0)
    cost = quadratic_tracking_cost(m, x_goal, w_q=5.0, w_qd=0.2, w_u=1e-4)
    q0 = np.zeros(m.nq)
    q0[3:7] = np.asarray(Q.quat_exp(jnp.array([0.8, -0.5, 0.3])))
    x0 = jnp.array(np.concatenate([q0, np.zeros(m.nv)]))
    U0 = jnp.zeros((H, m.nv))
    J0 = float(trajectory_cost(
        cost, rollout(m, x0, U0, dt, gravity=0.0), U0
    ))
    U, hist = mppi_solve(
        m, cost, x0, U0, jax.random.PRNGKey(0), iters=10,
        config=MPPIConfig(n_samples=128, sigma=0.5, dt=dt, gravity=0.0),
    )
    assert float(hist[-1]) < 0.8 * J0, f"{J0} -> {float(hist[-1])}"
