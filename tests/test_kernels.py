"""Fused Pallas kernel tests (SURVEY.md §4 item 3: "Pallas kernel == jnp
reference implementation").  Off-TPU these run in pallas interpret mode with
identical semantics.
"""
import jax
import jax.numpy as jnp
import numpy as np

from conftest import random_state

from rbdtpu import dynamics as dyn
from rbdtpu.kernels import rnea_fused, fd_step_fused, rollout_fused
from rbdtpu.solver import euler_semi_implicit, split_state

B = 16


def test_rnea_fused_matches_jnp(arm7, rng):
    q = jnp.array(rng.uniform(-1, 1, (B, arm7.nq)))
    qd = jnp.array(rng.uniform(-1, 1, (B, arm7.nv)))
    qdd = jnp.array(rng.uniform(-1, 1, (B, arm7.nv)))
    tau_k = rnea_fused(arm7, q, qd, qdd)
    tau_j = dyn.rnea(arm7, q, qd, qdd)[0]
    np.testing.assert_allclose(np.asarray(tau_k), np.asarray(tau_j),
                               rtol=1e-9, atol=1e-9)


def test_rnea_fused_bias_only(arm7, rng):
    q = jnp.array(rng.uniform(-1, 1, (B, arm7.nq)))
    qd = jnp.array(rng.uniform(-1, 1, (B, arm7.nv)))
    tau_k = rnea_fused(arm7, q, qd)
    tau_j = dyn.rnea(arm7, q, qd)[0]
    np.testing.assert_allclose(np.asarray(tau_k), np.asarray(tau_j),
                               rtol=1e-9, atol=1e-9)


def test_fd_step_fused_matches_jnp(arm7, rng):
    dt = 0.01
    x = jnp.array(rng.uniform(-0.5, 0.5, (B, arm7.nq + arm7.nv)))
    u = jnp.array(rng.uniform(-1, 1, (B, arm7.nv)))
    x_k = fd_step_fused(arm7, x, u, dt)
    q, qd = split_state(arm7, x)
    qdd = dyn.aba(arm7, q, qd, u)
    x_j = euler_semi_implicit(arm7, x, qdd, dt)
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_j),
                               rtol=1e-8, atol=1e-8)


def test_linearize_fused_matches_jnp(arm7, rng):
    from rbdtpu.kernels import linearize_fused
    from rbdtpu.solver import linearize_trajectory

    dt = 0.01
    q = jnp.array(rng.uniform(-0.5, 0.5, (B, arm7.nq)))
    qd = jnp.array(rng.uniform(-0.5, 0.5, (B, arm7.nv)))
    u = jnp.array(rng.uniform(-1, 1, (B, arm7.nv)))
    A_k, B_k = linearize_fused(arm7, q, qd, u, dt)
    # jnp reference path: one "trajectory" of B independent knots
    X = jnp.concatenate([q, qd], -1)[:, None, :]
    X2 = jnp.concatenate([X, X], axis=1)  # (B, 2, nx): knot + dummy terminal
    A_j, B_j = linearize_trajectory(arm7, X2, u[:, None, :], dt)
    np.testing.assert_allclose(np.asarray(A_k), np.asarray(A_j[:, 0]),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(B_k), np.asarray(B_j[:, 0]),
                               rtol=1e-7, atol=1e-8)


def test_fd_step_minv_fused_matches_jnp(arm7, rng):
    from rbdtpu.kernels import fd_step_minv_fused

    dt = 0.01
    x = jnp.array(rng.uniform(-0.5, 0.5, (B, arm7.nq + arm7.nv)))
    u = jnp.array(rng.uniform(-1, 1, (B, arm7.nv)))
    x_k = fd_step_minv_fused(arm7, x, u, dt)
    q, qd = split_state(arm7, x)
    qdd = dyn.forward_dynamics(arm7, q, qd, u)
    x_j = euler_semi_implicit(arm7, x, qdd, dt)
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_j),
                               rtol=1e-8, atol=1e-8)


def _mini_fb_model():
    """Tiny floating-base model (base + 2 links) — keeps pallas interpret-mode
    runtime tractable for the fb linearize/minv tests (the quadruped-size
    kernels are validated compiled, on hardware, by the benchmark's finite
    checks)."""
    from rbdtpu.model import parse_urdf

    urdf = """<robot name=\"minifb\">
    <link name=\"base\"><inertial><origin xyz=\"0 0 0\"/><mass value=\"3\"/>
      <inertia ixx=\"0.05\" iyy=\"0.05\" izz=\"0.05\" ixy=\"0\" ixz=\"0\" iyz=\"0\"/></inertial></link>
    <link name=\"l1\"><inertial><origin xyz=\"0 0 -0.15\"/><mass value=\"1\"/>
      <inertia ixx=\"0.01\" iyy=\"0.01\" izz=\"0.002\" ixy=\"0\" ixz=\"0\" iyz=\"0\"/></inertial></link>
    <link name=\"l2\"><inertial><origin xyz=\"0 0 -0.1\"/><mass value=\"0.5\"/>
      <inertia ixx=\"0.005\" iyy=\"0.005\" izz=\"0.001\" ixy=\"0\" ixz=\"0\" iyz=\"0\"/></inertial></link>
    <joint name=\"j1\" type=\"revolute\"><origin xyz=\"0.1 0 -0.1\"/>
      <parent link=\"base\"/><child link=\"l1\"/><axis xyz=\"0 1 0\"/></joint>
    <joint name=\"j2\" type=\"revolute\"><origin xyz=\"0 0 -0.3\"/>
      <parent link=\"l1\"/><child link=\"l2\"/><axis xyz=\"1 0 0\"/></joint>
    </robot>"""
    return parse_urdf(urdf, dtype=np.float64, floating_base=True)


def test_linearize_fused_floating_base(rng):
    """fb fused linearization (lane minv + lane gradient + AD root-pose
    patch) matches the jnp linearize path."""
    from rbdtpu.kernels import linearize_fused
    from rbdtpu.solver import linearize_trajectory

    m = _mini_fb_model()
    dt = 0.01
    Bs = 8
    q = jnp.array(rng.uniform(-0.3, 0.3, (Bs, m.nq)))
    qd = jnp.array(rng.uniform(-0.3, 0.3, (Bs, m.nv)))
    u = jnp.array(rng.uniform(-1, 1, (Bs, m.nv)))
    A_k, B_k = linearize_fused(m, q, qd, u, dt)
    X = jnp.concatenate([q, qd], -1)[:, None, :]
    X2 = jnp.concatenate([X, X], axis=1)
    A_j, B_j = linearize_trajectory(m, X2, u[:, None, :], dt)
    np.testing.assert_allclose(np.asarray(A_k), np.asarray(A_j[:, 0]),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(B_k), np.asarray(B_j[:, 0]),
                               rtol=1e-6, atol=1e-8)


def test_fd_step_minv_fused_floating_base(rng):
    from rbdtpu.kernels import fd_step_minv_fused

    m = _mini_fb_model()
    dt = 0.01
    x = jnp.array(rng.uniform(-0.3, 0.3, (B, m.nq + m.nv)))
    u = jnp.array(rng.uniform(-1, 1, (B, m.nv)))
    x_k = fd_step_minv_fused(m, x, u, dt)
    q, qd = split_state(m, x)
    qdd = dyn.forward_dynamics(m, q, qd, u)
    x_j = euler_semi_implicit(m, x, qdd, dt)
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_j),
                               rtol=1e-8, atol=1e-9)


def test_fused_floating_base_rnea_and_step(quadruped12fb, rng):
    """Floating-base fused kernels (rpy root transform + 6x6 root Cholesky)
    match the jnp algorithms."""
    m = quadruped12fb
    q = jnp.array(rng.uniform(-0.4, 0.4, (B, m.nq)))
    qd = jnp.array(rng.uniform(-0.4, 0.4, (B, m.nv)))
    qdd = jnp.array(rng.uniform(-1, 1, (B, m.nv)))
    tau_k = rnea_fused(m, q, qd, qdd)
    tau_j = dyn.rnea(m, q, qd, qdd)[0]
    np.testing.assert_allclose(np.asarray(tau_k), np.asarray(tau_j),
                               rtol=1e-8, atol=1e-8)
    x = jnp.concatenate([q, qd], -1)
    u = jnp.array(rng.uniform(-1, 1, (B, m.nv)))
    x_k = fd_step_fused(m, x, u, 0.01)
    qq, qqd = split_state(m, x)
    x_j = euler_semi_implicit(m, x, dyn.aba(m, qq, qqd, u), 0.01)
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_j),
                               rtol=1e-6, atol=1e-7)


def test_rollout_fused_matches_jnp(arm7, rng):
    from rbdtpu.solver import rollout

    dt, H = 0.01, 5
    x0 = jnp.array(rng.uniform(-0.3, 0.3, (B, arm7.nq + arm7.nv)))
    U = jnp.array(rng.uniform(-1, 1, (H, B, arm7.nv)))
    xf_k = rollout_fused(arm7, x0, U, dt)
    X_j = rollout(arm7, x0, jnp.moveaxis(U, 0, -2), dt)
    np.testing.assert_allclose(np.asarray(xf_k), np.asarray(X_j[..., -1, :]),
                               rtol=1e-6, atol=1e-6)


def _mini_fbq_model():
    """_mini_fb_model with the quaternion root."""
    from rbdtpu.model import parse_urdf

    urdf = """<robot name=\"minifbq\">
    <link name=\"base\"><inertial><origin xyz=\"0 0 0\"/><mass value=\"3\"/>
      <inertia ixx=\"0.05\" iyy=\"0.05\" izz=\"0.05\" ixy=\"0\" ixz=\"0\" iyz=\"0\"/></inertial></link>
    <link name=\"l1\"><inertial><origin xyz=\"0 0 -0.15\"/><mass value=\"1\"/>
      <inertia ixx=\"0.01\" iyy=\"0.01\" izz=\"0.002\" ixy=\"0\" ixz=\"0\" iyz=\"0\"/></inertial></link>
    <link name=\"l2\"><inertial><origin xyz=\"0 0 -0.1\"/><mass value=\"0.5\"/>
      <inertia ixx=\"0.005\" iyy=\"0.005\" izz=\"0.001\" ixy=\"0\" ixz=\"0\" iyz=\"0\"/></inertial></link>
    <joint name=\"j1\" type=\"revolute\"><origin xyz=\"0.1 0 -0.1\"/>
      <parent link=\"base\"/><child link=\"l1\"/><axis xyz=\"0 1 0\"/></joint>
    <joint name=\"j2\" type=\"revolute\"><origin xyz=\"0 0 -0.3\"/>
      <parent link=\"l1\"/><child link=\"l2\"/><axis xyz=\"1 0 0\"/></joint>
    </robot>"""
    return parse_urdf(urdf, dtype=np.float64, floating_base=True,
                      root_quat=True)


def _rand_quat_state(rng, m, Bs):
    q = rng.uniform(-0.3, 0.3, (Bs, m.nq))
    quat = rng.standard_normal((Bs, 4))
    q[:, 3:7] = quat / np.linalg.norm(quat, axis=-1, keepdims=True)
    return jnp.array(q)


def test_fused_quat_root_rnea_and_step(rng):
    """Quaternion-root fused kernels (lane quat_R transform + manifold lane
    integrator) match the jnp algorithms including the exp-map quat update."""
    m = _mini_fbq_model()
    Bs = 8
    q = _rand_quat_state(rng, m, Bs)
    qd = jnp.array(rng.uniform(-0.4, 0.4, (Bs, m.nv)))
    qdd = jnp.array(rng.uniform(-1, 1, (Bs, m.nv)))
    tau_k = rnea_fused(m, q, qd, qdd)
    tau_j = dyn.rnea(m, q, qd, qdd)[0]
    np.testing.assert_allclose(np.asarray(tau_k), np.asarray(tau_j),
                               rtol=1e-8, atol=1e-8)
    x = jnp.concatenate([q, qd], -1)
    u = jnp.array(rng.uniform(-1, 1, (Bs, m.nv)))
    for step_k in (fd_step_fused,):
        x_k = step_k(m, x, u, 0.01)
        qq, qqd = split_state(m, x)
        x_j = euler_semi_implicit(m, x, dyn.aba(m, qq, qqd, u), 0.01)
        np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_j),
                                   rtol=1e-6, atol=1e-8)
        # quat stays exactly unit
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(x_k[:, 3:7]), axis=-1), 1.0, atol=1e-9
        )


def test_fd_step_minv_fused_quat_root(rng):
    from rbdtpu.kernels import fd_step_minv_fused

    m = _mini_fbq_model()
    Bs = 8
    q = _rand_quat_state(rng, m, Bs)
    qd = jnp.array(rng.uniform(-0.4, 0.4, (Bs, m.nv)))
    x = jnp.concatenate([q, qd], -1)
    u = jnp.array(rng.uniform(-1, 1, (Bs, m.nv)))
    x_k = fd_step_minv_fused(m, x, u, 0.01)
    qq, qqd = split_state(m, x)
    qdd = dyn.forward_dynamics(m, qq, qqd, u)
    x_j = euler_semi_implicit(m, x, qdd, 0.01)
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_j),
                               rtol=1e-8, atol=1e-9)


def test_linearize_fused_quat_root(rng):
    """Quat-root fused linearization: analytic lane tangent columns
    (gravity-seed w x e_j construction) + SO(3) transport assembly equals
    the jnp tangent linearization."""
    from rbdtpu.kernels import linearize_fused
    from rbdtpu.solver import linearize_trajectory

    m = _mini_fbq_model()
    dt = 0.01
    Bs = 8
    q = _rand_quat_state(rng, m, Bs)
    qd = jnp.array(rng.uniform(-0.3, 0.3, (Bs, m.nv)))
    u = jnp.array(rng.uniform(-1, 1, (Bs, m.nv)))
    A_k, B_k = linearize_fused(m, q, qd, u, dt)
    X = jnp.concatenate([q, qd], -1)[:, None, :]
    X2 = jnp.concatenate([X, X], axis=1)
    A_j, B_j = linearize_trajectory(m, X2, u[:, None, :], dt)
    np.testing.assert_allclose(np.asarray(A_k), np.asarray(A_j[:, 0]),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(B_k), np.asarray(B_j[:, 0]),
                               rtol=1e-6, atol=1e-8)


def test_fused_riccati_backward_matches_jnp(rng):
    """The lane-scalar Riccati kernel reproduces solver.ddp.backward_pass
    exactly (gains, feedforwards, dV1, PD flag) for both per-knot and
    CONSTANT cost quadratic blocks, with a batched regularizer."""
    from rbdtpu.solver.ddp import backward_pass
    from rbdtpu.kernels.riccati import backward_pass_fused

    nx, nv, H, Bm = 6, 3, 5, 4
    sym = lambda M: 0.5 * (M + np.swapaxes(M, -1, -2))

    def rnd(*s):
        return jnp.array(rng.standard_normal(s))

    A = 0.1 * rnd(Bm, H, nx, nx) + jnp.eye(nx)
    B = 0.1 * rnd(Bm, H, nx, nv)
    lx = rnd(Bm, H, nx)
    lu = rnd(Bm, H, nv)
    lfx = rnd(Bm, nx)
    lfxx = jnp.array(sym(np.eye(nx) + 0.1 * rng.standard_normal((Bm, nx, nx))))
    lfxx = lfxx @ jnp.swapaxes(lfxx, -1, -2)  # PSD terminal
    reg = jnp.array(rng.uniform(1e-6, 1e-2, Bm))
    for timed in (False, True):
        if timed:
            lxx = jnp.array(sym(0.05 * rng.standard_normal((Bm, H, nx, nx))))
            lxx = lxx + 2.0 * jnp.eye(nx)
            luu = jnp.array(sym(0.05 * rng.standard_normal((Bm, H, nv, nv))))
            luu = luu + 2.0 * jnp.eye(nv)
            lux = 0.05 * rnd(Bm, H, nv, nx)
        else:
            lxx = 2.0 * jnp.eye(nx)
            luu = 2.0 * jnp.eye(nv)
            lux = jnp.zeros((nv, nx))
        args = (A, B, lx, lu, lxx, luu, lux, lfx, lfxx, reg)
        k_j, K_j, dV_j, ok_j = backward_pass(*args)
        k_f, K_f, dV_f, ok_f = backward_pass_fused(*args)
        np.testing.assert_allclose(np.asarray(k_f), np.asarray(k_j),
                                   rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(K_f), np.asarray(K_j),
                                   rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(dV_f), np.asarray(dV_j),
                                   rtol=1e-9)
        assert np.array_equal(np.asarray(ok_f), np.asarray(ok_j))


def test_fused_riccati_in_ddp_solve(arm7, rng):
    """DDPConfig(fused_riccati=True) end-to-end equals the jnp sweep."""
    from rbdtpu.solver import DDPConfig, ddp_solve, ee_reaching_cost
    from rbdtpu.dynamics import rnea

    m = arm7
    cost = ee_reaching_cost(m, jnp.array([0.3, 0.2, 0.6]))
    Bm, H = 8, 6
    q0 = jnp.array(rng.uniform(-0.3, 0.3, (Bm, m.nq)))
    x0 = jnp.concatenate([q0, jnp.zeros((Bm, m.nv))], -1)
    zero = jnp.zeros((Bm, m.nv))
    U0 = jnp.broadcast_to(
        rnea(m, q0, zero, zero)[0][:, None, :], (Bm, H, m.nv)
    )
    cfg = dict(iters=3, dt=0.01, n_alphas=4, fused=True)
    s_f, _ = ddp_solve(m, cost, x0, U0,
                       DDPConfig(**cfg, fused_riccati=True))
    s_j, _ = ddp_solve(m, cost, x0, U0, DDPConfig(**cfg))
    np.testing.assert_allclose(np.asarray(s_f.J), np.asarray(s_j.J),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(s_f.U), np.asarray(s_j.U),
                               atol=1e-8)


def test_chunked_riccati_backward_matches_jnp(rng):
    """The chunked-batch (VMEM-resident) Riccati kernel reproduces
    solver.ddp.backward_pass at quadruped-class nx, for per-knot and
    CONSTANT cost blocks, with a batched regularizer — including the
    small-batch lane padding path (B=4 -> one 128-lane block)."""
    from rbdtpu.solver.ddp import backward_pass
    from rbdtpu.kernels.riccati_chunk import backward_pass_chunked

    sym = lambda M: 0.5 * (M + np.swapaxes(M, -1, -2))

    def rnd(*s):
        return jnp.array(rng.standard_normal(s))

    for (nx, nv, H, Bm, timed) in ((10, 4, 5, 4, False), (10, 4, 5, 4, True),
                                   (36, 18, 2, 4, True)):
        A = 0.1 * rnd(Bm, H, nx, nx) + jnp.eye(nx)
        Bmat = 0.1 * rnd(Bm, H, nx, nv)
        lx = rnd(Bm, H, nx)
        lu = rnd(Bm, H, nv)
        lfx = rnd(Bm, nx)
        lfxx = jnp.array(
            sym(np.eye(nx) + 0.1 * rng.standard_normal((Bm, nx, nx))))
        lfxx = lfxx @ jnp.swapaxes(lfxx, -1, -2)
        reg = jnp.array(rng.uniform(1e-6, 1e-2, Bm))
        if timed:
            lxx = jnp.array(
                sym(0.05 * rng.standard_normal((Bm, H, nx, nx)))
            ) + 2.0 * jnp.eye(nx)
            luu = jnp.array(
                sym(0.05 * rng.standard_normal((Bm, H, nv, nv)))
            ) + 2.0 * jnp.eye(nv)
            lux = 0.05 * rnd(Bm, H, nv, nx)
        else:
            lxx = 2.0 * jnp.eye(nx)
            luu = 2.0 * jnp.eye(nv)
            lux = jnp.zeros((nv, nx))
        args = (A, Bmat, lx, lu, lxx, luu, lux, lfx, lfxx, reg)
        k_j, K_j, dV_j, ok_j = backward_pass(*args)
        k_f, K_f, dV_f, ok_f = backward_pass_chunked(*args)
        np.testing.assert_allclose(np.asarray(k_f), np.asarray(k_j),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(K_f), np.asarray(K_j),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(dV_f), np.asarray(dV_j),
                                   rtol=1e-8)
        assert np.array_equal(np.asarray(ok_f), np.asarray(ok_j))


def test_chunked_riccati_in_ddp_solve(quadruped12fb, rng):
    """DDPConfig(fused_riccati=True) at quadruped nx=36 routes the backward
    sweep through the chunked kernel and matches the jnp sweep end-to-end."""
    from rbdtpu.solver import DDPConfig, ddp_solve, quadratic_tracking_cost

    m = quadruped12fb
    x_goal = jnp.zeros(m.nq + m.nv).at[2].set(0.45)
    cost = quadratic_tracking_cost(m, x_goal)
    Bm, H = 4, 5
    q0, qd0, _ = random_state(rng, m, (Bm,))
    x0 = jnp.concatenate([q0, 0.1 * qd0], -1)
    U0 = jnp.zeros((Bm, H, m.nv))
    cfg = dict(iters=2, dt=0.01, n_alphas=4)
    s_f, _ = ddp_solve(m, cost, x0, U0,
                       DDPConfig(**cfg, fused_riccati=True))
    s_j, _ = ddp_solve(m, cost, x0, U0,
                       DDPConfig(**cfg, fused_riccati=False))
    np.testing.assert_allclose(np.asarray(s_f.J), np.asarray(s_j.J),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(s_f.U), np.asarray(s_j.U),
                               atol=1e-7)


def test_fused_feedback_forward_pass_quat_root(quadruped12quat, rng):
    """feedback_rollout_fused on a QUATERNION-root model: the in-kernel
    manifold state diff (quat_log_rel + R0^T dp) must reproduce the jnp
    forward pass (solver.integrate.state_diff feedback) exactly."""
    from rbdtpu.solver.ddp import forward_pass, forward_pass_fused
    from rbdtpu.solver import ee_reaching_cost

    m = quadruped12quat
    Bm, H = 2, 6
    nx, nv, ndx = m.nq + m.nv, m.nv, 2 * m.nv
    cost = ee_reaching_cost(m, jnp.array([0.2, 0.1, 0.3]))
    q0 = jnp.zeros((Bm, m.nq)).at[:, 2].set(0.35).at[:, 3].set(1.0)
    from rbdtpu.solver.integrate import config_retract

    q0 = config_retract(
        m, q0, 0.05 * jnp.array(rng.standard_normal((Bm, nv)))
    )
    x0 = jnp.concatenate([q0, jnp.zeros((Bm, nv))], -1)
    # nominal trajectory: open-loop rollout of small random controls
    from rbdtpu.solver.ddp import _step_plain

    U = 0.1 * jnp.array(rng.standard_normal((Bm, H, nv)))
    Xs = [x0]
    for t in range(H):
        Xs.append(_step_plain(m, Xs[-1], U[:, t], 0.01, -9.81))
    X = jnp.stack(Xs, axis=1)  # (B, H+1, nx)
    k = 0.05 * jnp.array(rng.standard_normal((Bm, H, nv)))
    K = 0.05 * jnp.array(rng.standard_normal((Bm, H, nv, ndx)))
    alphas = jnp.array([1.0, 0.5, 0.0, 0.25])
    X_j, U_j, J_j = forward_pass(m, cost, X, U, k, K, alphas, 0.01, -9.81)
    X_f, U_f, J_f = forward_pass_fused(
        m, cost, X, U, k, K, alphas, 0.01, -9.81
    )
    np.testing.assert_allclose(np.asarray(U_f), np.asarray(U_j), atol=1e-9)
    np.testing.assert_allclose(np.asarray(X_f), np.asarray(X_j), atol=1e-9)
    np.testing.assert_allclose(np.asarray(J_f), np.asarray(J_j), rtol=1e-9)


def test_chunked_feedback_matches_unchunked(arm7, rng):
    """feedback_rollout_fused_chunked (K split over VMEM-sized column
    chunks — the humanoid large-K tier) reproduces the jnp forward pass
    exactly at every chunk count, including non-dividing chunk widths
    (padded K rows) and the static effort clamp."""
    from rbdtpu.solver.ddp import forward_pass, forward_pass_fused

    from rbdtpu.solver import ee_reaching_cost

    m = arm7
    Bm, H = 3, 6  # B=3 exercises the batch pad path (Bp=8)
    nx, nv, ndx = m.nq + m.nv, m.nv, 2 * m.nv
    cost = ee_reaching_cost(m, jnp.array([0.3, 0.2, 0.6]))
    q0 = jnp.array(rng.uniform(-0.3, 0.3, (Bm, m.nq)))
    x0 = jnp.concatenate([q0, jnp.zeros((Bm, nv))], -1)
    from rbdtpu.solver.ddp import _step_plain

    U = 0.1 * jnp.array(rng.standard_normal((Bm, H, nv)))
    Xs = [x0]
    for t in range(H):
        Xs.append(_step_plain(m, Xs[-1], U[:, t], 0.01, -9.81))
    X = jnp.stack(Xs, axis=1)
    k = 0.05 * jnp.array(rng.standard_normal((Bm, H, nv)))
    K = 0.05 * jnp.array(rng.standard_normal((Bm, H, nv, ndx)))
    alphas = jnp.array([1.0, 0.5, 0.25])
    u_clip = m.u_limit_vector()
    for clip in (None, u_clip):
        X_j, U_j, J_j = forward_pass(m, cost, X, U, k, K, alphas, 0.01,
                                     -9.81, u_clip=clip)
        # nchunks=3: cw=5, ndx_p=15 > ndx=14 -> padded K rows; nchunks=99
        # exercises the renormalization to <= ndx nonempty chunks
        for c in (1, 2, 3, 99):
            X_c, U_c, J_c = forward_pass_fused(
                m, cost, X, U, k, K, alphas, 0.01, -9.81, u_clip=clip,
                nchunks=c,
            )
            np.testing.assert_allclose(np.asarray(U_c), np.asarray(U_j),
                                       atol=1e-9)
            np.testing.assert_allclose(np.asarray(X_c), np.asarray(X_j),
                                       atol=1e-9)
            np.testing.assert_allclose(np.asarray(J_c), np.asarray(J_j),
                                       rtol=1e-9)


def test_chunked_feedback_quat_root(quadruped12quat, rng):
    """Chunked-K feedback on the QUATERNION root: the per-chunk recomputed
    manifold tangent diff must equal the unchunked kernel's."""
    from rbdtpu.solver.ddp import forward_pass, forward_pass_fused
    from rbdtpu.solver import ee_reaching_cost
    from rbdtpu.solver.integrate import config_retract

    m = quadruped12quat
    Bm, H = 2, 4
    nv, ndx = m.nv, 2 * m.nv
    cost = ee_reaching_cost(m, jnp.array([0.2, 0.1, 0.3]))
    q0 = jnp.zeros((Bm, m.nq)).at[:, 2].set(0.35).at[:, 3].set(1.0)
    q0 = config_retract(
        m, q0, 0.05 * jnp.array(rng.standard_normal((Bm, nv)))
    )
    x0 = jnp.concatenate([q0, jnp.zeros((Bm, nv))], -1)
    from rbdtpu.solver.ddp import _step_plain

    U = 0.1 * jnp.array(rng.standard_normal((Bm, H, nv)))
    Xs = [x0]
    for t in range(H):
        Xs.append(_step_plain(m, Xs[-1], U[:, t], 0.01, -9.81))
    X = jnp.stack(Xs, axis=1)
    k = 0.05 * jnp.array(rng.standard_normal((Bm, H, nv)))
    K = 0.05 * jnp.array(rng.standard_normal((Bm, H, nv, ndx)))
    alphas = jnp.array([1.0, 0.25])
    X_j, U_j, J_j = forward_pass(m, cost, X, U, k, K, alphas, 0.01, -9.81)
    X_c, U_c, J_c = forward_pass_fused(
        m, cost, X, U, k, K, alphas, 0.01, -9.81, nchunks=4
    )
    np.testing.assert_allclose(np.asarray(U_c), np.asarray(U_j), atol=1e-9)
    np.testing.assert_allclose(np.asarray(X_c), np.asarray(X_j), atol=1e-9)
    np.testing.assert_allclose(np.asarray(J_c), np.asarray(J_j), rtol=1e-9)


def test_fused_feedback_forward_pass_matches_jnp(arm7, rng):
    """The packed feedback-rollout kernel (feedback law fused into the
    dynamics step, zero per-step layout ops) produces EXACTLY the jnp
    forward pass: same accepted costs and controls after several DDP
    iterations — both unconstrained and with the static effort-box clamp
    (u_limits) folded into the kernel."""
    from rbdtpu.solver import DDPConfig, ddp_solve, ee_reaching_cost
    from rbdtpu.dynamics import rnea

    m = arm7
    cost = ee_reaching_cost(m, jnp.array([0.3, 0.2, 0.6]))
    Bm, H = 2, 8
    q0 = jnp.array(rng.uniform(-0.3, 0.3, (Bm, m.nq)))
    x0 = jnp.concatenate([q0, jnp.zeros((Bm, m.nv))], -1)
    zero = jnp.zeros((Bm, m.nv))
    U0 = jnp.broadcast_to(
        rnea(m, q0, zero, zero)[0][:, None, :], (Bm, H, m.nv)
    )
    for lim in (False, True):
        cfg = dict(iters=3, dt=0.01, n_alphas=4, fused=True, u_limits=lim)
        s_f, _ = ddp_solve(m, cost, x0, U0, DDPConfig(**cfg))
        s_j, _ = ddp_solve(
            m, cost, x0, U0, DDPConfig(**cfg, fused_feedback=False)
        )
        np.testing.assert_allclose(np.asarray(s_f.J), np.asarray(s_j.J),
                                   rtol=1e-9)
        np.testing.assert_allclose(np.asarray(s_f.U), np.asarray(s_j.U),
                                   atol=1e-9)


def test_probe_failure_degrades_gracefully(arm7, rng, monkeypatch):
    """A failed kernel compile probe (simulating a Mosaic scoped-VMEM
    overflow, VERDICT r2 item 2) silently falls the solver back to the jnp
    paths: the solve completes and equals the explicitly-jnp solve exactly."""
    from rbdtpu.kernels import probe
    from rbdtpu.kernels.fused import feedback_fused_ok
    from rbdtpu.kernels.colvec import linearize_fused_ok
    from rbdtpu.solver import DDPConfig, ddp_solve, quadratic_tracking_cost

    monkeypatch.setenv(
        "RBDTPU_PROBE_FAIL",
        "feedback_rollout,feedback_chunked,colvec_linearize,"
        "riccati_backward,riccati_chunked",
    )
    probe.clear()
    try:
        from rbdtpu.kernels.riccati_chunk import riccati_chunk_ok

        assert not feedback_fused_ok(arm7, 64)
        assert not linearize_fused_ok(arm7, 64)
        assert not riccati_chunk_ok(36, 18, 64)

        H = 8
        cost = quadratic_tracking_cost(arm7, jnp.zeros(arm7.nx))
        x0 = jnp.array(rng.uniform(-0.5, 0.5, arm7.nx))
        U0 = jnp.zeros((H, arm7.nv))
        cfg_probed = DDPConfig(iters=3, fused=True, fused_riccati=True)
        st, _ = ddp_solve(arm7, cost, x0, U0, cfg_probed)
        # all probes failed -> identical code path to the forced-jnp config
        # (rollout kernel fd_step_fused is unprobed: tiny fixed footprint)
        cfg_jnp = DDPConfig(iters=3, fused=True, fused_feedback=False,
                            fused_linearize=False, fused_riccati=False)
        st_ref, _ = ddp_solve(arm7, cost, x0, U0, cfg_jnp)
        np.testing.assert_array_equal(np.asarray(st.U), np.asarray(st_ref.U))
    finally:
        probe.clear()

    # TIER degradation: only the unchunked feedback kernel fails and the
    # caller opts into the chunked tier (fused_feedback=True — measured
    # slower than jnp at large batch, so auto stops at the unchunked
    # kernel) -> the solver falls back to the CHUNKED-K kernel and still
    # matches the jnp solve to roundoff
    monkeypatch.setenv("RBDTPU_PROBE_FAIL", "feedback_rollout")
    probe.clear()
    try:
        from rbdtpu.kernels.fused import feedback_chunked_ok

        assert not feedback_fused_ok(arm7, 64)
        assert feedback_chunked_ok(arm7, 64) is not None

        H = 8
        cost = quadratic_tracking_cost(arm7, jnp.zeros(arm7.nx))
        x0 = jnp.array(rng.uniform(-0.5, 0.5, arm7.nx))
        U0 = jnp.zeros((H, arm7.nv))
        st, _ = ddp_solve(arm7, cost, x0, U0,
                          DDPConfig(iters=3, fused=True,
                                    fused_feedback=True))
        st_ref, _ = ddp_solve(
            arm7, cost, x0, U0,
            DDPConfig(iters=3, fused=True, fused_feedback=False),
        )
        np.testing.assert_allclose(np.asarray(st.U), np.asarray(st_ref.U),
                                   atol=1e-9)
    finally:
        probe.clear()


def test_probe_compile_exception_returns_false():
    """probe_ok traps compile-time exceptions (the Mosaic failure class) and
    memoizes False instead of propagating."""
    from rbdtpu.kernels import probe

    probe.clear()
    try:
        def boom(x):
            raise RuntimeError("Mosaic: scoped vmem limit exceeded (simulated)")

        args = (jax.ShapeDtypeStruct((8,), jnp.float32),)
        assert not probe.probe_ok("boom_kernel", ("k",), boom, args,
                                  on_tpu=True)
        # memoized: a second call must not re-raise/re-compile
        assert not probe.probe_ok("boom_kernel", ("k",), boom, args,
                                  on_tpu=True)
        # off-TPU short-circuits True without calling fn
        assert probe.probe_ok("other_kernel", ("k",), boom, args,
                              on_tpu=False)
    finally:
        probe.clear()


def test_ee_gn_fused_matches_analytic(arm7, rng):
    """kernels.fk_lane.ee_gn_fused (geometric position Jacobian, colvec
    layout) equals the analytic FK chain derivative path (C11/C12) to
    roundoff, and the fused ee_reaching_cost quadratization equals the jnp
    one."""
    from rbdtpu.kernels.fk_lane import ee_gn_fused
    from rbdtpu.kinematics.fk import ee_pose, ee_pose_gradient
    from rbdtpu.solver import ee_reaching_cost
    from rbdtpu.solver.costs import quadratize_trajectory

    m = arm7
    Bq = 16
    q = jnp.array(rng.uniform(-1.5, 1.5, (Bq, m.nq)))
    tgt = (0.3, 0.2, 0.6)
    e, g0, H0 = ee_gn_fused(m, q, tgt)
    pos = ee_pose(m, q)[..., 0, :3]
    e_ref = pos - jnp.array(tgt)
    J = ee_pose_gradient(m, q)[..., 0, :3, :]
    np.testing.assert_allclose(np.asarray(e), np.asarray(e_ref), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(g0),
        np.asarray(jnp.einsum("...ri,...r->...i", J, e_ref)), atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(H0),
        np.asarray(jnp.einsum("...ri,...rj->...ij", J, J)), atol=1e-12,
    )
    # full-cost equivalence: fused vs jnp quadratization of the same states
    H = 4
    X = jnp.array(rng.uniform(-1, 1, (H + 1, m.nx)))
    U = jnp.array(rng.uniform(-1, 1, (H, m.nv)))
    c_f = ee_reaching_cost(m, jnp.array(tgt), fused=True)
    c_j = ee_reaching_cost(m, jnp.array(tgt), fused=False)
    out_f = quadratize_trajectory(c_f, X, U)
    out_j = quadratize_trajectory(c_j, X, U)
    for a, b in zip(out_f, out_j):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
    from rbdtpu.solver import trajectory_cost
    np.testing.assert_allclose(
        float(trajectory_cost(c_f, X[None], U[None])[0]),
        float(trajectory_cost(c_j, X[None], U[None])[0]), rtol=1e-12,
    )


def test_ee_gn_fused_quat_root(quadruped12quat, rng):
    """ee_gn_fused on the QUATERNION root: the kernel's 6 tangent root
    columns (body-twist chart) equal the analytic tangent Jacobian, and
    the quat ee_reaching_cost quadratization matches the tangent-AD oracle
    exactly on the gradient rows (lx/lfx; lxx is Gauss-Newton by design)."""
    from rbdtpu.kernels.fk_lane import ee_gn_fused
    from rbdtpu.kinematics.fk import ee_pose, ee_position_jacobian_tangent
    from rbdtpu.solver import ee_reaching_cost
    from rbdtpu.solver.costs import Cost, quadratize_trajectory
    from rbdtpu.solver.integrate import config_retract

    m = quadruped12quat
    ee = [m.joint_names[m.leaves()[0]]]
    Bq = 8
    q0 = jnp.zeros((Bq, m.nq)).at[:, 2].set(0.35).at[:, 3].set(1.0)
    q = config_retract(
        m, q0, jnp.array(rng.uniform(-0.5, 0.5, (Bq, m.nv)))
    )
    tgt = (0.2, 0.1, 0.3)
    e, g0, H0 = ee_gn_fused(m, q, tgt, ee_names=ee)
    e_ref = ee_pose(m, q, ee_names=ee)[..., 0, :3] - jnp.array(tgt)
    J = ee_position_jacobian_tangent(m, q, ee_names=ee)[..., 0, :, :]
    np.testing.assert_allclose(np.asarray(e), np.asarray(e_ref), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(g0),
        np.asarray(jnp.einsum("...ri,...r->...i", J, e_ref)), atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(H0),
        np.asarray(jnp.einsum("...ri,...rj->...ij", J, J)), atol=1e-12,
    )
    # analytic tangent quadratization vs the tangent-AD oracle
    H = 3
    X = jnp.concatenate(
        [config_retract(
            m, jnp.broadcast_to(q0[:1], (H + 1, m.nq)),
            0.3 * jnp.array(rng.standard_normal((H + 1, m.nv)))),
         0.2 * jnp.array(rng.standard_normal((H + 1, m.nv)))], -1)
    U = jnp.array(rng.uniform(-1, 1, (H, m.nv)))
    c = ee_reaching_cost(m, jnp.array(tgt), ee_names=ee)
    c_ad = Cost(c.stage, c.terminal, None, None)
    out_an = quadratize_trajectory(c, X, U, model=m)
    out_ad = quadratize_trajectory(c_ad, X, U, model=m)
    ndim = 2 * m.nv
    assert out_an[0].shape == (H, ndim)  # lx in tangent dims
    for i in (0, 1, 5):  # lx, lu, lfx: exact
        np.testing.assert_allclose(np.asarray(out_an[i]),
                                   np.asarray(out_ad[i]), atol=1e-12)


def test_ee_gn_probe_resolves_ee_chain(quadruped12fb, monkeypatch):
    """REGRESSION: the ee_gn compile probe must resolve the SAME EE chain as
    the cost's actual call.  The gate used to omit ee_names, so on any
    multi-leaf model (quadruped feet, humanoid hands) the probe raised
    'ee_names required' and permanently disabled the fused path — on TPU
    only, which is why interpret-mode tests never saw it.
    RBDTPU_PROBE_COMPILE forces off-TPU probes to really compile."""
    from rbdtpu.kernels import probe
    from rbdtpu.kernels.fk_lane import ee_gn_fused_ok

    m = quadruped12fb
    ee = [m.joint_names[m.leaves()[0]]]
    monkeypatch.setenv("RBDTPU_PROBE_COMPILE", "1")
    probe.clear()
    try:
        assert ee_gn_fused_ok(m, 8, jnp.float64, ee_names=ee)
        # no ee_names on a multi-leaf model -> the probe itself must fail
        # (this is the exact signature of the regression)
        assert not ee_gn_fused_ok(m, 8, jnp.float64)
    finally:
        probe.clear()


def test_ee_gn_fused_floating_base(quadruped12fb, rng):
    """ee_gn_fused on the rpy FLOATING ROOT: the kernel's 6 geometric root
    columns (static translation basis + chained-revolute Euler axes) equal
    the analytic fb FK Jacobian (kinematics.fk._root_hom_derivs path), and
    the fused fb ee_reaching_cost quadratization equals the jnp one."""
    from rbdtpu.kernels.fk_lane import ee_gn_fused
    from rbdtpu.kinematics.fk import ee_pose, ee_pose_gradient
    from rbdtpu.solver import ee_reaching_cost
    from rbdtpu.solver.costs import quadratize_trajectory

    m = quadruped12fb
    ee = [m.joint_names[m.leaves()[0]]]
    Bq = 8
    q = jnp.array(rng.uniform(-0.5, 0.5, (Bq, m.nq)))
    tgt = (0.2, 0.1, 0.3)
    e, g0, H0 = ee_gn_fused(m, q, tgt, ee_names=ee)
    pos = ee_pose(m, q, ee_names=ee)[..., 0, :3]
    e_ref = pos - jnp.array(tgt)
    J = ee_pose_gradient(m, q, ee_names=ee)[..., 0, :3, :]
    np.testing.assert_allclose(np.asarray(e), np.asarray(e_ref), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(g0),
        np.asarray(jnp.einsum("...ri,...r->...i", J, e_ref)), atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(H0),
        np.asarray(jnp.einsum("...ri,...rj->...ij", J, J)), atol=1e-12,
    )
    H = 3
    X = jnp.array(rng.uniform(-0.4, 0.4, (H + 1, m.nq + m.nv)))
    U = jnp.array(rng.uniform(-1, 1, (H, m.nv)))
    c_f = ee_reaching_cost(m, jnp.array(tgt), ee_names=ee, fused=True)
    c_j = ee_reaching_cost(m, jnp.array(tgt), ee_names=ee, fused=False)
    for a, b in zip(quadratize_trajectory(c_f, X, U),
                    quadratize_trajectory(c_j, X, U)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_rollout_fused_multi_matches_step_scan(arm7, quadruped12quat, rng):
    """Whole-horizon kernel (r4: time loop in the grid, VMEM-scratch state
    carry) is BIT-EXACT vs the scan-of-step-kernels path, both routes, all
    root types, including the dense-Minv variant identity."""
    from rbdtpu.kernels.fused import (
        rollout_fused_multi, fd_step_fused, fd_step_minv_fused,
    )

    for model in (arm7, quadruped12quat):
        q, qd, _ = random_state(rng, model, batch=(16,))
        x0 = jnp.asarray(np.concatenate([q, 0.3 * qd], -1))
        H = 6
        U = jnp.asarray(rng.uniform(-0.5, 0.5, (H, 16, model.nv)))
        for route, step in (("aba", fd_step_fused),
                            ("minv", fd_step_minv_fused)):
            xm = rollout_fused_multi(model, x0, U, 0.01, route=route)
            x = x0
            for t in range(H):
                x = step(model, x, U[t], 0.01)
            np.testing.assert_array_equal(
                np.asarray(xm), np.asarray(x),
                err_msg=f"{model.name} {route}",
            )


def test_fd_step_minv_factorized_equals_dense(arm7, quadruped12fb, rng):
    """The factorized M^-1 apply (aba_lane with statically-zero velocity and
    zero gravity) equals the dense minv_lane route at machine precision —
    the algebraic identity behind fd_step_minv_fused's default."""
    from rbdtpu.kernels.fused import fd_step_minv_fused

    for model in (arm7, quadruped12fb):
        q, qd, tau = random_state(rng, model, batch=(8,))
        x = jnp.asarray(np.concatenate([q, qd], -1))
        u = jnp.asarray(tau)
        xs = fd_step_minv_fused(model, x, u, 0.01)
        xd = fd_step_minv_fused(model, x, u, 0.01, dense_minv=True)
        np.testing.assert_allclose(np.asarray(xs), np.asarray(xd),
                                   atol=1e-12)
