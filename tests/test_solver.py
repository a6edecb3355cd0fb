"""Solver tests: rollout correctness, DDP convergence on a small reaching task,
MPPI improvement, and linearization consistency with AD (SURVEY.md §4).
Small horizon/model keeps CPU compile time bounded.
"""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from rbdtpu import dynamics as dyn
from rbdtpu.solver import (
    DDPConfig, MPPIConfig, ddp_solve, ee_reaching_cost,
    euler_semi_implicit, linearize_trajectory, mppi_solve, pack_state,
    quadratic_tracking_cost, rollout, split_state, trajectory_cost,
)


@pytest.fixture(scope="module", autouse=True)
def _no_persistent_cache():
    """This module's big (vmapped) DDP executables sporadically SIGSEGV
    XLA:CPU's executable (de)serializer in long many-compilation processes
    (crash sites seen: compile, cache write, cache read — all on the same
    test; see the conftest/CLAUDE.md note).  Keep them out of the persistent
    compile cache; in-run in-memory caching is unaffected."""
    from jax._src import compilation_cache as cc

    old = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    cc.reset_cache()  # is_cache_used latches per-process; force a re-check
    yield
    jax.config.update("jax_compilation_cache_dir", old)
    cc.reset_cache()


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


def test_mppi_native_batch(arm7, rng):
    """mppi_solve with leading problem dims: one key drives independent
    noise for every problem, every problem's accepted cost is monotone
    non-increasing, and the batched run beats each problem's nominal."""
    from rbdtpu.solver import hybrid_solve

    H, Bn = 10, 3
    cfg = MPPIConfig(n_samples=128, sigma=0.5, dt=0.02, temperature=0.02)
    cost = quadratic_tracking_cost(
        arm7, pack_state(jnp.zeros(arm7.nq), jnp.zeros(arm7.nv)),
        w_q=1.0, w_qd=0.5, w_u=1e-5,
    )
    # the braking task of test_mppi_improves, per-problem initial speeds
    qd0 = 1.0 + 0.2 * jnp.array(rng.standard_normal((Bn, arm7.nv)))
    x0 = jnp.concatenate([jnp.zeros((Bn, arm7.nq)), qd0], axis=-1)
    U0 = jnp.zeros((Bn, H, arm7.nv))
    U, hist = mppi_solve(arm7, cost, x0, U0, jax.random.PRNGKey(0),
                         iters=10, config=cfg)
    assert U.shape == (Bn, H, arm7.nv) and hist.shape == (10, Bn)
    X0 = rollout(arm7, x0, U0, cfg.dt)
    J0 = trajectory_cost(cost, X0, U0)
    Xf = rollout(arm7, x0, U, cfg.dt)
    Jf = trajectory_cost(cost, Xf, U)
    assert np.all(np.asarray(Jf) < np.asarray(J0))
    h = np.asarray(hist)
    assert np.all(np.diff(h, axis=0) <= 1e-9)
    # problems see DIFFERENT noise (not a broadcast of one sample stream)
    assert not np.allclose(np.asarray(U[0]), np.asarray(U[1]))

    # natively-batched hybrid: MPPI warm start then batched DDP
    state, _ = hybrid_solve(
        arm7, cost, x0, U0, jax.random.PRNGKey(1),
        cfg, DDPConfig(iters=2, dt=0.02, n_alphas=4), mppi_iters=2,
    )
    assert state.J.shape == (Bn,)
    assert np.all(np.isfinite(np.asarray(state.J)))


def test_hybrid_native_batch_floating_base(quadruped12fb, rng):
    """Natively-batched hybrid on a floating-base model with fused kernels:
    problems x samples flatten through the fused rollout, the DDP stage
    takes the fused feedback line search, and costs stay finite."""
    from rbdtpu.solver import hybrid_solve

    m = quadruped12fb
    Bn, H = 2, 4
    nx = m.nq + m.nv
    q0 = jnp.zeros((Bn, m.nq)).at[:, 2].set(0.35)
    q0 = q0 + 0.02 * jnp.array(rng.standard_normal((Bn, m.nq)))
    x0 = jnp.concatenate([q0, jnp.zeros((Bn, m.nv))], -1)
    goal = jnp.zeros(nx).at[2].set(0.4)
    cost = quadratic_tracking_cost(m, goal, w_q=2.0, w_qd=0.05, w_u=1e-5)
    U0 = jnp.zeros((Bn, H, m.nv))
    state, _ = hybrid_solve(
        m, cost, x0, U0, jax.random.PRNGKey(2),
        MPPIConfig(n_samples=8, sigma=0.3, dt=0.01, fused=True),
        DDPConfig(iters=2, dt=0.01, n_alphas=4, fused=True),
        mppi_iters=2,
    )
    assert state.J.shape == (Bn,)
    assert np.all(np.isfinite(np.asarray(state.J)))


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


def _pend2():
    """Planar 2-link pendulum for swing-up (strong gravity nonlinearity)."""
    from rbdtpu.model import parse_urdf

    urdf = """<robot name=\"pend2\">
    <link name=\"base\"/>
    <link name=\"l1\"><inertial><origin xyz=\"0 0 -0.25\"/><mass value=\"1.0\"/>
      <inertia ixx=\"0.02\" iyy=\"0.02\" izz=\"0.002\" ixy=\"0\" ixz=\"0\" iyz=\"0\"/></inertial></link>
    <link name=\"l2\"><inertial><origin xyz=\"0 0 -0.25\"/><mass value=\"1.0\"/>
      <inertia ixx=\"0.02\" iyy=\"0.02\" izz=\"0.002\" ixy=\"0\" ixz=\"0\" iyz=\"0\"/></inertial></link>
    <joint name=\"j1\" type=\"revolute\"><origin xyz=\"0 0 0\"/><parent link=\"base\"/><child link=\"l1\"/><axis xyz=\"0 1 0\"/></joint>
    <joint name=\"j2\" type=\"revolute\"><origin xyz=\"0 0 -0.5\"/><parent link=\"l1\"/><child link=\"l2\"/><axis xyz=\"0 1 0\"/></joint>
    </robot>"""
    return parse_urdf(urdf, dtype=np.float64)


def test_exact_hessian_q_expansion_matches_ad(arm7, rng):
    """The FULL-DDP backward pass folds Vx . d2(step)/dz2 into Qxx/Qux
    exactly: the fdsva_so contraction equals AD Hessians of Vx . step."""
    from rbdtpu.dynamics.idsva import fdsva_so
    from rbdtpu.solver.integrate import euler_semi_implicit

    n = arm7.nv
    dt = 0.02
    x = jnp.array(rng.uniform(-0.5, 0.5, 2 * n))
    u = jnp.array(rng.uniform(-2, 2, n))
    Vx = jnp.array(rng.standard_normal(2 * n))

    def stepf(x_, u_):
        q, qd = x_[:n], x_[n:]
        return euler_semi_implicit(
            arm7, x_, dyn.forward_dynamics(arm7, q, qd, u_), dt
        )

    s = lambda x_, u_: Vx @ stepf(x_, u_)
    Hxx = np.asarray(jax.hessian(s, argnums=0)(x, u))
    Hux = np.asarray(jax.jacfwd(jax.jacfwd(s, argnums=1), argnums=0)(x, u))

    Hq, Hvq, Hvv, Htq = fdsva_so(arm7, x[:n], x[n:], u)
    w = np.asarray(dt * dt * Vx[:n] + dt * Vx[n:])
    Wqq = np.einsum("r,rjk->jk", w, np.asarray(Hq))
    Wvq = np.einsum("r,rjk->jk", w, np.asarray(Hvq))
    Wvv = np.einsum("r,rjk->jk", w, np.asarray(Hvv))
    Wtq = np.einsum("r,rjk->jk", w, np.asarray(Htq))
    np.testing.assert_allclose(
        np.block([[Wqq, Wvq.T], [Wvq, Wvv]]), Hxx, atol=1e-9
    )
    np.testing.assert_allclose(
        np.concatenate([Wtq, np.zeros_like(Wtq)], axis=1), Hux, atol=1e-9
    )


@pytest.mark.slow
def test_exact_hessian_ddp_converges_faster():
    """On the expensive-control swing-up (large residual at the optimum —
    the regime where Gauss-Newton contraction is slow), FULL DDP
    (exact_hessians=True, fdsva_so curvature) converges in FEWER iterations
    than iLQR and to a tighter gap (VERDICT round-1 item 4)."""
    m = _pend2()
    H, DT = 150, 0.02
    x0 = jnp.zeros(4)
    x_goal = jnp.array([np.pi, 0.0, 0.0, 0.0])
    cost = quadratic_tracking_cost(
        m, x_goal, w_q=0.1, w_qd=0.05, w_u=0.05, w_q_f=600.0, w_qd_f=60.0
    )
    U0 = jnp.zeros((H, m.nv))

    ddp_state, J_ddp = ddp_solve(
        m, cost, x0, U0,
        DDPConfig(iters=60, dt=DT, exact_hessians=True, reg_init=1.0),
    )
    ilqr_state, J_ilqr = ddp_solve(
        m, cost, x0, U0, DDPConfig(iters=60, dt=DT)
    )
    Jstar = 77.30614  # converged value (validated at 400 iLQR iters)
    gap_ddp = np.asarray(J_ddp) - Jstar
    gap_ilqr = np.asarray(J_ilqr) - Jstar
    tol = 1e-6
    it_ddp = int(np.argmax(gap_ddp < tol))
    assert (gap_ddp < tol).any() and it_ddp <= 50, f"DDP gap {gap_ddp[-1]:.2e}"
    # iLQR must NOT have reached the same tolerance within the same budget
    # (it measures ~124 iterations on this problem)
    assert not (gap_ilqr < tol).any(), f"iLQR unexpectedly fast: {gap_ilqr[-1]:.2e}"
    assert float(ddp_state.J) < float(ilqr_state.J)


def test_ddp_respects_control_limits(rng):
    """With u_limits=True every solved control obeys the URDF effort box, and
    the clamped solve still improves the cost (VERDICT r1 item 9).  A tight
    artificial limit guarantees the unconstrained optimum is outside the
    box."""
    from rbdtpu.model import parse_urdf

    urdf = """<robot name="lim2">
    <link name="base"/>
    <link name="l1"><inertial><origin xyz="0 0 -0.25"/><mass value="1.0"/>
      <inertia ixx="0.02" iyy="0.02" izz="0.002" ixy="0" ixz="0" iyz="0"/></inertial></link>
    <link name="l2"><inertial><origin xyz="0 0 -0.25"/><mass value="1.0"/>
      <inertia ixx="0.02" iyy="0.02" izz="0.002" ixy="0" ixz="0" iyz="0"/></inertial></link>
    <joint name="j1" type="revolute"><origin xyz="0 0 0"/><parent link="base"/><child link="l1"/><axis xyz="0 1 0"/>
      <limit lower="-3" upper="3" effort="2.0" velocity="10"/></joint>
    <joint name="j2" type="revolute"><origin xyz="0 0 -0.5"/><parent link="l1"/><child link="l2"/><axis xyz="0 1 0"/>
      <limit lower="-3" upper="3" effort="2.0" velocity="10"/></joint>
    </robot>"""
    m = parse_urdf(urdf, dtype=np.float64)
    H, dt = 30, 0.02
    x_goal = jnp.array([np.pi, 0.0, 0.0, 0.0])
    cost = quadratic_tracking_cost(
        m, x_goal, w_q=10.0, w_qd=0.1, w_u=1e-4, w_q_f=200.0, w_qd_f=20.0
    )
    x0 = jnp.zeros(4)
    U0 = jnp.zeros((H, m.nv))
    state, J_hist = ddp_solve(
        m, cost, x0, U0, DDPConfig(iters=15, dt=dt, u_limits=True)
    )
    lim = np.asarray(m.u_limit_vector())
    assert (np.abs(np.asarray(state.U)) <= lim + 1e-12).all()
    J = np.asarray(J_hist)
    assert J[-1] < J[0]
    # sanity: the unconstrained solve DOES exceed the box (the limit binds)
    state_u, _ = ddp_solve(m, cost, x0, U0, DDPConfig(iters=15, dt=dt))
    assert np.abs(np.asarray(state_u.U)).max() > lim.max()


def test_mppi_respects_control_limits(rng):
    from rbdtpu.model import load_asset
    from rbdtpu.solver import MPPIConfig, mppi_solve

    m = load_asset("arm7", dtype=np.float64)
    H, dt = 10, 0.01
    cost = quadratic_tracking_cost(
        m, jnp.zeros(2 * m.nv), w_q=1.0, w_qd=0.1, w_u=1e-6
    )
    x0 = jnp.array(np.concatenate([rng.uniform(-1, 1, m.nq), np.zeros(m.nv)]))
    U0 = jnp.zeros((H, m.nv))
    U, _ = mppi_solve(
        m, cost, x0, U0, jax.random.PRNGKey(0), iters=4,
        config=MPPIConfig(n_samples=64, sigma=500.0, dt=dt, u_limits=True),
    )
    assert (np.abs(np.asarray(U)) <= np.asarray(m.u_limit_vector()) + 1e-9).all()


def test_limit_barrier_derivs_match_ad(arm7, rng):
    """add_limit_barrier's analytic quadratization matches AD of the wrapped
    stage/terminal (gradient exactly; Hessian in the Gauss-Newton sense on
    the base cost's terms, exact on the barrier diagonal)."""
    from rbdtpu.solver import add_limit_barrier
    from rbdtpu.solver.costs import quadratize_trajectory

    base = quadratic_tracking_cost(arm7, jnp.zeros(arm7.nx))
    cost = add_limit_barrier(arm7, base, w_q=50.0, w_qd=5.0)
    # states straddling the arm7 limits (|q| <= 2.96, |qd| <= 10)
    H = 4
    X = jnp.array(rng.uniform(-4.0, 4.0, (H + 1, arm7.nx)))
    X = X.at[..., arm7.nq:].mul(4.0)  # some velocities beyond 10
    U = jnp.array(rng.uniform(-1, 1, (H, arm7.nv)))
    lx, lu, lxx, luu, lux, lfx, lfxx = quadratize_trajectory(cost, X, U)
    # AD ground truth per knot
    for t in range(H):
        g = jax.grad(lambda x: cost.stage(x, U[t], t))(X[t])
        np.testing.assert_allclose(np.asarray(lx[t]), np.asarray(g), atol=1e-9)
        h = jax.hessian(lambda x: cost.stage(x, U[t], t))(X[t])
        np.testing.assert_allclose(
            np.asarray(lxx[t]), np.asarray(h), atol=1e-9
        )
    gf = jax.grad(cost.terminal)(X[-1])
    np.testing.assert_allclose(np.asarray(lfx), np.asarray(gf), atol=1e-9)


def test_ddp_limit_barrier_respects_position_limits(rng):
    """A reaching task whose unconstrained optimum violates a tight URDF
    position limit stays (approximately) inside the bound with the barrier
    (VERDICT r2 missing #4: q_lower/q_upper consumed by a solver)."""
    from rbdtpu.model import parse_urdf
    from rbdtpu.solver import add_limit_barrier

    urdf = """<robot name="qlim2">
    <link name="base"/>
    <link name="l1"><inertial><origin xyz="0 0 -0.25"/><mass value="1.0"/>
      <inertia ixx="0.02" iyy="0.02" izz="0.002" ixy="0" ixz="0" iyz="0"/></inertial></link>
    <link name="l2"><inertial><origin xyz="0 0 -0.25"/><mass value="1.0"/>
      <inertia ixx="0.02" iyy="0.02" izz="0.002" ixy="0" ixz="0" iyz="0"/></inertial></link>
    <joint name="j1" type="revolute"><origin xyz="0 0 0"/><parent link="base"/><child link="l1"/><axis xyz="0 1 0"/>
      <limit lower="-0.8" upper="0.8" effort="50" velocity="4"/></joint>
    <joint name="j2" type="revolute"><origin xyz="0 0 -0.5"/><parent link="l1"/><child link="l2"/><axis xyz="0 1 0"/>
      <limit lower="-0.8" upper="0.8" effort="50" velocity="4"/></joint>
    </robot>"""
    m = parse_urdf(urdf, dtype=np.float64)
    H, dt = 30, 0.02
    x_goal = jnp.array([1.6, 0.0, 0.0, 0.0])  # beyond the 0.8 bound
    base = quadratic_tracking_cost(
        m, x_goal, w_q=10.0, w_qd=0.1, w_u=1e-4, w_q_f=200.0, w_qd_f=20.0
    )
    cfg = DDPConfig(iters=20, dt=dt)
    x0, U0 = jnp.zeros(4), jnp.zeros((H, m.nv))
    st_un, _ = ddp_solve(m, base, x0, U0, cfg)
    q_un = np.asarray(st_un.X[..., :2])
    assert q_un.max() > 0.9  # the unconstrained optimum violates the bound

    cost = add_limit_barrier(m, base, w_q=5e3, w_qd=5e3)
    st, J_hist = ddp_solve(m, cost, x0, U0, cfg)
    q = np.asarray(st.X[..., :2])
    qd = np.asarray(st.X[..., 2:])
    assert q.max() < 0.85  # soft barrier: small overshoot allowed
    assert np.abs(qd).max() < 4.1  # velocity limit consumed too
    J = np.asarray(J_hist)
    assert J[-1] < J[0]


def test_mppi_bf16_sampling(arm7):
    """r5 (VERDICT r4 #9): bfloat16 SAMPLE rollouts keep ranking fidelity —
    the solve still improves, accepted costs stay monotone (the guard
    evaluates in f32), and the final cost lands near the f32 solve."""
    H = 10
    cost = quadratic_tracking_cost(
        arm7, pack_state(jnp.zeros(arm7.nq), jnp.zeros(arm7.nv)),
        w_q=1.0, w_qd=0.5, w_u=1e-5,
    )
    x0 = pack_state(jnp.zeros(arm7.nq), jnp.full(arm7.nv, 1.0))
    U0 = jnp.zeros((H, arm7.nv))
    X0 = rollout(arm7, x0, U0, 0.02)
    J0 = trajectory_cost(cost, X0, U0)
    kw = dict(n_samples=128, sigma=0.5, dt=0.02, temperature=0.02)
    U_b, hist_b = mppi_solve(
        arm7, cost, x0, U0, jax.random.PRNGKey(0), iters=10,
        config=MPPIConfig(**kw, sampling_dtype="bfloat16"))
    U_f, hist_f = mppi_solve(
        arm7, cost, x0, U0, jax.random.PRNGKey(0), iters=10,
        config=MPPIConfig(**kw))
    # improves and never regresses (guard runs in f32)
    Xb = rollout(arm7, x0, U_b, 0.02)
    Jb = float(trajectory_cost(cost, Xb, U_b))
    assert Jb < float(J0)
    h = np.asarray(hist_b)
    assert np.all(np.diff(h) <= 1e-9)
    # ranking fidelity: lands within 25% of the f32 solve's cost
    Xf = rollout(arm7, x0, U_f, 0.02)
    Jf = float(trajectory_cost(cost, Xf, U_f))
    assert Jb < 1.25 * Jf + 1e-9
