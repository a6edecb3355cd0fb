"""Parallel (associative-scan) Riccati vs an exact-convention sequential
reference on random LQR problems, and inside DDP.
"""
import jax
import jax.numpy as jnp
import numpy as np

from rbdtpu.solver.parallel_riccati import backward_pass_parallel


def _sequential_exact(A, B, lx, lu, lxx, luu, lux, lfx, lfxx, reg):
    """Plain numpy exact-regularized Riccati (reg folded into luu; V updated
    with the regularized Quu) — the problem the parallel pass solves."""
    H, nx = A.shape[0], A.shape[-1]
    nu = B.shape[-1]
    Vx, Vxx = lfx.copy(), lfxx.copy()
    k = np.zeros((H, nu))
    K = np.zeros((H, nu, nx))
    for t in range(H - 1, -1, -1):
        luu_r = luu[t] + reg * np.eye(nu)
        Qx = lx[t] + A[t].T @ Vx
        Qu = lu[t] + B[t].T @ Vx
        Qxx = lxx[t] + A[t].T @ Vxx @ A[t]
        Quu = luu_r + B[t].T @ Vxx @ B[t]
        Qux = lux[t] + B[t].T @ Vxx @ A[t]
        k[t] = -np.linalg.solve(Quu, Qu)
        K[t] = -np.linalg.solve(Quu, Qux)
        Vx = Qx + K[t].T @ Quu @ k[t] + K[t].T @ Qu + Qux.T @ k[t]
        Vxx = Qxx + K[t].T @ Quu @ K[t] + K[t].T @ Qux + Qux.T @ K[t]
        Vxx = 0.5 * (Vxx + Vxx.T)
    return k, K


def _random_lqr(rng, H, nx, nu):
    A = np.stack([np.eye(nx) + 0.05 * rng.standard_normal((nx, nx))
                  for _ in range(H)])
    B = 0.1 * rng.standard_normal((H, nx, nu))
    lx = rng.standard_normal((H, nx))
    lu = rng.standard_normal((H, nu))
    mk_psd = lambda n: (lambda M: M @ M.T + 0.5 * np.eye(n))(
        0.3 * rng.standard_normal((n, n))
    )
    lxx = np.stack([mk_psd(nx) for _ in range(H)])
    luu = np.stack([mk_psd(nu) for _ in range(H)])
    lux = 0.1 * rng.standard_normal((H, nu, nx))
    lfx = rng.standard_normal(nx)
    lfxx = mk_psd(nx)
    return A, B, lx, lu, lxx, luu, lux, lfx, lfxx


def test_parallel_matches_sequential_exact(rng):
    H, nx, nu = 24, 6, 3
    prob = _random_lqr(rng, H, nx, nu)
    reg = 1e-6
    k_ref, K_ref = _sequential_exact(*prob, reg)
    jprob = [jnp.asarray(p) for p in prob]
    k, K, dV1, ok = backward_pass_parallel(*jprob, jnp.asarray(reg))
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(k), k_ref, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(K), K_ref, rtol=1e-6, atol=1e-8)


def test_parallel_batched(rng):
    """Leading batch dims: each problem matches its own sequential solve."""
    H, nx, nu, Bn = 10, 4, 2, 3
    probs = [_random_lqr(rng, H, nx, nu) for _ in range(Bn)]
    stacked = [jnp.asarray(np.stack([p[i] for p in probs]))
               for i in range(9)]
    reg = jnp.full((Bn,), 1e-6)
    k, K, dV1, ok = backward_pass_parallel(*stacked, reg)
    assert k.shape == (Bn, H, nu)
    for b in range(Bn):
        k_ref, K_ref = _sequential_exact(*probs[b], 1e-6)
        np.testing.assert_allclose(np.asarray(k[b]), k_ref, rtol=1e-5,
                                   atol=1e-7)


def test_ddp_with_parallel_riccati(arm7, rng):
    from rbdtpu.solver import (
        DDPConfig, ddp_solve, pack_state, quadratic_tracking_cost, rollout,
        trajectory_cost,
    )

    H = 16
    cost = quadratic_tracking_cost(
        arm7, pack_state(jnp.full(arm7.nq, 0.3), jnp.zeros(arm7.nv)),
        w_u=1e-5,
    )
    x0 = pack_state(jnp.zeros(arm7.nq), jnp.zeros(arm7.nv))
    U0 = jnp.zeros((H, arm7.nv))
    X0 = rollout(arm7, x0, U0, 0.02)
    J0 = trajectory_cost(cost, X0, U0)
    st_par, _ = ddp_solve(
        arm7, cost, x0, U0,
        DDPConfig(iters=8, dt=0.02, n_alphas=6, parallel_riccati=True),
    )
    st_seq, _ = ddp_solve(
        arm7, cost, x0, U0,
        DDPConfig(iters=8, dt=0.02, n_alphas=6, parallel_riccati=False),
    )
    assert float(st_par.J) < 0.3 * float(J0)
    # both converge to comparable cost (different iterates are expected)
    assert float(st_par.J) < 1.5 * float(st_seq.J) + 1e-6
