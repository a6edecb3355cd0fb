"""Strategy-override envs for the chunked Riccati kernel
(RBDTPU_RICCATI_STRATEGY / RBDTPU_RICCATI_BC): both variants must produce
the same gains on the same problem regardless of which side of the Bn<128
split it falls on (the r5 A/B tooling relies on this equivalence)."""
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _problem(rng, nx, nv, H, Bm):
    sym = lambda M: 0.5 * (M + np.swapaxes(M, -1, -2))
    rnd = lambda *s: jnp.array(rng.standard_normal(s))
    A = 0.1 * rnd(Bm, H, nx, nx) + jnp.eye(nx)
    Bmat = 0.1 * rnd(Bm, H, nx, nv)
    lx = rnd(Bm, H, nx)
    lu = rnd(Bm, H, nv)
    lfx = rnd(Bm, nx)
    lfxx = jnp.array(sym(np.eye(nx) + 0.1 * rng.standard_normal((Bm, nx, nx))))
    lfxx = lfxx @ jnp.swapaxes(lfxx, -1, -2)
    reg = jnp.array(rng.uniform(1e-6, 1e-2, Bm))
    lxx = jnp.array(sym(0.05 * rng.standard_normal((Bm, H, nx, nx)))) \
        + 2.0 * jnp.eye(nx)
    luu = jnp.array(sym(0.05 * rng.standard_normal((Bm, H, nv, nv)))) \
        + 2.0 * jnp.eye(nv)
    lux = 0.05 * rnd(Bm, H, nv, nx)
    return (A, Bmat, lx, lu, lxx, luu, lux, lfx, lfxx, reg)


def test_forced_strategies_agree(rng, monkeypatch):
    from rbdtpu.kernels.riccati_chunk import backward_pass_chunked

    args = _problem(rng, nx=10, nv=4, H=5, Bm=8)

    monkeypatch.setenv("RBDTPU_RICCATI_STRATEGY", "small")
    k_s, K_s, dV_s, ok_s = backward_pass_chunked(*args)
    monkeypatch.setenv("RBDTPU_RICCATI_STRATEGY", "lane")
    k_l, K_l, dV_l, ok_l = backward_pass_chunked(*args)

    np.testing.assert_allclose(np.asarray(k_l), np.asarray(k_s),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(K_l), np.asarray(K_s),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(dV_l), np.asarray(dV_s), rtol=1e-8)
    assert np.array_equal(np.asarray(ok_l), np.asarray(ok_s))


def test_chunk_size_override(rng, monkeypatch):
    from rbdtpu.kernels.riccati_chunk import backward_pass_chunked

    args = _problem(rng, nx=10, nv=4, H=4, Bm=12)
    monkeypatch.setenv("RBDTPU_RICCATI_STRATEGY", "small")
    monkeypatch.setenv("RBDTPU_RICCATI_BC", "8")
    k_8, K_8, _, _ = backward_pass_chunked(*args)
    monkeypatch.setenv("RBDTPU_RICCATI_BC", "4")
    k_4, K_4, _, _ = backward_pass_chunked(*args)
    np.testing.assert_allclose(np.asarray(k_4), np.asarray(k_8),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(K_4), np.asarray(K_8),
                               rtol=1e-8, atol=1e-10)
