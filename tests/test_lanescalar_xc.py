"""Direct unit tests of the compact (E, r) Plücker lane algebra
(kernels.lanescalar "compact Plücker" section, r4): every xc_* op must
equal its dense 6x6 counterpart exactly (the fused kernels are converted
wholesale, so these identities carry the whole kernel layer).
"""
import numpy as np
import jax.numpy as jnp

from rbdtpu.kernels import lanescalar as ls
from rbdtpu.kernels.fused import get_static, _body_x, _body_xc
from rbdtpu.model import load_asset

from conftest import random_state


def _rand_plux(rng):
    """Random dense spatial motion transform + its (E, r)."""
    A = rng.standard_normal((3, 3))
    # random rotation via QR with det fix
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] = -Q[:, 0]
    r = rng.standard_normal(3)
    rh = np.array([[0, -r[2], r[1]], [r[2], 0, -r[0]], [-r[1], r[0], 0.0]])
    X = np.zeros((6, 6))
    X[:3, :3] = Q
    X[3:, 3:] = Q
    X[3:, :3] = -Q @ rh
    return X, Q, r


def test_plux_split_static_roundtrip(rng):
    X, Q, r = _rand_plux(rng)
    E2, r2 = ls.plux_split_static(X)
    np.testing.assert_allclose(np.array(E2), Q, atol=1e-12)
    np.testing.assert_allclose(np.array(r2), r, atol=1e-12)
    # xc_dense inverts the split
    D = ls.xc_dense((E2, list(r2)))
    np.testing.assert_allclose(np.array(D, dtype=float), X, atol=1e-12)


def test_xc_ops_match_dense(rng):
    X, Q, r = _rand_plux(rng)
    E = [[float(Q[i][j]) for j in range(3)] for i in range(3)]
    Xc = (E, [float(v) for v in r])
    Xl = [[float(X[i][j]) for j in range(6)] for i in range(6)]
    m = [float(v) for v in rng.standard_normal(6)]
    np.testing.assert_allclose(
        np.array(ls.xc_mv(Xc, m)), np.array(ls.matvec(Xl, m)), atol=1e-12
    )
    np.testing.assert_allclose(
        np.array(ls.xc_mtv(Xc, m)), np.array(ls.matvec_T(Xl, m)), atol=1e-12
    )
    S = rng.standard_normal((6, 6))
    S = S + S.T
    Sl = [[float(S[i][j]) for j in range(6)] for i in range(6)]
    got = np.array(ls.xc_xtax_sym(Xc, Sl), dtype=float)
    want = X.T @ S @ X
    np.testing.assert_allclose(got, want, atol=1e-10)
    assert np.allclose(got, got.T, atol=0)  # aliased symmetry is exact


def test_xc_ops_on_lane_tiles(rng):
    """Same identities on (8, L) jnp lane tiles (the kernel regime)."""
    X, Q, r = _rand_plux(rng)
    L = 16
    tile = lambda v: jnp.full((8, L), float(v), jnp.float64)
    E = [[tile(Q[i][j]) for j in range(3)] for i in range(3)]
    Xc = (E, [float(v) for v in r])  # static r, dynamic E — the kernel mix
    m = [tile(v) for v in rng.standard_normal(6)]
    got = np.array([np.asarray(x)[0, 0] for x in ls.xc_mv(Xc, m)])
    want = X @ np.array([np.asarray(v)[0, 0] for v in m])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_body_xc_matches_body_x(arm7, quadruped12fb, quadruped12quat, rng):
    """Compact builder == dense builder for every joint/root type."""
    for model in (arm7, quadruped12fb, quadruped12quat):
        ms = get_static(model)
        q, _, _ = random_state(rng, model)
        q_s = [jnp.float64(v) for v in q]
        for i in range(ms.nb):
            dense = _body_x(ms, i, q_s)
            E, r = _body_xc(ms, i, q_s)
            back = ls.xc_dense((E, r))
            d = np.array([[float(np.asarray(dense[a][b]))
                           for b in range(6)] for a in range(6)])
            c = np.array([[float(np.asarray(back[a][b]))
                           for b in range(6)] for a in range(6)])
            np.testing.assert_allclose(c, d, atol=1e-12,
                                       err_msg=f"{model.name} body {i}")


def test_sym_helpers(rng):
    u = [float(v) for v in rng.standard_normal(6)]
    M = np.array(ls.outer_sym(u), dtype=float)
    np.testing.assert_allclose(M, np.outer(u, u), atol=1e-15)
    A = rng.standard_normal((6, 6))
    A = A + A.T
    B = rng.standard_normal((6, 6))
    B = B + B.T
    Al = [[float(A[i][j]) for j in range(6)] for i in range(6)]
    Bl = [[float(B[i][j]) for j in range(6)] for i in range(6)]
    np.testing.assert_allclose(
        np.array(ls.mat_add_sym(Al, Bl), dtype=float), A + B, atol=1e-15
    )
    np.testing.assert_allclose(
        np.array(ls.mat_combine_sym(Al, Bl, -0.7), dtype=float),
        A - 0.7 * B, atol=1e-14,
    )
