"""Batched small-matrix primitives tuned for the TPU.

Two regimes, dispatched on the contraction size (r4):

- TINY (< _MXU_MIN, the 6-D spatial algebra): XLA lowers batched tiny
  dot_generals ((B,6,6)@(B,6,6)-style) through the MXU path with poor
  utilization; broadcast-multiply-reduce keeps them in VPU fusions —
  measured ~2.6x faster on the articulated-inertia chain (v5e, B=4096).
- MXU dot_general (>= _MXU_MIN): MEASURED A LOSS at every size tried
  (tools/bench_mxu_dispatch.py, v5e 2026-08-20: Riccati backward sweep
  einsum-vs-broadcast — arm7 B=128 nx=14: 7.92 vs 3.53 ms; quadruped
  B=1024 nx=36: 85.9 vs 45.6 ms).  XLA lowers batch-of-small gemms poorly
  on the MXU even at 36x36, so the threshold is parked at infinity and the
  broadcast form is used everywhere; the dispatch stays so the decision is
  one measured constant away if a future XLA improves batched gemms.

All helpers contract over the trailing axes with arbitrary leading batch
dims; shapes follow the (..., rows, cols) convention of the package.
"""
from __future__ import annotations

import jax.numpy as jnp

# contraction size at or above which the MXU dot_general path would engage:
# parked at infinity — measured a 2x LOSS at nx=14 and nx=36 (see header)
_MXU_MIN = 10**9


def mm(A, B):
    """A @ B for (..., i, j) x (..., j, k) -> (..., i, k)."""
    if A.shape[-1] >= _MXU_MIN:
        return jnp.einsum("...ij,...jk->...ik", A, B)
    return (A[..., :, :, None] * B[..., None, :, :]).sum(-2)


def mtm(A, B):
    """A^T @ B for (..., j, i) x (..., j, k) -> (..., i, k)."""
    if A.shape[-2] >= _MXU_MIN:
        return jnp.einsum("...ji,...jk->...ik", A, B)
    return (A[..., :, :, None] * B[..., :, None, :]).sum(-3)


def mmt(A, B):
    """A @ B^T for (..., i, j) x (..., k, j) -> (..., i, k)."""
    if A.shape[-1] >= _MXU_MIN:
        return jnp.einsum("...ij,...kj->...ik", A, B)
    return (A[..., :, None, :] * B[..., None, :, :]).sum(-1)


def mv(A, x):
    """A @ x for (..., i, j) x (..., j) -> (..., i)."""
    return (A * x[..., None, :]).sum(-1)


def mtv(A, x):
    """A^T @ x for (..., j, i) x (..., j) -> (..., i)."""
    return (A * x[..., :, None]).sum(-2)


def outer(u, v):
    """u v^T for (..., i) x (..., j) -> (..., i, j)."""
    return u[..., :, None] * v[..., None, :]


def xtax(X, A):
    """X^T @ A @ X for (..., j, i), (..., j, k) -> (..., i, i)."""
    return mtm(X, mm(A, X))


def cholesky_small(A):
    """Batched Cholesky of a small SPD matrix with a STATIC trailing size,
    fully unrolled over the static dim — every op is elementwise over the
    batch (jnp.linalg.cholesky has no efficient batched lowering for tiny
    matrices on TPU: it dominates the Riccati sweep if used there).

    A (..., n, n) -> L (..., n, n) lower-triangular with A = L L^T.
    Entries of non-PD inputs come out NaN (sqrt of negative), which callers
    use as the PD check.
    """
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    zero = jnp.zeros_like(A[..., 0, 0])
    rows = [
        jnp.stack([L[i][j] if j <= i else zero for j in range(n)], axis=-1)
        for i in range(n)
    ]
    return jnp.stack(rows, axis=-2)


def solve_small(A, b):
    """Batched solve of a small GENERAL system with a STATIC trailing size,
    via fully unrolled Gaussian elimination (no pivoting — intended for
    well-conditioned matrices like I + PSD·PSD products in the parallel
    Riccati combine).  A (..., n, n), b (..., n) or (..., n, m)."""
    n = A.shape[-1]
    vec = b.ndim == A.ndim - 1
    if vec:
        b = b[..., None]
    # forward elimination on row lists
    rows = [[A[..., i, j] for j in range(n)] for i in range(n)]
    rhs = [b[..., i, :] for i in range(n)]
    for k in range(n):
        piv = rows[k][k]
        inv = 1.0 / piv
        for j in range(k + 1, n):
            rows[k][j] = rows[k][j] * inv
        rhs[k] = rhs[k] * inv[..., None]
        for i in range(k + 1, n):
            f = rows[i][k]
            for j in range(k + 1, n):
                rows[i][j] = rows[i][j] - f * rows[k][j]
            rhs[i] = rhs[i] - f[..., None] * rhs[k]
    # back substitution
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = rhs[i]
        for j in range(i + 1, n):
            s = s - rows[i][j][..., None] * x[j]
        x[i] = s
    out = jnp.stack(x, axis=-2)
    return out[..., 0] if vec else out


def cholesky_solve_small(L, b):
    """Solve A x = b given L = cholesky_small(A).  b (..., n) or (..., n, m);
    unrolled forward/back substitution, elementwise over the batch."""
    n = L.shape[-1]
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    # forward: L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i, :]
        for k in range(i):
            s = s - L[..., i, k, None] * y[k]
        y[i] = s / L[..., i, i, None]
    # backward: L^T x = y
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[..., k, i, None] * x[k]
        x[i] = s / L[..., i, i, None]
    out = jnp.stack(x, axis=-2)
    return out[..., 0] if vec else out
