"""Parallel-in-time Riccati sweep via jax.lax.associative_scan.

The sequential Riccati recursion is the per-solve latency floor of DDP
(SURVEY.md §7 hard parts: "Riccati sweep is sequential in H").  Following the
temporal-parallelization construction for LQT (Särkkä & García-Fernández,
IEEE TAC 2021; the MPC analog of the prefix-sum dynamics idea in PAPERS.md),
each knot's conditional value function is an associative element

    e = (A, b, C, eta, J)

(value of reaching x_j from x_k through the optimally-controlled segment),
with combine

    e_i (x) e_j:   D = (I + C_i J_j)^{-1}
      A = A_j D A_i
      b = A_j D (b_i + C_i eta_j) + b_j
      C = A_j D C_i A_j^T + C_j
      eta = A_i^T E (eta_j - J_j b_i) + eta_i,   E = (I + J_j C_i)^{-1}
      J = A_i^T E J_j A_i + J_i

A reversed associative_scan of suffix combines yields every knot's value
function V_k(dx) = 0.5 dx' J dx - eta' dx in O(log H) depth instead of H
sequential steps; feedback/feedforward gains then come from one batched
pointwise pass.  Cross terms lux are removed up front by completing the
square; the control regularization folds into luu, so this computes the EXACT
regularized LQR subproblem (the sequential backward_pass uses the common
mixed convention — same solutions at convergence, slightly different
iterates; see tests/test_parallel_riccati.py).

All small-matrix algebra uses the unrolled batched primitives
(spatial.batched) — jnp.linalg on tiny batched systems lowers to loops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..spatial.batched import (
    mm, mmt, mtm, mv, mtv, cholesky_small, cholesky_solve_small, solve_small,
)


def _elements(A, B, lx, lu, lxx, luu_reg, lux, lfx, lfxx):
    """Leaf elements for every knot + the terminal element.

    Inputs carry time on axis -3 (matrices) / -2 (vectors) with arbitrary
    leading batch dims; outputs gain a leading time axis of length H+1.
    """
    nx = A.shape[-1]
    # complete the square: remove lux cross terms
    L = cholesky_small(luu_reg)
    Ki = cholesky_solve_small(L, lux)          # luu^-1 lux
    ki = cholesky_solve_small(L, lu)           # luu^-1 lu
    A_t = A - mm(B, Ki)
    lxx_t = lxx - mtm(lux, Ki)
    lx_t = lx - mtv(lux, ki)
    b_t = -mv(B, ki)
    C_t = mm(B, cholesky_solve_small(L, jnp.swapaxes(B, -1, -2)))
    eta_t = -lx_t
    J_t = lxx_t

    tmove = lambda x, r: jnp.moveaxis(x, -r, 0)
    elems = (
        tmove(A_t, 3), tmove(b_t, 2), tmove(C_t, 3), tmove(eta_t, 2),
        tmove(J_t, 3),
    )
    # terminal element: pure cost, no dynamics
    zero_m = jnp.zeros_like(elems[0][0])
    term = (zero_m, jnp.zeros_like(elems[1][0]), jnp.zeros_like(zero_m),
            -lfx, lfxx)
    cat = lambda s, t: jnp.concatenate([s, t[None]], axis=0)
    return tuple(cat(s, t) for s, t in zip(elems, term)), (L, Ki, ki)


def _combine(ej, ei):
    """Associative combine of REVERSED-order elements: because the scan runs
    over the time-reversed sequence, the first argument is the LATER segment
    e_j and the second the EARLIER e_i; returns e_i (x) e_j."""
    A_j, b_j, C_j, eta_j, J_j = ej
    A_i, b_i, C_i, eta_i, J_i = ei
    nx = A_i.shape[-1]
    eye = jnp.eye(nx, dtype=A_i.dtype)
    DA = solve_small(eye + mm(C_i, J_j), A_i)          # D A_i
    Db = solve_small(eye + mm(C_i, J_j),
                     (b_i + mv(C_i, eta_j))[..., None])[..., 0]
    A = mm(A_j, DA)
    b = mv(A_j, Db) + b_j
    C = mmt(mm(A_j, solve_small(eye + mm(C_i, J_j), C_i)), A_j) + C_j
    E_rhs = jnp.concatenate(
        [(eta_j - mv(J_j, b_i))[..., None], mm(J_j, A_i)], axis=-1
    )
    E_sol = solve_small(eye + mm(J_j, C_i), E_rhs)
    eta = mtv(A_i, E_sol[..., 0]) + eta_i
    J = mtm(A_i, E_sol[..., 1:]) + J_i
    return A, b, C, eta, J


def backward_pass_parallel(A, B, lx, lu, lxx, luu, lux, lfx, lfxx, reg):
    """Drop-in alternative to solver.ddp.backward_pass with O(log H) depth.

    Same input conventions (time on axis -3/-2, arbitrary leading batch);
    returns (k, K, dV1, ok).  Solves the exactly-regularized LQR subproblem
    (reg folded into luu).
    """
    nu = lu.shape[-1]
    nx = A.shape[-1]
    batch = lfx.shape[:-1]
    eye_u = jnp.eye(nu, dtype=lu.dtype)
    # broadcast constant cost terms (see costs/quadratic_tracking_cost) to the
    # full (..., H, n, m) shape this formulation streams through the scan
    bh = lu.shape[:-1]
    fix = lambda x, tail: (
        jnp.broadcast_to(x, bh + tail) if x.ndim == 2 else x
    )
    lxx = fix(lxx, (nx, nx))
    luu = fix(luu, (nu, nu))
    lux = fix(lux, (nu, nx))
    luu_reg = luu + jnp.broadcast_to(reg, batch)[..., None, None, None] * eye_u

    elems, _ = _elements(A, B, lx, lu, lxx, luu_reg, lux, lfx, lfxx)
    # suffix combines: reverse time, scan, reverse back
    rev = lambda t: jnp.flip(t, axis=0)
    suffix = jax.lax.associative_scan(_combine, tuple(rev(e) for e in elems))
    # V_{k} parameters for k = 0..H (suffix combine starting at k)
    J_all = rev(suffix[4])
    eta_all = rev(suffix[3])
    # value at k+1 for gains at k: shift
    Vxx = jnp.moveaxis(J_all[1:], 0, -3)    # (..., H, nx, nx)
    Vx = jnp.moveaxis(-eta_all[1:], 0, -2)  # (..., H, nx)

    VxxA = mm(Vxx, A)
    VxxB = mm(Vxx, B)
    Qu = lu + mtv(B, Vx)
    Qux = lux + mtm(B, VxxA)
    Quu_reg = luu_reg + mtm(B, VxxB)
    L = cholesky_small(Quu_reg)
    pd = jnp.all(jnp.isfinite(L), axis=tuple(range(-3, 0)))
    k = -cholesky_solve_small(L, Qu)
    K = -cholesky_solve_small(L, Qux)
    dV1 = jnp.sum(k * Qu, axis=(-1, -2))
    return k, K, dV1, pd
