"""Chunked-batch Riccati backward sweep — VMEM-resident Vxx at solver scale.

The r4 profiler + XLA memory analysis showed the jnp Riccati sweep
(solver.ddp.backward_pass — the gain recursion consuming the reference's
gradients, RBDReference.py:1347-1351) is the #1 solver phase at quadruped
(45.6 ms/iter, B=1024 nx=36) and humanoid (27.7 ms/iter, nx=72) scale, and
that it is MEMORY-bound, not compute-bound: the broadcast-multiply-reduce
forms of spatial.batched.mm/mtm materialize (B, n, n, n) temporaries through
HBM inside the scan — 2.10 GB of TEMP traffic per quadruped sweep vs
0.92 GFLOP (BASELINE.md / CLAUDE.md r5 backlog).

This kernel keeps the whole recursion on-chip:

  - layout: batch in the LANE dimension, one 128-lane block per grid step;
    every (n, m) matrix is a VMEM-resident (n, m, 128) block (rows untiled,
    cols in sublanes, batch in lanes);
  - the TIME LOOP IS IN THE GRID: grid = (batch_blocks, H) with time
    innermost and reversed index maps, so Pallas streams per-knot A/B/cost
    blocks HBM->VMEM double-buffered while Vx/Vxx persist in VMEM scratch
    across the whole horizon — the carry NEVER touches HBM;
  - matmuls are j-unrolled slice-broadcast FMAs over (n, m, 128) tiles (no
    n^3 temporaries anywhere); transposed products (A^T Vxx A etc.) are
    built row-wise as multiply + untiled-axis reductions, which also yields
    the transposed rows for free — the per-step symmetrization needs no
    in-kernel transpose;
  - the Quu Cholesky + triangular solves are unrolled on (1, 1, 128) lane
    vectors with the K-solve vectorized over all nx right-hand-side columns;
    non-PD Quu produces NaN (sqrt of negative) exactly like
    spatial.batched.cholesky_small, preserving the solver's PD guard.

Matches the iLQR branch of solver.ddp.backward_pass (control
regularization, per-step symmetrization, dV1 = sum k.Qu).  Complements
kernels.riccati (the lane-scalar kernel, arm-class nx <= 16 whose full
n^3 scalar unroll blows Mosaic compile times at quadruped sizes): this
kernel's op count is O(n) vectorized ops per product, so it compiles at
nx = 36-72.

HBM traffic per sweep: stream A/B/lx/lu (+ per-knot cost blocks) once and
write k/K once — ~0.4 GB at quadruped scale vs 4.48 GB accessed by the jnp
sweep (measured), bounding at ~1 ms of bandwidth.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused import _on_tpu

_LANES = 128
_BUDGET = 11 * 1024 * 1024  # resident + double-buffered stream estimate cap


# ------------------------------------------------------------------ #
# in-kernel small-matrix algebra on (rows, cols, LANES) values         #
# ------------------------------------------------------------------ #

def _mm(A, M):
    """(ni, nj, L) @ (nj, nk, L) -> (ni, nk, L), j-unrolled broadcast FMA."""
    nj = A.shape[1]
    acc = A[:, 0:1, :] * M[0:1]
    for j in range(1, nj):
        acc = acc + A[:, j:j + 1, :] * M[j:j + 1]
    return acc


def _usum0(t):
    """Sum over the untiled leading axis.  MEASURED (r5, v5e): a log-depth
    tree variant (halve-and-add with concat for odd remainders) LOST to
    this plain reduce at quadruped scale — 17.18 vs 15.49 ms/sweep slope —
    despite the VPU's ~3-cycle dependent-add latency; the concat/slice
    churn outweighs the exposed ILP, so the sequential form stands."""
    return jnp.sum(t, axis=0)


def _mtm(A, M):
    """A^T @ M for (nj, ni, L) x (nj, nk, L) -> (ni, nk, L), built row-wise
    as multiply + untiled-axis reduction (no relayout)."""
    ni = A.shape[1]
    rows = [
        _usum0(A[:, i:i + 1, :] * M)[None] for i in range(ni)
    ]
    return jnp.concatenate(rows, axis=0)


def _mtv(A, v):
    """A^T @ v for (nj, ni, L) x (nj, 1, L) -> (ni, 1, L)."""
    ni = A.shape[1]
    return _usum0(A * v).reshape(ni, 1, A.shape[2])


def _chol(Quu, reg, n):
    """Unrolled lane-vector Cholesky of Quu + reg*I; returns (L entries,
    1/diag).  Non-PD inputs produce NaN entries (solver PD guard)."""
    Lc = [[None] * n for _ in range(n)]
    invd = [None] * n
    for i in range(n):
        for j in range(i + 1):
            s = Quu[i:i + 1, j:j + 1, :]
            if i == j:
                s = s + reg
            for t in range(j):
                s = s - Lc[i][t] * Lc[j][t]
            if i == j:
                d = jnp.sqrt(s)
                Lc[i][i] = d
                invd[i] = 1.0 / d
            else:
                Lc[i][j] = s * invd[j]
    return Lc, invd


def _chol_solve_rows(Lc, invd, rows):
    """(L L^T)^-1 b with b given as n rows (1, m, L); the substitution is
    vectorized over all m RHS columns at once."""
    n = len(rows)
    y = [None] * n
    for i in range(n):
        s = rows[i]
        for t in range(i):
            s = s - Lc[i][t] * y[t]
        y[i] = s * invd[i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for t in range(i + 1, n):
            s = s - Lc[t][i] * x[t]
        x[i] = s * invd[i]
    return x


def _riccati_knot(Am, Bm, lx, lu, lxx, luu, lux, reg, Vx, Vxx, nx, nv):
    """One Riccati recursion step on lane-blocked values.  Returns
    (k (nv,1,L), K (nv,nx,L), dV1 (1,1,L), Vx_new, Vxx_new)."""
    P = _mm(Vxx, Am)                 # Vxx A   (nx, nx, L)
    Pb = _mm(Vxx, Bm)                # Vxx B   (nx, nv, L)
    Qx = lx + _mtv(Am, Vx)           # (nx, 1, L)
    Qu = lu + _mtv(Bm, Vx)           # (nv, 1, L)
    Quu = luu + _mtm(Bm, Pb)         # (nv, nv, L)
    Qux = lux + _mtm(Bm, P)          # (nv, nx, L)

    Lc, invd = _chol(Quu, reg, nv)
    kx = _chol_solve_rows(Lc, invd, [Qu[i:i + 1] for i in range(nv)])
    k = -jnp.concatenate(kx, axis=0)                     # (nv, 1, L)
    Kx = _chol_solve_rows(Lc, invd, [Qux[i:i + 1] for i in range(nv)])
    K = -jnp.concatenate(Kx, axis=0)                     # (nv, nx, L)

    QuuK = _mm(Quu, K)                                   # (nv, nx, L)
    Quuk = _mm(Quu, k)                                   # (nv, 1, L)
    Vx_new = Qx + _mtv(K, Quuk + Qu) + _mtv(Qux, k)

    # Vxx_new = sym(lxx + A^T Vxx A + K^T Quu K) + K^T Qux + Qux^T K,
    # built row-by-row; the transposed rows come from flipping which
    # operand is sliced, so no in-kernel transpose is needed.
    rows = []
    for i in range(nx):
        g = _usum0(Am[:, i:i + 1, :] * P)
        gt = _usum0(Am * P[:, i:i + 1, :])
        kk = _usum0(K[:, i:i + 1, :] * QuuK)
        kkt = _usum0(K * QuuK[:, i:i + 1, :])
        w = _usum0(K[:, i:i + 1, :] * Qux)
        wt = _usum0(K * Qux[:, i:i + 1, :])
        rows.append(
            lxx[i:i + 1] + (0.5 * (g + gt) + 0.5 * (kk + kkt) + w + wt)[None]
        )
    Vxx_new = jnp.concatenate(rows, axis=0)
    dV1 = jnp.sum(k * Qu, axis=0).reshape(1, 1, Am.shape[2])
    return k, K, dV1, Vx_new, Vxx_new


# ------------------------------------------------------------------ #
# small-batch variant: batch untiled, per-item MXU dots                #
# ------------------------------------------------------------------ #
#
# The lane-blocked kernel above pads the batch to 128 lanes; at humanoid
# scale (B=4-16, nx=72) that both wastes 8x the lanes AND blows VMEM
# ((72, 72, 128) blocks are 2.65 MB each).  Here matrices stay (B, n, m)
# with the batch in the untiled leading dim, every product is a per-item
# 2-D jnp.dot — nx=72 operands map straight onto the MXU (the one regime
# where VERDICT r4 #3's "does the MXU pay at nx=72?" answer is yes, since
# we control the layout instead of XLA's batched-gemm lowering) — and
# transposed products use dot_general contracting dim 0, so no transposes.
# The Cholesky is column-wise on (B, nv, 1) sublane columns with k and K
# solved together as one (B, 1, 1+nx) row system.

def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=a.dtype)


def _dotT(a, b):
    """a^T @ b contracting dim 0 of both (no transpose materialized)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=a.dtype)


def _per_item(f, *ops):
    Bc = ops[0].shape[0]
    return jnp.stack([f(*(o[b] for o in ops)) for b in range(Bc)])


def _chol_scratch(Quu, reg, n, L_ref):
    """Column-wise Cholesky of Quu + reg I with the factor accumulated in
    VMEM scratch: L_ref row t holds COLUMN t of L, and each column's
    prefix subtraction is ONE per-item dot over the slice-bounded range
    [0, j) — O(n) vectorized steps.  The fully-unrolled scalar-FMA form
    (kept below for the bisect harnesses) produces an O(n^2)-op kernel
    body that crashes the Mosaic remote compile helper at nv >= 30 (r5
    cliff bisect, tools/dbg_small_compile.py).  Slice-bounded reads touch
    only rows written this knot, so no scratch initialization is needed.
    Returns the 1/diag (B, 1, 1) scalars."""
    invd = [None] * n
    for j in range(n):
        s = Quu[:, j:j + 1, :]
        if j > 0:
            Lv = L_ref[:, 0:j, :]
            s = s - _per_item(_dotT, Lv[:, :, j:j + 1], Lv)
        inv_row = 1.0 / jnp.sqrt(s + reg)
        invd[j] = inv_row[:, :, j:j + 1]
        L_ref[:, j:j + 1, :] = s * invd[j]
    return invd


def _solve_scratch(L_ref, invd, rhs_rows, n, Y_ref):
    """(L L^T)^{-1} b with b as n rows (B, 1, m), against the scratch
    factor of _chol_scratch: forward substitution into Y_ref, then the
    backward pass in place (row i is read before being overwritten with
    the solution row).  Each step is one slice-bounded per-item dot."""
    for i in range(n):
        s = rhs_rows[i]
        if i > 0:
            Lc = L_ref[:, 0:i, i:i + 1]      # L[i, t] for t < i
            s = s - _per_item(_dotT, Lc, Y_ref[:, 0:i, :])
        Y_ref[:, i:i + 1, :] = s * invd[i]
    out = [None] * n
    for i in reversed(range(n)):
        s = Y_ref[:, i:i + 1, :]
        if i < n - 1:
            Lr = L_ref[:, i:i + 1, i + 1:]   # L[t, i] for t > i, as a row
            s = s - _per_item(_dot, Lr, Y_ref[:, i + 1:, :])
        out[i] = s * invd[i]
        Y_ref[:, i:i + 1, :] = out[i]
    return out


def _chol_cols(Quu, reg, n):
    """Column-wise Cholesky of Quu + reg I with columns stored LANE-major:
    cols[t] is (B, 1, n) with lane index i holding L[i, t] (a (B, n, 1)
    sublane layout would pad every column's lane dim to 128 — 8x VMEM
    waste).  Quu is symmetric, so column j reads as row j.  Entries at
    lanes i < j (and the stored diagonal — invd carries it) are garbage and
    never read.  Returns (columns, 1/diag (B, 1, 1) scalars)."""
    cols = [None] * n
    invd = [None] * n
    for j in range(n):
        s = Quu[:, j:j + 1, :]
        for t in range(j):
            s = s - cols[t] * cols[t][:, :, j:j + 1]
        # reg lands on the diagonal only; the off-diagonal lanes of s must
        # stay unregularized.  sqrt/divide are computed at FULL (B, 1, n)
        # row width and the diagonal lane sliced AFTER: Mosaic's remote
        # compiler crashes on transcendentals over (B, 1, 1)-shaped values
        # (r5 pattern bisect, tools/dbg_small_patterns.py); the extra lanes
        # hold garbage (sqrt of off-diagonal entries) that is never read
        inv_row = 1.0 / jnp.sqrt(s + reg)
        invd[j] = inv_row[:, :, j:j + 1]
        cols[j] = s * invd[j]
    return cols, invd


def _chol_solve_rows_small(cols, invd, rows):
    """(L L^T)^-1 b for b given as n rows (B, 1, m):
    L[i, t] = cols[t][:, :, i] (lane-major columns)."""
    n = len(rows)
    y = [None] * n
    for i in range(n):
        s = rows[i]
        for t in range(i):
            s = s - cols[t][:, :, i:i + 1] * y[t]
        y[i] = s * invd[i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for t in range(i + 1, n):
            s = s - cols[i][:, :, t:t + 1] * x[t]
        x[i] = s * invd[i]
    return x


def _riccati_knot_small(Am, Bm, lxr, lur, lxx, luu, lux, reg, Vxr, Vxx,
                        nx, nv, L_ref, Y_ref, y1_ref):
    """One Riccati step, batch untiled: Am (B, nx, nx), Bm (B, nx, nv),
    vectors ROW-major (B, 1, n), reg (B, 1, 1); L_ref/Y_ref/y1_ref VMEM
    scratch for the factor and substitutions (see _chol_scratch).  Returns
    (krow (B,1,nv), K (B,nv,nx), dV1 (B,1,1), Vxr_new, Vxx_new)."""
    P = _per_item(_dot, Vxx, Am)          # Vxx A   (B, nx, nx)
    Pb = _per_item(_dot, Vxx, Bm)         # Vxx B   (B, nx, nv)
    Qxr = lxr + _per_item(_dot, Vxr, Am)  # (Vx^T A) row = (A^T Vx)^T
    Qur = lur + _per_item(_dot, Vxr, Bm)
    Quu = luu + _per_item(_dotT, Bm, Pb)
    Qux = lux + _per_item(_dotT, Bm, P)   # (B, nv, nx)

    invd = _chol_scratch(Quu, reg, nv, L_ref)
    # k and K solved SEPARATELY sharing the factor: a joint [Qu | Qux] row
    # system (one concat per row) crashes the Mosaic remote compiler (r5
    # bisect, tools/dbg_small_patterns9.py — mixed lane-slice/row concats of
    # computed values); per-row homogeneous rhs lowers fine
    sol_K = _solve_scratch(
        L_ref, invd, [Qux[:, i:i + 1, :] for i in range(nv)], nv, Y_ref)
    K = -jnp.concatenate(sol_K, axis=1)                           # (B,nv,nx)
    sol_k = _solve_scratch(
        L_ref, invd, [Qur[:, :, i:i + 1] for i in range(nv)], nv, y1_ref)
    krow = -jnp.concatenate(sol_k, axis=2)                        # (B,1,nv)

    QuuK = _per_item(_dot, Quu, K)
    kQuu = _per_item(_dot, krow, Quu)     # (Quu k)^T (Quu symmetric)
    Vxr_new = (Qxr + _per_item(_dot, kQuu + Qur, K)
               + _per_item(_dot, krow, Qux))
    G = _per_item(_dotT, Am, P)
    Gt = _per_item(_dotT, P, Am)
    KK = _per_item(_dotT, K, QuuK)
    KKt = _per_item(_dotT, QuuK, K)
    W = _per_item(_dotT, K, Qux)
    Wt = _per_item(_dotT, Qux, K)
    Vxx_new = lxx + 0.5 * (G + Gt) + 0.5 * (KK + KKt) + W + Wt
    dV1 = jnp.sum(krow * Qur, axis=2, keepdims=True)
    return krow, K, dV1, Vxr_new, Vxx_new


_SMALL_BC = 8  # small-batch variant: items per grid block (untiled dim)


def _backward_small(A, B, lx, lu, lxx, luu, lux, lfx, lfxx, reg,
                    batch, Bn, interpret):
    """Small-batch wrapper: grid (Bs/8, H) with 8 problems per block in the
    UNTILED dim, matrices (8, n, m) blocks (n sublanes, m lanes), per-item
    MXU dots.  Covers the humanoid regime (B = 4-16, nx = 72) where the
    lane-blocked kernel would pad 16 -> 128 lanes and blow VMEM."""
    import os
    nx, nv = A.shape[-1], B.shape[-1]
    H = A.shape[-3]
    dt_ = A.dtype
    Bc = int(os.environ.get("RBDTPU_RICCATI_BC", _SMALL_BC))
    Bs = ((Bn + Bc - 1) // Bc) * Bc
    nbb = Bs // Bc

    def flat(a):
        a = jnp.broadcast_to(a, batch + a.shape[len(batch):])
        a = a.reshape((Bn,) + a.shape[len(batch):])
        if Bs != Bn:
            a = jnp.concatenate(
                [a, jnp.zeros((Bs - Bn,) + a.shape[1:], a.dtype)], axis=0
            )
        return a

    tmajor = lambda a: jnp.moveaxis(a, 0, 1)  # (Bs, H, ...) -> (H, Bs, ...)

    timed = {}
    const = {}
    for name, arr, (n, m) in (("lxx", lxx, (nx, nx)), ("luu", luu, (nv, nv)),
                              ("lux", lux, (nv, nx))):
        if arr.ndim == 2:
            const[name] = arr.astype(dt_)[None]  # (1, n, m): leading bcast
        else:
            timed[name] = tmajor(flat(arr))
    tnames = sorted(timed)
    cnames = sorted(const)
    shapes = {"lxx": (nx, nx), "luu": (nv, nv), "lux": (nv, nx)}

    A_p = tmajor(flat(A))
    B_p = tmajor(flat(B))
    lx_p = tmajor(flat(lx)[..., None, :])       # (H, Bs, 1, nx) row-major
    lu_p = tmajor(flat(lu)[..., None, :])
    lfx_p = flat(lfx)[..., None, :]             # (Bs, 1, nx)
    lfxx_p = flat(lfxx)                         # (Bs, nx, nx)
    reg_p = flat(jnp.broadcast_to(reg, batch).astype(dt_))[..., None, None]

    n_t = len(tnames)

    def kernel(*refs):
        (A_ref, B_ref, lx_ref, lu_ref) = refs[:4]
        t_refs = dict(zip(tnames, refs[4:4 + n_t]))
        c_refs = dict(zip(cnames, refs[4 + n_t:4 + n_t + len(cnames)]))
        lfx_ref, lfxx_ref, reg_ref = refs[4 + n_t + len(cnames):
                                          7 + n_t + len(cnames)]
        (k_ref, K_ref, dV_ref, Vxr_s, Vxx_s, L_s, Y_s,
         y1_s) = refs[7 + n_t + len(cnames):]

        h = pl.program_id(1)

        @pl.when(h == 0)
        def _():
            Vxr_s[...] = lfx_ref[...]
            Vxx_s[...] = lfxx_ref[...]

        def block(name):
            if name in t_refs:
                return t_refs[name][0]
            return c_refs[name][...]

        krow, K, dV1, Vxr_new, Vxx_new = _riccati_knot_small(
            A_ref[0], B_ref[0], lx_ref[0], lu_ref[0],
            block("lxx"), block("luu"), block("lux"), reg_ref[...],
            Vxr_s[...], Vxx_s[...], nx, nv, L_s, Y_s, y1_s,
        )
        k_ref[0] = krow
        K_ref[0] = K
        dV_ref[0] = dV1
        Vxr_s[...] = Vxr_new
        Vxx_s[...] = Vxx_new

    rev_t = lambda n, m: pl.BlockSpec(
        (1, Bc, n, m), lambda b, h: (H - 1 - h, b, 0, 0),
        memory_space=pltpu.VMEM,
    )
    const_s = lambda n, m: pl.BlockSpec(
        (1, n, m), lambda b, h: (0, 0, 0), memory_space=pltpu.VMEM,
    )
    per_b = lambda n, m: pl.BlockSpec(
        (Bc, n, m), lambda b, h: (b, 0, 0), memory_space=pltpu.VMEM,
    )

    in_specs = [rev_t(nx, nx), rev_t(nx, nv), rev_t(1, nx), rev_t(1, nv)]
    in_specs += [rev_t(*shapes[n]) for n in tnames]
    in_specs += [const_s(*shapes[n]) for n in cnames]
    in_specs += [per_b(1, nx), per_b(nx, nx), per_b(1, 1)]

    out_specs = (rev_t(1, nv), rev_t(nv, nx), rev_t(1, 1))
    out_shape = (
        jax.ShapeDtypeStruct((H, Bs, 1, nv), dt_),
        jax.ShapeDtypeStruct((H, Bs, nv, nx), dt_),
        jax.ShapeDtypeStruct((H, Bs, 1, 1), dt_),
    )
    call = pl.pallas_call(
        kernel,
        grid=(nbb, H),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((Bc, 1, nx), dt_),
            pltpu.VMEM((Bc, nx, nx), dt_),
            pltpu.VMEM((Bc, nv, nv), dt_),   # L factor (rows = columns)
            pltpu.VMEM((Bc, nv, nx), dt_),   # K substitution buffer
            pltpu.VMEM((Bc, nv, 1), dt_),    # k substitution buffer
        ],
        interpret=interpret,
    )
    ops = [A_p, B_p, lx_p, lu_p]
    ops += [timed[n] for n in tnames]
    ops += [const[n] for n in cnames]
    ops += [lfx_p, lfxx_p, reg_p]
    k_o, K_o, dV_o = call(*ops)

    k = jnp.moveaxis(k_o[:, :, 0, :], 0, 1)[:Bn]       # (Bn, H, nv)
    K = jnp.moveaxis(K_o, 0, 1)[:Bn]                   # (Bn, H, nv, nx)
    dV1 = jnp.sum(dV_o[:, :, 0, 0], axis=0)[:Bn]
    k = k.reshape(batch + (H, nv))
    K = K.reshape(batch + (H, nv, nx))
    dV1 = dV1.reshape(batch)
    ok = (
        jnp.isfinite(k).all(axis=(-1, -2))
        & jnp.isfinite(K).all(axis=(-1, -2, -3))
    )
    return k, K, dV1, ok


# ------------------------------------------------------------------ #
# pallas wrapper                                                       #
# ------------------------------------------------------------------ #

def _vmem_estimate(nx: int, nv: int) -> int:
    """Rough resident-set bound: carries + double-buffered streams + the
    handful of live (n, m, L) temporaries."""
    f = _LANES * 4
    big = nx * nx * f        # one (nx, nx, L) block
    mid = nv * nx * f
    sml = nv * nv * f
    resident = 4 * big + 5 * mid + 3 * sml
    stream = 2 * (big + mid + big + sml + mid)  # A,B + worst-case cost blocks
    return resident + stream


def riccati_chunk_ok(nx: int, nv: int, batch_total: int,
                     dtype=jnp.float32, const_blocks=()) -> bool:
    """True when the chunked sweep applies at this size: the VMEM estimate
    fits and (on TPU) a compile probe of the exact layout passes.  Batches
    below one 128-lane block dispatch to the small-batch (untiled-batch,
    per-item MXU) variant, which fits up to humanoid nx.

    const_blocks: names among {"lxx", "luu", "lux"} the caller will pass as
    CONSTANT (n, m) arrays — the kernel arity differs per combination, so
    the probe must compile the exact one (solver.ddp resolves it with
    jax.eval_shape over the cost's quadratizer)."""
    if batch_total < _LANES:
        if nx > 96:  # small-variant VMEM bound (humanoid nx=72 fits)
            return False
    elif _vmem_estimate(nx, nv) > _BUDGET:
        return False
    from .probe import probe_ok

    B = batch_total
    const_blocks = tuple(sorted(const_blocks))
    sds = lambda *s: jax.ShapeDtypeStruct(s, jnp.dtype(dtype))
    fn = lambda A, Bm, lx, lu, lxx, luu, lux, lfx, lfxx, reg: \
        backward_pass_chunked(A, Bm, lx, lu, lxx, luu, lux, lfx, lfxx, reg)

    def cost_arg(name, n, m):
        return sds(n, m) if name in const_blocks else sds(B, 1, n, m)

    args = (sds(B, 1, nx, nx), sds(B, 1, nx, nv), sds(B, 1, nx),
            sds(B, 1, nv), cost_arg("lxx", nx, nx), cost_arg("luu", nv, nv),
            cost_arg("lux", nv, nx), sds(B, nx), sds(B, nx, nx), sds(B))
    key = (nx, nv, _pad128(B), jnp.dtype(dtype).name, const_blocks)
    return probe_ok("riccati_chunked", key, fn, args, on_tpu=_on_tpu())


def _pad128(B: int) -> int:
    return ((B + _LANES - 1) // _LANES) * _LANES


def backward_pass_chunked(A, B, lx, lu, lxx, luu, lux, lfx, lfxx, reg,
                          interpret: bool | None = None):
    """Drop-in twin of solver.ddp.backward_pass (iLQR branch) with the whole
    recursion VMEM-resident per 128-lane batch block.

    A (..., H, nx, nx), B (..., H, nx, nv), lx (..., H, nx), lu (..., H, nv);
    lxx/luu/lux either per-knot (..., H, n, m) or CONSTANT (n, m);
    lfx (..., nx), lfxx (..., nx, nx), reg (...).

    Returns (k (..., H, nv), K (..., H, nv, nx), dV1 (...), ok (...)).
    """
    nx, nv = A.shape[-1], B.shape[-1]
    H = A.shape[-3]
    batch = lfx.shape[:-1]
    Bn = 1
    for b in batch:
        Bn *= b
    if interpret is None:
        interpret = not _on_tpu()
    import os
    strat = os.environ.get("RBDTPU_RICCATI_STRATEGY", "auto")
    if strat == "small" or (strat != "lane" and Bn < _LANES):
        # sub-lane-block batches: untiled-batch variant (pads to 8, not 128)
        # (RBDTPU_RICCATI_STRATEGY=small|lane forces a strategy for A/Bs)
        return _backward_small(A, B, lx, lu, lxx, luu, lux, lfx, lfxx, reg,
                               batch, Bn, interpret)
    Bp = _pad128(Bn)
    nb = Bp // _LANES
    dt_ = A.dtype

    def flat(a):
        a = jnp.broadcast_to(a, batch + a.shape[len(batch):])
        a = a.reshape((Bn,) + a.shape[len(batch):])
        if Bp != Bn:
            a = jnp.concatenate(
                [a, jnp.zeros((Bp - Bn,) + a.shape[1:], a.dtype)], axis=0
            )
        return a

    # (B, H, n, m) -> (H, n, m, Bp): time-major, batch in lanes
    def packH(a, n, m):
        return jnp.transpose(a.reshape(Bp, H, n, m), (1, 2, 3, 0))

    def pack0(a, n, m):
        return jnp.transpose(a.reshape(Bp, n, m), (1, 2, 0))

    timed = {}
    const = {}
    for name, arr, (n, m) in (("lxx", lxx, (nx, nx)), ("luu", luu, (nv, nv)),
                              ("lux", lux, (nv, nx))):
        if arr.ndim == 2:
            # constant cost block: one lane-uniform (n, m, LANES) block
            # shared by every grid step (constant index map, fetched once)
            const[name] = jnp.broadcast_to(
                arr.astype(dt_)[..., None], (n, m, _LANES)
            )
        else:
            timed[name] = packH(flat(arr), n, m)
    tnames = sorted(timed)
    cnames = sorted(const)
    shapes = {"lxx": (nx, nx), "luu": (nv, nv), "lux": (nv, nx)}

    A_p = packH(flat(A), nx, nx)
    B_p = packH(flat(B), nx, nv)
    lx_p = packH(flat(lx)[..., None], nx, 1)
    lu_p = packH(flat(lu)[..., None], nv, 1)
    lfx_p = pack0(flat(lfx)[..., None], nx, 1)
    lfxx_p = pack0(flat(lfxx), nx, nx)
    reg_p = pack0(
        flat(jnp.broadcast_to(reg, batch).astype(dt_))[..., None, None], 1, 1
    )

    n_t = len(tnames)

    def kernel(*refs):
        (A_ref, B_ref, lx_ref, lu_ref) = refs[:4]
        t_refs = dict(zip(tnames, refs[4:4 + n_t]))
        c_refs = dict(zip(cnames, refs[4 + n_t:4 + n_t + len(cnames)]))
        lfx_ref, lfxx_ref, reg_ref = refs[4 + n_t + len(cnames):
                                          7 + n_t + len(cnames)]
        k_ref, K_ref, dV_ref, Vx_s, Vxx_s = refs[7 + n_t + len(cnames):]

        h = pl.program_id(1)

        @pl.when(h == 0)
        def _():
            Vx_s[...] = lfx_ref[...]
            Vxx_s[...] = lfxx_ref[...]

        def block(name):
            if name in t_refs:
                return t_refs[name][0]
            return c_refs[name][...]

        from .ilpsched import ilp_call
        k, K, dV1, Vx_new, Vxx_new = ilp_call(
            lambda *ops_: _riccati_knot(*ops_, nx, nv),
            A_ref[0], B_ref[0], lx_ref[0], lu_ref[0],
            block("lxx"), block("luu"), block("lux"), reg_ref[...],
            Vx_s[...], Vxx_s[...],
        )
        k_ref[0] = k
        K_ref[0] = K
        dV_ref[0] = dV1
        Vx_s[...] = Vx_new
        Vxx_s[...] = Vxx_new

    rev_t = lambda n, m: pl.BlockSpec(
        (1, n, m, _LANES), lambda b, h: (H - 1 - h, 0, 0, b),
        memory_space=pltpu.VMEM,
    )
    const_s = lambda n, m: pl.BlockSpec(
        (n, m, _LANES), lambda b, h: (0, 0, 0), memory_space=pltpu.VMEM,
    )
    per_b = lambda n, m: pl.BlockSpec(
        (n, m, _LANES), lambda b, h: (0, 0, b), memory_space=pltpu.VMEM,
    )

    in_specs = [rev_t(nx, nx), rev_t(nx, nv), rev_t(nx, 1), rev_t(nv, 1)]
    in_specs += [rev_t(*shapes[n]) for n in tnames]
    in_specs += [const_s(*shapes[n]) for n in cnames]
    in_specs += [per_b(nx, 1), per_b(nx, nx), per_b(1, 1)]

    out_specs = (rev_t(nv, 1), rev_t(nv, nx), rev_t(1, 1))
    out_shape = (
        jax.ShapeDtypeStruct((H, nv, 1, Bp), dt_),
        jax.ShapeDtypeStruct((H, nv, nx, Bp), dt_),
        jax.ShapeDtypeStruct((H, 1, 1, Bp), dt_),
    )
    call = pl.pallas_call(
        kernel,
        grid=(nb, H),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((nx, 1, _LANES), dt_),
            pltpu.VMEM((nx, nx, _LANES), dt_),
        ],
        interpret=interpret,
    )
    ops = [A_p, B_p, lx_p, lu_p]
    ops += [timed[n] for n in tnames]
    ops += [const[n] for n in cnames]
    ops += [lfx_p, lfxx_p, reg_p]
    k_o, K_o, dV_o = call(*ops)

    # (H, n, m, Bp) -> (..., H, n[, m])
    k = jnp.transpose(k_o[:, :, 0, :], (2, 0, 1))[:Bn]
    K = jnp.transpose(K_o, (3, 0, 1, 2))[:Bn]
    dV1 = jnp.sum(dV_o[:, 0, 0, :], axis=0)[:Bn]
    k = k.reshape(batch + (H, nv))
    K = K.reshape(batch + (H, nv, nx))
    dV1 = dV1.reshape(batch)
    ok = (
        jnp.isfinite(k).all(axis=(-1, -2))
        & jnp.isfinite(K).all(axis=(-1, -2, -3))
    )
    return k, K, dV1, ok
