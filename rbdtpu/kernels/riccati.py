"""Fused lane-scalar Riccati backward sweep.

The DDP backward pass (solver.ddp.backward_pass — the TPU redesign of the
reference's per-knot gain recursion; cf. RBDReference-driven DDP oracle in
tests/oracle_ddp) is a sequential scan of ~10 small-matrix products and one
nv x nv Cholesky per knot.  The jnp path runs each product as a separate
XLA op with (B, n, m) intermediates bouncing through HBM; here each knot is
ONE Pallas kernel in the packed lane layout (batch spread over (8, L)
tiles, matrices as sublane rows), so the whole step stays in VMEM/registers.

Matches the iLQR branch of backward_pass exactly (control regularization,
NaN-propagating Cholesky PD guard, Vxx symmetrization, dV1 = sum k.Qu).
The FULL-DDP exact-Hessian branch and the parallel (associative-scan)
sweep keep the jnp path.

Intended regime: arm-class state dims (nx <= ~16; the n^3 unroll at
humanoid sizes would blow Mosaic compile times — see the colvec kernel
lesson in CLAUDE.md) with the solver's natively-batched problem batch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import lanescalar as ls
from .fused import _on_tpu, _pad_batch, _pick_lanes

_BUDGET = 6 * 1024 * 1024  # single-buffered VMEM budget (see fused.py)


def _rows_total(nx: int, nv: int, n_cost_rows: int) -> int:
    """Sublane rows per lane-column: carry in/out (nx + nx*nx each), A, B,
    lx, lu, cost blocks, reg, and outputs k, K, dV1."""
    return (
        2 * (nx + nx * nx) + nx * nx + nx * nv + nx + nv
        + n_cost_rows + 1 + nv + nv * nx + 1
    )


def riccati_fused_ok(nx: int, nv: int, batch_total: int,
                     dtype=jnp.float32) -> bool:
    """True when the fused sweep applies: batch packs into whole sublane
    tiles, the state dim is in the kernel's compile-friendly regime, and a
    128-lane block fits the VMEM budget (smaller batches always fit).
    On TPU a COMPILE PROBE of the exact layout (worst case: all cost blocks
    per-knot) is authoritative — see kernels.probe."""
    if batch_total % 8 != 0 or nx > 16:
        return False
    n_cost = nx * nx + nv * nv + nv * nx
    BT = _pad_batch(batch_total) // 8
    lanes = _BUDGET // (_rows_total(nx, nv, n_cost) * 8 * 4)
    if lanes < min(BT, 128):
        return False
    from .probe import probe_ok

    B = batch_total
    sds = lambda *s: jax.ShapeDtypeStruct(s, jnp.dtype(dtype))
    fn = lambda A, Bm, lx, lu, lxx, luu, lux, lfx, lfxx, reg: \
        backward_pass_fused(A, Bm, lx, lu, lxx, luu, lux, lfx, lfxx, reg)
    args = (sds(B, 1, nx, nx), sds(B, 1, nx, nv), sds(B, 1, nx),
            sds(B, 1, nv), sds(B, 1, nx, nx), sds(B, 1, nv, nv),
            sds(B, 1, nv, nx), sds(B, nx), sds(B, nx, nx), sds(B))
    key = (nx, nv, _pad_batch(B), jnp.dtype(dtype).name)
    return probe_ok("riccati_backward", key, fn, args, on_tpu=_on_tpu())


def _ld_mat(ref, r0: int, n: int, m: int):
    return [[ref[r0 + i * m + j] for j in range(m)] for i in range(n)]


def _ld_vec(ref, r0: int, n: int):
    return [ref[r0 + i] for i in range(n)]


def _st_mat(ref, r0: int, M):
    for i, row in enumerate(M):
        for j, x in enumerate(row):
            ref[r0 + i * len(row) + j] = x


def _st_vec(ref, r0: int, v):
    for i, x in enumerate(v):
        ref[r0 + i] = x


def _matvec_T(M, v):
    n = len(M[0])
    return [ls.dot([M[j][i] for j in range(len(M))], v) for i in range(n)]


def _solve_cols(L, M):
    """Column-wise (L L^T)^-1 M for an (n x m) nested list."""
    n, m = len(M), len(M[0])
    cols = []
    for j in range(m):
        cols.append(ls.cholesky6_solve(L, [M[i][j] for i in range(n)]))
    return [[cols[j][i] for j in range(m)] for i in range(n)]


def backward_pass_fused(A, B, lx, lu, lxx, luu, lux, lfx, lfxx, reg,
                        interpret: bool | None = None):
    """Drop-in fused twin of solver.ddp.backward_pass (iLQR branch).

    A (..., H, nx, nx), B (..., H, nx, nv), lx (..., H, nx),
    lu (..., H, nv); lxx/luu/lux either per-knot (..., H, n, m) or
    CONSTANT (n, m) (costs.quadratic_tracking_cost emits constants — they
    are packed once and re-read per knot instead of being streamed as
    (B, H, n, m) copies); lfx (..., nx), lfxx (..., nx, nx), reg (...).

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
    Bp = _pad_batch(Bn)
    dt_ = A.dtype

    def flat(a):
        a = jnp.broadcast_to(a, batch + a.shape[len(batch):])
        a = a.reshape((Bn,) + a.shape[len(batch):])
        if Bp != Bn:
            a = jnp.concatenate(
                [a, jnp.zeros((Bp - Bn,) + a.shape[1:], a.dtype)], axis=0
            )
        return a

    # pack: (B, H, n, m) -> (H, n*m, 8, BT); (B, n, m) -> (n*m, 8, BT)
    BT = Bp // 8
    def packH(a, rows):
        a = a.reshape(Bp, H, rows)
        return jnp.transpose(a, (1, 2, 0)).reshape(H, rows, 8, BT)

    def pack0(a, rows):
        a = a.reshape(Bp, rows)
        return jnp.transpose(a, (1, 0)).reshape(rows, 8, BT)

    timed = {}
    const = {}
    for name, arr, rows in (("lxx", lxx, nx * nx), ("luu", luu, nv * nv),
                            ("lux", lux, nv * nx)):
        if arr.ndim == 2:
            # constant cost block: broadcast into lanes ONCE (no H axis)
            const[name] = pack0(
                jnp.broadcast_to(arr.reshape(1, rows), (Bp, rows)), rows
            )
        else:
            timed[name] = packH(flat(arr), rows)
    tnames = sorted(timed)
    cnames = sorted(const)

    A_p = packH(flat(A), nx * nx)
    B_p = packH(flat(B), nx * nv)
    lx_p = packH(flat(lx), nx)
    lu_p = packH(flat(lu), nv)
    reg_p = pack0(flat(jnp.broadcast_to(reg, batch)[..., None]), 1)
    carry0 = jnp.concatenate(
        [pack0(flat(lfx), nx), pack0(flat(lfxx), nx * nx)],
        axis=0,
    )

    n_cost = sum(
        {"lxx": nx * nx, "luu": nv * nv, "lux": nv * nx}[n]
        for n in tnames + cnames
    )
    rows_total = _rows_total(nx, nv, n_cost)
    lanes = _BUDGET // (rows_total * 8 * 4)
    L = _pick_lanes(Bp, min(512, lanes))
    if L > lanes:
        cands = [d for d in range(1, min(lanes, BT) + 1) if BT % d == 0]
        if not cands:
            raise ValueError("riccati kernel exceeds VMEM at 1 lane")
        L = max(cands)
    nblocks = BT // L

    cost_rows = {"lxx": nx * nx, "luu": nv * nv, "lux": nv * nx}

    def kernel(c_ref, A_ref, B_ref, lx_ref, lu_ref, *rest):
        refs = dict(zip(tnames + cnames + ["reg"], rest[:-2]))
        co_ref, out_ref = rest[-2], rest[-1]
        Vx = _ld_vec(c_ref, 0, nx)
        Vxx = _ld_mat(c_ref, nx, nx, nx)
        Am = _ld_mat(A_ref, 0, nx, nx)
        Bm = _ld_mat(B_ref, 0, nx, nv)
        lx_s = _ld_vec(lx_ref, 0, nx)
        lu_s = _ld_vec(lu_ref, 0, nv)
        lxx_s = _ld_mat(refs["lxx"], 0, nx, nx)
        luu_s = _ld_mat(refs["luu"], 0, nv, nv)
        lux_s = _ld_mat(refs["lux"], 0, nv, nx)
        rg = refs["reg"][0]

        VxxA = ls.matmat(Vxx, Am)
        VxxB = ls.matmat(Vxx, Bm)
        Qx = ls.vadd(lx_s, _matvec_T(Am, Vx))
        Qu = ls.vadd(lu_s, _matvec_T(Bm, Vx))
        Qxx = ls.mat_add(lxx_s, ls.matmat_TA(Am, VxxA))
        Quu = ls.mat_add(luu_s, ls.matmat_TA(Bm, VxxB))
        Qux = ls.mat_add(lux_s, ls.matmat_TA(Bm, VxxA))
        QuuR = [
            [
                Quu[i][j] + rg if i == j else Quu[i][j]
                for j in range(nv)
            ]
            for i in range(nv)
        ]
        Lc = ls.cholesky6(QuuR)
        k = [-x for x in ls.cholesky6_solve(Lc, Qu)]
        K = [[-x for x in row] for row in _solve_cols(Lc, Qux)]
        QuuK = ls.matmat(Quu, K)
        Quuk = ls.matvec(Quu, k)
        Vx_new = [
            Qx[i]
            + ls.dot([K[r][i] for r in range(nv)], Quuk)
            + ls.dot([K[r][i] for r in range(nv)], Qu)
            + ls.dot([Qux[r][i] for r in range(nv)], k)
            for i in range(nx)
        ]
        Vxx_new = ls.mat_add(
            ls.mat_add(Qxx, ls.matmat_TA(K, QuuK)),
            ls.mat_add(ls.matmat_TA(K, Qux),
                       ls.matmat_TA(Qux, K)),
        )
        Vxx_sym = [
            [0.5 * (Vxx_new[i][j] + Vxx_new[j][i]) for j in range(nx)]
            for i in range(nx)
        ]
        dV1 = ls.dot(k, Qu)
        _st_vec(co_ref, 0, Vx_new)
        _st_mat(co_ref, nx, Vxx_sym)
        _st_vec(out_ref, 0, k)
        _st_mat(out_ref, nv, K)
        out_ref[nv + nv * nx] = dV1

    mkspec = lambda rows: pl.BlockSpec((rows, 8, L), lambda b: (0, 0, b),
                                       memory_space=pltpu.VMEM)
    in_specs = [mkspec(nx + nx * nx), mkspec(nx * nx), mkspec(nx * nv),
                mkspec(nx), mkspec(nv)]
    in_specs += [mkspec(cost_rows[n]) for n in tnames]
    in_specs += [mkspec(cost_rows[n]) for n in cnames]
    in_specs += [mkspec(1)]
    call = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=(mkspec(nx + nx * nx), mkspec(nv + nv * nx + 1)),
        out_shape=(
            jax.ShapeDtypeStruct((nx + nx * nx, 8, BT), dt_),
            jax.ShapeDtypeStruct((nv + nv * nx + 1, 8, BT), dt_),
        ),
        interpret=interpret,
    )

    def step(carry, inp):
        ops = [carry, inp["A"], inp["B"], inp["lx"], inp["lu"]]
        ops += [inp[n] for n in tnames]
        ops += [const[n] for n in cnames]
        ops += [reg_p]
        c_new, out = call(*ops)
        return c_new, out

    inputs = {"A": A_p, "B": B_p, "lx": lx_p, "lu": lu_p}
    for n in tnames:
        inputs[n] = timed[n]
    _, outs = jax.lax.scan(step, carry0, inputs, reverse=True)
    # (H, rows, 8, BT) -> (B, H, rows)
    outs = jnp.transpose(outs.reshape(H, nv + nv * nx + 1, Bp), (2, 0, 1))
    outs = outs[:Bn].reshape(batch + (H, nv + nv * nx + 1))
    k = outs[..., :nv]
    K = outs[..., nv:nv + nv * nx].reshape(batch + (H, nv, nx))
    dV1 = outs[..., -1].sum(axis=-1)
    ok = (
        jnp.isfinite(k).all(axis=(-1, -2))
        & jnp.isfinite(K).all(axis=(-1, -2, -3))
    )
    return k, K, dV1, ok
