"""Batched spatial-vector algebra (Featherstone 6-D motion/force operators).

TPU-native redesign of the reference's scalar L1 kernels
(``RBDReference.py:9-182``: cross_operator, dual_cross_operator, icrf, mxS/mx1..mx6,
fxv, fxS, vxIv).  Instead of per-element scalar assembly we express every operator
as a closed-form batched tensor op on ``(..., 6)`` / ``(..., 6, 6)`` arrays, built
from 3-vector cross products so XLA fuses them onto the VPU.  Every function is
closed under ``jax.vmap`` and safe inside ``jit`` (static shapes only).

Conventions (Featherstone, "Rigid Body Dynamics Algorithms"):
  - spatial motion vector  v = [omega; v_lin]   (angular on top)
  - spatial force  vector  f = [n; f_lin]       (moment on top)
  - crm(v) m  == v x m      (motion cross product)
  - crf(v) f  == v x* f     (force  cross product),  crf(v) = -crm(v)^T
  - icrf(f) v == crf(v) f   (inverse force cross operator)
"""
from __future__ import annotations

import jax.numpy as jnp


def _split(v):
    """Split a (..., 6) spatial vector into its (..., 3) angular/linear parts."""
    return v[..., :3], v[..., 3:]


def skew(r):
    """3-D skew-symmetric matrix: skew(r) @ x == r cross x.  (...,3) -> (...,3,3)."""
    x, y, z = r[..., 0], r[..., 1], r[..., 2]
    o = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([o, -z, y], axis=-1),
            jnp.stack([z, o, -x], axis=-1),
            jnp.stack([-y, x, o], axis=-1),
        ],
        axis=-2,
    )


def crm(v):
    """Motion cross-product matrix (reference ``cross_operator``, RBDReference.py:9-21).

    (..., 6) -> (..., 6, 6) with block form [[wx, 0], [vx, wx]].
    """
    w, vl = _split(v)
    wx = skew(w)
    vx = skew(vl)
    zero = jnp.zeros_like(wx)
    top = jnp.concatenate([wx, zero], axis=-1)
    bot = jnp.concatenate([vx, wx], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def crf(v):
    """Force cross-product matrix (reference ``dual_cross_operator``, RBDReference.py:23-25).

    crf(v) = -crm(v)^T, block form [[wx, vx], [0, wx]].
    """
    return -jnp.swapaxes(crm(v), -1, -2)


def icrf(f):
    """Inverse force cross operator (reference ``icrf``, RBDReference.py:33-43).

    Satisfies icrf(f) @ v == crf(v) @ f for all motion vectors v.
    (..., 6) -> (..., 6, 6).
    """
    n, fl = _split(f)
    nx = skew(n)
    fx = skew(fl)
    zero = jnp.zeros_like(nx)
    top = jnp.concatenate([nx, fx], axis=-1)
    bot = jnp.concatenate([fx, zero], axis=-1)
    return -jnp.concatenate([top, bot], axis=-2)


def cross_motion(v, m):
    """v x m for motion vectors (reference ``mxS``/``_mxS``, RBDReference.py:56-147).

    Direct product form: crm(v) @ m without materializing the 6x6.
    (..., 6), (..., 6) -> (..., 6).
    """
    w, vl = _split(v)
    mw, ml = _split(m)
    top = jnp.cross(w, mw)
    bot = jnp.cross(vl, mw) + jnp.cross(w, ml)
    return jnp.concatenate([top, bot], axis=-1)


def cross_force(v, f):
    """v x* f for a motion vector v and force vector f (reference ``fxv``,
    RBDReference.py:149-164, which computes crf(fxVec) @ timesVec).

    (..., 6), (..., 6) -> (..., 6).
    """
    w, vl = _split(v)
    fn, fl = _split(f)
    top = jnp.cross(w, fn) + jnp.cross(vl, fl)
    bot = jnp.cross(w, fl)
    return jnp.concatenate([top, bot], axis=-1)


def vxIv(v, I):
    """crf(v) @ (I @ v) — the velocity-product bias force (reference ``vxIv``,
    RBDReference.py:170-182).  (..., 6), (..., 6, 6) -> (..., 6)."""
    Iv = jnp.einsum("...ij,...j->...i", I, v)
    return cross_force(v, Iv)


def factor_inertia(I, v):
    """The `B(I, v)` factor used by second-order derivatives (reference
    ``factor_functions`` number=3, RBDReference.py:45-54, and its inlined form at
    :1439, :1473):

        B = 1/2 (crf(v) I + icrf(I v) - I crm(v))

    (..., 6, 6), (..., 6) -> (..., 6, 6)."""
    Iv = jnp.einsum("...ij,...j->...i", I, v)
    return 0.5 * (crf(v) @ I + icrf(Iv) - I @ crm(v))


def dot_inertia(I, v):
    """`Idot`-style factor (reference ``dot_matrix``, RBDReference.py:27-31, sans
    its dead scaling lines): crf(v) I - I crm(v)."""
    return crf(v) @ I - I @ crm(v)


def mcI(m, c, Ic):
    """Spatial inertia from mass, COM offset and rotational inertia about the COM.

    I = [[Ic + m cx cx^T, m cx], [m cx^T, m 1]]  (Featherstone eq. 2.63).
    m: (...,), c: (..., 3), Ic: (..., 3, 3) -> (..., 6, 6).
    """
    cx = skew(c)
    m_ = m[..., None, None]
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=Ic.dtype), cx.shape)
    top = jnp.concatenate([Ic + m_ * cx @ jnp.swapaxes(cx, -1, -2), m_ * cx], axis=-1)
    bot = jnp.concatenate([m_ * jnp.swapaxes(cx, -1, -2), m_ * eye3], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
