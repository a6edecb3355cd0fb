import sys
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
sys.path.insert(0, '.')
from rbdtpu.kernels import riccati_chunk as rc

B, NV, NX = 8, 4, 10
sds = lambda *s: jax.ShapeDtypeStruct(s, jnp.float32)
shapes = [(B,NX,NX),(B,NX,NV),(B,1,NX),(B,1,NV),(B,NX,NX),(B,NV,NV),
          (B,NV,NX),(B,1,1),(B,1,NX),(B,NX,NX)]

def try_stage(name, body, outs):
    def k(*refs):
        ins = [r[...] for r in refs[:10]]
        res = body(*ins)
        for o_ref, val in zip(refs[10:], res):
            o_ref[...] = val
    try:
        fn = pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
            out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                            for _ in outs),
            out_shape=tuple(jax.ShapeDtypeStruct(s, jnp.float32)
                            for s in outs),
        )
        jax.jit(fn).lower(*[sds(*s) for s in shapes]).compile()
        print(f'OK   {name}', flush=True)
    except Exception as e:
        print(f'FAIL {name}: {str(e).splitlines()[0][:240]}', flush=True)

def parts(Am, Bm, lxr, lur, lxx, luu, lux, reg, Vxr, Vxx):
    P = rc._per_item(rc._dot, Vxx, Am)
    Pb = rc._per_item(rc._dot, Vxx, Bm)
    Qxr = lxr + rc._per_item(rc._dot, Vxr, Am)
    Qur = lur + rc._per_item(rc._dot, Vxr, Bm)
    Quu = luu + rc._per_item(rc._dotT, Bm, Pb)
    Qux = lux + rc._per_item(rc._dotT, Bm, P)
    return P, Qxr, Qur, Quu, Qux

try_stage('sA products+vectors', parts,
          [(B,NX,NX),(B,1,NX),(B,1,NV),(B,NV,NV),(B,NV,NX)])

def sC(Am, Bm, lxr, lur, lxx, luu, lux, reg, Vxr, Vxx):
    P, Qxr, Qur, Quu, Qux = parts(Am, Bm, lxr, lur, lxx, luu, lux, reg,
                                  Vxr, Vxx)
    cols, invd = rc._chol_cols(Quu, reg, NV)
    rhs = [jnp.concatenate([Qur[:, :, i:i+1], Qux[:, i:i+1, :]], axis=2)
           for i in range(NV)]
    sol = rc._chol_solve_rows_small(cols, invd, rhs)
    krow = -jnp.concatenate([s[:, :, 0:1] for s in sol], axis=2)
    K = -jnp.concatenate([s[:, :, 1:] for s in sol], axis=1)
    return krow, K

try_stage('sC chol+solve', sC, [(B,1,NV),(B,NV,NX)])

def sD(Am, Bm, lxr, lur, lxx, luu, lux, reg, Vxr, Vxx):
    P, Qxr, Qur, Quu, Qux = parts(Am, Bm, lxr, lur, lxx, luu, lux, reg,
                                  Vxr, Vxx)
    krow, K = sC(Am, Bm, lxr, lur, lxx, luu, lux, reg, Vxr, Vxx)
    QuuK = rc._per_item(rc._dot, Quu, K)
    kQuu = rc._per_item(rc._dot, krow, Quu)
    Vxr_new = (Qxr + rc._per_item(rc._dot, kQuu + Qur, K)
               + rc._per_item(rc._dot, krow, Qux))
    return (Vxr_new,)

try_stage('sD Vx update', sD, [(B,1,NX)])

def sE(Am, Bm, lxr, lur, lxx, luu, lux, reg, Vxr, Vxx):
    P, Qxr, Qur, Quu, Qux = parts(Am, Bm, lxr, lur, lxx, luu, lux, reg,
                                  Vxr, Vxx)
    krow, K = sC(Am, Bm, lxr, lur, lxx, luu, lux, reg, Vxr, Vxx)
    QuuK = rc._per_item(rc._dot, Quu, K)
    G = rc._per_item(rc._dotT, Am, P)
    Gt = rc._per_item(rc._dotT, P, Am)
    KK = rc._per_item(rc._dotT, K, QuuK)
    KKt = rc._per_item(rc._dotT, QuuK, K)
    W = rc._per_item(rc._dotT, K, Qux)
    Wt = rc._per_item(rc._dotT, Qux, K)
    return (lxx + 0.5*(G+Gt) + 0.5*(KK+KKt) + W + Wt,)

try_stage('sE Vxx update', sE, [(B,NX,NX)])

def sF(Am, Bm, lxr, lur, lxx, luu, lux, reg, Vxr, Vxx):
    krow, K = sC(Am, Bm, lxr, lur, lxx, luu, lux, reg, Vxr, Vxx)
    _, _, Qur, _, _ = parts(Am, Bm, lxr, lur, lxx, luu, lux, reg, Vxr, Vxx)
    dV1 = jnp.sum(krow * Qur, axis=2, keepdims=True)
    return (dV1,)

try_stage('sF dV1', sF, [(B,1,1)])
