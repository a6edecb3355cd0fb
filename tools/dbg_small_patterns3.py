"""Stage-bisect the real _riccati_knot_small body (no grid/scratch)."""
import sys
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
sys.path.insert(0, '.')
from rbdtpu.kernels import riccati_chunk as rc

B, NV, NX = 8, 4, 10

def try_stage(name, stage):
    sds = lambda *s: jax.ShapeDtypeStruct(s, jnp.float32)
    shapes = [ (B,NX,NX), (B,NX,NV), (B,1,NX), (B,1,NV),
               (B,NX,NX), (B,NV,NV), (B,NV,NX), (B,1,1),
               (B,1,NX), (B,NX,NX) ]
    def kernel(*refs):
        (A_r, B_r, lx_r, lu_r, lxx_r, luu_r, lux_r, reg_r,
         vx_r, vxx_r, o_r) = refs
        out = stage(A_r[...], B_r[...], lx_r[...], lu_r[...], lxx_r[...],
                    luu_r[...], lux_r[...], reg_r[...], vx_r[...],
                    vxx_r[...])
        o_r[...] = out
    try:
        fn = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, NX, NX), jnp.float32),
        )
        jax.jit(fn).lower(*[sds(*s) for s in shapes]).compile()
        print(f'OK   {name}', flush=True)
    except Exception as e:
        print(f'FAIL {name}: {str(e).splitlines()[0][:240]}', flush=True)

def s1(Am, Bm, lxr, lur, lxx, luu, lux, reg, Vxr, Vxx):
    P = rc._per_item(rc._dot, Vxx, Am)
    Pb = rc._per_item(rc._dot, Vxx, Bm)
    Quu = luu + rc._per_item(rc._dotT, Bm, Pb)
    Qux = lux + rc._per_item(rc._dotT, Bm, P)
    return P + jnp.sum(Quu, axis=(1, 2), keepdims=True) + \
        jnp.sum(Qux, axis=(1, 2), keepdims=True)

def s2(Am, Bm, lxr, lur, lxx, luu, lux, reg, Vxr, Vxx):
    Quu = luu + rc._per_item(rc._dotT, Bm, rc._per_item(rc._dot, Vxx, Bm))
    cols, invd = rc._chol_cols(Quu, reg, NV)
    acc = jnp.zeros((B, 1, NV), jnp.float32)
    for t in range(NV):
        acc = acc + cols[t] * invd[t]
    return jnp.broadcast_to(jnp.sum(acc, axis=2, keepdims=True),
                            (B, NX, NX))

def s3(Am, Bm, lxr, lur, lxx, luu, lux, reg, Vxr, Vxx):
    krow, K, dV1, Vxr_n, Vxx_n = rc._riccati_knot_small(
        Am, Bm, lxr, lur, lxx, luu, lux, reg, Vxr, Vxx, NX, NV)
    return Vxx_n + jnp.sum(K, axis=(1, 2), keepdims=True) + dV1

for nm, st in (("products", s1), ("chol", s2), ("full knot", s3)):
    try_stage(nm, st)
