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

def base(Am, Bm, lxr, lur, lxx, luu, lux, reg, Vxr, Vxx):
    P = rc._per_item(rc._dot, Vxx, Am)
    Pb = rc._per_item(rc._dot, Vxx, Bm)
    Qur = lur + rc._per_item(rc._dot, Vxr, Bm)
    Quu = luu + rc._per_item(rc._dotT, Bm, Pb)
    Qux = lux + rc._per_item(rc._dotT, Bm, P)
    cols, invd = rc._chol_cols(Quu, reg, NV)
    return Qur, Quu, Qux, cols, invd

def sB1(*ins):
    Qur, Quu, Qux, cols, invd = base(*ins)
    rhs = [jnp.concatenate([Qur[:, :, i:i+1], Qux[:, i:i+1, :]], axis=2)
           for i in range(NV)]
    return (jnp.concatenate(rhs, axis=1),)
try_stage('sB1 chol + rhs concat', sB1, [(B,NV,NX+1)])

def sB2(*ins):
    Qur, Quu, Qux, cols, invd = base(*ins)
    rhs = [jnp.concatenate([Qur[:, :, i:i+1], Qux[:, i:i+1, :]], axis=2)
           for i in range(NV)]
    y = [None] * NV
    for i in range(NV):
        s = rhs[i]
        for t in range(i):
            s = s - cols[t][:, :, i:i+1] * y[t]
        y[i] = s * invd[i]
    return (jnp.concatenate(y, axis=1),)
try_stage('sB2 + forward subst', sB2, [(B,NV,NX+1)])

def sB3(*ins):
    Qur, Quu, Qux, cols, invd = base(*ins)
    rhs = [jnp.concatenate([Qur[:, :, i:i+1], Qux[:, i:i+1, :]], axis=2)
           for i in range(NV)]
    sol = rc._chol_solve_rows_small(cols, invd, rhs)
    return (jnp.concatenate(sol, axis=1),)
try_stage('sB3 + full solve', sB3, [(B,NV,NX+1)])
