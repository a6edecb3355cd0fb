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

def quux(Am, Bm, lxr, lur, lxx, luu, lux, reg, Vxr, Vxx):
    P = rc._per_item(rc._dot, Vxx, Am)
    Pb = rc._per_item(rc._dot, Vxx, Bm)
    Quu = luu + rc._per_item(rc._dotT, Bm, Pb)
    Qux = lux + rc._per_item(rc._dotT, Bm, P)
    return Quu, Qux

# A: chol + K-only rhs (no mixed concat, no Qur)
def sA(*ins):
    Quu, Qux = quux(*ins)
    reg = ins[7]
    cols, invd = rc._chol_cols(Quu, reg, NV)
    rhs = [Qux[:, i:i+1, :] for i in range(NV)]
    sol = rc._chol_solve_rows_small(cols, invd, rhs)
    return (jnp.concatenate(sol, axis=1),)
try_stage('A: chol + K-only solve', sA, [(B,NV,NX)])

# B: chol + mixed-concat rhs but NO solve (just return rhs)
def sB(*ins):
    Quu, Qux = quux(*ins)
    lur, reg, Vxr = ins[3], ins[7], ins[8]
    Bm = ins[1]
    Qur = lur + rc._per_item(rc._dot, Vxr, Bm)
    cols, invd = rc._chol_cols(Quu, reg, NV)
    rhs = [jnp.concatenate([Qur[:, :, i:i+1], Qux[:, i:i+1, :]], axis=2)
           for i in range(NV)]
    keep = jnp.concatenate(rhs, axis=1) + cols[0] * 0.0
    return (keep,)
try_stage('B: chol + mixed rhs concat (no solve)', sB, [(B,NV,NX+1)])
