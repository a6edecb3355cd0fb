import sys
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
sys.path.insert(0, '.')
from rbdtpu.kernels import riccati_chunk as rc

B = 8
sds = lambda *s: jax.ShapeDtypeStruct(s, jnp.float32)

def try_stage(name, body, in_shapes, outs):
    def k(*refs):
        ins = [r[...] for r in refs[:len(in_shapes)]]
        res = body(*ins)
        for o_ref, val in zip(refs[len(in_shapes):], res):
            o_ref[...] = val
    try:
        fn = pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(in_shapes),
            out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                            for _ in outs),
            out_shape=tuple(jax.ShapeDtypeStruct(s, jnp.float32)
                            for s in outs),
        )
        jax.jit(fn).lower(*[sds(*s) for s in in_shapes]).compile()
        print(f'OK   {name}', flush=True)
    except Exception as e:
        print(f'FAIL {name}: {str(e).splitlines()[0][:240]}', flush=True)

for NV in (24, 30, 36):
    NX = 2 * NV
    # chol only
    def chol_only(Quu, reg, NV=NV):
        cols, invd = rc._chol_cols(Quu, reg, NV)
        acc = cols[0]
        for t in range(1, NV):
            acc = acc + cols[t] * invd[t]
        return (acc,)
    try_stage(f'chol nv={NV}', chol_only, [(B,NV,NV),(B,1,1)], [(B,1,NV)])
    # solve only (fake unit cols from raw input rows)
    def solve_only(Quu, Qux, NV=NV, NX=NX):
        cols = [Quu[:, j:j+1, :] for j in range(NV)]
        invd = [Quu[:, j:j+1, j:j+1] * 0.0 + 1.0 for j in range(NV)]
        sol = rc._chol_solve_rows_small(
            cols, invd, [Qux[:, i:i+1, :] for i in range(NV)])
        return (jnp.concatenate(sol, axis=1),)
    try_stage(f'solve nv={NV}', solve_only, [(B,NV,NV),(B,NV,NX)],
              [(B,NV,NX)])
    # products + Vxx assembly only (no chol/solve; K := lux)
    def prods(Am, Bm, lxx, lux, Vxx, NV=NV, NX=NX):
        P = rc._per_item(rc._dot, Vxx, Am)
        Pb = rc._per_item(rc._dot, Vxx, Bm)
        Quu = rc._per_item(rc._dotT, Bm, Pb)
        Qux = lux + rc._per_item(rc._dotT, Bm, P)
        K = lux
        QuuK = rc._per_item(rc._dot, Quu, K)
        G = rc._per_item(rc._dotT, Am, P)
        Gt = rc._per_item(rc._dotT, P, Am)
        KK = rc._per_item(rc._dotT, K, QuuK)
        KKt = rc._per_item(rc._dotT, QuuK, K)
        W = rc._per_item(rc._dotT, K, Qux)
        Wt = rc._per_item(rc._dotT, Qux, K)
        return (lxx + 0.5*(G+Gt) + 0.5*(KK+KKt) + W + Wt,)
    try_stage(f'products nv={NV}', prods,
              [(B,NX,NX),(B,NX,NV),(B,NX,NX),(B,NV,NX),(B,NX,NX)],
              [(B,NX,NX)])
