import sys
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
sys.path.insert(0, '.')
from rbdtpu.kernels import riccati_chunk as rc

B, NV, NX = 8, 4, 10
sds = lambda *s: jax.ShapeDtypeStruct(s, jnp.float32)

def k(*refs):
    (A_r, B_r, lx_r, lu_r, lxx_r, luu_r, lux_r, reg_r, vx_r, vxx_r,
     kr_o, K_o, dv_o, vxr_o, vxx_o) = refs
    krow, K, dV1, Vxr_n, Vxx_n = rc._riccati_knot_small(
        A_r[...], B_r[...], lx_r[...], lu_r[...], lxx_r[...], luu_r[...],
        lux_r[...], reg_r[...], vx_r[...], vxx_r[...], NX, NV)
    kr_o[...] = krow
    K_o[...] = K
    dv_o[...] = dV1
    vxr_o[...] = Vxr_n
    vxx_o[...] = Vxx_n

shapes = [(B,NX,NX),(B,NX,NV),(B,1,NX),(B,1,NV),(B,NX,NX),(B,NV,NV),
          (B,NV,NX),(B,1,1),(B,1,NX),(B,NX,NX)]
outs = [(B,1,NV),(B,NV,NX),(B,1,1),(B,1,NX),(B,NX,NX)]
try:
    fn = pl.pallas_call(
        k,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(shapes),
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in outs),
        out_shape=tuple(jax.ShapeDtypeStruct(s, jnp.float32) for s in outs),
    )
    jax.jit(fn).lower(*[sds(*s) for s in shapes]).compile()
    print('OK   raw knot tuple outputs', flush=True)
except Exception as e:
    print(f'FAIL raw knot tuple outputs: {str(e).splitlines()[0][:240]}',
          flush=True)
