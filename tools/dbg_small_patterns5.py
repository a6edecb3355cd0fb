import sys
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
sys.path.insert(0, '.')
from rbdtpu.kernels import riccati_chunk as rc

B, NV, NX = 8, 4, 10
sds = lambda *s: jax.ShapeDtypeStruct(s, jnp.float32)

def try_k(name, kernel, in_shapes, out_shape):
    try:
        fn = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(in_shapes),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )
        jax.jit(fn).lower(*[sds(*s) for s in in_shapes]).compile()
        print(f'OK   {name}', flush=True)
    except Exception as e:
        print(f'FAIL {name}: {str(e).splitlines()[0][:240]}', flush=True)

# t1: pure dual broadcast (no transcendental)
def k_t1(a_ref, o_ref):
    a = a_ref[...]
    o_ref[...] = a * a[:, 0:1, 0:1]
try_k('dual broadcast (B,n,n)*(B,1,1)', k_t1, [(B,NV,NV)], (B,NV,NV))

# t2: transcendental on (B,1,n) rows
def k_t2(a_ref, o_ref):
    a = a_ref[...]
    o_ref[...] = 1.0 / jnp.sqrt(a[:, 0:1, :] + 1e-3)
try_k('rsqrt on (B,1,n) row', k_t2, [(B,NV,NV)], (B,1,NV))

# t3: real full knot, clean outputs
def k_t3(*refs):
    (A_r, B_r, lx_r, lu_r, lxx_r, luu_r, lux_r, reg_r, vx_r, vxx_r,
     o_r) = refs
    krow, K, dV1, Vxr_n, Vxx_n = rc._riccati_knot_small(
        A_r[...], B_r[...], lx_r[...], lu_r[...], lxx_r[...], luu_r[...],
        lux_r[...], reg_r[...], vx_r[...], vxx_r[...], NX, NV)
    o_r[...] = Vxx_n + jnp.broadcast_to(dV1, (B, NX, NX)) \
        + jnp.broadcast_to(jnp.sum(K, axis=1, keepdims=True)[:, :, 0:1],
                           (B, NX, NX))
shapes = [(B,NX,NX),(B,NX,NV),(B,1,NX),(B,1,NV),(B,NX,NX),(B,NV,NV),
          (B,NV,NX),(B,1,1),(B,1,NX),(B,NX,NX)]
try_k('real full knot', k_t3, shapes, (B,NX,NX))
