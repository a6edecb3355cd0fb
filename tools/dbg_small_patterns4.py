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

# a. rectangular per-item dot (nx,nx)@(nx,nv)
def k_a(a_ref, b_ref, o_ref):
    o_ref[...] = rc._per_item(rc._dot, a_ref[...], b_ref[...])
try_k('rect per-item dot (nx,nx)@(nx,nv)', k_a, [(B,NX,NX),(B,NX,NV)],
      (B,NX,NV))

# b. rect dim0-contraction (nx,nv)T@(nx,nv) -> (nv,nv)
def k_b(a_ref, b_ref, o_ref):
    o_ref[...] = rc._per_item(rc._dotT, a_ref[...], b_ref[...])
try_k('rect per-item dotT (nx,nv)T@(nx,nv)', k_b, [(B,NX,NV),(B,NX,NV)],
      (B,NV,NV))

# c. rect dotT (nx,nv)T@(nx,nx) -> (nv,nx)
def k_c(a_ref, b_ref, o_ref):
    o_ref[...] = rc._per_item(rc._dotT, a_ref[...], b_ref[...])
try_k('rect per-item dotT (nx,nv)T@(nx,nx)', k_c, [(B,NX,NV),(B,NX,NX)],
      (B,NV,NX))

# d. sum over (1,2) keepdims
def k_d(a_ref, o_ref):
    o_ref[...] = jnp.broadcast_to(
        jnp.sum(a_ref[...], axis=(1, 2), keepdims=True), (B, NX, NX))
try_k('sum axis=(1,2) keepdims + broadcast', k_d, [(B,NX,NX)], (B,NX,NX))
