"""Pattern bisect round 2 for the small-batch Riccati Mosaic crash."""
import sys
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')

B, NV, NX = 8, 4, 10

def try_k(name, kernel, in_shapes, out_shape):
    sds = jax.ShapeDtypeStruct
    try:
        fn = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                      for _ in in_shapes],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=sds(out_shape, jnp.float32),
        )
        jax.jit(fn).lower(*[sds(s, jnp.float32) for s in in_shapes]).compile()
        print(f'OK   {name}', flush=True)
    except Exception as e:
        print(f'FAIL {name}: {str(e).splitlines()[0][:240]}', flush=True)

# 1. per-item VECTOR-matrix dot (1,nv)@(nv,nx) + stack
def k_vdot(a_ref, b_ref, o_ref):
    a, b = a_ref[...], b_ref[...]
    o_ref[...] = jnp.stack([
        jax.lax.dot_general(a[i], b[i], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for i in range(B)])
try_k('per-item vec-mat dot (1,nv)@(nv,nx)', k_vdot,
      [(B, 1, NV), (B, NV, NX)], (B, 1, NX))

# 2. lane reduction to (B,1,1)
def k_red(a_ref, o_ref):
    o_ref[...] = jnp.sum(a_ref[...], axis=2, keepdims=True)
try_k('sum keepdims -> (B,1,1)', k_red, [(B, 1, NV)], (B, 1, 1))

# 3. concat of (B,1,1) lane pieces along axis 2
def k_cat2(a_ref, o_ref):
    a = a_ref[...]
    o_ref[...] = jnp.concatenate(
        [a[:, :, i:i + 1] * 2.0 for i in range(NV)], axis=2)
try_k('concat (B,1,1) pieces axis=2', k_cat2, [(B, 1, NV)], (B, 1, NV))

# 4. rhs concat (B,1,1) + (B,1,nx)
def k_cat3(a_ref, b_ref, o_ref):
    o_ref[...] = jnp.concatenate(
        [a_ref[...][:, :, 0:1], b_ref[...][:, 0:1, :]], axis=2)
try_k('concat (B,1,1)+(B,1,nx)', k_cat3, [(B, 1, NV), (B, NV, NX)],
      (B, 1, NX + 1))

# 5. sqrt at row width then slice (the fixed _chol_cols pattern)
def k_sqrt_row(a_ref, o_ref):
    a = a_ref[...]
    inv = 1.0 / jnp.sqrt(a[:, 0:1, :] + 1e-3)
    o_ref[...] = a * inv[:, :, 0:1]
try_k('sqrt at (B,1,n) then (B,1,1) slice mult', k_sqrt_row,
      [(B, NV, NV)], (B, NV, NV))

# 6. 4-D out spec with (1,Bc,1,1) block via grid (dV1 store)
def k_dv(a_ref, o_ref):
    o_ref[0] = jnp.sum(a_ref[0], axis=2, keepdims=True)
H = 2
try:
    fn = pl.pallas_call(
        k_dv, grid=(1, H),
        in_specs=[pl.BlockSpec((1, B, 1, NV), lambda b, h: (H - 1 - h, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, B, 1, 1), lambda b, h: (H - 1 - h, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, B, 1, 1), jnp.float32),
    )
    jax.jit(fn).lower(
        jax.ShapeDtypeStruct((H, B, 1, NV), jnp.float32)).compile()
    print('OK   (1,B,1,1) out block via grid', flush=True)
except Exception as e:
    print(f'FAIL (1,B,1,1) out block via grid: {str(e).splitlines()[0][:240]}',
          flush=True)

# 7. (B,1,nv) vector block input (1,Bc,1,nv) via grid (lx/lu stream)
def k_vin(a_ref, o_ref):
    o_ref[0] = a_ref[0] * 2.0
try:
    fn = pl.pallas_call(
        k_vin, grid=(1, H),
        in_specs=[pl.BlockSpec((1, B, 1, NV), lambda b, h: (H - 1 - h, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, B, 1, NV), lambda b, h: (H - 1 - h, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, B, 1, NV), jnp.float32),
    )
    jax.jit(fn).lower(
        jax.ShapeDtypeStruct((H, B, 1, NV), jnp.float32)).compile()
    print('OK   (1,B,1,nv) in block via grid', flush=True)
except Exception as e:
    print(f'FAIL (1,B,1,nv) in block via grid: {str(e).splitlines()[0][:240]}',
          flush=True)
