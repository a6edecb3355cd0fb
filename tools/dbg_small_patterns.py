"""Bisect which in-kernel pattern of the small-batch Riccati variant fails
Mosaic (the remote compile helper hides the error, so compile minimal
kernels per pattern)."""
import sys
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')

B, N = 8, 36

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
        args = [sds(s, jnp.float32) for s in in_shapes]
        jax.jit(fn).lower(*args).compile()
        print(f'OK   {name}', flush=True)
    except Exception as e:
        print(f'FAIL {name}: {str(e).splitlines()[0][:240]}', flush=True)

# 1. per-item 2-D dot via leading index + stack
def k_dot(a_ref, b_ref, o_ref):
    a, b = a_ref[...], b_ref[...]
    o_ref[...] = jnp.stack([
        jax.lax.dot_general(a[i], b[i], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for i in range(B)])
try_k('per-item dot + stack', k_dot, [(B, N, N), (B, N, N)], (B, N, N))

# 2. dim-0 contraction (a^T b without transpose)
def k_dotT(a_ref, b_ref, o_ref):
    a, b = a_ref[...], b_ref[...]
    o_ref[...] = jnp.stack([
        jax.lax.dot_general(a[i], b[i], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for i in range(B)])
try_k('per-item dim0-contraction dot', k_dotT, [(B, N, N), (B, N, N)],
      (B, N, N))

# 3. (B,1,1)-slice lane scalar ops
def k_scal(a_ref, o_ref):
    a = a_ref[...]
    s = a[:, 0:1, 0:1]
    o_ref[...] = a * (1.0 / jnp.sqrt(s + 1e-3))
try_k('(B,1,1) scalar slice ops', k_scal, [(B, N, N)], (B, N, N))

# 4. lane-major row concat (chol solve output pattern)
def k_cat(a_ref, o_ref):
    a = a_ref[...]
    rows = [a[:, i:i + 1, :] * 2.0 for i in range(N)]
    o_ref[...] = jnp.concatenate(rows, axis=1)
try_k('row slice + concat axis=1', k_cat, [(B, 1 if False else N, N)],
      (B, N, N))

# 5. leading-1 const broadcast add
def k_bc(a_ref, c_ref, o_ref):
    o_ref[...] = a_ref[...] + c_ref[...]
try_k('(1,n,m) const broadcast', k_bc, [(B, N, N), (1, N, N)], (B, N, N))

# 6. vector rows (B,1,n) ops + lane slices
def k_vec(a_ref, o_ref):
    a = a_ref[...]
    acc = a[:, 0:1, :]
    for t in range(4):
        acc = acc - a[:, t:t + 1, :] * acc[:, :, t:t + 1]
    o_ref[...] = acc
try_k('(B,1,n) row with lane-scalar slices', k_vec, [(B, N, N)], (B, 1, N))

# 7. grid + scratch + pl.when (time loop skeleton) at this layout
def k_grid(a_ref, o_ref, s_ref):
    h = pl.program_id(1)
    @pl.when(h == 0)
    def _():
        s_ref[...] = a_ref[0]
    s_ref[...] = s_ref[...] * 1.01
    o_ref[0] = s_ref[...]
H = 3
try:
    fn = pl.pallas_call(
        lambda a_ref, o_ref, s_ref: k_grid(a_ref, o_ref, s_ref),
        grid=(1, H),
        in_specs=[pl.BlockSpec((1, B, N, N), lambda b, h: (H - 1 - h, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, B, N, N), lambda b, h: (H - 1 - h, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, B, N, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, N, N), jnp.float32)],
    )
    jax.jit(fn).lower(jax.ShapeDtypeStruct((H, B, N, N), jnp.float32)).compile()
    print('OK   grid+scratch untiled-batch', flush=True)
except Exception as e:
    print(f'FAIL grid+scratch untiled-batch: {str(e).splitlines()[0][:240]}',
          flush=True)
