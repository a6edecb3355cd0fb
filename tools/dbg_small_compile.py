"""Compile-only binary search for the small-batch Riccati Mosaic failure."""
import sys
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
sys.path.insert(0, '.')
from rbdtpu.kernels.riccati_chunk import backward_pass_chunked

def try_cfg(nx, nv, B, H, timed=True):
    sds = lambda *s: jax.ShapeDtypeStruct(s, jnp.float32)
    if timed:
        lxx, luu, lux = sds(B, H, nx, nx), sds(B, H, nv, nv), sds(B, H, nv, nx)
    else:
        lxx, luu, lux = sds(nx, nx), sds(nv, nv), sds(nv, nx)
    args = (sds(B, H, nx, nx), sds(B, H, nx, nv), sds(B, H, nx), sds(B, H, nv),
            lxx, luu, lux, sds(B, nx), sds(B, nx, nx), sds(B))
    try:
        jax.jit(backward_pass_chunked).lower(*args).compile()
        print(f'OK   nx={nx} nv={nv} B={B} H={H} timed={timed}', flush=True)
    except Exception as e:
        print(f'FAIL nx={nx} nv={nv} B={B} H={H} timed={timed}: '
              f'{str(e).splitlines()[0][:300]}', flush=True)

for cfg in [(10, 4, 8, 3), (36, 18, 8, 3), (72, 36, 8, 2), (72, 36, 16, 32)]:
    try_cfg(*cfg)

if len(sys.argv) > 1 and sys.argv[1] == "cliff":
    for cfg in [(48, 24, 8, 2), (60, 30, 8, 2), (66, 33, 8, 2),
                (72, 36, 8, 1)]:
        try_cfg(*cfg)
