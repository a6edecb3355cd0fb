"""Prewarm the riccati_chunk compile probes at the BENCH configs' exact
arities (tracking costs emit all-constant cost blocks — an arity the r5
debug harness never compiled), so the driver's bench run pays cache hits
instead of cold Mosaic compiles."""
import sys
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
sys.path.insert(0, '.')
from rbdtpu.kernels.riccati_chunk import riccati_chunk_ok

CASES = [
    # (nx, nv, B, const_blocks)           config (rpy and quat roots share
    # nx_dim: rpy nq+nv == quat 2*nv for these models)
    (36, 18, 1024, ("lxx", "luu", "lux")),   # quadruped tracking
    (36, 18, 1024, ("luu", "lux")),          # quadruped EE
    (72, 36, 16, ("lxx", "luu", "lux")),     # humanoid tracking B=16
    (72, 36, 4, ("lxx", "luu", "lux")),      # humanoid hybrid DDP B=4
    (72, 36, 16, ("luu", "lux")),            # humanoid quat EE
]
for nx, nv, B, consts in CASES:
    ok = riccati_chunk_ok(nx, nv, B, const_blocks=consts)
    print(f"probe nx={nx} nv={nv} B={B} const={consts}: "
          f"{'OK' if ok else 'REJECTED'}", flush=True)
