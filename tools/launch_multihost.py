#!/usr/bin/env python
"""Multi-host bootstrap launcher (SURVEY.md §5 "distributed communication
backend"; VERDICT r2 missing #2).

Two roles in one file:

- PARENT (default): spawn N worker processes on this machine, each a
  jax.distributed participant, wait, and propagate any failure.  With the CPU
  backend (default) each worker gets D virtual devices — the no-cluster
  multi-host harness (SURVEY.md §4 item 4): 2 OS processes x 4 virtual
  devices exercise the REAL cross-process path (Gloo collectives over the
  coordination service), not just a virtual mesh inside one process.
- WORKER (RBDTPU_MH_RANK set): call jax.distributed.initialize(), build the
  2-D ("host", "batch") global mesh, run a sharded batch of DDP solves with
  the problem batch sharded over BOTH axes, and VERIFY the result against a
  process-local reference solve of the same problems (bitwise-deterministic
  data from a fixed seed).  Rank 0 prints one JSON summary line.

On a real TPU pod slice, run one process per host with the standard TPU
environment and pass ``--auto``: jax.distributed.initialize() then
auto-detects coordinator/rank from the TPU metadata, and the same worker
body runs over ICI/DCN unchanged.  Throughput printed under the CPU backend
is HARNESS VALIDATION ONLY (virtual devices share host cores), never a
scaling claim.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def parent(args) -> int:
    env_base = dict(os.environ)
    env_base.pop("PALLAS_AXON_POOL_IPS", None)  # one TPU process at a time;
    # workers are CPU (the axon plugin would deadlock on its relay)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for rank in range(args.num_processes):
        env = dict(env_base)
        env["RBDTPU_MH_RANK"] = str(rank)
        env["RBDTPU_MH_NPROC"] = str(args.num_processes)
        env["RBDTPU_MH_PORT"] = str(args.port)
        if args.backend == "cpu":
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = (
                env.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count="
                  f"{args.devices_per_process}"
            )
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            env=env,
        ))
    rc = 0
    for rank, p in enumerate(procs):
        p.wait()
        if p.returncode != 0:
            print(f"launch_multihost: rank {rank} FAILED rc={p.returncode}",
                  file=sys.stderr)
            rc = 1
    return rc


def worker(args) -> int:
    rank = int(os.environ["RBDTPU_MH_RANK"])
    nproc = int(os.environ["RBDTPU_MH_NPROC"])
    port = int(os.environ["RBDTPU_MH_PORT"])

    import jax

    if args.auto:
        jax.distributed.initialize()  # TPU pod: coordinator from metadata
    else:
        jax.distributed.initialize(
            f"127.0.0.1:{port}", num_processes=nproc, process_id=rank
        )
    jax.config.update("jax_enable_x64", True)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from rbdtpu.model import load_asset
    from rbdtpu.solver import DDPConfig, ddp_solve, quadratic_tracking_cost
    from rbdtpu.distrib import sharded_ddp_solve

    n_total = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_total == nproc * n_local, (n_total, nproc, n_local)
    mesh = Mesh(
        np.array(jax.devices()).reshape(nproc, n_local), ("host", "batch")
    )
    axes = ("host", "batch")

    model = load_asset("arm7", dtype=np.float64)
    B, H = 2 * n_total, 6
    cfg = DDPConfig(iters=3, dt=0.02, n_alphas=3)
    rng = np.random.default_rng(20260819)  # identical data on every rank
    x0_np = rng.uniform(-0.2, 0.2, (B, model.nx))
    U0_np = np.zeros((B, H, model.nv))
    cost = quadratic_tracking_cost(model, jnp.zeros(model.nx))

    sh = NamedSharding(mesh, P(axes))
    sh3 = NamedSharding(mesh, P(axes, None, None))
    x0 = jax.make_array_from_callback(
        x0_np.shape, NamedSharding(mesh, P(axes, None)),
        lambda idx: x0_np[idx],
    )
    U0 = jax.make_array_from_callback(
        U0_np.shape, sh3, lambda idx: U0_np[idx]
    )

    t0 = time.perf_counter()
    J_sh, U_sh, meanJ = jax.block_until_ready(
        sharded_ddp_solve(mesh, model, cost, x0, U0, cfg, axis=axes)
    )
    t_sh = time.perf_counter() - t0

    # process-local ground truth for THIS rank's shard (every rank holds the
    # full deterministic problem set)
    J_loc = jax.vmap(
        lambda x, U: ddp_solve(model, cost, x, U, cfg)[0].J
    )(jnp.asarray(x0_np), jnp.asarray(U0_np))
    err = 0.0
    for s in J_sh.addressable_shards:
        idx = s.index[0]
        err = max(err, float(jnp.abs(
            s.data - J_loc[idx]).max()))
    mean_err = abs(float(meanJ) - float(J_loc.mean()))
    ok = err < 1e-9 and mean_err < 1e-9
    print(f"rank {rank}: shard-vs-local max err {err:.2e}, "
          f"mean err {mean_err:.2e} -> {'OK' if ok else 'FAIL'}", flush=True)
    if rank == 0:
        print(json.dumps({
            "multihost": "ok" if ok else "fail",
            "processes": nproc,
            "devices_per_process": n_local,
            "mesh": "(host, batch)",
            "problems": B,
            "sharded_solve_s": round(t_sh, 3),
            "platform": jax.devices()[0].platform,
            "note": (
                "cpu-backend numbers are harness validation only "
                "(virtual devices share host cores), not a scaling claim"
            ),
        }), flush=True)
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--auto", action="store_true",
                    help="jax.distributed.initialize() auto-detect (TPU pod)")
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--devices-per-process", type=int, default=4)
    ap.add_argument("--backend", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--port", type=int, default=29751)
    args = ap.parse_args()
    if args.worker:
        return worker(args)
    return parent(args)


if __name__ == "__main__":
    sys.exit(main())
