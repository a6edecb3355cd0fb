"""Distributed execution layer (SURVEY.md §7 `distrib/`, new components P1/P2):
mesh construction, sharded batched solves via shard_map, and the XLA-collective
reductions that replace any NCCL/MPI-style backend (SURVEY.md §5: "no external
NCCL/MPI analog is needed — JAX/XLA collectives over ICI/DCN")."""
from .mesh import make_mesh, shard_batch, replicate
from .sharded import sharded_rollouts, sharded_ddp_solve, sharded_mppi_step

__all__ = [
    "make_mesh", "shard_batch", "replicate",
    "sharded_rollouts", "sharded_ddp_solve", "sharded_mppi_step",
]
