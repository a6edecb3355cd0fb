"""Run metrics / observability (SURVEY.md §5): counters collected on device,
reported per solve batch — no host callbacks on the hot path.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass
class SolveMetrics:
    """Aggregated statistics of a batch of DDP solves."""
    n_solves: int
    wall_s: float
    mean_cost: float
    max_cost: float
    frac_improved: float  # solves whose final dJ > 0 (made progress last iter)

    @property
    def solves_per_s(self) -> float:
        return self.n_solves / self.wall_s if self.wall_s > 0 else float("nan")

    @classmethod
    def from_states(cls, states, wall_s: float) -> "SolveMetrics":
        """states: vmapped DDPState (leading batch dim on every leaf)."""
        J = states.J
        return cls(
            n_solves=int(J.shape[0]),
            wall_s=float(wall_s),
            mean_cost=float(jnp.mean(J)),
            max_cost=float(jnp.max(J)),
            frac_improved=float(jnp.mean((states.dJ > 0).astype(jnp.float32))),
        )

    def json(self) -> dict:
        return {
            "n_solves": self.n_solves,
            "wall_s": round(self.wall_s, 6),
            "solves_per_s": round(self.solves_per_s, 1),
            "mean_cost": self.mean_cost,
            "max_cost": self.max_cost,
            "frac_improved": self.frac_improved,
        }
