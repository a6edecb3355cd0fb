"""Fused Pallas kernels for the hot paths (SURVEY.md §7 `kernels/`): whole
dynamics steps as single VPU kernels over lane-tiled state batches, drop-in
vs the jnp implementations."""
from .fused import (
    ModelStatic,
    get_static,
    rnea_lane,
    aba_lane,
    minv_lane,
    rnea_fused,
    fd_step_fused,
    fd_step_minv_fused,
    rollout_fused,
)
from .colvec import (
    minv_colvec,
    grad_pass_colvec,
    linearize_parts_fused,
    linearize_fused,
)

__all__ = [
    "ModelStatic", "get_static", "rnea_lane", "aba_lane", "minv_lane",
    "rnea_fused", "fd_step_fused", "fd_step_minv_fused", "rollout_fused",
    "minv_colvec", "grad_pass_colvec", "linearize_parts_fused",
    "linearize_fused",
]
