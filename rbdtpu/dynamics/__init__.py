"""Dynamics algorithms (SURVEY.md §7 `dynamics/`): functional, batched,
jit/vmap-closed reimplementations of reference components C3-C10."""
from .xforms import joint_transforms, joint_transforms_hom, q_per_joint
from .rnea import rnea, rnea_fpass, rnea_bpass, inverse_dynamics, apply_external_forces, gravity_accel
from .minv import minv, minv_bpass, minv_fpass
from .crba import crba
from .aba import aba
from .rnea_grad import rnea_grad, rnea_grad_fpass, rnea_grad_bpass
from .fd import forward_dynamics, forward_dynamics_grad, forward_dynamics_full
from .idsva import idsva_so, idsva_so_native, idsva_so_ad, fdsva_so

__all__ = [
    "idsva_so", "idsva_so_native", "idsva_so_ad", "fdsva_so",
    "joint_transforms", "joint_transforms_hom", "q_per_joint",
    "rnea", "rnea_fpass", "rnea_bpass", "inverse_dynamics",
    "apply_external_forces", "gravity_accel",
    "minv", "minv_bpass", "minv_fpass",
    "crba", "aba",
    "rnea_grad", "rnea_grad_fpass", "rnea_grad_bpass",
    "forward_dynamics", "forward_dynamics_grad", "forward_dynamics_full",
]
