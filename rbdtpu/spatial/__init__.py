"""Batched spatial-vector algebra and transform builders (SURVEY.md §7 `spatial/`)."""
from . import batched
from . import quat
from .ops import (
    crm,
    crf,
    icrf,
    skew,
    cross_motion,
    cross_force,
    vxIv,
    factor_inertia,
    dot_inertia,
    mcI,
)
from .transforms import (
    REVOLUTE,
    PRISMATIC,
    FLOATING,
    FIXED,
    rot_axis,
    drot_axis,
    d2rot_axis,
    rpy_to_R,
    plux,
    hom,
    joint_spatial_x,
    joint_hom_T,
    joint_hom_dT,
    joint_hom_d2T,
    floating_spatial_x,
    floating_hom_T,
)

__all__ = [
    "crm", "crf", "icrf", "skew", "cross_motion", "cross_force", "vxIv",
    "factor_inertia", "dot_inertia", "mcI",
    "REVOLUTE", "PRISMATIC", "FLOATING", "FIXED",
    "rot_axis", "drot_axis", "d2rot_axis", "rpy_to_R", "plux", "hom",
    "joint_spatial_x", "joint_hom_T", "joint_hom_dT", "joint_hom_d2T",
    "floating_spatial_x", "floating_hom_T",
]
