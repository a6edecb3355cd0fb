"""Forward kinematics (SURVEY.md §7 `kinematics/`): batched EE pose, analytic
gradient and Hessian (reference C11-C13)."""
from .fk import (
    fk_world_hom,
    ee_pose,
    ee_pose_gradient,
    ee_pose_hessian,
)

__all__ = ["fk_world_hom", "ee_pose", "ee_pose_gradient", "ee_pose_hessian"]
