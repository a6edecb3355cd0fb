"""rbdtpu — TPU-native rigid-body dynamics + MPC engine.

A from-scratch JAX/XLA/Pallas framework with the algorithmic capabilities of
A2R-Lab/RBDReference (see SURVEY.md): batched spatial-algebra tree kernels
(RNEA, analytical RNEA gradient, direct Minv, CRBA, ABA, IDSVA-SO, FK +
gradients/Hessians) over URDF-parsed robot models, wrapped in DDP/iLQR and
sampling MPC solvers that shard across TPU meshes.
"""
from . import spatial, model, dynamics, kinematics, solver, distrib

__version__ = "0.1.0"
