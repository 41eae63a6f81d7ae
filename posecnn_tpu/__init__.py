"""posecnn_tpu — a TPU-native 6D object pose estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the PoseCNN pipeline
(semantic labeling + center-direction Hough voting + quaternion
regression with ADD/ADD-S loss + depth-based ICP refinement), built
for TPU hardware: SPMD over device meshes, functional transforms,
static shapes, and Pallas kernels for the hot custom ops.

Capability parity target: mrlooi/PoseCNN (see SURVEY.md). This is not
a port — the reference's TF1/CUDA architecture is replaced by an
idiomatic JAX design.
"""

__version__ = "0.1.0"
