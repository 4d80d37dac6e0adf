"""ArtiBoost-TPU: a TPU-native (JAX/XLA/Pallas) framework for boosted 3D
hand-object pose estimation.

Re-designed from scratch with the capabilities of the reference ArtiBoost
framework (CVPR 2022, package ``anakin``): online CCV-space exploration,
on-device synthetic-image rendering, hard-example mining, heatmap- and
regression-style pose networks, and full eval/submission tooling — all
built TPU-first around jit/pjit, device meshes, and Pallas kernels.
"""

__version__ = "0.1.0"
