"""rsuper-tpu: a TPU-native (JAX / XLA / Pallas / pjit) framework for training 3D CT
tumor-segmentation models jointly from per-voxel masks and radiology reports.

Re-designed from scratch against the capabilities of MrGiovanni/R-Super
(see SURVEY.md at the repo root). The compute path is pure JAX/XLA with Pallas
kernels for selected hot ops; parallelism is expressed with `jax.sharding`
over a device mesh (data-parallel over ICI by default).

Layout convention
-----------------
All volumetric tensors are **channels-last**: ``(B, D, H, W, C)`` (or ``(D, H, W)``
for single-channel volumes). Channels sit in TPU vector lanes; spatial dims in
sublanes. This differs from the reference's torch NCDHW layout and is the
layout XLA:TPU prefers for convolutions and elementwise fusion.
"""

__version__ = "0.1.0"
