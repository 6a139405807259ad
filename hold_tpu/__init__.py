"""hold_tpu — TPU-native (JAX/XLA/Pallas) framework for category-agnostic 3D
reconstruction of interacting hands and objects from monocular video.

Re-designed from scratch for TPU with the capabilities of zc-alexfan/hold
(CVPR'24): VolSDF volumetric rendering of composed articulated SDFs (MANO
KNN-skinning deformer, rigid object node, NeRF++ background), BARF
coarse-to-fine positional encoding, per-frame pose embeddings, pose
refinement, MISE/marching-cubes canonical meshing, and HO3D/ARCTIC
evaluation.  The compute path is pure-functional JAX sharded over a
`jax.sharding.Mesh`; host-side native components (octree isosurface
extraction, marching cubes) are C++.
"""

__version__ = "0.1.0"
