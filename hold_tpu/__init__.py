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

import os as _os

# OpenCV's parallel backend (OpenMP) busy-waits on worker threads after any
# cv2 call, starving XLA:CPU's threadpool for the rest of the process: a
# jitted train step measured 24 s/step with cv2 imported vs 0.1 s without
# (same executable, same shapes).  One thread for cv2 keeps image IO fast
# enough and returns the cores to XLA.  Must be set before cv2's first
# parallel region, hence here — every CLI, test, and library path imports
# hold_tpu before touching cv2.
_os.environ.setdefault("OPENCV_FOR_THREADS_NUM", "1")

# HOLD_PLATFORM=cpu forces JAX onto the host backend.  The TPU PJRT plugin in
# this environment force-prepends itself to jax_platforms, so a plain
# JAX_PLATFORMS=cpu export is NOT honored — the config must be updated after
# importing jax.  This lets any CLI (visualize_ckpt, evaluate, ...) run on
# CPU while the one TPU chip is busy with a long training run.
if _os.environ.get("HOLD_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["HOLD_PLATFORM"])
