"""sdflabel_tpu: TPU-native differentiable SDF rendering + 3D autolabeling framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of TRI-ML/sdflabel
(reference layout: /root/reference; see SURVEY.md). The compute path (DeepSDF
decode, isosurface projection, differentiable splatting, pose/shape refinement)
is fully jit-compiled with static shapes; the evaluator's sequential matching
runs in a native C++ kernel; parallelism is expressed over a jax.sharding.Mesh
(crops = data axis, pixels/rays = sequence axis).
"""

__version__ = "0.1.0"
