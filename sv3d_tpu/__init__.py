"""sv3d_tpu — a TPU-native (JAX/XLA/Pallas) framework for single-view 3D scene
reconstruction.

Built from scratch with the capabilities of nihalsid/single-view-3d-reconstruction
(reference mounted at /root/reference): a UNet depth regressor, differentiable
depth->point-cloud back-projection and Gaussian-smoothed voxelization, an IF-Net
multi-scale implicit occupancy network with trilinear point-query decoding,
dense-grid inference with marching-cubes mesh extraction, offline 3D-Front
preprocessing, and IoU/Chamfer/normal-consistency evaluation.

Layout:
  config        - explicit config dataclasses (replaces util/arguments.py globals)
  geometry      - camera/frustum math (unifies model/projection.py and
                  data_processing/distance_to_depth.py)
  io            - EXR / .df / .sem / .obj / image codecs (host side)
  ops           - jittable compute ops: trilinear grid sampling, differentiable
                  voxelization, Gaussian smoothing (+ Pallas fused kernels)
  models        - UNet / UNetMini / IFNet / Projection flax modules
  data          - datasets + host-side loader with device prefetch
  parallel      - jax.sharding meshes and sharding rules (dp x sp)
  training      - train steps, optimizers, checkpointing, trainer entry points
  inference     - encode-once dense-grid occupancy sweep + meshing
  preprocessing - offline sample processing (occupancy sampling, waterproofing)
  evaluation    - IoU / Chamfer-L2 / normal consistency metrics
  native        - C++ geometry runtime (triangle hash, marching cubes, KD-tree)
"""

__version__ = "0.1.0"
