"""iou3dmatch_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of 3DIoUMatch.

Re-implements, from scratch and TPU-first, the full capability surface of the
reference CUDA/PyTorch codebase (yezhen17/3DIoUMatch):

- ``ops``      — point-cloud primitives (FPS, ball query, grouping, 3-NN
                 interpolation) as fixed-shape XLA graphs + Pallas kernels,
                 replacing the ``pointnet2/_ext_src`` CUDA extension.
- ``geometry`` — rotated/axis-aligned 3D box IoU, box corner math, chamfer
                 distances, NMS/LHS, replacing OpenPCDet's ``iou3d_nms`` CUDA
                 kernels and ``utils/{box_util,nn_distance,nms}.py``.
- ``models``   — VoteNet with IoU branch (PointNet++ backbone, Hough voting,
                 proposal head, GridConv) in flax.linen, channels-last.
- ``losses``   — supervised / labeled / unlabeled (SSL pseudo-label) losses.
- ``data``     — ScanNet & SUN RGB-D dataset configs + host-side loaders.
- ``eval``     — prediction parsing, VOC AP, IoU-guided NMS, test-time IoU
                 optimization.
- ``train``    — jitted pretrain / SSL train steps, EMA teacher, schedules,
                 checkpointing.
- ``parallel`` — ``jax.sharding.Mesh`` data-parallel scale-out (pjit/GSPMD).

The package name mirrors the reference project 3DIoUMatch (directory
``3dioumatch_tpu`` in the build plan); it is spelled ``iou3dmatch_tpu`` so it
is importable as a Python identifier.
"""

__version__ = "0.1.0"
