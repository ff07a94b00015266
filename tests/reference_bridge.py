"""Import the reference implementation (/root/reference) as a live oracle.

The reference is a CUDA-era research codebase; on this CPU/TPU image a few
of its imports need stubbing before its PURE-PYTHON modules run:

- ``plyfile``/``trimesh``/``mayavi``/``cv2`` — visualization / I/O libs not
  in the image; only touched by functions the diff tests never call.
- ``pcdet`` — the OpenPCDet CUDA extension. Its one entry point,
  ``boxes_iou3d_gpu``, is backed by OUR rotated-IoU kernel (torch-CPU in,
  torch out). That primitive has its own independent oracles (NumPy
  Sutherland-Hodgman port + fresh C++ impl, test_geometry.py); plugging it
  into the reference here lets the loss diffs validate everything AROUND
  it — the −heading box packing, −1000 empty-GT slots, max-over-same-scene
  reduction, sem-cls gathers, masks, and loss weights.
- ``torch.Tensor.cuda`` — monkeypatched to a no-op so module-level
  ``.cuda()`` pushes (scannet/model_util_scannet.py:35) work on CPU torch.

Everything imported here is the REFERENCE's own code running as a test
oracle; nothing from it is copied into the framework.
"""
import os
import sys
import types

REF = "/root/reference"


def reference_available():
    return os.path.isdir(REF)


_loaded = {}


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return sys.modules[name]


def load(module_name):
    """Import a reference module (e.g. 'utils.nn_distance') with stubs in
    place. Returns the module object, cached across calls."""
    if module_name in _loaded:
        return _loaded[module_name]
    if not reference_available():
        raise RuntimeError("reference tree not present")

    for p in (REF, os.path.join(REF, "utils"), os.path.join(REF, "models"),
              os.path.join(REF, "scannet"), os.path.join(REF, "sunrgbd")):
        if p not in sys.path:
            sys.path.append(p)

    _stub("plyfile", PlyData=object, PlyElement=object)
    _stub("trimesh")
    mayavi = _stub("mayavi")
    mayavi.mlab = _stub("mayavi.mlab")
    _stub("cv2")

    def _boxes_iou3d(boxes_a, boxes_b):
        import numpy as np
        import torch

        from iou3dmatch_tpu.geometry.iou3d import boxes_iou3d

        iou = np.array(boxes_iou3d(
            np.asarray(boxes_a.detach().numpy(), dtype=np.float32),
            np.asarray(boxes_b.detach().numpy(), dtype=np.float32)))
        return torch.from_numpy(iou)

    pcdet = _stub("pcdet")
    pcdet_ops = _stub("pcdet.ops")
    pcdet_nms = _stub("pcdet.ops.iou3d_nms")
    _stub("pcdet.ops.iou3d_nms.iou3d_nms_utils", boxes_iou3d_gpu=_boxes_iou3d)
    pcdet.ops = pcdet_ops
    pcdet_ops.iou3d_nms = pcdet_nms
    pcdet_nms.iou3d_nms_utils = sys.modules["pcdet.ops.iou3d_nms.iou3d_nms_utils"]

    # pointnet2_utils' own escape hatch for importing without the CUDA _ext
    # (pointnet2/pointnet2_utils.py:23-34); the ops are only touched at call
    # time, which the diff tests never do.
    import builtins

    builtins.__POINTNET2_SETUP__ = True

    import torch

    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self
        torch.cuda.FloatTensor = torch.FloatTensor
        torch.cuda.LongTensor = torch.LongTensor

    mod = __import__(module_name)
    for part in module_name.split(".")[1:]:
        mod = getattr(mod, part)
    _loaded[module_name] = mod
    return mod
