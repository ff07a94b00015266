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


def install_pointnet2_shim():
    """Back ``pointnet2._ext`` with OUR kernels (CPU JAX) so the reference's
    FULL VoteNet can run forward on this image: channels-first torch tensors
    in/out, exactly the CUDA extension's call surface
    (pointnet2/pointnet2_utils.py:72-283). The ops themselves have
    independent NumPy oracles (tests/oracles.py); running the reference
    model through them isolates the MODEL math for differential testing."""
    import numpy as np
    import torch

    existing = sys.modules.get("pointnet2._ext")
    if existing is not None and getattr(existing, "_iou3dmatch_shim", False):
        return existing

    from iou3dmatch_tpu import ops

    mod = types.ModuleType("pointnet2._ext")
    mod._iou3dmatch_shim = True

    def _np(t):
        return np.ascontiguousarray(t.detach().cpu().numpy())

    def _t(arr):
        # np.asarray on a device array (and astype with order='K') can yield
        # non-C-contiguous layouts; the reference .view()s these tensors
        # (e.g. grid_conv_module.py:89), which requires contiguity.
        return torch.from_numpy(np.ascontiguousarray(arr))

    def furthest_point_sampling(xyz, npoint):
        out = np.asarray(ops.furthest_point_sample(_np(xyz), int(npoint)))
        return _t(out.astype(np.int32))

    def gather_points(features, idx):
        f = _np(features)  # (B, C, N)
        i = _np(idx).astype(np.int64)
        out = np.stack([f[b][:, i[b]] for b in range(f.shape[0])])
        return _t(out)

    def ball_query(new_xyz, xyz, radius, nsample):
        out = np.asarray(ops.ball_query(
            float(radius), int(nsample), _np(xyz), _np(new_xyz), exact=True))
        return _t(out.astype(np.int32))

    def group_points(features, idx):
        f = _np(features)  # (B, C, N)
        i = _np(idx).astype(np.int64)  # (B, np, ns)
        out = np.stack([f[b][:, i[b]] for b in range(f.shape[0])])
        return _t(out)  # (B, C, np, ns)

    def three_nn(unknown, known):
        # the CUDA _ext returns SQUARED distances; the Python wrapper takes
        # the sqrt (pointnet2_utils.py:141-143). Our op returns the
        # wrapper-level sqrt distances, so square them here.
        d, i = ops.three_nn(_np(unknown), _np(known))
        d = np.asarray(d).astype(np.float32)
        return (_t(d * d), _t(np.asarray(i).astype(np.int32)))

    def three_interpolate(features, idx, weight):
        f = _np(features).transpose(0, 2, 1)  # -> (B, m, C)
        out = np.asarray(ops.three_interpolate(
            f, _np(idx).astype(np.int32), _np(weight)))
        return _t(out.transpose(0, 2, 1))

    # Backward ops (the CUDA ext's atomic scatter-adds,
    # sampling_gpu.cu:48-51, group_points_gpu.cu:48-79,
    # interpolate_gpu.cu:121-148) as NumPy scatter-adds, so torch autograd
    # can run THROUGH the shim for trajectory differential tests.
    def gather_points_grad(grad_out, idx, n):
        g = _np(grad_out)  # (B, C, m)
        i = _np(idx).astype(np.int64)  # (B, m)
        out = np.zeros((g.shape[0], g.shape[1], n), g.dtype)
        for b in range(g.shape[0]):
            np.add.at(out[b], (slice(None), i[b]), g[b])
        return torch.from_numpy(out)

    def group_points_grad(grad_out, idx, n):
        g = _np(grad_out)  # (B, C, np, ns)
        i = _np(idx).astype(np.int64)  # (B, np, ns)
        B, C = g.shape[:2]
        out = np.zeros((B, C, n), g.dtype)
        for b in range(B):
            np.add.at(out[b], (slice(None), i[b].reshape(-1)),
                      g[b].reshape(C, -1))
        return torch.from_numpy(out)

    def three_interpolate_grad(grad_out, idx, weight, m):
        g = _np(grad_out)  # (B, c, n)
        i = _np(idx).astype(np.int64)  # (B, n, 3)
        w = _np(weight)  # (B, n, 3)
        B, C = g.shape[:2]
        out = np.zeros((B, C, m), g.dtype)
        for b in range(B):
            for k in range(3):
                np.add.at(out[b], (slice(None), i[b, :, k]),
                          g[b] * w[b, :, k][None, :])
        return torch.from_numpy(out)

    for fn in (furthest_point_sampling, gather_points, ball_query,
               group_points, three_nn, three_interpolate,
               gather_points_grad, group_points_grad,
               three_interpolate_grad):
        setattr(mod, fn.__name__, fn)

    sys.modules["pointnet2._ext"] = mod
    # rebind inside already-imported pointnet2_utils copies (the
    # __POINTNET2_SETUP__ escape leaves the name unbound there). The
    # reference's sys.path.append tricks make the module importable under
    # TWO keys with SEPARATE module objects — patch both.
    for key in ("pointnet2.pointnet2_utils", "pointnet2_utils"):
        pu = sys.modules.get(key)
        if pu is not None:
            pu._ext = mod
    return mod


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
