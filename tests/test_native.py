"""Native C++ host IoU vs the NumPy implementation."""
import numpy as np
import pytest

from iou3dmatch_tpu.eval.box3d_iou_np import box3d_iou
from iou3dmatch_tpu.native import box3d_iou_native, box3d_iou_matrix_native, load


def _camera_corners(cx, cy, cz, l, w, h, heading, rng=None):
    """Camera-frame corners like box_util.get_3d_box: y up-negative,
    0-3 top face, 4-7 bottom."""
    c, s = np.cos(heading), np.sin(heading)
    x = np.array([l, l, -l, -l, l, l, -l, -l]) / 2
    z = np.array([w, -w, -w, w, w, -w, -w, w]) / 2
    y = np.array([h, h, h, h, 0, 0, 0, 0]) - h / 2
    xr = c * x + s * z
    zr = -s * x + c * z
    return np.stack([xr + cx, y + cy, zr + cz], axis=1).astype(np.float32)


@pytest.mark.skipif(load() is None, reason="no C++ toolchain")
def test_native_matches_numpy_random():
    rng = np.random.RandomState(0)
    for _ in range(200):
        b1 = _camera_corners(*rng.uniform(-1, 1, 3), *rng.uniform(0.5, 2, 3),
                             rng.uniform(-np.pi, np.pi))
        b2 = _camera_corners(*rng.uniform(-1, 1, 3), *rng.uniform(0.5, 2, 3),
                             rng.uniform(-np.pi, np.pi))
        ref, ref_bev = box3d_iou(b1, b2)
        nat, nat_bev = box3d_iou_native(b1, b2)
        assert abs(ref - nat) < 1e-5, (ref, nat)
        assert abs(ref_bev - nat_bev) < 1e-5


@pytest.mark.skipif(load() is None, reason="no C++ toolchain")
def test_native_matrix():
    rng = np.random.RandomState(1)
    boxes_a = np.stack([
        _camera_corners(*rng.uniform(-2, 2, 3), *rng.uniform(0.5, 2, 3),
                        rng.uniform(-np.pi, np.pi)) for _ in range(7)])
    boxes_b = np.stack([
        _camera_corners(*rng.uniform(-2, 2, 3), *rng.uniform(0.5, 2, 3),
                        rng.uniform(-np.pi, np.pi)) for _ in range(5)])
    mat = box3d_iou_matrix_native(boxes_a, boxes_b)
    assert mat.shape == (7, 5)
    for i in range(7):
        for j in range(5):
            ref, _ = box3d_iou(boxes_a[i], boxes_b[j])
            assert abs(mat[i, j] - ref) < 1e-5


@pytest.mark.skipif(load() is None, reason="no C++ toolchain")
def test_native_identical_box():
    b = _camera_corners(0, 0, 0, 1, 1, 1, 0.3)
    iou, bev = box3d_iou_native(b, b)
    assert abs(iou - 1.0) < 1e-5 and abs(bev - 1.0) < 1e-5
