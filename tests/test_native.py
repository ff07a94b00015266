"""Native C++ host kernels (IoU, loader) vs the NumPy implementations."""
import numpy as np
import pytest

from iou3dmatch_tpu.eval.box3d_iou_np import box3d_iou
from iou3dmatch_tpu.native import box3d_iou_native, box3d_iou_matrix_native, load
from iou3dmatch_tpu.native import loader as native_loader


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


# ------------------------------------------------- native loader kernels


@pytest.mark.skipif(native_loader.load() is None, reason="no C++ toolchain")
def test_native_percentile_bit_identical():
    """percentile_native must reproduce np.percentile BIT-for-bit for both
    dtypes (the loader's floor-height channel feeds the bit-for-bit
    __getitem__ parity tests)."""
    rng = np.random.RandomState(0)
    for dtype in (np.float32, np.float64):
        for trial in range(300):
            n = rng.randint(1, 60000)
            z = ((rng.rand(n) - 0.3) * float(rng.choice([0.01, 1, 1000])))
            z = z.astype(dtype)
            if trial % 7 == 0:
                z = np.round(z, 1).astype(dtype)  # heavy ties
            if trial % 11 == 0:
                z[:] = z[0]  # constant array
            ref = np.percentile(z, 0.99)
            nat = native_loader.percentile_native(z, 0.99)
            if nat is None:
                # by-design fallback: an exact zero at the order statistic
                # (signed-zero tie order is partition-dependent)
                assert (z == 0).any()
                continue
            assert np.asarray(nat).dtype == np.asarray(ref).dtype
            assert np.asarray(nat).tobytes() == np.asarray(ref).tobytes(), (
                n, dtype, repr(nat), repr(ref))


@pytest.mark.skipif(native_loader.load() is None, reason="no C++ toolchain")
def test_native_votes_bit_identical(monkeypatch):
    """C++ vote kernel vs the NumPy reduceat form AND a literal port of the
    reference loop (scannet_detection_dataset.py:182-193) — byte-equal."""
    from iou3dmatch_tpu.data import scannet as sc

    rng = np.random.RandomState(2)
    for dtype in (np.float32, np.float64):
        for _ in range(15):
            n = int(rng.randint(1, 3000))
            pc = (rng.randn(n, 4) * 3).astype(dtype)
            ins = rng.randint(0, 30, n).astype(np.int64)
            sem = rng.randint(0, 41, n).astype(np.int64)

            nat = native_loader.compute_votes_native(pc, ins, sem,
                                                     sc.DC.nyu40ids)
            assert nat is not None
            nat_votes, nat_mask = nat

            # the NumPy vectorized fallback path
            with monkeypatch.context() as m:
                m.setattr(sc, "compute_votes_native",
                          lambda *a, **k: None)
                np_votes9, np_mask = sc._compute_votes(pc, ins, sem, n)

            # literal reference loop
            loop_votes = np.zeros((n, 3))
            loop_mask = np.zeros(n)
            for i_instance in np.unique(ins):
                ind = np.where(ins == i_instance)[0]
                if sem[ind[0]] in sc.DC.nyu40ids:
                    x = pc[ind, :3]
                    center = 0.5 * (x.min(0) + x.max(0))
                    loop_votes[ind, :] = center - x
                    loop_mask[ind] = 1.0

            assert nat_votes.tobytes() == loop_votes.tobytes()
            assert nat_mask.tobytes() == loop_mask.tobytes()
            assert np.tile(nat_votes, (1, 3)).tobytes() == np_votes9.tobytes()
            assert nat_mask.tobytes() == np_mask.tobytes()


@pytest.mark.skipif(native_loader.load() is None, reason="no C++ toolchain")
def test_native_prep_cloud_uses_native_percentile():
    """_prep_cloud's height channel is identical with and without the
    native kernel."""
    from iou3dmatch_tpu.data import scannet as sc

    rng = np.random.RandomState(3)
    verts = (rng.rand(5000, 6) * np.array([8, 8, 3, 255, 255, 255])).astype(
        np.float32)
    with_native = sc._prep_cloud(verts.copy(), False, True)
    try:
        native_loader._load_failed = True
        lib, native_loader._lib = native_loader._lib, None
        without = sc._prep_cloud(verts.copy(), False, True)
    finally:
        native_loader._lib, native_loader._load_failed = lib, False
    assert with_native.tobytes() == without.tobytes()
