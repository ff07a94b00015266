"""End-to-end SUN RGB-D raw extraction test: synthetic official-release
layout -> prep_sunrgbd_raw (matlab replacement) -> prep_sunrgbd votes."""
import os

import numpy as np
import pytest

scipy_io = pytest.importorskip("scipy.io")

from iou3dmatch_tpu.data import prep_sunrgbd, prep_sunrgbd_raw


def _make_official(root):
    """Minimal OFFICIAL_SUNRGBD with one scene: a flat depth plane and one
    'bed' box."""
    from PIL import Image

    os.makedirs(os.path.join(root, "scene1"), exist_ok=True)
    h, w = 32, 40
    depth_m = np.full((h, w), 2.0, np.float32)  # 2 m plane
    depth_mm = (depth_m * 1000).astype(np.uint16)
    # stored rotated left by 3 bits (read3dPoints.m reverses this)
    depth_vis = np.bitwise_or(
        np.left_shift(depth_mm, 3), np.right_shift(depth_mm, 16 - 3)
    ).astype(np.uint16)
    Image.fromarray(depth_vis, mode="I;16").save(
        os.path.join(root, "scene1", "depth.png"))
    Image.fromarray(np.full((h, w, 3), 128, np.uint8)).save(
        os.path.join(root, "scene1", "rgb.jpg"))

    k_mat = np.array([[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1]])
    rtilt = np.eye(3)
    rec = {
        "Rtilt": rtilt, "K": k_mat,
        "depthpath": os.path.join(root, "scene1", "depth.png"),
        "rgbpath": os.path.join(root, "scene1", "rgb.jpg"),
        "sequenceName": "kv1/scene1",
        "groundtruth3DBB": np.array([(
            np.array([[0.0, 2.0, 0.5]]),      # centroid (upright depth)
            np.array([[0.6, 0.9, 0.4]]),      # coeffs (half sizes)
            np.array([[1.0, 0.0]]),           # orientation
            "bed",
        )], dtype=[("centroid", "O"), ("coeffs", "O"), ("orientation", "O"),
                    ("classname", "O")]),
    }
    return rec


def test_extract_one_and_votes(tmp_path):
    root = str(tmp_path / "official")
    out = str(tmp_path / "trainval")
    os.makedirs(out)
    rec = _make_official(root)

    prep_sunrgbd_raw.extract_one(rec, None, root, out, 1, v1=True)

    # depth dump readable by the downstream prep
    pc = prep_sunrgbd.load_depth_points_mat(
        os.path.join(out, "depth", "000001.mat"))
    assert pc.shape[1] == 6
    # the 2 m plane unprojects to y (depth axis after swap) == 2
    np.testing.assert_allclose(pc[:, 1], 2.0, atol=1e-3)
    np.testing.assert_allclose(pc[:, 3:], 128 / 255.0, atol=1e-2)

    # label line parses through the SUNObject3d reader
    objs = prep_sunrgbd.load_label_objects(
        os.path.join(out, "label_v1", "000001.txt"))
    assert len(objs) == 1 and objs[0].classname == "bed"
    np.testing.assert_allclose(objs[0].centroid, [0, 2.0, 0.5])
    np.testing.assert_allclose(
        [objs[0].l, objs[0].w, objs[0].h], [0.6, 0.9, 0.4])
    assert abs(objs[0].heading_angle) < 1e-6

    # full downstream extraction: box contains part of the plane -> votes
    res = prep_sunrgbd.extract_scene(root=out, data_idx=1, num_point=500,
                                     use_v1=True, rng=np.random.RandomState(0))
    assert res is not None
    pc_sub, obbs, votes = res
    assert obbs.shape == (1, 8) and obbs[0, 7] == 0
    mask = votes[:, 0] > 0
    assert mask.sum() > 0  # plane slice inside the box voted
    voted = pc_sub[mask, :3] + votes[mask, 1:4]
    np.testing.assert_allclose(voted, np.tile([0, 2.0, 0.5], (mask.sum(), 1)),
                               atol=1e-5)
