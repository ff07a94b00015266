"""Offline data-prep tests: PLY round-trip, ScanNet export from synthetic
raw scans, SUN RGB-D export from synthetic matlab dumps, split generation."""
import json
import os
import struct

import numpy as np
import pytest

from iou3dmatch_tpu.data import ply as ply_mod
from iou3dmatch_tpu.data import prep_scannet, prep_sunrgbd, gen_split
from iou3dmatch_tpu.data.config import get_config


def _write_binary_ply(path, xyz, rgb):
    n = len(xyz)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "property uchar alpha\nend_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        for p, c in zip(xyz, rgb):
            f.write(struct.pack("<fffBBBB", *p, *c, 255))


def test_ply_reader_binary_and_ascii(tmp_path):
    xyz = np.random.RandomState(0).randn(50, 3).astype(np.float32)
    rgb = np.random.RandomState(1).randint(0, 255, (50, 3))
    binp = str(tmp_path / "bin.ply")
    _write_binary_ply(binp, xyz, rgb)
    v = ply_mod.read_mesh_vertices_rgb(binp)
    np.testing.assert_allclose(v[:, :3], xyz, rtol=1e-6)
    np.testing.assert_array_equal(v[:, 3:6], rgb)

    ascp = str(tmp_path / "asc.ply")
    with open(ascp, "w") as f:
        f.write("ply\nformat ascii 1.0\nelement vertex 2\n"
                "property float x\nproperty float y\nproperty float z\n"
                "end_header\n1.0 2.0 3.0\n4.0 5.0 6.0\n")
    v = ply_mod.read_mesh_vertices(ascp)
    np.testing.assert_allclose(v, [[1, 2, 3], [4, 5, 6]])


def _make_fake_scan(root, scan_name):
    d = os.path.join(root, scan_name)
    os.makedirs(d)
    rng = np.random.RandomState(3)
    # two instances: a "chair" cluster (nyu40 5) and a "wall" (1, ignored)
    chair = rng.uniform(0, 1, (40, 3)) + [2, 2, 0]
    wall = rng.uniform(0, 1, (40, 3))
    xyz = np.concatenate([chair, wall]).astype(np.float32)
    rgb = np.full((80, 3), 128)
    _write_binary_ply(os.path.join(d, scan_name + "_vh_clean_2.ply"), xyz, rgb)
    # segmentation: each vertex its own segment for simplicity
    with open(os.path.join(d, scan_name + "_vh_clean_2.0.010000.segs.json"), "w") as f:
        json.dump({"segIndices": list(range(80))}, f)
    with open(os.path.join(d, scan_name + ".aggregation.json"), "w") as f:
        json.dump({"segGroups": [
            {"objectId": 0, "label": "chair", "segments": list(range(40))},
            {"objectId": 1, "label": "wall", "segments": list(range(40, 80))},
        ]}, f)
    with open(os.path.join(d, scan_name + ".txt"), "w") as f:
        mat = " ".join(str(float(v)) for v in np.eye(4).ravel())
        f.write(f"axisAlignment = {mat}\n")
    # label map tsv
    tsv = os.path.join(root, "labels.tsv")
    with open(tsv, "w") as f:
        f.write("raw_category\tnyu40id\nchair\t5\nwall\t1\n")
    return tsv


def test_scannet_export(tmp_path):
    root = str(tmp_path)
    tsv = _make_fake_scan(root, "scene0000_00")
    out_dir = os.path.join(root, "out")
    os.makedirs(out_dir)
    prefix = os.path.join(out_dir, "scene0000_00")
    prep_scannet.export_one_scan(root, "scene0000_00", tsv, prefix,
                                 np.random.RandomState(0))
    verts = np.load(prefix + "_vert.npy")
    sem = np.load(prefix + "_sem_label.npy")
    ins = np.load(prefix + "_ins_label.npy")
    bboxes = np.load(prefix + "_bbox.npy")
    assert verts.shape == (80, 6)
    assert sem.shape == (80,) and set(sem) == {5, 1}
    assert ins.shape == (80,) and set(ins) == {1, 2}
    # only the chair (nyu40 5) is a detection class
    assert bboxes.shape == (1, 7) and bboxes[0, -1] == 5
    chair_pts = verts[ins == 1, :3]
    np.testing.assert_allclose(
        bboxes[0, :3], (chair_pts.min(0) + chair_pts.max(0)) / 2, atol=1e-5)

    # split generation over this one-scene "dataset"
    split_file = os.path.join(root, "train.txt")
    with open(split_file, "w") as f:
        f.write("scene0000_00\n")
    cfg = get_config("scannet")
    m = gen_split.scan_class_matrix_scannet(["scene0000_00"], out_dir, cfg)
    assert m[0, cfg.nyu40id2class[5]] == 1 and m.sum() == 1


def test_sunrgbd_export(tmp_path):
    import scipy.io as sio

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "depth"))
    os.makedirs(os.path.join(root, "label_v1"))
    rng = np.random.RandomState(4)
    # a bed at (1, 2, 0.5) with half-size (1.0, 0.8, 0.4), heading 0.3
    center, half = np.array([1.0, 2.0, 0.5]), (1.0, 0.8, 0.4)
    inside = rng.uniform(-1, 1, (200, 3)) * np.array(half) * 0.9
    rot = prep_sunrgbd.rotz(-0.3)
    # my_compute_box_3d rotates by rotz(-heading): box frame -> world
    inside = inside @ rot.T + center
    outside = rng.uniform(5, 8, (200, 3))
    pc = np.concatenate([
        np.concatenate([inside, outside]),
        rng.uniform(0, 1, (400, 3)),
    ], axis=1)
    sio.savemat(os.path.join(root, "depth", "000001.mat"), {"instance": pc})
    with open(os.path.join(root, "label_v1", "000001.txt"), "w") as f:
        ox, oy = np.cos(-0.3), np.sin(-0.3)
        f.write(f"bed 0 0 10 10 {center[0]} {center[1]} {center[2]} "
                f"{half[0]} {half[1]} {half[2]} {ox} {oy}\n")

    out = prep_sunrgbd.extract_scene(root, 1, num_point=400, use_v1=True,
                                     rng=np.random.RandomState(0))
    assert out is not None
    pc_sub, obbs, votes = out
    assert pc_sub.shape == (400, 6)
    assert obbs.shape == (1, 8)
    np.testing.assert_allclose(obbs[0, :3], center)
    np.testing.assert_allclose(obbs[0, 6], 0.3)
    assert obbs[0, 7] == 0  # bed
    # points inside the box vote toward the centroid
    mask = votes[:, 0] > 0
    assert mask.sum() > 0
    voted = pc_sub[mask, :3] + votes[mask, 1:4]
    np.testing.assert_allclose(voted, np.tile(center, (mask.sum(), 1)), atol=1e-6)
    # the three vote slots of single-object points are identical
    np.testing.assert_allclose(votes[mask, 1:4], votes[mask, 4:7])
    np.testing.assert_allclose(votes[mask, 1:4], votes[mask, 7:10])
