"""Data-layer tests: synthetic generator contract, loader/SSL batching,
ScanNet loader on a generated fake scan (real dumps are not in the image)."""
import os

import numpy as np
import pytest

from iou3dmatch_tpu.data.config import ScannetConfig, SunrgbdConfig
from iou3dmatch_tpu.data.loader import DataLoader, SSLBatcher, collate, prefetch
from iou3dmatch_tpu.data.synthetic import SyntheticDataset
from iou3dmatch_tpu.data.pc_util import random_sampling


def test_random_sampling_semantics():
    pc = np.arange(30).reshape(10, 3).astype(np.float32)
    np.random.seed(0)
    out = random_sampling(pc, 5)
    assert out.shape == (5, 3)
    # fewer points than requested -> sampling WITH replacement
    out2 = random_sampling(pc, 20)
    assert out2.shape == (20, 3)


def test_synthetic_contract():
    ds = SyntheticDataset("scannet", num_scenes=4, num_points=1024)
    d = ds[0]
    assert d["point_clouds"].shape == (1024, 4)
    assert d["center_label"].shape == (64, 3)
    assert d["vote_label"].shape == (1024, 9)
    assert d["box_label_mask"].sum() == 8
    # votes point to box centers for masked points
    m = d["vote_label_mask"] == 1
    voted = d["point_clouds"][m, :3] + d["vote_label"][m, :3]
    centers = d["center_label"][d["box_label_mask"] == 1]
    dmin = np.abs(voted[:, None, :] - centers[None]).sum(-1).min(1)
    assert dmin.max() < 1e-4


def test_loader_and_ssl_batcher():
    labeled = SyntheticDataset("scannet", num_scenes=8, num_points=256, ssl=True)
    unlabeled = SyntheticDataset(
        "scannet", num_scenes=12, num_points=256, ssl=True, labeled=False, seed=1
    )
    ll = DataLoader(labeled, batch_size=2, num_workers=2, seed=0)
    ul = DataLoader(unlabeled, batch_size=4, num_workers=2, seed=0)
    batcher = SSLBatcher(ll, ul)
    batches = list(prefetch(iter(batcher)))
    assert len(batches) == 4
    b = batches[0]
    # mixed batch: inputs have B_l + B_u rows, labels only B_l
    assert b["point_clouds"].shape[0] == 6
    assert b["ema_point_clouds"].shape[0] == 6
    assert b["center_label"].shape[0] == 2
    assert b["supervised_mask"].tolist() == [1, 1, 0, 0, 0, 0]


def test_scannet_dataset_on_fake_dump(tmp_path):
    """Exercise the real loader code path with a generated scan dump."""
    rng = np.random.RandomState(0)
    cfg = ScannetConfig()
    n = 5000
    verts = np.zeros((n, 6), np.float32)
    verts[:, :3] = rng.uniform(-3, 3, (n, 3))
    verts[:, 3:] = rng.uniform(0, 255, (n, 3))
    ins = np.zeros(n, np.int64)
    sem = np.zeros(n, np.int64)
    # two instances of nyu40 class 5 (chair)
    ins[:1000] = 1
    sem[:1000] = 5
    verts[:1000, :3] = rng.uniform(0, 1, (1000, 3))
    ins[1000:1800] = 2
    sem[1000:1800] = 7
    verts[1000:1800, :3] = rng.uniform(2, 3, (800, 3))
    bbox = np.zeros((2, 7))
    for i, (lo, hi) in enumerate([(0, 1000), (1000, 1800)]):
        mn = verts[lo:hi, :3].min(0)
        mx = verts[lo:hi, :3].max(0)
        bbox[i, :3] = (mn + mx) / 2
        bbox[i, 3:6] = mx - mn
    bbox[0, 6] = 5
    bbox[1, 6] = 7

    scan = "scene0000_00"
    np.save(tmp_path / f"{scan}_vert.npy", verts)
    np.save(tmp_path / f"{scan}_ins_label.npy", ins)
    np.save(tmp_path / f"{scan}_sem_label.npy", sem)
    np.save(tmp_path / f"{scan}_bbox.npy", bbox)

    from iou3dmatch_tpu.data.scannet import ScannetDetectionDataset

    np.random.seed(0)
    ds = ScannetDetectionDataset(
        str(tmp_path), split_set="all", num_points=2048,
        use_height=True, augment=True,
    )
    d = ds[0]
    assert d["point_clouds"].shape == (2048, 4)
    assert d["box_label_mask"].sum() == 2
    assert d["vote_label_mask"].sum() > 0
    # votes recomputed post-augment: voted centers match recomputed box centers
    m = d["vote_label_mask"] == 1
    voted = d["point_clouds"][m, :3] + d["vote_label"][m, :3]
    # each voted center should be near one of the (augmented) label centers
    centers = d["center_label"][d["box_label_mask"] == 1]
    dmin = np.linalg.norm(voted[:, None] - centers[None], axis=-1).min(1)
    assert np.percentile(dmin, 90) < 0.5  # AABB refit shifts centers slightly

    from iou3dmatch_tpu.data.scannet import ScannetSSLUnlabeledDataset
    (tmp_path / "meta").mkdir()
    with open(tmp_path / "meta" / "scannetv2_train.txt", "w") as f:
        f.write(scan + "\n")
    with open(tmp_path / "meta" / "labeled.txt", "w") as f:
        f.write(scan + "\n")
    uds = ScannetSSLUnlabeledDataset(
        str(tmp_path), str(tmp_path / "meta"), "labeled.txt",
        num_points=1024, use_height=True,
    )
    u = uds[0]
    assert u["point_clouds"].shape == (1024, 4)
    assert u["supervised_mask"] == 0
    assert u["rot_mat"].shape == (3, 3)
