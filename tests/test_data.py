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


def test_process_worker_loader():
    """Fork-based process workers: same batches as the thread pool for a
    deterministic dataset, reproducible across fresh loaders (per-(epoch,
    index) sample seeds), thread fallback for unpicklable datasets."""
    ds = SyntheticDataset("scannet", num_scenes=6, num_points=128)
    lp = DataLoader(ds, batch_size=2, num_workers=2, seed=3,
                    worker_type="process")
    lt = DataLoader(ds, batch_size=2, num_workers=2, seed=3,
                    worker_type="thread")
    bp, bt = list(iter(lp)), list(iter(lt))
    assert lp.worker_type == "process"
    assert len(bp) == len(bt) == 3
    for a, b in zip(bp, bt):
        for k in a:
            # SyntheticDataset is RNG-free per index -> identical content
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    # reproducibility: a fresh process loader yields the same epoch
    lp2 = DataLoader(ds, batch_size=2, num_workers=2, seed=3,
                     worker_type="process")
    for a, b in zip(bp, list(iter(lp2))):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    lp.close(), lt.close(), lp2.close()

    import threading

    class Unpicklable:
        def __init__(self):
            self.lock = threading.Lock()  # defeats pickling for sure

        def __len__(self):
            return 2

        def __getitem__(self, i):
            with self.lock:
                return {"x": np.full(3, i)}

    # fork inherits the dataset without pickling it — even an unpicklable
    # dataset works under process workers (the thread fallback only kicks
    # in where fork itself is unavailable)
    lu = DataLoader(Unpicklable(), batch_size=1, num_workers=2,
                    worker_type="process", shuffle=False)
    batches = list(iter(lu))
    assert batches[0]["x"].tolist() == [[0, 0, 0]]
    assert batches[1]["x"].tolist() == [[1, 1, 1]]
    lu.close()


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


def _fake_sunrgbd_dump(tmp_path, rng):
    """One SUN RGB-D scene dump: a 'bed' box with half-extents on disk."""
    n = 4000
    center = np.array([1.0, 3.0, 0.4])
    half = np.array([1.1, 0.9, 0.35])
    heading = 0.5
    pc = np.zeros((n, 6), np.float32)
    pc[:, :3] = rng.uniform(-4, 4, (n, 3))
    pc[:, 3:] = rng.uniform(0, 1, (n, 3))
    # points inside the box (for votes)
    c, s = np.cos(-heading), np.sin(-heading)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    local = rng.uniform(-1, 1, (800, 3)) * half * 0.9
    pc[:800, :3] = local @ rot.T + center

    bbox = np.zeros((1, 8))
    bbox[0, :3] = center
    bbox[0, 3:6] = half  # HALF extents on disk (sunrgbd convention)
    bbox[0, 6] = heading
    bbox[0, 7] = 0  # bed

    votes = np.zeros((n, 10), np.float32)
    votes[:800, 0] = 1
    v = center - pc[:800, :3]
    votes[:800, 1:4] = v
    votes[:800, 4:7] = v
    votes[:800, 7:10] = v

    np.savez_compressed(tmp_path / "000001_pc.npz", pc=pc)
    np.save(tmp_path / "000001_bbox.npy", bbox)
    np.savez_compressed(tmp_path / "000001_votes.npz", point_votes=votes)
    return center, half, heading


def test_sunrgbd_dataset_on_fake_dump(tmp_path):
    """Real SUN RGB-D loader path: half-extent x2 size classes, heading
    binning, vote consistency (sunrgbd_detection_dataset.py:43-246)."""
    from iou3dmatch_tpu.data.sunrgbd import SunrgbdDetectionVotesDataset
    from iou3dmatch_tpu.data.config import SunrgbdConfig

    rng = np.random.RandomState(1)
    center, half, heading = _fake_sunrgbd_dump(tmp_path, rng)
    cfg = SunrgbdConfig()

    np.random.seed(0)
    ds = SunrgbdDetectionVotesDataset(str(tmp_path), num_points=2048,
                                      use_height=True, augment=False)
    assert len(ds) == 1
    d = ds[0]
    assert d["point_clouds"].shape == (2048, 4)
    assert d["box_label_mask"].sum() == 1
    np.testing.assert_allclose(d["center_label"][0], center, atol=1e-5)
    # size class from FULL extents (half * 2), residual reconstructs them
    full = cfg.mean_size_arr[d["size_class_label"][0]] + d["size_residual_label"][0]
    np.testing.assert_allclose(full, half * 2, atol=1e-5)
    # heading binning round-trips
    ang = cfg.class2angle(int(d["heading_class_label"][0]),
                          float(d["heading_residual_label"][0]))
    assert abs(((ang - heading) + np.pi) % (2 * np.pi) - np.pi) < 1e-5
    # votes point at the centroid
    mask = d["vote_label_mask"] > 0
    assert mask.sum() > 0
    voted = d["point_clouds"][mask, :3] + d["vote_label"][mask, :3]
    np.testing.assert_allclose(voted, np.tile(center, (mask.sum(), 1)), atol=1e-5)


def test_sunrgbd_ssl_datasets_on_fake_dump(tmp_path):
    """SSL labeled/unlabeled SUN RGB-D loaders: aug params present, x-flip
    only (flip_y always 0), unlabeled raw-frame labels with load_labels."""
    from iou3dmatch_tpu.data.sunrgbd import (
        SunrgbdSSLLabeledDataset, SunrgbdSSLUnlabeledDataset)

    rng = np.random.RandomState(2)
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    _fake_sunrgbd_dump(data_dir, rng)
    split_dir = tmp_path / "split"
    split_dir.mkdir()
    (split_dir / "labeled.txt").write_text("000001\n")

    np.random.seed(1)
    lab = SunrgbdSSLLabeledDataset(str(data_dir), str(split_dir), "labeled.txt",
                                   num_points=1024, use_height=True)
    d = lab[0]
    for k in ("ema_point_clouds", "flip_x_axis", "flip_y_axis", "rot_mat",
              "rot_angle", "scale", "center_label"):
        assert k in d, k
    assert int(d["supervised_mask"]) == 1

    # unlabeled = all scans (len == labeled list -> keep all), with labels
    unl = SunrgbdSSLUnlabeledDataset(str(data_dir), str(split_dir), "labeled.txt",
                                     num_points=1024, use_height=True,
                                     load_labels=True)
    du = unl[0]
    assert int(du["supervised_mask"]) == 0
    assert int(du["flip_y_axis"]) == 0  # sunrgbd never y-flips
    assert "center_label" in du and du["box_label_mask"].sum() == 1


def test_data_viz_cli(tmp_path, capsys):
    """data_viz dumps colored PLYs for a prepped scene (scannet/data_viz.py)."""
    rng = np.random.RandomState(1)
    n = 500
    verts = np.zeros((n, 6), np.float32)
    verts[:, :3] = rng.uniform(-2, 2, (n, 3))
    verts[:, 3:] = rng.uniform(0, 255, (n, 3))
    scan = str(tmp_path / "scene0002_00")
    np.save(scan + "_vert.npy", verts)
    np.save(scan + "_ins_label.npy", rng.randint(0, 4, n))
    np.save(scan + "_sem_label.npy", rng.randint(0, 40, n))
    bbox = np.array([[0, 0, 0, 1, 1, 1, 5.0], [1, 1, 1, 0.5, 0.5, 0.5, 7.0]])
    np.save(scan + "_bbox.npy", bbox)

    from iou3dmatch_tpu.cli.data_viz import main

    out = str(tmp_path / "viz")
    assert main([scan, out]) == 0
    for name in ("scene", "scene_instance", "scene_semantic", "scene_bbox"):
        p = os.path.join(out, name + ".ply")
        assert os.path.exists(p)
        head = open(p).read(200)
        assert head.startswith("ply")
    # colored dumps carry uchar rgb properties
    assert "uchar red" in open(os.path.join(out, "scene_semantic.ply")).read(400)


def test_dataset_viz_helpers(tmp_path):
    """viz_votes / viz_obb dump parseable PLYs for both datasets
    (scannet_detection_dataset.py:262-296, sunrgbd_detection_dataset.py:248-286)."""
    from iou3dmatch_tpu.data import scannet as sc
    from iou3dmatch_tpu.data import sunrgbd as su

    rng = np.random.RandomState(0)
    pc = rng.randn(100, 3).astype(np.float32)
    votes = rng.randn(100, 9).astype(np.float32) * 0.1
    mask = (rng.rand(100) > 0.5).astype(np.float32)
    d = str(tmp_path)
    sc.viz_votes(pc, votes, mask, name="_t", out_dir=d)
    assert (tmp_path / "pc_obj_t.ply").exists()
    assert (tmp_path / "pc_obj_voted1_t.ply").exists()
    su.viz_votes(pc, votes, mask, out_dir=d)
    assert (tmp_path / "pc_obj_voted3.ply").exists()

    label = rng.uniform(-2, 2, (4, 3))
    bmask = np.array([1, 1, 0, 1])
    acls = np.zeros(4, int)
    ares = np.zeros(4)
    scls = np.array([0, 1, 2, 3])
    sres = np.zeros((4, 3))
    sc.viz_obb(pc, label, bmask, acls, ares, scls, sres, name="_t", out_dir=d)
    txt = (tmp_path / "gt_obbs_t.ply").read_text()
    assert f"element vertex {8 * 3}" in txt  # 3 unmasked boxes
    su.viz_obb(pc, label, bmask, acls, ares, scls, sres, out_dir=d)
    assert (tmp_path / "gt_obbs.ply").exists()
    assert (tmp_path / "gt_centroids.ply").exists()


def test_sunrgbd_sem_cls_statistics():
    """Counts masked boxes per class (fixes the reference's index bug,
    sunrgbd_detection_dataset.py:288-303)."""
    from iou3dmatch_tpu.data.sunrgbd import get_sem_cls_statistics

    fake = [
        {"sem_cls_label": np.array([0, 3, 3, 9]),
         "box_label_mask": np.array([1, 1, 1, 0])},
        {"sem_cls_label": np.array([3, 5]),
         "box_label_mask": np.array([0, 1])},
    ]
    cnt = get_sem_cls_statistics(fake)
    assert cnt == {0: 1, 3: 2, 5: 1}


def test_represents_int_and_mapping(tmp_path):
    """scannet_utils parity: numeric-key TSVs come back with int keys."""
    from iou3dmatch_tpu.data.prep_scannet import (
        read_label_mapping, represents_int)

    assert represents_int("42") and not represents_int("4x")
    p = tmp_path / "m.tsv"
    p.write_text("raw_category\tnyu40id\nchair\t5\ntable\t7\n")
    m = read_label_mapping(str(p))
    assert m == {"chair": 5, "table": 7}
    p2 = tmp_path / "m2.tsv"
    p2.write_text("nyu40id\tid\n5\t1\n7\t2\n")
    m2 = read_label_mapping(str(p2), label_from="nyu40id", label_to="id")
    assert m2 == {5: 1, 7: 2}  # int keys, scannet_utils.py:41-42


def test_prefetch_propagates_producer_exception():
    """A dying producer must re-raise in the consumer, not hang q.get()."""
    from iou3dmatch_tpu.data.loader import prefetch

    def gen():
        yield 1
        raise ValueError("boom")

    it = prefetch(gen())
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_sslbatcher_empty_unlabeled_loader_errors():
    """batch_size > len(unlabeled dataset) with drop_last yields zero
    batches; cycling must fail loudly instead of spinning forever."""
    from iou3dmatch_tpu.data.loader import DataLoader, SSLBatcher

    class Tiny:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            return {"point_clouds": np.zeros((8, 4), np.float32)}

    labeled = DataLoader(Tiny(), 2, num_workers=0, worker_type="thread")
    unlabeled = DataLoader(Tiny(), 4, num_workers=0, worker_type="thread")
    with pytest.raises(RuntimeError, match="no batches"):
        next(iter(SSLBatcher(labeled, unlabeled)))
