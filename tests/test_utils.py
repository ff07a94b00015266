"""Utils tests: TB event-file framing, logger files, PLY dump outputs,
axis-aligned metrics."""
import glob
import os
import struct

import numpy as np

from iou3dmatch_tpu.utils import Logger, TBWriter, Visualizer, dump_helper, metrics
from iou3dmatch_tpu.utils.tb_writer import _masked_crc
from iou3dmatch_tpu.data.config import get_config


def _read_records(path):
    data = open(path, "rb").read()
    off, recs = 0, []
    while off < len(data):
        hdr = data[off:off + 8]
        ln = struct.unpack("<Q", hdr)[0]
        assert struct.unpack("<I", data[off + 8:off + 12])[0] == _masked_crc(hdr)
        payload = data[off + 12:off + 12 + ln]
        assert struct.unpack(
            "<I", data[off + 12 + ln:off + 16 + ln]
        )[0] == _masked_crc(payload)
        recs.append(payload)
        off += 16 + ln
    return recs


def test_tb_writer_framing_and_scalars(tmp_path):
    w = TBWriter(str(tmp_path))
    w.scalar_summary("loss/total", 1.5, step=3)
    w.scalars({"a": 1.0, "b": 2.0}, step=4)
    w.histo_summary("h", np.random.randn(100), step=5)
    w.close()
    events = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(events) == 1
    recs = _read_records(events[0])
    assert len(recs) == 4  # file_version + 3 events
    assert b"brain.Event:2" in recs[0]
    assert b"loss/total" in recs[1]
    assert b"a" in recs[2] and b"b" in recs[2]


def test_visualizer_grouping(tmp_path):
    v = Visualizer(str(tmp_path), "train")
    v.log_scalars({"detection_loss": 1.0, "obj_acc": 0.5, "pos_ratio": 0.1,
                   "lr_value": 2e-3, "misc": 7.0}, step=1)
    v.close()
    events = glob.glob(str(tmp_path / "tb" / "train" / "events*"))
    payload = _read_records(events[0])[1]
    for tag in (b"loss/detection_loss", b"acc/obj_acc", b"ratio/pos_ratio",
                b"value/lr_value", b"other/misc"):
        assert tag in payload


def test_logger(tmp_path):
    lg = Logger(str(tmp_path))
    lg("hello")
    lg.log_best("best 1.0")
    lg.close()
    assert "hello" in open(tmp_path / "log_train.txt").read()
    assert "best 1.0" in open(tmp_path / "best.txt").read()


def test_dump_results(tmp_path):
    cfg = get_config("scannet")
    b, k, n, g = 1, 4, 64, 2
    rng = np.random.RandomState(0)
    ep = {
        "seed_xyz": rng.randn(b, 8, 3), "vote_xyz": rng.randn(b, 8, 3),
        "aggregated_vote_xyz": rng.randn(b, k, 3),
        "center": rng.randn(b, k, 3),
        "objectness_scores": np.tile([0.0, 5.0], (b, k, 1)),  # all confident
        "size": np.abs(rng.randn(b, k, 3)) + 0.1,
        "heading": np.zeros((b, k)),
    }
    batch = {
        "point_clouds": rng.randn(b, n, 4),
        "center_label": rng.randn(b, g, 3),
        "box_label_mask": np.ones((b, g)),
        "size_class_label": np.zeros((b, g), int),
        "size_residual_label": np.zeros((b, g, 3)),
        "heading_class_label": np.zeros((b, g), int),
        "heading_residual_label": np.zeros((b, g)),
    }
    d = str(tmp_path / "dump")
    dump_helper.dump_results(ep, batch, d, cfg)
    files = sorted(os.listdir(d))
    assert "000000_pc.ply" in files and "000000_pred_confident_bbox.ply" in files
    assert "000000_gt_bbox.ply" in files
    # box mesh: 8 verts and 12 faces per box
    txt = open(os.path.join(d, "000000_pred_confident_bbox.ply")).read()
    assert f"element vertex {8 * k}" in txt and f"element face {12 * k}" in txt


def test_metrics_precision_recall():
    """metric_util parity: 6-dim (center, lengths) boxes + conf column."""
    box = lambda c: np.array(list(c) + [1.0, 1.0, 1.0])
    gt = np.stack([box([0, 0, 0]), box([5, 5, 5])])
    # one hit, one miss, one below conf threshold
    pred = np.stack([
        np.append(box([0.1, 0, 0]), 0.9),
        np.append(box([9, 9, 9]), 0.9),
        np.append(box([5, 5, 5]), 0.1),
    ])
    tp, fp, fn = metrics.single_scene_precision_recall(gt, pred, 0.25, 0.5)
    assert (tp, fp, fn) == (1, 1, 1)
    assert metrics.precision_recall(tp, fp, fn) == (0.5, 0.5)
    TP, FP, FN, (prec, rec) = metrics.multi_scene_precision_recall(
        gt[None], pred[None], 0.25, 0.5, np.ones((1, 2)), np.ones((1, 3)))
    assert (TP, FP, FN) == (1, 1, 1) and prec == 0.5 and rec == 0.5
    # masking away the miss makes precision perfect
    _, FP2, _, (prec2, _) = metrics.multi_scene_precision_recall(
        gt[None], pred[None], 0.25, 0.5, np.ones((1, 2)),
        np.array([[1, 0, 1]]))
    assert FP2 == 0 and prec2 == 1.0
    assert metrics.calc_iou(box([0, 0, 0]), box([0, 0, 0])) == 1.0
    assert metrics.calc_iou(box([0, 0, 0]), box([0.5, 0, 0])) == 1 / 3


def test_tb_writer_images(tmp_path):
    """image_summary emits a parseable record per call (PNG-encoded)."""
    w = TBWriter(str(tmp_path))
    img = (np.arange(12 * 8 * 3).reshape(12, 8, 3) % 255).astype(np.uint8)
    w.image_summary("pc_views", [img, img * 0], step=3)
    w.close()
    import glob as _glob
    data = open(_glob.glob(str(tmp_path / "events.out*"))[0], "rb").read()
    assert b"pc_views/0" in data and b"pc_views/1" in data
    assert b"\x89PNG" in data  # png magic inside the record


def test_visualizer_log_images(tmp_path):
    v = Visualizer(str(tmp_path), "train")
    img = np.zeros((4, 4, 3), np.uint8)
    v.log_images({"seeds": [img]}, step=1)
    v.close()
