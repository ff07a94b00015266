"""Driver flag-surface parity: defaults must match the reference
(pretrain.py:41-70, train.py:31-71)."""
import pytest

from iou3dmatch_tpu.cli import pretrain as cli_pretrain
from iou3dmatch_tpu.cli import train as cli_train


def test_pretrain_defaults_match_reference():
    a = cli_pretrain.parse_args([])
    assert a.num_point == 40000          # pretrain.py --num_point
    # --num_target: None at the flag layer; the factory resolves it to the
    # reference default 128 (16 under --tiny) so an EXPLICIT 128 survives tiny
    assert a.num_target is None
    from iou3dmatch_tpu.models.factory import build_votenet
    assert build_votenet("scannet", num_proposal=a.num_target, tiny=False
                         )[0].num_proposal == 128
    assert a.cluster_sampling == "seed_fps"
    assert a.max_epoch == 901            # --max_epoch
    assert a.batch_size == 8             # --batch_size
    assert a.learning_rate == 1e-3       # --learning_rate
    assert a.lr_decay_steps == "400,600,800"
    assert a.bn_decay_step == 20 and a.bn_decay_rate == 0.5


def test_ssl_train_defaults_match_reference():
    a = cli_train.parse_args([])
    assert a.batch_size == "4,8"         # train.py --batch_size
    assert a.max_epoch == 1001
    assert a.learning_rate == 2e-3
    assert a.lr_decay_steps == "400,600,800,900"
    assert a.lr_decay_rates == "0.3,0.3,0.1,0.1"
    assert a.ema_decay == 0.999
    assert a.unlabeled_loss_weight == 2.0
    assert a.obj_threshold == 0.9 and a.cls_threshold == 0.9
    assert a.iou_threshold == 0.25
    assert a.opt_rate == 5e-4  # train.py:69 default


def test_full_reference_flag_surface():
    """Every reference driver flag parses (pretrain.py:41-70, train.py:31-71),
    including the vestigial ones carried for parity, and the knobs thread
    into CONFIG_DICT / dataset paths."""
    from iou3dmatch_tpu.cli.common import _sunrgbd_dir, make_config_dict
    from iou3dmatch_tpu.data import get_config

    a = cli_pretrain.parse_args([
        "--vote_factor", "2", "--use_sunrgbd_v2", "--iou_weight", "0.5",
        "--dump_dir", "/tmp/d", "--overwrite", "--ap_iou_thresh", "0.5",
    ])
    assert a.vote_factor == 2 and a.use_sunrgbd_v2 and a.overwrite
    assert a.dump_dir == "/tmp/d"
    cd = make_config_dict(get_config("scannet"), a)
    assert cd["iou_weight"] == 0.5            # pretrain.py:231
    assert _sunrgbd_dir(a, "train") == "sunrgbd_pc_bbox_votes_50k_v2_train"

    t = cli_train.parse_args([
        "--conf_thresh", "0.1", "--model", "votenet", "--vote_factor", "3",
        "--ap_iou_thresh", "0.5",
    ])
    assert t.conf_thresh == 0.1 and t.vote_factor == 3
    cd = make_config_dict(get_config("scannet"), t)
    assert cd["conf_thresh"] == 0.1           # train.py:268
    assert _sunrgbd_dir(t, "val") == "sunrgbd_pc_bbox_votes_50k_v1_val"


def test_eval_flags_roundtrip():
    a = cli_train.parse_args([
        "--eval", "--use_iou_for_nms", "--opt_step", "10", "--opt_rate", "0.05",
    ])
    assert a.eval and a.use_iou_for_nms and a.opt_step == 10 and a.opt_rate == 0.05


@pytest.mark.slow
def test_driver_chain_pretrain_ssl_eval(tmp_path):
    """End-to-end CLI smoke on synthetic data (CPU, tiny model): the
    pretrain driver trains+evals+checkpoints, the SSL driver loads the
    stage-1 checkpoint into student+teacher and trains, and the eval-only
    mode with test-time IoU optimization (--opt_step) runs the full AP
    pipeline. Mirrors the reference run_pretrain.sh -> run_train.sh ->
    run_eval_opt.sh sequence."""
    import os

    from iou3dmatch_tpu.cli import pretrain as cli_pretrain
    from iou3dmatch_tpu.cli import train as cli_train

    pre_dir = str(tmp_path / "log_pretrain")
    # The SSL driver's --batch_size is PER-DEVICE (global = per_device x
    # n_devices); under the conftest's 8 virtual CPU devices "1,2" means a
    # global batch of 8+16, so 8 labeled (+16 unlabeled) synthetic scenes
    # are needed for >=1 real step per epoch (drop_last).
    common = [
        "--synthetic", "--synthetic_scenes", "8", "--tiny",
        "--num_point", "512", "--num_target", "16", "--num_workers", "2",
        "--bn_decay_step", "1",
    ]
    cli_pretrain.main([
        "--log_dir", pre_dir, "--batch_size", "2", "--max_epoch", "2",
        "--eval_interval", "2", "--print_interval", "1",
    ] + common)
    ckpt = os.path.join(pre_dir, "checkpoint.tar")
    assert os.path.exists(ckpt)
    log = open(os.path.join(pre_dir, "log_train.txt")).read()
    assert "loss" in log and "mAP" in log

    ssl_dir = str(tmp_path / "log_ssl")
    cli_train.main([
        "--log_dir", ssl_dir, "--detector_checkpoint", ckpt,
        "--batch_size", "1,2", "--max_epoch", "1",
        "--eval_interval", "5", "--print_interval", "1",
    ] + common)
    assert os.path.exists(os.path.join(ssl_dir, "checkpoint.tar"))
    ssl_log = open(os.path.join(ssl_dir, "log_train.txt")).read()
    assert "unsupervised_loss" in ssl_log or "loss" in ssl_log

    # eval-only with IoU-guided NMS + 2-step test-time IoU optimization
    cli_train.main([
        "--log_dir", ssl_dir, "--resume", "--eval", "--use_iou_for_nms",
        "--opt_step", "2", "--opt_rate", "0.01", "--batch_size", "1,2",
    ] + common)
    ssl_log = open(os.path.join(ssl_dir, "log_train.txt")).read()
    assert "mAP" in ssl_log
