"""Driver flag-surface parity: defaults must match the reference
(pretrain.py:41-70, train.py:31-71)."""
from iou3dmatch_tpu.cli import pretrain as cli_pretrain
from iou3dmatch_tpu.cli import train as cli_train


def test_pretrain_defaults_match_reference():
    a = cli_pretrain.parse_args([])
    assert a.num_point == 40000          # pretrain.py --num_point
    assert a.num_target == 128           # --num_target
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
    assert a.opt_rate == 0.01


def test_eval_flags_roundtrip():
    a = cli_train.parse_args([
        "--eval", "--use_iou_for_nms", "--opt_step", "10", "--opt_rate", "0.05",
    ])
    assert a.eval and a.use_iou_for_nms and a.opt_step == 10 and a.opt_rate == 0.05
