"""Learning-rate and BN-momentum schedules.

Mirrors the reference drivers: stairstep LR decay (train.py:246-258,
pretrain.py defaults lr 1e-3 x0.1 @400/600/800; SSL lr 2e-3
x0.3/0.3/0.1/0.1 @400/600/800/900) and the BN momentum decay
``max(0.5 * 0.5^(epoch // 20), 0.001)`` (train.py:231-236).

Both are evaluated host-side per epoch and fed into the jitted step as
traced scalars, so schedule changes never recompile.
"""
BN_MOMENTUM_INIT = 0.5
BN_MOMENTUM_MAX = 0.001


def get_lr(epoch, base_lr, decay_steps, decay_rates):
    lr = base_lr
    for step_epoch, rate in zip(decay_steps, decay_rates):
        if epoch >= step_epoch:
            lr *= rate
    return lr


def get_bn_momentum(epoch, decay_step=20, decay_rate=0.5):
    return max(BN_MOMENTUM_INIT * decay_rate ** (epoch // decay_step), BN_MOMENTUM_MAX)
