"""Point-cloud sampling utilities (host side).

Mirrors `utils/pc_util.py:35-43` (random_sampling — sampling WITH
replacement iff the cloud has fewer points than requested) and `:287-321`
(rotz).
"""
import numpy as np


def random_sampling(pc, num_sample, replace=None, return_choices=False, rng=None):
    """pc: (N, C) -> (num_sample, C)."""
    if replace is None:
        replace = pc.shape[0] < num_sample
    rng = rng if rng is not None else np.random
    choices = rng.choice(pc.shape[0], num_sample, replace=replace)
    if return_choices:
        return pc[choices], choices
    return pc[choices]


def rotz(t):
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
