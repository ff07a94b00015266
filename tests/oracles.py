"""Independent NumPy oracles mirroring the reference CUDA kernel semantics.

These are hand-written ports of the *behavior* documented in SURVEY.md §2.1
(seed index 0 / magnitude skip for FPS, first-found scan order for ball
query, etc.), used for differential testing of the JAX/Pallas ops.
"""
import numpy as np


def fps_oracle(xyz: np.ndarray, npoint: int) -> np.ndarray:
    """xyz: (N, 3). Mirrors sampling_gpu.cu:75-178."""
    n = xyz.shape[0]
    valid = (xyz**2).sum(-1) > 1e-3
    mindist = np.full((n,), 1e10, dtype=np.float32)
    idxs = np.zeros((npoint,), dtype=np.int32)
    old = 0
    for j in range(1, npoint):
        p = xyz[old]
        d = ((xyz - p) ** 2).sum(-1).astype(np.float32)
        mindist = np.where(valid, np.minimum(mindist, d), mindist)
        best = -1.0
        besti = 0
        for k in range(n):
            if not valid[k]:
                continue
            if mindist[k] > best:
                best = mindist[k]
                besti = k
        idxs[j] = besti
        old = besti
    return idxs


def ball_query_oracle(
    radius: float, nsample: int, xyz: np.ndarray, new_xyz: np.ndarray
) -> np.ndarray:
    """xyz: (N, 3), new_xyz: (m, 3). Mirrors ball_query_gpu.cu:14-58."""
    m = new_xyz.shape[0]
    n = xyz.shape[0]
    r2 = radius * radius
    idx = np.zeros((m, nsample), dtype=np.int32)
    for j in range(m):
        cnt = 0
        for k in range(n):
            if cnt >= nsample:
                break
            d2 = ((new_xyz[j] - xyz[k]) ** 2).sum()
            if d2 < r2:
                if cnt == 0:
                    idx[j, :] = k
                idx[j, cnt] = k
                cnt += 1
    return idx


def three_nn_oracle(unknown: np.ndarray, known: np.ndarray):
    """unknown: (n, 3), known: (m, 3). Mirrors interpolate_gpu.cu:14-74."""
    d2 = ((unknown[:, None, :] - known[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1, kind="stable")[:, :3].astype(np.int32)
    dist = np.sqrt(np.take_along_axis(d2, idx, axis=1))
    return dist, idx
