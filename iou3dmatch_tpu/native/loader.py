"""Native (C++) host-side loader kernels: vote labels + floor percentile.

Backs the two largest deterministic costs of a ScanNet scene load
(PERF.md "Host data pipeline") with ``libloader_host.so`` (built on first
use with g++, bound via ctypes). Every RNG draw stays in NumPy, so the
np.random stream — and bit-for-bit ``__getitem__`` parity with the
reference (tests/test_reference_diff.py) — is unchanged; these kernels are
pure functions whose outputs are bit-identical to the NumPy forms they
replace. Falls back silently to NumPy when no compiler is available.
Opt out with ``IOU3DMATCH_NO_NATIVE_LOADER=1``.
"""
import ctypes
import os
import subprocess
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "loader_host.cc")
_LIB = os.path.join(_HERE, "libloader_host.so")
_lib = None
_load_failed = False

_I64P = ctypes.POINTER(ctypes.c_int64)
_F32P = ctypes.POINTER(ctypes.c_float)
_F64P = ctypes.POINTER(ctypes.c_double)


def _build():
    # Build to a temp file + atomic rename: fork-based loader workers may
    # race on first use. -ffp-contract=off forbids FMA contraction, which
    # would change rounding vs NumPy's per-op float semantics.
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_HERE)
    os.close(fd)
    try:
        subprocess.run(
            ["g++", "-O3", "-ffp-contract=off", "-shared", "-fPIC",
             "-o", tmp, _SRC],
            check=True, capture_output=True,
        )
        os.replace(tmp, _LIB)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load():
    """Returns the ctypes lib, building it if needed; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if os.environ.get("IOU3DMATCH_NO_NATIVE_LOADER"):
        _load_failed = True
        return None
    try:
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            _build()
        lib = ctypes.CDLL(_LIB)
        for name, xyz_p in (("scannet_votes_f32", _F32P),
                            ("scannet_votes_f64", _F64P)):
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = [xyz_p, ctypes.c_int64, _I64P, _I64P, _I64P,
                           ctypes.c_int64, _F64P, _F64P]
        for name, p in (("order2_f32", _F32P), ("order2_f64", _F64P)):
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = [p, ctypes.c_int64, ctypes.c_int64,
                           ctypes.c_int64, p]
        _lib = lib
        if not _percentile_self_check():
            # percentile_native mirrors NumPy's PRIVATE quantile internals
            # (float32 virtual-index/gamma dtype, two-branch lerp); a NumPy
            # upgrade could silently change them. Byte-compare on fixed
            # vectors once per process and fall back to NumPy on mismatch
            # so dataset bit-parity never rests on a stale mirror.
            _lib = None
            _load_failed = True
    except Exception:
        _load_failed = True
    return _lib


def _percentile_self_check() -> bool:
    """Byte-compare percentile_native vs np.percentile at the ONE quantile
    production uses (q=0.99, the reference's floor-height percentile,
    scannet_detection_dataset.py:127 / sunrgbd_detection_dataset.py:119).
    The mirror's bit guarantee is scoped to that q — other quantiles can
    legitimately differ in the virtual-index rounding path."""
    rng = np.random.RandomState(20260819)
    for dtype in (np.float32, np.float64):
        for n in (7, 100, 4096, 40000):
            z = (rng.randn(n) * 3 + 1).astype(dtype)
            z = np.where(z == 0, dtype(0.125), z)  # avoid the ±0 defer path
            ours = percentile_native(z, 0.99)
            if ours is None:
                return False
            ref = np.percentile(z, 0.99)
            if (np.asarray(ours).dtype != np.asarray(ref).dtype
                    or np.asarray(ours).tobytes() != np.asarray(ref).tobytes()):
                return False
    return True


def compute_votes_native(point_cloud, instance_labels, semantic_labels,
                         valid_ids):
    """(N,3) float64 votes + (N,) float64 mask with the reference loop's
    semantics (scannet_detection_dataset.py:182-193); None if unavailable.

    Bit-identical to data/scannet.py::_compute_votes's NumPy form: min/max
    are order-independent, 0.5*(min+max) and center-xyz are the same single
    rounded ops in the point cloud's own dtype, group validity uses the
    first occurrence's semantic label.
    """
    lib = load()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(point_cloud[:, :3])
    if xyz.dtype == np.float32:
        fn, ptr = lib.scannet_votes_f32, _F32P
    elif xyz.dtype == np.float64:
        fn, ptr = lib.scannet_votes_f64, _F64P
    else:
        return None
    n = xyz.shape[0]
    ins = np.ascontiguousarray(instance_labels, dtype=np.int64)
    sem = np.ascontiguousarray(semantic_labels, dtype=np.int64)
    vid = np.ascontiguousarray(valid_ids, dtype=np.int64)
    votes = np.zeros((n, 3), np.float64)
    mask = np.zeros(n, np.float64)
    fn(xyz.ctypes.data_as(ptr), n,
       ins.ctypes.data_as(_I64P), sem.ctypes.data_as(_I64P),
       vid.ctypes.data_as(_I64P), vid.shape[0],
       votes.ctypes.data_as(_F64P), mask.ctypes.data_as(_F64P))
    return votes, mask


def percentile_native(z, q):
    """np.percentile(z, q) (1-D, linear method) via native selection; None
    if unavailable. Exact NumPy 2.x semantics: for float32 input the
    virtual index and interpolation run in float32 (quantile is cast to
    the array dtype), for float64 in float64; the two order statistics are
    exact array elements from nth_element. Verified bit-identical by
    randomized tests (tests/test_native.py)."""
    lib = load()
    if lib is None or z.ndim != 1 or z.shape[0] == 0:
        return None
    n = z.shape[0]
    if z.dtype == np.float32:
        fn, ptr = lib.order2_f32, _F32P
        q_ = np.float32(np.true_divide(q, 100))
        vi = np.float32(n - 1) * q_
        one = np.float32(1)
    elif z.dtype == np.float64:
        fn, ptr = lib.order2_f64, _F64P
        q_ = np.true_divide(q, 100)
        vi = q_ * (n - 1)
        one = np.float64(1)
    else:
        return None
    if not (0 <= vi <= n - 1):  # out-of-range q or NaN — let NumPy handle
        return None
    if np.isnan(z).any():  # nth_element with NaN is UB; NumPy propagates
        return None
    lo = int(np.floor(vi))
    hi = min(lo + 1, n - 1)
    zc = np.ascontiguousarray(z)
    out2 = np.empty(2, z.dtype)
    fn(zc.ctypes.data_as(ptr), n, lo, hi, out2.ctypes.data_as(ptr))
    a, b = out2[0], out2[1]
    if a == 0 or b == 0:
        # ±0.0 are equal to every comparison-based selection, so WHICH zero
        # lands at the order statistic depends on partition tie order —
        # NumPy's introselect and std::nth_element may pick different signs
        # and the sign propagates into the height channel. Exact zeros at
        # the percentile are a degenerate case: defer to NumPy.
        return None
    t = vi - np.floor(vi)
    diff = np.subtract(b, a)
    if t < 0.5:
        return a + diff * t
    return b - diff * (one - t)
