"""Packed host→device batch staging.

The reference moves a batch to the GPU as one ``.to(device)`` per tensor
(reference pretrain.py:317-318, train.py:329-332) — ~15 small transfers per
step. On JAX backends each leaf of a host batch fed to a jitted step is a
separate device_put; on links where per-transfer latency matters (the
tunneled dev TPU pays ~27 ms RTT per transfer; even on a real host each put
is a dispatch) that overhead is per-leaf.

This module packs every 4-byte-dtype leaf of a batch into ONE int32 word
buffer on the host (bit-preserving views, no value conversion), ships it as
a single device_put, and slices/bitcasts the leaves back out in a tiny
jitted unpack program (device-side slices of a ~16 MB buffer are HBM-rate
copies, ~20 µs). Leaves whose dtype can't be word-packed (rare: bools,
strings) fall back to individual transfer.

Integer leaves are downcast int64→int32 / uint8→int32 on the host first —
identical to what jnp.asarray would produce anyway under JAX's default
x64-disabled config, just done before packing instead of during transfer.

Usage:
    packed = pack_batch(batch)          # host side (cheap memcpy) — safe to
                                        # run inside the prefetch thread
    batch_dev = stage(packed)           # ONE device_put + jitted unpack
or the convenience one-call form ``stage_batch(batch)``.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import numpy as np

__all__ = ["pack_batch", "stage", "stage_batch"]

# dtypes we word-pack (4-byte after the host-side downcast)
_DOWNCAST = {
    np.dtype(np.int64): np.int32,
    np.dtype(np.uint64): np.uint32,
    np.dtype(np.float64): np.float32,
}
_PACKABLE = {np.dtype(np.float32), np.dtype(np.int32), np.dtype(np.uint32)}


def pack_batch(batch: Dict[str, Any]) -> Tuple[np.ndarray, tuple, dict]:
    """Pack a host batch into (int32 word buffer, static meta, leftovers).

    ``meta`` is a hashable tuple — one compiled unpack program per distinct
    batch spec. ``leftovers`` holds non-packable leaves untouched.
    """
    words = []
    meta = []
    leftovers = {}
    offset = 0
    for k in sorted(batch.keys()):
        v = batch[k]
        if not hasattr(v, "shape"):
            leftovers[k] = v
            continue
        a = np.asarray(v)
        if a.dtype in _DOWNCAST:
            a = a.astype(_DOWNCAST[a.dtype])
        if a.dtype not in _PACKABLE or a.size == 0:
            leftovers[k] = v
            continue
        flat = np.ascontiguousarray(a).reshape(-1).view(np.int32)
        words.append(flat)
        meta.append((k, a.shape, a.dtype.str, offset, flat.size))
        offset += flat.size
    buf = (np.concatenate(words) if words
           else np.zeros((0,), np.int32))
    return buf, tuple(meta), leftovers


@functools.lru_cache(maxsize=32)
def _unpack_fn(meta: tuple):
    import jax
    import jax.numpy as jnp
    from jax import lax

    def unpack(buf):
        out = {}
        for k, shape, dtype_str, off, n in meta:
            seg = lax.slice(buf, (off,), (off + n,))
            dt = np.dtype(dtype_str)
            if dt != np.dtype(np.int32):
                seg = lax.bitcast_convert_type(seg, jnp.dtype(dt))
            out[k] = seg.reshape(shape)
        return out

    return jax.jit(unpack)


def stage(packed: Tuple[np.ndarray, tuple, dict]) -> Dict[str, Any]:
    """ONE device_put of the word buffer + jitted unpack → device batch."""
    import jax.numpy as jnp

    buf, meta, leftovers = packed
    out = dict(_unpack_fn(meta)(jnp.asarray(buf))) if meta else {}
    for k, v in leftovers.items():
        out[k] = jnp.asarray(v) if hasattr(v, "shape") else v
    return out


def stage_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Convenience: pack_batch + stage in one call."""
    return stage(pack_batch(batch))
