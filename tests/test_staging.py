"""Packed host→device batch staging (data/staging.py).

The staged pipeline must be a bit-exact identity on every leaf the jitted
train steps consume — same arrays, same dtypes (modulo JAX's own default
x64 downcast, which jnp.asarray would apply anyway)."""
import numpy as np
import pytest

from iou3dmatch_tpu.data.staging import pack_batch, stage, stage_batch


def _roundtrip_check(batch):
    out = stage_batch(batch)
    assert set(out.keys()) == set(batch.keys())
    for k, v in batch.items():
        if not hasattr(v, "shape"):
            assert out[k] == v
            continue
        got = np.asarray(out[k])
        ref = np.asarray(v)
        if ref.dtype == np.int64:
            ref = ref.astype(np.int32)  # jax x64-disabled default
        if ref.dtype == np.float64:
            ref = ref.astype(np.float32)
        assert got.dtype == ref.dtype, (k, got.dtype, ref.dtype)
        assert got.shape == ref.shape, k
        assert np.array_equal(got, ref), k


def test_stage_batch_bit_exact_roundtrip():
    rng = np.random.RandomState(0)
    _roundtrip_check({
        "point_clouds": rng.randn(3, 257, 4).astype(np.float32),
        "ema_point_clouds": rng.randn(3, 257, 4).astype(np.float32),
        "sem_cls_label": rng.randint(0, 18, (3, 8)),  # int64 → int32
        "heading_class_label": rng.randint(0, 12, (3, 8)).astype(np.int32),
        "box_label_mask": (rng.rand(3, 8) > 0.5).astype(np.float32),
        "scale": rng.rand(3).astype(np.float64),  # f64 → f32
        "odd_bytes": rng.randn(7).astype(np.float32),  # odd leaf length
        "flip_x_axis": rng.rand(3) > 0.5,  # bool → leftover path
        "scan_name": "scene0000_00",  # non-array passthrough
    })


def test_stage_preserves_f32_bits_exactly():
    # denormals, infs, nans, -0.0 must survive the int32 view round-trip
    specials = np.array(
        [0.0, -0.0, np.inf, -np.inf, np.nan, 1e-45, -1e-45, 3.14159],
        np.float32)
    out = stage_batch({"x": specials})
    got = np.asarray(out["x"])
    assert got.dtype == np.float32
    assert np.array_equal(
        got.view(np.int32), specials.view(np.int32))


def test_pack_meta_is_stable_and_hashable():
    rng = np.random.RandomState(1)
    b = {"a": rng.randn(2, 3).astype(np.float32),
         "b": rng.randint(0, 5, (2,)).astype(np.int32)}
    _, meta1, _ = pack_batch(b)
    _, meta2, _ = pack_batch({k: v + 0 for k, v in b.items()})
    assert meta1 == meta2
    hash(meta1)  # one jitted unpack per spec (lru_cache key)


def test_empty_and_leftover_only_batches():
    out = stage(pack_batch({"s": "only"}))
    assert out == {"s": "only"}
    rng = np.random.RandomState(2)
    bools = rng.rand(4) > 0.5
    out = stage_batch({"flags": bools})
    assert np.array_equal(np.asarray(out["flags"]), bools)


@pytest.mark.parametrize("n_leaves", [1, 17])
def test_stage_matches_per_leaf_asarray(n_leaves):
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    batch = {f"k{i}": rng.randn(2, 5, 3).astype(np.float32)
             for i in range(n_leaves)}
    staged = stage_batch(batch)
    for k, v in batch.items():
        assert np.array_equal(np.asarray(staged[k]), np.asarray(jnp.asarray(v)))
