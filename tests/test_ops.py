"""Golden tests: JAX point ops vs NumPy oracles of the CUDA semantics."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iou3dmatch_tpu.ops import (
    furthest_point_sample,
    ball_query,
    group_points,
    three_nn,
    three_interpolate,
    gather_points,
)
from oracles import fps_oracle, ball_query_oracle, three_nn_oracle


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fps_matches_oracle(seed):
    rng = np.random.RandomState(seed)
    xyz = rng.randn(2, 257, 3).astype(np.float32) * 2.0
    # inject zero-padded points that must be skipped
    xyz[0, 5:40] = 0.0
    xyz[1, 100:120] = 0.01  # |p|^2 ~ 3e-4 <= 1e-3 -> also skipped
    got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 64))
    for b in range(2):
        want = fps_oracle(xyz[b], 64)
        np.testing.assert_array_equal(got[b], want)


def test_fps_seeds_index_zero():
    xyz = np.random.RandomState(3).randn(1, 64, 3).astype(np.float32)
    got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 8))
    assert got[0, 0] == 0


@pytest.mark.parametrize("seed,chunk", [(0, 4096), (1, 37), (2, 64)])
def test_ball_query_matches_oracle(seed, chunk):
    rng = np.random.RandomState(seed)
    xyz = rng.rand(2, 300, 3).astype(np.float32)
    new_xyz = rng.rand(2, 33, 3).astype(np.float32)
    got = np.asarray(ball_query(0.2, 16, jnp.asarray(xyz), jnp.asarray(new_xyz), chunk))
    for b in range(2):
        want = ball_query_oracle(0.2, 16, xyz[b], new_xyz[b])
        np.testing.assert_array_equal(got[b], want)


def test_ball_query_empty_center():
    xyz = np.zeros((1, 10, 3), np.float32)
    xyz[0, :, 0] = np.arange(10)
    new_xyz = np.full((1, 1, 3), 100.0, np.float32)  # far from everything
    got = np.asarray(ball_query(0.5, 4, jnp.asarray(xyz), jnp.asarray(new_xyz)))
    np.testing.assert_array_equal(got[0, 0], np.zeros(4, np.int32))


def test_three_nn_matches_oracle():
    rng = np.random.RandomState(0)
    unknown = rng.rand(2, 50, 3).astype(np.float32)
    known = rng.rand(2, 20, 3).astype(np.float32)
    dist, idx = three_nn(jnp.asarray(unknown), jnp.asarray(known))
    for b in range(2):
        dw, iw = three_nn_oracle(unknown[b], known[b])
        np.testing.assert_array_equal(np.asarray(idx[b]), iw)
        np.testing.assert_allclose(np.asarray(dist[b]), dw, rtol=1e-5, atol=1e-6)


def test_three_interpolate_forward_and_grad():
    rng = np.random.RandomState(0)
    feats = rng.rand(1, 8, 5).astype(np.float32)
    idx = rng.randint(0, 8, size=(1, 11, 3)).astype(np.int32)
    w = rng.rand(1, 11, 3).astype(np.float32)
    w = w / w.sum(-1, keepdims=True)
    out = np.asarray(three_interpolate(jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(w)))
    want = (feats[0][idx[0]] * w[0][:, :, None]).sum(1)
    np.testing.assert_allclose(out[0], want, rtol=1e-6)

    # gradient w.r.t. features is a scatter-add of weights
    def loss(f):
        return jnp.sum(three_interpolate(f, jnp.asarray(idx), jnp.asarray(w)))

    g = np.asarray(jax.grad(loss)(jnp.asarray(feats)))
    want_g = np.zeros_like(feats)
    for i in range(11):
        for k in range(3):
            want_g[0, idx[0, i, k], :] += w[0, i, k]
    np.testing.assert_allclose(g, want_g, rtol=1e-5, atol=1e-6)


def test_gather_and_group():
    rng = np.random.RandomState(0)
    feats = rng.rand(2, 9, 4).astype(np.float32)
    idx = rng.randint(0, 9, size=(2, 5)).astype(np.int32)
    out = np.asarray(gather_points(jnp.asarray(feats), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_array_equal(out[b], feats[b][idx[b]])

    gidx = rng.randint(0, 9, size=(2, 5, 3)).astype(np.int32)
    gout = np.asarray(group_points(jnp.asarray(feats), jnp.asarray(gidx)))
    for b in range(2):
        np.testing.assert_array_equal(gout[b], feats[b][gidx[b]])


def test_fps_pallas_matches_xla():
    """Pallas kernel (interpret mode on CPU) must match the XLA FPS exactly,
    including the zero-point skip and first-occurrence tie-break."""
    from iou3dmatch_tpu.ops.fps import furthest_point_sample
    from iou3dmatch_tpu.ops.fps_pallas import furthest_point_sample_pallas

    rng = np.random.RandomState(7)
    xyz = rng.randn(2, 700, 3).astype(np.float32)
    xyz[:, rng.choice(700, 70, replace=False)] = 0.0
    ref = np.asarray(furthest_point_sample(jnp.asarray(xyz), 96))
    pal = np.asarray(
        furthest_point_sample_pallas(jnp.asarray(xyz), 96, interpret=True)
    )
    np.testing.assert_array_equal(ref, pal)


def test_ball_query_fast_matches_exact_when_no_overflow():
    """approx path must equal the exact path whenever every center has at
    most nsample in-radius neighbors (the only regime where the reference
    semantics are deterministic anyway)."""
    from iou3dmatch_tpu.ops.ball_query import ball_query

    rng = np.random.RandomState(11)
    xyz = (rng.randn(2, 2000, 3) * 3).astype(np.float32)  # sparse: few hits
    centers = xyz[:, :128]
    exact = np.asarray(ball_query(0.3, 16, jnp.asarray(xyz), jnp.asarray(centers)))
    fast = np.asarray(
        ball_query(0.3, 16, jnp.asarray(xyz), jnp.asarray(centers), exact=False)
    )
    # verify the no-overflow precondition with a numpy count
    d2 = ((centers[:, :, None, :] - xyz[:, None, :, :]) ** 2).sum(-1)
    assert (d2 < 0.09).sum(axis=2).max() <= 16
    np.testing.assert_array_equal(exact, fast)


def test_custom_vjp_backwards_match_autodiff():
    """The one-hot matmul backwards (ops/scatter.py) must equal XLA's
    native scatter-add transpose exactly (duplicate indices included)."""
    from iou3dmatch_tpu.ops import gather_points, group_points, three_interpolate

    rng = np.random.RandomState(3)
    b, n, c, m, ns = 2, 37, 5, 11, 4
    feats = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    gidx = jnp.asarray(rng.randint(0, n, (b, m, ns)))
    cot = jnp.asarray(rng.randn(b, m, ns, c).astype(np.float32))

    ref_fn = lambda f: jnp.sum(jax.vmap(lambda ff, ii: ff[ii])(f, gidx) * cot)
    new_fn = lambda f: jnp.sum(group_points(f, gidx) * cot)
    np.testing.assert_allclose(
        np.asarray(jax.grad(ref_fn)(feats)), np.asarray(jax.grad(new_fn)(feats)),
        rtol=1e-5, atol=1e-5)

    pidx = jnp.asarray(rng.randint(0, n, (b, m)))
    cot2 = jnp.asarray(rng.randn(b, m, c).astype(np.float32))
    ref_fn = lambda f: jnp.sum(jax.vmap(lambda ff, ii: ff[ii])(f, pidx) * cot2)
    new_fn = lambda f: jnp.sum(gather_points(f, pidx) * cot2)
    np.testing.assert_allclose(
        np.asarray(jax.grad(ref_fn)(feats)), np.asarray(jax.grad(new_fn)(feats)),
        rtol=1e-5, atol=1e-5)

    kfeats = jnp.asarray(rng.randn(b, m, c).astype(np.float32))
    iidx = jnp.asarray(rng.randint(0, m, (b, n, 3)))
    w = jnp.asarray(rng.rand(b, n, 3).astype(np.float32))
    cot3 = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    ref_fn = lambda f: jnp.sum(
        jnp.sum(jax.vmap(lambda ff, ii: ff[ii])(f, iidx)
                * w[..., None], axis=2) * cot3)
    new_fn = lambda f: jnp.sum(three_interpolate(f, iidx, w) * cot3)
    np.testing.assert_allclose(
        np.asarray(jax.grad(ref_fn)(kfeats)), np.asarray(jax.grad(new_fn)(kfeats)),
        rtol=1e-5, atol=1e-5)


def test_three_nn_approx_near_minimal():
    """approx path: distances must be exact for the returned neighbors, and
    each row's worst returned neighbor must be within the true 4th-NN
    distance in nearly every row (recall_target=0.95)."""
    rng = np.random.RandomState(5)
    unknown = rng.rand(2, 400, 3).astype(np.float32) * 2
    known = rng.rand(2, 128, 3).astype(np.float32) * 2
    dist, idx = three_nn(jnp.asarray(unknown), jnp.asarray(known), exact=False)
    dist, idx = np.asarray(dist), np.asarray(idx)
    d2 = ((unknown[:, :, None, :] - known[:, None, :, :]) ** 2).sum(-1)
    # distances exact for whatever neighbors were picked
    want = np.sqrt(np.take_along_axis(d2, idx.astype(np.int64), axis=2))
    np.testing.assert_allclose(np.sort(dist, -1), np.sort(want, -1), rtol=1e-4, atol=1e-5)
    # no duplicate neighbors within a row
    assert all(len(set(row)) == 3 for b in range(2) for row in idx[b])
    # near-minimality: worst pick <= true 4th-NN distance for >=95% of rows
    d4 = np.sqrt(np.sort(d2, axis=2)[:, :, 3])
    ok = (dist.max(-1) <= d4 + 1e-6).mean()
    assert ok >= 0.95, ok


def test_scatter_chunked_fallback_matches():
    """The chunked path (forced via a tiny element budget) must equal the
    single-dot path exactly."""
    from iou3dmatch_tpu.ops import scatter

    rng = np.random.RandomState(9)
    u = 300  # > 2x the 128-row minimum chunk -> the loop runs 3 chunks
    idx = jnp.asarray(rng.randint(0, 17, (3, u)).astype(np.int32))
    upd = jnp.asarray(rng.randn(3, u, 6).astype(np.float32))
    want = scatter.batched_onehot_segment_sum(idx, upd, 17)
    orig = scatter._MAX_ONEHOT_ELEMENTS
    try:
        scatter._MAX_ONEHOT_ELEMENTS = 100  # chunk = max(128, ...) = 128
        got = scatter.batched_onehot_segment_sum(idx, upd, 17)
    finally:
        scatter._MAX_ONEHOT_ELEMENTS = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_sa_bitcast_gather_matches_f32_path():
    """The bf16 bitcast-payload gather (backbone fast mode) must produce
    outputs matching the f32 packed gather: xyz rides as exact f32 bits,
    features as the same bf16 the MLP casts to anyway."""
    import jax.numpy as jnp
    from iou3dmatch_tpu.models.pointnet2 import PointnetSAModuleVotes

    rng = np.random.RandomState(2)
    xyz = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32) * 3)
    feats = jnp.asarray(rng.randn(2, 256, 16).astype(np.float32))
    kw = dict(npoint=64, radius=0.8, nsample=8, mlp=(16, 8), dtype=jnp.bfloat16)
    ref = PointnetSAModuleVotes(**kw, bitcast_gather=False)
    fast = PointnetSAModuleVotes(**kw, bitcast_gather=True)
    vars_ref = ref.init(jax.random.PRNGKey(0), xyz, feats, train=False)
    a = ref.apply(vars_ref, xyz, feats, train=False)
    b = fast.apply(vars_ref, xyz, feats, train=False)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))


def test_gather_rows_vmem_kernel_interpret():
    """The Pallas VMEM gather (interpret mode on CPU) must match a plain
    gather exactly, including duplicate and repeated indices."""
    from iou3dmatch_tpu.ops.gather_pallas import gather_rows_vmem

    rng = np.random.RandomState(4)
    tab = jnp.asarray(rng.randn(3, 40, 4).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 40, (3, 64)).astype(np.int32))
    got = np.asarray(gather_rows_vmem(tab, idx, True))
    want = np.asarray(jax.vmap(lambda f, i: f[i])(tab, idx))
    np.testing.assert_array_equal(got, want)


def test_gather_rows_vmem_wide_table():
    """Wide f32 tables (up to 256 lanes, e.g. SA2's 131-channel packed
    xyz+features) go through the same kernel; support predicate must accept
    SA2 train shapes and reject >256-lane and bf16 tables."""
    from iou3dmatch_tpu.ops.gather_pallas import (
        gather_rows_vmem,
        gather_rows_vmem_supported,
    )

    rng = np.random.RandomState(5)
    tab = jnp.asarray(rng.randn(2, 48, 131).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 48, (2, 64)).astype(np.int32))
    got = np.asarray(gather_rows_vmem(tab, idx, True))
    want = np.asarray(jax.vmap(lambda f, i: f[i])(tab, idx))
    np.testing.assert_array_equal(got, want)

    assert gather_rows_vmem_supported(2048, 32768, 131, jnp.float32)  # SA2
    assert not gather_rows_vmem_supported(1024, 8192, 259, jnp.float32)  # SA3
    assert not gather_rows_vmem_supported(2048, 32768, 131, jnp.bfloat16)


def test_fps_prefix_property():
    """FPS re-run on an FPS-selection-ordered set re-selects the prefix in
    order — the theorem behind the inds="prefix" shortcut used for SA2-4 and
    seed_fps (models/pointnet2.py). Holds exactly (same float accumulation
    order, consistent first-occurrence tie-breaks) whenever there are at
    least ``npoint`` distinct valid points; covers duplicates (sampling with
    replacement) and the |p|^2<=1e-3 skip rule."""
    rng = np.random.RandomState(7)

    def fps_ordered(pc, m):
        i = furthest_point_sample(jnp.asarray(pc), m)
        return jnp.take_along_axis(
            jnp.asarray(pc), i[..., None].astype(jnp.int32), axis=1)

    # realistic scene scale
    pc = rng.uniform(-4, 4, size=(2, 4096, 3)).astype(np.float32)
    x1 = fps_ordered(pc, 512)
    np.testing.assert_array_equal(
        np.asarray(furthest_point_sample(x1, 256)),
        np.tile(np.arange(256, dtype=np.int32), (2, 1)))
    # chained (SA2 -> SA3 analogue)
    x2 = x1[:, :256]
    np.testing.assert_array_equal(
        np.asarray(furthest_point_sample(x2, 128)),
        np.tile(np.arange(128, dtype=np.int32), (2, 1)))
    # duplicate-heavy (random_sampling with replacement) + near-origin points
    base = rng.uniform(-2, 2, size=(2, 300, 3)).astype(np.float32)
    dup = np.take_along_axis(base, rng.randint(0, 300, (2, 2048))[..., None], 1)
    dup[:, :50] *= 1e-4  # |p|^2 <= 1e-3: skipped by the CUDA semantics
    x3 = fps_ordered(dup, 256)
    np.testing.assert_array_equal(
        np.asarray(furthest_point_sample(x3, 128)),
        np.tile(np.arange(128, dtype=np.int32), (2, 1)))


def test_gather_ops_clamp_oob_and_grad_consistency():
    """One index contract on every path: out-of-range indices CLAMP to
    [0, n-1] (the Pallas kernel clamps; XLA would wrap negatives), and the
    one-hot VJPs route cotangents to the row the forward actually read."""
    import jax
    import jax.numpy as jnp

    from iou3dmatch_tpu.ops import gather_points, group_points, three_interpolate

    n, c = 5, 3
    f = jnp.arange(n * c, dtype=jnp.float32).reshape(1, n, c)

    idx = jnp.array([[-1, 0, n, 2]], jnp.int32)
    out = gather_points(f, idx)
    np.testing.assert_array_equal(np.asarray(out[0, 0]), np.asarray(f[0, 0]))
    np.testing.assert_array_equal(np.asarray(out[0, 2]), np.asarray(f[0, n - 1]))

    g = jax.grad(lambda ff: gather_points(ff, idx).sum())(f)
    # row 0 read twice (clamped -1 and literal 0), row n-1 once (clamped n)
    assert float(g[0, 0, 0]) == 2.0 and float(g[0, n - 1, 0]) == 1.0

    gidx = jnp.array([[[-1, 1], [n, 2]]], jnp.int32)
    gout = group_points(f, gidx)
    np.testing.assert_array_equal(np.asarray(gout[0, 0, 0]), np.asarray(f[0, 0]))
    np.testing.assert_array_equal(np.asarray(gout[0, 1, 0]), np.asarray(f[0, n - 1]))
    gg = jax.grad(lambda ff: group_points(ff, gidx).sum())(f)
    assert float(gg[0, 0, 0]) == 1.0 and float(gg[0, n - 1, 0]) == 1.0

    w = jnp.full((1, 2, 3), 1.0 / 3.0, jnp.float32)
    tidx = jnp.array([[[-1, 0, 1], [n, 1, 2]]], jnp.int32)
    tout = three_interpolate(f, tidx, w)
    expect0 = (f[0, 0] + f[0, 0] + f[0, 1]) / 3.0
    np.testing.assert_allclose(np.asarray(tout[0, 0]), np.asarray(expect0),
                               rtol=1e-6)
    tg = jax.grad(lambda ff: three_interpolate(ff, tidx, w).sum())(f)
    np.testing.assert_allclose(float(tg[0, n - 1, 0]), 1.0 / 3.0, rtol=1e-6)


def test_onehot_segment_sum_single_scene():
    from iou3dmatch_tpu.ops.scatter import (
        batched_onehot_segment_sum, onehot_segment_sum)

    rng = np.random.RandomState(0)
    idx = rng.randint(0, 7, 12).astype(np.int64)  # int64 in, cast inside
    upd = rng.randn(12, 4).astype(np.float32)
    single = np.asarray(onehot_segment_sum(idx, upd, 7))
    batched = np.asarray(batched_onehot_segment_sum(
        idx[None].astype(np.int32), upd[None], 7))[0]
    np.testing.assert_allclose(single, batched, rtol=1e-6)
